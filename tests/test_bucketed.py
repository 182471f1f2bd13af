"""Co-located join test: bucketed ⋈ bucketed on the bucket key must plan
with ZERO shuffle exchanges — the persisted-shuffle contract."""

import pytest

from mariadb_postgres_migration_spark.plans.inspect import formatted_plan
from mariadb_postgres_migration_spark.sources.bucketed import (
    drop_table,
    write_bucketed_table,
)
from mariadb_postgres_migration_spark.sources.parquet import read_parquet_table


@pytest.fixture(scope="module")
def bucketed(spark, sf_dir, tmp_path_factory):
    base = tmp_path_factory.mktemp("bucketed")
    orders = read_parquet_table(spark, sf_dir, "orders")
    lineitem = read_parquet_table(spark, sf_dir, "lineitem")
    write_bucketed_table(orders, "orders_b", str(base / "o"), ["o_orderkey"], 8)
    write_bucketed_table(
        lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
        "lineitem_b",
        str(base / "l"),
        ["o_orderkey"],
        8,
    )
    yield
    drop_table(spark, "orders_b")
    drop_table(spark, "lineitem_b")


def test_bucketed_join_has_no_shuffle(spark, bucketed):
    joined = (
        spark.table("orders_b")
        .hint("merge")  # force SMJ so the test is about shuffles, not broadcast
        .join(spark.table("lineitem_b"), "o_orderkey")
    )
    plan = formatted_plan(joined)
    assert "SortMergeJoin" in plan
    assert "Exchange hashpartitioning" not in plan, "bucketing did not elide the shuffle"
    assert joined.count() > 0


def test_bucketed_agg_has_no_shuffle(spark, bucketed):
    from pyspark.sql import functions as F

    agg = spark.table("lineitem_b").groupBy("o_orderkey").agg(F.count("*").alias("n"))
    assert "Exchange hashpartitioning" not in formatted_plan(agg)
    assert agg.count() > 0
