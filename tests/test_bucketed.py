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


def test_incremental_dedup_against_bucketed_fingerprint_index(spark, sf_dir, tmp_path):
    """The x45 ingest shape at scale: the accumulated corpus's fingerprint
    index lives BUCKETED on fp, so a nightly increment joins against it
    with no exchange on the index side — only the (small) increment
    shuffles."""
    from pyspark.sql import functions as F

    from mariadb_postgres_migration_spark.functions.text import normalize_text
    from mariadb_postgres_migration_spark.sources.bucketed import (
        drop_table,
        write_bucketed_table,
    )
    from mariadb_postgres_migration_spark.sources.parquet import read_parquet_table

    docs = read_parquet_table(spark, sf_dir, "documents")
    fp = F.md5(normalize_text(F.col("text")))
    corpus_index = (
        docs.filter(F.col("doc_id") % 10 < 8).select(fp.alias("fp")).distinct()
    )
    write_bucketed_table(
        corpus_index, "fp_index", str(tmp_path / "fp_index"), ["fp"], num_buckets=4
    )
    try:
        index = spark.table("fp_index")
        new = (
            docs.filter(F.col("doc_id") % 10 >= 8)
            .select("doc_id", fp.alias("fp"))
            # the increment repartitions into the index's bucket layout;
            # the index side itself must NOT re-shuffle
            .repartition(4, "fp")
        )
        flagged = (
            new.hint("merge")  # force SMJ: the test is about shuffles
            .join(index.withColumnRenamed("fp", "ofp"), new.fp == F.col("ofp"), "left")
            .select("doc_id", F.col("ofp").isNotNull().alias("is_dup"))
        )
        plan = flagged._jdf.queryExecution().executedPlan().toString()
        # exactly one hash exchange (the increment's own repartition) —
        # none on the bucketed index scan
        assert plan.count("Exchange hashpartitioning") == 1, plan
        # and the flags agree with the plain (unbucketed) formulation
        want = {
            (r["doc_id"], r["is_dup_of_corpus"])
            for r in __import__(
                "mariadb_postgres_migration_spark.extension_queries",
                fromlist=["x45_incremental_dedup"],
            ).x45_incremental_dedup(spark, sf_dir).collect()
        }
        got = {(r["doc_id"], r["is_dup"]) for r in flagged.collect()}
        assert got == want
    finally:
        drop_table(spark, "fp_index")
