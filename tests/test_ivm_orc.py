"""Incremental view maintenance (operators/aggregates.py) and the ORC
source/sink. x69 oracle parity is covered by test_core_queries; here the
sharper algebra properties and format round-trips."""

from pyspark.sql import functions as F

from mariadb_postgres_migration_spark.operators import aggregates as AG
from mariadb_postgres_migration_spark.sources.parquet import read_parquet_table
from mariadb_postgres_migration_spark.sources.textfiles import (
    read_orc_table,
    write_orc,
)


def _summary_rows(df):
    return sorted(map(tuple, df.collect()))


def test_merge_equals_full_reaggregate_for_any_split(spark, sf_dir):
    """The IVM identity on three different base/delta cut points — the
    merge must be invariant to WHERE the snapshot boundary falls."""
    orders = read_parquet_table(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long")
    keys = ["o_orderstatus"]
    full = _summary_rows(AG.grouped_summary(orders, keys, cents))
    for frac in (0, 3, 7):
        pred = F.col("o_orderkey") % 10 <= frac
        merged = AG.merge_summaries(
            AG.grouped_summary(orders.filter(pred), keys, cents),
            AG.grouped_summary(orders.filter(~pred), keys, cents),
            keys,
        )
        assert _summary_rows(merged) == full, f"split {frac} broke the algebra"


def test_merge_handles_groups_on_one_side_only(spark):
    base = spark.createDataFrame([("a", 5)], "k string, v long")
    delta = spark.createDataFrame([("b", 7)], "k string, v long")
    merged = AG.merge_summaries(
        AG.grouped_summary(base, ["k"], F.col("v")),
        AG.grouped_summary(delta, ["k"], F.col("v")),
        ["k"],
    ).collect()
    got = {r["k"]: (r["n"], r["sum_v"], r["mn_v"], r["mx_v"]) for r in merged}
    assert got == {"a": (1, 5, 5, 5), "b": (1, 7, 7, 7)}


def test_orc_round_trip_preserves_rows_and_schema(spark, sf_dir, tmp_path):
    orders = read_parquet_table(spark, sf_dir, "orders")
    path = str(tmp_path / "orders_orc")
    write_orc(orders, path)
    back = read_orc_table(spark, path, orders.schema)
    assert back.schema == orders.schema
    assert back.count() == orders.count()
    a = orders.agg(F.sum("o_orderkey"), F.sum(F.floor(F.col("o_totalprice") * 100))).collect()
    b = back.agg(F.sum("o_orderkey"), F.sum(F.floor(F.col("o_totalprice") * 100))).collect()
    assert a == b


def test_orc_scan_pushes_filters(spark, sf_dir, tmp_path):
    orders = read_parquet_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    path = str(tmp_path / "orc_pd")
    write_orc(orders, path)
    df = read_orc_table(spark, path).filter(F.col("o_orderkey") == 42).select(
        "o_orderkey", "o_orderstatus"
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(o_orderkey), EqualTo(o_orderkey,42)]" in plan
    assert "o_totalprice" not in plan.split("ReadSchema")[1][:200]  # pruned
