"""apply_changes (the pt-table-checksum re-sync step): exactness and plan
shape. The registered c4_migration_repair query pins the composed pipeline
against the SQL oracle; these tests pin the operator's contract directly."""

from pyspark.sql import functions as F

from mariadb_postgres_migration_spark.operators import reconcile as R
from mariadb_postgres_migration_spark.sources.parquet import read_parquet_table


def _damage(orders):
    key = F.col("o_orderkey")
    mutated = orders.filter(key % 7 != 0).withColumn(
        "o_orderstatus",
        F.when(key % 5 == 0, F.lit("X")).otherwise(F.col("o_orderstatus")),
    )
    added = orders.filter(key % 11 == 0).withColumn("o_orderkey", key + 1_000_000)
    return mutated.unionByName(added.select(*mutated.columns))


def _digest():
    c = F.col
    return R.row_digest(
        c("o_orderkey"),
        F.coalesce(c("o_custkey"), F.lit(-1)),
        F.coalesce(c("o_orderstatus"), F.lit("~")),
        F.coalesce(c("o_orderpriority"), F.lit("~")),
        F.coalesce(F.unix_micros(c("o_orderdate").cast("timestamp")), F.lit(-1)),
        F.floor(c("o_totalprice") * 100 + 0.5).cast("long"),
    )


def test_apply_changes_restores_row_identity(spark, sf_dir):
    """Repaired target ≡ source as a multiset of full-row digests — not
    just equal checksums: symmetric except must be empty both ways."""
    orders = read_parquet_table(spark, sf_dir, "orders")
    tgt = _damage(orders)
    diff = R.snapshot_diff(orders, tgt, "o_orderkey", _digest())
    assert diff.count() > 0  # the fixture really is damaged
    repaired = R.apply_changes(tgt, orders, diff, "o_orderkey")
    s = orders.select(_digest().alias("dg"))
    r = repaired.select(_digest().alias("dg"))
    assert s.exceptAll(r).count() == 0
    assert r.exceptAll(s).count() == 0


def test_apply_changes_noop_on_clean_target(spark, sf_dir):
    """An empty change set must leave the target untouched (no spurious
    deletes/inserts when the migration was actually fine)."""
    orders = read_parquet_table(spark, sf_dir, "orders")
    diff = R.snapshot_diff(orders, orders, "o_orderkey", _digest())
    assert diff.count() == 0
    repaired = R.apply_changes(orders, orders, diff, "o_orderkey")
    assert repaired.count() == orders.count()


def test_apply_changes_plan_is_two_key_joins(spark, sf_dir):
    """Scale contract: one anti + one semi join on the key, no cartesian,
    no Python, and the change-set side of each join carries only the key
    column (ReadSchema/pruning is the src/tgt side's concern)."""
    from mariadb_postgres_migration_spark.plans.inspect import (
        formatted_plan,
        python_eval_count,
    )

    orders = read_parquet_table(spark, sf_dir, "orders")
    tgt = _damage(orders)
    diff = R.snapshot_diff(orders, tgt, "o_orderkey", _digest())
    repaired = R.apply_changes(tgt, orders, diff, "o_orderkey")
    text = formatted_plan(repaired)
    assert "CartesianProduct" not in text
    assert python_eval_count(repaired) == 0
    assert "LeftAnti" in text and "LeftSemi" in text
