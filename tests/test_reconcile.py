"""Migration-reconciliation invariants (operators/reconcile.py): the
checksum flags exactly the damaged buckets, the diff reports exactly the
injected damage, and the dirty-bucket-restricted diff (the 100 TB
composition) equals the full diff. Oracle parity for x66/x67 is covered
by test_core_queries."""

from pyspark.sql import functions as F

from mariadb_postgres_migration_spark import audit_queries as AQ
from mariadb_postgres_migration_spark.operators import reconcile as R
from mariadb_postgres_migration_spark.sources.parquet import read_parquet_table


def _expected_damage(keys):
    removed = {k for k in keys if k % AQ.DROP_MOD == 0}
    changed = {k for k in keys if k % AQ.MUT_MOD == 0 and k % AQ.DROP_MOD != 0}
    added = {k + AQ.ADD_SHIFT for k in keys if k % AQ.ADD_MOD == 0}
    return removed, changed, added


def test_checksum_flags_exactly_the_damaged_buckets(spark, sf_dir):
    orders = read_parquet_table(spark, sf_dir, "orders")
    keys = [r[0] for r in orders.select("o_orderkey").collect()]
    removed, changed, added = _expected_damage(keys)
    dirty = {k % AQ.CHECKSUM_BUCKETS for k in removed | changed | added}

    report = AQ.x66_migration_checksum(spark, sf_dir).collect()
    assert len(report) == AQ.CHECKSUM_BUCKETS
    got_dirty = {r["bucket"] for r in report if not r["match"]}
    assert got_dirty == dirty
    # count deltas only where rows were dropped/injected
    for r in report:
        n_rem = sum(1 for k in removed if k % AQ.CHECKSUM_BUCKETS == r["bucket"])
        n_add = sum(1 for k in added if k % AQ.CHECKSUM_BUCKETS == r["bucket"])
        assert r["n_tgt"] - r["n_src"] == n_add - n_rem


def test_snapshot_diff_reports_exactly_the_injected_damage(spark, sf_dir):
    orders = read_parquet_table(spark, sf_dir, "orders")
    keys = [r[0] for r in orders.select("o_orderkey").collect()]
    removed, changed, added = _expected_damage(keys)
    diff = AQ.x67_snapshot_diff(spark, sf_dir).collect()
    got = {}
    for r in diff:
        got.setdefault(r["change"], set()).add(r["key"])
    assert got.get("removed", set()) == removed
    assert got.get("changed", set()) == changed
    assert got.get("added", set()) == added


def test_dirty_bucket_restricted_diff_equals_full_diff(spark, sf_dir):
    """The checksum→diff composition: restricting the diff to buckets the
    checksum flagged must lose nothing (every damaged row lives in a
    dirty bucket by construction)."""
    orders = read_parquet_table(spark, sf_dir, "orders")
    tgt = AQ._corrupt_orders(orders)
    dg = AQ._orders_digest()
    dirty = AQ.x66_migration_checksum(spark, sf_dir).filter(~F.col("match"))
    full = set(
        map(tuple, R.snapshot_diff(orders, tgt, "o_orderkey", dg).collect())
    )
    restricted = set(
        map(
            tuple,
            R.snapshot_diff(
                orders, tgt, "o_orderkey", dg,
                bucket_filter=dirty, n_buckets=AQ.CHECKSUM_BUCKETS,
            ).collect(),
        )
    )
    assert restricted == full and full


def test_checksum_is_order_and_partitioning_independent(spark, sf_dir):
    """XOR aggregation is commutative: any repartitioning of the input
    yields the identical checksum table."""
    orders = read_parquet_table(spark, sf_dir, "orders")
    dg = AQ._orders_digest()
    a = R.table_checksum(orders, F.col("o_orderkey"), dg).collect()
    b = R.table_checksum(
        orders.repartition(17, "o_orderstatus"), F.col("o_orderkey"), dg
    ).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_hex_chunk_parity_with_python(spark):
    import duckdb

    s = "0123456789abcdef0123456789abcdef"
    con = duckdb.connect()
    for start in R.CHUNK_OFFSETS:
        duck_val = con.execute(
            f"SELECT {R.hex_chunk_sql(repr(s), start)}"
        ).fetchone()[0]
        spark_val = (
            spark.range(1)
            .select(R.hex_chunk(F.lit(s), start).alias("v"))
            .collect()[0][0]
        )
        py_val = int(s[start - 1 : start + 7], 16)
        assert duck_val == spark_val == py_val


# --- c3 entity resolution / x75 rolling anomaly -------------------------


def test_c3_reunifies_every_reregistered_record(spark, sf_dir):
    from mariadb_postgres_migration_spark.audit_queries import (
        ER_OFFSET,
        ER_REREG_MOD,
        c3_entity_resolution,
    )

    out = {r["rec_id"]: r for r in c3_entity_resolution(spark, sf_dir).collect()}
    b_recs = [k for k in out if k >= ER_OFFSET]
    assert b_recs  # the scenario actually injected re-registrations
    for bk in b_recs:
        a_twin = bk - ER_OFFSET
        assert a_twin % ER_REREG_MOD == 0
        # the typo'd copy and its original must land in the SAME cluster
        assert out[bk]["canonical_id"] == out[a_twin]["canonical_id"], bk
        # equal balances -> min-id tie-break -> the ORIGINAL is canonical,
        # so a re-registered copy is never its own cluster representative
        assert not out[bk]["keep"]
    # exactly one representative per cluster
    canon = {}
    for r in out.values():
        canon.setdefault(r["canonical_id"], []).append(r["keep"])
    for cid, keeps in canon.items():
        assert sum(keeps) == 1, cid


def test_x75_flags_exactly_the_hand_computed_spikes(spark):
    from mariadb_postgres_migration_spark.operators import audit  # noqa: F401
    from mariadb_postgres_migration_spark.audit_queries import (
        ANOM_MIN_N,
        x75_rolling_anomaly,
    )
    import mariadb_postgres_migration_spark.audit_queries as AQ
    from pyspark.sql import functions as F

    # steady 10.00 baseline, one 100.00 spike late, one early outlier that
    # must NOT flag (baseline too young)
    rows = []
    for i in range(1, 31):
        v = 100.0 if i == 25 else (55.0 if i == 3 else 10.0)
        rows.append((i, 1, f"2024-01-01 00:{i:02d}:00", v))
    events = spark.createDataFrame(
        rows, "event_id long, user_id long, ts string, value double"
    ).withColumn("ts", F.to_timestamp("ts"))

    # drive the registered query body directly on the synthetic frame
    orig_t = AQ._t
    AQ._t = lambda spark, sf_dir, name: events
    try:
        got = {r["event_id"]: r for r in x75_rolling_anomaly(spark, "unused").collect()}
    finally:
        AQ._t = orig_t
    assert got[25]["anomaly"] is True  # the spike against a mature baseline
    assert got[3]["anomaly"] is False  # n < min_n: young baseline never flags
    assert got[3]["n"] < ANOM_MIN_N
    flagged = {k for k, r in got.items() if r["anomaly"]}
    # event 26 sees the 100 spike inside its baseline (inflated variance)
    # but 10.0 is still within 3 sigma of the contaminated window; only
    # the spike itself flags
    assert flagged == {25}, flagged
