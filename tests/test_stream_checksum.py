"""x70 streamed checksum: the streaming state must equal the batch
checksum even when the replay is split across MANY micro-batches (the
whole point of XOR-mergeable state). x70's single-replay oracle parity is
covered by test_core_queries."""

from pyspark.sql import functions as F

from tests.stream_replay import run_split_replay

from mariadb_postgres_migration_spark.sources.parquet import read_parquet_table
from mariadb_postgres_migration_spark.streaming.jobs import events_checksum_agg


def test_checksum_state_accumulates_across_micro_batches(spark, sf_dir, tmp_path):
    events = read_parquet_table(spark, sf_dir, "events")
    src_dir = str(tmp_path / "ev_files")
    events.repartition(3).write.parquet(src_dir)  # >= 3 data files

    batch = sorted(map(tuple, events_checksum_agg(events, 16).collect()))
    n_batches, rows = run_split_replay(
        spark, src_dir, events.schema,
        lambda s: events_checksum_agg(s, 16), "complete",
    )
    assert n_batches >= 3, f"replay was not split ({n_batches} batches)"
    assert sorted(map(tuple, rows)) == batch


def test_checksum_detects_a_single_flipped_row(spark, sf_dir):
    events = read_parquet_table(spark, sf_dir, "events")
    tampered = events.withColumn(
        "event_type",
        F.when(F.col("event_id") == 7, F.lit("TAMPERED")).otherwise(
            F.col("event_type")
        ),
    )
    a = {r["bucket"]: (r["n"], r["x1"], r["x2"]) for r in events_checksum_agg(events, 16).collect()}
    b = {r["bucket"]: (r["n"], r["x1"], r["x2"]) for r in events_checksum_agg(tampered, 16).collect()}
    dirty = [bk for bk in a if a[bk] != b[bk]]
    assert dirty == [7 % 16]
