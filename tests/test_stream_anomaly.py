"""x82 streamed rolling anomaly: the ring-buffer stateful stream must
equal batch x75 even when the in-order replay is split across
micro-batches. Single-replay oracle parity is covered by
test_core_queries."""

from pyspark.sql import functions as F

from tests.stream_replay import run_split_replay

from mariadb_postgres_migration_spark.audit_queries import x75_rolling_anomaly
from mariadb_postgres_migration_spark.sources.parquet import read_parquet_table
from mariadb_postgres_migration_spark.streaming.jobs import (
    rolling_anomaly_state_stream,
)


def test_stream_anomaly_matches_batch_across_time_ordered_batches(
    spark, sf_dir, tmp_path
):
    events = read_parquet_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "value"
    )
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    lo, hi = events.agg(F.min(us), F.max(us)).collect()[0]
    cut1, cut2 = lo + (hi - lo) // 3, lo + 2 * (hi - lo) // 3
    src = str(tmp_path / "slices")
    for pred in [us <= cut1, (us > cut1) & (us <= cut2), us > cut2]:
        events.filter(pred).coalesce(1).write.mode("append").parquet(src)

    n_batches, rows = run_split_replay(
        spark, src, events.schema, rolling_anomaly_state_stream, "append"
    )
    streamed = sorted(map(tuple, rows))
    assert n_batches >= 3, f"replay was not split ({n_batches} non-empty batches)"
    batch = sorted(map(tuple, x75_rolling_anomaly(spark, sf_dir).collect()))
    assert streamed == batch
    assert any(r[3] for r in batch)  # the fixture produces real anomalies
