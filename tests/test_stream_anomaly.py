"""x82 streamed rolling anomaly: the ring-buffer stateful stream must
equal batch x75 even when the in-order replay is split across
micro-batches. Single-replay oracle parity is covered by
test_core_queries."""

import tempfile
import uuid

from pyspark.sql import functions as F

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

    stream = spark.readStream.schema(events.schema).option(
        "maxFilesPerTrigger", "1"
    ).parquet(src)
    name = f"anm_{uuid.uuid4().hex[:10]}"
    with tempfile.TemporaryDirectory(prefix="mps_ckpt_") as ckpt:
        q = (
            rolling_anomaly_state_stream(stream)
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        n_batches = len([p for p in q.recentProgress if p["numInputRows"] > 0])
        streamed = sorted(map(tuple, spark.table(name).collect()))
        spark.catalog.dropTempView(name)
    assert n_batches >= 3, f"replay was not split ({n_batches} non-empty batches)"
    batch = sorted(map(tuple, x75_rolling_anomaly(spark, sf_dir).collect()))
    assert streamed == batch
    assert any(r[3] for r in batch)  # the fixture produces real anomalies
