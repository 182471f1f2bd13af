"""x73 streamed funnel: the stateful stream must equal the batch window
cascade even when the in-order replay is split across micro-batches.
Single-replay oracle parity is covered by test_core_queries."""

import tempfile
import uuid

from pyspark.sql import Window
from pyspark.sql import functions as F

from mariadb_postgres_migration_spark.audit_queries import funnel_stages
from mariadb_postgres_migration_spark.sources.parquet import read_parquet_table
from mariadb_postgres_migration_spark.streaming.jobs import funnel_state_stream


def test_stream_funnel_matches_batch_across_time_ordered_batches(
    spark, sf_dir, tmp_path
):
    events = read_parquet_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    us = F.unix_micros(F.col("ts").cast("timestamp"))

    # three sequential time slices written one after another (ascending
    # mtime), so maxFilesPerTrigger=1 replays them in time order — the
    # streaming funnel's arrival contract
    lo, hi = events.agg(F.min(us), F.max(us)).collect()[0]
    cut1, cut2 = lo + (hi - lo) // 3, lo + 2 * (hi - lo) // 3
    src = str(tmp_path / "slices")
    for pred in [us <= cut1, (us > cut1) & (us <= cut2), us > cut2]:
        events.filter(pred).coalesce(1).write.mode("append").parquet(src)

    stream = spark.readStream.schema(events.schema).option(
        "maxFilesPerTrigger", "1"
    ).parquet(src)
    name = f"fnl_{uuid.uuid4().hex[:10]}"
    with tempfile.TemporaryDirectory(prefix="mps_ckpt_") as ckpt:
        q = (
            funnel_state_stream(stream)
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        n_batches = len([p for p in q.recentProgress if p["numInputRows"] > 0])
        w = Window.partitionBy("user_id").orderBy(F.desc("emit"))
        streamed = sorted(
            map(
                tuple,
                spark.table(name)
                .withColumn("__rn", F.row_number().over(w))
                .filter(F.col("__rn") == 1)
                .select("user_id", "stage", "t1_us", "t2_us", "t3_us")
                .collect(),
            )
        )
    assert n_batches >= 3, f"replay was not split ({n_batches} non-empty batches)"

    batch = sorted(
        map(
            tuple,
            funnel_stages(
                events.select("user_id", us.alias("us"), "event_type")
            ).collect(),
        )
    )
    assert streamed == batch
