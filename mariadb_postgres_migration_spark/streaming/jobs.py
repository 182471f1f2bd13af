"""Structured Streaming jobs (SURVEY.md §2.10 EXT-06..09).

The reference is strictly batch; this is the engine's streaming surface over
the ``events`` table shape: tumbling/sliding windows with watermarks,
session windows, and stateful dedup. Each job reads the same parquet as a
file-source stream (``availableNow`` trigger replays it as a bounded
stream), so semantics are testable without an unbounded source; in
production the source line changes to Kafka/files-on-arrival and the
trigger to continuous micro-batches — the transformations stay identical.

Memory-sink collection is test-scale only; production sinks are
``writeStream.format("parquet"/"kafka")`` with checkpointing.
"""

from __future__ import annotations

import os
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schemas import FIXTURE_SCHEMAS
from ..sources.parquet import _ensure_read_conf


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over events.parquet (schema pinned — required for
    streaming reads; ts normalized from int64 nanos exactly like the batch
    reader)."""
    _ensure_read_conf(spark)
    # The fixture is a single file; the streaming file source requires a
    # directory basePath, so point at sf_dir and glob-filter to the table.
    df = (
        spark.readStream.schema(FIXTURE_SCHEMAS["events"])
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))


def _run_to_memory(result: DataFrame, output_mode: str) -> DataFrame:
    """Run a bounded stream to completion into a memory sink, return the
    materialized result as a DataFrame."""
    spark = result.sparkSession
    name = f"mem_{uuid.uuid4().hex[:12]}"
    with tempfile.TemporaryDirectory(prefix="mps_ckpt_") as ckpt:
        q = (
            result.writeStream.format("memory")
            .queryName(name)
            .outputMode(output_mode)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        # memory sink table survives query stop; copy out while session lives
        return spark.table(name)


def run_tumbling_stream(
    spark: SparkSession, sf_dir: str, width_s: int = 600, watermark: str = "30 minutes"
) -> DataFrame:
    """EXT-06/08: watermarked tumbling-window count/sum as a real streaming
    query. With availableNow over a bounded source, complete-mode output
    equals the batch aggregation — the oracle-checkable invariant."""
    events = read_events_stream(spark, sf_dir)
    agg = (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", f"{width_s} seconds").alias("w"))
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.unix_micros(F.col("w.start")).alias("window_start_us"),
            "n_events",
            "sum_value",
        )
    )
    return _run_to_memory(agg, "complete")


def run_session_window_stream(
    spark: SparkSession, sf_dir: str, gap_s: int = 1800, watermark: str = "60 minutes"
) -> DataFrame:
    """EXT-07: native ``session_window`` (streaming-only operator — the
    batch analog is operators/windows.session_window_agg)."""
    events = read_events_stream(spark, sf_dir)
    agg = (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", f"{gap_s} seconds").alias("w"), F.col("user_id"))
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.unix_micros(F.col("w.start")).alias("session_start_us"),
            "n_events",
        )
    )
    return _run_to_memory(agg, "complete")


def run_stream_dedup(
    spark: SparkSession, sf_dir: str, watermark: str = "60 minutes"
) -> DataFrame:
    """EXT-09: stateful streaming dedup on (user_id, event_type) within the
    watermark — ``dropDuplicatesWithinWatermark`` keeps state bounded (the
    unbounded-state version of dropDuplicates would OOM a real stream)."""
    events = read_events_stream(spark, sf_dir)
    deduped = events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["user_id", "event_type"]
    )
    counted = deduped.groupBy("user_id").agg(F.count("*").alias("n_unique_types"))
    return _run_to_memory(counted, "complete")
