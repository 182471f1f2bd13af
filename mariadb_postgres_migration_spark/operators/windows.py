"""Time-window aggregation operators (SURVEY.md §2.10 EXT-06/07) — batch
forms. The streaming counterparts (same semantics + watermark) live in
``streaming/jobs.py``; keeping the batch form oracle-checkable is what lets
the driver verify windowing logic without a stream.

All window boundaries are computed in int64 epoch-micros so Spark and the
DuckDB oracle agree exactly (Spark's native ``window()`` aligns to the unix
epoch; the arithmetic here is that alignment, written out).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def tumbling_window_agg(
    events: DataFrame,
    ts_col: str = "ts",
    width_s: int = 600,
    group_extra: list[str] | None = None,
) -> DataFrame:
    """EXT-06 (tumbling): epoch-aligned fixed buckets via Spark's native
    ``window()``; start exposed as epoch micros."""
    extra = group_extra or []
    win = F.window(F.col(ts_col), f"{width_s} seconds")
    return (
        events.groupBy(win.alias("w"), *extra)
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.unix_micros(F.col("w.start")).alias("window_start_us"),
            *extra,
            "n_events",
            "sum_value",
        )
    )


def sliding_window_agg(
    events: DataFrame,
    ts_col: str = "ts",
    width_s: int = 600,
    slide_s: int = 300,
) -> DataFrame:
    """EXT-06 (sliding): each event lands in width/slide windows; Spark's
    ``window()`` expands them natively (no self-union)."""
    win = F.window(F.col(ts_col), f"{width_s} seconds", f"{slide_s} seconds")
    return (
        events.groupBy(win.alias("w"))
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


def session_window_agg(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap_s: int = 1800,
) -> DataFrame:
    """EXT-07 (session): gap-based sessions in batch form — lag + running
    sum of session-breaks, then group. One shuffle on the key; the running
    sum rides the same partitioning. (Streaming uses native
    ``session_window`` — streaming/jobs.py.)"""
    us = F.unix_micros(F.col(ts_col))
    w = Window.partitionBy(key_col).orderBy(ts_col)
    gap_us = gap_s * 1_000_000
    new_sess = F.when(us - F.lag(us).over(w) > gap_us, 1).otherwise(0)
    sess = F.sum(new_sess).over(
        Window.partitionBy(key_col)
        .orderBy(ts_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        events.withColumn("session_id", sess.cast("long"))
        .groupBy(key_col, "session_id")
        .agg(
            F.unix_micros(F.min(ts_col)).alias("session_start_us"),
            F.unix_micros(F.max(ts_col)).alias("session_end_us"),
            F.count("*").alias("n_events"),
        )
    )
