"""Aggregation operators (SURVEY.md §2.4, OP-18/OP-19).

``group_concat_distinct`` reproduces MySQL's
``GROUP_CONCAT(DISTINCT x SEPARATOR s)`` (queries.mjs:8-11). Two differences
are deliberate (SURVEY §7.3): element order is made deterministic with
``array_sort`` (MySQL's is unspecified), and dedup is case-SENSITIVE
(``collect_set``; MySQL's CI collation dedup is handled by normalizing
upstream). The engine-native form keeps the array — the reference only
string-joins because rows cross a text wire and are split right back
(index.mjs:41-43).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def distinct_sorted_set(col: str | Column) -> Column:
    """Engine-native GROUP_CONCAT(DISTINCT): deterministic sorted array."""
    return F.array_sort(F.collect_set(col))


def group_concat_distinct(
    df: DataFrame, group_cols: list[str], value_col: str, sep: str, alias: str = "agg"
) -> DataFrame:
    """OP-18: per-group distinct, sorted, separator-joined string.

    Spark plans this as partial (map-side) + final aggregation around one
    shuffle on ``group_cols`` — the same shape MySQL's loose index scan
    would give, but distributed.
    """
    return df.groupBy(*group_cols).agg(
        F.array_join(distinct_sorted_set(value_col), sep).alias(alias)
    )


def max_id(df: DataFrame, id_col: str = "id") -> DataFrame:
    """OP-19: ``SELECT id FROM t ORDER BY id DESC LIMIT 1``
    (queries.mjs:15) — expressed as ``max()``, which needs no sort: partial
    max per partition, single-row final. The +1 sequence restart value
    (index.mjs:122) is the caller's concern (sink post-hook, OP-06).
    """
    return df.agg(F.max(id_col).alias("max_id"))


#: the maintained-aggregate schema: (keys..., n, sum_v, mn_v, mx_v).
_IVM_METRICS = ("n", "sum_v", "mn_v", "mx_v")


def grouped_summary(df: DataFrame, keys: list[str], value: Column) -> DataFrame:
    """The algebraic per-group summary this module's IVM maintains:
    count / sum / min / max over an integer-stable ``value``."""
    return df.groupBy(*keys).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(value).cast("long").alias("sum_v"),
        F.min(value).cast("long").alias("mn_v"),
        F.max(value).cast("long").alias("mx_v"),
    )


def merge_summaries(base: DataFrame, delta: DataFrame, keys: list[str]) -> DataFrame:
    """Incremental view maintenance for insert-only deltas: merge a stored
    per-group summary with the delta's summary WITHOUT touching base rows.

    count/sum merge by addition, min/max by comparison — all four are
    algebraic under inserts, so the update costs one delta-sized
    aggregation plus a summary⋈summary join on the group keys; at 100 TB
    the base table is never rescanned (the whole point of maintaining the
    view). Deletions would break min/max (they are not subtractable) —
    that variant needs the full re-aggregate, which is exactly what the
    x69 oracle computes, making oracle parity a proof of the algebra.
    """
    b = base.select(*keys, *[F.col(m).alias(f"b_{m}") for m in _IVM_METRICS])
    d = delta.select(*keys, *[F.col(m).alias(f"d_{m}") for m in _IVM_METRICS])
    z = F.lit(0).cast("long")
    j = b.join(d, on=keys, how="full_outer")
    return j.select(
        *keys,
        (F.coalesce("b_n", z) + F.coalesce("d_n", z)).alias("n"),
        (F.coalesce("b_sum_v", z) + F.coalesce("d_sum_v", z)).alias("sum_v"),
        F.least(
            F.coalesce("b_mn_v", F.col("d_mn_v")),
            F.coalesce("d_mn_v", F.col("b_mn_v")),
        ).alias("mn_v"),
        F.greatest(
            F.coalesce("b_mx_v", F.col("d_mx_v")),
            F.coalesce("d_mx_v", F.col("b_mx_v")),
        ).alias("mx_v"),
    )
