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
