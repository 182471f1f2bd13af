"""Physical-plan inspection helpers — the engine's scale contract, testable.

The 100 TB design notes in SURVEY §4 reduce to assertions a plan either
satisfies or doesn't: filters reach the scan (``PushedFilters``), the scan
reads only what the projection needs (``ReadSchema``), small build sides
broadcast instead of shuffling, Python appears only where the operator
contract says it may, and the shuffle count matches the algorithm's minimum.
tests/test_plans.py pins these for the headline queries so a regression
shows up as a failing test, not as a 10× bench slowdown three rounds later.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # same text .explain prints
        df._jdf.queryExecution(), "formatted"
    )


def simple_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def pushed_filters(df: DataFrame) -> list[str]:
    """Filter predicates that reached the parquet/DSv2 scan."""
    text = formatted_plan(df)
    out = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", text):
        if m.group(1).strip():
            out.extend(p.strip() for p in m.group(1).split(","))
    return out


def read_schema_columns(df: DataFrame) -> set[str]:
    """Union of column names the scans actually read (column pruning check)."""
    text = formatted_plan(df)
    cols: set[str] = set()
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", text):
        for fieldspec in m.group(1).split(","):
            name = fieldspec.split(":")[0].strip()
            if name:
                cols.add(name)
    return cols


def exchange_count(df: DataFrame) -> int:
    """Shuffle exchanges in the final plan (AQE reuse already applied)."""
    return formatted_plan(df).count("Exchange hashpartitioning") + formatted_plan(
        df
    ).count("Exchange rangepartitioning")


def broadcast_join_count(df: DataFrame) -> int:
    return formatted_plan(df).count("BroadcastHashJoin")


def python_eval_count(df: DataFrame) -> int:
    """Python-executed operators in the plan (BatchEvalPython = row UDF,
    ArrowEvalPython = pandas UDF, FlatMapGroupsInPandas/MapInPandas =
    grouped/iterator forms). The hot-path contract: zero unless the operator
    is explicitly UDF-tier (OP-31 normalize, multimodal decode, grouped
    threading)."""
    text = formatted_plan(df)
    return sum(
        text.count(marker)
        for marker in (
            "BatchEvalPython",
            "ArrowEvalPython",
            "FlatMapGroupsInPandas",
            "MapInPandas",
        )
    )
