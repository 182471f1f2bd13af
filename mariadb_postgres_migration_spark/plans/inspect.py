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


def _split_top_level(s: str) -> list[str]:
    """Split on commas at bracket depth 0 — ``GreaterThan(a,b)`` and
    ``In(col, [v1,v2])`` stay whole, ``struct<a:int,b:int>`` fields don't
    leak across type parameters."""
    out, depth, start = [], 0, 0
    for i, ch in enumerate(s):
        if ch in "(<[":
            depth += 1
        elif ch in ")>]":
            depth -= 1
        elif ch == "," and depth == 0:
            out.append(s[start:i])
            start = i + 1
    out.append(s[start:])
    return [p.strip() for p in out if p.strip()]


def _bracketed(text: str, open_idx: int, open_ch: str, close_ch: str) -> str:
    """The content between the bracket at ``open_idx`` and its MATCHING
    close — a greedy/first-close regex truncates at the first nested
    terminator (the bug that hid pruning regressions behind nested
    struct/array types)."""
    depth = 0
    for i in range(open_idx, len(text)):
        if text[i] == open_ch:
            depth += 1
        elif text[i] == close_ch:
            depth -= 1
            if depth == 0:
                return text[open_idx + 1 : i]
    return text[open_idx + 1 :]


def pushed_filters(df: DataFrame) -> list[str]:
    """Filter predicates that reached the parquet/DSv2 scan, one WHOLE
    predicate per element (depth-aware: binary filters and In-lists are
    not fragmented at their internal commas)."""
    text = formatted_plan(df)
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[", text):
        body = _bracketed(text, m.end() - 1, "[", "]")
        out.extend(_split_top_level(body))
    return out


def read_schema_columns(df: DataFrame) -> set[str]:
    """Union of column names the scans actually read (column pruning
    check). Bracket-matched: a nested/parameterized field type
    (``struct<...>``, ``array<...>``, ``map<...>``) must not swallow the
    columns after it."""
    text = formatted_plan(df)
    cols: set[str] = set()
    for m in re.finditer(r"ReadSchema: struct<", text):
        body = _bracketed(text, m.end() - 1, "<", ">")
        for fieldspec in _split_top_level(body):
            name = fieldspec.split(":")[0].strip()
            if name:
                cols.add(name)
    return cols


def exchange_count(df: DataFrame) -> int:
    """Shuffle exchanges in the plan — hash, range AND single-partition
    (a global agg/limit that regresses into an extra shuffle counts)."""
    text = formatted_plan(df)
    return (
        text.count("Exchange hashpartitioning")
        + text.count("Exchange rangepartitioning")
        + text.count("Exchange SinglePartition")
    )


def broadcast_join_count(df: DataFrame) -> int:
    return formatted_plan(df).count("BroadcastHashJoin")


#: every plan-node name that executes Python. ``FlatMapCoGroupsInPandas``
#: does NOT contain the substring ``FlatMapGroupsInPandas`` (the ``Co``
#: breaks it) and must be listed separately; none of these is a substring
#: of another, so summing counts never double-counts.
_PYTHON_MARKERS = (
    "BatchEvalPython",
    "ArrowEvalPython",
    "FlatMapGroupsInPandas",
    "FlatMapCoGroupsInPandas",
    "MapInPandas",
    "PythonMapInArrow",
)


def python_eval_count(df: DataFrame) -> int:
    """Python-executed operators in the plan (row UDFs, pandas UDFs, the
    grouped/cogrouped/iterator Arrow forms, mapInArrow). The hot-path
    contract: zero unless the operator is explicitly UDF-tier (OP-31
    normalize, multimodal decode, grouped threading, BLAS kernels)."""
    text = formatted_plan(df)
    return sum(text.count(marker) for marker in _PYTHON_MARKERS)
