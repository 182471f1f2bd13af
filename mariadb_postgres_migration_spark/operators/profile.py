"""Table profiler (EXT-AUDIT): per-column null/distinct/min/max statistics
in ONE pass — the ``ANALYZE TABLE`` a migration engine runs before and
after a copy (the reference migrates tables blind, index.mjs:21-168; a
100 TB migration wants "did every column arrive with the same shape"
next to x66's row-level checksum, because a checksum says WHETHER
something broke while a profile says WHAT: the null-rate jump, the
truncated max, the collapsed cardinality).

Cross-engine value contract: every statistic is emitted through a
CANONICAL STRING form per column kind — BIGINTs as decimal strings,
doubles as half-up integer cents, timestamps as epoch-microseconds —
the repo-wide stabilization recipe (never raw doubles/timestamps in
query output). min/max aggregate on the TYPED column (numeric order,
not lexicographic) and canonicalize the 1-value result; distinct counts
run over the canonical form so both engines count identical key sets.

Plan shape: ONE aggregate over the scan. The multi-column exact
countDistinct plans as Spark's Expand (an N-column profile map-side
replicates each row N times before partial aggregation — the standard
price of exact multi-distinct in one pass, still one shuffle of
partial-agg rows); everything else rides the same pass free. The single
wide result row unpivots to (column, stat...) rows with a row-local
``stack``. At 100 TB this is strictly cheaper than N single-column
passes and needs no sampling."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: column kinds → canonicalization recipe
KINDS = ("int", "str", "cents", "ts")


def _canon(col: Column, kind: str) -> Column:
    """Canonical string form of a VALUE of the given kind (null-safe)."""
    if kind == "int":
        return col.cast("long").cast("string")
    if kind == "str":
        return col.cast("string")
    if kind == "cents":
        return F.floor(col * 100 + F.lit(0.5)).cast("long").cast("string")
    if kind == "ts":
        return F.unix_micros(col.cast("timestamp")).cast("string")
    raise ValueError(f"unknown kind {kind!r}")


def _canon_sql(expr: str, kind: str) -> str:
    if kind == "int":
        return f"CAST(CAST({expr} AS BIGINT) AS VARCHAR)"
    if kind == "str":
        return f"CAST({expr} AS VARCHAR)"
    if kind == "cents":
        return f"CAST(CAST(floor({expr} * 100 + 0.5) AS BIGINT) AS VARCHAR)"
    if kind == "ts":
        return f"CAST(epoch_us({expr}) AS VARCHAR)"
    raise ValueError(f"unknown kind {kind!r}")


def profile_table(df: DataFrame, cols: list[tuple[str, str]]) -> DataFrame:
    """One-pass profile: ``(column, n_rows, n_null, n_distinct, min_s,
    max_s)`` per (name, kind) in ``cols``. min/max are aggregated typed
    and canonicalized afterward; n_distinct counts canonical non-null
    values."""
    aggs = [F.count(F.lit(1)).cast("long").alias("__n")]
    for name, kind in cols:
        c = F.col(name)
        aggs.append(
            (F.count(F.lit(1)) - F.count(c)).cast("long").alias(f"__null_{name}")
        )
        aggs.append(
            F.count_distinct(_canon(c, kind)).cast("long").alias(f"__dist_{name}")
        )
        aggs.append(_canon(F.min(c), kind).alias(f"__min_{name}"))
        aggs.append(_canon(F.max(c), kind).alias(f"__max_{name}"))
    one = df.agg(*aggs)
    stack_args = []
    for name, _ in cols:
        stack_args.append(f"'{name}'")
        stack_args.extend(
            [f"__null_{name}", f"__dist_{name}", f"__min_{name}", f"__max_{name}"]
        )
    return one.select(
        F.expr(
            f"stack({len(cols)}, {', '.join(stack_args)})"
            " AS (column_name, n_null, n_distinct, min_s, max_s)"
        ),
        F.col("__n").alias("n_rows"),
    ).select("column_name", "n_rows", "n_null", "n_distinct", "min_s", "max_s")


def profile_table_sql(table: str, cols: list[tuple[str, str]]) -> str:
    """DuckDB oracle: one SELECT of per-column aggregates per column,
    UNION ALL'd — the unpivoted mirror of the one-pass profile."""
    parts = []
    for name, kind in cols:
        parts.append(
            f"""SELECT '{name}' AS column_name,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count(*) - count({name}) AS BIGINT) AS n_null,
       CAST(count(DISTINCT {_canon_sql(name, kind)}) AS BIGINT) AS n_distinct,
       {_canon_sql(f"min({name})", kind)} AS min_s,
       {_canon_sql(f"max({name})", kind)} AS max_s
FROM {table}"""
        )
    return "\nUNION ALL\n".join(parts)
