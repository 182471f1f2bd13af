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

from pyspark.sql import Column, DataFrame, Window
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
    import os

    if not os.environ.get("MPS_PROFILE_FLOOR_OFF"):
        # r13 (guide §2.1/§2.6, the x104 device): a one-row-group fixture
        # scan runs the whole Expand × canon-expression × partial-distinct
        # pass as ONE task (profiled at sf0.1: 3.57 CPU-s single-task, the
        # entire x106 stage budget). The round-robin spread is trivially
        # small next to the per-row Expand work; at 100 TB scans arrive as
        # thousands of splits and this is a no-op.
        from .dedup import ensure_min_parallelism

        df = ensure_min_parallelism(df)
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


#: Benford expected first-digit frequencies in parts-per-million:
#: round(1e6 * log10(1 + 1/d)) for d = 1..9 — materialized ONCE in Python
#: (math.log10) and embedded as integer literals in BOTH engines, so no
#: runtime transcendental can ulp-drift between them. They sum to exactly
#: 1,000,000.
BENFORD_PPM = (301030, 176091, 124939, 96910, 79181, 66947, 57992, 51153, 45757)


def benford_audit(df: DataFrame, value_col: str) -> DataFrame:
    """First-significant-digit distribution vs Benford's law
    (EXT-AUDIT): the classic fraud/corruption screen for naturally-grown
    numeric columns (amounts, populations, file sizes) — a migration
    that mangles decimals (the OP-27 int-parse family of bugs) or a
    generator that fakes data shifts this distribution violently while
    leaving count/min/max profiles (x106) intact.

    The digit is taken from the integer CENTS (half-up, the repo-wide
    fixed-point recipe), so it is a pure string-head of an exact
    integer; observed shares are integer ppm (1e6·n div total). One
    scan, one 9-group aggregate; the expected shares are compile-time
    literals (see BENFORD_PPM).

    Returns ``(digit, n, n_total, obs_ppm, exp_ppm, dev_ppm)``, one row
    per digit 1..9."""
    cents = F.floor(F.col(value_col) * 100 + F.lit(0.5)).cast("long")
    digits = (
        df.select(cents.alias("c"))
        .filter(F.col("c") > 0)
        .select(F.substring(F.col("c").cast("string"), 1, 1).cast("long").alias("digit"))
        .groupBy("digit")
        .agg(F.count("*").cast("long").alias("n"))
    )
    total = digits.agg(F.sum("n").cast("long").alias("n_total"))
    exp_map = F.element_at(
        F.array(*[F.lit(p).cast("long") for p in BENFORD_PPM]),
        F.col("digit").cast("int"),
    )
    return (
        digits.join(F.broadcast(total))  # bounded: 1-row scalar total
        .select(
            "digit", "n", "n_total",
            F.expr("(1000000 * n) div n_total").cast("long").alias("obs_ppm"),
            exp_map.alias("exp_ppm"),
        )
        .select(
            "*",
            F.abs(F.col("obs_ppm") - F.col("exp_ppm")).cast("long").alias("dev_ppm"),
        )
    )


def benford_audit_sql(rows_cte: str) -> str:
    """DuckDB oracle for :func:`benford_audit`; ``rows_cte`` must yield
    integer ``cents``."""
    exp_list = ", ".join(str(p) for p in BENFORD_PPM)
    return f"""WITH raw AS ({rows_cte}),
d AS (SELECT CAST(substr(CAST(cents AS VARCHAR), 1, 1) AS BIGINT) AS digit,
             CAST(count(*) AS BIGINT) AS n
      FROM raw WHERE cents > 0 GROUP BY 1),
t AS (SELECT CAST(sum(n) AS BIGINT) AS n_total FROM d)
SELECT digit, n, n_total,
       CAST((1000000 * n) // n_total AS BIGINT) AS obs_ppm,
       CAST(([{exp_list}])[CAST(digit AS INTEGER)] AS BIGINT) AS exp_ppm,
       CAST(abs((1000000 * n) // n_total
                - ([{exp_list}])[CAST(digit AS INTEGER)]) AS BIGINT) AS dev_ppm
FROM d, t"""


def ks_source_drift(
    docs: DataFrame,
    group_col: str = "source",
    value_col: str = "n_chars",
) -> DataFrame:
    """Per-source two-sample Kolmogorov–Smirnov drift of a numeric column's
    distribution against the whole corpus (EXT-AUDIT/EXT-ANALYTICS): for
    each source s, D_s = sup_v |ECDF_s(v) − ECDF_all(v)| — the
    distribution-SHAPE drift screen next to x64's per-term odds ratio and
    x118's first-digit audit ("this crawl batch's document-length
    distribution changed", the classic ingest regression).

    Integer-exact algebra: with n_s = |s|, N = |corpus|, the statistic is
    computed SCALED — d_scaled = max_v |N·cum_s(v) − n_s·cum_all(v)| — so
    the sup is an exact int64 argmax in both engines (the conventional
    float D = d_scaled/(N·n_s) is emitted as integer ppm by one exact
    integer division). |N·cum_s| ≤ N·n_s, inside int64 while N·n_s < 2^63
    (≈3·10⁹ docs in BOTH the source and the corpus — beyond-100 TB
    territory; shard the corpus dimension before that). Ties: largest
    d_scaled at the SMALLEST v.

    Plan: one (group, value) partial-aggregated count of the scan, then
    everything downstream operates on the bounded (|groups| × |distinct
    values|) grid — the evaluation grid is built with a crossJoin that is
    bounded by construction (sources × distinct lengths, corpus-size-
    independent), cumulated with one window pass per axis, and reduced
    with a max_by argmax. The big table is scanned ONCE and shuffled
    once.

    Returns ``(source, n_docs, n_total, d_scaled, at_value, d_ppm)``."""
    g, v = group_col, value_col
    c_sv = (
        docs.select(F.col(g).alias("g"), F.col(v).cast("long").alias("v"))
        .filter(F.col("v").isNotNull())
        .groupBy("g", "v")
        .agg(F.count("*").cast("long").alias("c"))
    )
    c_v = c_sv.groupBy("v").agg(F.sum("c").cast("long").alias("cv"))
    srcs = c_sv.groupBy("g").agg(F.sum("c").cast("long").alias("n_s"))
    # bounded: the grid is |distinct values| x |sources| rows — both axes
    # grow with data VARIETY (length cap, crawl-source count), not with
    # corpus row count, so the crossJoin is constant-sized by contract.
    grid = c_v.select("v").crossJoin(srcs.select("g"))
    full = grid.join(c_sv, ["g", "v"], "left").fillna({"c": 0})
    w_s = (
        Window.partitionBy("g")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_all = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    cum_all = c_v.select(
        "v", F.sum("cv").over(w_all).cast("long").alias("cum_all")
    )
    n_tot = c_v.agg(F.sum("cv").cast("long").alias("n_total"))
    scored = (
        full.select("g", "v", F.sum("c").over(w_s).cast("long").alias("cum_s"))
        .join(cum_all, "v")
        # bounded: srcs is one row per source, n_tot is exactly 1 row
        .join(F.broadcast(srcs), "g")
        .join(F.broadcast(n_tot))  # bounded: 1-row scalar total
        .select(
            "g", "v", "n_s", "n_total",
            F.abs(
                F.col("n_total") * F.col("cum_s")
                - F.col("n_s") * F.col("cum_all")
            ).cast("long").alias("d"),
        )
    )
    return (
        scored.groupBy(F.col("g").alias(g))
        .agg(
            F.max(
                F.struct(
                    F.col("d"), (-F.col("v")).alias("nv"),
                    F.col("v"), F.col("n_s"), F.col("n_total"),
                )
            ).alias("m")
        )
        .select(
            g,
            F.col("m.n_s").alias("n_docs"),
            F.col("m.n_total").alias("n_total"),
            F.col("m.d").alias("d_scaled"),
            F.col("m.v").alias("at_value"),
            # exact integer division on both engines (Spark `div` ==
            # DuckDB `//`); the ppm rescale tightens the int64 bound to
            # 10⁶·N·n_s < 2^63 (N·n_s < 9.2·10¹²) — past that, drop this
            # convenience column and rank by the exact d_scaled alone
            F.expr(
                "CAST((1000000 * m.d) DIV (m.n_total * m.n_s) AS BIGINT)"
            ).alias("d_ppm"),
        )
    )


def ks_source_drift_sql(
    rows_cte: str, group_col: str = "source"
) -> str:
    """DuckDB oracle for :func:`ks_source_drift`; ``rows_cte`` must yield
    ``(g, v)`` rows (group label, long value, nulls pre-filtered or not —
    the oracle filters)."""
    return f"""WITH raw AS ({rows_cte}),
c_sv AS (SELECT g, v, CAST(count(*) AS BIGINT) AS c
         FROM raw WHERE v IS NOT NULL GROUP BY g, v),
c_v AS (SELECT v, CAST(sum(c) AS BIGINT) AS cv FROM c_sv GROUP BY v),
srcs AS (SELECT g, CAST(sum(c) AS BIGINT) AS n_s FROM c_sv GROUP BY g),
tot AS (SELECT CAST(sum(cv) AS BIGINT) AS n_total FROM c_v),
grid AS (SELECT c_v.v, srcs.g, srcs.n_s FROM c_v, srcs),
full_g AS (SELECT grid.g, grid.v, grid.n_s, coalesce(c_sv.c, 0) AS c
           FROM grid LEFT JOIN c_sv ON grid.g = c_sv.g AND grid.v = c_sv.v),
cums AS (SELECT g, v, n_s,
                CAST(sum(c) OVER (PARTITION BY g ORDER BY v
                                  ROWS UNBOUNDED PRECEDING) AS BIGINT)
                AS cum_s
         FROM full_g),
cuma AS (SELECT v, CAST(sum(cv) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING)
                        AS BIGINT) AS cum_all
         FROM c_v),
scored AS (SELECT s.g, s.v, s.n_s, t.n_total,
                  abs(t.n_total * s.cum_s - s.n_s * a.cum_all) AS d
           FROM cums s JOIN cuma a ON s.v = a.v, tot t),
rk AS (SELECT *, row_number() OVER (PARTITION BY g ORDER BY d DESC, v) AS rn
       FROM scored)
SELECT g AS {group_col}, n_s AS n_docs, n_total,
       CAST(d AS BIGINT) AS d_scaled, v AS at_value,
       (1000000 * d) // (n_total * n_s) AS d_ppm
FROM rk WHERE rn = 1"""
