"""Distributed order statistics (EXT-ANALYTICS): exact quantiles without a
global sort, 2-D Pareto skylines, and deterministic weighted sampling.

The reference migrates rows verbatim (index.mjs:21-168) and never ranks
anything; a 100 TB curation pipeline constantly does — "the exact p99
document length", "the cost/quality frontier per source", "a 10-doc
weighted sample per language for eyeballing". The three operators here are
the scale-correct forms of those asks:

* :func:`exact_quantiles` is the classic distributed-selection algorithm
  (iterative histogram refinement): one full scan builds a B-bucket integer
  histogram, the driver locates each target rank's bucket from ≤B counter
  rows, and each refinement pass re-scans only the located bucket's value
  range — a *pushed-down* predicate, so the level-1 scan touches ~1/B of
  the data. No global sort, no single-partition window over the corpus;
  the final selection sorts a ≤``refine_limit``-row remainder. Exact by
  construction (rank arithmetic over exact integer counts), unlike
  approx_percentile's GK sketch.

* :func:`skyline_2d` computes a per-group Pareto frontier (maximize one
  dimension, minimize the other) as ONE aggregation plus a running-min
  window over the per-value deduped table — O(distinct max-dim values)
  window rows per group, not the O(n²) NOT-EXISTS dominance join the
  oracle runs. The two formulations are algorithmically independent, so
  the driver hash match is a real cross-check.

* :func:`weighted_sample` is sequential Poisson sampling (Ohlsson 1998):
  priority = u/w with u an md5-derived 32-bit integer, realized as the
  EXACT integer ``(u << 20) div w`` so both engines rank identical keys —
  no ``ln``/``pow`` in the ordering (the float-libm trap the repo avoids
  in every ranking path). Per-group top-k rides the same WindowGroupLimit
  plan as the KMV sketch: each map task ships at most k rows per group.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .reconcile import hex_chunk, hex_chunk_sql

#: histogram buckets per refinement level. 1024 buckets × 8 B counters is a
#: 8 KiB driver message per level; the value range shrinks ×1024 per level,
#: so a full 64-bit integer domain needs ≤7 levels.
QUANTILE_BUCKETS = 1024

#: stop refining once the candidate range holds this few rows — the final
#: selection is then a sort of ≤ this many rows (one executor, trivial).
QUANTILE_REFINE_LIMIT = 65536

#: priority scale for sequential Poisson sampling: u*2^20 stays < 2^52,
#: exact in BIGINT (and in a float64 mantissa, though we never go there).
SPS_SCALE = 1 << 20


def exact_quantiles(
    vals: DataFrame,
    value_col: str,
    qs: tuple[int, ...] = (50, 90, 99),
    n_buckets: int = QUANTILE_BUCKETS,
    refine_limit: int = QUANTILE_REFINE_LIMIT,
) -> DataFrame:
    """Exact percentile values (percentile_disc lower semantics: the value
    at 1-based rank ``ceil(q/100 * n)``) of an integer column, by
    histogram refinement.

    Driver state is bounded by contract: one 1-row stats collect plus ≤B
    counter rows per refinement level per target. The data never sorts
    globally; each level's scan filters to the surviving value range
    (``PushedFilters`` — pinned in tests/test_plans.py), and the final
    per-target selection is ``sort().limit(rank)`` over a ≤refine_limit
    remainder, which Spark executes as a TakeOrderedAndProject-style
    bounded top-k, not a full exchange.

    Returns one row per target: ``(q_pct, rank, value)``, all BIGINT.
    """
    p = F.col(value_col).cast("long")
    vals = vals.select(p.alias("__p")).filter(F.col("__p").isNotNull())
    lo, hi, n = vals.agg(
        F.min("__p"), F.max("__p"), F.count("*")
    ).first()
    if not n:
        raise ValueError("exact_quantiles: empty input")

    # histograms are memoized per (lo, width): at level 0 EVERY target
    # shares the same full range, so one scan serves all of them — the
    # multi-quantile case costs 1 full scan + one ~1/B-range scan per
    # target, not |qs| full scans (at deeper levels targets diverge into
    # disjoint ranges, where per-target scans are the tiny pushed-down
    # remainders anyway)
    memo: dict[tuple[int, int], dict[int, int]] = {}

    def histogram(lo_t: int, width: int):
        got = memo.get((lo_t, width))
        if got is not None:
            return got
        rows = (
            vals.filter(F.col("__p").between(lo_t, lo_t + width * n_buckets - 1))
            .groupBy(
                F.expr(f"(__p - CAST({lo_t} AS BIGINT)) div CAST({width} AS BIGINT)").alias("__b")
            )
            .agg(F.count("*").alias("__c"))
            .collect()
        )
        got = {r["__b"]: r["__c"] for r in rows}
        memo[(lo_t, width)] = got
        return got

    out = None
    for q in qs:
        # ceil without floats — (x + 99) // 100 is the same value under
        # floor (Python) and truncate-toward-zero (DuckDB //) division
        # because the operands are positive; rank is 1-based, ≥ 1
        rank = max(1, (q * n + 99) // 100)
        lo_t, hi_t, cnt_t, r_t = lo, hi, n, rank
        while cnt_t > refine_limit and hi_t > lo_t:
            width = (hi_t - lo_t) // n_buckets + 1
            counts = histogram(lo_t, width)
            cum = 0
            for b in range(n_buckets):
                c = counts.get(b, 0)
                if cum + c >= r_t:
                    r_t -= cum
                    cnt_t = c
                    lo_t, hi_t = lo_t + b * width, min(hi_t, lo_t + (b + 1) * width - 1)
                    break
                cum += c
            else:  # pragma: no cover - rank arithmetic guarantees a hit
                raise AssertionError("rank walked past the histogram")
        if lo_t == hi_t:
            # the range collapsed to one value (e.g. a pathological skew
            # spike holding > refine_limit rows of a single value) — the
            # answer is known; don't sort-limit a huge remainder
            sel = vals.sparkSession.range(1).select(
                F.lit(q).cast("long").alias("q_pct"),
                F.lit(rank).cast("long").alias("rank"),
                F.lit(lo_t).cast("long").alias("value"),
            )
        else:
            sel = (
                vals.filter(F.col("__p").between(lo_t, hi_t))
                .sort("__p")
                .limit(r_t)
                .agg(
                    F.lit(q).cast("long").alias("q_pct"),
                    F.lit(rank).cast("long").alias("rank"),
                    F.max("__p").alias("value"),
                )
            )
        out = sel if out is None else out.unionAll(sel)
    return out


def exact_quantiles_sql(vals_cte: str, qs: tuple[int, ...] = (50, 90, 99)) -> str:
    """DuckDB oracle: the same rank math over an explicit row_number — a
    full sort the Spark operator exists to avoid, fine at oracle scale.
    ``vals_cte`` must yield one BIGINT column ``p``."""
    targets = ", ".join(f"({q})" for q in qs)
    return f"""WITH vals AS ({vals_cte}),
  nn AS (SELECT p FROM vals WHERE p IS NOT NULL),
  ordered AS (SELECT p, row_number() OVER (ORDER BY p) AS rn FROM nn),
  tot AS (SELECT count(*) AS n FROM nn),
  tgt AS (SELECT q, CAST(greatest(1, (q * n + 99) // 100) AS BIGINT) AS r
          FROM (VALUES {targets}) AS t(q), tot)
SELECT CAST(tgt.q AS BIGINT) AS q_pct, tgt.r AS rank, o.p AS value
FROM tgt JOIN ordered o ON o.rn = tgt.r"""


def skyline_2d(
    df: DataFrame,
    group_col: str,
    max_col: str,
    min_col: str,
    id_col: str,
) -> DataFrame:
    """Per-group Pareto frontier: rows not dominated within their group,
    where a dominator is ≥ on ``max_col``, ≤ on ``min_col``, and strictly
    better on at least one. Both columns must already be integers.

    Plan shape: one (group, max_val) aggregation, a running-min window
    over the per-value deduped table (≤ distinct(max_col) rows per group
    — p_size has 50 values, not 20k rows), then a semi-join back to the
    fact rows. One shuffle on (group, max_val), one on group for the
    window; no self-join on the fact table.
    """
    g, mx, mn = F.col(group_col), F.col(max_col).cast("long"), F.col(min_col).cast("long")
    base = df.select(
        g.alias("grp"), mx.alias("mx"), mn.alias("mn"), F.col(id_col).alias("rid")
    )
    per_value = base.groupBy("grp", "mx").agg(F.min("mn").alias("best_mn"))
    w = (
        Window.partitionBy("grp")
        .orderBy(F.col("mx").desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    frontier = (
        per_value.withColumn("prev_best", F.min("best_mn").over(w))
        # strictly better than every larger-mx row's best => not dominated
        .filter(F.col("prev_best").isNull() | (F.col("best_mn") < F.col("prev_best")))
        # renamed so the join back to `base` (same lineage) is unambiguous
        .select(
            F.col("grp").alias("f_grp"),
            F.col("mx").alias("f_mx"),
            F.col("best_mn").alias("f_mn"),
        )
    )
    return (
        base.join(
            F.broadcast(frontier),  # bounded: refinement frontier <= histogram bucket budget per round
            (F.col("grp") == F.col("f_grp"))
            & (F.col("mx") == F.col("f_mx"))
            & (F.col("mn") == F.col("f_mn")),
        )
        .select("grp", "rid", "mx", "mn")
        .toDF(group_col, id_col, max_col, min_col)
    )


def skyline_2d_sql(
    rows_cte: str, group_col: str, max_col: str, min_col: str, id_col: str
) -> str:
    """DuckDB oracle: the textbook NOT-EXISTS dominance predicate — an
    O(n²)-shaped formulation the Spark plan never runs, which makes the
    hash match a genuine two-algorithm cross-check."""
    return f"""WITH r AS ({rows_cte})
SELECT p.{group_col}, p.{id_col}, p.{max_col}, p.{min_col}
FROM r p
WHERE NOT EXISTS (
  SELECT 1 FROM r o
  WHERE o.{group_col} = p.{group_col}
    AND o.{max_col} >= p.{max_col} AND o.{min_col} <= p.{min_col}
    AND (o.{max_col} > p.{max_col} OR o.{min_col} < p.{min_col}))"""


def weighted_sample(
    df: DataFrame,
    group_col: str,
    id_col: str,
    weight_col: str,
    k: int = 10,
) -> DataFrame:
    """Deterministic weighted sample of k rows per group by sequential
    Poisson sampling: priority ``(u * 2^20) div max(w, 1)`` with
    ``u = md5(id)[0:8]`` as a 32-bit integer — heavier rows draw smaller
    priorities more often, exactly the inclusion-probability-proportional
    -to-size scheme, and every arithmetic step is integer so the DuckDB
    oracle ranks the identical keys. Ties (same priority after the
    integer division) break on id.

    Per-group top-k by ``row_number() <= k`` rides WindowGroupLimit: the
    rank filter pushes below the exchange, so each map task ships at most
    k rows per group regardless of corpus size."""
    u = hex_chunk(F.md5(F.col(id_col).cast("string")), 1)
    pri = F.expr(
        f"(CAST({SPS_SCALE} AS BIGINT) * __u) div greatest(weight, CAST(1 AS BIGINT))"
    )
    w = Window.partitionBy("grp").orderBy("pri", "rid")
    return (
        df.select(
            F.col(group_col).alias("grp"),
            F.col(id_col).alias("rid"),
            F.col(weight_col).cast("long").alias("weight"),
            u.alias("__u"),
        )
        .withColumn("pri", pri)
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select(
            F.col("grp").alias(group_col),
            F.col("rk").cast("long").alias("rk"),
            F.col("rid").alias(id_col),
            "weight",
            "pri",
        )
    )


def weighted_sample_sql(
    rows_cte: str, group_col: str, id_col: str, weight_col: str, k: int = 10
) -> str:
    """DuckDB oracle: identical integer priority + rank (hex_chunk_sql is
    the shared md5→BIGINT nibble fold)."""
    u = hex_chunk_sql(f"md5(CAST({id_col} AS VARCHAR))", 1)
    return f"""WITH r AS ({rows_cte}),
  pr AS (SELECT {group_col}, {id_col},
                CAST({weight_col} AS BIGINT) AS weight,
                ({SPS_SCALE} * {u}) // greatest(CAST({weight_col} AS BIGINT), 1) AS pri
         FROM r),
  rk AS (SELECT *, row_number() OVER (PARTITION BY {group_col}
                                      ORDER BY pri, {id_col}) AS rk
         FROM pr)
SELECT {group_col}, CAST(rk AS BIGINT) AS rk, {id_col}, weight, pri
FROM rk WHERE rk <= {k}"""


def equidepth_histogram(
    vals: DataFrame,
    value_col: str,
    n_bins: int = 10,
    n_buckets: int = QUANTILE_BUCKETS,
    refine_limit: int = QUANTILE_REFINE_LIMIT,
) -> DataFrame:
    """Equi-depth (equal-frequency) histogram of an integer column:
    ``n_bins`` buckets bounded by the exact ``i/n_bins`` quantiles, with
    per-bucket ``(n_rows, sum, min, max)`` — the optimizer-statistics /
    drift-monitoring shape (equi-WIDTH histograms collapse under skew;
    equi-depth puts the resolution where the data is).

    This is the scale-correct NTILE: a window ``ntile(n)`` ships every
    row through one ordering per partition — a global sort when the
    "partition" is the whole corpus. Here the boundaries come from
    :func:`exact_quantiles` (1 full scan + a tiny pushed-down scan per
    boundary, thanks to the shared level-0 histogram), land on the
    driver as ``n_bins - 1`` longs (a bounded collect by contract, like
    the k-means centroids), and the assignment pass is one embarrassingly
    parallel projection + one map-side-combined groupBy over ≤ n_bins
    groups. Rows equal to a boundary fall in the LOWER bucket (strict
    ``>`` in the assignment), matching percentile_disc's lower-value
    semantics; duplicate-heavy columns may therefore leave some buckets
    empty rather than split a tied value across two.

    Returns ``(bucket, n_rows, sum_v, min_v, max_v)``, all BIGINT.
    """
    p = F.col(value_col).cast("long")
    clean = vals.select(p.alias("__p")).filter(F.col("__p").isNotNull())
    qs = tuple((100 * i) // n_bins for i in range(1, n_bins))
    bnd = sorted(
        r["value"]
        for r in exact_quantiles(
            clean, "__p", qs=qs, n_buckets=n_buckets, refine_limit=refine_limit
        ).collect()
    )
    bucket = F.lit(0)
    for b in bnd:
        bucket = bucket + F.when(F.col("__p") > F.lit(b), 1).otherwise(0)
    return (
        clean.select("__p", bucket.cast("long").alias("bucket"))
        .groupBy("bucket")
        .agg(
            F.count("*").cast("long").alias("n_rows"),
            F.sum("__p").cast("long").alias("sum_v"),
            F.min("__p").alias("min_v"),
            F.max("__p").alias("max_v"),
        )
    )


def equidepth_histogram_sql(vals_cte: str, n_bins: int = 10) -> str:
    """DuckDB oracle for :func:`equidepth_histogram`: boundaries via the
    same explicit row_number rank selection as the x92 oracle, assignment
    via a correlated strictly-greater count — formulations the Spark plan
    never uses. ``vals_cte`` must yield one BIGINT column ``p``."""
    qs = tuple((100 * i) // n_bins for i in range(1, n_bins))
    targets = ", ".join(f"({q})" for q in qs)
    return f"""WITH vals AS ({vals_cte}),
  nn AS (SELECT p FROM vals WHERE p IS NOT NULL),
  ordered AS (SELECT p, row_number() OVER (ORDER BY p) AS rn FROM nn),
  tot AS (SELECT count(*) AS n FROM nn),
  bnd AS (SELECT o.p AS b
          FROM (SELECT CAST(greatest(1, (q * n + 99) // 100) AS BIGINT) AS r
                FROM (VALUES {targets}) AS t(q), tot) tgt
          JOIN ordered o ON o.rn = tgt.r)
SELECT bucket, CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(p) AS BIGINT) AS sum_v, min(p) AS min_v, max(p) AS max_v
FROM (SELECT p, (SELECT count(*) FROM bnd WHERE nn.p > bnd.b) AS bucket
      FROM nn)
GROUP BY bucket"""


def percentile_rank(
    vals: DataFrame,
    id_col: str,
    value_col: str,
) -> DataFrame:
    """Exact per-mille percentile rank of every row's integer value —
    ``1000·(rank−1) div (n−1)`` with ``rank`` the 1-based position of the
    FIRST occurrence of the value in the global order (percent_rank
    semantics) — the rank-transform feature normalization (quantile
    scaling) a training pipeline applies to heavy-tailed numerics.

    The scale story: a window ``percent_rank()`` over the whole corpus is
    a single-partition global sort. Here the CDF is built on the DISTINCT
    VALUE table instead — per value one count, a running sum over the
    |distinct|-row table (that window IS single-partition, but over
    distinct values, not rows — the p2 trade), then a value-keyed join
    back to the fact rows. Exact for any row count; the |distinct| bound
    is the operator's contract (quantized cents, scores, sizes — not
    free-text keys).

    Returns ``(id, value, pr_milli)``.
    """
    base = vals.select(
        F.col(id_col).alias("rid"),
        F.col(value_col).cast("long").alias("v"),
    ).filter(F.col("v").isNotNull())
    counts = base.groupBy("v").agg(F.count("*").alias("c"))
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    cdf = counts.select(
        "v",
        F.coalesce(F.sum("c").over(w), F.lit(0)).alias("below"),
    )
    n = base.count()
    denom = max(n - 1, 1)
    return (
        base.join(cdf, "v")
        .select(
            F.col("rid").alias(id_col),
            F.col("v").alias(value_col),
            F.expr(f"(1000 * below) div {denom}").cast("long").alias("pr_milli"),
        )
    )


def percentile_rank_sql(rows_cte: str, id_col: str, value_col: str) -> str:
    """DuckDB oracle for :func:`percentile_rank`: the window
    ``percent_rank()`` itself, floored to per-mille — the formulation the
    Spark plan avoids, so the hash match cross-checks the CDF join
    against the textbook window. ``rows_cte`` must yield
    ``(rid, v)`` with BIGINT v."""
    return f"""WITH r AS ({rows_cte}),
  nn AS (SELECT rid, v FROM r WHERE v IS NOT NULL),
  pr AS (SELECT rid, v,
                CAST(rank() OVER (ORDER BY v) - 1 AS BIGINT) AS below,
                CAST(count(*) OVER () AS BIGINT) AS n
         FROM nn)
SELECT rid AS {id_col}, v AS {value_col},
       CAST((1000 * below) // greatest(n - 1, 1) AS BIGINT) AS pr_milli
FROM pr"""


def mad_robust(
    vals: DataFrame,
    value_col: str,
    n_buckets: int = QUANTILE_BUCKETS,
    refine_limit: int = QUANTILE_REFINE_LIMIT,
) -> DataFrame:
    """Exact robust center/scale of an integer column: the median and
    the median absolute deviation ``MAD = median(|x − median|)`` — the
    outlier-immune alternative to mean/std (a single corrupt 10^12-cent
    row shifts a mean arbitrarily but moves a median one rank), and the
    robust-z building block (flag when ``|x − med| > k·MAD``) production
    data-quality monitors prefer over x75's moment-based z-score.

    Composition of :func:`exact_quantiles` run twice: once over the
    values, once over the absolute deviations from the found median —
    each pass is the same predicate-pushed histogram-refinement
    selection (1 full scan + a geometric tail), so exact MAD costs ~2
    scans at any cardinality, never a sort. Driver state stays the
    bounded histogram walk; the 1-value medians ride the same contract
    as the quantile walk itself.

    Returns one row: ``(n, median, mad)``, all BIGINT.
    """
    p = F.col(value_col).cast("long")
    clean = vals.select(p.alias("__p")).filter(F.col("__p").isNotNull())
    n = clean.count()
    med = exact_quantiles(
        clean, "__p", qs=(50,), n_buckets=n_buckets, refine_limit=refine_limit
    ).first()["value"]
    dev = clean.select(F.abs(F.col("__p") - F.lit(med)).alias("__d"))
    mad = exact_quantiles(
        dev, "__d", qs=(50,), n_buckets=n_buckets, refine_limit=refine_limit
    ).first()["value"]
    return clean.sparkSession.range(1).select(
        F.lit(n).cast("long").alias("n"),
        F.lit(med).cast("long").alias("median"),
        F.lit(mad).cast("long").alias("mad"),
    )


def mad_robust_sql(vals_cte: str) -> str:
    """DuckDB oracle for :func:`mad_robust`: both medians via explicit
    row_number rank selection (the same lower-percentile_disc rank math
    as the x92 oracle), the second over the absolute deviations."""
    return f"""WITH vals AS ({vals_cte}),
  nn AS (SELECT p FROM vals WHERE p IS NOT NULL),
  tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM nn),
  med AS (SELECT p AS m FROM
            (SELECT p, row_number() OVER (ORDER BY p) AS rn FROM nn), tot
          WHERE rn = greatest(1, (50 * n + 99) // 100)),
  dev AS (SELECT abs(p - m) AS d FROM nn, med),
  mad AS (SELECT d FROM
            (SELECT d, row_number() OVER (ORDER BY d) AS rn FROM dev), tot
          WHERE rn = greatest(1, (50 * n + 99) // 100))
SELECT tot.n, med.m AS median, mad.d AS mad FROM tot, med, mad"""
