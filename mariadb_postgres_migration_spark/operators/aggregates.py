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

from pyspark.sql import Column, DataFrame, Window
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


def ols_trend(
    df: DataFrame,
    group_col: str,
    x: Column,
    y: Column,
    min_n: int = 2,
) -> DataFrame:
    """Per-group ordinary-least-squares trend line (EXT-ANALYTICS): the
    slope/intercept of integer ``y`` over integer ``x`` — "is this user's
    spend rising", "is this part's price drifting" — as ONE extra
    aggregate pass, never a per-group regression loop.

    Numeric contract (the property that makes an OLS hash-verifiable
    across engines): ``x``/``y`` must already be integers (epoch-days,
    cents). Both are CENTERED per group on their minimum — an OLS line is
    shift-invariant, and centering keeps Σdx·dy / Σdx² within BIGINT at
    any group size (uncentered epoch-day×cent products overflow int64
    around 10^9 rows per group) — so every SUM is exact, order-free
    integer arithmetic. Only the final slope/intercept combination runs
    in doubles, and both engines evaluate the IDENTICAL expression tree
    over identical integers, so IEEE round-to-nearest produces the same
    bits (the x90 cast-before-multiply convention); outputs round to 6.

    Plan: one groupBy for the per-group minima, a keyed join back (the
    spine is group-keyed — millions of groups shuffle fine), and one
    map-side-combined sums aggregate. Groups with < ``min_n`` rows or a
    degenerate x-range (den = 0) are dropped.

    Returns ``(group, n, slope, intercept)``.
    """
    base = df.select(
        F.col(group_col).alias("g"),
        x.cast("long").alias("x"),
        y.cast("long").alias("y"),
    ).filter(F.col("x").isNotNull() & F.col("y").isNotNull())
    mins = base.groupBy("g").agg(
        F.min("x").alias("x0"), F.min("y").alias("y0")
    )
    c = base.join(mins, "g").select(
        "g",
        (F.col("x") - F.col("x0")).alias("dx"),
        (F.col("y") - F.col("y0")).alias("dy"),
        "x0", "y0",
    )
    s = c.groupBy("g").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("dx").alias("sx"),
        F.sum("dy").alias("sy"),
        F.sum(F.col("dx") * F.col("dy")).alias("sxy"),
        F.sum(F.col("dx") * F.col("dx")).alias("sxx"),
        F.first("x0").alias("x0"),
        F.first("y0").alias("y0"),
    )
    nd = F.col("n").cast("double")
    num = nd * F.col("sxy").cast("double") - F.col("sx").cast("double") * F.col("sy").cast("double")
    den = nd * F.col("sxx").cast("double") - F.col("sx").cast("double") * F.col("sx").cast("double")
    slope = num / den
    # intercept in ORIGINAL coordinates: the centered-line intercept
    # (Σdy − slope·Σdx)/n, shifted back by (y0 − slope·x0)
    intercept = (
        (F.col("sy").cast("double") - slope * F.col("sx").cast("double")) / nd
        + F.col("y0").cast("double")
        - slope * F.col("x0").cast("double")
    )
    return (
        s.filter((F.col("n") >= min_n) & (den != F.lit(0.0)))
        .select(
            F.col("g").alias(group_col),
            "n",
            F.round(slope, 6).alias("slope"),
            F.round(intercept, 6).alias("intercept"),
        )
    )


def ols_trend_sql(
    rows_cte: str, group_col: str, min_n: int = 2
) -> str:
    """DuckDB oracle for :func:`ols_trend`: the identical centered sums
    and the identical double expression tree (NOT regr_slope — its
    float accumulation order is engine-internal; this mirror keeps every
    sum integer-exact so the doubles agree bit-for-bit). ``rows_cte``
    must yield ``(g, x, y)`` integers."""
    return f"""WITH r AS ({rows_cte}),
  nn AS (SELECT g, CAST(x AS BIGINT) AS x, CAST(y AS BIGINT) AS y
         FROM r WHERE x IS NOT NULL AND y IS NOT NULL),
  mins AS (SELECT g, min(x) AS x0, min(y) AS y0 FROM nn GROUP BY g),
  c AS (SELECT nn.g, nn.x - m.x0 AS dx, nn.y - m.y0 AS dy, m.x0, m.y0
        FROM nn JOIN mins m ON nn.g = m.g),
  s AS (SELECT g, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(dx) AS BIGINT) AS sx, CAST(sum(dy) AS BIGINT) AS sy,
               CAST(sum(dx * dy) AS BIGINT) AS sxy,
               CAST(sum(dx * dx) AS BIGINT) AS sxx,
               min(x0) AS x0, min(y0) AS y0
        FROM c GROUP BY g),
  e AS (SELECT g, n, x0, y0,
               CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                 - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) AS num,
               CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                 - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) AS den,
               CAST(sx AS DOUBLE) AS sxd, CAST(sy AS DOUBLE) AS syd
        FROM s)
SELECT g AS {group_col}, n,
       round(num / den, 6) AS slope,
       round((syd - (num / den) * sxd) / CAST(n AS DOUBLE)
             + CAST(y0 AS DOUBLE) - (num / den) * CAST(x0 AS DOUBLE),
             6) AS intercept
FROM e WHERE n >= {min_n} AND den <> 0.0"""


def gini_concentration(
    values: DataFrame,
    group_col: str = "g",
    id_col: str = "k",
    cents_col: str = "cents",
) -> DataFrame:
    """Per-group Gini coefficient of a non-negative integer-cents value
    distribution (EXT-ANALYTICS): the inequality/concentration audit —
    "is this nation's revenue carried by three whales", the revenue-
    concentration analog of x127's distribution-shape drift. G = 0 is
    perfect equality, → 1 is total concentration.

    Integer-exact algebra (ascending sort, deterministic (value, id)
    rank i = 1..n): G = (2·Σ i·x_i − (n+1)·Σx) / (n·Σx) — numerator and
    denominator are exact int64 and the quotient is ONE deterministic
    IEEE division rounded to 4. int64 bound: Σ i·x_i ≤ n²·mean_cents,
    inside int64 while n²·mean < 2^63 — with 10⁷-cent means that is
    n ≈ 3·10⁷ members per group; beyond that, pre-aggregate the value
    unit (whole currency units) or shard the group dimension.

    Plan: one groupBy of the input (callers pre-aggregate the fact table
    to (group, id, cents) — e.g. per-customer spend), one rank window
    and one final aggregate sharing the SAME group-keyed exchange; no
    whole-table sort, no driver work.

    Returns ``(group, n_members, total_cents, gini)``."""
    w = Window.partitionBy(group_col).orderBy(cents_col, id_col)
    ranked = values.select(
        F.col(group_col).alias("g"),
        F.col(cents_col).cast("long").alias("x"),
        F.row_number().over(w).cast("long").alias("i"),
    )
    return (
        ranked.groupBy(F.col("g").alias(group_col))
        .agg(
            F.count("*").cast("long").alias("n_members"),
            F.sum("x").cast("long").alias("total_cents"),
            F.sum(F.col("i") * F.col("x")).cast("long").alias("__ix"),
        )
        .select(
            group_col, "n_members", "total_cents",
            # zero guard (ADVICE r8): a group whose members all have
            # cents=0 yields 0/0 → NaN, an engine-sensitive value; define
            # perfect-equality-at-zero as gini 0.0 in BOTH engines
            # (mirrors the mann_kendall s_stat=0 special case).
            F.when(F.col("total_cents") == 0, F.lit(0.0))
            .otherwise(
                F.round(
                    (
                        2 * F.col("__ix")
                        - (F.col("n_members") + 1) * F.col("total_cents")
                    ).cast("double")
                    / (
                        F.col("n_members") * F.col("total_cents")
                    ).cast("double"),
                    4,
                )
            )
            .alias("gini"),
        )
    )


def gini_concentration_sql(rows_cte: str, group_col: str = "g") -> str:
    """DuckDB oracle for :func:`gini_concentration`; ``rows_cte`` must
    yield ``(g, k, cents)`` pre-aggregated member rows."""
    return f"""WITH vals AS ({rows_cte}),
ranked AS (SELECT g, CAST(cents AS BIGINT) AS x,
                  CAST(row_number() OVER (PARTITION BY g
                                          ORDER BY cents, k) AS BIGINT) AS i
           FROM vals),
acc AS (SELECT g, CAST(count(*) AS BIGINT) AS n_members,
               CAST(sum(x) AS BIGINT) AS total_cents,
               CAST(sum(i * x) AS BIGINT) AS ix
        FROM ranked GROUP BY g)
SELECT g AS {group_col}, n_members, total_cents,
       CASE WHEN total_cents = 0 THEN 0.0
            ELSE round(CAST(2 * ix - (n_members + 1) * total_cents AS DOUBLE)
                       / CAST(n_members * total_cents AS DOUBLE), 4)
            END AS gini
FROM acc"""
