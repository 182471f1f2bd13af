"""Round-8 registered queries: the CUSUM series changepoint and
label-propagation communities (implemented in the r7 snapshot, registered
here — VERDICT r7 'What's missing #1'), plus two new analytics operators
(Spearman daily rank correlation, per-source Kolmogorov–Smirnov drift) —
and the two driver-window rows that fund and verify them
(q16_core_agg_suite consolidates the q1+q3 TPC-H standalones to free the
slot, x128_r8_ops_suite fills it), per the q15/x123 convention.

Registration/oracle conventions follow r7_queries: every standalone here
is tier 1 and every one is also a member of the tier-0 x128 suite, whose
oracle composes the members' SQL via member_oracle() so member edits
can't drift.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import functions as F

from .analytics_queries import (
    q1_pricing_summary,
    q3_shipping_priority,
    w1_topk_per_group,
    w2_3_window_analytics,
)
from .audit_queries import _X85_EDGES_CTE, _x85_edges
from .extension_queries import _TOKS_CTE, _suite_shape
from .operators import aggregates as AGG
from .operators import audit as A
from .operators import dedup as D
from .operators import graph as G
from .operators import profile as PRF
from .operators import textanalysis as T
from .registry import _t, member_oracle, register

# ---------------------------------------------------------------------------
# x124 — CUSUM changepoint per event type
# ---------------------------------------------------------------------------

_X124_EVENTS_CTE = "SELECT event_type AS et, epoch_us(ts) AS us FROM events"


@register(
    "x124_cusum_changepoint", A.cusum_changepoint_sql(_X124_EVENTS_CTE),
    "EXT-ANALYTICS", "EXT-ANOM", tier=1,
)
def x124_cusum_changepoint(spark, sf_dir):
    """Per-event-type CUSUM changepoint over the daily-count series
    (:func:`operators.audit.cusum_changepoint`, Page 1954) — the
    SERIES-level rate-break locator complementing x75's pointwise
    z-score. The statistic is mean-centered cumulative deviation scaled
    by n (S'_d = n·Σv − d·T), pure int64, so the argmax is exact in
    both engines; ties resolve largest |S'| then earliest day."""
    return A.cusum_changepoint(_t(spark, sf_dir, "events"))


# ---------------------------------------------------------------------------
# x125 — label-propagation communities on the co-purchase graph
# ---------------------------------------------------------------------------


@register(
    "x125_label_propagation", G.label_propagation_sql(_X85_EDGES_CTE),
    "EXT-GRAPH", tier=1,
)
def x125_label_propagation(spark, sf_dir):
    """3-round synchronous label propagation
    (:func:`operators.graph.label_propagation`, Raghavan 2007) over the
    same thresholded part co-purchase graph the other graph kernels
    share (x85/x94/x100/x105's memoized edge frame) — community
    detection next to x27/x41's connected components: LPA splits dense
    regions CC merges. Deterministic smallest-label tie-break makes the
    fixed-round unroll hash-verifiable."""
    return G.label_propagation(_x85_edges(spark, sf_dir))


# ---------------------------------------------------------------------------
# x126 — Spearman rank correlation of the daily count/revenue series
# ---------------------------------------------------------------------------

_X126_ROWS_CTE = (
    "SELECT epoch_us(o_orderdate) // 86400000000 AS day, "
    "CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents FROM orders"
)


@register(
    "x126_spearman_daily", A.spearman_daily_sql(_X126_ROWS_CTE),
    "EXT-ANALYTICS", "EXT-AGG", tier=1,
)
def x126_spearman_daily(spark, sf_dir):
    """Spearman rank correlation between daily order count and daily
    revenue cents (:func:`operators.audit.spearman_daily`) — the
    monotone-association probe on the same day-series base as x117's
    autocorrelation. Ranks are deterministic permutations (value, day
    tiebreak), Σd² exact int64 bounded by the calendar, ρ one IEEE
    expression rounded to 4."""
    return A.spearman_daily(_t(spark, sf_dir, "orders"))


# ---------------------------------------------------------------------------
# x127 — per-source Kolmogorov–Smirnov length-distribution drift
# ---------------------------------------------------------------------------

_X127_ROWS_CTE = "SELECT source AS g, n_chars AS v FROM documents"


@register(
    "x127_ks_source_drift", PRF.ks_source_drift_sql(_X127_ROWS_CTE),
    "EXT-AUDIT", "EXT-ANALYTICS", tier=1,
)
def x127_ks_source_drift(spark, sf_dir):
    """Two-sample KS statistic of each source's document-length
    distribution against the whole corpus
    (:func:`operators.profile.ks_source_drift`) — the distribution-
    SHAPE ingest screen next to x64's per-term odds ratio and x118's
    first-digit audit. The sup is computed scaled
    (max |N·cum_s − n_s·cum_all|), an exact int64 argmax; one scan of
    the table, everything downstream bounded by sources × distinct
    lengths."""
    return PRF.ks_source_drift(_t(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# q16_core_agg_suite — TPC-H q1 + q3 as ONE driver row (frees the tier-0
# slot that funds x128; the standalones stay tier 1, and stay in the
# bench HEADLINE so the frozen r4/r6 series keep their members)
# ---------------------------------------------------------------------------


def _q16_sql() -> str:
    z = "CAST(0 AS BIGINT)"
    zd = "CAST(0.0 AS DOUBLE)"
    return f"""SELECT 'q1' AS kind, {z} AS id1, count_order AS v1,
       CAST(sum_qty AS DOUBLE) AS d1, CAST(sum_base_price AS DOUBLE) AS d2,
       CAST(sum_disc_price AS DOUBLE) AS d3, CAST(sum_charge AS DOUBLE) AS d4,
       CAST(avg_qty AS DOUBLE) AS d5, CAST(avg_price AS DOUBLE) AS d6,
       concat_ws('|', l_returnflag, l_linestatus) AS s1
FROM ({member_oracle('q1_pricing_summary')})
UNION ALL
SELECT 'q3', o_orderkey, o_orderdate_us, CAST(revenue AS DOUBLE), {zd}, {zd},
       {zd}, {zd}, {zd}, NULL
FROM ({member_oracle('q3_shipping_priority')})"""


@register(
    "q16_core_agg_suite", _q16_sql(), "EXT-AGG", "EXT-TOPK",
)
def q16_core_agg_suite(spark, sf_dir):
    """Driver row consolidating the two core TPC-H shapes (Q1 wide-scan
    aggregate, Q3 join + global top-10) — r8 window math: their two
    slots fund this row plus the x128 suite, exactly the consolidation
    q15 applied to q7/q10. The rounded doubles ride double slots
    losslessly (both members were driver-hash-green standalone through
    r7 with the same rounding)."""
    zl = F.lit(0).cast("long")
    zd = F.lit(0.0)
    ns = F.lit(None).cast("string")
    q1 = q1_pricing_summary(spark, sf_dir).select(
        F.lit("q1").alias("kind"), zl.alias("id1"),
        F.col("count_order").cast("long").alias("v1"),
        F.col("sum_qty").cast("double").alias("d1"),
        F.col("sum_base_price").cast("double").alias("d2"),
        F.col("sum_disc_price").cast("double").alias("d3"),
        F.col("sum_charge").cast("double").alias("d4"),
        F.col("avg_qty").cast("double").alias("d5"),
        F.col("avg_price").cast("double").alias("d6"),
        F.concat_ws("|", "l_returnflag", "l_linestatus").alias("s1"),
    )
    q3 = q3_shipping_priority(spark, sf_dir).select(
        F.lit("q3").alias("kind"), F.col("o_orderkey").alias("id1"),
        F.col("o_orderdate_us").cast("long").alias("v1"),
        F.col("revenue").cast("double").alias("d1"),
        zd.alias("d2"), zd.alias("d3"), zd.alias("d4"), zd.alias("d5"),
        zd.alias("d6"), ns.alias("s1"),
    )
    return q1.unionAll(q3)


# ---------------------------------------------------------------------------
# x128_r8_ops_suite — the r8 operator tail under one driver hash
# ---------------------------------------------------------------------------


def _x128_sql() -> str:
    z = "CAST(0 AS BIGINT)"
    zd = "CAST(0.0 AS DOUBLE)"
    return f"""SELECT 'cusum' AS kind, cp_day AS id1, {z} AS id2,
       s_abs AS v1, n_days AS v2, total AS v3,
       {zd} AS d1, {zd} AS d2, event_type AS s1
FROM ({member_oracle('x124_cusum_changepoint')})
UNION ALL
SELECT 'lp', node, lbl, {z}, {z}, {z}, {zd}, {zd}, NULL
FROM ({member_oracle('x125_label_propagation')})
UNION ALL
SELECT 'rho', n_days, sum_d2, {z}, {z}, {z}, CAST(rho AS DOUBLE), {zd}, NULL
FROM ({member_oracle('x126_spearman_daily')})
UNION ALL
SELECT 'ks', d_scaled, at_value, n_docs, n_total, d_ppm, {zd}, {zd}, source
FROM ({member_oracle('x127_ks_source_drift')})"""


@register(
    "x128_r8_ops_suite",
    _x128_sql(),
    "EXT-GRAPH", "EXT-ANOM", "EXT-AUDIT", "EXT-ANALYTICS", "EXT-AGG",
    tier=1,  # r12: consolidated into m10_r8ab_suite (stays in bench HEADLINE)
)
def x128_r8_ops_suite(spark, sf_dir):
    """Driver-verified representative for the round-8 operator tail,
    consolidated in the SAME round the operators landed (the x123/x84
    convention): the CUSUM changepoint (x124) and label-propagation
    communities (x125) — the two operators the r7 snapshot left
    unregistered — plus Spearman daily rank correlation (x126) and the
    per-source KS drift screen (x127), union-folded into the shared
    kind-tagged suite shape (4 small members → lazy union per the
    SCALE.md composition rule; r8 A/B: union 4.3-4.9s vs sequential
    5.2-5.6s warm — the stage concurrency wins here exactly as it did
    for x84a)."""
    # batch members' construction overlapped (guide §2.6); streaming
    # members (session-conf-mutating replays) stay sequential below
    __m_x124, __m_x125, __m_x126, __m_x127 = D.overlap(
        lambda: x124_cusum_changepoint(spark, sf_dir),
        lambda: x125_label_propagation(spark, sf_dir),
        lambda: x126_spearman_daily(spark, sf_dir),
        lambda: x127_ks_source_drift(spark, sf_dir),
    )
    members = [
        _suite_shape(
            __m_x124, "cusum",
            id1=F.col("cp_day"), v1=F.col("s_abs"), v2=F.col("n_days"),
            v3=F.col("total"), s1=F.col("event_type"),
        ),
        _suite_shape(
            __m_x125, "lp",
            id1=F.col("node"), id2=F.col("lbl"),
        ),
        _suite_shape(
            __m_x126, "rho",
            id1=F.col("n_days"), id2=F.col("sum_d2"), d1=F.col("rho"),
        ),
        _suite_shape(
            __m_x127, "ks",
            id1=F.col("d_scaled"), id2=F.col("at_value"),
            v1=F.col("n_docs"), v2=F.col("n_total"), v3=F.col("d_ppm"),
            s1=F.col("source"),
        ),
    ]
    return reduce(lambda a, b: a.unionAll(b), members)


# ===========================================================================
# r8 second wave: day-series robust-trend pair (x129 Mann-Kendall,
# x130 Theil-Sen), revenue-concentration Gini (x131), per-source
# vocabulary richness (x132) — funded by consolidating the w1/w2_3
# window standalones into w4_window_suite (same window math as q16/x128).
# ===========================================================================

_X129_DAY_CTE = "SELECT epoch_us(o_orderdate) // 86400000000 AS day FROM orders"


@register(
    "x129_mann_kendall", A.mann_kendall_daily_sql(_X129_DAY_CTE),
    "EXT-ANALYTICS", tier=1,
)
def x129_mann_kendall(spark, sf_dir):
    """Mann–Kendall trend test over the daily order-arrival series
    (:func:`operators.audit.mann_kendall_daily`) — the nonparametric
    "is traffic trending" screen next to x103's OLS and x126's rank
    correlation. S and the tie-corrected 18·Var(S) are exact int64 on
    the calendar-bounded day series; only the final continuity-
    corrected z is one IEEE expression rounded to 4."""
    return A.mann_kendall_daily(_t(spark, sf_dir, "orders"))


@register(
    "x130_theil_sen", A.theil_sen_daily_sql(_X129_DAY_CTE),
    "EXT-ANALYTICS", tier=1,
)
def x130_theil_sen(spark, sf_dir):
    """Theil–Sen robust trend slope over the daily order-arrival series
    (:func:`operators.audit.theil_sen_daily`): the median pairwise
    slope in exact per-mille integers (div/`//` truncation parity
    probed), located on the slope-value CDF — up to ~29% corrupt days
    cannot move it, where one outlier breaks OLS."""
    return A.theil_sen_daily(_t(spark, sf_dir, "orders"))


_X131_SPEND_CTE = """SELECT n.n_name AS g, c.c_custkey AS k,
       CAST(sum(CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
       AS cents
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY 1, 2"""


@register(
    "x131_gini_concentration",
    AGG.gini_concentration_sql(_X131_SPEND_CTE, "n_name"),
    "EXT-ANALYTICS", "EXT-AGG", tier=1,
)
def x131_gini_concentration(spark, sf_dir):
    """Per-nation Gini coefficient of customer total spend
    (:func:`operators.aggregates.gini_concentration`) — the revenue-
    concentration audit ("three whales or a broad base?") next to
    x127's distribution drift. Pre-aggregation to per-customer cents is
    one join+groupBy of the fact table; the Gini itself is one rank
    window + one aggregate on the same nation-keyed exchange, with the
    numerator/denominator exact int64 and one rounded IEEE division."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    spend = (
        o.join(c, F.col("o_custkey") == F.col("c_custkey"))
        # bounded: nation is a 25-row constant dim
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name", F.col("c_custkey").alias("k"))
        .agg(
            F.sum(F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long"))
            .cast("long")
            .alias("cents")
        )
    )
    return AGG.gini_concentration(spend, group_col="n_name")


@register(
    "x132_vocab_richness", T.vocab_richness_sql(),
    "EXT-05", "EXT-AUDIT", tier=1,
)
def x132_vocab_richness(spark, sf_dir):
    """Per-source vocabulary richness: exact token/type/hapax counts
    and integer-ppm type-token + hapax ratios
    (:func:`operators.textanalysis.vocab_richness`) — the lexical-
    diversity screen that catches template-generated sources x127's
    length shape misses. One tokenize pass + one (source, term)
    map-side-combined groupBy."""
    return T.vocab_richness(_t(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# w4_window_suite — the w1 + w2_3 window rows as ONE driver row (frees the
# tier-0 slot that funds x133; the standalones stay tier 1 and in HEADLINE)
# ---------------------------------------------------------------------------


def _w4_sql() -> str:
    z = "CAST(0 AS BIGINT)"
    zd = "CAST(0.0 AS DOUBLE)"
    return f"""SELECT 'w1' AS kind, p_partkey AS id1, rk AS id2,
       CAST(p_retailprice AS DOUBLE) AS d1, {zd} AS d2, p_brand AS s1
FROM ({member_oracle('w1_topk_per_group')})
UNION ALL
SELECT 'w23', event_id, user_id, CAST(gap_us AS DOUBLE),
       CAST(running_value AS DOUBLE), NULL
FROM ({member_oracle('w2_3_window_analytics')})"""


@register(
    "w4_window_suite", _w4_sql(), "EXT-TOPK", "EXT-WINDOW",
    tier=1,  # r10: consolidated into s6 (stays in bench HEADLINE + members)
)
def w4_window_suite(spark, sf_dir):
    """Driver row consolidating the two batch-window shapes (w1 grouped
    top-k via WindowGroupLimit, w2_3 fused lag + running-sum on one
    exchange) — r8 window math: their two slots fund this row plus the
    x133 suite. gap_us rides a double slot (microsecond gaps are far
    below 2^53, so the cast is exact in both engines; NULL first-row
    gaps stay NULL through the cast)."""
    zd = F.lit(0.0)
    w1 = w1_topk_per_group(spark, sf_dir).select(
        F.lit("w1").alias("kind"), F.col("p_partkey").alias("id1"),
        F.col("rk").alias("id2"),
        F.col("p_retailprice").cast("double").alias("d1"),
        zd.alias("d2"), F.col("p_brand").alias("s1"),
    )
    w23 = w2_3_window_analytics(spark, sf_dir).select(
        F.lit("w23").alias("kind"), F.col("event_id").alias("id1"),
        F.col("user_id").alias("id2"),
        F.col("gap_us").cast("double").alias("d1"),
        F.col("running_value").cast("double").alias("d2"),
        F.lit(None).cast("string").alias("s1"),
    )
    return w1.unionAll(w23)


# ---------------------------------------------------------------------------
# x133_r8b_ops_suite — the r8 second-wave operators under one driver hash
# ---------------------------------------------------------------------------


def _x133_sql() -> str:
    z = "CAST(0 AS BIGINT)"
    zd = "CAST(0.0 AS DOUBLE)"
    return f"""SELECT 'mk' AS kind, n_days AS id1, s_stat AS id2,
       var18 AS v1, {z} AS v2, {z} AS v3,
       CAST(z AS DOUBLE) AS d1, {zd} AS d2, NULL AS s1
FROM ({member_oracle('x129_mann_kendall')})
UNION ALL
SELECT 'tsen', n_days, n_pairs, slope_milli, {z}, {z}, {zd}, {zd}, NULL
FROM ({member_oracle('x130_theil_sen')})
UNION ALL
SELECT 'gini', n_members, {z}, total_cents, {z}, {z}, CAST(gini AS DOUBLE),
       {zd}, n_name
FROM ({member_oracle('x131_gini_concentration')})
UNION ALL
SELECT 'vocab', n_terms, n_types, n_hapax, ttr_ppm, hapax_ppm, {zd}, {zd},
       source
FROM ({member_oracle('x132_vocab_richness')})"""


@register(
    "x133_r8b_ops_suite",
    _x133_sql(),
    "EXT-05", "EXT-AUDIT", "EXT-ANALYTICS", "EXT-AGG",
    tier=1,  # r12: consolidated into m10_r8ab_suite (stays in bench HEADLINE)
)
def x133_r8b_ops_suite(spark, sf_dir):
    """Driver-verified representative for the round-8 second wave,
    consolidated the same round (the x123/x128 convention): the
    Mann–Kendall trend test (x129) and Theil–Sen robust slope (x130) —
    completing the day-series family x117/x126 started — plus the
    per-nation Gini revenue-concentration audit (x131) and per-source
    vocabulary-richness profile (x132), union-folded into the shared
    kind-tagged suite shape (4 small members → lazy union per the
    SCALE.md suite-composition rule)."""
    # batch members' construction overlapped (guide §2.6); streaming
    # members (session-conf-mutating replays) stay sequential below
    __m_x129, __m_x130, __m_x131, __m_x132 = D.overlap(
        lambda: x129_mann_kendall(spark, sf_dir),
        lambda: x130_theil_sen(spark, sf_dir),
        lambda: x131_gini_concentration(spark, sf_dir),
        lambda: x132_vocab_richness(spark, sf_dir),
    )
    return (
        _suite_shape(
            __m_x129, "mk",
            id1=F.col("n_days"), id2=F.col("s_stat"), v1=F.col("var18"),
            d1=F.col("z"),
        )
        .unionAll(_suite_shape(
            __m_x130, "tsen",
            id1=F.col("n_days"), id2=F.col("n_pairs"),
            v1=F.col("slope_milli"),
        ))
        .unionAll(_suite_shape(
            __m_x131, "gini",
            id1=F.col("n_members"), v1=F.col("total_cents"),
            d1=F.col("gini"), s1=F.col("n_name"),
        ))
        .unionAll(_suite_shape(
            __m_x132, "vocab",
            id1=F.col("n_terms"), id2=F.col("n_types"), v1=F.col("n_hapax"),
            v2=F.col("ttr_ppm"), v3=F.col("hapax_ppm"), s1=F.col("source"),
        ))
    )


# ===========================================================================
# r8 third wave: dedup-impact histogram (x134), inter-arrival burstiness
# (x135), Zipf doubling profile (x136) — funded by consolidating the
# set_operations/g_grouping_analytics standalones into s2_setgroup_suite.
# ===========================================================================


def _x134_sql() -> str:
    x27 = member_oracle("x27_dedup_connected_components")
    return D.cluster_size_histogram_sql(f"SELECT doc_id, rep FROM ({x27})")


@register(
    "x134_cluster_size_histogram", _x134_sql(), "EXT-01", "EXT-02", tier=1,
)
def x134_cluster_size_histogram(spark, sf_dir):
    """Near-dup cluster-size histogram over x27's connected-components
    assignment (:func:`operators.dedup.cluster_size_histogram`) — the
    dedup IMPACT report ("long tail of pairs or a few mega-clusters?")
    and the regression canary for the clustering operators: a threshold
    bug shifts this histogram violently while per-doc spot checks look
    fine. Two map-side-combined aggregates past the x27 plan; ≤ max-
    cluster-size rows at any corpus scale."""
    from .extension_queries import x27_dedup_connected_components

    asg = x27_dedup_connected_components(spark, sf_dir).select("doc_id", "rep")
    return D.cluster_size_histogram(asg)


_X135_EVENTS_CTE = (
    "SELECT user_id AS u, epoch_us(ts) AS us, event_id AS eid FROM events"
)


@register(
    "x135_interarrival_burstiness",
    A.interarrival_burstiness_sql(_X135_EVENTS_CTE),
    "EXT-ANALYTICS", "EXT-ANOM", tier=1,
)
def x135_interarrival_burstiness(spark, sf_dir):
    """Per-user inter-arrival CV² in integer milli
    (:func:`operators.audit.interarrival_burstiness`) — Poisson ≈ 1000,
    bot bursts far above, cron traffic far below; the rhythm screen
    next to x116's session counts. Gaps quantize to whole seconds so
    every moment is exact int64 (bound in the operator docstring); one
    user-keyed exchange carries the lag window and the final
    aggregate."""
    return A.interarrival_burstiness(_t(spark, sf_dir, "events"))


@register(
    "x136_zipf_profile",
    T.zipf_doubling_profile_sql(_TOKS_CTE),
    "EXT-05", tier=1,
)
def x136_zipf_profile(spark, sf_dir):
    """Zipf rank-frequency doubling profile
    (:func:`operators.textanalysis.zipf_doubling_profile`): f(2r)/f(r)
    in integer milli at power-of-two ranks — natural text sits near 500
    across the profile (s ≈ 1), template text collapses it; the log-log
    regression replaced by exact integer ratios. Top-1024 terms via
    distributed TakeOrdered, so the rank window never sees the
    vocabulary."""
    return T.zipf_doubling_profile(_t(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# s2_setgroup_suite — set ops + grouping analytics as ONE driver row
# ---------------------------------------------------------------------------


def _s2_sql() -> str:
    z = "CAST(0 AS BIGINT)"
    zd = "CAST(0.0 AS DOUBLE)"
    return f"""SELECT concat('set_', kind) AS kind, custkey AS id1, {z} AS v1,
       {zd} AS d1, NULL AS s1
FROM ({member_oracle('set_operations')})
UNION ALL
SELECT concat('g_', kind), {z}, n, CAST(total AS DOUBLE),
       concat_ws('|', coalesce(o_orderstatus, '~'),
                 coalesce(o_orderpriority, '~'))
FROM ({member_oracle('g_grouping_analytics')})"""


@register(
    "s2_setgroup_suite", _s2_sql(), "EXT-SET", "EXT-AGG",
    tier=1,  # r10: consolidated into s6 (stays in bench HEADLINE + members)
)
def s2_setgroup_suite(spark, sf_dir):
    """Driver row consolidating the set-algebra shapes (union/intersect/
    except) and the grouping-analytics shapes (rollup/cube/grouping
    sets) — r8 window math: their two slots fund this row plus the x137
    suite. NULL grouping keys canonicalize through coalesce('~') so the
    concat is deterministic in both engines."""
    from .analytics_queries import g_grouping_analytics, set_operations

    zl = F.lit(0).cast("long")
    zd = F.lit(0.0)
    so = set_operations(spark, sf_dir).select(
        F.concat(F.lit("set_"), F.col("kind")).alias("kind"),
        F.col("custkey").cast("long").alias("id1"),
        zl.alias("v1"), zd.alias("d1"),
        F.lit(None).cast("string").alias("s1"),
    )
    g = g_grouping_analytics(spark, sf_dir).select(
        F.concat(F.lit("g_"), F.col("kind")).alias("kind"),
        zl.alias("id1"), F.col("n").cast("long").alias("v1"),
        F.col("total").cast("double").alias("d1"),
        F.concat_ws(
            "|",
            F.coalesce(F.col("o_orderstatus"), F.lit("~")),
            F.coalesce(F.col("o_orderpriority"), F.lit("~")),
        ).alias("s1"),
    )
    return so.unionAll(g)


# ---------------------------------------------------------------------------
# x137_r8c_ops_suite — the r8 third-wave operators under one driver hash
# ---------------------------------------------------------------------------


def _x137_sql() -> str:
    z = "CAST(0 AS BIGINT)"
    zd = "CAST(0.0 AS DOUBLE)"
    return f"""SELECT 'csize' AS kind, cluster_size AS id1, n_clusters AS id2,
       n_docs AS v1, {z} AS v2, {z} AS v3, {zd} AS d1, {zd} AS d2,
       NULL AS s1
FROM ({member_oracle('x134_cluster_size_histogram')})
UNION ALL
SELECT 'burst', user_id, n_gaps, sum_g, sum_g2, coalesce(cv2_milli, -1),
       {zd}, {zd}, NULL
FROM ({member_oracle('x135_interarrival_burstiness')})
UNION ALL
SELECT 'zipf', rk, f_r, f_2r, ratio_milli, {z}, {zd}, {zd}, term
FROM ({member_oracle('x136_zipf_profile')})"""


@register(
    "x137_r8c_ops_suite",
    _x137_sql(),
    "EXT-01", "EXT-02", "EXT-05", "EXT-ANALYTICS", "EXT-ANOM",
    tier=1,  # r12: consolidated into m11_r8cd_suite (stays in bench HEADLINE)
)
def x137_r8c_ops_suite(spark, sf_dir):
    """Driver-verified representative for the round-8 third wave,
    consolidated the same round (the x123/x128/x133 convention): the
    dedup cluster-size histogram (x134), per-user inter-arrival
    burstiness (x135 — NULL CV² for all-zero-gap users canonicalizes to
    -1 in the suite shape, both engines) and the Zipf doubling profile
    (x136), union-folded into the shared kind-tagged suite shape
    (3 small members → lazy union per the SCALE.md composition rule).
    x134's persisted intermediates stay alive until the caller's consuming
    action completes (the lazy-union contract); the caller releases them,
    as bench.run() does."""
    # batch members' construction overlapped (guide §2.6); streaming
    # members (session-conf-mutating replays) stay sequential below
    __m_x134, __m_x135, __m_x136 = D.overlap(
        lambda: x134_cluster_size_histogram(spark, sf_dir),
        lambda: x135_interarrival_burstiness(spark, sf_dir),
        lambda: x136_zipf_profile(spark, sf_dir),
    )
    out = (
        _suite_shape(
            __m_x134, "csize",
            id1=F.col("cluster_size"), id2=F.col("n_clusters"),
            v1=F.col("n_docs"),
        )
        .unionAll(_suite_shape(
            __m_x135, "burst",
            id1=F.col("user_id"), id2=F.col("n_gaps"), v1=F.col("sum_g"),
            v2=F.col("sum_g2"), v3=F.coalesce(F.col("cv2_milli"), F.lit(-1)),
        ))
        .unionAll(_suite_shape(
            __m_x136, "zipf",
            id1=F.col("rk"), id2=F.col("f_r"), v1=F.col("f_2r"),
            v2=F.col("ratio_milli"), s1=F.col("term"),
        ))
    )
    return out


# ===========================================================================
# r8 fourth wave: dataset-management ops — deterministic split manifest
# (x138) and rendezvous shard balance (x139) — funded by consolidating
# the q18/t1 aggregate standalones into t2_aggstress_suite.
# ===========================================================================


@register(
    "x138_split_manifest", T.split_manifest_sql(), "EXT-05", tier=1,
)
def x138_split_manifest(spark, sf_dir):
    """Deterministic 98/1/1 train/val/test split manifest
    (:func:`operators.textanalysis.split_manifest`): membership is pure
    md5 arithmetic on the document id, so the split is reproducible
    across runs/engines/cluster sizes with no stored assignment table
    and new documents never reshuffle old ones. Per-(split, source)
    doc/char counts expose the source-mix leakage check directly."""
    return T.split_manifest(_t(spark, sf_dir, "documents"))


@register(
    "x139_rendezvous_shards", T.rendezvous_shards_sql(), "EXT-05", tier=1,
)
def x139_rendezvous_shards(spark, sf_dir):
    """Rendezvous-hashing shard balance report
    (:func:`operators.textanalysis.rendezvous_shards`, HRW — Thaler &
    Ravishankar 1998): argmax of 16 per-shard hashes computed row-
    locally (in-row array_max over (hash, shard) structs — zero row
    expansion, zero shuffle before the 16-group aggregate), while the
    ORACLE assigns via an explicit 16-way unnest + rank — two
    independent formulations of the same argmax under one hash."""
    return T.rendezvous_shards(_t(spark, sf_dir, "documents"))


@register(
    "x141_stream_split_manifest", T.split_manifest_sql(), "EXT-09", "EXT-05",
    tier=1,
)
def x141_stream_split_manifest(spark, sf_dir):
    """The x138 split ledger as STREAMING STATE over the documents
    ingest (availableNow replay,
    :func:`streaming.jobs.stream_split_manifest`): both aggregates are
    additive, so the complete-mode streaming aggregate equals the batch
    manifest under ANY micro-batch split — the fifth aggregate-as-
    stream form after CMS/KMV/ring-buffer/HLL, and the form a live
    ingest runs so the split ledger never needs a nightly recount. The
    oracle is the batch manifest; a hash match proves replayed state
    ≡ batch split."""
    from .streaming.jobs import run_stream_split_manifest

    return run_stream_split_manifest(spark, sf_dir)


# ---------------------------------------------------------------------------
# t2_aggstress_suite — the q18 + t1 aggregate rows as ONE driver row
# ---------------------------------------------------------------------------


def _t2_sql() -> str:
    z = "CAST(0 AS BIGINT)"
    zd = "CAST(0.0 AS DOUBLE)"
    return f"""SELECT 'q18' AS kind, c_custkey AS id1, o_orderkey AS id2,
       o_orderdate_us AS v1, CAST(o_totalprice AS DOUBLE) AS d1,
       CAST(sum_qty AS DOUBLE) AS d2, NULL AS s1
FROM ({member_oracle('q18_large_volume_orders')})
UNION ALL
SELECT 't1', n, {z}, {z}, CAST(sum_value AS DOUBLE), {zd}, event_type
FROM ({member_oracle('t1_salted_skew_agg')})"""


@register(
    "t2_aggstress_suite", _t2_sql(), "EXT-AGG",
    tier=1,  # r10: consolidated into t3 (stays in bench HEADLINE + members)
)
def t2_aggstress_suite(spark, sf_dir):
    """Driver row consolidating the two aggregate-stress shapes (Q18
    HAVING-over-fact-rollup, t1 two-phase salted hot-key aggregation) —
    r8 window math: their two slots fund this row plus the x140 suite."""
    from .analytics_queries import q18_large_volume_orders, t1_salted_skew_agg

    zl = F.lit(0).cast("long")
    zd = F.lit(0.0)
    q18 = q18_large_volume_orders(spark, sf_dir).select(
        F.lit("q18").alias("kind"), F.col("c_custkey").alias("id1"),
        F.col("o_orderkey").alias("id2"),
        F.col("o_orderdate_us").cast("long").alias("v1"),
        F.col("o_totalprice").cast("double").alias("d1"),
        F.col("sum_qty").cast("double").alias("d2"),
        F.lit(None).cast("string").alias("s1"),
    )
    t1 = t1_salted_skew_agg(spark, sf_dir).select(
        F.lit("t1").alias("kind"), F.col("n").cast("long").alias("id1"),
        zl.alias("id2"), zl.alias("v1"),
        F.col("sum_value").cast("double").alias("d1"), zd.alias("d2"),
        F.col("event_type").alias("s1"),
    )
    return q18.unionAll(t1)


# ---------------------------------------------------------------------------
# x140_r8d_ops_suite — the r8 fourth-wave operators under one driver hash
# ---------------------------------------------------------------------------


def _x140_sql() -> str:
    z = "CAST(0 AS BIGINT)"
    zd = "CAST(0.0 AS DOUBLE)"
    return f"""SELECT 'split' AS kind, n_docs AS id1, n_chars AS id2,
       {z} AS v1, {zd} AS d1, concat_ws('|', split, source) AS s1
FROM ({member_oracle('x138_split_manifest')})
UNION ALL
SELECT 'shard', n_docs, n_chars, shard, {zd}, NULL
FROM ({member_oracle('x139_rendezvous_shards')})
UNION ALL
SELECT 'ssplit', n_docs, n_chars, {z}, {zd}, concat_ws('|', split, source)
FROM ({member_oracle('x141_stream_split_manifest')})"""


@register(
    "x140_r8d_ops_suite", _x140_sql(), "EXT-05", "EXT-AGG",
    tier=1,  # r12: consolidated into m11_r8cd_suite (stays in bench HEADLINE)
)
def x140_r8d_ops_suite(spark, sf_dir):
    """Driver-verified representative for the round-8 fourth wave,
    consolidated the same round: the deterministic split manifest
    (x138), the rendezvous shard balance report (x139) — the two
    dataset-MANAGEMENT operators a training-data pipeline runs after
    curation and before writing shards — and the split ledger as
    streaming state (x141, a real availableNow complete-mode replay
    inside a driver-hashed row); 3 small members → lazy union per the
    SCALE.md composition rule."""
    zl = F.lit(0).cast("long")
    zd = F.lit(0.0)
    a = x138_split_manifest(spark, sf_dir).select(
        F.lit("split").alias("kind"), F.col("n_docs").alias("id1"),
        F.col("n_chars").alias("id2"), zl.alias("v1"), zd.alias("d1"),
        F.concat_ws("|", "split", "source").alias("s1"),
    )
    b = x139_rendezvous_shards(spark, sf_dir).select(
        F.lit("shard").alias("kind"), F.col("n_docs").alias("id1"),
        F.col("n_chars").alias("id2"), F.col("shard").alias("v1"),
        zd.alias("d1"), F.lit(None).cast("string").alias("s1"),
    )
    c = x141_stream_split_manifest(spark, sf_dir).select(
        F.lit("ssplit").alias("kind"), F.col("n_docs").alias("id1"),
        F.col("n_chars").alias("id2"), zl.alias("v1"), zd.alias("d1"),
        F.concat_ws("|", "split", "source").alias("s1"),
    )
    return a.unionAll(b).unionAll(c)
