"""Round-7 registered queries: behavioral sessionization, time-series
autocorrelation, Benford audit, integer-exact HyperLogLog (batch and
streamed), PMI collocations, TF-IDF cosine near-dup — plus the two
driver-window consolidation suites that fund and verify them
(q15_joins_suite frees the slot, x123_r7_ops_suite fills it).

Registration/oracle conventions follow fixture_queries (hash-stability
rules) and the suite pattern from extension_queries/audit_queries:
every standalone here is tier 1 and every one is also a member of the
tier-0 x123 suite, whose oracle composes the members' SQL via
member_oracle() so member edits can't drift."""

from __future__ import annotations

from pyspark.sql import functions as F

from .analytics_queries import q7_nation_volume_flow, q10_returned_item_revenue
from .extension_queries import _TOKS_CTE, _suite_shape
from .operators import audit as A
from .operators import dedup as D
from .operators import profile as PRF
from .operators import sketches as SKS
from .operators import textanalysis as T
from .registry import _t, member_oracle, register

# ---------------------------------------------------------------------------
# x116 — batch sessionization
# ---------------------------------------------------------------------------

_X116_EVENTS_CTE = (
    "SELECT user_id AS u, epoch_us(ts) AS us, event_id AS eid FROM events"
)


@register(
    "x116_sessionize", A.sessionize_sql(_X116_EVENTS_CTE),
    "EXT-ANALYTICS", "EXT-WINDOW", tier=1,
)
def x116_sessionize(spark, sf_dir):
    """Gap-based batch sessionization (30-min gap) over the events
    stream at rest — one session row per (user, ordinal) with count and
    microsecond span (:func:`operators.audit.sessionize`): the batch
    complement of x19's streaming ``session_window``, and the
    feature-extraction base for session-length / bounce-rate analytics.
    One user-keyed exchange carries both windows and the final group."""
    return A.sessionize(_t(spark, sf_dir, "events"))


# ---------------------------------------------------------------------------
# x117 — lag-k autocorrelation of the daily order-revenue series
# ---------------------------------------------------------------------------

_X117_ROWS_CTE = (
    "SELECT epoch_us(o_orderdate) // 86400000000 AS day FROM orders"
)


@register(
    "x117_autocorr_daily", A.autocorr_daily_sql(_X117_ROWS_CTE),
    "EXT-ANALYTICS", "EXT-AGG", tier=1,
)
def x117_autocorr_daily(spark, sf_dir):
    """Pearson autocorrelation of the daily order-arrival count at lags
    1..7 (:func:`operators.audit.autocorr_daily`) — the weekly-
    seasonality probe. All accumulators are exact int64 sums (counts
    keep n·Σx² inside int64 through sf1000 — see the operator's
    docstring for why a cents series cannot); r is one deterministic
    IEEE expression per lag, so the float output is hash-stable by
    construction. The day series is |days| rows at any corpus scale —
    every lag join is broadcast-sized."""
    return A.autocorr_daily(_t(spark, sf_dir, "orders"), "o_orderdate")


# ---------------------------------------------------------------------------
# x118 — Benford first-digit audit
# ---------------------------------------------------------------------------

_X118_ROWS_CTE = (
    "SELECT CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS cents "
    "FROM lineitem"
)


@register(
    "x118_benford_audit", PRF.benford_audit_sql(_X118_ROWS_CTE),
    "EXT-AUDIT", tier=1,
)
def x118_benford_audit(spark, sf_dir):
    """First-significant-digit distribution of the lineitem price vs
    Benford's law (:func:`operators.profile.benford_audit`) — the
    naturally-grown-numbers fraud/corruption screen next to x106's
    shape profile. Expected shares are compile-time integer-ppm
    literals (one Python math.log10 evaluation, zero runtime
    transcendentals); observed shares are integer ppm."""
    return PRF.benford_audit(_t(spark, sf_dir, "lineitem"), "l_extendedprice")


# ---------------------------------------------------------------------------
# x119 — HyperLogLog distinct sketch (integer-exact, batch)
# ---------------------------------------------------------------------------

_X119_ROWS_CTE = "SELECT o_orderpriority, o_custkey FROM orders"


@register(
    "x119_hll_distinct",
    SKS.hll_distinct_sql(
        _X119_ROWS_CTE, ["o_orderpriority"], "CAST(o_custkey AS VARCHAR)"
    ),
    "EXT-05", "EXT-ANALYTICS", tier=1,
)
def x119_hll_distinct(spark, sf_dir):
    """Distinct customers per order priority by HYPERLOGLOG, made
    hash-verifiable via dyadic-integer algebra
    (:mod:`operators.sketches`): every harmonic-mean term 2^-r is a
    dyadic rational, so Z·2^27 is a plain int64 and the Flajolet
    estimate α·m²/Z is ONE integer division — the r6 'HLL is
    unverifiable' ruling, overturned with integer arithmetic. m=64
    registers per group forever; exact-count sidecar per the KMV
    contract."""
    return SKS.hll_distinct(
        _t(spark, sf_dir, "orders"), ["o_orderpriority"], "o_custkey"
    )


# ---------------------------------------------------------------------------
# x120 — PMI / lift collocations
# ---------------------------------------------------------------------------


@register(
    "x120_pmi_collocations", T.pmi_collocations_sql(_TOKS_CTE),
    "EXT-05", tier=1,
)
def x120_pmi_collocations(spark, sf_dir):
    """Top-30 bigram collocations by frequency, annotated with pointwise
    lift p(w1,w2)/(p(w1)p(w2))
    (:func:`operators.textanalysis.pmi_collocations`) — the phrase-
    mining step feeding phrase-aware vocabularies. Ranking is by exact
    integer count with text tiebreak; the lift is one deterministic
    IEEE expression over six exact integers (no transcendental at
    all)."""
    return T.pmi_collocations(_t(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# x121 — streamed HLL register state
# ---------------------------------------------------------------------------


def _x121_sql() -> str:
    from .operators.reconcile import hex_chunk_sql
    from .operators.sketches import HLL_MAX_RANK, HLL_REM_BITS

    norm = r"lower(trim(regexp_replace(coalesce(text, ''), '\s+', ' ', 'g')))"
    h = hex_chunk_sql(f"md5({norm})", 1)
    w = f"(h % {1 << HLL_REM_BITS})"
    return f"""WITH hs AS (SELECT coalesce(lang, '~') AS lang, {h} AS h
            FROM documents)
SELECT lang, CAST(h // {1 << HLL_REM_BITS} AS BIGINT) AS bucket,
       CAST(max({HLL_MAX_RANK} - CASE WHEN {w} = 0 THEN 0
                ELSE length(bin({w})) END) AS BIGINT) AS r
FROM hs GROUP BY lang, bucket"""


@register(
    "x121_stream_hll_state", _x121_sql(), "EXT-09", "EXT-05", tier=1,
)
def x121_stream_hll_state(spark, sf_dir):
    """The x119 HLL register table as STREAMING STATE over the documents
    ingest (availableNow replay,
    :func:`streaming.jobs.stream_hll_registers`): register merge is
    elementwise max — commutative, associative, duplicate-insensitive —
    so the complete-mode streaming aggregate equals the batch register
    build under ANY micro-batch split with no custom state code at all
    (the fourth sketch-as-stream form after CMS/KMV/ring-buffer). The
    oracle is the batch register build; a hash match proves replayed
    state ≡ batch sketch."""
    from .streaming.jobs import run_stream_hll

    return run_stream_hll(spark, sf_dir)


# ---------------------------------------------------------------------------
# x122 — TF-IDF cosine near-dup pairs
# ---------------------------------------------------------------------------


@register(
    "x122_tfidf_cosine",
    D.tfidf_cosine_pairs_sql(_TOKS_CTE),
    "EXT-02", "EXT-05", tier=1,
)
def x122_tfidf_cosine(spark, sf_dir):
    """TF-IDF-weighted cosine near-dup pairs (cos ≥ 0.6) over the
    documents corpus (:func:`operators.dedup.tfidf_cosine_pairs`) — the
    weighted sibling of x02's unweighted Jaccard: idf discounts the
    boilerplate terms that inflate Jaccard. Integer weights (tf ·
    idf_milli), exact int64 dots/norms, df-capped posting lists (the
    x02 stop-term scale guard, mirrored in the oracle)."""
    return D.tfidf_cosine_pairs(_t(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# q15_joins_suite — the TPC-H join rows q7 + q10 as ONE driver row
# (frees the tier-0 slot that funds x123; the standalones stay tier 1)
# ---------------------------------------------------------------------------


def _q15_sql() -> str:
    z = "CAST(0 AS BIGINT)"
    zd = "CAST(0.0 AS DOUBLE)"
    return f"""SELECT 'q7' AS kind, l_year AS id1, {z} AS id2, {z} AS v1,
       CAST(revenue AS DOUBLE) AS d1, {zd} AS d2,
       concat_ws('|', supp_nation, cust_nation) AS s1
FROM ({member_oracle('q7_nation_volume_flow')})
UNION ALL
SELECT 'q10', c_custkey, {z}, {z}, CAST(revenue AS DOUBLE), {zd},
       concat_ws('|', c_name, n_name)
FROM ({member_oracle('q10_returned_item_revenue')})"""


@register(
    "q15_joins_suite", _q15_sql(), "EXT-AGG", "EXT-JOIN", "EXT-TOPK",
    tier=1,  # r10: consolidated into t3 (stays in bench HEADLINE + members)
)
def q15_joins_suite(spark, sf_dir):
    """Driver row consolidating the two join-heavy TPC-H shapes (Q7
    double-role nation flow, Q10 returned-revenue top-20) — r7 window
    math: their two slots fund this row plus the x123 suite, the same
    consolidation p2/w2_3/g already apply to their families. Exact-
    decimal revenue sums (order-free) ride double slots losslessly."""
    zl = F.lit(0).cast("long")
    zd = F.lit(0.0)
    q7 = q7_nation_volume_flow(spark, sf_dir).select(
        F.lit("q7").alias("kind"), F.col("l_year").alias("id1"),
        zl.alias("id2"), zl.alias("v1"),
        F.col("revenue").cast("double").alias("d1"), zd.alias("d2"),
        F.concat_ws("|", "supp_nation", "cust_nation").alias("s1"),
    )
    q10 = q10_returned_item_revenue(spark, sf_dir).select(
        F.lit("q10").alias("kind"), F.col("c_custkey").alias("id1"),
        zl.alias("id2"), zl.alias("v1"),
        F.col("revenue").cast("double").alias("d1"), zd.alias("d2"),
        F.concat_ws("|", "c_name", "n_name").alias("s1"),
    )
    return q7.unionAll(q10)


# ---------------------------------------------------------------------------
# x123_r7_ops_suite — the r7 operator tail under one driver hash
# ---------------------------------------------------------------------------


def _x123_sql() -> str:
    z = "CAST(0 AS BIGINT)"
    zd = "CAST(0.0 AS DOUBLE)"
    return f"""SELECT 'sess' AS kind, user_id AS id1, session_idx AS id2,
       n_events AS v1, start_us AS v2, duration_us AS v3,
       {zd} AS d1, {zd} AS d2, NULL AS s1
FROM ({member_oracle('x116_sessionize')})
UNION ALL
SELECT 'acorr', lag, n_pairs, {z}, {z}, {z}, CAST(r AS DOUBLE), {zd}, NULL
FROM ({member_oracle('x117_autocorr_daily')})
UNION ALL
SELECT 'benford', digit, n, n_total, obs_ppm, exp_ppm,
       CAST(dev_ppm AS DOUBLE), {zd}, NULL
FROM ({member_oracle('x118_benford_audit')})
UNION ALL
SELECT 'hll', n_zero, z27, est_distinct, exact_distinct, {z}, {zd}, {zd},
       o_orderpriority
FROM ({member_oracle('x119_hll_distinct')})
UNION ALL
SELECT 'pmi', rk, c12, {z}, {z}, {z}, CAST(lift AS DOUBLE), {zd},
       concat_ws('|', w1, w2)
FROM ({member_oracle('x120_pmi_collocations')})
UNION ALL
SELECT 'shll', bucket, r, {z}, {z}, {z}, {zd}, {zd}, lang
FROM ({member_oracle('x121_stream_hll_state')})
UNION ALL
SELECT 'tfidf', doc_a, doc_b, dot, {z}, {z}, CAST(cosine AS DOUBLE), {zd},
       NULL
FROM ({member_oracle('x122_tfidf_cosine')})"""


@register(
    "x123_r7_ops_suite",
    _x123_sql(),
    "EXT-02", "EXT-05", "EXT-09", "EXT-AUDIT", "EXT-ANALYTICS",
    "EXT-WINDOW", "EXT-AGG",
)
def x123_r7_ops_suite(spark, sf_dir):
    """Driver-verified representative for the round-7 operator tail,
    consolidated in the SAME round the operators landed (the x84
    convention): gap sessionization (x116), daily-revenue
    autocorrelation (x117), the Benford first-digit audit (x118), the
    integer-exact HyperLogLog sketch (x119) and its streamed register
    state (x121 — a real availableNow complete-mode replay inside a
    driver-hashed row), PMI/lift collocations (x120) and TF-IDF cosine
    near-dup pairs (x122), union-folded into the shared kind-tagged
    suite shape."""
    # batch members' construction overlapped (guide §2.6); streaming
    # members (session-conf-mutating replays) stay sequential below
    __m_x116, __m_x117, __m_x118, __m_x119, __m_x120, __m_x122 = D.overlap(
        lambda: x116_sessionize(spark, sf_dir),
        lambda: x117_autocorr_daily(spark, sf_dir),
        lambda: x118_benford_audit(spark, sf_dir),
        lambda: x119_hll_distinct(spark, sf_dir),
        lambda: x120_pmi_collocations(spark, sf_dir),
        lambda: x122_tfidf_cosine(spark, sf_dir),
    )
    return (
        _suite_shape(
            __m_x116, "sess",
            id1=F.col("user_id"), id2=F.col("session_idx"),
            v1=F.col("n_events"), v2=F.col("start_us"),
            v3=F.col("duration_us"),
        )
        .unionAll(_suite_shape(
            __m_x117, "acorr",
            id1=F.col("lag"), id2=F.col("n_pairs"), d1=F.col("r"),
        ))
        .unionAll(_suite_shape(
            __m_x118, "benford",
            id1=F.col("digit"), id2=F.col("n"), v1=F.col("n_total"),
            v2=F.col("obs_ppm"), v3=F.col("exp_ppm"),
            d1=F.col("dev_ppm").cast("double"),
        ))
        .unionAll(_suite_shape(
            __m_x119, "hll",
            id1=F.col("n_zero"), id2=F.col("z27"),
            v1=F.col("est_distinct"), v2=F.col("exact_distinct"),
            s1=F.col("o_orderpriority"),
        ))
        .unionAll(_suite_shape(
            __m_x120, "pmi",
            id1=F.col("rk"), id2=F.col("c12"), d1=F.col("lift"),
            s1=F.concat_ws("|", "w1", "w2"),
        ))
        .unionAll(_suite_shape(
            x121_stream_hll_state(spark, sf_dir), "shll",
            id1=F.col("bucket"), id2=F.col("r"), s1=F.col("lang"),
        ))
        .unionAll(_suite_shape(
            __m_x122, "tfidf",
            id1=F.col("doc_a"), id2=F.col("doc_b"), v1=F.col("dot"),
            d1=F.col("cosine"),
        ))
    )
