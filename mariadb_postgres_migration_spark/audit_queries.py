"""Oracle-paired pipeline-health queries (round-5 breadth tail): the
declarative data-quality audit, SCD2 interval reconstruction, exact
two-pass heavy hitters, and corpus drift — the monitoring surface a
migration engine needs AROUND the queries it runs (measure table health
before/after a load; detect data-mix shift between crawl batches).

Operators live in :mod:`.operators.audit`; every query here is tier-1
(the driver window's OP/EXT families are already covered by tier-0
representatives) and verified by the local DuckDB oracle replica like the
rest of the tail.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .extension_queries import (
    _DS_CTE,
    _TOKS_CTE,
    JACCARD_THRESHOLD,
    _mh_bands_sql,
    _mh_sig_cols_sql,
    _suite_materialize,
    _suite_release,
    _suite_shape,
    c2_curation_pipeline_lsh,
    x54_pq_encode,
    x55_knn_ivfpq,
    x56_substring_dedup_spans,
    x57_stream_incremental_dedup,
    x58_pq_train_codebooks,
    x60_multimodal_pixel_stats,
    x78_gif_pixel_stats,
    x115_jpeg_pixel_stats,
)
from .operators import aggregates as AGG
from .operators import audit as A
from .operators import basket as B
from .operators import dedup as D
from .operators import graph as G
from .operators import order_stats as OS
from .operators import profile as PRF
from .operators import reconcile as R
from .operators import sketches as SKS
from .operators import textanalysis as T
from .registry import _t, member_oracle, register

#: heavy-hitter threshold for the registered query — chosen so the MG
#: counter budget k = N/min_count stays in the thousands at every test SF
#: while still yielding a non-trivial result set (stopwords + common terms).
FREQ_MIN_COUNT = 25

#: minimum combined support for a term to appear in the drift report.
DRIFT_MIN_SUPPORT = 20


@register(
    "x61_expectations_audit",
    """WITH t AS (SELECT
  CAST(count(*) AS BIGINT) AS total,
  CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT) AS orderkey_unique,
  CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS custkey_not_null,
  CAST(sum(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS orderdate_not_null,
  CAST(sum(CASE WHEN NOT coalesce(o_orderstatus IN ('O','F','P'), FALSE) THEN 1 ELSE 0 END) AS BIGINT) AS status_domain,
  CAST(sum(CASE WHEN NOT coalesce(regexp_matches(o_orderpriority, '^[0-9]-[A-Z ]+$'), FALSE) THEN 1 ELSE 0 END) AS BIGINT) AS priority_format,
  CAST(sum(CASE WHEN NOT coalesce(o_totalprice BETWEEN 1000.0 AND 400000.0, FALSE) THEN 1 ELSE 0 END) AS BIGINT) AS totalprice_range
  FROM orders),
r AS (SELECT CAST(count(*) AS BIGINT) AS custkey_refint
      FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
      WHERE o.o_custkey IS NOT NULL AND c.c_custkey IS NULL)
SELECT check_name, violations, total, violations = 0 AS ok FROM (
  SELECT 'orderkey_unique' AS check_name, orderkey_unique AS violations, total FROM t
  UNION ALL SELECT 'custkey_not_null', custkey_not_null, total FROM t
  UNION ALL SELECT 'custkey_refint', r.custkey_refint, t.total FROM t, r
  UNION ALL SELECT 'orderdate_not_null', orderdate_not_null, total FROM t
  UNION ALL SELECT 'status_domain', status_domain, total FROM t
  UNION ALL SELECT 'priority_format', priority_format, total FROM t
  UNION ALL SELECT 'totalprice_range', totalprice_range, total FROM t
)""",
    "EXT-AUDIT",
    tier=1,
)
def x61_expectations_audit(spark, sf_dir):
    """Declarative expectation suite over ``orders`` (uniqueness, nulls,
    domains, ranges, referential integrity vs ``customer``) as one tall
    pass/fail report — see :func:`operators.audit.expectations_audit` for
    the one-scan plan. The ``totalprice_range`` band is deliberately
    tighter than TPC-H's price distribution so the report contains real
    violations (both verdict paths exercised)."""
    return A.expectations_audit(
        _t(spark, sf_dir, "orders"), _t(spark, sf_dir, "customer")
    )


@register(
    "x62_scd2_intervals",
    """WITH ordered AS (
  SELECT user_id, event_type, ts, event_id,
         CASE WHEN lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   IS DISTINCT FROM event_type THEN 1 ELSE 0 END AS chg
  FROM events),
isl AS (SELECT user_id, event_type, ts,
               sum(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING) AS version
        FROM ordered),
per AS (SELECT user_id, version, event_type, min(ts) AS vf
        FROM isl GROUP BY 1, 2, 3)
SELECT user_id, event_type, CAST(version AS BIGINT) AS version,
       epoch_us(vf) AS valid_from_us,
       epoch_us(lead(vf) OVER (PARTITION BY user_id ORDER BY version)) AS valid_to_us
FROM per""",
    "EXT-SCD",
    tier=1,
)
def x62_scd2_intervals(spark, sf_dir):
    """SCD-type-2 reconstruction: each user's ``event_type`` update stream
    collapsed into versioned validity intervals (gaps-and-islands; one
    user-keyed shuffle reused across both windows and the group — see
    :func:`operators.audit.scd2_intervals`)."""
    return A.scd2_intervals(_t(spark, sf_dir, "events"))


@register(
    "x63_frequent_terms",
    f"""WITH {_TOKS_CTE}
SELECT term, CAST(count(*) AS BIGINT) AS n
FROM toks, UNNEST(w) AS u(term)
GROUP BY term
HAVING count(*) >= {FREQ_MIN_COUNT}""",
    "EXT-05", "EXT-HH",
    tier=1,
)
def x63_frequent_terms(spark, sf_dir):
    """EXACT heavy hitters (count ≥ {min_count}) via per-partition
    mergeable Misra-Gries candidates + exact recount of candidates only —
    the full vocabulary is never shuffled. The oracle is the naive
    GROUP BY ... HAVING, which the two-pass plan must (and does) equal
    exactly: MG's error bound forbids false negatives, the recount kills
    false positives."""
    return A.frequent_terms(
        _t(spark, sf_dir, "documents"), min_count=FREQ_MIN_COUNT
    )


@register(
    "x64_corpus_drift",
    f"""WITH {_TOKS_CTE},
occ AS (SELECT doc_id % 2 = 0 AS a, term FROM toks, UNNEST(w) AS u(term)),
g AS (SELECT term,
             CAST(sum(CASE WHEN a THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
             CAST(sum(CASE WHEN NOT a THEN 1 ELSE 0 END) AS BIGINT) AS n_b
      FROM occ GROUP BY term),
tot AS (SELECT CAST(sum(n_a) AS DOUBLE) AS ta, CAST(sum(n_b) AS DOUBLE) AS tb,
               CAST(count(*) AS DOUBLE) AS v FROM g)
SELECT term, n_a, n_b,
       round(((n_a + 1) * (tb + v)) / ((n_b + 1) * (ta + v)), 6) AS drift_ratio
FROM g, tot WHERE n_a + n_b >= {DRIFT_MIN_SUPPORT}""",
    "EXT-05", "EXT-DRIFT",
    tier=1,
)
def x64_corpus_drift(spark, sf_dir):
    """Term-distribution drift between the even- and odd-``doc_id`` corpus
    halves as an add-one-smoothed odds ratio — pure-rational arithmetic so
    both engines hash identically (no transcendental functions). One
    tokenize pass, one term shuffle shared via ReuseExchange."""
    return A.corpus_drift(
        _t(spark, sf_dir, "documents"), min_support=DRIFT_MIN_SUPPORT
    )


# ---------------------------------------------------------------------------
# migration reconciliation (x66/x67) — the pt-table-checksum workflow
# ---------------------------------------------------------------------------

#: deterministic "botched migration" damage rules for the registered
#: queries: drop keys ≡0 (mod DROP_MOD), corrupt status for keys ≡0
#: (mod MUT_MOD), and inject spurious rows for keys ≡0 (mod ADD_MOD)
#: shifted by ADD_SHIFT — all three CDC change types appear at every SF.
DROP_MOD, MUT_MOD, ADD_MOD, ADD_SHIFT = 1009, 997, 1013, 10_000_000
CHECKSUM_BUCKETS = 64

#: the engine-stable '|'-joined serialization of an orders row (integers,
#: strings, epoch micros, half-up cents — never raw doubles/timestamps).
_DIGEST_SQL_TMPL = (
    "md5(concat_ws('|', CAST({a}.o_orderkey AS VARCHAR),"
    " CAST(coalesce({a}.o_custkey, -1) AS VARCHAR),"
    " coalesce({a}.o_orderstatus, '~'), coalesce({a}.o_orderpriority, '~'),"
    " CAST(coalesce(epoch_us({a}.o_orderdate), -1) AS VARCHAR),"
    " CAST(CAST(floor({a}.o_totalprice * 100 + 0.5) AS BIGINT) AS VARCHAR)))"
)

_TGT_CTE = f"""tgt AS (
  SELECT o_orderkey,
         CASE WHEN o_orderkey % {MUT_MOD} = 0 THEN 'X' ELSE o_orderstatus END
           AS o_orderstatus,
         o_custkey, o_orderpriority, o_orderdate, o_totalprice
  FROM orders WHERE o_orderkey % {DROP_MOD} <> 0
  UNION ALL
  SELECT o_orderkey + {ADD_SHIFT}, o_orderstatus, o_custkey,
         o_orderpriority, o_orderdate, o_totalprice
  FROM orders WHERE o_orderkey % {ADD_MOD} = 0)"""


def _orders_digest() -> "F.Column":
    c = F.col
    return R.row_digest(
        c("o_orderkey"),
        F.coalesce(c("o_custkey"), F.lit(-1)),
        F.coalesce(c("o_orderstatus"), F.lit("~")),
        F.coalesce(c("o_orderpriority"), F.lit("~")),
        F.coalesce(F.unix_micros(c("o_orderdate").cast("timestamp")), F.lit(-1)),
        F.floor(c("o_totalprice") * 100 + 0.5).cast("long"),
    )


def _corrupt_orders(orders):
    """The deterministic damaged 'migration target' used by x66/x67."""
    key = F.col("o_orderkey")
    mutated = orders.filter(key % DROP_MOD != 0).withColumn(
        "o_orderstatus",
        F.when(key % MUT_MOD == 0, F.lit("X")).otherwise(F.col("o_orderstatus")),
    )
    added = orders.filter(key % ADD_MOD == 0).withColumn(
        "o_orderkey", key + ADD_SHIFT
    )
    return mutated.unionByName(added.select(*mutated.columns))


def _checksum_side_sql(side: str) -> str:
    dg = f"({_DIGEST_SQL_TMPL.format(a='s')})"
    return f"""(
  SELECT s.o_orderkey % {CHECKSUM_BUCKETS} AS bucket,
         CAST(count(*) AS BIGINT) AS n,
         CAST(bit_xor({R.hex_chunk_sql(dg, 1)}) AS BIGINT) AS x1,
         CAST(bit_xor({R.hex_chunk_sql(dg, 17)}) AS BIGINT) AS x2
  FROM {side} s GROUP BY 1)"""


def _x66_sql() -> str:
    return f"""WITH {_TGT_CTE},
ssum AS {_checksum_side_sql('orders')},
tsum AS {_checksum_side_sql('tgt')}
SELECT coalesce(ssum.bucket, tsum.bucket) AS bucket,
       coalesce(ssum.n, 0) AS n_src, coalesce(tsum.n, 0) AS n_tgt,
       (coalesce(ssum.n, 0) = coalesce(tsum.n, 0)
        AND coalesce(ssum.x1, 0) = coalesce(tsum.x1, 0)
        AND coalesce(ssum.x2, 0) = coalesce(tsum.x2, 0)) AS match
FROM ssum FULL OUTER JOIN tsum ON ssum.bucket = tsum.bucket"""


@register("x66_migration_checksum", _x66_sql(), "EXT-AUDIT", "EXT-CDC", tier=1)
def x66_migration_checksum(spark, sf_dir):
    """pt-table-checksum shape: bucketed (count, xor-of-digests) on the
    migration source and a deterministically damaged target, joined into
    a per-bucket verdict — 100 TB of comparison reduced to one scan per
    side and a 64-row join. The damaged buckets (and only they) report
    ``match = false``."""
    orders = _t(spark, sf_dir, "orders")
    dg = _orders_digest()
    return R.checksum_compare(
        R.table_checksum(orders, F.col("o_orderkey"), dg, n_buckets=CHECKSUM_BUCKETS),
        R.table_checksum(
            _corrupt_orders(orders), F.col("o_orderkey"), dg,
            n_buckets=CHECKSUM_BUCKETS,
        ),
    )


def _x67_sql() -> str:
    return f"""WITH {_TGT_CTE},
sd AS (SELECT s.o_orderkey AS key, {_DIGEST_SQL_TMPL.format(a='s')} AS dg FROM orders s),
td AS (SELECT t.o_orderkey AS key, {_DIGEST_SQL_TMPL.format(a='t')} AS dg FROM tgt t)
SELECT coalesce(sd.key, td.key) AS key,
       CASE WHEN sd.key IS NULL THEN 'added'
            WHEN td.key IS NULL THEN 'removed'
            WHEN sd.dg <> td.dg THEN 'changed' END AS change
FROM sd FULL OUTER JOIN td ON sd.key = td.key
WHERE (CASE WHEN sd.key IS NULL THEN 'added'
            WHEN td.key IS NULL THEN 'removed'
            WHEN sd.dg <> td.dg THEN 'changed' END) IS NOT NULL"""


@register("x67_snapshot_diff", _x67_sql(), "EXT-AUDIT", "EXT-CDC", tier=1)
def x67_snapshot_diff(spark, sf_dir):
    """Row-level CDC change set between migration source and the damaged
    target: one slim (key, digest) full-outer join emitting only
    added/removed/changed keys — the repair list the checksum pass
    localizes. See :func:`operators.reconcile.snapshot_diff` for the
    dirty-bucket-restricted composition at scale."""
    orders = _t(spark, sf_dir, "orders")
    return R.snapshot_diff(
        orders, _corrupt_orders(orders), "o_orderkey", _orders_digest()
    )


# ---------------------------------------------------------------------------
# bloom-accelerated incremental dedup (x72)
# ---------------------------------------------------------------------------


@register(
    "x72_bloom_incremental_dedup",
    # the bloom is a pruning layer over IDENTICAL semantics — reuse x45's
    # membership oracle verbatim (extension_queries registers it first)
    member_oracle("x45_incremental_dedup"),
    "EXT-01", "EXT-BLOOM",
    tier=1,
)
def x72_bloom_incremental_dedup(spark, sf_dir):
    """x45's snapshot-vs-corpus membership with a hand-rolled JVM Bloom
    filter in front (operators/bloom.py): corpus fingerprints build a
    2048-word bit array via one map-side-combined bit_or shuffle; the
    new snapshot probes it broadcast, and only bloom-POSITIVES pay the
    exact corpus join. No false negatives by construction, so the result
    is EXACT — the oracle is x45's plain membership SQL, and any bloom
    bug shows up as a hash mismatch."""
    from .functions.text import normalize_text
    from .operators.bloom import bloom_filtered_membership

    docs = _t(spark, sf_dir, "documents")
    fp = F.md5(normalize_text(F.col("text")))
    corpus = docs.filter(F.col("doc_id") % 10 < 8).select(fp.alias("fp"))
    new = docs.filter(F.col("doc_id") % 10 >= 8).select(
        "doc_id", "source", fp.alias("fp")
    )
    return bloom_filtered_membership(new, corpus, "fp").select(
        "doc_id", "source", F.col("is_member").alias("is_dup_of_corpus")
    )


# ---------------------------------------------------------------------------
# entity resolution pipeline (c3) and exact rolling anomaly (x75)
# ---------------------------------------------------------------------------


#: every REREG_MOD-th customer re-registers in "source B" with a typo'd
#: name (last char → 'Z'), shifted into its own record-id space.
ER_REREG_MOD, ER_OFFSET = 3, 10_000_000

_C3_RECORDS_CTE = f"""recs AS (
  SELECT c_custkey AS rec, c_name AS name, c_nationkey AS nat,
         c_mktsegment AS seg, c_acctbal AS bal
  FROM customer
  UNION ALL
  SELECT c_custkey + {ER_OFFSET},
         substr(c_name, 1, length(c_name) - 1) || 'Z',
         c_nationkey, c_mktsegment, c_acctbal
  FROM customer WHERE c_custkey % {ER_REREG_MOD} = 0)"""


def _c3_sql() -> str:
    return f"""WITH RECURSIVE {_C3_RECORDS_CTE},
p AS (SELECT a.rec AS key_a, b.rec AS key_b
      FROM recs a JOIN recs b
        ON a.nat = b.nat AND a.seg = b.seg
       AND substr(a.name, 12, 5) = substr(b.name, 12, 5)
       AND a.rec < b.rec
      WHERE levenshtein(a.name, b.name) <= 1),
e AS (SELECT key_a AS src, key_b AS dst FROM p
      UNION ALL SELECT key_b, key_a FROM p),
reach AS (SELECT rec AS k, rec AS n FROM recs
          UNION SELECT r.k, e.dst FROM reach r JOIN e ON e.src = r.n),
comp AS (SELECT k, min(n) AS comp FROM reach GROUP BY k),
sc AS (SELECT comp.k, comp.comp, recs.bal
       FROM comp JOIN recs ON comp.k = recs.rec),
best AS (SELECT comp, k AS rep FROM (
           SELECT comp, k, row_number() OVER (PARTITION BY comp
                    ORDER BY bal DESC, k) AS rk FROM sc)
         WHERE rk = 1)
SELECT sc.k AS rec_id, b.rep AS canonical_id, (sc.k = b.rep) AS keep
FROM sc JOIN best b ON sc.comp = b.comp"""


@register("c3_entity_resolution", _c3_sql(), "EXT-02", "EXT-ER", tier=1)
def c3_entity_resolution(spark, sf_dir):
    """Composed record-linkage pipeline — the customer-record counterpart
    of the c1/c2 document pipelines, on a deterministic two-source
    scenario: every third customer "re-registers" with a last-char typo
    in its own id space, and the pipeline must re-unify them.

    Stages, each on its scale tier: blocked candidate generation (x59's
    blocked-equi-join plan, with a COMPOSITE (nation, segment) block —
    TPC-H names are pairwise dist-1, so name-prefix blocking alone
    degenerates into one giant cluster; composite blocking is exactly how
    real ER handles low-entropy name spaces; a mid-name band — stable under
    the last-char typo — adds a third attribute that bounds block size),
    star-contraction
    clustering, and a keep-best collapse (highest balance wins, ties →
    min record id, so the ORIGINAL registration beats its re-registered
    copy). The oracle replays the identical graph via recursive CTE."""
    c = _t(spark, sf_dir, "customer")
    rec_a = c.select(
        F.col("c_custkey").alias("rec"),
        F.col("c_name").alias("name"),
        F.col("c_nationkey").alias("nat"),
        F.col("c_mktsegment").alias("seg"),
        F.col("c_acctbal").alias("bal"),
    )
    rec_b = (
        c.filter(F.col("c_custkey") % ER_REREG_MOD == 0)
        .select(
            (F.col("c_custkey") + ER_OFFSET).alias("rec"),
            F.concat(
                F.expr("substring(c_name, 1, length(c_name) - 1)"), F.lit("Z")
            ).alias("name"),
            F.col("c_nationkey").alias("nat"),
            F.col("c_mktsegment").alias("seg"),
            F.col("c_acctbal").alias("bal"),
        )
    )
    recs = D._persist(rec_a.unionByName(rec_b))
    band = F.substring("name", 12, 5)
    a = recs.select(
        F.col("rec").alias("key_a"), F.col("name").alias("name_a"),
        "nat", "seg", band.alias("band"),
    )
    b = recs.select(
        F.col("rec").alias("key_b"), F.col("name").alias("name_b"),
        "nat", "seg", band.alias("band"),
    )
    pairs = (
        a.join(b, on=["nat", "seg", "band"])
        .filter(F.col("key_a") < F.col("key_b"))
        .filter(F.levenshtein("name_a", "name_b") <= 1)
        .select(F.col("key_a").alias("doc_a"), F.col("key_b").alias("doc_b"))
    )
    comp = D.connected_components_star(pairs)
    out = D.dedup_keep_best(
        recs.select(F.col("rec").alias("doc_id"), "bal"),
        pairs,
        F.col("bal"),
        components=comp,
    )
    return out.select(
        F.col("doc_id").alias("rec_id"),
        F.col("rep").alias("canonical_id"),
        "keep",
    )


ANOM_WINDOW = 20  #: trailing values per user feeding the baseline
ANOM_MIN_N = 8  #: don't flag until the baseline has this many samples
ANOM_Z = 3  #: the |x - mean| > z·sigma threshold


@register(
    "x75_rolling_anomaly",
    f"""WITH c AS (SELECT event_id, user_id, ts,
                CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
         FROM events),
w AS (SELECT event_id, user_id, cents,
             CAST(count(*) OVER win AS BIGINT) AS n,
             CAST(coalesce(sum(cents) OVER win, 0) AS BIGINT) AS s,
             CAST(coalesce(sum(cents * cents) OVER win, 0) AS BIGINT) AS ss
      FROM c
      WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN {ANOM_WINDOW} PRECEDING AND 1 PRECEDING))
SELECT event_id, user_id, n,
       (n >= {ANOM_MIN_N} AND
        (n * cents - s) * (n * cents - s) > {ANOM_Z * ANOM_Z} * (n * ss - s * s))
         AS anomaly
FROM w""",
    "EXT-WINDOW", "EXT-ANOM",
    tier=1,
)
def x75_rolling_anomaly(spark, sf_dir):
    """Per-user rolling z-score anomaly flags in EXACT integer algebra:
    |x − mean| > z·sigma over the trailing window rearranges to
    (n·x − S)² > z²·(n·SS − S²) with S/SS as quantized-cent sums — no
    float arithmetic ANYWHERE, so flags are bit-identical at any
    parallelism and across engines (sums of longs are order-free; a
    float mean/std would sit exactly on threshold boundaries). The
    baseline excludes the current row (frame ends at 1 PRECEDING) so a
    spike cannot mask itself, and young baselines (< min_n samples)
    never flag. One user-keyed shuffle; the window state is the frame."""
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-ANOM_WINDOW, -1)
    )
    cents = F.floor(F.col("value") * 100 + 0.5).cast("long")
    d = _t(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", cents.alias("cents")
    )
    d = d.select(
        "event_id",
        "user_id",
        "cents",
        F.count(F.lit(1)).over(w).cast("long").alias("n"),
        F.coalesce(F.sum("cents").over(w), F.lit(0)).cast("long").alias("s"),
        F.coalesce(F.sum(F.col("cents") * F.col("cents")).over(w), F.lit(0))
        .cast("long")
        .alias("ss"),
    )
    dev = F.col("n") * F.col("cents") - F.col("s")
    var_n2 = F.col("n") * F.col("ss") - F.col("s") * F.col("s")
    flag = (F.col("n") >= ANOM_MIN_N) & (dev * dev > ANOM_Z * ANOM_Z * var_n2)
    return d.select("event_id", "user_id", "n", flag.alias("anomaly"))


# ---------------------------------------------------------------------------
# funnel analysis (x71)
# ---------------------------------------------------------------------------

FUNNEL_STAGES = ("signup", "click", "purchase")


@register(
    "x71_funnel_stages",
    """WITH b AS (SELECT user_id, epoch_us(ts) AS us, event_type FROM events),
w1 AS (SELECT *, min(CASE WHEN event_type = 'signup' THEN us END)
                 OVER (PARTITION BY user_id) AS t1 FROM b),
w2 AS (SELECT *, min(CASE WHEN event_type = 'click' AND us > t1 THEN us END)
                 OVER (PARTITION BY user_id) AS t2 FROM w1),
w3 AS (SELECT *, min(CASE WHEN event_type = 'purchase' AND us > t2 THEN us END)
                 OVER (PARTITION BY user_id) AS t3 FROM w2)
SELECT user_id,
       CAST(CAST(t1 IS NOT NULL AS INT) + CAST(t2 IS NOT NULL AS INT)
            + CAST(t3 IS NOT NULL AS INT) AS BIGINT) AS stage,
       t1 AS t1_us, t2 AS t2_us, t3 AS t3_us
FROM (SELECT user_id, max(t1) AS t1, max(t2) AS t2, max(t3) AS t3
      FROM w3 GROUP BY user_id)""",
    "EXT-WINDOW", "EXT-FUNNEL",
    tier=1,
)
def x71_funnel_stages(spark, sf_dir):
    """Ordered-sequence funnel (signup → click → purchase): per user, the
    earliest signup, the earliest click AFTER it, the earliest purchase
    after THAT, and the furthest stage reached.

    Three stacked whole-partition window minima over the SAME user_id
    partitioning — Catalyst plans ONE exchange with three Window
    operators on top (each stage's timestamp conditions on the previous
    stage's, which is why this is not a plain pivoted aggregate), then
    the per-user collapse reuses the partitioning again. No self-joins:
    the naive per-stage-join formulation pays S-1 extra shuffles of the
    full event table for an S-stage funnel."""
    e = _t(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    return funnel_stages(e.select("user_id", us.alias("us"), "event_type"))


def funnel_stages(d):
    """Core funnel walk over a (user_id, us, event_type) frame — split out
    so tests can drive every partial-stage path on synthetic streams."""
    w = Window.partitionBy("user_id")
    d = d.withColumn(
        "t1", F.min(F.when(F.col("event_type") == FUNNEL_STAGES[0], F.col("us"))).over(w)
    )
    d = d.withColumn(
        "t2",
        F.min(
            F.when(
                (F.col("event_type") == FUNNEL_STAGES[1]) & (F.col("us") > F.col("t1")),
                F.col("us"),
            )
        ).over(w),
    )
    d = d.withColumn(
        "t3",
        F.min(
            F.when(
                (F.col("event_type") == FUNNEL_STAGES[2]) & (F.col("us") > F.col("t2")),
                F.col("us"),
            )
        ).over(w),
    )
    per_user = d.groupBy("user_id").agg(
        F.max("t1").alias("t1_us"),
        F.max("t2").alias("t2_us"),
        F.max("t3").alias("t3_us"),
    )
    stage = (
        F.col("t1_us").isNotNull().cast("int")
        + F.col("t2_us").isNotNull().cast("int")
        + F.col("t3_us").isNotNull().cast("int")
    ).cast("long")
    return per_user.select("user_id", stage.alias("stage"), "t1_us", "t2_us", "t3_us")


# ---------------------------------------------------------------------------
# streamed stateful funnel (x73)
# ---------------------------------------------------------------------------


@register(
    "x73_stream_funnel",
    member_oracle("x71_funnel_stages"),  # x71 registers above in this module
    "EXT-09", "EXT-FUNNEL",
    tier=1,
)
def x73_stream_funnel(spark, sf_dir):
    """The x71 funnel as a CUSTOM stateful streaming operator
    (``applyInPandasWithState``): per-user state = the qualifying
    stage timestamps, advanced monotonically per micro-batch under
    the in-time-order arrival contract. A bounded in-order replay
    equals the batch window cascade exactly, so x71's oracle is
    reused verbatim; cross-batch equivalence is pinned in
    tests/test_stream_funnel.py with a one-time-slice-per-trigger
    replay."""
    from .streaming.jobs import run_stream_funnel

    return run_stream_funnel(spark, sf_dir)


@register(
    "x74_stream_windowed_topk",
    """WITH c AS (SELECT (epoch_us(ts) // 3600000000) * 3600000000 AS window_start_us,
                 TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS item,
                 count(*) AS n
          FROM events
          WHERE TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) IS NOT NULL
          GROUP BY 1, 2)
SELECT window_start_us, CAST(rk AS BIGINT) AS rk, item, CAST(n AS BIGINT) AS n
FROM (SELECT *, row_number() OVER (PARTITION BY window_start_us
                                   ORDER BY n DESC, item) AS rk
      FROM c)
WHERE rk <= 3""",
    "EXT-06", "EXT-08", "EXT-HH",
    tier=1,
)
def x74_stream_windowed_topk(spark, sf_dir):
    """Per-hour top-3 interacted items as a STREAMING aggregation: the
    watermarked (window, item) counts are native streaming state (never
    raw events); the rank runs on the finalized counts after replay (per
    closed window in production) — window functions over a live streaming
    aggregate are unsupported, and top-k needs the window closed anyway.
    Ties break by item id; the oracle is the batch windowed GROUP BY +
    row_number."""
    from .streaming.jobs import run_stream_windowed_topk

    return run_stream_windowed_topk(spark, sf_dir, width_s=3600, k=3)


# ---------------------------------------------------------------------------
# streamed incremental checksum (x70)
# ---------------------------------------------------------------------------

_EVENTS_DIGEST_SQL = (
    "md5(concat_ws('|', CAST(e.event_id AS VARCHAR),"
    " CAST(coalesce(e.user_id, -1) AS VARCHAR),"
    " coalesce(e.event_type, '~'),"
    " CAST(coalesce(epoch_us(e.ts), -1) AS VARCHAR),"
    " CAST(coalesce(CAST(floor(e.value * 100 + 0.5) AS BIGINT), -1) AS VARCHAR),"
    " coalesce(e.props, '~')))"
)


def _x70_sql() -> str:
    dg = f"({_EVENTS_DIGEST_SQL})"
    return f"""SELECT e.event_id % {CHECKSUM_BUCKETS} AS bucket,
       CAST(count(*) AS BIGINT) AS n,
       CAST(bit_xor({R.hex_chunk_sql(dg, 1)}) AS BIGINT) AS x1,
       CAST(bit_xor({R.hex_chunk_sql(dg, 17)}) AS BIGINT) AS x2
FROM events e GROUP BY 1"""


@register("x70_stream_checksum", _x70_sql(), "EXT-08", "EXT-09", "EXT-AUDIT", tier=1)
def x70_stream_checksum(spark, sf_dir):
    """Continuously-maintained ingest checksum: the x66 bucketed XOR
    checksum as STREAMING STATE (bucket-count-sized forever), replayed
    with availableNow and hash-compared to the batch checksum of the same
    table — the live source-side half of a 100 TB reconciliation that
    never rescans the source. See streaming/jobs.run_stream_checksum."""
    from .streaming.jobs import run_stream_checksum

    return run_stream_checksum(spark, sf_dir, n_buckets=CHECKSUM_BUCKETS)


# ---------------------------------------------------------------------------
# incremental view maintenance (x69)
# ---------------------------------------------------------------------------

IVM_CUTOVER = "1997-01-01 00:00:00"


@register(
    "x69_incremental_agg_maintenance",
    f"""SELECT o_orderstatus, o_orderpriority,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_v,
       CAST(min(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS mn_v,
       CAST(max(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS mx_v
FROM orders GROUP BY 1, 2""",
    "EXT-AGG", "EXT-IVM",
    tier=1,
)
def x69_incremental_agg_maintenance(spark, sf_dir):
    """Materialized-view update algebra: the stored per-group summary of
    pre-cutover orders merged with the summary of the post-cutover delta
    — base rows are never rescanned (delta-sized agg + a summary⋈summary
    join). The oracle is the FULL re-aggregate over all orders, so hash
    parity proves the incremental merge equals recomputation."""
    from .operators import aggregates as AG

    orders = _t(spark, sf_dir, "orders")
    cut = F.lit(IVM_CUTOVER).cast("timestamp_ntz")
    cents = F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long")
    keys = ["o_orderstatus", "o_orderpriority"]
    base = AG.grouped_summary(orders.filter(F.col("o_orderdate") < cut), keys, cents)
    delta = AG.grouped_summary(
        orders.filter(
            F.col("o_orderdate").isNull() | (F.col("o_orderdate") >= cut)
        ),
        keys,
        cents,
    )
    return AG.merge_summaries(base, delta, keys)


# ---------------------------------------------------------------------------
# link analysis (x68)
# ---------------------------------------------------------------------------

#: item nodes share the user id space shifted by this offset.
ITEM_OFFSET = 100_000
PR_ITERS = 3

_EDGES_CTE = f"""SELECT DISTINCT user_id AS src,
       {ITEM_OFFSET} + TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS dst
FROM events
WHERE user_id IS NOT NULL
  AND TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) IS NOT NULL"""


@register(
    "x68_pagerank", G.pagerank_oracle_sql(_EDGES_CTE, iters=PR_ITERS),
    "EXT-GRAPH", tier=1,
)
def x68_pagerank(spark, sf_dir):
    """PageRank over the bipartite user→item interaction graph from
    ``events`` (item = the JSON ``props.k``, offset into its own id
    space). Items have no out-edges, so the dangling-mass path is
    genuinely exercised. Fixed-point integer scores — see
    :mod:`operators.graph` — so three distributed iterations hash-match
    three unrolled oracle iterations exactly."""
    e = (
        _t(spark, sf_dir, "events")
        .select(
            F.col("user_id").alias("src"),
            (
                F.lit(ITEM_OFFSET)
                + F.get_json_object("props", "$.k").try_cast("long")
            ).alias("dst"),
        )
        .filter(F.col("src").isNotNull() & F.col("dst").isNotNull())
    )
    return G.pagerank(e, iters=PR_ITERS)


def _x65_sql() -> str:
    z = "CAST(0 AS BIGINT)"
    zd = "CAST(0.0 AS DOUBLE)"
    return f"""SELECT 'audit' AS kind, {z} AS id1, {z} AS id2,
       violations AS v1, total AS v2, CAST(ok AS BIGINT) AS v3,
       {zd} AS d1, {zd} AS d2, check_name AS s1
FROM ({member_oracle('x61_expectations_audit')})
UNION ALL
SELECT 'scd2', user_id, version, valid_from_us, coalesce(valid_to_us, -1),
       {z}, {zd}, {zd}, event_type
FROM ({member_oracle('x62_scd2_intervals')})
UNION ALL
SELECT 'hh', {z}, {z}, n, {z}, {z}, {zd}, {zd}, term
FROM ({member_oracle('x63_frequent_terms')})
UNION ALL
SELECT 'drift', {z}, {z}, n_a, n_b, {z}, CAST(drift_ratio AS DOUBLE), {zd}, term
FROM ({member_oracle('x64_corpus_drift')})
UNION ALL
SELECT 'cksum', bucket, {z}, n_src, n_tgt, CAST(match AS BIGINT), {zd}, {zd}, NULL
FROM ({member_oracle('x66_migration_checksum')})
UNION ALL
SELECT 'diff', key, {z}, {z}, {z}, {z}, {zd}, {zd}, change
FROM ({member_oracle('x67_snapshot_diff')})
UNION ALL
SELECT 'pr', node, {z}, score_q, {z}, {z}, {zd}, {zd}, NULL
FROM ({member_oracle('x68_pagerank')})
UNION ALL
SELECT 'ivm', {z}, {z}, n, sum_v, mn_v, CAST(mx_v AS DOUBLE), {zd},
       concat_ws('|', o_orderstatus, o_orderpriority)
FROM ({member_oracle('x69_incremental_agg_maintenance')})
UNION ALL
SELECT 'scks', bucket, {z}, n, x1, x2, {zd}, {zd}, NULL
FROM ({member_oracle('x70_stream_checksum')})"""


@register(
    "x65_health_suite",
    _x65_sql(),
    # the full member-family union: x61 audit, x62 SCD2, x63 HH, x64
    # drift, x66/x67 checksum+diff (CDC), x68 pagerank (GRAPH), x69 IVM
    # (AGG/IVM), x70 streamed checksum (08/09) — the registry coverage
    # guard (tests/test_registry.py) checks families against these tuples
    "EXT-AUDIT", "EXT-SCD", "EXT-HH", "EXT-DRIFT", "EXT-05",
    "EXT-CDC", "EXT-GRAPH", "EXT-AGG", "EXT-IVM", "EXT-08", "EXT-09",
)
def x65_health_suite(spark, sf_dir):
    """Driver-verified representative for the r5 pipeline-health surface:
    the expectations audit (x61), SCD2 intervals (x62), exact heavy
    hitters (x63), corpus drift (x64), migration checksum (x66),
    snapshot diff (x67), fixed-point PageRank (x68), incremental
    aggregate maintenance (x69) and the streamed checksum (x70 — a real
    availableNow Structured Streaming replay inside a driver-hashed row,
    like x49's streamed PII member) union-folded into one kind-tagged
    shape — the same consolidation the x42/x49/x50 suites use to give
    every new operator family a row inside the driver's 50-query window.

    The two token-consuming members (x63/x64) share ONE persisted
    tokenize pass via the ``__toks`` pass-through in ``_with_tokens``;
    x61 and x62 read different tables (orders/events), so the suite's
    per-member plans are exactly the standalone plans otherwise.

    Composition form — ADJUDICATED r9 (VERDICT r8 'What's missing #2'):
    x65 carries the heavy-member profile (PageRank ~4.2s, a streaming
    replay) the SCALE.md rule flags for sequentialization, but the
    measured A/B went the other way: isolated same-host pairs ran the
    sequential `_suite_materialize` form at 13.1/12.2s vs 11.4/9.8s for
    this lazy union — PageRank's iterative rounds leave most of the 32
    cores idle, and the union's cross-member stage concurrency fills
    them, the x84a profile rather than the x77 one (x77's pathology was
    persist eviction under COMBINED memory pressure, which x65's slim
    persisted frames — tokens + two (key, digest) digests — don't
    generate). Stays lazy union; verdict in SCALE.md benchmark
    methodology."""
    toked = D._persist(
        T._with_tokens(_t(spark, sf_dir, "documents"), "doc_id", "text")
    )
    # the checksum and diff members consume the SAME two slim (key, digest)
    # frames — build and persist them once instead of re-scanning orders
    # and re-hashing every row per member (the standalone x66/x67 each pay
    # their own pass; the suite shares it)
    orders = _t(spark, sf_dir, "orders")
    src_slim = D._persist(
        orders.select(F.col("o_orderkey").alias("key"), _orders_digest().alias("dg"))
    )
    tgt_slim = D._persist(
        _corrupt_orders(orders).select(
            F.col("o_orderkey").alias("key"), _orders_digest().alias("dg")
        )
    )
    cks = R.checksum_compare(
        R.table_checksum(src_slim, F.col("key"), F.col("dg"), n_buckets=CHECKSUM_BUCKETS),
        R.table_checksum(tgt_slim, F.col("key"), F.col("dg"), n_buckets=CHECKSUM_BUCKETS),
    )
    diff = R.snapshot_diff(src_slim, tgt_slim, "key", F.col("dg"))
    # batch members' construction overlapped (guide §2.6); streaming
    # members (session-conf-mutating replays) stay sequential below
    __m_x61, __m_x62, __m_x68, __m_x69 = D.overlap(
        lambda: x61_expectations_audit(spark, sf_dir),
        lambda: x62_scd2_intervals(spark, sf_dir),
        lambda: x68_pagerank(spark, sf_dir),
        lambda: x69_incremental_agg_maintenance(spark, sf_dir),
    )
    return (
        _suite_shape(
            __m_x61, "audit",
            v1=F.col("violations"), v2=F.col("total"), v3=F.col("ok"),
            s1=F.col("check_name"),
        )
        .unionAll(_suite_shape(
            __m_x62, "scd2",
            id1=F.col("user_id"), id2=F.col("version"),
            v1=F.col("valid_from_us"), v2=F.coalesce("valid_to_us", F.lit(-1)),
            s1=F.col("event_type"),
        ))
        .unionAll(_suite_shape(
            A.frequent_terms(toked, min_count=FREQ_MIN_COUNT), "hh",
            v1=F.col("n"), s1=F.col("term"),
        ))
        .unionAll(_suite_shape(
            A.corpus_drift(toked, min_support=DRIFT_MIN_SUPPORT), "drift",
            v1=F.col("n_a"), v2=F.col("n_b"), d1=F.col("drift_ratio"),
            s1=F.col("term"),
        ))
        .unionAll(_suite_shape(
            cks, "cksum",
            id1=F.col("bucket"), v1=F.col("n_src"), v2=F.col("n_tgt"),
            v3=F.col("match"),
        ))
        .unionAll(_suite_shape(
            diff, "diff",
            id1=F.col("key"), s1=F.col("change"),
        ))
        .unionAll(_suite_shape(
            __m_x68, "pr",
            id1=F.col("node"), v1=F.col("score_q"),
        ))
        .unionAll(_suite_shape(
            __m_x69, "ivm",
            v1=F.col("n"), v2=F.col("sum_v"), v3=F.col("mn_v"),
            d1=F.col("mx_v"),
            s1=F.concat_ws("|", "o_orderstatus", "o_orderpriority"),
        ))
        .unionAll(_suite_shape(
            x70_stream_checksum(spark, sf_dir), "scks",
            id1=F.col("bucket"), v1=F.col("n"), v2=F.col("x1"),
            v3=F.col("x2"),
        ))
    )



def _x76_sql() -> str:
    z = "CAST(0 AS BIGINT)"
    zd = "CAST(0.0 AS DOUBLE)"
    return f"""SELECT 'pq' AS kind, v_id AS id1, {z} AS id2,
       {z} AS v1, {z} AS v2, {z} AS v3,
       CAST(err2 AS DOUBLE) AS d1, {zd} AS d2, codes AS s1
FROM ({member_oracle('x54_pq_encode')})
UNION ALL
SELECT 'ivfpq', q_id, n_id, rk, {z}, {z}, CAST(adist AS DOUBLE), {zd}, NULL
FROM ({member_oracle('x55_knn_ivfpq')})
UNION ALL
SELECT 'pqtrain', m, code, pos, n_members, {z}, CAST(val AS DOUBLE), {zd}, NULL
FROM ({member_oracle('x58_pq_train_codebooks')})
UNION ALL
SELECT 'pix', doc_id, width, height, px_min, px_max,
       CAST(px_sum AS DOUBLE), {zd}, NULL
FROM ({member_oracle('x60_multimodal_pixel_stats')})
UNION ALL
SELECT 'bloom', doc_id, {z}, CAST(is_dup_of_corpus AS BIGINT), {z}, {z},
       {zd}, {zd}, source
FROM ({member_oracle('x72_bloom_incremental_dedup')})
UNION ALL
SELECT 'spans', doc_id, span_start, span_end, n_windows, {z}, {zd}, {zd}, NULL
FROM ({member_oracle('x56_substring_dedup_spans')})
UNION ALL
SELECT 'gifpix', doc_id, width, height, px_min, px_max,
       CAST(px_sum AS DOUBLE), {zd}, NULL
FROM ({member_oracle('x78_gif_pixel_stats')})
UNION ALL
SELECT 'jpgpix', doc_id, width, height, px_min, px_max,
       CAST(px_sum AS DOUBLE), {zd}, NULL
FROM ({member_oracle('x115_jpeg_pixel_stats')})"""


@register(
    "x76_retrieval_suite",
    _x76_sql(),
    "EXT-01", "EXT-02", "EXT-03", "EXT-04", "EXT-05", "EXT-BLOOM",
)
def x76_retrieval_suite(spark, sf_dir):
    """Driver-verified representative for the r5 retrieval/encoding tail:
    product-quantization encode (x54), full IVF-PQ ADC search (x55), PQ
    codebook training (x58), REAL pixel-decode stats over BMP bytes
    (x60), LZW-compressed GIF bytes (x78, pure-Python LZW decoder) and —
    since r7 — Huffman-coded baseline JPEG bytes (x115, pure-numpy
    Huffman + dequant + IDCT, operators/jpeg.py),
    the exact-by-construction bloom-accelerated incremental dedup
    (x72) and span-level exact-substring dedup (x56), folded into
    the shared kind-tagged suite shape — the same consolidation that gave
    every r4 operator a driver row via x49/x50 and the r5 health surface
    one via x65. px_sum rides a double slot: pixel sums are bounded far
    below 2^53, so the BIGINT→DOUBLE cast is exact in both engines.

    Composition form — adjudicated r9, stays LAZY UNION: one full-bench
    run tripped the suites_inflated flag on the union (13.5s vs an 8.7s
    member sum) — but that session's numpy calib probe was 0.141s, 3.4x
    the r7 reference, and x76 is the bench's most numpy-bound suite
    (its members run Arrow decode kernels CONCURRENTLY under the
    union). The two-sided A/B then measured the sequential
    `_suite_materialize` form WORSE in both regimes: isolated 13.0s vs
    union 11.6s, and 14.15s (ratio 1.36 over members) in the next full
    bench. The x84a rule applies (Arrow-heavy members live on the
    union's stage concurrency), not the x77 one (x76's persists are
    small codebook/probe frames — no eviction fuel). Watch-list: if the
    flag recurs on a normal-numpy session, re-run this A/B.
    MPS_SUITE_UNION=1 still flips the form for that A/B."""
    from functools import reduce

    # batch members' construction overlapped (guide §2.6); streaming
    # members (session-conf-mutating replays) stay sequential below
    __m_x54, __m_x55, __m_x58, __m_x60, __m_x72, __m_x56, __m_x78, __m_x115 = D.overlap(
        lambda: x54_pq_encode(spark, sf_dir),
        lambda: x55_knn_ivfpq(spark, sf_dir),
        lambda: x58_pq_train_codebooks(spark, sf_dir),
        lambda: x60_multimodal_pixel_stats(spark, sf_dir),
        lambda: x72_bloom_incremental_dedup(spark, sf_dir),
        lambda: x56_substring_dedup_spans(spark, sf_dir),
        lambda: x78_gif_pixel_stats(spark, sf_dir),
        lambda: x115_jpeg_pixel_stats(spark, sf_dir),
    )
    members = [
        _suite_shape(
            __m_x54, "pq",
            id1=F.col("v_id"), d1=F.col("err2"), s1=F.col("codes"),
        ),
        _suite_shape(
            __m_x55, "ivfpq",
            id1=F.col("q_id"), id2=F.col("n_id"), v1=F.col("rk"),
            d1=F.col("adist"),
        ),
        _suite_shape(
            __m_x58, "pqtrain",
            id1=F.col("m"), id2=F.col("code"), v1=F.col("pos"),
            v2=F.col("n_members"), d1=F.col("val"),
        ),
        _suite_shape(
            __m_x60, "pix",
            id1=F.col("doc_id"), id2=F.col("width"), v1=F.col("height"),
            v2=F.col("px_min"), v3=F.col("px_max"),
            d1=F.col("px_sum").cast("double"),
        ),
        _suite_shape(
            __m_x72, "bloom",
            id1=F.col("doc_id"), v1=F.col("is_dup_of_corpus").cast("long"),
            s1=F.col("source"),
        ),
        _suite_shape(
            __m_x56, "spans",
            id1=F.col("doc_id"), id2=F.col("span_start"),
            v1=F.col("span_end"), v2=F.col("n_windows"),
        ),
        _suite_shape(
            __m_x78, "gifpix",
            id1=F.col("doc_id"), id2=F.col("width"), v1=F.col("height"),
            v2=F.col("px_min"), v3=F.col("px_max"),
            d1=F.col("px_sum").cast("double"),
        ),
        # r7: the baseline-JPEG decode path (the last codec stub, closed)
        _suite_shape(
            __m_x115, "jpgpix",
            id1=F.col("doc_id"), id2=F.col("width"), v1=F.col("height"),
            v2=F.col("px_min"), v3=F.col("px_max"),
            d1=F.col("px_sum").cast("double"),
        ),
    ]
    return reduce(lambda a, b: a.unionAll(b), members)


def _x77_sql() -> str:
    z = "CAST(0 AS BIGINT)"
    zd = "CAST(0.0 AS DOUBLE)"
    return f"""SELECT 'funnel' AS kind, user_id AS id1, stage AS id2,
       t1_us AS v1, t2_us AS v2, t3_us AS v3,
       {zd} AS d1, {zd} AS d2, NULL AS s1
FROM ({member_oracle('x71_funnel_stages')})
UNION ALL
SELECT 'sfunnel', user_id, stage, t1_us, t2_us, t3_us, {zd}, {zd}, NULL
FROM ({member_oracle('x73_stream_funnel')})
UNION ALL
SELECT 'stopk', window_start_us, rk, item, n, {z}, {zd}, {zd}, NULL
FROM ({member_oracle('x74_stream_windowed_topk')})
UNION ALL
SELECT 'anom', event_id, user_id, n, CAST(anomaly AS BIGINT), {z},
       {zd}, {zd}, NULL
FROM ({member_oracle('x75_rolling_anomaly')})
UNION ALL
SELECT 'er', rec_id, canonical_id, CAST(keep AS BIGINT), {z}, {z},
       {zd}, {zd}, NULL
FROM ({member_oracle('c3_entity_resolution')})
UNION ALL
SELECT 'sdedup', doc_id, {z}, CAST(is_dup_of_corpus AS BIGINT), {z}, {z},
       {zd}, {zd}, source
FROM ({member_oracle('x57_stream_incremental_dedup')})
UNION ALL
SELECT 'cur', doc_id, {z}, n_tokens, {z}, {z}, CAST(quality AS DOUBLE),
       {zd}, lang_pred
FROM ({member_oracle('c2_curation_pipeline_lsh')})"""


@register(
    "x77_behavioral_suite",
    _x77_sql(),
    "EXT-01", "EXT-02", "EXT-05", "EXT-06", "EXT-08", "EXT-09",
    "EXT-FUNNEL", "EXT-ANOM", "EXT-ER", "EXT-HH",
)
def x77_behavioral_suite(spark, sf_dir):
    """Driver-verified representative for the r5 behavioral/streaming
    tail: the batch funnel (x71) and its ``applyInPandasWithState``
    streamed twin (x73 — the codebase's only custom-stateful-operator
    form, driver-hashed here for the first time), the streamed windowed
    top-k (x74), the exact rolling anomaly detector (x75), blocked
    entity resolution (c3), streamed incremental dedup (x57) and the
    LSH-tier curation pipeline (c2), with each member MATERIALIZED as
    its own sequential action (_suite_materialize — see its docstring
    for the r7 storage-eviction diagnosis this fixes) and the final
    union a scan of materialized blocks. Three members are real
    availableNow Structured Streaming replays inside one driver-hashed
    row."""
    from functools import reduce

    from .operators.dedup import persist_pool_mark

    pool_mark = persist_pool_mark()
    # the four BATCH members' checkpoint-materializations overlapped
    # (guide §2.6) — four concurrent member actions, not the all-members
    # union concurrency the r7 thrash diagnosis retired; the three
    # streaming members (session-conf-mutating availableNow replays)
    # stay sequential below
    m_funnel, m_anom, m_er, m_cur = D.overlap(
        lambda: _suite_materialize(_suite_shape(
            x71_funnel_stages(spark, sf_dir), "funnel",
            id1=F.col("user_id"), id2=F.col("stage"), v1=F.col("t1_us"),
            v2=F.col("t2_us"), v3=F.col("t3_us"),
        )),
        lambda: _suite_materialize(_suite_shape(
            x75_rolling_anomaly(spark, sf_dir), "anom",
            id1=F.col("event_id"), id2=F.col("user_id"), v1=F.col("n"),
            v2=F.col("anomaly").cast("long"),
        )),
        lambda: _suite_materialize(_suite_shape(
            c3_entity_resolution(spark, sf_dir), "er",
            id1=F.col("rec_id"), id2=F.col("canonical_id"),
            v1=F.col("keep").cast("long"),
        )),
        lambda: _suite_materialize(_suite_shape(
            c2_curation_pipeline_lsh(spark, sf_dir), "cur",
            id1=F.col("doc_id"), v1=F.col("n_tokens"),
            d1=F.col("quality"), s1=F.col("lang_pred"),
        )),
    )
    members = [
        m_funnel,
        _suite_materialize(_suite_shape(
            x73_stream_funnel(spark, sf_dir), "sfunnel",
            id1=F.col("user_id"), id2=F.col("stage"), v1=F.col("t1_us"),
            v2=F.col("t2_us"), v3=F.col("t3_us"),
        )),
        _suite_materialize(_suite_shape(
            x74_stream_windowed_topk(spark, sf_dir), "stopk",
            id1=F.col("window_start_us"), id2=F.col("rk"),
            v1=F.col("item"), v2=F.col("n"),
        )),
        m_anom,
        m_er,
        _suite_materialize(_suite_shape(
            x57_stream_incremental_dedup(spark, sf_dir), "sdedup",
            id1=F.col("doc_id"),
            v1=F.col("is_dup_of_corpus").cast("long"),
            s1=F.col("source"),
        )),
        m_cur,
    ]
    # every member is materialized — their persisted intermediates are
    # dead weight now; drop them (and ONLY them — entries appended since
    # pool_mark) before the caller's consuming action
    _suite_release(pool_mark)
    return reduce(lambda a, b: a.unionAll(b), members)


def _c4_sql() -> str:
    z = "CAST(0 AS BIGINT)"
    return f"""WITH diff AS ({member_oracle('x67_snapshot_diff')})
SELECT 'repair' AS kind, {z} AS k, change AS s,
       CAST(count(*) AS BIGINT) AS n1, {z} AS n2, {z} AS ok
FROM diff GROUP BY change
UNION ALL
SELECT 'verify', o_orderkey % {CHECKSUM_BUCKETS}, NULL,
       CAST(count(*) AS BIGINT), CAST(count(*) AS BIGINT), CAST(1 AS BIGINT)
FROM orders GROUP BY 2"""


@register("c4_migration_repair", _c4_sql(), "EXT-AUDIT", "EXT-CDC", tier=1)
def c4_migration_repair(spark, sf_dir):
    """The COMPLETE pt-table-checksum re-sync loop composed end-to-end:
    checksum both sides (x66 shape) → restrict the row-level diff to the
    dirty buckets (the ``bucket_filter`` path of ``snapshot_diff``, here
    exercised by a registered query for the first time) → apply the
    change set onto the damaged target (``apply_changes``: delete
    spurious, insert missing, replace changed) → re-checksum the repaired
    target against the source. Output: the damage summary by change type
    plus the post-repair per-bucket verdict, which the oracle pins to
    ALL-match with source-side counts — i.e. the pipeline must actually
    restore the target to row-identity, not merely claim to.

    Scale: the checksum passes are one scan per side emitting 64 rows;
    the diff join carries (key, digest) restricted to dirty buckets; the
    repair joins carry damage-sized key sets (AQE broadcasts them); the
    re-verify is another pair of single scans. Nothing in the plan holds
    more than damage-sized state outside a scan."""
    orders = _t(spark, sf_dir, "orders")
    tgt = _corrupt_orders(orders)
    dg = _orders_digest()
    # the source-side checksum is needed twice (locate damage, then
    # re-verify the repair); it's 64 rows — persist it instead of paying a
    # second full source scan + digest pass (review r6)
    src_cks = D._persist(
        R.table_checksum(orders, F.col("o_orderkey"), dg, n_buckets=CHECKSUM_BUCKETS)
    )
    cks = R.checksum_compare(
        src_cks,
        R.table_checksum(tgt, F.col("o_orderkey"), dg, n_buckets=CHECKSUM_BUCKETS),
    )
    dirty = cks.filter(~F.col("match")).select("bucket")
    diff = D._persist(
        R.snapshot_diff(
            orders, tgt, "o_orderkey", dg,
            bucket_filter=dirty, n_buckets=CHECKSUM_BUCKETS,
        )
    )
    repaired = R.apply_changes(tgt, orders, diff, "o_orderkey")
    verify = R.checksum_compare(
        src_cks,
        R.table_checksum(repaired, F.col("o_orderkey"), dg, n_buckets=CHECKSUM_BUCKETS),
    )
    z = F.lit(0).cast("long")
    rep = diff.groupBy("change").count().select(
        F.lit("repair").alias("kind"), z.alias("k"), F.col("change").alias("s"),
        F.col("count").cast("long").alias("n1"), z.alias("n2"), z.alias("ok"),
    )
    ver = verify.select(
        F.lit("verify").alias("kind"), F.col("bucket").cast("long").alias("k"),
        F.lit(None).cast("string").alias("s"), F.col("n_src").cast("long").alias("n1"),
        F.col("n_tgt").cast("long").alias("n2"), F.col("match").cast("long").alias("ok"),
    )
    return rep.unionByName(ver)


def _bpe_apply_sql(s: str, a: str, b: str) -> str:
    """DuckDB mirror of operators.textanalysis._bpe_apply_merge: the same
    greedy left-to-right fold as a list_reduce over a chr(31)-delimited
    accumulator string (symbols are printable-ASCII by the word filter,
    so the delimiter can't collide)."""
    us = "chr(31)"
    sfx = f"{us} || {a}"
    return (
        f"string_split(substr(list_reduce(list_transform({s}, c -> {us} || c), "
        f"(acc, x) -> CASE WHEN x = {us} || {b} AND ends_with(acc, {sfx}) "
        f"THEN substr(acc, 1, length(acc) - length({sfx})) || {us} || {a} || {b} "
        f"ELSE acc || x END), 2), {us})"
    )


def _bpe_rounds_cte(iters: int = 3) -> str:
    """Shared WITH-body for the BPE queries: weighted word vocabulary →
    ``iters`` unrolled count/argmax/apply rounds, ending at v{iters}."""
    parts = [
        f"""WITH {_TOKS_CTE},
words AS (SELECT u.word AS w, CAST(count(*) AS BIGINT) AS n
          FROM toks, UNNEST(w) AS u(word)
          WHERE u.word <> '' AND regexp_matches(u.word, '^[!-~]+$')
          GROUP BY 1),
v0 AS (SELECT list_transform(range(1, length(w) + 1),
                             i -> substr(w, CAST(i AS INT), 1)) AS s, n
       FROM words)"""
    ]
    for k in range(1, iters + 1):
        parts.append(
            f""",
p{k} AS (SELECT s[i] AS a, s[i + 1] AS b, CAST(sum(n) AS BIGINT) AS c
       FROM v{k - 1}, UNNEST(range(1, len(s))) AS u(i) GROUP BY 1, 2),
m{k} AS (SELECT a, b, c FROM p{k} ORDER BY c DESC, a, b LIMIT 1),
v{k} AS (SELECT CASE WHEN m.a IS NULL THEN s
                     ELSE {_bpe_apply_sql('s', 'm.a', 'm.b')} END AS s, n
       FROM v{k - 1} LEFT JOIN m{k} m ON TRUE)"""
        )
    return "".join(parts)


def _x80_sql(iters: int = 3) -> str:
    parts = [_bpe_rounds_cte(iters)]
    parts.append(
        f""",
sym AS (SELECT CAST(count(DISTINCT t) AS BIGINT) AS n FROM v{iters}, UNNEST(s) AS u(t))
"""
        + "\nUNION ALL\n".join(
            f"SELECT CAST({k} AS BIGINT) AS rk, a AS lhs, b AS rhs, c AS n FROM m{k}"
            for k in range(1, iters + 1)
        )
        + "\nUNION ALL\nSELECT CAST(0 AS BIGINT), NULL, NULL, n FROM sym"
    )
    return "".join(parts)


@register("x80_bpe_train_merges", _x80_sql(), "EXT-05", tier=1)
def x80_bpe_train_merges(spark, sf_dir):
    """ITERATIVE BPE training over the documents word vocabulary: 3 full
    count → argmax → apply-merge rounds (x44 is the counting step alone),
    plus the post-training symbol-vocabulary size as proof the folds were
    applied. Driver state is one 1-row argmax collect per round (bounded
    by contract, like the k-means centroid step); the corpus is scanned
    once to build the |V|-row weighted vocabulary and never again. The
    oracle is 3 unrolled CTE rounds whose merge fold (list_reduce over a
    delimited accumulator) mirrors the engine's aggregate-HOF fold
    exactly — greedy, left-to-right, non-overlapping."""
    return T.bpe_train_merges(_t(spark, sf_dir, "documents"))


def _x81_sql(iters: int = 3, k: int = 50) -> str:
    return (
        _bpe_rounds_cte(iters)
        + f""",
cnt AS (SELECT t AS sym, CAST(sum(n) AS BIGINT) AS n
        FROM v{iters}, UNNEST(s) AS u(t) GROUP BY 1),
rnk AS (SELECT sym, n, row_number() OVER (ORDER BY n DESC, sym) AS rk FROM cnt)
SELECT sym, n, CAST(rk AS BIGINT) AS rk FROM rnk WHERE rk <= {k}"""
    )


@register("x81_bpe_encode_topk", _x81_sql(), "EXT-05", tier=1)
def x81_bpe_encode_topk(spark, sf_dir):
    """The ENCODE side of the BPE tokenizer: train the x80 merges, apply
    them, and count the resulting subword symbols corpus-wide (top 50 by
    count, ties by symbol) — token counting under a LEARNED tokenizer,
    closing the train→encode loop. Same scale shape as x80 plus one
    |V|-row explode/partial-agg and a TakeOrderedAndProject top-k; the
    oracle re-runs the 3 unrolled training rounds and counts v3."""
    return T.bpe_encode_topk(_t(spark, sf_dir, "documents"))


@register(
    "x82_stream_rolling_anomaly",
    member_oracle("x75_rolling_anomaly"),
    "EXT-09", "EXT-ANOM",
    tier=1,
)
def x82_stream_rolling_anomaly(spark, sf_dir):
    """x75 as a STREAMING arbitrary-stateful operator
    (``applyInPandasWithState`` with a ring-buffer state shape — a
    second, structurally different custom-state form next to x73's stage
    machine): per-user state is the trailing ANOM_WINDOW quantized-cent
    buffer — O(users × window) streaming state, never raw history — and
    each arriving event is flagged with the same integer algebra the
    batch window uses, one output row per event. Under the bounded
    in-time-order availableNow replay the result is row-identical to
    batch x75, so the oracle is reused verbatim (cross-batch equivalence
    pinned in tests/test_stream_anomaly.py). Spark 4's
    ``transformWithStateInPandas`` successor API was probed and is
    blocked only by the container's missing protobuf package (see
    streaming/jobs.rolling_anomaly_state_stream)."""
    from .streaming.jobs import run_stream_rolling_anomaly

    return run_stream_rolling_anomaly(
        spark, sf_dir, window=ANOM_WINDOW, min_n=ANOM_MIN_N, z=ANOM_Z
    )


#: nightly-ingest split for x83: every 5th doc is the "new batch".
NEARDUP_BATCH_MOD = 5


def _x83_sql() -> str:
    # signature + banding SQL comes from the SAME generators x03/c2 use
    # (extension_queries._mh_sig_cols_sql/_mh_bands_sql — review r6: a
    # second hand-rolled rendering here could silently drift from them)
    mins = _mh_sig_cols_sql()

    def bands(side: str) -> str:
        return _mh_bands_sql(f"{side}sig")

    m = NEARDUP_BATCH_MOD
    return f"""WITH {_TOKS_CTE},
{_DS_CTE},
bsh AS (SELECT * FROM ds WHERE doc_id % {m} = 0),
csh AS (SELECT * FROM ds WHERE doc_id % {m} <> 0),
bsig AS (SELECT doc_id, {mins} FROM bsh GROUP BY doc_id),
csig AS (SELECT doc_id, {mins} FROM csh GROUP BY doc_id),
bbands AS ({bands('b')}),
cbands AS ({bands('c')}),
cand AS (SELECT DISTINCT b.doc_id AS new_id, c.doc_id AS corpus_id
         FROM bbands b JOIN cbands c USING (band_key)),
bn AS (SELECT doc_id, count(*) AS n FROM bsh GROUP BY doc_id),
cn AS (SELECT doc_id, count(*) AS n FROM csh GROUP BY doc_id),
inter AS (SELECT b.doc_id AS new_id, c.doc_id AS corpus_id, count(*) AS i
          FROM bsh b JOIN csh c USING (sh) GROUP BY 1, 2),
interc AS (SELECT inter.* FROM inter JOIN cand USING (new_id, corpus_id)),
pairs AS (SELECT new_id, corpus_id, i / CAST(bn.n + cn.n - i AS DOUBLE) AS jaccard
          FROM interc JOIN bn ON new_id = bn.doc_id JOIN cn ON corpus_id = cn.doc_id
          WHERE i / CAST(bn.n + cn.n - i AS DOUBLE) >= {JACCARD_THRESHOLD}),
best AS (SELECT * FROM (
           SELECT new_id, corpus_id, jaccard,
                  row_number() OVER (PARTITION BY new_id
                                     ORDER BY jaccard DESC, corpus_id) AS rk
           FROM pairs) WHERE rk = 1),
spine AS (SELECT DISTINCT doc_id FROM documents WHERE doc_id % {m} = 0)
SELECT s.doc_id, best.corpus_id IS NOT NULL AS is_neardup,
       CAST(coalesce(best.corpus_id, -1) AS BIGINT) AS dup_of,
       CAST(coalesce(best.jaccard, 0.0) AS DOUBLE) AS jaccard
FROM spine s LEFT JOIN best ON s.doc_id = best.new_id"""


@register("x83_incremental_neardup", _x83_sql(), "EXT-01", "EXT-02", tier=1)
def x83_incremental_neardup(spark, sf_dir):
    """Nightly-ingest NEAR-dup (r6): the new batch (every 5th doc) checked
    against the existing corpus by banded MinHash-LSH candidates + exact
    Jaccard verification, reporting each batch doc's best corpus match —
    the near-dup sibling of the exact-fingerprint incremental tiers
    (x45/x57/x72), completing the ingest-dedup matrix (exact batch, exact
    streamed, exact bloom-accelerated, NEAR-dup indexed). Candidates are
    a band-key equi-join of batch bands vs corpus-index bands — never
    batch × corpus; verification touches candidate pairs only."""
    docs = _t(spark, sf_dir, "documents")
    key = F.col("doc_id") % NEARDUP_BATCH_MOD
    return D.incremental_neardup(
        docs.filter(key == 0), docs.filter(key != 0), threshold=JACCARD_THRESHOLD
    )


#: part co-purchase edges: parts sharing an order (via lineitem) — the
#: one oracle-side rendering of the per-basket self-join, shared with x90.
_COOC_EDGES_CTE = B.cooc_pairs_sql("lineitem", "l_orderkey", "l_partkey")

#: x85 counts triangles of the RECURRING co-purchase graph: an edge must
#: appear in at least this many baskets. A single shared basket between
#: two of 20k parts is fixture noise (the unthresholded graph is
#: near-complete, avg degree ~120 at sf0.1 — an artifact, not signal);
#: support thresholds are the canonical market-basket denoiser and keep
#: the triangle kernel pointed at actual structure.
X85_MIN_SUPPORT = 2

_X85_EDGES_CTE = f"""SELECT a, b FROM (
  SELECT a, b, count(*) AS c FROM ({_COOC_EDGES_CTE}) GROUP BY a, b)
WHERE c >= {X85_MIN_SUPPORT}"""


@register(
    "x85_triangle_counts", G.triangle_counts_oracle_sql(_X85_EDGES_CTE),
    "EXT-GRAPH", tier=1,
)
def x85_triangle_counts(spark, sf_dir):
    """Per-part triangle counts over the recurring co-purchase graph
    (part pairs sharing ≥ X85_MIN_SUPPORT orders, via lineitem) — the
    standard graph cohesion kernel next to x27's connected components
    and x68's PageRank. The distributed plan is degree-oriented so wedge
    work is O(m^1.5) even under hub skew (:func:`operators.graph.
    triangle_counts`); edge construction is the shared per-basket
    self-join (bounded by the order's line count, linear in lineitem)
    plus one pair-count groupBy for the support filter."""
    return G.triangle_counts(_x85_edges(spark, sf_dir))


_X86_SQL = """WITH f AS (
  SELECT doc_id,
         CASE WHEN length(coalesce(text, '')) = 0 THEN 0
              ELSE ascii(substr(coalesce(text, ''), 1, 1)) END AS first,
         octet_length(encode(coalesce(text, ''))) AS nb
  FROM documents),
c AS (
  SELECT doc_id,
         8000 + (first % 8) * 1000 AS rate,
         40 + nb % 216 AS n,
         1 + first % 127 AS v
  FROM f)
SELECT doc_id,
       CAST(rate AS BIGINT) AS sample_rate,
       CAST(n AS BIGINT) AS n_samples,
       CAST(n * 1000000 // rate AS BIGINT) AS duration_us,
       CAST(v AS BIGINT) AS amp_min,
       CAST(v AS BIGINT) AS amp_max,
       CAST(v * n AS BIGINT) AS amp_sum
FROM c"""


@register("x86_audio_pcm_stats", _X86_SQL, "EXT-04", tier=1)
def x86_audio_pcm_stats(spark, sf_dir):
    """EXT-04 audio tier with a REAL codec under driver hash: spec-valid
    RIFF/WAVE PCM payloads are assembled JVM-side from closed forms of
    the text (:func:`operators.multimodal.attach_wav_payload` — rows with
    an odd first codepoint carry an extra LIST chunk between fmt and
    data, so only a genuine chunk walker parses half the corpus), then
    the pure-stdlib+numpy PCM decoder (:func:`operators.multimodal.
    decode_wav`) re-reads rate and actual int16 samples whose integer
    stats the oracle recomputes from the same closed forms. With BMP, PNG
    and GIF pixels (x60/x78) this makes audio the fourth genuinely
    decoded modality; variable-sample parses (negative amplitudes, 8-bit,
    stereo, pad bytes, truncation) are unit-pinned in
    tests/test_wav_codec.py."""
    from .operators.multimodal import attach_wav_payload, pcm_stats

    return pcm_stats(attach_wav_payload(_t(spark, sf_dir, "documents")))


_X87_K = 64
_X87_SQL = f"""WITH pairs AS (
  SELECT DISTINCT l_returnflag, l_linestatus, CAST(l_partkey AS VARCHAR) AS key
  FROM lineitem),
h AS (SELECT DISTINCT l_returnflag, l_linestatus,
             {R.hex_chunk_sql("md5(key)", 1)} AS h
      FROM pairs),
r AS (SELECT l_returnflag, l_linestatus, h,
             row_number() OVER (PARTITION BY l_returnflag, l_linestatus
                                ORDER BY h) AS rnk
      FROM h),
sk AS (SELECT l_returnflag, l_linestatus, CAST(count(*) AS BIGINT) AS k_used,
              max(h) AS kth_hash
       FROM r WHERE rnk <= {_X87_K} GROUP BY 1, 2),
ex AS (SELECT l_returnflag, l_linestatus,
              CAST(count(*) AS BIGINT) AS exact_distinct
       FROM pairs GROUP BY 1, 2)
SELECT l_returnflag, l_linestatus, k_used, kth_hash,
       CAST(CASE WHEN k_used < {_X87_K} THEN k_used
            ELSE {(_X87_K - 1) * 4294967296} // greatest(kth_hash, 1)
            END AS BIGINT) AS est_distinct,
       exact_distinct
FROM sk JOIN ex USING (l_returnflag, l_linestatus)"""


@register("x87_kmv_distinct_sketch", _X87_SQL, "EXT-05", tier=1)
def x87_kmv_distinct_sketch(spark, sf_dir):
    """KMV distinct-count sketch per (returnflag, linestatus) stratum: the
    k smallest 32-bit md5-derived hashes of the distinct part keys give
    ``est = (k-1)*2^32 div h_k`` — a mergeable, integer-exact
    cardinality estimator verified next to the exact count
    (:mod:`operators.sketches`). Spark's WindowGroupLimit pushes the
    rank filter below the exchange, so each map task ships ≤ k rows per
    group — the partial-sketch-merge plan, pinned in
    tests/test_sketches.py."""
    from .operators.sketches import kmv_distinct

    return kmv_distinct(
        _t(spark, sf_dir, "lineitem"),
        ["l_returnflag", "l_linestatus"],
        "l_partkey",
        k=_X87_K,
    )


_X88_SQL = f"""WITH {_TOKS_CTE},
{_DS_CTE},
sizes AS (SELECT doc_id, count(*) AS n FROM ds GROUP BY doc_id),
inter AS (SELECT x.doc_id AS doc_a, y.doc_id AS doc_b, count(*) AS i
          FROM ds x JOIN ds y USING (sh)
          WHERE x.doc_id < y.doc_id GROUP BY 1, 2)
SELECT doc_a, doc_b, CAST(i AS BIGINT) AS inter,
       CAST(na.n AS BIGINT) AS n_a, CAST(nb.n AS BIGINT) AS n_b,
       i / CAST(na.n + nb.n - i AS DOUBLE) AS jaccard
FROM inter JOIN sizes na ON doc_a = na.doc_id
           JOIN sizes nb ON doc_b = nb.doc_id
WHERE i / CAST(na.n + nb.n - i AS DOUBLE) >= 0.5"""


@register("x88_prefix_filter_neardup", _X88_SQL, "EXT-02", tier=1)
def x88_prefix_filter_neardup(spark, sf_dir):
    """Prefix-filtered exact Jaccard near-dup join (Bayardo WWW'07):
    candidates only from collisions among each doc's rarest
    ``n - ceil(t*n) + 1`` shingles, yet provably no false negatives —
    the oracle is the EXHAUSTIVE uncapped all-pairs join, so a driver
    hash match is a proof the prefix filter missed nothing
    (:func:`operators.dedup.prefix_filter_jaccard_pairs`). Completes the
    near-dup ladder: df-capped inverted index (x02, approximate under
    the cap), banded MinHash (x03, probabilistic), SimHash (x04),
    prefix filter (exact AND explosion-free)."""
    return D.prefix_filter_jaccard_pairs(
        _t(spark, sf_dir, "documents"), t_num=1, t_den=2
    )


_X89_PROBES = 30


def _cms_bucket_sql(j: int) -> str:
    from .operators.sketches import CMS_WIDTH

    return (
        f"{R.hex_chunk_sql(f'''md5(term || '#cms{j}')''', 1)}"
        f" % {CMS_WIDTH}"
    )


def _cms_counters_with() -> str:
    """The shared WITH-prefix ending in the ``counters`` CTE — the ONE
    oracle-side rendering of the d×W counter build, used by both x89
    (probe estimates) and x91 (streamed counter state)."""
    from .operators.sketches import CMS_DEPTH

    counter_rows = "\nUNION ALL ".join(
        f"SELECT {j} AS j, {_cms_bucket_sql(j)} AS bucket FROM tok"
        for j in range(CMS_DEPTH)
    )
    return f"""WITH {_TOKS_CTE},
tok AS (SELECT term FROM toks, UNNEST(w) AS u(term)),
counters AS (SELECT j, bucket, CAST(count(*) AS BIGINT) AS cnt
             FROM ({counter_rows}) GROUP BY j, bucket)"""


def _x89_sql() -> str:
    from .operators.sketches import CMS_DEPTH

    probe_rows = "\nUNION ALL ".join(
        f"SELECT term, {j} AS j, {_cms_bucket_sql(j)} AS bucket FROM probes"
        for j in range(CMS_DEPTH)
    )
    return f"""{_cms_counters_with()},
probes AS (SELECT term FROM (SELECT DISTINCT term FROM tok)
           ORDER BY md5(term), term LIMIT {_X89_PROBES}),
pj AS ({probe_rows}),
est AS (SELECT pj.term, min(coalesce(c.cnt, 0)) AS est_count
        FROM pj LEFT JOIN counters c USING (j, bucket) GROUP BY pj.term),
ex AS (SELECT term, CAST(count(*) AS BIGINT) AS exact_count
       FROM tok JOIN probes USING (term) GROUP BY term)
SELECT term, CAST(est_count AS BIGINT) AS est_count, exact_count
FROM est JOIN ex USING (term)"""


@register("x89_cms_point_frequency", _x89_sql(), "EXT-05", tier=1)
def x89_cms_point_frequency(spark, sf_dir):
    """Count-min sketch point-frequency estimates for a deterministic
    30-term probe panel (min-md5 vocabulary sample), next to the exact
    counts: the sketch state is a fixed d×W counter table built by one
    map-side-combined shuffle of ≤ d·W rows per task, and the estimate
    is the min over d broadcast-joined bucket counters — an upper bound
    that equals truth unless buckets collide (:mod:`operators.sketches`).
    Completes the sketch family: Bloom (x72 membership), KMV (x87
    cardinality), Misra-Gries (x63 heavy hitters), CMS (point counts)."""
    from .operators.sketches import cms_counters, cms_estimate

    toked = T._with_tokens(_t(spark, sf_dir, "documents"), "doc_id", "text")
    tokens = D._persist(
        toked.select(F.explode(F.col("__toks")).alias("term"))
    )
    counters = cms_counters(tokens)
    probes = (
        tokens.select("term")
        .distinct()
        .orderBy(F.md5(F.col("term")), F.col("term"))
        .limit(_X89_PROBES)
    )
    probes = D._persist(probes)
    exact = (
        tokens.join(F.broadcast(probes), "term")  # bounded: fixed probe-term panel
        .groupBy("term")
        .agg(F.count("*").cast("long").alias("exact_count"))
    )
    return cms_estimate(counters, probes).join(exact, "term")


_X90_TOPK = 50
_X90_SQL = f"""WITH items AS (
  SELECT DISTINCT l_orderkey AS b, l_partkey AS i FROM lineitem),
n AS (SELECT CAST(count(DISTINCT b) AS BIGINT) AS n_baskets FROM items),
ic AS (SELECT i, CAST(count(*) AS BIGINT) AS c FROM items GROUP BY i),
pc AS (SELECT a AS item_a, b AS item_b, CAST(count(*) AS BIGINT) AS c_ab
       FROM ({_COOC_EDGES_CTE}) GROUP BY 1, 2)
SELECT item_a, item_b, c_ab, ca.c AS c_a, cb.c AS c_b, n.n_baskets,
       (CAST(c_ab AS DOUBLE) * n.n_baskets)
         / (CAST(ca.c AS DOUBLE) * cb.c) AS lift
FROM pc JOIN ic ca ON item_a = ca.i JOIN ic cb ON item_b = cb.i CROSS JOIN n
ORDER BY lift DESC, item_a, item_b LIMIT {_X90_TOPK}"""


@register("x90_association_lift", _X90_SQL, "EXT-ANALYTICS", tier=1)
def x90_association_lift(spark, sf_dir):
    """Market-basket association mining: top-50 part pairs by lift over
    the order→part baskets (:func:`operators.basket.association_lift`).
    Pair generation is the per-basket self-join (bounded by basket
    size, linear in lineitem); marginals and the basket total are one
    groupBy + a broadcast 1-row scalar; the only float operation is the
    single lift division over exact BIGINT products, so top-k selection
    cannot diverge between engines."""
    from .operators.basket import association_lift

    return association_lift(
        _t(spark, sf_dir, "lineitem"), "l_orderkey", "l_partkey",
        top_k=_X90_TOPK,
    )


def _x91_sql() -> str:
    return f"{_cms_counters_with()}\nSELECT j, bucket, cnt FROM counters"


@register(
    "x91_stream_cms_counters", _x91_sql(), "EXT-05", "EXT-08", "EXT-09",
    tier=1,
)
def x91_stream_cms_counters(spark, sf_dir):
    """The x89 count-min counter table maintained as STREAMING STATE
    over the documents ingest stream (availableNow replay): additive
    counters make the complete-mode aggregate exact across any
    micro-batch split, and the state stays ≤ d·W rows forever —
    sketches and streaming compose for free
    (:func:`streaming.jobs.stream_cms_counters`; multi-batch
    accumulation pinned in tests/test_stream_cms.py). The oracle is the
    batch counter build, so a hash match proves the replayed stream
    state equals the batch sketch bit-for-bit."""
    from .streaming.jobs import run_stream_cms

    return run_stream_cms(spark, sf_dir)


# ---------------------------------------------------------------------------
# r6 second wave: distributed order statistics, BFS, conditional-LM and
# character-distribution quality scores (operators/order_stats.py,
# graph.bfs_hops, textanalysis.bigram_logprob/char_entropy/zlib_ratio).
# ---------------------------------------------------------------------------

#: integer cents of the lineitem price — the shared half-up fixed-point
#: recipe (floor(x*100 + 0.5)), exact in both engines.
_X92_VALS_CTE = (
    "SELECT CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS p FROM lineitem"
)


@register(
    "x92_exact_quantiles", OS.exact_quantiles_sql(_X92_VALS_CTE),
    "EXT-ANALYTICS", tier=1,
)
def x92_exact_quantiles(spark, sf_dir):
    """EXACT p50/p90/p99 of the lineitem price (integer cents) WITHOUT a
    global sort: iterative histogram refinement
    (:func:`operators.order_stats.exact_quantiles`) — one full scan per
    level, each level's scan predicate-pushed to ~1/1024 of the previous
    range, final selection a bounded top-k. The oracle computes the same
    ranks over an explicit row_number sort, so the hash match proves the
    distributed-selection algorithm exact.

    Completes the percentile ladder: p1 (holistic, small groups), p2
    (distinct-value histogram — needs |distinct| to fit a per-group
    window), p3 (approx sketches, bounded error), x92 (exact at ANY
    value cardinality: the value DOMAIN is bisected, never the value
    set materialized)."""
    vals = _t(spark, sf_dir, "lineitem").select(
        F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5)).cast("long").alias("p")
    )
    return OS.exact_quantiles(vals, "p")


_X93_ROWS_CTE = (
    "SELECT lang, doc_id, greatest(coalesce(n_chars, 0), 1) AS w FROM documents"
)


@register(
    "x93_weighted_sample",
    OS.weighted_sample_sql(_X93_ROWS_CTE, "lang", "doc_id", "w", k=10),
    "EXT-05", "EXT-ANALYTICS", tier=1,
)
def x93_weighted_sample(spark, sf_dir):
    """Deterministic 10-doc weighted sample per language by sequential
    Poisson sampling — priority is the exact integer ``(u<<20) div w``
    (u = md5-derived, w = n_chars), so longer documents are
    proportionally likelier and both engines rank identical keys. The
    per-group top-k rides WindowGroupLimit (k rows per group per map
    task, pinned in tests/test_plans.py)."""
    docs = _t(spark, sf_dir, "documents").select(
        "lang", "doc_id",
        F.greatest(F.coalesce(F.col("n_chars"), F.lit(0)), F.lit(1)).alias("w"),
    )
    return OS.weighted_sample(docs, "lang", "doc_id", "w", k=10)


#: one edge DataFrame per (application, sf_dir): three graph kernels
#: (x85 triangles, x94 BFS, x100 k-core) read the same support-thresholded
#: co-purchase graph, and inside the x84 suite they run in ONE query — the
#: memo + persist makes the lineitem self-join pay out once per suite
#: evaluation instead of once per kernel. release_cached_intermediates()
#: unpersists the frame; the next call re-persists the memoized lineage.
_X85_EDGE_CACHE: dict = {}


def _x85_edges(spark, sf_dir):
    """The recurring co-purchase edge list shared by the graph kernels
    x85 (triangles), x94 (BFS) and x100 (k-core peel): support-thresholded
    part pairs sharing an order."""
    app = spark.sparkContext.applicationId

    def _build():
        pairs = B.cooccurrence_pairs(
            _t(spark, sf_dir, "lineitem"), "l_orderkey", "l_partkey"
        )
        return (
            pairs.groupBy("a", "b")
            .agg(F.count("*").alias("__c"))
            .filter(F.col("__c") >= X85_MIN_SUPPORT)
            .select("a", "b")
        )

    edges = D.memo_get_or_build(_X85_EDGE_CACHE, app, (app, sf_dir), _build)
    return D._persist(edges)


@register(
    "x94_bfs_hops", G.bfs_hops_oracle_sql(_X85_EDGES_CTE), "EXT-GRAPH",
    tier=1,
)
def x94_bfs_hops(spark, sf_dir):
    """Minimum hop distance (≤3) from the 5 smallest part ids over the
    recurring co-purchase graph — frontier-expansion BFS
    (:func:`operators.graph.bfs_hops`): per level one frontier hash join
    + distinct + anti-join against visited, frontiers persisted, empty
    frontier short-circuits. The oracle unrolls the levels as chained
    CTEs over the SAME edge CTE x85 uses."""
    return G.bfs_hops(_x85_edges(spark, sf_dir))


def _x95_sql() -> str:
    return (
        "WITH "
        + _TOKS_CTE
        + """,
bg AS (SELECT doc_id, u.pair[1] AS w1, u.pair[2] AS w2
       FROM toks, UNNEST(list_transform(range(1, len(w)),
                                        i -> [w[i], w[i + 1]])) AS u(pair)),
c12 AS (SELECT w1, w2, count(*) AS c12 FROM bg GROUP BY w1, w2),
c1 AS (SELECT w1, count(*) AS c1 FROM bg GROUP BY w1),
vocab AS (SELECT count(DISTINCT u.term) AS v FROM toks, UNNEST(w) AS u(term)),
lp AS (SELECT b.doc_id,
              ln(CAST(c.c12 + 1 AS DOUBLE) / CAST(c1.c1 + vocab.v AS DOUBLE)) AS lp
       FROM bg b JOIN c12 c USING (w1, w2) JOIN c1 USING (w1), vocab),
agg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigram,
               round(avg(lp), 4) AS avg_logp
        FROM lp GROUP BY doc_id)
SELECT d.doc_id, COALESCE(a.n_bigram, 0) AS n_bigram,
       COALESCE(a.avg_logp, 0.0) AS avg_logp
FROM documents d LEFT JOIN agg a USING (doc_id)"""
    )


@register("x95_bigram_logprob", _x95_sql(), "EXT-05", tier=1)
def x95_bigram_logprob(spark, sf_dir):
    """Add-1-smoothed bigram-LM quality score: mean ln P(w2|w1) per doc
    under the corpus's own bigram model — the conditional complement to
    x52's unigram score (word-ORDER anomalies score low even when every
    word is common). Three shuffles at any scale
    (:func:`operators.textanalysis.bigram_logprob`)."""
    return T.bigram_logprob(_t(spark, sf_dir, "documents"))


_X96_ROWS_CTE = (
    "SELECT p_brand, p_partkey, CAST(p_size AS BIGINT) AS sz, "
    "CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT) AS pc FROM part"
)


@register(
    "x96_skyline_pareto",
    OS.skyline_2d_sql(_X96_ROWS_CTE, "p_brand", "sz", "pc", "p_partkey"),
    "EXT-ANALYTICS", tier=1,
)
def x96_skyline_pareto(spark, sf_dir):
    """Per-brand Pareto frontier over parts (maximize size, minimize
    price): the Spark plan is one (brand, size) aggregation + a
    running-min window over ≤50 rows per brand + a broadcast semi-join
    back (:func:`operators.order_stats.skyline_2d`); the oracle is the
    O(n²)-shaped NOT-EXISTS dominance predicate — two independent
    algorithms, one hash."""
    rows = _t(spark, sf_dir, "part").select(
        "p_brand", "p_partkey",
        F.col("p_size").cast("long").alias("sz"),
        F.floor(F.col("p_retailprice") * 100 + F.lit(0.5)).cast("long").alias("pc"),
    )
    return OS.skyline_2d(rows, "p_brand", "sz", "pc", "p_partkey")


#: x97 normalizes NULL text to '' BEFORE the OP-31 lower/trim/collapse so
#: empty and NULL docs take the same zero path in both engines.
_X97_NORM = r"lower(trim(regexp_replace(coalesce(text, ''), '\s+', ' ', 'g')))"

_X97_SQL = f"""WITH nt AS (SELECT doc_id, {_X97_NORM} AS t FROM documents),
ch AS (SELECT doc_id, substr(t, CAST(i AS INTEGER), 1) AS ch
       FROM nt, UNNEST(range(1, len(t) + 1)) AS u(i)),
cc AS (SELECT doc_id, ch, count(*) AS cnt FROM ch GROUP BY doc_id, ch),
ag AS (SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_chars,
              CAST(count(*) AS BIGINT) AS n_distinct_chars,
              sum(cnt * ln(cnt)) AS s
       FROM cc GROUP BY doc_id)
SELECT d.doc_id, COALESCE(a.n_chars, 0) AS n_chars,
       COALESCE(a.n_distinct_chars, 0) AS n_distinct_chars,
       COALESCE(round(ln(a.n_chars) - a.s / a.n_chars, 4), 0.0) AS entropy
FROM documents d LEFT JOIN ag a USING (doc_id)"""


@register("x97_char_entropy", _X97_SQL, "EXT-05", tier=1)
def x97_char_entropy(spark, sf_dir):
    """Shannon character entropy of the normalized text per document
    (``H = ln n − (Σ c·ln c)/n`` in ONE aggregate pass) — the
    repeated-junk / random-blob tails filter
    (:func:`operators.textanalysis.char_entropy`)."""
    return T.char_entropy(_t(spark, sf_dir, "documents"))


@register("x98_zlib_ratio", None, "EXT-05", tier=1)
def x98_zlib_ratio(spark, sf_dir):
    """DEFLATE compression-ratio boilerplate signal (RefinedWeb-style):
    integer byte counts from an Arrow-batched ``mapInPandas`` over
    (id, text) — the deliberate Python-tier operator (zlib has no JVM
    expression form), shuffle-free. Rows-only registry entry: DuckDB
    cannot DEFLATE, so the value-level pin is the local ground-truth
    test (tests/test_order_stats.py)."""
    return T.zlib_ratio(_t(spark, sf_dir, "documents"))


_X99_ROWS_CTE = "SELECT o_orderpriority AS g, o_custkey AS key FROM orders"


@register(
    "x99_kmv_set_relations",
    SKS.kmv_set_relations_sql(_X99_ROWS_CTE, k=64),
    "EXT-05", "EXT-ANALYTICS", tier=1,
)
def x99_kmv_set_relations(spark, sf_dir):
    """KMV set algebra between order-priority strata: per unordered pair
    of priorities, merged-sketch estimates of the customer-set union
    size, intersection size, and Jaccard similarity next to the exact
    values (:func:`operators.sketches.kmv_set_relations`, Beyer et al.
    SIGMOD 2007). The estimator is pure integer arithmetic over
    md5-derived hashes, so the driver hash-pins an *approximate*
    operator's algebra exactly; everything pairwise happens on k-row
    sketch frames."""
    rows = _t(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("g"), F.col("o_custkey").alias("key")
    )
    return SKS.kmv_set_relations(rows, "g", "key", k=64)


#: k-core threshold and peel bound for x100 — k=3 keeps a non-trivial
#: mutually-dense region of the support-2 co-purchase graph at sf0.01
#: (k=4 empties it); 8 rounds is the PageRank-style fixed iteration
#: budget both engines unroll identically.
X100_K, X100_ROUNDS = 3, 8


@register(
    "x100_kcore_peel",
    G.kcore_oracle_sql(_X85_EDGES_CTE, k=X100_K, rounds=X100_ROUNDS),
    "EXT-GRAPH", tier=1,
)
def x100_kcore_peel(spark, sf_dir):
    """Bounded k-core peeling over the recurring co-purchase graph
    (:func:`operators.graph.kcore`): 8 degree-filter rounds toward the
    3-core, each round one map-side-combined degree count + two
    semi-joins on the shrinking edge list. Completes the graph kernel
    set (components x27/x41, PageRank x68, triangles x85, BFS x94) with
    the standard density denoiser; the oracle unrolls the same 8
    MATERIALIZED peel levels."""
    return G.kcore(_x85_edges(spark, sf_dir), k=X100_K, rounds=X100_ROUNDS)


def _x101_sql() -> str:
    from .operators.reconcile import hex_chunk_sql
    from .operators.sketches import HASH_SPACE
    from .streaming.jobs import KMV_STATE_K as k
    norm = r"lower(trim(regexp_replace(coalesce(text, ''), '\s+', ' ', 'g')))"
    h = hex_chunk_sql(f"md5({norm})", 1)
    return f"""WITH hs AS (SELECT coalesce(lang, '~') AS lang, {h} AS h
            FROM documents),
  d AS (SELECT DISTINCT lang, h FROM hs),
  rk AS (SELECT lang, h,
                row_number() OVER (PARTITION BY lang ORDER BY h) AS rn
         FROM d),
  sk AS (SELECT lang, CAST(count(*) AS BIGINT) AS k_used,
                max(h) AS kth_hash
         FROM rk WHERE rn <= {k} GROUP BY lang)
SELECT lang, k_used, kth_hash,
       CAST(CASE WHEN k_used < {k} THEN k_used
            ELSE {(k - 1) * HASH_SPACE} // greatest(kth_hash, 1)
       END AS BIGINT) AS est_distinct
FROM sk"""


@register("x101_stream_kmv_state", _x101_sql(), "EXT-09", "EXT-05", tier=1)
def x101_stream_kmv_state(spark, sf_dir):
    """The x87 KMV distinct sketch as STREAMING GROUP STATE
    (:func:`streaming.jobs.stream_kmv_state`): per language, the k
    smallest fingerprint hashes live as ``applyInPandasWithState`` state
    (k longs forever), merged per micro-batch by the same k-min set
    union that makes KMV mergeable across shards — so the replayed
    sketch is bit-identical to this batch-SQL oracle under ANY
    micro-batch split, with no arrival-order assumption at all.
    Multi-batch replay equivalence pinned in tests/test_stream_kmv.py."""
    from .streaming.jobs import run_stream_kmv

    return run_stream_kmv(spark, sf_dir)


@register(
    "x102_equidepth_histogram",
    OS.equidepth_histogram_sql(_X92_VALS_CTE, n_bins=10),
    "EXT-ANALYTICS", tier=1,
)
def x102_equidepth_histogram(spark, sf_dir):
    """Equi-depth decile histogram of the lineitem price (integer cents):
    boundaries from the x92 exact-quantile selection (ONE shared level-0
    scan + a tiny pushed-down scan per boundary), assignment as an
    embarrassingly parallel projection against 9 broadcast-by-literal
    boundary longs, rollup as a ≤10-group map-side-combined aggregate —
    the scale-correct NTILE (:func:`operators.order_stats
    .equidepth_histogram`); the oracle assigns buckets via a correlated
    strictly-greater count over row_number-selected boundaries."""
    vals = _t(spark, sf_dir, "lineitem").select(
        F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5)).cast("long").alias("p")
    )
    return OS.equidepth_histogram(vals, "p", n_bins=10)


_X103_ROWS_CTE = (
    "SELECT user_id AS g, epoch_us(ts) // 86400000000 AS x, "
    "CAST(floor(value * 100 + 0.5) AS BIGINT) AS y FROM events"
)


@register(
    "x103_ols_trend",
    AGG.ols_trend_sql(_X103_ROWS_CTE, "user_id"),
    "EXT-ANALYTICS", tier=1,
)
def x103_ols_trend(spark, sf_dir):
    """Per-user OLS spend-trend line over the events stream
    (:func:`operators.aggregates.ols_trend`): slope/intercept of
    quantized cents over epoch-days — integer-exact centered sums, one
    keyed min-join + one map-side-combined aggregate; only the final
    slope combination runs in doubles, over the identical expression
    tree in both engines. The drift detector that tells 'this user's
    value is trending' apart from x75's point anomalies."""
    ev = _t(spark, sf_dir, "events")
    return AGG.ols_trend(
        ev,
        "user_id",
        F.expr("unix_micros(CAST(ts AS timestamp)) div 86400000000"),
        F.floor(F.col("value") * 100 + 0.5),
    )


def _c6_sql() -> str:
    wk = A.WEEK_US
    return f"""WITH f AS ({member_oracle('x71_funnel_stages')}),
  conv AS (SELECT user_id, t1_us // {wk} AS cw, t3_us - t1_us AS lat
           FROM f WHERE stage = 3),
  rk AS (SELECT cw, lat,
                row_number() OVER (PARTITION BY cw ORDER BY lat, user_id)
                  AS rn,
                count(*) OVER (PARTITION BY cw) AS n
         FROM conv)
SELECT CAST(cw AS BIGINT) AS cohort_week, CAST(n AS BIGINT) AS n_conv,
       CAST(lat AS BIGINT) AS median_latency_us
FROM rk WHERE rn = greatest(1, (50 * n + 99) // 100)"""


@register("c6_funnel_latency", _c6_sql(), "EXT-FUNNEL", "EXT-ANALYTICS", tier=1)
def c6_funnel_latency(spark, sf_dir):
    """Composed pipeline: per signup-week cohort, the median
    signup→purchase latency among fully converted users — x71's stage
    machinery (three stacked window minima on one user exchange) feeding
    the discrete-percentile rank selection, cohorted by the x107
    epoch-week quantum. The time-to-convert answer product teams ask
    right after the funnel itself; all integer microseconds."""
    e = _t(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    f = funnel_stages(e.select("user_id", us.alias("us"), "event_type"))
    conv = f.filter(F.col("stage") == 3).select(
        "user_id",
        F.expr(f"t1_us div {A.WEEK_US}").alias("cw"),
        (F.col("t3_us") - F.col("t1_us")).alias("lat"),
    )
    wr = Window.partitionBy("cw").orderBy("lat", "user_id")
    wc = Window.partitionBy("cw")
    return (
        conv.withColumn("rn", F.row_number().over(wr))
        .withColumn("n", F.count(F.lit(1)).over(wc))
        .filter(F.col("rn") == F.greatest(F.lit(1), F.expr("(50 * n + 99) div 100")))
        .select(
            F.col("cw").cast("long").alias("cohort_week"),
            F.col("n").cast("long").alias("n_conv"),
            F.col("lat").cast("long").alias("median_latency_us"),
        )
    )


@register(
    "x114_frequent_trigrams",
    A.frequent_trigrams_sql(
        "SELECT user_id AS u, epoch_us(ts) AS us, event_id, event_type AS et"
        " FROM events"
    ),
    "EXT-ANALYTICS", tier=1,
)
def x114_frequent_trigrams(spark, sf_dir):
    """Top-20 length-3 event sequences across users
    (:func:`operators.audit.frequent_trigrams`): the sequence-mining
    step past x109's pair matrix — behavioral motifs only visible as
    counted n-grams. Two leads on ONE user-keyed exchange, a ≤|types|³
    groupBy, and a distributed sort+limit top-k."""
    return A.frequent_trigrams(_t(spark, sf_dir, "events"))


@register(
    "x113_mad_robust", OS.mad_robust_sql(_X92_VALS_CTE),
    "EXT-ANALYTICS", tier=1,
)
def x113_mad_robust(spark, sf_dir):
    """Exact median + median absolute deviation of the lineitem price
    (integer cents) — the outlier-immune center/scale pair
    (:func:`operators.order_stats.mad_robust`), computed as two
    histogram-refinement selections (~2 predicate-pushed scans at any
    cardinality, never a sort); the oracle runs both medians as explicit
    row_number rank selections."""
    vals = _t(spark, sf_dir, "lineitem").select(
        F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5)).cast("long").alias("p")
    )
    return OS.mad_robust(vals, "p")


_X112_EVENTS_CTE = (
    "SELECT user_id AS u, epoch_us(ts) AS us, "
    "CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents FROM events"
)


@register(
    "x112_decayed_value",
    A.decayed_value_sql(_X112_EVENTS_CTE, "user_id"),
    "EXT-ANALYTICS", tier=1,
)
def x112_decayed_value(spark, sf_dir):
    """Recency-weighted per-user value with half-life decay quantized to
    integer right-shifts (:func:`operators.audit.decayed_value`):
    ``cents >> (age div half_life)`` — a staircase exponential that is
    exact, order-free integer arithmetic in both engines (float decay is
    unhashable); reference point = corpus max ts, a 1-row broadcast.
    One scan + one user-keyed aggregate."""
    return A.decayed_value(_t(spark, sf_dir, "events"))


_X111_ROWS_CTE = (
    "SELECT doc_id AS rid, CAST(n_chars AS BIGINT) AS v FROM documents"
)


@register(
    "x111_percentile_rank",
    OS.percentile_rank_sql(_X111_ROWS_CTE, "doc_id", "n_chars"),
    "EXT-ANALYTICS", "EXT-05", tier=1,
)
def x111_percentile_rank(spark, sf_dir):
    """Exact per-mille percentile-rank normalization of document lengths
    (:func:`operators.order_stats.percentile_rank`): the rank-transform
    feature scaling, built as a distinct-value CDF + value-keyed join
    back — never the global percent_rank window the oracle runs, so the
    hash match cross-checks the CDF join against the textbook window."""
    return OS.percentile_rank(
        _t(spark, sf_dir, "documents"), "doc_id", "n_chars"
    )


_X110_EDGES_CTE = f"""SELECT a, b, 1000 // c AS w FROM (
  SELECT a, b, count(*) AS c FROM ({_COOC_EDGES_CTE}) GROUP BY a, b)
WHERE c >= {X85_MIN_SUPPORT}"""


@register(
    "x110_cheapest_paths",
    G.cheapest_paths_oracle_sql(_X110_EDGES_CTE),
    "EXT-GRAPH", tier=1,
)
def x110_cheapest_paths(spark, sf_dir):
    """Bounded Bellman-Ford over the support-weighted co-purchase graph
    (:func:`operators.graph.cheapest_paths`): minimum path cost from the
    5 smallest parts using ≤ 3 edges, edge weight = ``1000 div support``
    so well-trodden co-purchase links are cheap — the weighted
    complement to x94's hop BFS. 'Cheapest ≤k-edge path' is the k-round
    Bellman-Ford invariant, well-defined on its own terms; all-integer
    costs, rounds unrolled identically by the oracle."""
    pairs = B.cooccurrence_pairs(
        _t(spark, sf_dir, "lineitem"), "l_orderkey", "l_partkey"
    )
    ew = (
        pairs.groupBy("a", "b")
        .agg(F.count("*").alias("__c"))
        .filter(F.col("__c") >= X85_MIN_SUPPORT)
        .select("a", "b", F.expr("1000 div __c").alias("w"))
    )
    return G.cheapest_paths(ew)


_X109_EVENTS_CTE = (
    "SELECT user_id AS u, epoch_us(ts) AS us, event_id, event_type AS et "
    "FROM events"
)


@register(
    "x109_markov_transitions",
    A.markov_transitions_sql(_X109_EVENTS_CTE),
    "EXT-ANALYTICS", tier=1,
)
def x109_markov_transitions(spark, sf_dir):
    """First-order Markov transition matrix over per-user event sequences
    (:func:`operators.audit.markov_transitions`): (from→to) counts from
    one user-keyed lead window + integer per-mille row-normalized
    probabilities — the all-paths complement to x71's fixed funnel."""
    return A.markov_transitions(_t(spark, sf_dir, "events"))


_X108_ROWS_CTE = "SELECT o_orderpriority AS g, o_custkey AS k FROM orders"


@register(
    "x108_bitmap_set_relations",
    SKS.bitmap_set_relations_sql(_X108_ROWS_CTE),
    "EXT-ANALYTICS", "EXT-AUDIT", tier=1,
)
def x108_bitmap_set_relations(spark, sf_dir):
    """EXACT customer-set overlap between order priorities via bitmap
    indexes (:func:`operators.sketches.bitmap_set_relations`): distinct
    custkeys pack into 62-bit words by one map-side-combined bit_or,
    intersections are bit_count(a & b) word joins — while the oracle
    runs plain pairwise COUNT(DISTINCT) joins, so the hash match
    cross-checks two independent algorithms. The dense-domain exact
    complement to x99's KMV estimates."""
    rows = _t(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("g"), F.col("o_custkey").alias("k")
    )
    return SKS.bitmap_set_relations(rows, "g", "k")


_X107_EVENTS_CTE = "SELECT user_id AS u, epoch_us(ts) AS us FROM events"


@register(
    "x107_cohort_retention",
    A.cohort_retention_sql(_X107_EVENTS_CTE),
    "EXT-ANALYTICS", tier=1,
)
def x107_cohort_retention(spark, sf_dir):
    """Cohort retention triangle over the events stream
    (:func:`operators.audit.cohort_retention`): users cohorted by the
    epoch-week of their first event, cells count distinct users active
    at each week offset — all-integer fixed-quantum bucketing, two
    map-side-combined aggregates + one user-keyed join, output
    O(weeks²/2) at any corpus size."""
    return A.cohort_retention(_t(spark, sf_dir, "events"))


#: (column, kind) spec shared by the x106 Spark profile and its oracle.
_X106_COLS = [
    ("o_orderkey", "int"),
    ("o_custkey", "int"),
    ("o_orderstatus", "str"),
    ("o_totalprice", "cents"),
    ("o_orderdate", "ts"),
    ("o_orderpriority", "str"),
]


@register(
    "x106_table_profile",
    PRF.profile_table_sql("orders", _X106_COLS),
    "EXT-AUDIT", tier=1,
)
def x106_table_profile(spark, sf_dir):
    """One-pass ANALYZE-style profile of the orders table
    (:func:`operators.profile.profile_table`): per column, rows/nulls/
    exact distincts/min/max through the repo's canonical string forms
    (ints, half-up cents, epoch-micros). The shape check next to x66's
    row checksum: the checksum says WHETHER the migration broke, the
    profile says WHAT (null-rate jump, truncated max, collapsed
    cardinality). One aggregate pass; the multi-column exact distinct
    rides Spark's Expand."""
    return PRF.profile_table(_t(spark, sf_dir, "orders"), _X106_COLS)


@register(
    "x105_random_walks",
    G.random_walks_oracle_sql(_X85_EDGES_CTE),
    "EXT-GRAPH", tier=1,
)
def x105_random_walks(spark, sf_dir):
    """Deterministic DeepWalk-style walk corpus over the co-purchase
    graph (:func:`operators.graph.random_walks`): 50 seeds × 3 steps,
    each step's neighbor pick md5-ranked so the embedding corpus is
    reproducible and both engines unroll identical walks — the
    graph→skip-gram training-data bridge. One ranked-adjacency build +
    one keyed join per step."""
    return G.random_walks(_x85_edges(spark, sf_dir))


_X104_ROWS_CTE = "SELECT c_custkey AS rid, c_name AS s FROM customer"


@register(
    "x104_editdist1_join",
    D.editdist1_pairs_sql(_X104_ROWS_CTE),
    "EXT-02", tier=1,
)
def x104_editdist1_join(spark, sf_dir):
    """EXACT edit-distance-≤1 name-pair join over customers via FastSS
    deletion neighborhoods (:func:`operators.dedup.editdist1_pairs`) —
    one high-entropy equi-join + row-local levenshtein verify, while the
    oracle runs the exhaustive O(n²) levenshtein matrix, so the driver
    hash match is the zero-false-negative proof run as data. The
    single-typo record-linkage tier next to x88's token-set Jaccard
    filter and c3's blocked fuzzy ER."""
    cust = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("rid"), F.col("c_name").alias("s")
    )
    return D.editdist1_pairs(cust, "rid", "s")


def _x84a_sql() -> str:
    z = "CAST(0 AS BIGINT)"
    zd = "CAST(0.0 AS DOUBLE)"
    return f"""SELECT 'bpetrain' AS kind, rk AS id1, {z} AS id2,
       n AS v1, {z} AS v2, {z} AS v3, {zd} AS d1, {zd} AS d2,
       concat_ws('|', coalesce(lhs, '~'), coalesce(rhs, '~')) AS s1
FROM ({member_oracle('x80_bpe_train_merges')})
UNION ALL
SELECT 'bpeenc', rk, {z}, n, {z}, {z}, {zd}, {zd}, sym
FROM ({member_oracle('x81_bpe_encode_topk')})
UNION ALL
SELECT 'kmv', exact_distinct, {z}, k_used, kth_hash, est_distinct,
       {zd}, {zd}, concat_ws('|', l_returnflag, l_linestatus)
FROM ({member_oracle('x87_kmv_distinct_sketch')})
UNION ALL
SELECT 'cms', {z}, {z}, est_count, exact_count, {z}, {zd}, {zd}, term
FROM ({member_oracle('x89_cms_point_frequency')})
UNION ALL
SELECT 'scms', j, bucket, cnt, {z}, {z}, {zd}, {zd}, NULL
FROM ({member_oracle('x91_stream_cms_counters')})
UNION ALL
SELECT 'quant', q_pct, rank, value, {z}, {z}, {zd}, {zd}, NULL
FROM ({member_oracle('x92_exact_quantiles')})
UNION ALL
SELECT 'wsamp', doc_id, rk, weight, pri, {z}, {zd}, {zd}, lang
FROM ({member_oracle('x93_weighted_sample')})
UNION ALL
SELECT 'bigram', doc_id, {z}, n_bigram, {z}, {z},
       CAST(avg_logp AS DOUBLE), {zd}, NULL
FROM ({member_oracle('x95_bigram_logprob')})
UNION ALL
SELECT 'entropy', doc_id, {z}, n_chars, n_distinct_chars, {z},
       CAST(entropy AS DOUBLE), {zd}, NULL
FROM ({member_oracle('x97_char_entropy')})
UNION ALL
SELECT 'kmvset', k_used, shared_k, union_est, inter_est, jaccard_milli,
       CAST(exact_inter AS DOUBLE), CAST(exact_union AS DOUBLE),
       concat_ws('|', g1, g2)
FROM ({member_oracle('x99_kmv_set_relations')})
UNION ALL
SELECT 'skmv', k_used, {z}, kth_hash, est_distinct, {z}, {zd}, {zd}, lang
FROM ({member_oracle('x101_stream_kmv_state')})
UNION ALL
SELECT 'histo', bucket, {z}, n_rows, sum_v, min_v, CAST(max_v AS DOUBLE),
       {zd}, NULL
FROM ({member_oracle('x102_equidepth_histogram')})
UNION ALL
SELECT 'prof', n_rows, n_null, n_distinct, {z}, {z}, {zd}, {zd},
       concat_ws('|', column_name, coalesce(min_s, '~'), coalesce(max_s, '~'))
FROM ({member_oracle('x106_table_profile')})
UNION ALL
SELECT 'bitmap', n_a, n_b, n_inter, n_union, jaccard_milli, {zd}, {zd},
       concat_ws('|', g1, g2)
FROM ({member_oracle('x108_bitmap_set_relations')})
UNION ALL
SELECT 'prank', doc_id, {z}, n_chars, pr_milli, {z}, {zd}, {zd}, NULL
FROM ({member_oracle('x111_percentile_rank')})
UNION ALL
SELECT 'decay', user_id, n_events, raw_cents, decayed_cents, {z},
       {zd}, {zd}, NULL
FROM ({member_oracle('x112_decayed_value')})
UNION ALL
SELECT 'mad', n, {z}, median, mad, {z}, {zd}, {zd}, NULL
FROM ({member_oracle('x113_mad_robust')})
UNION ALL
SELECT 'trigram', rk, {z}, n, {z}, {z}, {zd}, {zd}, trigram
FROM ({member_oracle('x114_frequent_trigrams')})"""


@register(
    "x84a_sketch_stream_suite",
    _x84a_sql(),
    "EXT-05", "EXT-08", "EXT-09", "EXT-ANALYTICS",
)
def x84a_sketch_stream_suite(spark, sf_dir):
    """Driver-verified representative for the round-6 sketch / order-
    statistics / text-signal operators (r7 split the 35-member
    x84_r6_ops_suite in two so one member failure no longer poisons 29+
    operators' only driver row, and so per-suite wall time is
    attributable): iterative BPE train + encode (x80/x81), the KMV
    distinct sketch (x87) and its set-relation estimates (x99), the
    count-min point-frequency sketch (x89) and its streamed counter
    state (x91 — a real availableNow stateful replay inside a
    driver-hashed row), the streamed KMV sketch state (x101 — a second
    replay), histogram-refined exact quantiles (x92), the
    sequential-Poisson weighted sample (x93), the bigram-LM quality
    score (x95), the character-entropy signal (x97), the equi-depth
    histogram (x102), the one-pass table profile (x106), bitmap set
    algebra (x108), the percentile-rank signal (x111), half-life-decayed
    aggregates (x112), the exact robust median/MAD (x113) and top-k
    event trigrams (x114), union-folded into the shared kind-tagged
    suite shape. BPE training is deterministic, so the suite runs the
    count→argmax→apply loop ONCE and derives both the x80 and x81
    member shapes from the shared merges/vocab (the standalone members
    each pay their own training)."""
    _bpe_merges, _bpe_vocab = T._bpe_train(
        _t(spark, sf_dir, "documents"), "doc_id", "text", 3
    )
    from functools import reduce

    # x84a deliberately stays in the LAZY-UNION form (no
    # _suite_materialize): its 18 members are individually small (~1.3s
    # average) and their independent subtrees fill the 32 cores through
    # the one action's stage concurrency, which sequential per-member
    # materialization forfeits — r8 same-session A/B, 4 isolated runs
    # each: union 20.7-26.3s warm vs sequential 25.9-27.5s, and the
    # sequential form measured WORSE in the full-bench context too
    # (37.8s vs r7's union 31.5s). x77 is the opposite case (7 heavy
    # members that thrash memory when concurrent) and keeps the
    # sequential form; see _suite_materialize's docstring and SCALE.md.
    # batch members' construction overlapped (guide §2.6); streaming
    # members (session-conf-mutating replays) stay sequential below
    __m_x87, __m_x89, __m_x92, __m_x93, __m_x95, __m_x97, __m_x99, __m_x102, __m_x106, __m_x108, __m_x111, __m_x112, __m_x113, __m_x114 = D.overlap(
        lambda: x87_kmv_distinct_sketch(spark, sf_dir),
        lambda: x89_cms_point_frequency(spark, sf_dir),
        lambda: x92_exact_quantiles(spark, sf_dir),
        lambda: x93_weighted_sample(spark, sf_dir),
        lambda: x95_bigram_logprob(spark, sf_dir),
        lambda: x97_char_entropy(spark, sf_dir),
        lambda: x99_kmv_set_relations(spark, sf_dir),
        lambda: x102_equidepth_histogram(spark, sf_dir),
        lambda: x106_table_profile(spark, sf_dir),
        lambda: x108_bitmap_set_relations(spark, sf_dir),
        lambda: x111_percentile_rank(spark, sf_dir),
        lambda: x112_decayed_value(spark, sf_dir),
        lambda: x113_mad_robust(spark, sf_dir),
        lambda: x114_frequent_trigrams(spark, sf_dir),
    )
    members = [
        _suite_shape(
            T.bpe_merges_output(spark, _bpe_merges, _bpe_vocab), "bpetrain",
            id1=F.col("rk"), v1=F.col("n"),
            s1=F.concat_ws(
                "|",
                F.coalesce(F.col("lhs"), F.lit("~")),
                F.coalesce(F.col("rhs"), F.lit("~")),
            ),
        ),
        _suite_shape(
            T.bpe_encode_output(_bpe_vocab), "bpeenc",
            id1=F.col("rk"), v1=F.col("n"), s1=F.col("sym"),
        ),
        _suite_shape(
            __m_x87, "kmv",
            id1=F.col("exact_distinct"), v1=F.col("k_used"),
            v2=F.col("kth_hash"), v3=F.col("est_distinct"),
            s1=F.concat_ws("|", F.col("l_returnflag"), F.col("l_linestatus")),
        ),
        _suite_shape(
            __m_x89, "cms",
            v1=F.col("est_count"), v2=F.col("exact_count"),
            s1=F.col("term"),
        ),
        _suite_shape(
            x91_stream_cms_counters(spark, sf_dir), "scms",
            id1=F.col("j"), id2=F.col("bucket"), v1=F.col("cnt"),
        ),
        _suite_shape(
            __m_x92, "quant",
            id1=F.col("q_pct"), id2=F.col("rank"), v1=F.col("value"),
        ),
        _suite_shape(
            __m_x93, "wsamp",
            id1=F.col("doc_id"), id2=F.col("rk"), v1=F.col("weight"),
            v2=F.col("pri"), s1=F.col("lang"),
        ),
        _suite_shape(
            __m_x95, "bigram",
            id1=F.col("doc_id"), v1=F.col("n_bigram"), d1=F.col("avg_logp"),
        ),
        _suite_shape(
            __m_x97, "entropy",
            id1=F.col("doc_id"), v1=F.col("n_chars"),
            v2=F.col("n_distinct_chars"), d1=F.col("entropy"),
        ),
        _suite_shape(
            __m_x99, "kmvset",
            id1=F.col("k_used"), id2=F.col("shared_k"),
            v1=F.col("union_est"), v2=F.col("inter_est"),
            v3=F.col("jaccard_milli"),
            d1=F.col("exact_inter"), d2=F.col("exact_union"),
            s1=F.concat_ws("|", F.col("g1"), F.col("g2")),
        ),
        _suite_shape(
            x101_stream_kmv_state(spark, sf_dir), "skmv",
            id1=F.col("k_used"), v1=F.col("kth_hash"),
            v2=F.col("est_distinct"), s1=F.col("lang"),
        ),
        _suite_shape(
            __m_x102, "histo",
            id1=F.col("bucket"), v1=F.col("n_rows"), v2=F.col("sum_v"),
            v3=F.col("min_v"), d1=F.col("max_v"),
        ),
        _suite_shape(
            __m_x106, "prof",
            id1=F.col("n_rows"), id2=F.col("n_null"), v1=F.col("n_distinct"),
            s1=F.concat_ws(
                "|", F.col("column_name"),
                F.coalesce(F.col("min_s"), F.lit("~")),
                F.coalesce(F.col("max_s"), F.lit("~")),
            ),
        ),
        _suite_shape(
            __m_x108, "bitmap",
            id1=F.col("n_a"), id2=F.col("n_b"), v1=F.col("n_inter"),
            v2=F.col("n_union"), v3=F.col("jaccard_milli"),
            s1=F.concat_ws("|", F.col("g1"), F.col("g2")),
        ),
        _suite_shape(
            __m_x111, "prank",
            id1=F.col("doc_id"), v1=F.col("n_chars"), v2=F.col("pr_milli"),
        ),
        _suite_shape(
            __m_x112, "decay",
            id1=F.col("user_id"), id2=F.col("n_events"),
            v1=F.col("raw_cents"), v2=F.col("decayed_cents"),
        ),
        _suite_shape(
            __m_x113, "mad",
            id1=F.col("n"), v1=F.col("median"), v2=F.col("mad"),
        ),
        _suite_shape(
            __m_x114, "trigram",
            id1=F.col("rk"), v1=F.col("n"), s1=F.col("trigram"),
        ),
    ]
    return reduce(lambda a, b: a.unionAll(b), members)


def _x84b_sql() -> str:
    z = "CAST(0 AS BIGINT)"
    zd = "CAST(0.0 AS DOUBLE)"
    return f"""SELECT 'cdc' AS kind, k AS id1, {z} AS id2,
       n1 AS v1, n2 AS v2, ok AS v3, {zd} AS d1, {zd} AS d2,
       concat_ws('|', kind, coalesce(s, '~')) AS s1
FROM ({member_oracle('c4_migration_repair')})
UNION ALL
SELECT 'sanom', event_id, user_id, n, CAST(anomaly AS BIGINT), {z},
       {zd}, {zd}, NULL
FROM ({member_oracle('x82_stream_rolling_anomaly')})
UNION ALL
SELECT 'incnd', doc_id, dup_of, CAST(is_neardup AS BIGINT), {z}, {z},
       CAST(jaccard AS DOUBLE), {zd}, NULL
FROM ({member_oracle('x83_incremental_neardup')})
UNION ALL
SELECT 'tri', node, {z}, n_tri, {z}, {z}, {zd}, {zd}, NULL
FROM ({member_oracle('x85_triangle_counts')})
UNION ALL
SELECT 'wav', doc_id, {z}, n_samples, sample_rate, duration_us,
       CAST(amp_sum AS DOUBLE), CAST(amp_max AS DOUBLE), NULL
FROM ({member_oracle('x86_audio_pcm_stats')})
UNION ALL
SELECT 'ppj', doc_a, doc_b, inter, n_a, n_b, jaccard, {zd}, NULL
FROM ({member_oracle('x88_prefix_filter_neardup')})
UNION ALL
SELECT 'lift', item_a, item_b, c_ab, c_a, c_b, lift,
       CAST(n_baskets AS DOUBLE), NULL
FROM ({member_oracle('x90_association_lift')})
UNION ALL
SELECT 'bfs', node, {z}, hop, {z}, {z}, {zd}, {zd}, NULL
FROM ({member_oracle('x94_bfs_hops')})
UNION ALL
SELECT 'sky', p_partkey, {z}, sz, pc, {z}, {zd}, {zd}, p_brand
FROM ({member_oracle('x96_skyline_pareto')})
UNION ALL
SELECT 'kcore', node, {z}, deg, {z}, {z}, {zd}, {zd}, NULL
FROM ({member_oracle('x100_kcore_peel')})
UNION ALL
SELECT 'ols', user_id, {z}, n, {z}, {z}, CAST(slope AS DOUBLE),
       CAST(intercept AS DOUBLE), NULL
FROM ({member_oracle('x103_ols_trend')})
UNION ALL
SELECT 'ed1', id_a, id_b, dist, {z}, {z}, {zd}, {zd}, NULL
FROM ({member_oracle('x104_editdist1_join')})
UNION ALL
SELECT 'walk', seed, step, node, {z}, {z}, {zd}, {zd}, NULL
FROM ({member_oracle('x105_random_walks')})
UNION ALL
SELECT 'cohort', cohort_week, week_offset, n_users, {z}, {z}, {zd}, {zd},
       NULL
FROM ({member_oracle('x107_cohort_retention')})
UNION ALL
SELECT 'markov', n, p_milli, {z}, {z}, {z}, {zd}, {zd},
       concat_ws('|', from_type, to_type)
FROM ({member_oracle('x109_markov_transitions')})
UNION ALL
SELECT 'bford', node, {z}, cost, {z}, {z}, {zd}, {zd}, NULL
FROM ({member_oracle('x110_cheapest_paths')})
UNION ALL
SELECT 'c6', cohort_week, n_conv, median_latency_us, {z}, {z}, {zd}, {zd},
       NULL
FROM ({member_oracle('c6_funnel_latency')})"""


@register(
    "x84b_graph_pipeline_suite",
    _x84b_sql(),
    "EXT-01", "EXT-02", "EXT-04", "EXT-09", "EXT-AUDIT",
    "EXT-CDC", "EXT-ANOM", "EXT-GRAPH", "EXT-ANALYTICS",
)
def x84b_graph_pipeline_suite(spark, sf_dir):
    """Driver-verified representative for the round-6 graph / behavioral
    / CDC / codec / dedup-join operators (the other half of the r7
    x84 split — see x84a): the composed CDC repair loop (c4), the
    ring-buffer streamed rolling anomaly (x82 — a real availableNow
    stateful replay inside a driver-hashed row), the index-joined
    incremental near-dup (x83), the degree-oriented triangle counter
    (x85), the RIFF/WAVE PCM audio decode (x86), the prefix-filtered
    exact near-dup join (x88), the market-basket association lift
    (x90), frontier BFS over the co-purchase graph (x94), the per-brand
    Pareto skyline (x96), the bounded k-core peel (x100), the OLS trend
    (x103), the deletion-neighborhood edit-distance join (x104), the
    random-walk corpus (x105), the cohort retention triangle (x107),
    the Markov transition matrix (x109), Bellman-Ford cheapest paths
    (x110) and the composed funnel-latency cohorts (c6), union-folded
    into the shared kind-tagged suite shape. The four co-purchase
    graph kernels (x85/x94/x100/x105) share ONE memoized persisted
    edge frame (_x85_edges), so the lineitem self-join pays out once
    per suite evaluation."""
    # batch members' construction overlapped (guide §2.6); streaming
    # members (session-conf-mutating replays) stay sequential below
    __m_c4, __m_x83, __m_x85, __m_x86, __m_x88, __m_x90, __m_x94, __m_x96, __m_x100, __m_x103, __m_x104, __m_x105, __m_x107, __m_x109, __m_x110, __m_c6 = D.overlap(
        lambda: c4_migration_repair(spark, sf_dir),
        lambda: x83_incremental_neardup(spark, sf_dir),
        lambda: x85_triangle_counts(spark, sf_dir),
        lambda: x86_audio_pcm_stats(spark, sf_dir),
        lambda: x88_prefix_filter_neardup(spark, sf_dir),
        lambda: x90_association_lift(spark, sf_dir),
        lambda: x94_bfs_hops(spark, sf_dir),
        lambda: x96_skyline_pareto(spark, sf_dir),
        lambda: x100_kcore_peel(spark, sf_dir),
        lambda: x103_ols_trend(spark, sf_dir),
        lambda: x104_editdist1_join(spark, sf_dir),
        lambda: x105_random_walks(spark, sf_dir),
        lambda: x107_cohort_retention(spark, sf_dir),
        lambda: x109_markov_transitions(spark, sf_dir),
        lambda: x110_cheapest_paths(spark, sf_dir),
        lambda: c6_funnel_latency(spark, sf_dir),
    )
    return (
        _suite_shape(
            __m_c4, "cdc",
            id1=F.col("k"), v1=F.col("n1"), v2=F.col("n2"), v3=F.col("ok"),
            s1=F.concat_ws("|", F.col("kind"), F.coalesce(F.col("s"), F.lit("~"))),
        )
        .unionAll(_suite_shape(
            x82_stream_rolling_anomaly(spark, sf_dir), "sanom",
            id1=F.col("event_id"), id2=F.col("user_id"), v1=F.col("n"),
            v2=F.col("anomaly").cast("long"),
        ))
        .unionAll(_suite_shape(
            __m_x83, "incnd",
            id1=F.col("doc_id"), id2=F.col("dup_of"),
            v1=F.col("is_neardup").cast("long"), d1=F.col("jaccard"),
        ))
        .unionAll(_suite_shape(
            __m_x85, "tri",
            id1=F.col("node"), v1=F.col("n_tri"),
        ))
        .unionAll(_suite_shape(
            __m_x86, "wav",
            id1=F.col("doc_id"), v1=F.col("n_samples"),
            v2=F.col("sample_rate"), v3=F.col("duration_us"),
            d1=F.col("amp_sum"), d2=F.col("amp_max"),
        ))
        .unionAll(_suite_shape(
            __m_x88, "ppj",
            id1=F.col("doc_a"), id2=F.col("doc_b"), v1=F.col("inter"),
            v2=F.col("n_a"), v3=F.col("n_b"), d1=F.col("jaccard"),
        ))
        .unionAll(_suite_shape(
            __m_x90, "lift",
            id1=F.col("item_a"), id2=F.col("item_b"), v1=F.col("c_ab"),
            v2=F.col("c_a"), v3=F.col("c_b"), d1=F.col("lift"),
            d2=F.col("n_baskets").cast("double"),
        ))
        .unionAll(_suite_shape(
            __m_x94, "bfs",
            id1=F.col("node"), v1=F.col("hop"),
        ))
        .unionAll(_suite_shape(
            __m_x96, "sky",
            id1=F.col("p_partkey"), v1=F.col("sz"), v2=F.col("pc"),
            s1=F.col("p_brand"),
        ))
        .unionAll(_suite_shape(
            __m_x100, "kcore",
            id1=F.col("node"), v1=F.col("deg"),
        ))
        .unionAll(_suite_shape(
            __m_x103, "ols",
            id1=F.col("user_id"), v1=F.col("n"),
            d1=F.col("slope"), d2=F.col("intercept"),
        ))
        .unionAll(_suite_shape(
            __m_x104, "ed1",
            id1=F.col("id_a"), id2=F.col("id_b"), v1=F.col("dist"),
        ))
        .unionAll(_suite_shape(
            __m_x105, "walk",
            id1=F.col("seed"), id2=F.col("step"), v1=F.col("node"),
        ))
        .unionAll(_suite_shape(
            __m_x107, "cohort",
            id1=F.col("cohort_week"), id2=F.col("week_offset"),
            v1=F.col("n_users"),
        ))
        .unionAll(_suite_shape(
            __m_x109, "markov",
            id1=F.col("n"), id2=F.col("p_milli"),
            s1=F.concat_ws("|", F.col("from_type"), F.col("to_type")),
        ))
        .unionAll(_suite_shape(
            __m_x110, "bford",
            id1=F.col("node"), v1=F.col("cost"),
        ))
        .unionAll(_suite_shape(
            __m_c6, "c6",
            id1=F.col("cohort_week"), id2=F.col("n_conv"),
            v1=F.col("median_latency_us"),
        ))
    )
