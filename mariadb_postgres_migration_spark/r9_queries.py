"""Round-9 registered queries: the measured ANN recall@k row (x142 —
VERDICT r8 'Next round' #5) and the composed pretraining-data endgame
pipeline (c7 — VERDICT r8 'Next round' #4), plus the driver-window row
that funds and verifies them (s4_ann_suite consolidates the x07/x25 ANN
standalones to free the two slots: −2 standalones +1 suite +1 c7 keeps
tier-0 == DRIVER_WINDOW), per the q15/x123/q16 convention.

Registration/oracle conventions follow r7/r8_queries: every standalone
here is tier 1, every one is also driver-verified same-round (x142 as an
s4 member, c7 as its own tier-0 row), and suite oracles compose the
members' SQL via member_oracle()/the shared panel-parameterized builders
so member edits can't drift.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import functions as F

from .extension_queries import (
    _TOKS_CTE,
    _hyperplane_sql,
    _pq_adc_sql,
    _suite_shape,
    _x06_sql,
    _x07_sql,
    _x48_sql,
    _x55_sql,
    x07_knn_ivf,
    x25_knn_hyperplane_lsh,
)
from .operators import audit as A
from .operators import dedup as D
from .operators import similarity as S
from .operators import textanalysis as T
from .registry import _t, member_oracle, register

# ---------------------------------------------------------------------------
# x142 — measured ANN recall@k vs the x06 brute-force ground truth
# ---------------------------------------------------------------------------

#: The fixed recall probe panel: md5-chosen (no cherry-picking) from the
#: first 512 vec_ids (bounded — a corpus-fraction rule like `% 50` would
#: grow the brute-force probe matrix with scale; this stays ≈64 probes at
#: every SF ≥ 0.01). First md5 hex char in {0,1} ⇒ 2/16 of candidates.
X142_PANEL_SQL = (
    "vec_id < 512 AND substr(md5(CAST(vec_id AS VARCHAR)), 1, 1) IN ('0', '1')"
)


def _x142_panel(emb):
    """Spark twin of :data:`X142_PANEL_SQL`."""
    return emb.filter(
        (F.col("vec_id") < 512)
        & F.substring(F.md5(F.col("vec_id").cast("string")), 1, 1).isin("0", "1")
    )


#: x142's measured tiers, in suite order. Extended r10 (VERDICT r9 #2):
#: the PQ family — exhaustive ADC (x153) and IVF-PQ (x55) — joins the
#: IVF/LSH/multi-probe tiers, so s4's driver hash covers all 5.
X142_TIERS = ("ivf", "lsh", "mplsh", "pq", "ivfpq")


def _x142_sql() -> str:
    """Recall counts per (tier, probe): both the ground truth and every
    tier re-run their registered formulations (the panel-parameterized
    x06/x07/x25/x48/x153/x55 oracle builders — shared text, no drift)
    over the x142 panel; hits = |top-5(tier) ∩ top-5(brute)| as exact
    integers. The grid CROSS JOIN is 5 tiers × the ≤64-probe panel —
    bounded."""
    hits = " UNION ALL ".join(
        f"SELECT '{name}' AS tier, q_id, n_id FROM {name}"
        for name in X142_TIERS
    )
    values = ", ".join(f"('{name}')" for name in X142_TIERS)
    return f"""WITH brute AS (SELECT q_id, n_id FROM ({_x06_sql(X142_PANEL_SQL)})),
ivf AS (SELECT q_id, n_id FROM ({_x07_sql(X142_PANEL_SQL)})),
lsh AS (SELECT q_id, n_id FROM ({_hyperplane_sql(X142_PANEL_SQL)})),
mplsh AS (SELECT q_id, n_id FROM ({_x48_sql(X142_PANEL_SQL)})),
pq AS (SELECT q_id, n_id FROM ({_pq_adc_sql(X142_PANEL_SQL)})),
ivfpq AS (SELECT q_id, n_id FROM ({_x55_sql(X142_PANEL_SQL)})),
pairs AS ({hits}),
grid AS (SELECT t.tier, b.q_id, b.n_id
         FROM brute b CROSS JOIN (VALUES {values}) AS t(tier))
SELECT g.tier, g.q_id, CAST(count(p.n_id) AS BIGINT) AS hits
FROM grid g LEFT JOIN pairs p
  ON p.tier = g.tier AND p.q_id = g.q_id AND p.n_id = g.n_id
GROUP BY g.tier, g.q_id"""


@register("x142_ann_recall", _x142_sql(), "EXT-03", tier=1)
def x142_ann_recall(spark, sf_dir):
    """Measured ANN recall@5 per tier (VERDICT r8 #5): for the fixed
    md5-chosen probe panel, |top-5(tier) ∩ top-5(brute force)| per probe
    as exact int64 — the IVF (x07 config), single-bucket SRP-LSH (x25),
    multi-probe LSH (x48), exhaustive PQ-ADC (x153, r10) and IVF-PQ
    (x55, r10) tiers against the x06 ground truth. Both sides are
    deterministic (score/tie conventions shared with the registered
    rows), so ANN quality is a driver-hashed regression canary, not
    just the recall-DOMINANCE property tests (tests/test_similarity.py).
    Probes with an empty LSH bucket simply score 0 hits — the recall
    trade the x25 docstring documents; the PQ tiers measure what the
    32× code compression costs in recall.

    Plan: brute force = ONE Arrow/BLAS corpus pass (persisted — ~64
    probes × 5 rows); each tier joins its registered plan; the hit
    count is five ≤320-row left joins. Nothing here exceeds the
    members' own 100 TB bounds."""
    import os

    emb = _t(spark, sf_dir, "embeddings")
    panel = _x142_panel(emb)
    cb16 = emb.filter(F.col("vec_id") < 16)
    cents = emb.filter(F.col("vec_id") < 80)
    # r13 NEGATIVE RESULT: persist_now on brute/assigned/enc (the profile
    # showed twin ~8-12 CPU-s stages of concurrent broadcast builds racing
    # the lazy persists) A/B'd neutral-to-worse twice — 7.81/9.35 eager vs
    # 7.43/9.07 lazy medians (4- and 6-run interleaved series): the
    # duplicate builds fill otherwise-idle cores while the eager noop
    # passes serialize the critical path. Stays lazy.
    brute = D._persist(S.knn_bruteforce(emb, panel, k=5).select("q_id", "n_id"))
    if os.environ.get("MPS_X142_SHARE_OFF"):
        # A/B bypass: the pre-r12 form — every tier computes its own
        # coarse assignment / code table
        assigned = enc = None
    else:
        # r12: ivf+ivfpq share ONE full-corpus coarse-assignment pass and
        # pq+ivfpq share ONE full-corpus encode pass (identical centroids/
        # codebook, so the shared frames are byte-identical to the
        # per-tier ones they replace)
        assigned = D._persist(S.ivf_assign(emb, cents))
        enc = D._persist(S.pq_encode(emb, cb16))
    tiers = {
        "ivf": S.knn_ivf(emb, panel, cents, k=5, nprobe=2, assigned=assigned),
        "lsh": S.knn_hyperplane_lsh(emb, panel, k=5),
        "mplsh": S.knn_hyperplane_multiprobe(emb, panel, k=5, n_flips=2),
        "pq": S.knn_pq_adc(emb, panel, cb16, k=5, enc=enc),
        "ivfpq": S.knn_ivfpq(
            emb, panel, cents, cb16, k=5, nprobe=2,
            assigned=assigned, enc=enc,
        ),
    }
    outs = []
    for name in X142_TIERS:
        hit = tiers[name].select("q_id", "n_id", F.lit(1).alias("__hit"))
        outs.append(
            brute.join(hit, ["q_id", "n_id"], "left")
            .groupBy("q_id")
            .agg(F.sum(F.coalesce("__hit", F.lit(0))).cast("long").alias("hits"))
            .select(F.lit(name).alias("tier"), "q_id", "hits")
        )
    return reduce(lambda a, b: a.unionAll(b), outs)


# ---------------------------------------------------------------------------
# s4_ann_suite — the ANN tiers + their measured recall as ONE driver row
# ---------------------------------------------------------------------------


def _s4_sql() -> str:
    z = "CAST(0 AS BIGINT)"
    zd = "CAST(0.0 AS DOUBLE)"
    # every branch's s1 is NULL, so it needs an explicit VARCHAR cast —
    # an all-NULL union column otherwise resolves to a non-string type
    # in DuckDB and the suite schema diverges from the Spark side
    return f"""SELECT 'ivf7' AS kind, q_id AS id1, n_id AS id2, rk AS v1,
       {z} AS v2, {z} AS v3, round(score, 4) AS d1, {zd} AS d2,
       CAST(NULL AS VARCHAR) AS s1
FROM ({member_oracle('x07_knn_ivf')})
UNION ALL
SELECT 'lsh25', q_id, n_id, rk, {z}, {z}, round(score, 4), {zd},
       CAST(NULL AS VARCHAR)
FROM ({member_oracle('x25_knn_hyperplane_lsh')})
UNION ALL
SELECT concat('rc_', tier), q_id, {z}, hits, {z}, {z}, {zd}, {zd},
       CAST(NULL AS VARCHAR)
FROM ({member_oracle('x142_ann_recall')})"""


@register(
    "s4_ann_suite", _s4_sql(), "EXT-03",
)
def s4_ann_suite(spark, sf_dir):
    """Driver row consolidating the ANN tier standalones (x07 IVF, x25
    SRP-LSH — r9 window math: their two slots fund this row plus the c7
    pipeline row) and carrying the x142 recall@5 measurement — so every
    tier's RESULTS and their measured QUALITY versus brute force
    hash-verify in one row. r10 extends x142 to 5 tiers (rc_pq/rc_ivfpq
    join rc_ivf/rc_lsh/rc_mplsh — VERDICT r9 #2). Members' oracles
    embedded verbatim; x07/x25 stay in the bench HEADLINE for the
    frozen r4 series.

    Composition (adjudicated r11 after the r10 driver bench tripped
    `suites_inflated` on a normal-numpy session — the x76 standing rule):
    SPLIT-RC — the heavy x142 member materializes eagerly and its
    internal brute-force persist releases immediately; the two
    sub-second members stay a lazy union with it. Two same-session
    isolated A/Bs at sf0.1 (the second untainted, spread 0.071): split-rc
    medians 7.77/7.58s vs union 8.65/7.88s vs full-sequential 9.18/8.85s
    against member sums 8.33/8.72 — split-rc is fastest AND caps the
    storage-pool residency the inflation flag hunts. SCALE.md
    suite-composition section has the numbers; MPS_SUITE_UNION=1 flips
    back to the lazy union for future A/Bs."""
    from .extension_queries import _suite_materialize, _suite_release
    from .operators.dedup import persist_pool_mark

    zl = F.lit(0).cast("long")
    ivf = _suite_shape(
        x07_knn_ivf(spark, sf_dir), "ivf7",
        id1=F.col("q_id"), id2=F.col("n_id"), v1=F.col("rk"),
        d1=F.col("score"),
    )
    lsh = _suite_shape(
        x25_knn_hyperplane_lsh(spark, sf_dir), "lsh25",
        id1=F.col("q_id"), id2=F.col("n_id"), v1=F.col("rk"),
        d1=F.col("score"),
    )
    # x142's kind is data-driven (rc_<tier>), so it bypasses _suite_shape's
    # literal-kind convention and projects the 9-column shape directly
    mark = persist_pool_mark()
    rc = x142_ann_recall(spark, sf_dir).select(
        F.concat(F.lit("rc_"), F.col("tier")).alias("kind"),
        F.col("q_id").cast("long").alias("id1"),
        zl.alias("id2"),
        F.col("hits").cast("long").alias("v1"),
        zl.alias("v2"), zl.alias("v3"),
        F.lit(0.0).alias("d1"), F.lit(0.0).alias("d2"),
        F.lit(None).cast("string").alias("s1"),
    )
    # split-rc form (r11 A/B — see docstring): materialize the heavy
    # member now, drop its brute-force persist before the union action
    rc = _suite_materialize(rc)
    _suite_release(mark)
    return ivf.unionAll(lsh).unionAll(rc)


# ---------------------------------------------------------------------------
# c7 — the pretraining-data endgame pipeline (curate → split → shard → pack)
# ---------------------------------------------------------------------------

#: The c1 survivor manifest, memoized per (session, sf_dir) — the x85
#: edge-frame pattern. c7, x143 (via c7) and x144 each consume the full
#: curation chain; inside the x145 lazy-union row the two members would
#: otherwise carry two INDEPENDENT c1 subtrees and pay the curation
#: twice in one action. Re-persisted through the tracked pool on every
#: access so bench-harness releases stay safe (persist on an
#: already-persisted frame is a no-op). Bounded (r10, VERDICT r9
#: 'What's wrong #1'): every access evicts entries keyed to OTHER
#: applicationIds, so a process that cycles sessions (or the test
#: suite's session-per-module rigs) can never accumulate dead sessions'
#: pinned lineage; within one session the key already guarantees ≤ 1
#: entry per sf_dir.
_C1_MANIFEST_CACHE: dict = {}


def _c1_result(spark, sf_dir):
    """The memoized FULL c1 output (doc_id, n_tokens, quality,
    lang_pred) — r10 widened the memo from doc_id-only so consumers
    needing survivor ATTRIBUTES (x161's quality-quartile phases, via
    x174) share the same persisted chain as the manifest consumers
    instead of re-running the curation; the frame is ≤ |survivors|
    rows × 4 narrow columns, so the wider persist is negligible."""
    from .extension_queries import c1_curation_pipeline

    app = spark.sparkContext.applicationId
    m = D.memo_get_or_build(
        _C1_MANIFEST_CACHE, app, (app, sf_dir),
        lambda: c1_curation_pipeline(spark, sf_dir),
    )
    return D._persist(m)


def _c1_manifest(spark, sf_dir):
    return _c1_result(spark, sf_dir).select("doc_id")


def _c7_sql() -> str:
    cap = T.PACK_CAPACITY
    return f"""WITH c1 AS (SELECT doc_id FROM ({member_oracle('c1_curation_pipeline')}) z),
surv AS (SELECT d.doc_id, d.source, d.text FROM documents d JOIN c1 USING (doc_id)),
{_TOKS_CTE},
sp AS (SELECT doc_id, {T.split_case_sql()} AS split FROM surv),
sh AS ({T.rendezvous_assign_sql(table="surv", n_shards=16)}),
base AS (SELECT sp.doc_id, sp.split, sh.shard, CAST(len(w) AS BIGINT) AS n_tok
         FROM sp JOIN sh USING (doc_id) JOIN toks USING (doc_id)),
cum AS (SELECT doc_id, split, shard, n_tok,
               sum(n_tok) OVER (PARTITION BY split, shard ORDER BY doc_id
                                ROWS UNBOUNDED PRECEDING) AS cum
        FROM base)
SELECT doc_id, split, shard, n_tok,
       CAST(floor((cum - n_tok) / {cap}) AS BIGINT) AS start_pack,
       CAST(greatest(floor((cum - n_tok) / {cap}),
                     floor((cum - 1) / {cap})) AS BIGINT) AS end_pack
FROM cum"""


@register(
    "c7_pretraining_pipeline", _c7_sql(), "EXT-01", "EXT-02", "EXT-05",
)
def c7_pretraining_pipeline(spark, sf_dir):
    """The pretraining-data ENDGAME pipeline (VERDICT r8 #4) — c1 proves
    the curation stages compose; this row takes the curated survivors
    all the way to a training-run layout, each stage consuming the
    previous stage's output:

      1. curate: quality gate → exact dedup → near-dup collapse →
         decontaminate = c1's survivor manifest, REUSED verbatim (same
         fn, same oracle — the stage-plumbing hash covers c1's chain
         too);
      2. split: deterministic 98/1/1 train/val/test assignment per doc
         (x138's hash rule via split_assign — row-local);
      3. shard: rendezvous/HRW shard per doc (x139's argmax via
         rendezvous_assign — row-local, minimal movement on resize);
      4. pack: concat-then-chunk sequence packing per (split, shard) in
         doc_id order (x36's operator with the composite shard key) —
         the padding-free context-window fill, now over exactly the
         docs a real run would feed.

    Output: one row per surviving doc with its split, shard and token
    window span — the manifest a 100 TB trainer reads. ONE composed
    oracle (the c1 recursive-CTE pattern extended through the three new
    stages) hash-checks the stage plumbing end-to-end.

    Scale: stages 2-3 are row-local projections (zero shuffle); stage 4
    is one running-sum window over 3×16 composite shards — the shard
    key is what you'd refine (source × day) at 100 TB, which preserves
    the assignment because packing never looks across shards
    (sequence_pack docstring)."""
    docs = _t(spark, sf_dir, "documents")
    surv = docs.join(_c1_manifest(spark, sf_dir), "doc_id", "left_semi").select(
        "doc_id", "source", "text"
    )
    assigned = T.rendezvous_assign(T.split_assign(surv), n_shards=16)
    return T.sequence_pack(assigned, shard_cols=["split", "shard"]).select(
        "doc_id", "split", "shard", "n_tok", "start_pack", "end_pack"
    )


#: The c7 training-layout manifest, memoized per (session, sf_dir) with
#: the same foreign-session eviction + re-persist-on-access contract as
#: _C1_MANIFEST_CACHE (r12, VERDICT r11 'What's missing #2'): c8, c9,
#: c10, x143 and the x155/x161/x172-family audits each consume the c7
#: manifest, and x187 consumes it TWICE in one action (once under its c9
#: subtree, once under its c10 subtree) — without the memo each consumer
#: carries an independent tokenize + pack-window subtree. The frame is
#: ≤ |survivors| rows × 6 narrow columns.
_C7_MANIFEST_CACHE: dict = {}


def _c7_result(spark, sf_dir):
    """The memoized full c7 output (doc_id, split, shard, n_tok,
    start_pack, end_pack) — the _c1_result pattern one stage later, so
    every training-layout consumer shares ONE persisted manifest instead
    of re-running split/shard/pack per consumer."""
    app = spark.sparkContext.applicationId
    m = D.memo_get_or_build(
        _C7_MANIFEST_CACHE, app, (app, sf_dir),
        lambda: c7_pretraining_pipeline(spark, sf_dir),
    )
    # the memoized c7 DAG embeds the memoized c1 frame — re-persist it too
    # (construction did this via c7_pretraining_pipeline → _c1_manifest;
    # memo hits must keep the same contract)
    _c1_manifest(spark, sf_dir)
    return D._persist(m)


# ===========================================================================
# r9 second wave: pack-utilization report (x143) and the cross-split
# leakage screen (x144) — the audit half of the c7 endgame — funded by
# consolidating the x18/x19 streaming-window standalones into
# st3_stream_window_suite.
# ===========================================================================


def _x143_sql() -> str:
    return T.pack_utilization_sql(member_oracle("c7_pretraining_pipeline"))


@register("x143_pack_utilization", _x143_sql(), "EXT-05", tier=1)
def x143_pack_utilization(spark, sf_dir):
    """Packing-efficiency report over the c7 layout
    (:func:`operators.textanalysis.pack_utilization`): per (split,
    shard) — docs, tokens, packs, fill rate in exact per-mille and the
    boundary-straddler count a trainer's attention mask pays for. ONE
    map-side-combined aggregate past the c7 plan; ≤ 48 rows at any
    corpus scale. The number packing exists to optimize, now
    driver-hashed."""
    return T.pack_utilization(_c7_result(spark, sf_dir))


def _x144_sql() -> str:
    from .extension_queries import _DS_CTE

    # c1/surv/ssh/fps MATERIALIZED: DuckDB inlines plain CTEs per
    # reference, and ssh/fps are each referenced 2-3 times — the naive
    # form re-ran the whole c1 curation chain per reference (measured
    # 210s at sf0.01; ~2s materialized). Same work either way on the
    # Spark side, where the operator persists the shared frames.
    return f"""WITH c1 AS MATERIALIZED (SELECT doc_id FROM ({member_oracle('c1_curation_pipeline')}) z),
surv AS MATERIALIZED (SELECT d.doc_id, d.text FROM documents d JOIN c1 USING (doc_id)),
{_TOKS_CTE},
{_DS_CTE},
sp AS MATERIALIZED (SELECT doc_id, {T.split_case_sql()} AS split FROM surv),
ssh AS MATERIALIZED (SELECT DISTINCT sp.split, ds.sh
                     FROM ds JOIN sp USING (doc_id)),
fps AS MATERIALIZED (SELECT DISTINCT sp.split, md5(t.text) AS fp
                     FROM surv t JOIN sp USING (doc_id))
{T.split_leakage_sql()}"""


@register(
    "x144_split_leakage", _x144_sql(), "EXT-01", "EXT-02", "EXT-05", tier=1,
)
def x144_split_leakage(spark, sf_dir):
    """Cross-split contamination screen over the c7 survivors
    (:func:`operators.textanalysis.split_leakage`): per split pair —
    shared distinct 3-gram shingles (the x40 decontaminate machinery
    turned inward: train→val leakage), each side's shingle count, the
    shared share in per-mille of the smaller side, and the exact-dup
    count across the pair (md5(text) — ZERO by construction after
    dedup-then-split, the canary proving the stage ORDER held). The
    report a data team reads before signing off a training split."""
    docs = _t(spark, sf_dir, "documents")
    # surv feeds two subtrees (split+fingerprints, shingles) — persist so
    # the c1 chain upstream is computed once (the oracle's MATERIALIZED
    # surv CTE); the manifest itself is the memoized _c1_manifest.
    # r13 NEGATIVE RESULT: persist_now here (the profile showed twin
    # broadcast-build stage pairs racing the lazy persist) A/B'd NEUTRAL
    # (7.97 eager vs 7.90 lazy median) — the duplicate builds run on idle
    # cores while the eager pass adds a sequential action; stays lazy.
    surv = D._persist(
        docs.join(_c1_manifest(spark, sf_dir), "doc_id", "left_semi").select(
            "doc_id", "text"
        )
    )
    return T.split_leakage(T.split_assign(surv), D.doc_shingles(surv))


# ---------------------------------------------------------------------------
# st3_stream_window_suite — the x18/x19 streaming-window rows as ONE
# driver row (funds the x145 slot)
# ---------------------------------------------------------------------------


def _st3_sql() -> str:
    z = "CAST(0 AS BIGINT)"
    zd = "CAST(0.0 AS DOUBLE)"
    # all-NULL s1 needs the VARCHAR cast (see _s4_sql)
    return f"""SELECT 'tmbl' AS kind, window_start_us AS id1, {z} AS id2,
       n_events AS v1, {z} AS v2, {z} AS v3,
       round(sum_value, 2) AS d1, {zd} AS d2, CAST(NULL AS VARCHAR) AS s1
FROM ({member_oracle('x18_stream_tumbling')})
UNION ALL
SELECT 'sess', user_id, session_start_us, n_events, {z}, {z}, {zd}, {zd},
       CAST(NULL AS VARCHAR)
FROM ({member_oracle('x19_stream_session')})"""


@register(
    "st3_stream_window_suite", _st3_sql(), "EXT-06", "EXT-07", "EXT-08",
    tier=1,  # r12: consolidated into m15_streaming_suite (stays in bench HEADLINE)
)
def st3_stream_window_suite(spark, sf_dir):
    """Driver row consolidating the two REAL Structured-Streaming window
    replays (x18 tumbling, x19 session_window — r9 window math: their
    two slots fund this row plus x145). Both members run availableNow
    replays whose full-replay output equals the batch result; member
    oracles embedded verbatim; x18/x19 stay in the bench HEADLINE for
    the frozen r4 series."""
    from .extension_queries import x18_stream_tumbling, x19_stream_session

    t = _suite_shape(
        x18_stream_tumbling(spark, sf_dir), "tmbl",
        id1=F.col("window_start_us"), v1=F.col("n_events"),
        d1=F.col("sum_value"),
    )
    s = _suite_shape(
        x19_stream_session(spark, sf_dir), "sess",
        id1=F.col("user_id"), id2=F.col("session_start_us"),
        v1=F.col("n_events"),
    )
    return t.unionAll(s)


# ---------------------------------------------------------------------------
# x145_r9b_ops_suite — the r9 second-wave operators under one driver hash
# ---------------------------------------------------------------------------


def _x145_sql() -> str:
    z = "CAST(0 AS BIGINT)"
    zd = "CAST(0.0 AS DOUBLE)"
    return f"""SELECT 'util' AS kind, shard AS id1, {z} AS id2, n_docs AS v1,
       total_tok AS v2, n_packs AS v3, CAST(fill_permille AS DOUBLE) AS d1,
       CAST(n_straddlers AS DOUBLE) AS d2, split AS s1
FROM ({member_oracle('x143_pack_utilization')})
UNION ALL
SELECT 'leak', {z}, {z}, n_shared_sh, n_sh_a, n_sh_b,
       CAST(containment_permille AS DOUBLE), CAST(n_dup_fp AS DOUBLE),
       concat_ws('|', split_a, split_b)
FROM ({member_oracle('x144_split_leakage')})"""


@register(
    "x145_r9b_ops_suite", _x145_sql(), "EXT-01", "EXT-02", "EXT-05",
    tier=1,  # r11: consolidated into m6_r9bc_suite (stays in bench HEADLINE)
)
def x145_r9b_ops_suite(spark, sf_dir):
    """Driver row for the r9 second wave — pack utilization (x143) and
    the cross-split leakage screen (x144), the audit half of the c7
    endgame — union-folded into the shared kind-tagged suite shape
    (2 small members → lazy union per the SCALE.md composition rule)."""
    __r0, __r1 = D.overlap(  # guide §2.6
        lambda: x143_pack_utilization(spark, sf_dir),
        lambda: x144_split_leakage(spark, sf_dir),
    )
    u = _suite_shape(
        __r0, "util",
        id1=F.col("shard"), v1=F.col("n_docs"), v2=F.col("total_tok"),
        v3=F.col("n_packs"), d1=F.col("fill_permille"),
        d2=F.col("n_straddlers"), s1=F.col("split"),
    )
    l = _suite_shape(
        __r1, "leak",
        v1=F.col("n_shared_sh"), v2=F.col("n_sh_a"), v3=F.col("n_sh_b"),
        d1=F.col("containment_permille"), d2=F.col("n_dup_fp"),
        s1=F.concat_ws("|", "split_a", "split_b"),
    )
    return u.unionAll(l)


# ===========================================================================
# r9 third wave: per-document shingle novelty (x146) and the power-of-two
# sequence-length histogram (x147) — funded by consolidating the x20/x22
# streaming standalones into st4_stream_pair_suite.
# ===========================================================================


def _x146_sql() -> str:
    from .extension_queries import _DS_CTE

    return f"""WITH {_TOKS_CTE},
{_DS_CTE}
{D.shingle_novelty_sql()}"""


@register(
    "x146_shingle_novelty", _x146_sql(), "EXT-01", "EXT-02", "EXT-05", tier=1,
)
def x146_shingle_novelty(spark, sf_dir):
    """Per-document shingle novelty in exact per-mille
    (:func:`operators.dedup.shingle_novelty`): the fraction of a doc's
    distinct 3-gram shingles whose corpus-wide first appearance is this
    doc — the between-the-thresholds boilerplate signal the pairwise
    dedup rows can't see. One shingle-keyed min-aggregate + a
    co-partitioned join back; never doc×doc."""
    docs = _t(spark, sf_dir, "documents")
    return D.shingle_novelty(D.doc_shingles(docs))


@register(
    "x147_seqlen_histogram",
    T.seqlen_histogram_sql(_TOKS_CTE),
    "EXT-05", tier=1,
)
def x147_seqlen_histogram(spark, sf_dir):
    """Sequence-length histogram at power-of-two buckets
    (:func:`operators.textanalysis.seqlen_histogram`): per (source,
    bucket) doc and token counts, bucket = length(bin(n_tok)) — the
    integer-exact log2 both engines agree on digit-for-digit. The
    capacity-planning report behind PACK_CAPACITY."""
    return T.seqlen_histogram(_t(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# st4_stream_pair_suite — the x20/x22 stateful-streaming rows as ONE
# driver row (funds the x148 slot)
# ---------------------------------------------------------------------------


def _st4_sql() -> str:
    z = "CAST(0 AS BIGINT)"
    zd = "CAST(0.0 AS DOUBLE)"
    return f"""SELECT 'sdd' AS kind, user_id AS id1, {z} AS id2,
       n_unique_types AS v1, {z} AS v2, {z} AS v3,
       {zd} AS d1, {zd} AS d2, CAST(NULL AS VARCHAR) AS s1
FROM ({member_oracle('x20_stream_dedup')})
UNION ALL
SELECT 'ssj', purchase_id, click_id, p_ts_us, c_ts_us, {z}, {zd}, {zd},
       CAST(NULL AS VARCHAR)
FROM ({member_oracle('x22_stream_stream_join')})"""


@register(
    "st4_stream_pair_suite", _st4_sql(), "EXT-08", "EXT-09",
    tier=1,  # r12: consolidated into m15_streaming_suite (stays in bench HEADLINE)
)
def st4_stream_pair_suite(spark, sf_dir):
    """Driver row consolidating the two stateful-streaming replays (x20
    dropDuplicatesWithinWatermark dedup, x22 watermarked stream-stream
    range join — r9 window math: their two slots fund this row plus
    x148). Member oracles embedded verbatim; x20/x22 stay in the bench
    HEADLINE for the frozen r4 series."""
    from .extension_queries import x20_stream_dedup, x22_stream_stream_join

    d = _suite_shape(
        x20_stream_dedup(spark, sf_dir), "sdd",
        id1=F.col("user_id"), v1=F.col("n_unique_types"),
    )
    j = _suite_shape(
        x22_stream_stream_join(spark, sf_dir), "ssj",
        id1=F.col("purchase_id"), id2=F.col("click_id"),
        v1=F.col("p_ts_us"), v2=F.col("c_ts_us"),
    )
    return d.unionAll(j)


# ---------------------------------------------------------------------------
# x148_r9c_ops_suite — the r9 third-wave operators under one driver hash
# ---------------------------------------------------------------------------


def _x148_sql() -> str:
    z = "CAST(0 AS BIGINT)"
    zd = "CAST(0.0 AS DOUBLE)"
    return f"""SELECT 'nov' AS kind, doc_id AS id1, {z} AS id2, n_sh AS v1,
       n_novel AS v2, novelty_permille AS v3, {zd} AS d1, {zd} AS d2,
       CAST(NULL AS VARCHAR) AS s1
FROM ({member_oracle('x146_shingle_novelty')})
UNION ALL
SELECT 'slen', len_bucket, {z}, n_docs, total_tok, {z}, {zd}, {zd}, source
FROM ({member_oracle('x147_seqlen_histogram')})"""


@register(
    "x148_r9c_ops_suite", _x148_sql(), "EXT-01", "EXT-02", "EXT-05",
    tier=1,  # r11: consolidated into m6_r9bc_suite (stays in bench HEADLINE)
)
def x148_r9c_ops_suite(spark, sf_dir):
    """Driver row for the r9 third wave — shingle novelty (x146) and the
    sequence-length histogram (x147) — union-folded into the shared
    kind-tagged suite shape (2 small members → lazy union per the
    SCALE.md composition rule)."""
    __r0, __r1 = D.overlap(  # guide §2.6
        lambda: x146_shingle_novelty(spark, sf_dir),
        lambda: x147_seqlen_histogram(spark, sf_dir),
    )
    n = _suite_shape(
        __r0, "nov",
        id1=F.col("doc_id"), v1=F.col("n_sh"), v2=F.col("n_novel"),
        v3=F.col("novelty_permille"),
    )
    s = _suite_shape(
        __r1, "slen",
        id1=F.col("len_bucket"), v1=F.col("n_docs"), v2=F.col("total_tok"),
        s1=F.col("source"),
    )
    return n.unionAll(s)


# ===========================================================================
# r9 fourth wave: Wald–Wolfowitz runs test (x149) and the ordinal-pattern
# histogram (x150) — completing the day-series randomness screens — funded
# by consolidating the x03/x04 signature-dedup standalones into
# d2_signature_suite.
# ===========================================================================

_X149_EVENTS_CTE = "SELECT event_type AS et, epoch_us(ts) AS us FROM events"


@register(
    "x149_runs_test", A.runs_test_daily_sql(_X149_EVENTS_CTE),
    "EXT-ANALYTICS", "EXT-ANOM", tier=1,
)
def x149_runs_test(spark, sf_dir):
    """Per-type Wald–Wolfowitz runs test over the daily-count series
    (:func:`operators.audit.runs_test_daily`): do above/below-median
    days clump (regimes) or alternate (ping-pong)? — the randomness
    screen a trend-free, autocorrelation-free series can still fail.
    2×median keeps the split exact int64; only the final z is one IEEE
    expression, rounded, with the mann_kendall z=0 guard."""
    return A.runs_test_daily(_t(spark, sf_dir, "events"))


@register(
    "x150_ordinal_patterns", A.ordinal_patterns_daily_sql(_X149_EVENTS_CTE),
    "EXT-ANALYTICS", tier=1,
)
def x150_ordinal_patterns(spark, sf_dir):
    """Per-type order-3 ordinal-pattern histogram (Bandt & Pompe 2002)
    over the daily-count series
    (:func:`operators.audit.ordinal_patterns_daily`): each consecutive
    observed-day triple maps to one of 6 position-stable rank patterns
    — the series-shape fingerprint (organic traffic spreads mass,
    templated/batch collapses onto the monotone patterns). Exact
    integer ranks and codes; ≤ |types|·6 rows out."""
    return A.ordinal_patterns_daily(_t(spark, sf_dir, "events"))


# ---------------------------------------------------------------------------
# d2_signature_suite — the x03/x04 signature-dedup rows as ONE driver row
# (funds the x151 slot)
# ---------------------------------------------------------------------------


def _d2_sql() -> str:
    z = "CAST(0 AS BIGINT)"
    zd = "CAST(0.0 AS DOUBLE)"
    return f"""SELECT 'mh' AS kind, doc_a AS id1, doc_b AS id2, {z} AS v1,
       {z} AS v2, {z} AS v3, CAST(jaccard AS DOUBLE) AS d1, {zd} AS d2,
       CAST(NULL AS VARCHAR) AS s1
FROM ({member_oracle('x03_dedup_minhash_lsh')})
UNION ALL
SELECT 'sh', doc_id, {z}, simhash, {z}, {z}, {zd}, {zd},
       CAST(NULL AS VARCHAR)
FROM ({member_oracle('x04_dedup_simhash')})"""


@register(
    "d2_signature_suite", _d2_sql(), "EXT-01", "EXT-02",
    tier=1,  # r12: consolidated into m14_sigmodal_suite (stays in bench HEADLINE)
)
def d2_signature_suite(spark, sf_dir):
    """Driver row consolidating the signature-dedup standalones (x03
    banded MinHash-LSH pairs, x04 SimHash signatures — r9 window math:
    their two slots fund this row plus x151). Member oracles embedded
    verbatim; x03/x04 stay in the bench HEADLINE for the frozen r4
    series."""
    from .extension_queries import x03_dedup_minhash_lsh, x04_dedup_simhash

    __r0, __r1 = D.overlap(  # guide §2.6
        lambda: x03_dedup_minhash_lsh(spark, sf_dir),
        lambda: x04_dedup_simhash(spark, sf_dir),
    )
    mh = _suite_shape(
        __r0, "mh",
        id1=F.col("doc_a"), id2=F.col("doc_b"), d1=F.col("jaccard"),
    )
    sh = _suite_shape(
        __r1, "sh",
        id1=F.col("doc_id"), v1=F.col("simhash"),
    )
    return mh.unionAll(sh)


# ---------------------------------------------------------------------------
# x151_r9d_ops_suite — the r9 fourth-wave operators under one driver hash
# ---------------------------------------------------------------------------


def _x151_sql() -> str:
    z = "CAST(0 AS BIGINT)"
    zd = "CAST(0.0 AS DOUBLE)"
    return f"""SELECT 'runs' AS kind, {z} AS id1, {z} AS id2, n1 AS v1,
       n2 AS v2, runs AS v3, z AS d1, {zd} AS d2, event_type AS s1
FROM ({member_oracle('x149_runs_test')})
UNION ALL
SELECT 'opat', pattern, {z}, n_windows, {z}, {z}, {zd}, {zd}, event_type
FROM ({member_oracle('x150_ordinal_patterns')})"""


@register(
    "x151_r9d_ops_suite", _x151_sql(), "EXT-ANALYTICS", "EXT-ANOM",
    tier=1,  # r11: consolidated into m7_r9d10h_suite (stays in bench HEADLINE)
)
def x151_r9d_ops_suite(spark, sf_dir):
    """Driver row for the r9 fourth wave — the runs test (x149) and the
    ordinal-pattern histogram (x150) — union-folded into the shared
    kind-tagged suite shape (2 small members → lazy union per the
    SCALE.md composition rule)."""
    __r0, __r1 = D.overlap(  # guide §2.6
        lambda: x149_runs_test(spark, sf_dir),
        lambda: x150_ordinal_patterns(spark, sf_dir),
    )
    r = _suite_shape(
        __r0, "runs",
        v1=F.col("n1"), v2=F.col("n2"), v3=F.col("runs"),
        d1=F.col("z"), s1=F.col("event_type"),
    )
    o = _suite_shape(
        __r1, "opat",
        id1=F.col("pattern"), v1=F.col("n_windows"),
        s1=F.col("event_type"),
    )
    return r.unionAll(o)


# ===========================================================================
# r9 fifth wave: the per-source curation funnel (x152) — the c1 attrition
# dashboard — funded by consolidating the x14/x26 multimodal standalones
# into m2_multimodal_suite.
# ===========================================================================


def _x152_sql() -> str:
    from .extension_queries import _c1_ctes

    # materialized stage CTEs: five stage references over the shared
    # curation chain would otherwise re-run it per reference (the x144
    # DuckDB-inlining lesson); c1's own oracle keeps the plain form so
    # its long-verified text stays byte-identical.
    return f"""WITH RECURSIVE
{_c1_ctes(materialized=True)},
src AS MATERIALIZED (SELECT doc_id, source FROM documents
                     WHERE doc_id % 97 <> 0),
st AS (
  SELECT 'raw' AS stage, s.source FROM src s
  UNION ALL SELECT 'gated', s.source FROM k1 JOIN src s USING (doc_id)
  UNION ALL SELECT 'exact', s.source FROM k2 JOIN src s USING (doc_id)
  UNION ALL SELECT 'near', s.source FROM k3 JOIN src s USING (doc_id)
  UNION ALL SELECT 'clean', s.source FROM k4 JOIN src s USING (doc_id))
SELECT stage, source, CAST(count(*) AS BIGINT) AS n_docs
FROM st GROUP BY 1, 2"""


@register(
    "x152_curation_funnel", _x152_sql(), "EXT-01", "EXT-02", "EXT-05",
)
def x152_curation_funnel(spark, sf_dir):
    """Per-source curation-funnel report (tier 0): document counts at
    every c1 stage — raw corpus → quality-gated (k1) → exact-deduped
    (k2) → near-dup-collapsed (k3) → decontaminated (k4) — per source.
    THE dashboard a data team reads from a curation run ("which source
    loses how much at which gate"), and a second driver-hashed witness
    of the c1 stage plumbing from a different angle than the manifest
    row: a stage filter wired to the wrong input shifts these counts
    even when the final manifest happens to agree.

    Stage definitions are shared with c1 itself (_c1_stage_frames /
    _c1_ctes — one definition, two consumers); output is ≤ 5·|sources|
    rows at any corpus scale."""
    from .extension_queries import _c1_stage_frames

    # r13 NEGATIVE RESULT: eager=True (materialize the chain's persisted
    # frames before the five stage aggregates fan out) A/B'd WORSE —
    # 8.37 eager vs 7.92 lazy median over 4 interleaved runs; the racing
    # duplicate builds the profile showed run on otherwise-idle cores,
    # while the eager passes serialize. Stays lazy.
    st = _c1_stage_frames(spark, sf_dir)
    src = D._persist(st["corpus"].select("doc_id", "source"))
    stages = [
        ("raw", st["corpus"].select("doc_id")),
        ("gated", st["k1"].select("doc_id")),
        ("exact", st["k2"].select("doc_id")),
        ("near", st["k3"]),
        ("clean", st["k4"]),
    ]
    outs = [
        src.join(f, "doc_id", "left_semi")
        .groupBy("source")
        .agg(F.count("*").cast("long").alias("n_docs"))
        .select(F.lit(name).alias("stage"), "source", "n_docs")
        for name, f in stages
    ]
    return reduce(lambda a, b: a.unionAll(b), outs)


# ---------------------------------------------------------------------------
# m2_multimodal_suite — the x14/x26 multimodal rows as ONE driver row
# (funds the x152 slot)
# ---------------------------------------------------------------------------


def _m2_sql() -> str:
    from .operators.multimodal import N_FEATURES

    z = "CAST(0 AS BIGINT)"
    zd = "CAST(0.0 AS DOUBLE)"
    feats = ", ".join(f"CAST(f{i} AS BIGINT)" for i in range(N_FEATURES))
    return f"""SELECT 'hdr' AS kind, doc_id AS id1, {z} AS id2, n_bytes AS v1,
       width AS v2, height AS v3, {zd} AS d1, {zd} AS d2, mime AS s1
FROM ({member_oracle('x14_multimodal_decode')})
UNION ALL
SELECT 'feat', doc_id, {z}, {z}, {z}, {z}, {zd}, {zd},
       concat_ws('|', {feats})
FROM ({member_oracle('x26_multimodal_features')})"""


@register(
    "m2_multimodal_suite", _m2_sql(), "EXT-04",
    tier=1,  # r12: consolidated into m14_sigmodal_suite (stays in bench HEADLINE)
)
def m2_multimodal_suite(spark, sf_dir):
    """Driver row consolidating the multimodal standalones (x14 real BMP
    header decode, x26 feature extraction — r9 window math: their two
    slots fund this row plus x152). x26's 8 feature doubles are exact
    integral values (payload-byte codes), so they ride the string slot
    as a pipe-joined exact-int64 rendering — no float formatting in the
    hash. Member oracles embedded verbatim; x14/x26 stay in the bench
    HEADLINE for the frozen r4 series."""
    from .extension_queries import x14_multimodal_decode, x26_multimodal_features
    from .operators.multimodal import N_FEATURES

    __r0, __r1 = D.overlap(  # guide §2.6
        lambda: x14_multimodal_decode(spark, sf_dir),
        lambda: x26_multimodal_features(spark, sf_dir),
    )
    h = _suite_shape(
        __r0, "hdr",
        id1=F.col("doc_id"), v1=F.col("n_bytes"), v2=F.col("width"),
        v3=F.col("height"), s1=F.col("mime"),
    )
    f = _suite_shape(
        __r1, "feat",
        id1=F.col("doc_id"),
        s1=F.concat_ws(
            "|", *[F.col(f"f{i}").cast("long").cast("string") for i in range(N_FEATURES)]
        ),
    )
    return h.unionAll(f)
