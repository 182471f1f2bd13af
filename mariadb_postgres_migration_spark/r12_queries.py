"""Round-12 registered queries: the banded near-dup tier applied to VIDEO
signatures (VERDICT r11 'Next round' #4 — x179's exact-signature dedup
misses re-encodes; x190 runs the x158 banded-hamming machinery over the
frame-0 aHash signatures with CC keep-one, and x191 measures its recall
with the x176 bounded-panel device), and the progressive-JPEG decode
made REAL (VERDICT r11 'What's missing #3' — x193 driver-hashes exact
pixel stats through the Annex-G multi-scan engine, x194 drains the
decode funnel's needs-fuller-codec queue to pixels), plus the
driver-window rows that fund them per the r11 suite-of-suites convention
(m8 consolidates x177/x180, m9 consolidates x183/x186, m10 consolidates
x128/x133; tier-0 stays == DRIVER_WINDOW). The third wave adds the
cross-path decode parity canary (x196 — baseline and progressive decodes
must agree per doc, as a driver-hashed row) and the per-source video
near-dup capacity sheet (x197).

Waves 4-11 complete the AUDIO perceptual tier (x199/x200 envelope
fingerprint dedup + measured recall, x202 onset screen, x203 capacity
sheet, x205 incremental ingest, c11 the composed audio pipeline, x206
the tri-modal pairing audit) and then the DUAL-SIGNATURE verification
family across both remaining modalities: x208/x209 the audio delta
fingerprint + re-scored pairs, x211/x212 the video last-frame hash +
re-scored pairs, x214/x215 the dual-VERIFIED keep-one decisions, and
c12/c13 the composed pipelines on that tier (with test-pinned
bracketing against c10/c11). Slots funded by the m11-m18 consolidation
rows per the same window math.

Registration/oracle conventions follow r7-r11_queries: every standalone
here is tier 1, every one is also driver-verified same-round, and suite
oracles compose the members' SQL via member_oracle() so member edits
can't drift.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from . import r11_queries  # noqa: F401  (m8 composes x177/x180 oracles)
from .extension_queries import _suite_shape
from .operators import dedup as D
from .operators.multimodal import ahash_pairs_ctes, image_neardup_pairs
from .r10_queries import C8_CORRUPT_MOD
from .r11_queries import C10_MIN_FRAMES, _video_sig_ctes, consistent_media_payloads
from .registry import _t, member_oracle, register

# ---------------------------------------------------------------------------
# Memoized dual-signature frames (r12 optimization round) — the
# consistent_media_payloads contract one level up: past the shared payload
# frame, every video consumer still ran its OWN Arrow decode kernel
# (video_frame_ahash or video_keyframe_ahashes) and every audio consumer
# its own (energy / delta / dual fingerprint), so a composed row like x220
# (= x190 + x214 + x199 + x215 under ONE action) paid four decode passes
# over the same cached payloads. The dual-signature operators are supersets
# of the single-signature ones: video_keyframe_ahashes' h_hi/h_lo are
# video_frame_ahash's bits byte-identical, and audio_dual_fingerprints'
# h_*/d_* are audio_energy_fingerprint's / audio_delta_fingerprint's with
# the identical decode gate. Emission sets match too — audio by operator
# construction (same decode + same >= grid length gate), video because
# every stored fixture frame is a real encoded JPEG, so frame 0 decodes
# iff the last frame does (x214's oracle parity, which seeds its CC from
# the frame-0 closed form but its Spark side from the dual frame, already
# pins this equality). So ONE memoized persisted dual frame per modality
# serves every consumer as a projection. Memo contract = consistent_media_payloads verbatim: keyed on
# applicationId + sf_dir, foreign-session eviction, re-persist on access,
# released between bench rows with every other tracked intermediate — each
# timed row still computes the signatures from the parquet inputs.
# MPS_SIG_MEMO_OFF=1 restores the pre-memo per-consumer kernels for A/Bs.
# c12/c13 keep their own passes on purpose: their inputs differ (corruption
# prefix / silence gate), so their frames are NOT the shared ones.
# ---------------------------------------------------------------------------

_SIG_FRAME_CACHE: dict = {}


def _sig_memo_off() -> bool:
    return bool(os.environ.get("MPS_SIG_MEMO_OFF"))


def _memo_sig_frame(spark, key, build):
    app = spark.sparkContext.applicationId
    key = (app,) + key
    df = D.memo_get_or_build(_SIG_FRAME_CACHE, app, key, build)
    # eager per access epoch: the dual-signature decode is the second most
    # expensive media subtree (~8-10 CPU-seconds per duplicate evaluation at
    # sf0.1) and every sheet/suite row references it from several broadcast
    # subqueries (operators/dedup.materialize_shared)
    return D.materialize_shared(D._persist(df), ("sig",) + key)


def video_sig_frame(spark, sf_dir):
    """The memoized persisted dual-keyframe signature frame (doc_id, h_hi,
    h_lo, l_hi, l_lo) over the shared AVI payload frame — every video
    signature consumer (x190/x191 frame-0 tier, x211 last-frame tier,
    x212/x214 dual tier) reads a projection of this ONE Arrow decode pass
    per action."""
    from .operators.multimodal import video_keyframe_ahashes

    return _memo_sig_frame(
        spark, (sf_dir, "avi"),
        lambda: video_keyframe_ahashes(
            consistent_media_payloads(spark, sf_dir)
        ),
    )


def audio_sig_frame(spark, sf_dir):
    """The memoized persisted dual-fingerprint frame (doc_id, h_hi, h_lo,
    d_hi, d_lo) over the shared WAV payload frame — every audio signature
    consumer (x199/x200 envelope tier, x208 delta tier, x209/x215 dual
    tier) reads a projection of this ONE Arrow decode pass per action."""
    from .operators.multimodal import audio_dual_fingerprints

    return _memo_sig_frame(
        spark, (sf_dir, "wav"),
        lambda: audio_dual_fingerprints(
            consistent_media_payloads(spark, sf_dir, kind="wav")
        ),
    )


def _pairs_memo_off() -> bool:
    return bool(os.environ.get("MPS_PAIRS_MEMO_OFF")) or _sig_memo_off()


def video_pairs_frame(spark, sf_dir):
    """The memoized banded near-dup pair frame (doc_a, doc_b, hamming ≤ 3)
    over the shared frame-0 video signatures — x190 (CC seed), x191
    (recall flag), x212 (re-score) and x214 (confirm) all consume the
    IDENTICAL image_neardup_pairs output, so a composed row (x192, x218,
    x220 — and the m-suites nesting them) otherwise pays the band
    explode + posting-list shuffle + verify join once PER member. Same
    memo contract as the sig frames (one level up); MPS_PAIRS_MEMO_OFF=1
    restores the per-consumer pair generation for A/Bs."""
    return _memo_sig_frame(
        spark, (sf_dir, "avi", "pairs"),
        lambda: image_neardup_pairs(
            video_sig_frame(spark, sf_dir).select("doc_id", "h_hi", "h_lo")
        ),
    )


def audio_pairs_frame(spark, sf_dir):
    """The memoized envelope-banded pair frame — video_pairs_frame on the
    audio modality (consumers x199/x200/x209/x215)."""
    return _memo_sig_frame(
        spark, (sf_dir, "wav", "pairs"),
        lambda: image_neardup_pairs(
            audio_sig_frame(spark, sf_dir).select("doc_id", "h_hi", "h_lo")
        ),
    )


# ---------------------------------------------------------------------------
# x190 — video near-dup keep-one: the banded hamming tier over frame-0
# signatures (two re-encodes of one clip differ by a few signature bits;
# x179's exact grouping misses them, this tier collapses them)
# ---------------------------------------------------------------------------


def _x190_sql() -> str:
    # sig comes MATERIALIZED from _video_sig_ctes (it feeds the band
    # union, both verify joins and the CC seed); p materialized per the
    # x144 CTE-inlining lesson (both edge directions); the CC is x163's
    # recursive form seeded with every video so singletons keep
    # themselves
    return f"""WITH RECURSIVE
{_video_sig_ctes()},
{ahash_pairs_ctes('sig')},
p AS MATERIALIZED (SELECT doc_a, doc_b FROM ham WHERE hamming <= 3),
edges AS (SELECT doc_a AS src, doc_b AS dst FROM p
          UNION ALL SELECT doc_b, doc_a FROM p),
reach AS (SELECT doc_id, doc_id AS n FROM sig
          UNION
          SELECT r.doc_id, e.dst FROM reach r JOIN edges e ON e.src = r.n)
SELECT doc_id, CAST(min(n) AS BIGINT) AS rep, (doc_id = min(n)) AS keep
FROM reach GROUP BY doc_id"""


@register(
    "x190_video_neardup_keep_one", _x190_sql(), "EXT-01", "EXT-02", "EXT-04",
    tier=1,
)
def x190_video_neardup_keep_one(spark, sf_dir):
    """Video NEAR-dup dedup decision (VERDICT r11 'Next round' #4): the
    x158 banded-hamming pair generator + x163 CC keep-one applied to the
    frame-0 aHash signatures from the real AVI chunk walk + JPEG decode
    (:func:`operators.multimodal.video_frame_ahash`) — so two re-encodes
    of the same clip whose signatures differ by <= 3 bits collapse to
    one survivor, which x179's exact (h_hi, h_lo) grouping structurally
    cannot do. Output (doc_id, rep, keep) — the survivor manifest shape.
    Scale: pair generation is capped posting lists over 4×16-bit bands
    (never video×video); the CC pays only for videos with edges; one
    Arrow decode pass total."""
    if _sig_memo_off():
        from .operators.multimodal import (
            video_frame_ahash,
        )

        sig = D._persist(
            video_frame_ahash(
                consistent_media_payloads(spark, sf_dir)
            )
        )
    else:
        sig = video_sig_frame(spark, sf_dir).select(
            "doc_id", "h_hi", "h_lo"
        )
    raw = (
        image_neardup_pairs(sig) if _pairs_memo_off()
        else video_pairs_frame(spark, sf_dir)
    )
    pairs = raw.select("doc_a", "doc_b")
    return D.dedup_keep_one(sig.select("doc_id"), pairs)


# ---------------------------------------------------------------------------
# x191 — measured video near-dup recall: the x176 bounded-panel device on
# the video signature space (every exhaustive hamming<=3 panel pair
# flagged with whether the banded generator found it)
# ---------------------------------------------------------------------------

#: x191's fixed probe panel — the x176 rule verbatim (md5-chosen from the
#: first 1024 doc_ids, ≤ ~128 panel videos at any SF, so the exhaustive
#: side stays ≤ ~8k in-row combinations).
X191_PANEL_SQL = (
    "doc_id < 1024 AND substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)"
    " IN ('0', '1')"
)


def _x191_sql() -> str:
    return f"""WITH {_video_sig_ctes()},
{ahash_pairs_ctes('sig')},
banded AS (SELECT doc_a, doc_b FROM ham WHERE hamming <= 3),
panel AS (SELECT * FROM sig WHERE {X191_PANEL_SQL}),
ex AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
              CAST(bit_count(xor(a.h_hi, b.h_hi))
                   + bit_count(xor(a.h_lo, b.h_lo)) AS BIGINT) AS hamming
       FROM panel a JOIN panel b ON a.doc_id < b.doc_id)
SELECT e.doc_a, e.doc_b, e.hamming,
       CAST(bd.doc_a IS NOT NULL AS BIGINT) AS in_banded
FROM ex e LEFT JOIN banded bd USING (doc_a, doc_b)
WHERE e.hamming <= 3"""


@register(
    "x191_video_neardup_recall", _x191_sql(), "EXT-02", "EXT-04", tier=1,
)
def x191_video_neardup_recall(spark, sf_dir):
    """Measured video near-dup recall (the x176 device on the video
    signature space): on the fixed md5-chosen panel, EVERY hamming<=3
    pair (exhaustive, in-row combinations over the bounded panel — never
    a corpus expansion) is flagged with whether the banded generator
    found it. The 4×16 banding is pigeonhole-complete at hamming<=3
    EXCEPT for pairs pruned by the stop-bucket cap, so in_banded=0 rows
    measure exactly that documented trade — video-dedup recall becomes a
    driver-hashed regression canary alongside the image (x176) and ANN
    (x142) canaries."""
    from .operators.dedup import _pair_combinations

    if _sig_memo_off():
        from .operators.multimodal import (
            video_frame_ahash,
        )

        sig = D._persist(
            video_frame_ahash(
                consistent_media_payloads(spark, sf_dir)
            )
        )
    else:
        sig = video_sig_frame(spark, sf_dir).select(
            "doc_id", "h_hi", "h_lo"
        )
    banded = (
        image_neardup_pairs(sig) if _pairs_memo_off()
        else video_pairs_frame(spark, sf_dir)
    ).select("doc_a", "doc_b", F.lit(1).alias("__b"))
    panel = sig.filter(
        (F.col("doc_id") < 1024)
        & F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1).isin("0", "1")
    )
    ids = panel.groupBy().agg(F.sort_array(F.collect_list("doc_id")).alias("ids"))
    cand = ids.select(
        F.explode(_pair_combinations(F.col("ids"))).alias("p")
    ).select("p.doc_a", "p.doc_b")
    a = sig.select(
        F.col("doc_id").alias("doc_a"),
        F.col("h_hi").alias("a_hi"),
        F.col("h_lo").alias("a_lo"),
    )
    b = sig.select(
        F.col("doc_id").alias("doc_b"),
        F.col("h_hi").alias("b_hi"),
        F.col("h_lo").alias("b_lo"),
    )
    hamming = (
        F.bit_count(F.col("a_hi").bitwiseXOR(F.col("b_hi")))
        + F.bit_count(F.col("a_lo").bitwiseXOR(F.col("b_lo")))
    ).cast("long")
    ex = (
        cand.join(a, "doc_a")
        .join(b, "doc_b")
        .withColumn("hamming", hamming)
        .filter(F.col("hamming") <= 3)
    )
    return ex.join(banded, ["doc_a", "doc_b"], "left").select(
        "doc_a", "doc_b", "hamming",
        F.col("__b").isNotNull().cast("long").alias("in_banded"),
    )


# ---------------------------------------------------------------------------
# m8_r11bc_suite — the x177/x180 r11 wave suites as ONE driver row (funds
# the x192 slot)
# ---------------------------------------------------------------------------


def _m8_sql() -> str:
    return f"""SELECT concat('b_', kind) AS kind, id1, id2, v1, v2, v3, d1,
       d2, s1
FROM ({member_oracle('x177_r11b_ops_suite')})
UNION ALL
SELECT concat('c_', kind), id1, id2, v1, v2, v3, d1, d2, s1
FROM ({member_oracle('x180_r11c_ops_suite')})"""


@register(
    "m8_r11bc_suite", _m8_sql(), "EXT-01", "EXT-02", "EXT-04", "EXT-05",
    tier=1,  # r12: consolidated into m18_r9d10h11bc_suite (stays in bench HEADLINE)
)
def m8_r11bc_suite(spark, sf_dir):
    """Driver row consolidating two same-shaped r11 wave suites (x177 =
    MJPEG frame stats + measured image near-dup recall, x180 = JPEG
    decode funnel + video perceptual dedup) — r12 window math: their two
    slots fund this row plus x192. Kind-namespace prefixes, member
    oracles embedded verbatim; x177/x180 and their members stay benched
    (frozen series untouched)."""
    from .registry import REGISTRY

    def widen(df, prefix):
        return df.select(
            F.concat(F.lit(prefix), F.col("kind")).alias("kind"),
            "id1", "id2", "v1", "v2", "v3", "d1", "d2", "s1",
        )

    b, c = D.overlap(  # guide §2.6: member construction overlapped
        lambda: REGISTRY["x177_r11b_ops_suite"].fn(spark, sf_dir),
        lambda: REGISTRY["x180_r11c_ops_suite"].fn(spark, sf_dir),
    )
    return widen(b, "b_").unionAll(widen(c, "c_"))


# ---------------------------------------------------------------------------
# x192_r12a_ops_suite — the r12 first-wave operators under one driver hash
# ---------------------------------------------------------------------------


def _x192_sql() -> str:
    z = "CAST(0 AS BIGINT)"
    zd = "CAST(0.0 AS DOUBLE)"
    return f"""SELECT 'vnd' AS kind, doc_id AS id1, rep AS id2,
       CAST(keep AS BIGINT) AS v1, {z} AS v2, {z} AS v3, {zd} AS d1,
       {zd} AS d2, CAST(NULL AS VARCHAR) AS s1
FROM ({member_oracle('x190_video_neardup_keep_one')})
UNION ALL
SELECT 'vrc', doc_a, doc_b, hamming, in_banded, {z}, {zd}, {zd},
       CAST(NULL AS VARCHAR)
FROM ({member_oracle('x191_video_neardup_recall')})"""


@register(
    "x192_r12a_ops_suite", _x192_sql(), "EXT-01", "EXT-02", "EXT-04",
)
def x192_r12a_ops_suite(spark, sf_dir):
    """Driver row for the r12 first wave — video near-dup keep-one
    (x190) and measured video near-dup recall (x191) — union-folded into
    the shared kind-tagged suite shape (2 small members → lazy union per
    the SCALE.md composition rule)."""
    r190, r191 = D.overlap(
        lambda: x190_video_neardup_keep_one(spark, sf_dir),
        lambda: x191_video_neardup_recall(spark, sf_dir),
    )
    vnd = _suite_shape(
        r190, "vnd",
        id1=F.col("doc_id"), id2=F.col("rep"),
        v1=F.col("keep").cast("long"),
    )
    vrc = _suite_shape(
        r191, "vrc",
        id1=F.col("doc_a"), id2=F.col("doc_b"), v1=F.col("hamming"),
        v2=F.col("in_banded"),
    )
    return vnd.unionAll(vrc)


# ===========================================================================
# r12 second wave: the progressive-JPEG decoder made real (VERDICT r11
# 'What's missing #3') — x193 runs the full multi-scan decode (DC + AC
# spectral bands under successive approximation) over genuinely
# progressive payloads and driver-hashes the exact pixel stats; x194 is
# the decode funnel whose 'needs-fuller-codec queue' now DRAINS (class +
# decoded px_sum per payload over a mixed baseline/progressive/corrupt
# corpus) — funded by consolidating the x183/x186 r11 wave suites into
# m9_r11de_suite.
# ===========================================================================


def _x193_sql() -> str:
    from .extension_queries import _X115_SQL

    # the x115 closed form VERBATIM: the progressive stream carries the
    # same constant-block content, and the multi-scan decode is exactly
    # lossless on it (DC point transform + refinement reassemble the
    # exact DC; AC scans are pure end-of-band runs)
    return _X115_SQL


@register("x193_progressive_pixel_stats", _x193_sql(), "EXT-04", tier=1)
def x193_progressive_pixel_stats(spark, sf_dir):
    """Pixel stats through the REAL progressive-JPEG decode path
    (VERDICT r11 'What's missing #3'): every payload is a spec-valid
    multi-scan SOF2 stream (DC first + refinement, AC spectral bands
    1-5/6-63 at successive-approximation levels 2→1→0, end-of-band runs
    with buffered correction bits — operators/jpeg.py
    encode_jpeg_gray_progressive), and the query side decodes it with
    the Annex-G multi-scan engine (_decode_progressive), NOT the
    baseline path. The oracle is x115's closed form verbatim — a hash
    match proves the progressive entropy decode reassembles the exact
    same pixels the baseline path produces. General-content parity
    (nonzero AC, refinement corrections, color) is pinned in
    tests/test_jpeg_codec.py round-trips."""
    from .operators.multimodal import (
        attach_consistent_jpeg_payload,
        pixel_stats,
    )

    return pixel_stats(
        attach_consistent_jpeg_payload(
            _t(spark, sf_dir, "documents"), progressive=True
        )
    )


def _x194_sql() -> str:
    bpr = ("2 + (CASE WHEN length(t) = 0 THEN 0"
           " ELSE ascii(substr(t, 1, 1)) END % 4)")
    return f"""WITH ascii_docs AS (
         SELECT doc_id, regexp_replace(text, '[^ -~]', '', 'g') AS t
         FROM documents),
dims AS (SELECT doc_id, t, {bpr} AS bpr,
                least(length(t) // ({bpr}), 8) AS nrows
         FROM ascii_docs)
SELECT doc_id,
       CASE WHEN doc_id % 5 = 0 THEN 'progressive'
            WHEN doc_id % 5 = 1 THEN 'corrupt'
            ELSE 'baseline' END AS decode_class,
       CASE WHEN doc_id % 5 = 1 THEN CAST(0 AS BIGINT)
            ELSE CAST(64 * list_sum(list_transform(
                     range(1, CAST(bpr * nrows AS BIGINT) + 1),
                     i -> ascii(substr(t, CAST(i AS INTEGER), 1))))
                 AS BIGINT) END AS px_sum
FROM dims WHERE nrows >= 1"""


@register(
    "x194_jpeg_decode_funnel_v2", _x194_sql(), "EXT-04", "EXT-05", tier=1,
)
def x194_jpeg_decode_funnel_v2(spark, sf_dir):
    """The x178 decode funnel with its progressive queue CONVERTED TO
    PIXELS: the mixed fixture's doc_id%5==0 class is now a GENUINE
    multi-scan progressive encoding (not a marker rewrite), and the
    classifier kernel (:func:`operators.multimodal.jpeg_decode_funnel`)
    decodes every payload through whichever entropy path its frame
    header demands, emitting class + exact decoded px_sum. The oracle
    recomputes both from the degradation rule and the constant-block
    closed form — a hash match proves progressive payloads produce the
    SAME pixels as their baseline siblings, per doc, through a
    completely different entropy path."""
    from .operators.multimodal import (
        attach_consistent_jpeg_payload,
        jpeg_decode_funnel,
    )

    return jpeg_decode_funnel(
        attach_consistent_jpeg_payload(
            _t(spark, sf_dir, "documents"), mixed=True, progressive=True
        )
    )


# ---------------------------------------------------------------------------
# m9_r11de_suite — the x183/x186 r11 wave suites as ONE driver row (funds
# the x195 slot)
# ---------------------------------------------------------------------------


def _m9_sql() -> str:
    return f"""SELECT concat('d_', kind) AS kind, id1, id2, v1, v2, v3, d1,
       d2, s1
FROM ({member_oracle('x183_r11d_ops_suite')})
UNION ALL
SELECT concat('e_', kind), id1, id2, v1, v2, v3, d1, d2, s1
FROM ({member_oracle('x186_r11e_ops_suite')})"""


@register(
    "m9_r11de_suite", _m9_sql(), "EXT-01", "EXT-02", "EXT-04",
    tier=1,  # r12: consolidated into m19_r8ab11de_suite (stays in bench HEADLINE)
)
def m9_r11de_suite(spark, sf_dir):
    """Driver row consolidating two same-shaped r11 wave suites (x183 =
    video header profile + scene-change deltas, x186 = incremental video
    dedup + audio energy screen) — r12 window math: their two slots fund
    this row plus x195. Kind-namespace prefixes, member oracles embedded
    verbatim; x183/x186 and their members stay benched (frozen series
    untouched)."""
    from .registry import REGISTRY

    def widen(df, prefix):
        return df.select(
            F.concat(F.lit(prefix), F.col("kind")).alias("kind"),
            "id1", "id2", "v1", "v2", "v3", "d1", "d2", "s1",
        )

    d, e = D.overlap(  # guide §2.6: member construction overlapped
        lambda: REGISTRY["x183_r11d_ops_suite"].fn(spark, sf_dir),
        lambda: REGISTRY["x186_r11e_ops_suite"].fn(spark, sf_dir),
    )
    return widen(d, "d_").unionAll(widen(e, "e_"))


# ---------------------------------------------------------------------------
# x195_r12b_ops_suite — the r12 second-wave operators under one driver hash
# ---------------------------------------------------------------------------


def _x195_sql() -> str:
    z = "CAST(0 AS BIGINT)"
    zd = "CAST(0.0 AS DOUBLE)"
    return f"""SELECT 'ppx' AS kind, doc_id AS id1, {z} AS id2, width AS v1,
       height AS v2, px_sum AS v3, CAST(px_min AS DOUBLE) AS d1,
       CAST(px_max AS DOUBLE) AS d2, CAST(NULL AS VARCHAR) AS s1
FROM ({member_oracle('x193_progressive_pixel_stats')})
UNION ALL
SELECT 'fnl', doc_id, {z}, px_sum, {z}, {z}, {zd}, {zd}, decode_class
FROM ({member_oracle('x194_jpeg_decode_funnel_v2')})"""


@register(
    "x195_r12b_ops_suite", _x195_sql(), "EXT-04", "EXT-05",
)
def x195_r12b_ops_suite(spark, sf_dir):
    """Driver row for the r12 second wave — progressive-JPEG pixel stats
    (x193) and the decode funnel v2 with real progressive decode (x194)
    — union-folded into the shared kind-tagged suite shape (2 small
    members → lazy union per the SCALE.md composition rule)."""
    __r0, __r1 = D.overlap(  # guide §2.6
        lambda: x193_progressive_pixel_stats(spark, sf_dir),
        lambda: x194_jpeg_decode_funnel_v2(spark, sf_dir),
    )
    ppx = _suite_shape(
        __r0, "ppx",
        id1=F.col("doc_id"), v1=F.col("width"), v2=F.col("height"),
        v3=F.col("px_sum"), d1=F.col("px_min").cast("double"),
        d2=F.col("px_max").cast("double"),
    )
    fnl = _suite_shape(
        __r1, "fnl",
        id1=F.col("doc_id"), v1=F.col("px_sum"), s1=F.col("decode_class"),
    )
    return ppx.unionAll(fnl)


# ===========================================================================
# r12 third wave: the cross-path decode parity canary (x196 — baseline and
# progressive entropy paths must reproduce identical pixels PER DOC, as a
# driver-hashed row rather than only a local test) and the per-source
# video near-dup capacity sheet (x197 — what the x190 tier actually saves
# per crawl source) — funded by consolidating the x128/x133 r8 wave
# suites into m10_r8ab_suite.
# ===========================================================================


def _x196_sql() -> str:
    # parity is CONSTANT TRUE in the closed form — the row exists so the
    # SPARK side must PROVE it: any divergence between the two entropy
    # decoders flips parity (or drops a row) and the driver hash breaks
    return f"""SELECT doc_id, width, height, px_sum,
       CAST(1 AS BIGINT) AS parity
FROM ({member_oracle('x115_jpeg_pixel_stats')})"""


@register(
    "x196_decode_path_parity", _x196_sql(), "EXT-04", tier=1,
)
def x196_decode_path_parity(spark, sf_dir):
    """Cross-entropy-path decode parity as DATA: per document, the
    baseline (Annex F) decode of the baseline encoding and the
    progressive (Annex G) decode of the progressive encoding of the
    SAME content are joined and compared field-by-field — parity = all
    five pixel stats equal. The oracle pins parity to constant true, so
    the Spark side carries the burden of proof: a single diverging
    document (or one that decodes on one path only) breaks the driver
    hash. The per-doc x142/x176/x191 canary device applied to codec
    correctness itself."""
    from .extension_queries import x115_jpeg_pixel_stats

    stats = ["width", "height", "px_min", "px_max", "px_sum"]
    b = x115_jpeg_pixel_stats(spark, sf_dir)
    p = x193_progressive_pixel_stats(spark, sf_dir)
    pr = p.select(
        "doc_id", *[F.col(c).alias(f"p_{c}") for c in stats]
    )
    parity = None
    for c in stats:
        eq = F.col(c) == F.col(f"p_{c}")
        parity = eq if parity is None else (parity & eq)
    return (
        b.join(pr, "doc_id")
        .select(
            "doc_id", "width", "height", "px_sum",
            parity.cast("long").alias("parity"),
        )
    )


def _x197_sql() -> str:
    return f"""WITH k AS (SELECT doc_id, keep
           FROM ({member_oracle('x190_video_neardup_keep_one')}) z)
SELECT d.source, CAST(count(*) AS BIGINT) AS n_videos,
       CAST(sum(CASE WHEN k.keep THEN 1 ELSE 0 END) AS BIGINT)
           AS n_survivors,
       CAST(sum(CASE WHEN k.keep THEN 0 ELSE 1 END) AS BIGINT) AS n_dupes
FROM k JOIN documents d USING (doc_id)
GROUP BY d.source"""


@register(
    "x197_video_neardup_source_sheet", _x197_sql(), "EXT-02", "EXT-04",
    "EXT-05", tier=1,
)
def x197_video_neardup_source_sheet(spark, sf_dir):
    """Per-source video NEAR-dup capacity sheet (the x170/x188 sheet
    family over the x190 tier): videos, near-dup survivors and the
    collapse count per crawl source — what a data team reads to see
    which sources are re-encode farms before paying for ingest. One
    doc_id equi-join + one map-side-combined aggregate past the x190
    plan; ≤ |sources| rows out."""
    docs = _t(spark, sf_dir, "documents")
    k = x190_video_neardup_keep_one(spark, sf_dir).select("doc_id", "keep")
    return (
        k.join(docs.select("doc_id", "source"), "doc_id")
        .groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_videos"),
            F.sum(F.col("keep").cast("long")).cast("long")
            .alias("n_survivors"),
            F.sum((~F.col("keep")).cast("long")).cast("long")
            .alias("n_dupes"),
        )
    )


# ---------------------------------------------------------------------------
# m10_r8ab_suite — the x128/x133 r8 wave suites as ONE driver row (funds
# the x198 slot)
# ---------------------------------------------------------------------------


def _m10_sql() -> str:
    return f"""SELECT concat('a_', kind) AS kind, id1, id2, v1, v2, v3, d1,
       d2, s1
FROM ({member_oracle('x128_r8_ops_suite')})
UNION ALL
SELECT concat('b_', kind), id1, id2, v1, v2, v3, d1, d2, s1
FROM ({member_oracle('x133_r8b_ops_suite')})"""


@register(
    "m10_r8ab_suite", _m10_sql(),
    # the union of both members' coverage ids — the no-orphans invariant
    "EXT-GRAPH", "EXT-ANOM", "EXT-AUDIT", "EXT-ANALYTICS", "EXT-AGG",
    "EXT-05",
    tier=1,  # r12: consolidated into m19_r8ab11de_suite (stays in bench HEADLINE)
)
def m10_r8ab_suite(spark, sf_dir):
    """Driver row consolidating two same-shaped r8 wave suites (x128 =
    CUSUM + label propagation + Spearman + KS drift, x133 = Mann-Kendall
    + Theil-Sen + Gini + vocab richness) — r12 window math: their two
    slots fund this row plus x198. Kind-namespace prefixes, member
    oracles embedded verbatim; x128/x133 and their members stay benched
    (frozen series untouched)."""
    from .registry import REGISTRY

    def widen(df, prefix):
        return df.select(
            F.concat(F.lit(prefix), F.col("kind")).alias("kind"),
            "id1", "id2", "v1", "v2", "v3", "d1", "d2", "s1",
        )

    a, b = D.overlap(  # guide §2.6: member construction overlapped
        lambda: REGISTRY["x128_r8_ops_suite"].fn(spark, sf_dir),
        lambda: REGISTRY["x133_r8b_ops_suite"].fn(spark, sf_dir),
    )
    return widen(a, "a_").unionAll(widen(b, "b_"))


# ---------------------------------------------------------------------------
# x198_r12c_ops_suite — the r12 third-wave operators under one driver hash
# ---------------------------------------------------------------------------


def _x198_sql() -> str:
    z = "CAST(0 AS BIGINT)"
    zd = "CAST(0.0 AS DOUBLE)"
    return f"""SELECT 'pvb' AS kind, doc_id AS id1, {z} AS id2, px_sum AS v1,
       width * 1000 + height AS v2, parity AS v3, {zd} AS d1, {zd} AS d2,
       CAST(NULL AS VARCHAR) AS s1
FROM ({member_oracle('x196_decode_path_parity')})
UNION ALL
SELECT 'vsrc', {z}, {z}, n_videos, n_survivors, n_dupes, {zd}, {zd}, source
FROM ({member_oracle('x197_video_neardup_source_sheet')})"""


@register(
    "x198_r12c_ops_suite", _x198_sql(), "EXT-02", "EXT-04", "EXT-05",
)
def x198_r12c_ops_suite(spark, sf_dir):
    """Driver row for the r12 third wave — the cross-path decode parity
    canary (x196) and the per-source video near-dup sheet (x197) —
    union-folded into the shared kind-tagged suite shape (2 small
    members → lazy union per the SCALE.md composition rule)."""
    __r0, __r1 = D.overlap(  # guide §2.6
        lambda: x196_decode_path_parity(spark, sf_dir),
        lambda: x197_video_neardup_source_sheet(spark, sf_dir),
    )
    pvb = _suite_shape(
        __r0, "pvb",
        id1=F.col("doc_id"), v1=F.col("px_sum"),
        v2=F.col("width") * 1000 + F.col("height"), v3=F.col("parity"),
    )
    vsrc = _suite_shape(
        __r1, "vsrc",
        v1=F.col("n_videos"), v2=F.col("n_survivors"), v3=F.col("n_dupes"),
        s1=F.col("source"),
    )
    return pvb.unionAll(vsrc)


# ===========================================================================
# r12 fourth wave: the perceptual near-dup tier applied to AUDIO — the
# last modality without one (text x02/x03, image x157/x158/x163, video
# x190; audio had only the exact-stats screens x86/x185). x199 runs the
# banded-hamming + CC keep-one machinery over a 64-bit energy-envelope
# fingerprint computed from REAL decoded PCM, and x200 measures its
# recall with the x176/x191 bounded-panel device (the FOURTH driver-
# hashed recall canary). Funded by consolidating the x137/x140 r8 wave
# suites into m11_r8cd_suite.
# ===========================================================================


def _audio_v_ctes(extra_pred: str = "") -> str:
    """The audio fixture's window-value closed form as a CTE chain
    (ascii projection → eligible-clip params → the 64-window value list
    ``v``), shared by the audio signature CTEs (x199/x200/c11) and the
    onset oracle (x202) — one definition, many consumers, per the
    _video_sig_ctes convention. Window w of the WAV fixture is spw
    constant int16 samples of byte b[(w·m)//64] with m = min(n, 32) (the
    intro window — the near-dup device), so window ENERGY is spw·v_w²
    and every energy comparison cancels spw — the oracle never needs to
    model the sample axis, only the 64-value envelope."""
    v_expr = (
        "list_transform(range(0, 64), k -> ascii(substr(text, CAST("
        "(k * least(n, 32)) // 64 AS INTEGER) + 1, 1)))"
    )
    return f"""ascii_docs AS (
         SELECT doc_id, regexp_replace(text, '[^ -~]', '', 'g') AS text
         FROM documents),
a2 AS (SELECT doc_id, text, length(text) AS n,
              2 + ascii(substr(text, 1, 1)) % 7 AS spw
       FROM ascii_docs WHERE length(text) >= 1 {extra_pred}),
av AS (SELECT doc_id, spw, {v_expr} AS v FROM a2)"""


def _audio_sig_ctes(extra_pred: str = "") -> str:
    """The audio energy-envelope fingerprint closed form (the
    _video_sig_ctes twin): bit w = 64·e_w > Σe with e_w = spw·v_w², and
    spw cancels — 64·v_w² > Σv² — so ``sig`` packs exactly the bits
    :func:`operators.multimodal.audio_energy_fingerprint` computes from
    the decoded samples. MATERIALIZED because every consumer feeds it to
    the band union, both verify joins and the CC seed (the x144
    CTE-inlining lesson)."""
    return f"""{_audio_v_ctes(extra_pred)},
sig AS MATERIALIZED (
  SELECT doc_id,
         CAST(list_sum(list_transform(range(0, 32), k ->
              CASE WHEN 64 * v[k + 1] * v[k + 1] > total
                   THEN (CAST(1 AS BIGINT) << (31 - k)) ELSE 0 END))
              AS BIGINT) AS h_hi,
         CAST(list_sum(list_transform(range(32, 64), k ->
              CASE WHEN 64 * v[k + 1] * v[k + 1] > total
                   THEN (CAST(1 AS BIGINT) << (63 - k)) ELSE 0 END))
              AS BIGINT) AS h_lo
  FROM (SELECT doc_id, v,
               CAST(list_sum(list_transform(v, x -> x * x)) AS BIGINT)
                   AS total
        FROM av) z)"""


def _x199_sql() -> str:
    # the x190 keep-one form verbatim on the audio signature space
    return f"""WITH RECURSIVE
{_audio_sig_ctes()},
{ahash_pairs_ctes('sig')},
p AS MATERIALIZED (SELECT doc_a, doc_b FROM ham WHERE hamming <= 3),
edges AS (SELECT doc_a AS src, doc_b AS dst FROM p
          UNION ALL SELECT doc_b, doc_a FROM p),
reach AS (SELECT doc_id, doc_id AS n FROM sig
          UNION
          SELECT r.doc_id, e.dst FROM reach r JOIN edges e ON e.src = r.n)
SELECT doc_id, CAST(min(n) AS BIGINT) AS rep, (doc_id = min(n)) AS keep
FROM reach GROUP BY doc_id"""


@register(
    "x199_audio_neardup_keep_one", _x199_sql(), "EXT-01", "EXT-02", "EXT-04",
    tier=1,
)
def x199_audio_neardup_keep_one(spark, sf_dir):
    """Audio NEAR-dup dedup decision — the x190 device on the audio
    modality: a 64-bit energy-envelope fingerprint from REAL decoded PCM
    (:func:`operators.multimodal.audio_energy_fingerprint` — the chunk
    walk, then exact int64 window energies under the strict aHash
    threshold), banded-hamming pair generation, CC keep-one — so two
    re-encodes of one clip whose envelopes differ by <= 3 bits collapse
    to one survivor, which exact stats screens (x86/x185) structurally
    cannot do. Output (doc_id, rep, keep) — the survivor manifest shape.
    Scale: pair generation is capped posting lists over 4×16-bit bands
    (never clip×clip); the CC pays only for clips with edges; one Arrow
    decode pass total."""
    if _sig_memo_off():
        from .operators.multimodal import (
            audio_energy_fingerprint,
        )

        sig = D._persist(
            audio_energy_fingerprint(
                consistent_media_payloads(spark, sf_dir, kind="wav")
            )
        )
    else:
        sig = audio_sig_frame(spark, sf_dir).select(
            "doc_id", "h_hi", "h_lo"
        )
    raw = (
        image_neardup_pairs(sig) if _pairs_memo_off()
        else audio_pairs_frame(spark, sf_dir)
    )
    pairs = raw.select("doc_a", "doc_b")
    return D.dedup_keep_one(sig.select("doc_id"), pairs)


#: x200's fixed probe panel — the x176 rule WIDENED to a 1/4 md5 slice
#: (the audio envelope space is higher-entropy than the image/video
#: hashes, so the 1/8 slice goes empty at the driver SF; 1/4 keeps the
#: exhaustive side ≤ C(256,2) ≈ 33k in-row combinations at any SF —
#: still panel-bounded, never a corpus expansion).
X200_PANEL_SQL = (
    "doc_id < 1024 AND substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)"
    " IN ('0', '1', '2', '3')"
)


def _x200_sql() -> str:
    return f"""WITH {_audio_sig_ctes()},
{ahash_pairs_ctes('sig')},
banded AS (SELECT doc_a, doc_b FROM ham WHERE hamming <= 3),
panel AS (SELECT * FROM sig WHERE {X200_PANEL_SQL}),
ex AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
              CAST(bit_count(xor(a.h_hi, b.h_hi))
                   + bit_count(xor(a.h_lo, b.h_lo)) AS BIGINT) AS hamming
       FROM panel a JOIN panel b ON a.doc_id < b.doc_id)
SELECT e.doc_a, e.doc_b, e.hamming,
       CAST(bd.doc_a IS NOT NULL AS BIGINT) AS in_banded
FROM ex e LEFT JOIN banded bd USING (doc_a, doc_b)
WHERE e.hamming <= 3"""


@register(
    "x200_audio_neardup_recall", _x200_sql(), "EXT-02", "EXT-04", tier=1,
)
def x200_audio_neardup_recall(spark, sf_dir):
    """Measured audio near-dup recall (the x176/x191 bounded-panel
    device on the audio fingerprint space): on the fixed md5-chosen
    panel, EVERY hamming<=3 pair (exhaustive, in-row combinations over
    the bounded panel — never a corpus expansion) is flagged with
    whether the banded generator found it; in_banded=0 rows measure
    exactly the documented stop-bucket trade. The FOURTH driver-hashed
    recall canary (ANN x142, image x176, video x191 — now audio), so
    every similarity tier in the engine carries a measured-quality
    regression gate."""
    from .operators.dedup import _pair_combinations

    if _sig_memo_off():
        from .operators.multimodal import (
            audio_energy_fingerprint,
        )

        sig = D._persist(
            audio_energy_fingerprint(
                consistent_media_payloads(spark, sf_dir, kind="wav")
            )
        )
    else:
        sig = audio_sig_frame(spark, sf_dir).select(
            "doc_id", "h_hi", "h_lo"
        )
    banded = (
        image_neardup_pairs(sig) if _pairs_memo_off()
        else audio_pairs_frame(spark, sf_dir)
    ).select("doc_a", "doc_b", F.lit(1).alias("__b"))
    panel = sig.filter(
        (F.col("doc_id") < 1024)
        & F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1)
        .isin("0", "1", "2", "3")
    )
    ids = panel.groupBy().agg(F.sort_array(F.collect_list("doc_id")).alias("ids"))
    cand = ids.select(
        F.explode(_pair_combinations(F.col("ids"))).alias("p")
    ).select("p.doc_a", "p.doc_b")
    a = sig.select(
        F.col("doc_id").alias("doc_a"),
        F.col("h_hi").alias("a_hi"),
        F.col("h_lo").alias("a_lo"),
    )
    b = sig.select(
        F.col("doc_id").alias("doc_b"),
        F.col("h_hi").alias("b_hi"),
        F.col("h_lo").alias("b_lo"),
    )
    hamming = (
        F.bit_count(F.col("a_hi").bitwiseXOR(F.col("b_hi")))
        + F.bit_count(F.col("a_lo").bitwiseXOR(F.col("b_lo")))
    ).cast("long")
    ex = (
        cand.join(a, "doc_a")
        .join(b, "doc_b")
        .withColumn("hamming", hamming)
        .filter(F.col("hamming") <= 3)
    )
    return ex.join(banded, ["doc_a", "doc_b"], "left").select(
        "doc_a", "doc_b", "hamming",
        F.col("__b").isNotNull().cast("long").alias("in_banded"),
    )


# ---------------------------------------------------------------------------
# m11_r8cd_suite — the x137/x140 r8 wave suites as ONE driver row (funds
# the x201 slot). x140's 6-column shape pads to the shared 9-column shape.
# ---------------------------------------------------------------------------


def _m11_sql() -> str:
    z = "CAST(0 AS BIGINT)"
    zd = "CAST(0.0 AS DOUBLE)"
    return f"""SELECT concat('c_', kind) AS kind, id1, id2, v1, v2, v3, d1,
       d2, s1
FROM ({member_oracle('x137_r8c_ops_suite')})
UNION ALL
SELECT concat('d_', kind), id1, id2, v1, {z}, {z}, d1, {zd}, s1
FROM ({member_oracle('x140_r8d_ops_suite')})"""


@register(
    "m11_r8cd_suite", _m11_sql(),
    # the union of both members' coverage ids — the no-orphans invariant
    "EXT-01", "EXT-02", "EXT-05", "EXT-ANALYTICS", "EXT-ANOM", "EXT-AGG",
)
def m11_r8cd_suite(spark, sf_dir):
    """Driver row consolidating two r8 wave suites (x137 = cluster-size
    histogram + burstiness + Zipf profile, x140 = split manifest +
    rendezvous shards + streamed split ledger) — r12 window math: their
    two slots fund this row plus x201. x140's 6-column shape pads to the
    shared 9-column shape (v2/v3/d2 defaults); kind-namespace prefixes,
    member oracles embedded verbatim; x137/x140 and their members stay
    benched (frozen series untouched)."""
    from .registry import REGISTRY

    zl = F.lit(0).cast("long")
    zd = F.lit(0.0)
    c = REGISTRY["x137_r8c_ops_suite"].fn(spark, sf_dir).select(
        F.concat(F.lit("c_"), F.col("kind")).alias("kind"),
        "id1", "id2", "v1", "v2", "v3", "d1", "d2", "s1",
    )
    d = REGISTRY["x140_r8d_ops_suite"].fn(spark, sf_dir).select(
        F.concat(F.lit("d_"), F.col("kind")).alias("kind"),
        "id1", "id2", "v1", zl.alias("v2"), zl.alias("v3"), "d1",
        zd.alias("d2"), "s1",
    )
    return c.unionAll(d)


# ---------------------------------------------------------------------------
# x201_r12d_ops_suite — the r12 fourth-wave operators under one driver hash
# ---------------------------------------------------------------------------


def _x201_sql() -> str:
    z = "CAST(0 AS BIGINT)"
    zd = "CAST(0.0 AS DOUBLE)"
    return f"""SELECT 'and' AS kind, doc_id AS id1, rep AS id2,
       CAST(keep AS BIGINT) AS v1, {z} AS v2, {z} AS v3, {zd} AS d1,
       {zd} AS d2, CAST(NULL AS VARCHAR) AS s1
FROM ({member_oracle('x199_audio_neardup_keep_one')})
UNION ALL
SELECT 'arc', doc_a, doc_b, hamming, in_banded, {z}, {zd}, {zd},
       CAST(NULL AS VARCHAR)
FROM ({member_oracle('x200_audio_neardup_recall')})"""


@register(
    "x201_r12d_ops_suite", _x201_sql(), "EXT-01", "EXT-02", "EXT-04",
)
def x201_r12d_ops_suite(spark, sf_dir):
    """Driver row for the r12 fourth wave — audio near-dup keep-one
    (x199) and measured audio near-dup recall (x200) — union-folded into
    the shared kind-tagged suite shape (2 small members → lazy union per
    the SCALE.md composition rule)."""
    __r0, __r1 = D.overlap(  # guide §2.6
        lambda: x199_audio_neardup_keep_one(spark, sf_dir),
        lambda: x200_audio_neardup_recall(spark, sf_dir),
    )
    and_ = _suite_shape(
        __r0, "and",
        id1=F.col("doc_id"), id2=F.col("rep"),
        v1=F.col("keep").cast("long"),
    )
    arc = _suite_shape(
        __r1, "arc",
        id1=F.col("doc_a"), id2=F.col("doc_b"), v1=F.col("hamming"),
        v2=F.col("in_banded"),
    )
    return and_.unionAll(arc)


# ===========================================================================
# r12 fifth wave: c11 — the composed AUDIO curation pipeline, completing
# the composed-pipeline family across ALL modalities (c1/c2 text, c7
# endgame, c8/c9 image, c10 video, c11 audio) — funded by consolidating
# the s5/s6 r10 consolidation suites into m12_embsetwin_suite.
# ===========================================================================

#: c11's decode-validity fixture: every C8_CORRUPT_MOD-th payload gets a
#: 2-zero-byte prefix (no RIFF magic starts 0x0000) — the c9/c10 device.
#: Every C11_SILENT_MOD-th clip is built SILENT (spec-valid all-zero PCM)
#: so the VAD gate (sum_sq > 0) has real teeth at every SF.
C11_SILENT_MOD = 6

#: c11's duration quality gate: drop micro-clips. The fixture's sample
#: count is 64·spw with spw = 2 + first % 7, so a gate at 256 samples
#: drops the first%7 < 2 class — real teeth at every SF.
C11_MIN_SAMPLES = 256


def _c11_sql() -> str:
    silent = f"AND doc_id % {C11_SILENT_MOD} <> 0"
    corrupt = f"AND doc_id % {C8_CORRUPT_MOD} <> 0"
    return f"""WITH RECURSIVE
c7m AS (SELECT doc_id, split, shard
        FROM ({member_oracle('c7_pretraining_pipeline')}) z),
{_audio_sig_ctes(extra_pred=f"{corrupt} {silent}")},
{ahash_pairs_ctes('sig')},
p AS MATERIALIZED (SELECT doc_a, doc_b FROM ham WHERE hamming <= 3),
edges AS (SELECT doc_a AS src, doc_b AS dst FROM p
          UNION ALL SELECT doc_b, doc_a FROM p),
reach AS (SELECT doc_id, doc_id AS n FROM sig
          UNION
          SELECT r.doc_id, e.dst FROM reach r JOIN edges e ON e.src = r.n),
keep AS (SELECT doc_id FROM (
           SELECT doc_id, min(n) AS rep FROM reach GROUP BY doc_id)
         WHERE doc_id = rep),
qual AS (SELECT s.doc_id, s.h_hi, s.h_lo, a2.spw
         FROM sig s JOIN keep USING (doc_id) JOIN a2 USING (doc_id)
         WHERE 64 * a2.spw >= {C11_MIN_SAMPLES})
SELECT q.doc_id, CAST(64 * q.spw AS BIGINT) AS n_samples, q.h_hi, q.h_lo,
       c7m.split, c7m.shard
FROM qual q JOIN c7m USING (doc_id)"""


@register(
    "c11_audio_pipeline", _c11_sql(), "EXT-01", "EXT-02", "EXT-04",
)
def c11_audio_pipeline(spark, sf_dir):
    """The composed AUDIO curation pipeline — the c9 stage skeleton on
    the audio modality, completing the composed family across every
    modality the engine decodes (c1/c2 text, c7 endgame, c8/c9 image,
    c10 video, c11 audio):

      1. decode-validity gate: every C8_CORRUPT_MOD-th WAV payload is
         corrupted (2-zero-byte prefix breaks the RIFF magic) and the
         gate IS the real chunk walk — a payload decode_wav rejects
         emits no signature;
      2. VAD silence gate: every C11_SILENT_MOD-th clip is spec-valid
         all-zero PCM; sum_sq > 0 (exact int64, riding the SAME Arrow
         pass via with_meta) drops it before any pairing cost — the
         x185 energy screen composed into a pipeline stage;
      3. perceptual dedup: the x199 tier — banded-hamming pairs over
         the energy-envelope fingerprint, CC keep-one;
      4. duration quality gate: n_samples >= 256 (drop micro-clips),
         read from the ACTUAL decoded sample count;
      5. pair with the training layout: join survivors to the c7
         split/shard manifest.

    ONE composed oracle (the shared _audio_sig_ctes closed form with the
    corruption+silence predicates, the banded-pair CTEs, the x163
    recursive CC, the spw duration form, the c7 member oracle)
    hash-checks every stage. Scale: one Arrow decode pass total
    (signature + n_samples + sum_sq share it), one 16-byte-signature
    shuffle, capped posting-list pair generation, a row-local gate, one
    doc_id equi-join — the c9 shape on audio."""
    return _c11_frames(spark, sf_dir)["result"]


#: The c11 chain frames memo — the _C9/_C10_FRAMES_CACHE pattern on the
#: audio modality (same foreign-session eviction + re-persist-on-access
#: contract): x206 consumes the full c11 chain alongside c9 and c10 in
#: one action, so without the memo the trimodal audit would rebuild the
#: audio decode + pairing — the exact x189/x187 recompute lesson.
_C11_FRAMES_CACHE: dict = {}


def _c11_frames(spark, sf_dir):
    from .operators.multimodal import (
        audio_energy_fingerprint,
    )
    from .r9_queries import _c7_result

    app = spark.sparkContext.applicationId

    def _build():
        docs = _t(spark, sf_dir, "documents")

        def _media_chain():
            mm = consistent_media_payloads(
                spark, sf_dir, kind="wav", silent_mod=C11_SILENT_MOD
            )
            corrupted = F.when(
                F.col("doc_id") % C8_CORRUPT_MOD == 0,
                F.concat(F.unhex(F.lit("0000")), F.col("payload")),
            ).otherwise(F.col("payload"))
            mmc = mm.select("doc_id", corrupted.alias("payload"))
            # gate + signature + meta in ONE Arrow pass; the VAD gate is
            # a row-local filter on the carried sum_sq
            sig = audio_energy_fingerprint(mmc, with_meta=True).filter(
                F.col("sum_sq") > 0
            )
            pairs = image_neardup_pairs(
                sig.select("doc_id", "h_hi", "h_lo")
            ).select("doc_a", "doc_b")
            keep = (
                D.dedup_keep_one(sig.select("doc_id"), pairs)
                .filter(F.col("keep"))
                .select("doc_id")
            )
            qual = sig.join(keep, "doc_id").filter(
                F.col("n_samples") >= C11_MIN_SAMPLES
            )
            return sig, qual

        # decode+CC chain vs c7 layout chain — independent until the
        # final join; overlap them (dedup.overlap, §2.6)
        (sig, qual), manifest = D.overlap(
            _media_chain,
            lambda: _c7_result(spark, sf_dir).select(
                "doc_id", "split", "shard"
            ),
        )
        result = qual.join(manifest, "doc_id").select(
            "doc_id", "n_samples", "h_hi", "h_lo", "split", "shard"
        )
        return {"sig": sig, "result": result}

    st = D.memo_get_or_build(_C11_FRAMES_CACHE, app, (app, sf_dir), _build)
    D._persist(st["sig"])
    _c7_result(spark, sf_dir)  # re-persist the embedded c7 manifest
    return st


def _c11_result(spark, sf_dir):
    """The memoized, persisted c11 survivor manifest — for multi-consumer
    rows (x206) that pair audio survivors with other modalities."""
    return D._persist(_c11_frames(spark, sf_dir)["result"])


# ---------------------------------------------------------------------------
# m12_embsetwin_suite — the s5/s6 r10 consolidation suites as ONE driver
# row (funds the c11 slot)
# ---------------------------------------------------------------------------


def _m12_sql() -> str:
    return f"""SELECT concat('5_', kind) AS kind, id1, id2, v1, v2, v3, d1,
       d2, s1
FROM ({member_oracle('s5_embcore_suite')})
UNION ALL
SELECT concat('6_', kind), id1, id2, v1, v2, v3, d1, d2, s1
FROM ({member_oracle('s6_setwindow_suite')})"""


@register(
    "m12_embsetwin_suite", _m12_sql(),
    # the union of both members' coverage ids — the no-orphans invariant
    "EXT-02", "EXT-03", "EXT-SET", "EXT-AGG", "EXT-WINDOW", "EXT-TOPK",
)
def m12_embsetwin_suite(spark, sf_dir):
    """Driver row consolidating two r10 consolidation suites (s5 =
    embedding cosine + brute kNN, s6 = the s2+w4 set/group/window
    suite-of-suites) — r12 window math: their two slots fund this row
    plus c11. Kind-namespace prefixes, member oracles embedded verbatim;
    s5/s6 and all THEIR members stay benched (frozen series
    untouched)."""
    from .registry import REGISTRY

    def widen(df, prefix):
        return df.select(
            F.concat(F.lit(prefix), F.col("kind")).alias("kind"),
            "id1", "id2", "v1", "v2", "v3", "d1", "d2", "s1",
        )

    a, b = D.overlap(  # guide §2.6: member construction overlapped
        lambda: REGISTRY["s5_embcore_suite"].fn(spark, sf_dir),
        lambda: REGISTRY["s6_setwindow_suite"].fn(spark, sf_dir),
    )
    return widen(a, "5_").unionAll(widen(b, "6_"))


# ===========================================================================
# r12 sixth wave: the audio screening sheets — x202 onset screening (the
# x182 scene-change device on the energy envelope) and x203 the
# per-source audio near-dup capacity sheet (the x197 sheet on the x199
# tier) — funded by consolidating the t3/t4 r10 consolidation suites
# into m13_joinprofile_suite.
# ===========================================================================


def _x202_sql() -> str:
    return f"""WITH {_audio_v_ctes()}
SELECT doc_id,
       CAST(list_sum(list_transform(range(1, 64), k ->
            CASE WHEN v[k + 1] * v[k + 1] > 2 * v[k] * v[k]
                 THEN 1 ELSE 0 END)) AS BIGINT) AS n_onsets,
       CAST(list_position(v, list_max(v)) - 1 AS BIGINT) AS peak_w
FROM av"""


@register(
    "x202_audio_onset_screen", _x202_sql(), "EXT-04", "EXT-ANOM", tier=1,
)
def x202_audio_onset_screen(spark, sf_dir):
    """Audio onset screening over the REAL decoded PCM (the x182
    scene-change device on the audio modality): per clip, the count of
    windows whose energy more than DOUBLES the previous window's (the
    VAD/beat-detection ratio, exact int64 — spw cancels so the oracle
    only models the 64-value envelope) and the first peak-energy window
    index. A speech/music corpus runs exactly this screen to find clips
    with structure worth keeping before paying for feature extraction.
    One Arrow pass, no shuffle."""
    from .operators.multimodal import (
        audio_onset_stats,
    )

    return audio_onset_stats(
        consistent_media_payloads(spark, sf_dir, kind="wav")
    )


def _x203_sql() -> str:
    return f"""WITH k AS (SELECT doc_id, keep
           FROM ({member_oracle('x199_audio_neardup_keep_one')}) z)
SELECT d.source, CAST(count(*) AS BIGINT) AS n_clips,
       CAST(sum(CASE WHEN k.keep THEN 1 ELSE 0 END) AS BIGINT)
           AS n_survivors,
       CAST(sum(CASE WHEN k.keep THEN 0 ELSE 1 END) AS BIGINT) AS n_dupes
FROM k JOIN documents d USING (doc_id)
GROUP BY d.source"""


@register(
    "x203_audio_neardup_source_sheet", _x203_sql(), "EXT-02", "EXT-04",
    "EXT-05", tier=1,
)
def x203_audio_neardup_source_sheet(spark, sf_dir):
    """Per-source audio NEAR-dup capacity sheet (the x170/x188/x197
    sheet family on the audio modality): clips, near-dup survivors and
    the collapse count per crawl source — what a data team reads to see
    which sources are re-encode farms before paying for audio ingest.
    One doc_id equi-join + one map-side-combined aggregate past the x199
    plan; ≤ |sources| rows out."""
    docs = _t(spark, sf_dir, "documents")
    k = x199_audio_neardup_keep_one(spark, sf_dir).select("doc_id", "keep")
    return (
        k.join(docs.select("doc_id", "source"), "doc_id")
        .groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_clips"),
            F.sum(F.col("keep").cast("long")).cast("long")
            .alias("n_survivors"),
            F.sum((~F.col("keep")).cast("long")).cast("long")
            .alias("n_dupes"),
        )
    )


# ---------------------------------------------------------------------------
# m13_joinprofile_suite — the t3/t4 r10 consolidation suites as ONE driver
# row (funds the x204 slot)
# ---------------------------------------------------------------------------


def _m13_sql() -> str:
    return f"""SELECT concat('j_', kind) AS kind, id1, id2, v1, v2, v3, d1,
       d2, s1
FROM ({member_oracle('t3_tpch_join_agg_suite')})
UNION ALL
SELECT concat('p_', kind), id1, id2, v1, v2, v3, d1, d2, s1
FROM ({member_oracle('t4_profile_scalar_suite')})"""


@register(
    "m13_joinprofile_suite", _m13_sql(),
    # the union of both members' coverage ids — the no-orphans invariant
    "EXT-JOIN", "EXT-AGG", "EXT-TOPK", "EXT-05",
)
def m13_joinprofile_suite(spark, sf_dir):
    """Driver row consolidating two r10 consolidation suites (t3 = the
    q15+t2 TPC-H join/agg suite-of-suites, t4 = text profile + scalar
    aggregates) — r12 window math: their two slots fund this row plus
    x204. Kind-namespace prefixes, member oracles embedded verbatim;
    t3/t4 and all THEIR members stay benched (frozen series
    untouched)."""
    from .registry import REGISTRY

    def widen(df, prefix):
        return df.select(
            F.concat(F.lit(prefix), F.col("kind")).alias("kind"),
            "id1", "id2", "v1", "v2", "v3", "d1", "d2", "s1",
        )

    a, b = D.overlap(  # guide §2.6: member construction overlapped
        lambda: REGISTRY["t3_tpch_join_agg_suite"].fn(spark, sf_dir),
        lambda: REGISTRY["t4_profile_scalar_suite"].fn(spark, sf_dir),
    )
    return widen(a, "j_").unionAll(widen(b, "p_"))


# ---------------------------------------------------------------------------
# x204_r12f_ops_suite — the r12 sixth-wave operators under one driver hash
# ---------------------------------------------------------------------------


def _x204_sql() -> str:
    z = "CAST(0 AS BIGINT)"
    zd = "CAST(0.0 AS DOUBLE)"
    return f"""SELECT 'ons' AS kind, doc_id AS id1, {z} AS id2,
       n_onsets AS v1, peak_w AS v2, {z} AS v3, {zd} AS d1, {zd} AS d2,
       CAST(NULL AS VARCHAR) AS s1
FROM ({member_oracle('x202_audio_onset_screen')})
UNION ALL
SELECT 'asrc', {z}, {z}, n_clips, n_survivors, n_dupes, {zd}, {zd}, source
FROM ({member_oracle('x203_audio_neardup_source_sheet')})"""


@register(
    "x204_r12f_ops_suite", _x204_sql(), "EXT-02", "EXT-04", "EXT-05",
    "EXT-ANOM",
)
def x204_r12f_ops_suite(spark, sf_dir):
    """Driver row for the r12 sixth wave — audio onset screening (x202)
    and the per-source audio near-dup sheet (x203) — union-folded into
    the shared kind-tagged suite shape (2 small members → lazy union per
    the SCALE.md composition rule)."""
    __r0, __r1 = D.overlap(  # guide §2.6
        lambda: x202_audio_onset_screen(spark, sf_dir),
        lambda: x203_audio_neardup_source_sheet(spark, sf_dir),
    )
    ons = _suite_shape(
        __r0, "ons",
        id1=F.col("doc_id"), v1=F.col("n_onsets"), v2=F.col("peak_w"),
    )
    asrc = _suite_shape(
        __r1, "asrc",
        v1=F.col("n_clips"), v2=F.col("n_survivors"), v3=F.col("n_dupes"),
        s1=F.col("source"),
    )
    return ons.unionAll(asrc)


# ===========================================================================
# r12 seventh wave: the audio ingest probe (x205 — the x45/x57/x169/x184
# incremental pattern on the envelope index) and the TRI-modal pairing
# audit (x206 — x187 extended to all three decoded payload modalities,
# funded structurally by the c9/c10/c11 manifest memos so the audit never
# rebuilds a pipeline chain) — window-funded by consolidating the d2/m2
# r9 consolidation suites into m14_sigmodal_suite.
# ===========================================================================


def _x205_sql() -> str:
    return f"""WITH {_audio_sig_ctes()},
old AS (SELECT DISTINCT h_hi, h_lo FROM sig WHERE doc_id % 10 < 8),
new AS (SELECT * FROM sig WHERE doc_id % 10 >= 8),
keepn AS (SELECT h_hi, h_lo, min(doc_id) AS doc_id FROM new GROUP BY 1, 2)
SELECT k.doc_id, (o.h_hi IS NOT NULL) AS is_dup_of_corpus
FROM keepn k LEFT JOIN old o ON k.h_hi = o.h_hi AND k.h_lo = o.h_lo"""


@register(
    "x205_incremental_audio_dedup", _x205_sql(), "EXT-01", "EXT-02",
    "EXT-04", tier=1,
)
def x205_incremental_audio_dedup(spark, sf_dir):
    """Nightly-ingest audio dedup (the x45/x57/x169/x184 incremental
    pattern on the envelope fingerprint): the new batch (doc_id%10 >= 8)
    dedups within itself (min doc_id per signature) and flags survivors
    whose envelope already exists in the corpus index (doc_id%10 < 8) —
    the check an ingest pipeline runs before admitting clips. Corpus
    side is a DISTINCT ~16-byte signature index; the probe is one
    equi-join on the two halves, broadcastable at any batch size. Oracle
    shares the _audio_sig_ctes closed form with x199."""
    if _sig_memo_off():
        from .operators.multimodal import (
            audio_energy_fingerprint,
        )

        sig = D._persist(
            audio_energy_fingerprint(
                consistent_media_payloads(spark, sf_dir, kind="wav")
            )
        )
    else:
        sig = audio_sig_frame(spark, sf_dir).select(
            "doc_id", "h_hi", "h_lo"
        )
    old = (
        sig.filter(F.col("doc_id") % 10 < 8).select("h_hi", "h_lo").distinct()
    )
    new = sig.filter(F.col("doc_id") % 10 >= 8)
    keepn = new.groupBy("h_hi", "h_lo").agg(F.min("doc_id").alias("doc_id"))
    return (
        keepn.join(
            old.withColumn("__hit", F.lit(1)), ["h_hi", "h_lo"], "left"
        )
        .select("doc_id", F.col("__hit").isNotNull().alias("is_dup_of_corpus"))
    )


def _x206_sql() -> str:
    # three pipeline chains, each MATERIALIZED (the x187 x144-lesson
    # form); the joins use explicit coalesce so the 3-way full-outer is
    # unambiguous in both engines
    return f"""WITH c9r AS MATERIALIZED (SELECT doc_id, split
            FROM ({member_oracle('c9_multimodal_lsh')}) a),
c10r AS MATERIALIZED (SELECT doc_id, split
            FROM ({member_oracle('c10_video_pipeline')}) b),
c11r AS MATERIALIZED (SELECT doc_id, split
            FROM ({member_oracle('c11_audio_pipeline')}) c),
j1 AS (SELECT coalesce(c9r.doc_id, c10r.doc_id) AS doc_id,
              coalesce(c9r.split, c10r.split) AS split,
              (c9r.doc_id IS NOT NULL) AS has_img,
              (c10r.doc_id IS NOT NULL) AS has_vid
       FROM c9r FULL OUTER JOIN c10r ON c9r.doc_id = c10r.doc_id),
j AS (SELECT coalesce(j1.split, c11r.split) AS split,
             coalesce(j1.has_img, FALSE) AS has_img,
             coalesce(j1.has_vid, FALSE) AS has_vid,
             (c11r.doc_id IS NOT NULL) AS has_aud
      FROM j1 FULL OUTER JOIN c11r ON j1.doc_id = c11r.doc_id)
SELECT split,
       CAST(sum(CASE WHEN has_img AND has_vid AND has_aud
                THEN 1 ELSE 0 END) AS BIGINT) AS n_all3,
       CAST(sum(CASE WHEN has_img AND has_vid AND NOT has_aud
                THEN 1 ELSE 0 END) AS BIGINT) AS n_img_vid,
       CAST(sum(CASE WHEN has_img AND has_aud AND NOT has_vid
                THEN 1 ELSE 0 END) AS BIGINT) AS n_img_aud,
       CAST(sum(CASE WHEN has_vid AND has_aud AND NOT has_img
                THEN 1 ELSE 0 END) AS BIGINT) AS n_vid_aud,
       CAST(sum(CASE WHEN has_img AND NOT has_vid AND NOT has_aud
                THEN 1 ELSE 0 END) AS BIGINT) AS n_img_only,
       CAST(sum(CASE WHEN has_vid AND NOT has_img AND NOT has_aud
                THEN 1 ELSE 0 END) AS BIGINT) AS n_vid_only,
       CAST(sum(CASE WHEN has_aud AND NOT has_img AND NOT has_vid
                THEN 1 ELSE 0 END) AS BIGINT) AS n_aud_only
FROM j GROUP BY split"""


@register(
    "x206_trimodal_pairs", _x206_sql(), "EXT-04", "EXT-05", tier=1,
)
def x206_trimodal_pairs(spark, sf_dir):
    """TRI-modal pairing audit (x187 extended to every decoded payload
    modality): per split, the full survivorship Venn over the c9 image,
    c10 video and c11 audio curations — n_all3 is the set a joint
    image+video+audio objective can train on; the pairwise and
    single-modality counts say where coverage falls off. All three
    pipelines place docs via the same c7 manifest, so split agrees on
    matched rows by construction. Composition: all three manifests come
    from the session memos (_c9_result/_c10_result/_c11_result — the
    x189/x187 recompute lesson applied BEFORE the audit ships, not
    after a driver flag), so the audit pays two doc_id full-outer joins
    over ≤ |survivors| narrow rows, never a pipeline rebuild; ≤ |splits|
    rows out."""
    from .r11_queries import _c9_result, _c10_result

    # three independent modality chains (BMP decode+CC / AVI decode+CC /
    # WAV decode+CC) serialize only at the shared c7 memo's key lock —
    # overlap their construction (operators/dedup.overlap, guide §2.6)
    c9r, c10r, c11r = D.overlap(
        lambda: _c9_result(spark, sf_dir),
        lambda: _c10_result(spark, sf_dir),
        lambda: _c11_result(spark, sf_dir),
    )
    c9 = c9r.select("doc_id", F.col("split").alias("s9"))
    c10 = c10r.select("doc_id", F.col("split").alias("s10"))
    c11 = c11r.select("doc_id", F.col("split").alias("s11"))
    j = (
        c9.join(c10, "doc_id", "full_outer")
        .join(c11, "doc_id", "full_outer")
        .select(
            F.coalesce("s9", "s10", "s11").alias("split"),
            F.col("s9").isNotNull().alias("has_img"),
            F.col("s10").isNotNull().alias("has_vid"),
            F.col("s11").isNotNull().alias("has_aud"),
        )
    )

    def n(label, cond):
        return F.sum(cond.cast("long")).cast("long").alias(label)

    i, v, a = F.col("has_img"), F.col("has_vid"), F.col("has_aud")
    return j.groupBy("split").agg(
        n("n_all3", i & v & a),
        n("n_img_vid", i & v & ~a),
        n("n_img_aud", i & a & ~v),
        n("n_vid_aud", v & a & ~i),
        n("n_img_only", i & ~v & ~a),
        n("n_vid_only", v & ~i & ~a),
        n("n_aud_only", a & ~i & ~v),
    )


# ---------------------------------------------------------------------------
# m14_sigmodal_suite — the d2/m2 r9 consolidation suites as ONE driver row
# (funds the x207 slot)
# ---------------------------------------------------------------------------


def _m14_sql() -> str:
    return f"""SELECT concat('d_', kind) AS kind, id1, id2, v1, v2, v3, d1,
       d2, s1
FROM ({member_oracle('d2_signature_suite')})
UNION ALL
SELECT concat('m_', kind), id1, id2, v1, v2, v3, d1, d2, s1
FROM ({member_oracle('m2_multimodal_suite')})"""


@register(
    "m14_sigmodal_suite", _m14_sql(),
    # the union of both members' coverage ids — the no-orphans invariant
    "EXT-01", "EXT-02", "EXT-04",
)
def m14_sigmodal_suite(spark, sf_dir):
    """Driver row consolidating two r9 consolidation suites (d2 =
    MinHash-LSH + SimHash signatures, m2 = multimodal header decode +
    features) — r12 window math: their two slots fund this row plus
    x207. Kind-namespace prefixes, member oracles embedded verbatim;
    d2/m2 and all THEIR members stay benched (frozen series
    untouched)."""
    from .registry import REGISTRY

    def widen(df, prefix):
        return df.select(
            F.concat(F.lit(prefix), F.col("kind")).alias("kind"),
            "id1", "id2", "v1", "v2", "v3", "d1", "d2", "s1",
        )

    a, b = D.overlap(  # guide §2.6: member construction overlapped
        lambda: REGISTRY["d2_signature_suite"].fn(spark, sf_dir),
        lambda: REGISTRY["m2_multimodal_suite"].fn(spark, sf_dir),
    )
    return widen(a, "d_").unionAll(widen(b, "m_"))


# ---------------------------------------------------------------------------
# x207_r12g_ops_suite — the r12 seventh-wave operators under one driver
# hash
# ---------------------------------------------------------------------------


def _x207_sql() -> str:
    z = "CAST(0 AS BIGINT)"
    zd = "CAST(0.0 AS DOUBLE)"
    return f"""SELECT 'ain' AS kind, doc_id AS id1, {z} AS id2,
       CAST(is_dup_of_corpus AS BIGINT) AS v1, {z} AS v2, {z} AS v3,
       {zd} AS d1, {zd} AS d2, CAST(NULL AS VARCHAR) AS s1
FROM ({member_oracle('x205_incremental_audio_dedup')})
UNION ALL
SELECT 'tri', n_all3, n_img_vid, n_img_aud, n_vid_aud, n_img_only,
       CAST(n_vid_only AS DOUBLE), CAST(n_aud_only AS DOUBLE), split
FROM ({member_oracle('x206_trimodal_pairs')})"""


@register(
    "x207_r12g_ops_suite", _x207_sql(), "EXT-01", "EXT-02", "EXT-04",
    "EXT-05",
)
def x207_r12g_ops_suite(spark, sf_dir):
    """Driver row for the r12 seventh wave — the incremental audio
    ingest probe (x205) and the tri-modal pairing audit (x206) —
    union-folded into the shared kind-tagged suite shape (2 small
    members → lazy union per the SCALE.md composition rule; x206's
    pipeline inputs come from the session memos so the union never
    rebuilds a chain)."""
    r205, r206 = D.overlap(
        lambda: x205_incremental_audio_dedup(spark, sf_dir),
        lambda: x206_trimodal_pairs(spark, sf_dir),
    )
    ain = _suite_shape(
        r205, "ain",
        id1=F.col("doc_id"), v1=F.col("is_dup_of_corpus").cast("long"),
    )
    tri = _suite_shape(
        r206, "tri",
        id1=F.col("n_all3"), id2=F.col("n_img_vid"), v1=F.col("n_img_aud"),
        v2=F.col("n_vid_aud"), v3=F.col("n_img_only"),
        d1=F.col("n_vid_only").cast("double"),
        d2=F.col("n_aud_only").cast("double"), s1=F.col("split"),
    )
    return ain.unionAll(tri)


# ===========================================================================
# r12 eighth wave: the audio DUAL-fingerprint device (the image
# aHash/dHash/x167 relationship on the envelope space) — x208 is the
# sign-of-energy-delta companion fingerprint (Haitsma & Kalker 2002's bit
# rule), x209 re-scores every envelope-banded pair with the independent
# delta distance — funded by consolidating the st3/st4 r9 streaming
# suites into m15_streaming_suite.
# ===========================================================================


def _delta_sig_sql() -> str:
    """The delta-fingerprint closed form over the shared ``av`` window
    list (spw cancels in every strict energy comparison: e_{k+1} > e_k
    ⟺ v_{k+1}² > v_k²); bit 63 pads 0 — 63 deltas over 64 windows."""

    def bit(k_plus: str, k: str) -> str:
        return f"v[{k_plus}] * v[{k_plus}] > v[{k}] * v[{k}]"

    return f"""SELECT doc_id,
       CAST(list_sum(list_transform(range(0, 32), k ->
            CASE WHEN {bit('k + 2', 'k + 1')}
                 THEN (CAST(1 AS BIGINT) << (31 - k)) ELSE 0 END))
            AS BIGINT) AS h_hi,
       CAST(list_sum(list_transform(range(32, 63), k ->
            CASE WHEN {bit('k + 2', 'k + 1')}
                 THEN (CAST(1 AS BIGINT) << (63 - k)) ELSE 0 END))
            AS BIGINT) AS h_lo
FROM av"""


def _x208_sql() -> str:
    return f"""WITH {_audio_v_ctes()}
{_delta_sig_sql()}"""


@register(
    "x208_audio_delta_fingerprint", _x208_sql(), "EXT-02", "EXT-04", tier=1,
)
def x208_audio_delta_fingerprint(spark, sf_dir):
    """Per-clip difference-fingerprint
    (:func:`operators.multimodal.audio_delta_fingerprint`): the
    sign-of-energy-delta bit rule (Haitsma & Kalker's robust audio
    fingerprint) over the same REAL decoded PCM — the independent
    companion signature to x199's envelope hash, exactly the image
    aHash/dHash pairing. Output (doc_id, h_hi, h_lo); oracle packs the
    63 strict delta comparisons from the intro-window closed form (spw
    cancels). One Arrow pass, ~16 bytes/clip."""
    if _sig_memo_off():
        from .operators.multimodal import (
            audio_delta_fingerprint,
        )

        return audio_delta_fingerprint(
            consistent_media_payloads(spark, sf_dir, kind="wav")
        )
    # d_hi/d_lo carry audio_delta_fingerprint's bits byte-identical
    return audio_sig_frame(spark, sf_dir).select(
        "doc_id", F.col("d_hi").alias("h_hi"), F.col("d_lo").alias("h_lo")
    )


def _x209_sql() -> str:
    # p and dsig each feed two references (dsig joins as both pair
    # sides) — MATERIALIZED per the x144 lesson; both signature spaces
    # share the single av window-list CTE
    return f"""WITH {_audio_sig_ctes()},
{ahash_pairs_ctes('sig')},
p AS MATERIALIZED (SELECT doc_a, doc_b, hamming AS ham_e FROM ham
                   WHERE hamming <= 3),
dsig AS MATERIALIZED ({_delta_sig_sql()})
SELECT p.doc_a, p.doc_b, p.ham_e,
       CAST(bit_count(xor(a.h_hi, b.h_hi))
            + bit_count(xor(a.h_lo, b.h_lo)) AS BIGINT) AS ham_d
FROM p JOIN dsig a ON a.doc_id = p.doc_a
       JOIN dsig b ON b.doc_id = p.doc_b"""


@register(
    "x209_audio_dualhash_pairs", _x209_sql(), "EXT-02", "EXT-04", tier=1,
)
def x209_audio_dualhash_pairs(spark, sf_dir):
    """Dual-fingerprint near-dup verification on audio (the x167 device):
    every envelope-banded candidate pair re-scored by the INDEPENDENT
    delta-fingerprint distance — (doc_a, doc_b, ham_e, ham_d). A pair
    small under BOTH fingerprints is the production-grade audio-dup
    signal (the two fail differently: the envelope hash on
    loud-relative-to-mean structure, the delta hash on local gradients);
    small under the envelope alone is the review queue. Two doc_id
    equi-joins past the x199 pair plan — no new candidate generation;
    BOTH signatures ride ONE Arrow decode pass
    (:func:`operators.multimodal.audio_dual_fingerprints` — the PCM
    decoded and the envelope computed once)."""
    if _sig_memo_off():
        from .operators.multimodal import (
            audio_dual_fingerprints,
        )

        ds = D._persist(
            audio_dual_fingerprints(
                consistent_media_payloads(spark, sf_dir, kind="wav")
            )
        )
    else:
        ds = audio_sig_frame(spark, sf_dir)
    pairs = (
        image_neardup_pairs(ds.select("doc_id", "h_hi", "h_lo"))
        if _pairs_memo_off() else audio_pairs_frame(spark, sf_dir)
    ).withColumnRenamed("hamming", "ham_e")
    a = ds.select(
        F.col("doc_id").alias("doc_a"),
        F.col("d_hi").alias("a_hi"),
        F.col("d_lo").alias("a_lo"),
    )
    b = ds.select(
        F.col("doc_id").alias("doc_b"),
        F.col("d_hi").alias("b_hi"),
        F.col("d_lo").alias("b_lo"),
    )
    ham_d = (
        F.bit_count(F.col("a_hi").bitwiseXOR(F.col("b_hi")))
        + F.bit_count(F.col("a_lo").bitwiseXOR(F.col("b_lo")))
    ).cast("long")
    return (
        pairs.join(a, "doc_a")
        .join(b, "doc_b")
        .withColumn("ham_d", ham_d)
        .select("doc_a", "doc_b", "ham_e", "ham_d")
    )


# ---------------------------------------------------------------------------
# m15_streaming_suite — the st3/st4 r9 streaming suites as ONE driver row
# (funds the x210 slot)
# ---------------------------------------------------------------------------


def _m15_sql() -> str:
    return f"""SELECT concat('w_', kind) AS kind, id1, id2, v1, v2, v3, d1,
       d2, s1
FROM ({member_oracle('st3_stream_window_suite')})
UNION ALL
SELECT concat('p_', kind), id1, id2, v1, v2, v3, d1, d2, s1
FROM ({member_oracle('st4_stream_pair_suite')})"""


@register(
    "m15_streaming_suite", _m15_sql(),
    # the union of both members' coverage ids — the no-orphans invariant
    "EXT-06", "EXT-07", "EXT-08", "EXT-09",
)
def m15_streaming_suite(spark, sf_dir):
    """Driver row consolidating the two r9 streaming consolidation
    suites (st3 = tumbling + session windows, st4 = stateful dedup +
    stream-stream join — all four members REAL availableNow Structured
    Streaming replays) — r12 window math: their two slots fund this row
    plus x210. Kind-namespace prefixes, member oracles embedded
    verbatim; st3/st4 and all THEIR members stay benched (frozen series
    untouched)."""
    from .registry import REGISTRY

    def widen(df, prefix):
        return df.select(
            F.concat(F.lit(prefix), F.col("kind")).alias("kind"),
            "id1", "id2", "v1", "v2", "v3", "d1", "d2", "s1",
        )

    a = REGISTRY["st3_stream_window_suite"].fn(spark, sf_dir)
    b = REGISTRY["st4_stream_pair_suite"].fn(spark, sf_dir)
    return widen(a, "w_").unionAll(widen(b, "p_"))


# ---------------------------------------------------------------------------
# x210_r12h_ops_suite — the r12 eighth-wave operators under one driver
# hash
# ---------------------------------------------------------------------------


def _x210_sql() -> str:
    z = "CAST(0 AS BIGINT)"
    zd = "CAST(0.0 AS DOUBLE)"
    return f"""SELECT 'adf' AS kind, doc_id AS id1, {z} AS id2, h_hi AS v1,
       h_lo AS v2, {z} AS v3, {zd} AS d1, {zd} AS d2,
       CAST(NULL AS VARCHAR) AS s1
FROM ({member_oracle('x208_audio_delta_fingerprint')})
UNION ALL
SELECT 'adp', doc_a, doc_b, ham_e, ham_d, {z}, {zd}, {zd},
       CAST(NULL AS VARCHAR)
FROM ({member_oracle('x209_audio_dualhash_pairs')})"""


@register(
    "x210_r12h_ops_suite", _x210_sql(), "EXT-02", "EXT-04",
)
def x210_r12h_ops_suite(spark, sf_dir):
    """Driver row for the r12 eighth wave — the audio delta-fingerprint
    (x208) and dual-fingerprint verified pairs (x209) — union-folded
    into the shared kind-tagged suite shape (2 small members → lazy
    union per the SCALE.md composition rule)."""
    __r0, __r1 = D.overlap(  # guide §2.6
        lambda: x208_audio_delta_fingerprint(spark, sf_dir),
        lambda: x209_audio_dualhash_pairs(spark, sf_dir),
    )
    adf = _suite_shape(
        __r0, "adf",
        id1=F.col("doc_id"), v1=F.col("h_hi"), v2=F.col("h_lo"),
    )
    adp = _suite_shape(
        __r1, "adp",
        id1=F.col("doc_a"), id2=F.col("doc_b"), v1=F.col("ham_e"),
        v2=F.col("ham_d"),
    )
    return adf.unionAll(adp)


# ===========================================================================
# r12 ninth wave: the dual-KEYFRAME video verification device — x211
# hashes each video's LAST stored frame (the second keyframe a production
# video-dedup pass samples), x212 re-scores every frame-0-banded pair
# with the independent last-frame distance (the x167/x209 device on
# video) — funded by consolidating the m3/m4 r11 suite-of-suites into
# m16_r10bcde_suite.
# ===========================================================================

#: ascii projection CTE for the last-frame chain (x211 standalone; x212
#: reuses _video_sig_ctes' identical definition instead).
_ASCII_DOCS_CTE = """ascii_docs AS (
         SELECT doc_id, regexp_replace(text, '[^ -~]', '', 'g') AS text
         FROM documents)"""


def _video_last_chain() -> str:
    """Last-stored-frame aHash closed form as a CTE chain (references an
    ``ascii_docs`` CTE the caller provides — _video_sig_ctes' byte text
    stays frozen for its three r11/r12 consumers). Frame f0 = nfe − 1
    starts at byte offset f0 with rowsL = least((n − f0) // bpr, 8)
    block rows (≥ 1 by the nfe bound: f0 ≤ n − bpr); the 8×8 nearest
    resample of the constant-block frame samples byte
    f0 + ((k//8 · rowsL) // 8) · bpr + ((k%8 · bpr) // 8)."""
    s_expr = (
        "list_transform(range(0, 64), k -> ascii(substr(text, CAST("
        "f0 + (((k // 8) * rowsL) // 8) * bpr + (((k % 8) * bpr) // 8) + 1"
        " AS INTEGER), 1)))"
    )
    return f"""lv AS (SELECT doc_id, text, bpr,
              least(2 + first % 3, greatest(n - bpr + 1, 0)) - 1 AS f0
       FROM (SELECT doc_id, text, length(text) AS n,
                    ascii(substr(text, 1, 1)) AS first,
                    2 + ascii(substr(text, 1, 1)) % 4 AS bpr
             FROM ascii_docs WHERE length(text) >= 1) b0
       WHERE n // bpr >= 1),
lv2 AS (SELECT doc_id, text, bpr, f0,
               least((length(text) - f0) // bpr, 8) AS rowsL
        FROM lv),
lsig AS MATERIALIZED (
  SELECT doc_id,
         CAST(list_sum(list_transform(range(0, 32), k ->
              CASE WHEN 64 * s[k + 1] > total
                   THEN (CAST(1 AS BIGINT) << (31 - k)) ELSE 0 END))
              AS BIGINT) AS h_hi,
         CAST(list_sum(list_transform(range(32, 64), k ->
              CASE WHEN 64 * s[k + 1] > total
                   THEN (CAST(1 AS BIGINT) << (63 - k)) ELSE 0 END))
              AS BIGINT) AS h_lo
  FROM (SELECT doc_id, s, CAST(list_sum(s) AS BIGINT) AS total
        FROM (SELECT doc_id, {s_expr} AS s FROM lv2) y) z)"""


def _x211_sql() -> str:
    return f"""WITH {_ASCII_DOCS_CTE},
{_video_last_chain()}
SELECT doc_id, h_hi, h_lo FROM lsig"""


@register(
    "x211_video_lastframe_ahash", _x211_sql(), "EXT-02", "EXT-04", tier=1,
)
def x211_video_lastframe_ahash(spark, sf_dir):
    """Per-video aHash of the LAST stored frame
    (:func:`operators.multimodal.video_keyframe_ahashes`, l columns):
    the independent second keyframe signature next to x179's frame-0
    hash — clips that share an intro card collide on frame 0 but not
    here, two re-encodes of one clip match on both. The oracle
    recomputes the signature from the fixture's constant-block closed
    form at frame nfe−1 (byte window offset f0 = nfe−1, rowsL block
    rows). One Arrow pass decoding both keyframes; ~16 bytes emitted
    per video here."""
    if _sig_memo_off():
        from .operators.multimodal import (
            video_keyframe_ahashes,
        )

        ks = video_keyframe_ahashes(
            consistent_media_payloads(spark, sf_dir)
        )
    else:
        ks = video_sig_frame(spark, sf_dir)
    return ks.select(
        "doc_id", F.col("l_hi").alias("h_hi"), F.col("l_lo").alias("h_lo")
    )


def _x212_sql() -> str:
    # p and lsig each feed two references (lsig joins as both pair
    # sides) — MATERIALIZED per the x144 lesson; the frame-0 candidate
    # side is _video_sig_ctes verbatim (x190's generator), the re-score
    # side is the last-frame chain over the SAME ascii_docs CTE
    return f"""WITH {_video_sig_ctes()},
{ahash_pairs_ctes('sig')},
p AS MATERIALIZED (SELECT doc_a, doc_b, hamming AS ham_0 FROM ham
                   WHERE hamming <= 3),
{_video_last_chain()}
SELECT p.doc_a, p.doc_b, p.ham_0,
       CAST(bit_count(xor(a.h_hi, b.h_hi))
            + bit_count(xor(a.h_lo, b.h_lo)) AS BIGINT) AS ham_z
FROM p JOIN lsig a ON a.doc_id = p.doc_a
       JOIN lsig b ON b.doc_id = p.doc_b"""


@register(
    "x212_video_dualframe_pairs", _x212_sql(), "EXT-02", "EXT-04", tier=1,
)
def x212_video_dualframe_pairs(spark, sf_dir):
    """Dual-keyframe near-dup verification on video (the x167/x209
    device): every frame-0-banded candidate pair from x190's generator
    re-scored by the INDEPENDENT last-frame signature distance —
    (doc_a, doc_b, ham_0, ham_z). Small under BOTH keyframes = the
    production video-dup signal; small on frame 0 alone = the shared-
    intro review queue. BOTH signatures ride ONE Arrow decode pass
    (:func:`operators.multimodal.video_keyframe_ahashes` — the payload
    is parsed once); past the x190 pair plan this adds only two doc_id
    equi-joins against a ~32-byte/video frame."""
    if _sig_memo_off():
        from .operators.multimodal import (
            video_keyframe_ahashes,
        )

        ks = D._persist(
            video_keyframe_ahashes(
                consistent_media_payloads(spark, sf_dir)
            )
        )
    else:
        ks = video_sig_frame(spark, sf_dir)
    pairs = (
        image_neardup_pairs(ks.select("doc_id", "h_hi", "h_lo"))
        if _pairs_memo_off() else video_pairs_frame(spark, sf_dir)
    ).withColumnRenamed("hamming", "ham_0")
    a = ks.select(
        F.col("doc_id").alias("doc_a"),
        F.col("l_hi").alias("a_hi"),
        F.col("l_lo").alias("a_lo"),
    )
    b = ks.select(
        F.col("doc_id").alias("doc_b"),
        F.col("l_hi").alias("b_hi"),
        F.col("l_lo").alias("b_lo"),
    )
    ham_z = (
        F.bit_count(F.col("a_hi").bitwiseXOR(F.col("b_hi")))
        + F.bit_count(F.col("a_lo").bitwiseXOR(F.col("b_lo")))
    ).cast("long")
    return (
        pairs.join(a, "doc_a")
        .join(b, "doc_b")
        .withColumn("ham_z", ham_z)
        .select("doc_a", "doc_b", "ham_0", "ham_z")
    )


# ---------------------------------------------------------------------------
# m16_r10bcde_suite — the m3/m4 r11 suite-of-suites as ONE driver row
# (funds the x213 slot)
# ---------------------------------------------------------------------------


def _m16_sql() -> str:
    return f"""SELECT concat('b_', kind) AS kind, id1, id2, v1, v2, v3, d1,
       d2, s1
FROM ({member_oracle('m3_r10bc_suite')})
UNION ALL
SELECT concat('d_', kind), id1, id2, v1, v2, v3, d1, d2, s1
FROM ({member_oracle('m4_r10de_suite')})"""


@register(
    "m16_r10bcde_suite", _m16_sql(),
    # the union of both members' coverage ids — the no-orphans invariant
    "EXT-02", "EXT-04", "EXT-05", "EXT-ANALYTICS",
)
def m16_r10bcde_suite(spark, sf_dir):
    """Driver row consolidating the two r11 suite-of-suites over the r10
    waves (m3 = x156+x159, m4 = x162+x165) — r12 window math: their two
    slots fund this row plus x213. Kind-namespace prefixes, member
    oracles embedded verbatim; m3/m4 and all THEIR members stay benched
    (frozen series untouched)."""
    from .registry import REGISTRY

    def widen(df, prefix):
        return df.select(
            F.concat(F.lit(prefix), F.col("kind")).alias("kind"),
            "id1", "id2", "v1", "v2", "v3", "d1", "d2", "s1",
        )

    a, b = D.overlap(  # guide §2.6: member construction overlapped
        lambda: REGISTRY["m3_r10bc_suite"].fn(spark, sf_dir),
        lambda: REGISTRY["m4_r10de_suite"].fn(spark, sf_dir),
    )
    return widen(a, "b_").unionAll(widen(b, "d_"))


# ---------------------------------------------------------------------------
# x213_r12i_ops_suite — the r12 ninth-wave operators under one driver
# hash
# ---------------------------------------------------------------------------


def _x213_sql() -> str:
    z = "CAST(0 AS BIGINT)"
    zd = "CAST(0.0 AS DOUBLE)"
    return f"""SELECT 'lfa' AS kind, doc_id AS id1, {z} AS id2, h_hi AS v1,
       h_lo AS v2, {z} AS v3, {zd} AS d1, {zd} AS d2,
       CAST(NULL AS VARCHAR) AS s1
FROM ({member_oracle('x211_video_lastframe_ahash')})
UNION ALL
SELECT 'vdp', doc_a, doc_b, ham_0, ham_z, {z}, {zd}, {zd},
       CAST(NULL AS VARCHAR)
FROM ({member_oracle('x212_video_dualframe_pairs')})"""


@register(
    "x213_r12i_ops_suite", _x213_sql(), "EXT-02", "EXT-04",
)
def x213_r12i_ops_suite(spark, sf_dir):
    """Driver row for the r12 ninth wave — the last-frame video aHash
    (x211) and dual-keyframe verified pairs (x212) — union-folded into
    the shared kind-tagged suite shape (2 small members → lazy union per
    the SCALE.md composition rule)."""
    __r0, __r1 = D.overlap(  # guide §2.6
        lambda: x211_video_lastframe_ahash(spark, sf_dir),
        lambda: x212_video_dualframe_pairs(spark, sf_dir),
    )
    lfa = _suite_shape(
        __r0, "lfa",
        id1=F.col("doc_id"), v1=F.col("h_hi"), v2=F.col("h_lo"),
    )
    vdp = _suite_shape(
        __r1, "vdp",
        id1=F.col("doc_a"), id2=F.col("doc_b"), v1=F.col("ham_0"),
        v2=F.col("ham_z"),
    )
    return lfa.unionAll(vdp)


# ===========================================================================
# r12 tenth wave: the dual-VERIFIED dedup DECISION — the x190/x199
# keep-one collapse re-run over only the pairs BOTH independent
# signatures confirm (x214 video: frame-0 banded AND last-frame ≤ 3;
# x215 audio: envelope banded AND delta ≤ 3). Completes the
# candidate → verify → decide chain the composed pipelines consume: the
# single-signature keep-one is the high-recall tier, this is the
# high-precision one. Funded by consolidating m5/m6 into m17.
# ===========================================================================


def _x214_sql() -> str:
    # p0 (frame-0 candidates) and lsig both feed two references —
    # MATERIALIZED per the x144 lesson; the CC is x190's recursive form
    # seeded from sig so singletons (and pairs the last frame REFUTES)
    # keep themselves
    return f"""WITH RECURSIVE
{_video_sig_ctes()},
{ahash_pairs_ctes('sig')},
p0 AS MATERIALIZED (SELECT doc_a, doc_b FROM ham WHERE hamming <= 3),
{_video_last_chain()},
p AS MATERIALIZED (
  SELECT p0.doc_a, p0.doc_b FROM p0
  JOIN lsig a ON a.doc_id = p0.doc_a
  JOIN lsig b ON b.doc_id = p0.doc_b
  WHERE bit_count(xor(a.h_hi, b.h_hi))
        + bit_count(xor(a.h_lo, b.h_lo)) <= 3),
edges AS (SELECT doc_a AS src, doc_b AS dst FROM p
          UNION ALL SELECT doc_b, doc_a FROM p),
reach AS (SELECT doc_id, doc_id AS n FROM sig
          UNION
          SELECT r.doc_id, e.dst FROM reach r JOIN edges e ON e.src = r.n)
SELECT doc_id, CAST(min(n) AS BIGINT) AS rep, (doc_id = min(n)) AS keep
FROM reach GROUP BY doc_id"""


@register(
    "x214_video_dualverified_keep_one", _x214_sql(), "EXT-01", "EXT-02",
    "EXT-04", tier=1,
)
def x214_video_dualverified_keep_one(spark, sf_dir):
    """Video dedup DECISION over dual-verified pairs: x190's banded
    frame-0 candidates filtered to those the INDEPENDENT last-frame
    signature also confirms (ham ≤ 3 on both keyframes), then the CC
    keep-one collapse — so a shared intro card alone can no longer
    merge two distinct clips into one survivor group. Output (doc_id,
    rep, keep); docs whose candidate pairs the last frame refutes stay
    their own representatives. Scale: the x190 pair plan + two doc_id
    equi-joins against the ~32-byte/video keyframe frame; the CC pays
    only for videos with CONFIRMED edges (strictly fewer than x190's).
    One Arrow decode pass for both signatures
    (:func:`operators.multimodal.video_keyframe_ahashes`)."""
    if _sig_memo_off():
        from .operators.multimodal import (
            video_keyframe_ahashes,
        )

        ks = D._persist(
            video_keyframe_ahashes(
                consistent_media_payloads(spark, sf_dir)
            )
        )
    else:
        ks = video_sig_frame(spark, sf_dir)
    pairs = (
        image_neardup_pairs(ks.select("doc_id", "h_hi", "h_lo"))
        if _pairs_memo_off() else video_pairs_frame(spark, sf_dir)
    ).select("doc_a", "doc_b")
    a = ks.select(
        F.col("doc_id").alias("doc_a"),
        F.col("l_hi").alias("a_hi"),
        F.col("l_lo").alias("a_lo"),
    )
    b = ks.select(
        F.col("doc_id").alias("doc_b"),
        F.col("l_hi").alias("b_hi"),
        F.col("l_lo").alias("b_lo"),
    )
    ham_z = (
        F.bit_count(F.col("a_hi").bitwiseXOR(F.col("b_hi")))
        + F.bit_count(F.col("a_lo").bitwiseXOR(F.col("b_lo")))
    ).cast("long")
    confirmed = (
        pairs.join(a, "doc_a")
        .join(b, "doc_b")
        .where(ham_z <= F.lit(3))
        .select("doc_a", "doc_b")
    )
    return D.dedup_keep_one(ks.select("doc_id"), confirmed)


def _x215_sql() -> str:
    # the x214 form on the audio signature space: envelope-banded
    # candidates confirmed by the delta fingerprint, then CC keep-one
    return f"""WITH RECURSIVE
{_audio_sig_ctes()},
{ahash_pairs_ctes('sig')},
p0 AS MATERIALIZED (SELECT doc_a, doc_b FROM ham WHERE hamming <= 3),
dsig AS MATERIALIZED ({_delta_sig_sql()}),
p AS MATERIALIZED (
  SELECT p0.doc_a, p0.doc_b FROM p0
  JOIN dsig a ON a.doc_id = p0.doc_a
  JOIN dsig b ON b.doc_id = p0.doc_b
  WHERE bit_count(xor(a.h_hi, b.h_hi))
        + bit_count(xor(a.h_lo, b.h_lo)) <= 3),
edges AS (SELECT doc_a AS src, doc_b AS dst FROM p
          UNION ALL SELECT doc_b, doc_a FROM p),
reach AS (SELECT doc_id, doc_id AS n FROM sig
          UNION
          SELECT r.doc_id, e.dst FROM reach r JOIN edges e ON e.src = r.n)
SELECT doc_id, CAST(min(n) AS BIGINT) AS rep, (doc_id = min(n)) AS keep
FROM reach GROUP BY doc_id"""


@register(
    "x215_audio_dualverified_keep_one", _x215_sql(), "EXT-01", "EXT-02",
    "EXT-04", tier=1,
)
def x215_audio_dualverified_keep_one(spark, sf_dir):
    """Audio dedup DECISION over dual-verified pairs — the x214 device
    on the audio modality: x199's envelope-banded candidates filtered
    to those the INDEPENDENT delta fingerprint also confirms (ham ≤ 3
    on both bit rules), then the CC keep-one collapse. Output (doc_id,
    rep, keep). Both fingerprints ride ONE Arrow decode pass
    (:func:`operators.multimodal.audio_dual_fingerprints`); past the
    x199 pair plan this adds two doc_id equi-joins and the CC pays only
    for clips with CONFIRMED edges."""
    if _sig_memo_off():
        from .operators.multimodal import (
            audio_dual_fingerprints,
        )

        ds = D._persist(
            audio_dual_fingerprints(
                consistent_media_payloads(spark, sf_dir, kind="wav")
            )
        )
    else:
        ds = audio_sig_frame(spark, sf_dir)
    pairs = (
        image_neardup_pairs(ds.select("doc_id", "h_hi", "h_lo"))
        if _pairs_memo_off() else audio_pairs_frame(spark, sf_dir)
    ).select("doc_a", "doc_b")
    a = ds.select(
        F.col("doc_id").alias("doc_a"),
        F.col("d_hi").alias("a_hi"),
        F.col("d_lo").alias("a_lo"),
    )
    b = ds.select(
        F.col("doc_id").alias("doc_b"),
        F.col("d_hi").alias("b_hi"),
        F.col("d_lo").alias("b_lo"),
    )
    ham_d = (
        F.bit_count(F.col("a_hi").bitwiseXOR(F.col("b_hi")))
        + F.bit_count(F.col("a_lo").bitwiseXOR(F.col("b_lo")))
    ).cast("long")
    confirmed = (
        pairs.join(a, "doc_a")
        .join(b, "doc_b")
        .where(ham_d <= F.lit(3))
        .select("doc_a", "doc_b")
    )
    return D.dedup_keep_one(ds.select("doc_id"), confirmed)


# ---------------------------------------------------------------------------
# m17_r10fg9bc_suite — the m5/m6 r11 suite-of-suites as ONE driver row
# (funds the x216 slot)
# ---------------------------------------------------------------------------


def _m17_sql() -> str:
    return f"""SELECT concat('f_', kind) AS kind, id1, id2, v1, v2, v3, d1,
       d2, s1
FROM ({member_oracle('m5_r10fg_suite')})
UNION ALL
SELECT concat('n_', kind), id1, id2, v1, v2, v3, d1, d2, s1
FROM ({member_oracle('m6_r9bc_suite')})"""


@register(
    "m17_r10fg9bc_suite", _m17_sql(),
    # the union of both members' coverage ids — the no-orphans invariant
    "EXT-01", "EXT-02", "EXT-04", "EXT-05",
)
def m17_r10fg9bc_suite(spark, sf_dir):
    """Driver row consolidating the two r11 suite-of-suites (m5 =
    x168+x171, m6 = x145+x148) — r12 window math: their two slots fund
    this row plus x216. Kind-namespace prefixes, member oracles embedded
    verbatim; m5/m6 and all THEIR members stay benched (frozen series
    untouched)."""
    from .registry import REGISTRY

    def widen(df, prefix):
        return df.select(
            F.concat(F.lit(prefix), F.col("kind")).alias("kind"),
            "id1", "id2", "v1", "v2", "v3", "d1", "d2", "s1",
        )

    a, b = D.overlap(  # guide §2.6: member construction overlapped
        lambda: REGISTRY["m5_r10fg_suite"].fn(spark, sf_dir),
        lambda: REGISTRY["m6_r9bc_suite"].fn(spark, sf_dir),
    )
    return widen(a, "f_").unionAll(widen(b, "n_"))


# ---------------------------------------------------------------------------
# x216_r12j_ops_suite — the r12 tenth-wave operators under one driver
# hash
# ---------------------------------------------------------------------------


def _x216_sql() -> str:
    z = "CAST(0 AS BIGINT)"
    zd = "CAST(0.0 AS DOUBLE)"
    return f"""SELECT 'vdk' AS kind, doc_id AS id1, rep AS id2,
       CAST(keep AS BIGINT) AS v1, {z} AS v2, {z} AS v3, {zd} AS d1,
       {zd} AS d2, CAST(NULL AS VARCHAR) AS s1
FROM ({member_oracle('x214_video_dualverified_keep_one')})
UNION ALL
SELECT 'adk', doc_id, rep, CAST(keep AS BIGINT), {z}, {z}, {zd}, {zd},
       CAST(NULL AS VARCHAR)
FROM ({member_oracle('x215_audio_dualverified_keep_one')})"""


@register(
    "x216_r12j_ops_suite", _x216_sql(), "EXT-01", "EXT-02", "EXT-04",
)
def x216_r12j_ops_suite(spark, sf_dir):
    """Driver row for the r12 tenth wave — the dual-verified video
    (x214) and audio (x215) dedup decisions — union-folded into the
    shared kind-tagged suite shape (2 small members → lazy union per the
    SCALE.md composition rule)."""
    r214, r215 = D.overlap(
        lambda: x214_video_dualverified_keep_one(spark, sf_dir),
        lambda: x215_audio_dualverified_keep_one(spark, sf_dir),
    )
    vdk = _suite_shape(
        r214, "vdk",
        id1=F.col("doc_id"), id2=F.col("rep"),
        v1=F.col("keep").cast("long"),
    )
    adk = _suite_shape(
        r215, "adk",
        id1=F.col("doc_id"), id2=F.col("rep"),
        v1=F.col("keep").cast("long"),
    )
    return vdk.unionAll(adk)


# ===========================================================================
# r12 eleventh wave: the composed pipelines upgraded to the dual-verified
# dedup tier — c12 is c10 with its exact frame-0 grouping swapped for the
# x214 dual-keyframe decision, c13 is c11 with its envelope-only CC
# swapped for the x215 dual-fingerprint decision (the c9 'perceptual
# tier swap' proof, now at the VERIFY level on both remaining
# modalities). Funded by consolidating m7/m8 into m18.
# ===========================================================================


def _c12_sql() -> str:
    corrupt = f"AND doc_id % {C8_CORRUPT_MOD} <> 0"
    return f"""WITH RECURSIVE
c7m AS (SELECT doc_id, split, shard
        FROM ({member_oracle('c7_pretraining_pipeline')}) z),
{_video_sig_ctes(extra_pred=corrupt)},
{ahash_pairs_ctes('sig')},
p0 AS MATERIALIZED (SELECT doc_a, doc_b FROM ham WHERE hamming <= 3),
{_video_last_chain()},
p AS MATERIALIZED (
  SELECT p0.doc_a, p0.doc_b FROM p0
  JOIN lsig a ON a.doc_id = p0.doc_a
  JOIN lsig b ON b.doc_id = p0.doc_b
  WHERE bit_count(xor(a.h_hi, b.h_hi))
        + bit_count(xor(a.h_lo, b.h_lo)) <= 3),
edges AS (SELECT doc_a AS src, doc_b AS dst FROM p
          UNION ALL SELECT doc_b, doc_a FROM p),
reach AS (SELECT doc_id, doc_id AS n FROM sig
          UNION
          SELECT r.doc_id, e.dst FROM reach r JOIN edges e ON e.src = r.n),
keep AS (SELECT doc_id FROM (
           SELECT doc_id, min(n) AS rep FROM reach GROUP BY doc_id)
         WHERE doc_id = rep),
qual AS (SELECT s.doc_id, s.h_hi, s.h_lo, v2.nfe
         FROM sig s JOIN keep USING (doc_id) JOIN v2 USING (doc_id)
         WHERE v2.nfe >= {C10_MIN_FRAMES})
SELECT q.doc_id, CAST(q.nfe AS BIGINT) AS n_frames, q.h_hi, q.h_lo,
       c7m.split, c7m.shard
FROM qual q JOIN c7m USING (doc_id)"""


@register(
    "c12_video_dual_pipeline", _c12_sql(), "EXT-01", "EXT-02", "EXT-04",
    tier=1,
)
def c12_video_dual_pipeline(spark, sf_dir):
    """The composed VIDEO curation pipeline on the DUAL-VERIFIED dedup
    tier — c10's stage skeleton (decode-validity gate → dedup →
    duration gate → c7 pairing) with stage 2 swapped from exact frame-0
    grouping to the x214 decision: banded frame-0 candidates confirmed
    by the last-frame signature, then CC keep-one — the c9 tier-swap
    proof applied at the VERIFY level. Signature pair AND stored-frame
    count ride ONE Arrow pass (video_keyframe_ahashes with_meta=True).
    ONE composed oracle (the corruption-gated sig closed form, the
    banded pair CTEs, the last-frame confirm join, the recursive CC,
    the nfe duration form, the c7 member oracle) hash-checks every
    stage. Scale: one Arrow decode pass, one ~32-byte-signature
    shuffle, capped posting-list pairs, two doc_id equi-joins for the
    confirm step, a row-local gate, one doc_id equi-join to the
    layout."""
    from .operators.multimodal import (
        video_keyframe_ahashes,
    )
    from .r9_queries import _c7_result

    docs = _t(spark, sf_dir, "documents")

    def _media_chain():
        mm = consistent_media_payloads(spark, sf_dir)
        corrupted = F.when(
            F.col("doc_id") % C8_CORRUPT_MOD == 0,
            F.concat(F.unhex(F.lit("0000")), F.col("payload")),
        ).otherwise(F.col("payload"))
        mmc = mm.select("doc_id", corrupted.alias("payload"))
        # persist_now: c12's corruption-gated decode is its own frame (NOT
        # the shared sig memo — different payload input); materialize it
        # eagerly so the downstream broadcast builds read the cache
        ks = D.persist_now(video_keyframe_ahashes(mmc, with_meta=True))
        pairs = image_neardup_pairs(ks.select("doc_id", "h_hi", "h_lo"))
        a = ks.select(
            F.col("doc_id").alias("doc_a"),
            F.col("l_hi").alias("a_hi"),
            F.col("l_lo").alias("a_lo"),
        )
        b = ks.select(
            F.col("doc_id").alias("doc_b"),
            F.col("l_hi").alias("b_hi"),
            F.col("l_lo").alias("b_lo"),
        )
        ham_z = (
            F.bit_count(F.col("a_hi").bitwiseXOR(F.col("b_hi")))
            + F.bit_count(F.col("a_lo").bitwiseXOR(F.col("b_lo")))
        ).cast("long")
        confirmed = (
            pairs.join(a, "doc_a")
            .join(b, "doc_b")
            .where(ham_z <= F.lit(3))
            .select("doc_a", "doc_b")
        )
        keep = (
            D.dedup_keep_one(ks.select("doc_id"), confirmed)
            .filter(F.col("keep"))
            .select("doc_id")
        )
        return ks.join(keep, "doc_id").filter(
            F.col("n_frames") >= C10_MIN_FRAMES
        )

    # the decode+confirm+CC chain and the c7 layout chain are independent
    # until the final join — overlap them (operators/dedup.overlap, §2.6)
    qual, manifest = D.overlap(
        _media_chain,
        lambda: _c7_result(spark, sf_dir).select("doc_id", "split", "shard"),
    )
    return qual.join(manifest, "doc_id").select(
        "doc_id", "n_frames", "h_hi", "h_lo", "split", "shard"
    )


def _c13_sql() -> str:
    silent = f"AND doc_id % {C11_SILENT_MOD} <> 0"
    corrupt = f"AND doc_id % {C8_CORRUPT_MOD} <> 0"
    return f"""WITH RECURSIVE
c7m AS (SELECT doc_id, split, shard
        FROM ({member_oracle('c7_pretraining_pipeline')}) z),
{_audio_sig_ctes(extra_pred=f"{corrupt} {silent}")},
{ahash_pairs_ctes('sig')},
p0 AS MATERIALIZED (SELECT doc_a, doc_b FROM ham WHERE hamming <= 3),
dsig AS MATERIALIZED ({_delta_sig_sql()}),
p AS MATERIALIZED (
  SELECT p0.doc_a, p0.doc_b FROM p0
  JOIN dsig a ON a.doc_id = p0.doc_a
  JOIN dsig b ON b.doc_id = p0.doc_b
  WHERE bit_count(xor(a.h_hi, b.h_hi))
        + bit_count(xor(a.h_lo, b.h_lo)) <= 3),
edges AS (SELECT doc_a AS src, doc_b AS dst FROM p
          UNION ALL SELECT doc_b, doc_a FROM p),
reach AS (SELECT doc_id, doc_id AS n FROM sig
          UNION
          SELECT r.doc_id, e.dst FROM reach r JOIN edges e ON e.src = r.n),
keep AS (SELECT doc_id FROM (
           SELECT doc_id, min(n) AS rep FROM reach GROUP BY doc_id)
         WHERE doc_id = rep),
qual AS (SELECT s.doc_id, s.h_hi, s.h_lo, a2.spw
         FROM sig s JOIN keep USING (doc_id) JOIN a2 USING (doc_id)
         WHERE 64 * a2.spw >= {C11_MIN_SAMPLES})
SELECT q.doc_id, CAST(64 * q.spw AS BIGINT) AS n_samples, q.h_hi, q.h_lo,
       c7m.split, c7m.shard
FROM qual q JOIN c7m USING (doc_id)"""


@register(
    "c13_audio_dual_pipeline", _c13_sql(), "EXT-01", "EXT-02", "EXT-04",
    tier=1,
)
def c13_audio_dual_pipeline(spark, sf_dir):
    """The composed AUDIO curation pipeline on the DUAL-VERIFIED dedup
    tier — c11's stage skeleton (decode gate → VAD silence gate →
    dedup → duration gate → c7 pairing) with stage 3 swapped from the
    envelope-only CC to the x215 decision: envelope-banded candidates
    confirmed by the delta fingerprint, then CC keep-one. BOTH bit
    rules AND the VAD/duration meta ride ONE Arrow pass
    (audio_dual_fingerprints with_meta=True). ONE composed oracle
    (the corruption+silence-gated closed form, the pair CTEs, the
    delta confirm join, the recursive CC, the spw duration form, the
    c7 member oracle) hash-checks every stage."""
    from .operators.multimodal import (
        audio_dual_fingerprints,
    )
    from .r9_queries import _c7_result

    docs = _t(spark, sf_dir, "documents")

    def _media_chain():
        mm = consistent_media_payloads(
            spark, sf_dir, kind="wav", silent_mod=C11_SILENT_MOD
        )
        corrupted = F.when(
            F.col("doc_id") % C8_CORRUPT_MOD == 0,
            F.concat(F.unhex(F.lit("0000")), F.col("payload")),
        ).otherwise(F.col("payload"))
        mmc = mm.select("doc_id", corrupted.alias("payload"))
        # gate + both signatures + meta in ONE Arrow pass; the VAD gate is
        # a row-local filter on the carried sum_sq
        # persist_now — the c12 rationale on the audio modality
        ds = D.persist_now(
            audio_dual_fingerprints(mmc, with_meta=True).filter(
                F.col("sum_sq") > 0
            )
        )
        pairs = image_neardup_pairs(ds.select("doc_id", "h_hi", "h_lo"))
        a = ds.select(
            F.col("doc_id").alias("doc_a"),
            F.col("d_hi").alias("a_hi"),
            F.col("d_lo").alias("a_lo"),
        )
        b = ds.select(
            F.col("doc_id").alias("doc_b"),
            F.col("d_hi").alias("b_hi"),
            F.col("d_lo").alias("b_lo"),
        )
        ham_d = (
            F.bit_count(F.col("a_hi").bitwiseXOR(F.col("b_hi")))
            + F.bit_count(F.col("a_lo").bitwiseXOR(F.col("b_lo")))
        ).cast("long")
        confirmed = (
            pairs.join(a, "doc_a")
            .join(b, "doc_b")
            .where(ham_d <= F.lit(3))
            .select("doc_a", "doc_b")
        )
        keep = (
            D.dedup_keep_one(ds.select("doc_id"), confirmed)
            .filter(F.col("keep"))
            .select("doc_id")
        )
        return ds.join(keep, "doc_id").filter(
            F.col("n_samples") >= C11_MIN_SAMPLES
        )

    # the decode+confirm+CC chain and the c7 layout chain are independent
    # until the final join — overlap them (operators/dedup.overlap, §2.6)
    qual, manifest = D.overlap(
        _media_chain,
        lambda: _c7_result(spark, sf_dir).select("doc_id", "split", "shard"),
    )
    return qual.join(manifest, "doc_id").select(
        "doc_id", "n_samples", "h_hi", "h_lo", "split", "shard"
    )


# ---------------------------------------------------------------------------
# m18_r9d10h11bc_suite — the m7/m8 suite-of-suites as ONE driver row
# (funds the x217 slot)
# ---------------------------------------------------------------------------


def _m18_sql() -> str:
    return f"""SELECT concat('p_', kind) AS kind, id1, id2, v1, v2, v3, d1,
       d2, s1
FROM ({member_oracle('m7_r9d10h_suite')})
UNION ALL
SELECT concat('v_', kind), id1, id2, v1, v2, v3, d1, d2, s1
FROM ({member_oracle('m8_r11bc_suite')})"""


@register(
    "m18_r9d10h11bc_suite", _m18_sql(),
    # the union of both members' coverage ids — the no-orphans invariant
    "EXT-01", "EXT-02", "EXT-04", "EXT-05", "EXT-ANALYTICS", "EXT-ANOM",
)
def m18_r9d10h11bc_suite(spark, sf_dir):
    """Driver row consolidating m7 (x151+x174) and m8 (x177+x180) —
    r12 window math: their two slots fund this row plus x217.
    Kind-namespace prefixes, member oracles embedded verbatim; m7/m8
    and all THEIR members stay benched (frozen series untouched)."""
    from .registry import REGISTRY

    def widen(df, prefix):
        return df.select(
            F.concat(F.lit(prefix), F.col("kind")).alias("kind"),
            "id1", "id2", "v1", "v2", "v3", "d1", "d2", "s1",
        )

    a, b = D.overlap(  # guide §2.6: member construction overlapped
        lambda: REGISTRY["m7_r9d10h_suite"].fn(spark, sf_dir),
        lambda: REGISTRY["m8_r11bc_suite"].fn(spark, sf_dir),
    )
    return widen(a, "p_").unionAll(widen(b, "v_"))


# ---------------------------------------------------------------------------
# x217_r12k_ops_suite — the r12 eleventh-wave pipelines under one driver
# hash
# ---------------------------------------------------------------------------


def _x217_sql() -> str:
    zd = "CAST(0.0 AS DOUBLE)"
    return f"""SELECT 'c12' AS kind, doc_id AS id1, shard AS id2,
       h_hi AS v1, h_lo AS v2, n_frames AS v3, {zd} AS d1, {zd} AS d2,
       split AS s1
FROM ({member_oracle('c12_video_dual_pipeline')})
UNION ALL
SELECT 'c13', doc_id, shard, h_hi, h_lo, n_samples, {zd}, {zd}, split
FROM ({member_oracle('c13_audio_dual_pipeline')})"""


@register(
    "x217_r12k_ops_suite", _x217_sql(), "EXT-01", "EXT-02", "EXT-04",
)
def x217_r12k_ops_suite(spark, sf_dir):
    """Driver row for the r12 eleventh wave — the dual-verified video
    (c12) and audio (c13) composed curation pipelines — union-folded
    into the shared kind-tagged suite shape (2 members → lazy union per
    the SCALE.md composition rule; the embedded c7 manifest comes from
    the session memo so the union builds it once)."""
    r12v, r13a = D.overlap(
        lambda: c12_video_dual_pipeline(spark, sf_dir),
        lambda: c13_audio_dual_pipeline(spark, sf_dir),
    )
    c12 = _suite_shape(
        r12v, "c12",
        id1=F.col("doc_id"), id2=F.col("shard"), v1=F.col("h_hi"),
        v2=F.col("h_lo"), v3=F.col("n_frames"), s1=F.col("split"),
    )
    c13 = _suite_shape(
        r13a, "c13",
        id1=F.col("doc_id"), id2=F.col("shard"), v1=F.col("h_hi"),
        v2=F.col("h_lo"), v3=F.col("n_samples"), s1=F.col("split"),
    )
    return c12.unionAll(c13)


# ===========================================================================
# r12 twelfth wave: the dual-vs-single capacity sheets — per crawl
# source, how many clips does the VERIFIED tier keep that the single-
# signature tier would have collapsed (video: dual confirms fewer edges
# so survivors grow; the sheet quantifies the overmerge protection per
# source). Funded by consolidating m9/m10 into m19.
# ===========================================================================


def _dual_sheet_sql(single: str, dual: str, n_col: str) -> str:
    """Shared oracle form: both keep-one member oracles joined per doc,
    aggregated per source — n_protected = dual survivors the single
    tier collapsed (≥ 0 by the edge-subset refinement)."""
    return f"""WITH ks AS (SELECT doc_id, keep
           FROM ({member_oracle(single)}) z),
kd AS (SELECT doc_id, keep
           FROM ({member_oracle(dual)}) z)
SELECT d.source, CAST(count(*) AS BIGINT) AS {n_col},
       CAST(sum(CASE WHEN ks.keep THEN 1 ELSE 0 END) AS BIGINT)
           AS n_survivors_single,
       CAST(sum(CASE WHEN kd.keep THEN 1 ELSE 0 END) AS BIGINT)
           AS n_survivors_dual,
       CAST(sum(CASE WHEN kd.keep AND NOT ks.keep THEN 1 ELSE 0 END)
            AS BIGINT) AS n_protected
FROM ks JOIN kd USING (doc_id) JOIN documents d USING (doc_id)
GROUP BY d.source"""


def _dual_sheet(spark, sf_dir, single_fn, dual_fn, n_col: str):
    docs = _t(spark, sf_dir, "documents")
    # the two keep-one tiers share the sig/pairs memo frames (built once
    # under their key locks) but run independent CC convergence loops —
    # overlap their construction so the loops' scheduler-bound rounds
    # back-fill each other (operators/dedup.overlap, guide §2.6)
    ks_raw, kd_raw = D.overlap(
        lambda: single_fn(spark, sf_dir),
        lambda: dual_fn(spark, sf_dir),
    )
    ks = ks_raw.select("doc_id", F.col("keep").alias("keep_s"))
    kd = kd_raw.select("doc_id", F.col("keep").alias("keep_d"))
    return (
        ks.join(kd, "doc_id")
        .join(docs.select("doc_id", "source"), "doc_id")
        .groupBy("source")
        .agg(
            F.count("*").cast("long").alias(n_col),
            F.sum(F.col("keep_s").cast("long")).cast("long")
            .alias("n_survivors_single"),
            F.sum(F.col("keep_d").cast("long")).cast("long")
            .alias("n_survivors_dual"),
            F.sum((F.col("keep_d") & ~F.col("keep_s")).cast("long"))
            .cast("long").alias("n_protected"),
        )
    )


@register(
    "x218_video_dual_source_sheet",
    _dual_sheet_sql(
        "x190_video_neardup_keep_one", "x214_video_dualverified_keep_one",
        "n_videos",
    ),
    "EXT-02", "EXT-04", "EXT-05", tier=1,
)
def x218_video_dual_source_sheet(spark, sf_dir):
    """Per-source dual-vs-single video dedup sheet (the x197 sheet over
    BOTH tiers at once): videos, single-tier survivors, dual-verified
    survivors and n_protected — the clips per crawl source that frame-0
    banding alone would have merged away but the last-frame confirm
    kept. The number a data team reads to decide whether a source needs
    the verification tier (intro-card-heavy channels show high
    n_protected). Two doc_id equi-joins + one map-side-combined
    aggregate past the member plans; ≤ |sources| rows out."""
    return _dual_sheet(
        spark, sf_dir, x190_video_neardup_keep_one,
        x214_video_dualverified_keep_one, "n_videos",
    )


@register(
    "x219_audio_dual_source_sheet",
    _dual_sheet_sql(
        "x199_audio_neardup_keep_one", "x215_audio_dualverified_keep_one",
        "n_clips",
    ),
    "EXT-02", "EXT-04", "EXT-05", tier=1,
)
def x219_audio_dual_source_sheet(spark, sf_dir):
    """Per-source dual-vs-single audio dedup sheet — the x218 device on
    the audio modality (x199 envelope tier vs x215 delta-confirmed
    tier). Same plan shape: two doc_id equi-joins + one
    map-side-combined aggregate; ≤ |sources| rows out."""
    return _dual_sheet(
        spark, sf_dir, x199_audio_neardup_keep_one,
        x215_audio_dualverified_keep_one, "n_clips",
    )


# ---------------------------------------------------------------------------
# m19_r8ab11de_suite — the m9/m10 suite-of-suites as ONE driver row
# (funds the x220 slot)
# ---------------------------------------------------------------------------


def _m19_sql() -> str:
    return f"""SELECT concat('d_', kind) AS kind, id1, id2, v1, v2, v3, d1,
       d2, s1
FROM ({member_oracle('m9_r11de_suite')})
UNION ALL
SELECT concat('a_', kind), id1, id2, v1, v2, v3, d1, d2, s1
FROM ({member_oracle('m10_r8ab_suite')})"""


@register(
    "m19_r8ab11de_suite", _m19_sql(),
    # the union of both members' coverage ids — the no-orphans invariant
    "EXT-01", "EXT-02", "EXT-04", "EXT-05", "EXT-GRAPH", "EXT-ANOM",
    "EXT-AUDIT", "EXT-ANALYTICS", "EXT-AGG",
)
def m19_r8ab11de_suite(spark, sf_dir):
    """Driver row consolidating m9 (x183+x186) and m10 (x128+x133) —
    r12 window math: their two slots fund this row plus x220.
    Kind-namespace prefixes, member oracles embedded verbatim; m9/m10
    and all THEIR members stay benched (frozen series untouched)."""
    from .registry import REGISTRY

    def widen(df, prefix):
        return df.select(
            F.concat(F.lit(prefix), F.col("kind")).alias("kind"),
            "id1", "id2", "v1", "v2", "v3", "d1", "d2", "s1",
        )

    a, b = D.overlap(  # guide §2.6: member construction overlapped
        lambda: REGISTRY["m9_r11de_suite"].fn(spark, sf_dir),
        lambda: REGISTRY["m10_r8ab_suite"].fn(spark, sf_dir),
    )
    return widen(a, "d_").unionAll(widen(b, "a_"))


# ---------------------------------------------------------------------------
# x220_r12l_ops_suite — the r12 twelfth-wave operators under one driver
# hash
# ---------------------------------------------------------------------------


def _x220_sql() -> str:
    z = "CAST(0 AS BIGINT)"
    zd = "CAST(0.0 AS DOUBLE)"
    return f"""SELECT 'vds' AS kind, n_videos AS id1, {z} AS id2,
       n_survivors_single AS v1, n_survivors_dual AS v2,
       n_protected AS v3, {zd} AS d1, {zd} AS d2, source AS s1
FROM ({member_oracle('x218_video_dual_source_sheet')})
UNION ALL
SELECT 'ads', n_clips, {z}, n_survivors_single, n_survivors_dual,
       n_protected, {zd}, {zd}, source
FROM ({member_oracle('x219_audio_dual_source_sheet')})"""


@register(
    "x220_r12l_ops_suite", _x220_sql(), "EXT-02", "EXT-04", "EXT-05",
)
def x220_r12l_ops_suite(spark, sf_dir):
    """Driver row for the r12 twelfth wave — the dual-vs-single
    capacity sheets on video (x218) and audio (x219) — union-folded
    into the shared kind-tagged suite shape (2 small members → lazy
    union per the SCALE.md composition rule)."""
    r218, r219 = D.overlap(
        lambda: x218_video_dual_source_sheet(spark, sf_dir),
        lambda: x219_audio_dual_source_sheet(spark, sf_dir),
    )
    vds = _suite_shape(
        r218, "vds",
        id1=F.col("n_videos"), v1=F.col("n_survivors_single"),
        v2=F.col("n_survivors_dual"), v3=F.col("n_protected"),
        s1=F.col("source"),
    )
    ads = _suite_shape(
        r219, "ads",
        id1=F.col("n_clips"), v1=F.col("n_survivors_single"),
        v2=F.col("n_survivors_dual"), v3=F.col("n_protected"),
        s1=F.col("source"),
    )
    return vds.unionAll(ads)
