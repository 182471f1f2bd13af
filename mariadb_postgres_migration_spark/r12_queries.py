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

Registration/oracle conventions follow r7-r11_queries: every standalone
here is tier 1, every one is also driver-verified same-round, and suite
oracles compose the members' SQL via member_oracle() so member edits
can't drift.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from . import r11_queries  # noqa: F401  (m8 composes x177/x180 oracles)
from .extension_queries import _suite_shape
from .operators import dedup as D
from .operators.multimodal import ahash_pairs_ctes, image_neardup_pairs
from .r11_queries import _video_sig_ctes
from .registry import _t, member_oracle, register

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
    from .operators.multimodal import (
        attach_consistent_avi_payload,
        video_frame_ahash,
    )

    sig = D._persist(
        video_frame_ahash(
            attach_consistent_avi_payload(_t(spark, sf_dir, "documents"))
        )
    )
    pairs = image_neardup_pairs(sig).select("doc_a", "doc_b")
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
    from .operators.multimodal import (
        attach_consistent_avi_payload,
        video_frame_ahash,
    )

    sig = D._persist(
        video_frame_ahash(
            attach_consistent_avi_payload(_t(spark, sf_dir, "documents"))
        )
    )
    banded = image_neardup_pairs(sig).select(
        "doc_a", "doc_b", F.lit(1).alias("__b")
    )
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

    b = REGISTRY["x177_r11b_ops_suite"].fn(spark, sf_dir)
    c = REGISTRY["x180_r11c_ops_suite"].fn(spark, sf_dir)
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
    vnd = _suite_shape(
        x190_video_neardup_keep_one(spark, sf_dir), "vnd",
        id1=F.col("doc_id"), id2=F.col("rep"),
        v1=F.col("keep").cast("long"),
    )
    vrc = _suite_shape(
        x191_video_neardup_recall(spark, sf_dir), "vrc",
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

    d = REGISTRY["x183_r11d_ops_suite"].fn(spark, sf_dir)
    e = REGISTRY["x186_r11e_ops_suite"].fn(spark, sf_dir)
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
    ppx = _suite_shape(
        x193_progressive_pixel_stats(spark, sf_dir), "ppx",
        id1=F.col("doc_id"), v1=F.col("width"), v2=F.col("height"),
        v3=F.col("px_sum"), d1=F.col("px_min").cast("double"),
        d2=F.col("px_max").cast("double"),
    )
    fnl = _suite_shape(
        x194_jpeg_decode_funnel_v2(spark, sf_dir), "fnl",
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

    a = REGISTRY["x128_r8_ops_suite"].fn(spark, sf_dir)
    b = REGISTRY["x133_r8b_ops_suite"].fn(spark, sf_dir)
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
    pvb = _suite_shape(
        x196_decode_path_parity(spark, sf_dir), "pvb",
        id1=F.col("doc_id"), v1=F.col("px_sum"),
        v2=F.col("width") * 1000 + F.col("height"), v3=F.col("parity"),
    )
    vsrc = _suite_shape(
        x197_video_neardup_source_sheet(spark, sf_dir), "vsrc",
        v1=F.col("n_videos"), v2=F.col("n_survivors"), v3=F.col("n_dupes"),
        s1=F.col("source"),
    )
    return pvb.unionAll(vsrc)
