"""Round-11 registered queries: the perceptual-dedup composed multimodal
pipeline (c9 — VERDICT r10 'Next round' #3: prove c8's dedup stage is
tier-swappable by substituting the x157→x158→x163 perceptual chain for
the md5 stage, the c1→c2 proof applied to images), plus the driver-window
row that funds it (m3_r10bc_suite consolidates the x156/x159 r10 wave
suites: −2 suites +1 suite-of-suites +1 c9 keeps tier-0 ==
DRIVER_WINDOW), per the t3/s6 suite-of-suites convention from r10.

Registration/oracle conventions follow r7-r10_queries: every standalone
here is tier 1, every one is also driver-verified same-round, and suite
oracles compose the members' SQL via member_oracle() so member edits
can't drift.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from . import r10_queries  # noqa: F401  (m3 composes x156/x159 oracles)
from .extension_queries import _CONSISTENT_DIMS_CTES, _suite_shape
from .operators import dedup as D
from .operators.multimodal import (
    ahash_pairs_ctes,
    ahash_sql,
    attach_consistent_bmp_payload,
    image_ahash,
    image_neardup_pairs,
)
from .r10_queries import C8_CORRUPT_MOD
from .registry import _t, member_oracle, register

# ---------------------------------------------------------------------------
# Memoized consistent AVI/WAV payload frames (r12 optimization round)
# ---------------------------------------------------------------------------

#: Session-scoped memo for the consistent AVI/WAV payload frames — the
#: _C7/_C10/_C11 contract (keyed on applicationId + sf_dir, foreign-
#: session eviction, re-persist on access, released between bench rows
#: with every other tracked intermediate, so each timed row still
#: computes payloads from the parquet inputs). Why it exists: the
#: payload ASSEMBLY (the per-frame JPEG encode / PCM synth inside the
#: fixture Arrow pass) is ~95% of every video/audio kernel's cost
#: (measured sf0.1: 1.80s of the 1.88s build+frame0-hash pass), and the
#: dual-tier rows (x218/x219/x197: a single-tier chain AND a dual-tier
#: chain under ONE action) paid that assembly once per chain. Sharing
#: the persisted payload frame makes every consumer in an action read
#: the same ~20 MB cached table instead of re-encoding the corpus.
_PAYLOAD_FRAME_CACHE: dict = {}


def consistent_media_payloads(spark, sf_dir, kind="avi", silent_mod=None):
    """The memoized persisted consistent payload frame over the full
    documents table (``kind``: "avi" video / "wav" audio) — every
    video/audio consumer shares ONE fixture-assembly subtree per action
    instead of re-encoding the corpus per kernel."""
    from .operators.multimodal import (
        attach_consistent_avi_payload,
        attach_consistent_wav_payload,
    )

    if os.environ.get("MPS_PAYLOAD_MEMO_OFF"):
        # A/B bypass (the MPS_SUITE_UNION convention): the pre-memo form —
        # every consumer assembles its own payload frame, nothing persisted
        docs = _t(spark, sf_dir, "documents")
        if kind == "avi":
            return attach_consistent_avi_payload(docs)
        return attach_consistent_wav_payload(docs, silent_mod=silent_mod)

    app = spark.sparkContext.applicationId
    key = (app, sf_dir, kind, silent_mod)

    def _build():
        docs = _t(spark, sf_dir, "documents")
        if kind == "avi":
            return attach_consistent_avi_payload(docs)
        return attach_consistent_wav_payload(docs, silent_mod=silent_mod)

    mm = D.memo_get_or_build(_PAYLOAD_FRAME_CACHE, app, key, _build)
    # eager: the fixture-assembly pass is the most expensive subtree in the
    # media family (~56 CPU-seconds at sf0.1) — materialize it once per
    # access epoch so AQE's concurrent broadcast builds read the cache
    # instead of racing to re-assemble it (operators/dedup.materialize_shared)
    return D.materialize_shared(D._persist(mm), ("payload",) + key)


# ---------------------------------------------------------------------------
# c9 — the composed multimodal pipeline with the PERCEPTUAL dedup tier
# ---------------------------------------------------------------------------

#: c9's dimension quality gate: the consistent-BMP fixture's height is
#: 1..16 (closed form least(len(text) // w, 16)), so "drop short images"
#: is height >= 4 — a real gate over the DECODED header dims that stays
#: oracle-exact.
C9_MIN_H = 4


def _c9_sql() -> str:
    # sig feeds the band union, both verify joins, the CC seed and the
    # qual join — MATERIALIZED per the x144 CTE-inlining lesson; same for
    # the pair list p (both edge directions). The CC is x163's recursive
    # form seeded with every gate survivor so singletons keep themselves.
    return f"""WITH RECURSIVE
c7m AS (SELECT doc_id, split, shard
        FROM ({member_oracle('c7_pretraining_pipeline')}) z),
{_CONSISTENT_DIMS_CTES},
gdims AS (SELECT * FROM dims WHERE doc_id % {C8_CORRUPT_MOD} <> 0),
sig AS MATERIALIZED ({ahash_sql('gdims')}),
{ahash_pairs_ctes('sig')},
p AS MATERIALIZED (SELECT doc_a, doc_b FROM ham
                   WHERE hamming <= 3),
edges AS (SELECT doc_a AS src, doc_b AS dst FROM p
          UNION ALL SELECT doc_b, doc_a FROM p),
reach AS (SELECT doc_id, doc_id AS n FROM sig
          UNION
          SELECT r.doc_id, e.dst FROM reach r JOIN edges e ON e.src = r.n),
keep AS (SELECT doc_id FROM (
           SELECT doc_id, min(n) AS rep FROM reach GROUP BY doc_id)
         WHERE doc_id = rep),
qual AS (SELECT s.doc_id, d.w, d.h, s.h_hi, s.h_lo
         FROM sig s JOIN keep USING (doc_id) JOIN gdims d USING (doc_id)
         WHERE d.h >= {C9_MIN_H})
SELECT q.doc_id, CAST(q.w AS BIGINT) AS width, CAST(q.h AS BIGINT) AS height,
       q.h_hi, q.h_lo, c7m.split, c7m.shard
FROM qual q JOIN c7m USING (doc_id)"""


@register(
    "c9_multimodal_lsh", _c9_sql(), "EXT-01", "EXT-02", "EXT-04",
)
def c9_multimodal_lsh(spark, sf_dir):
    """The c8 composed pipeline with its dedup stage SWAPPED to the
    perceptual tier (VERDICT r10 #3 — the c1→c2 tier-swap proof applied
    to images): same stage skeleton (decode gate → dedup → dimension
    gate → c7 split/shard pairing), but stage 2 is the x157→x158→x163
    chain — aHash signatures over REAL decoded pixels, banded-LSH
    near-dup pairs, connected-components keep-one — instead of exact
    payload-md5. What exact hashing can't do and this can: two images
    whose BYTES differ but whose pixels are near-identical collapse to
    one survivor.

      1. decode-validity gate: every C8_CORRUPT_MOD-th payload is
         corrupted (2-zero-byte prefix — no image magic starts 0x0000),
         and the gate IS the real decode: a payload decode_pixels
         rejects emits no signature;
      2. perceptual dedup: image_ahash (one Arrow pass, with_dims=True
         so the dim gate rides the SAME pass), banded hamming pairs,
         min-id keep-one over the pair graph;
      3. dimension quality gate: decoded height >= 4 (drop short
         images), read from the decoded array;
      4. pair with the training layout: join survivors to the c7
         split/shard manifest.

    ONE composed oracle (consistent-fixture closed forms + the shared
    ahash/band CTE builders + the x163 recursive CC) hash-checks every
    stage. Scale: one Arrow decode pass total; pair generation is
    capped posting lists (never image×image); the CC pays only for
    docs with edges; two doc_id equi-joins. No stage re-reads payload
    bytes after the single decode."""
    return _c9_frames(spark, sf_dir)["result"]


#: The c9 chain frames, memoized per (session, sf_dir) with the same
#: foreign-session eviction + re-persist-on-access contract as r9's
#: _C1_MANIFEST_CACHE / r10's _C8_FRAMES_CACHE (r12, VERDICT r11 "What's
#: missing #2"): x187 consumes the FULL c9 chain (Arrow image decode +
#: banded pairs + CC) alongside the full c10 chain in one action —
#: without the memo every consumer carries an independent decode subtree.
#: Both the internal sig frame (3 consumers: pairs, keep, qual) and the
#: final manifest (≤ |survivors| rows × 7 narrow columns) re-persist on
#: every access so bench-harness releases stay safe.
_C9_FRAMES_CACHE: dict = {}


def _c9_frames(spark, sf_dir):
    from .r9_queries import _c7_result

    app = spark.sparkContext.applicationId

    def _build():
        docs = _t(spark, sf_dir, "documents")
        mm = attach_consistent_bmp_payload(docs)
        corrupted = F.when(
            F.col("doc_id") % C8_CORRUPT_MOD == 0,
            F.concat(F.unhex(F.lit("0000")), F.col("payload")),
        ).otherwise(F.col("payload"))
        mmc = mm.select("doc_id", corrupted.alias("payload"))

        def _media_chain():
            # gate + signature + dims in ONE Arrow pass: corrupted
            # payloads fail the real decode and emit nothing
            sig = image_ahash(mmc, with_dims=True)
            pairs = image_neardup_pairs(
                sig.select("doc_id", "h_hi", "h_lo")
            ).select("doc_a", "doc_b")
            keep = (
                D.dedup_keep_one(sig.select("doc_id"), pairs)
                .filter(F.col("keep"))
                .select("doc_id")
            )
            qual = sig.join(keep, "doc_id").filter(
                F.col("height") >= C9_MIN_H
            )
            return sig, qual

        # the decode+CC chain and the c7 layout chain are independent
        # until the final join — overlap them (dedup.overlap, §2.6)
        (sig, qual), manifest = D.overlap(
            _media_chain,
            lambda: _c7_result(spark, sf_dir).select(
                "doc_id", "split", "shard"
            ),
        )
        result = qual.join(manifest, "doc_id").select(
            "doc_id", "width", "height", "h_hi", "h_lo", "split", "shard"
        )
        return {"sig": sig, "result": result}

    st = D.memo_get_or_build(_C9_FRAMES_CACHE, app, (app, sf_dir), _build)
    D._persist(st["sig"])
    _c7_result(spark, sf_dir)  # re-persist the embedded c7 manifest
    return st


def _c9_result(spark, sf_dir):
    """The memoized, persisted c9 survivor manifest — for multi-consumer
    rows (x187) that pair image survivors with other modalities."""
    return D._persist(_c9_frames(spark, sf_dir)["result"])


# ---------------------------------------------------------------------------
# m3_r10bc_suite — the x156/x159 r10 wave suites as ONE driver row (funds
# the c9 slot)
# ---------------------------------------------------------------------------


def _m3_sql() -> str:
    return f"""SELECT concat('b_', kind) AS kind, id1, id2, v1, v2, v3, d1,
       d2, s1
FROM ({member_oracle('x156_r10b_ops_suite')})
UNION ALL
SELECT concat('c_', kind), id1, id2, v1, v2, v3, d1, d2, s1
FROM ({member_oracle('x159_r10c_ops_suite')})"""


@register(
    "m3_r10bc_suite", _m3_sql(), "EXT-02", "EXT-04", "EXT-05",
    tier=1,  # r12: consolidated into m16_r10bcde_suite (stays in bench HEADLINE)
)
def m3_r10bc_suite(spark, sf_dir):
    """Driver row consolidating two same-shaped r10 wave suites (x156 =
    multimodal funnel + paired profile, x159 = image aHash + banded
    near-dup pairs) — r11 window math: their two slots fund this row
    plus the c9 pipeline row. Both members keep their identical 9-column
    shape with a kind-namespace prefix; member oracles embedded
    verbatim; x156/x159 and their members stay benched (frozen series
    untouched)."""
    from .registry import REGISTRY

    def widen(df, prefix):
        return df.select(
            F.concat(F.lit(prefix), F.col("kind")).alias("kind"),
            "id1", "id2", "v1", "v2", "v3", "d1", "d2", "s1",
        )

    b, c = D.overlap(  # guide §2.6: member construction overlapped
        lambda: REGISTRY["x156_r10b_ops_suite"].fn(spark, sf_dir),
        lambda: REGISTRY["x159_r10c_ops_suite"].fn(spark, sf_dir),
    )
    return widen(b, "b_").unionAll(widen(c, "c_"))


# ===========================================================================
# r11 second wave: real video decode (x175 — MJPEG-in-AVI frame sampling,
# the last stub modality, VERDICT r10 #4) and measured image near-dup
# recall (x176 — the x142 device applied to the banded pair generator,
# VERDICT r10 #5) — funded by consolidating the x162/x165 r10 wave suites
# into m4_r10de_suite.
# ===========================================================================


def _x175_sql() -> str:
    # the attach_consistent_avi_payload closed form: every stored frame f
    # (sampled every 2nd) decodes to rows_f*8 x bpr*8 pixels where byte
    # b[f + k] fills one constant 8x8 block -> px_sum = 64 * window sum
    return """WITH ascii_docs AS (
         SELECT doc_id, regexp_replace(text, '[^ -~]', '', 'g') AS text
         FROM documents),
vdims AS (SELECT doc_id, text, length(text) AS n,
          2 + ascii(substr(text, 1, 1)) % 4 AS bpr,
          2 + ascii(substr(text, 1, 1)) % 3 AS nf
   FROM ascii_docs WHERE length(text) >= 1),
eff AS (SELECT doc_id, text, n, bpr,
               least(nf, greatest(n - bpr + 1, 0)) AS nfe
        FROM vdims),
fr AS (SELECT doc_id, text, n, bpr,
              unnest(range(0, CAST(nfe AS BIGINT), 2)) AS fno
       FROM eff WHERE nfe >= 1),
fx AS (SELECT doc_id, fno, bpr, least((n - fno) // bpr, 8) AS rows_f, text
       FROM fr)
SELECT doc_id, CAST(fno AS BIGINT) AS frame_no,
       CAST(bpr * 8 AS BIGINT) AS width,
       CAST(rows_f * 8 AS BIGINT) AS height,
       CAST(64 * list_sum(list_transform(
                range(1, CAST(bpr * rows_f AS BIGINT) + 1),
                i -> ascii(substr(text, CAST(fno + i AS INTEGER), 1))))
            AS BIGINT) AS px_sum
FROM fx"""


@register("x175_video_frame_stats", _x175_sql(), "EXT-04", tier=1)
def x175_video_frame_stats(spark, sf_dir):
    """Video frame sampling with a REAL codec in the loop (VERDICT r10
    #4 — the last stub modality): GENUINE MJPEG-in-AVI payloads are
    assembled per doc (attach_consistent_avi_payload — every frame a
    real baseline JPEG inside a spec-valid RIFF container, JUNK chunks
    on odd firsts so fixed-offset parsing fails), then
    :func:`operators.multimodal.mjpeg_frame_stats` walks the ACTUAL
    chunk list, samples every 2nd stored frame and decodes it through
    the full Huffman+IDCT path, emitting exact-integer per-frame stats.
    The oracle recomputes the identical numbers from the fixture's
    closed form — a driver hash match proves the container walk AND the
    per-frame decode. Scale: one Arrow pass, payload→many-rows (the
    explode shape); no shuffle."""
    from .operators.multimodal import (
        mjpeg_frame_stats,
    )

    return mjpeg_frame_stats(
        consistent_media_payloads(spark, sf_dir)
    )


#: x176's fixed probe panel (the x142 device): md5-chosen from the first
#: 1024 doc_ids — ≤ ~128 panel docs at any SF, so the exhaustive pair set
#: stays ≤ ~8k in-row combinations.
X176_PANEL_SQL = (
    "doc_id < 1024 AND substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)"
    " IN ('0', '1')"
)


def _x176_sql() -> str:
    return f"""WITH {_CONSISTENT_DIMS_CTES},
sig AS MATERIALIZED ({ahash_sql('dims')}),
{ahash_pairs_ctes('sig')},
banded AS (SELECT doc_a, doc_b FROM ham WHERE hamming <= 3),
panel AS (SELECT * FROM sig WHERE {X176_PANEL_SQL}),
ex AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
              CAST(bit_count(xor(a.h_hi, b.h_hi))
                   + bit_count(xor(a.h_lo, b.h_lo)) AS BIGINT) AS hamming
       FROM panel a JOIN panel b ON a.doc_id < b.doc_id)
SELECT e.doc_a, e.doc_b, e.hamming,
       CAST(bd.doc_a IS NOT NULL AS BIGINT) AS in_banded
FROM ex e LEFT JOIN banded bd USING (doc_a, doc_b)
WHERE e.hamming <= 3"""


@register(
    "x176_image_neardup_recall", _x176_sql(), "EXT-02", "EXT-04", tier=1,
)
def x176_image_neardup_recall(spark, sf_dir):
    """Measured image near-dup recall (VERDICT r10 #5 — the x142 device
    applied to x158): on the fixed md5-chosen panel, EVERY hamming<=3
    pair (exhaustive, in-row combinations over the bounded panel — never
    a corpus expansion) is flagged with whether the production banded
    generator found it. The 4×16 banding is pigeonhole-complete at
    hamming<=3 EXCEPT for pairs pruned by the stop-bucket cap — so
    in_banded=0 rows measure exactly that documented trade, and the
    driver hash turns image-dedup recall into a regression canary."""
    from .operators.dedup import _pair_combinations

    from .r10_queries import _img_memo_off, image_pairs_frame, image_sig_frame

    if _img_memo_off():
        mm = attach_consistent_bmp_payload(_t(spark, sf_dir, "documents"))
        sig = D._persist(image_ahash(mm))
        banded = image_neardup_pairs(sig).select(
            "doc_a", "doc_b", F.lit(1).alias("__b")
        )
    else:
        sig = image_sig_frame(spark, sf_dir)
        banded = image_pairs_frame(spark, sf_dir).select(
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
# m4_r10de_suite — the x162/x165 r10 wave suites as ONE driver row (funds
# the x177 slot)
# ---------------------------------------------------------------------------


def _m4_sql() -> str:
    return f"""SELECT concat('d_', kind) AS kind, id1, id2, v1, v2, v3, d1,
       d2, s1
FROM ({member_oracle('x162_r10d_ops_suite')})
UNION ALL
SELECT concat('e_', kind), id1, id2, v1, v2, v3, d1, d2, s1
FROM ({member_oracle('x165_r10e_ops_suite')})"""


@register(
    "m4_r10de_suite", _m4_sql(), "EXT-02", "EXT-04", "EXT-05",
    "EXT-ANALYTICS",
    tier=1,  # r12: consolidated into m16_r10bcde_suite (stays in bench HEADLINE)
)
def m4_r10de_suite(spark, sf_dir):
    """Driver row consolidating two same-shaped r10 wave suites (x162 =
    permutation entropy + curriculum phases, x165 = image keep-one +
    dHash) — r11 window math: their two slots fund this row plus x177.
    Kind-namespace prefixes, member oracles embedded verbatim; x162/x165
    and their members stay benched (frozen series untouched)."""
    from .registry import REGISTRY

    def widen(df, prefix):
        return df.select(
            F.concat(F.lit(prefix), F.col("kind")).alias("kind"),
            "id1", "id2", "v1", "v2", "v3", "d1", "d2", "s1",
        )

    d, e = D.overlap(  # guide §2.6: member construction overlapped
        lambda: REGISTRY["x162_r10d_ops_suite"].fn(spark, sf_dir),
        lambda: REGISTRY["x165_r10e_ops_suite"].fn(spark, sf_dir),
    )
    return widen(d, "d_").unionAll(widen(e, "e_"))


# ---------------------------------------------------------------------------
# x177_r11b_ops_suite — the r11 second-wave operators under one driver hash
# ---------------------------------------------------------------------------


def _x177_sql() -> str:
    z = "CAST(0 AS BIGINT)"
    zd = "CAST(0.0 AS DOUBLE)"
    return f"""SELECT 'vf' AS kind, doc_id AS id1, frame_no AS id2,
       width AS v1, height AS v2, px_sum AS v3, {zd} AS d1, {zd} AS d2,
       CAST(NULL AS VARCHAR) AS s1
FROM ({member_oracle('x175_video_frame_stats')})
UNION ALL
SELECT 'rc', doc_a, doc_b, hamming, in_banded, {z}, {zd}, {zd},
       CAST(NULL AS VARCHAR)
FROM ({member_oracle('x176_image_neardup_recall')})"""


@register(
    "x177_r11b_ops_suite", _x177_sql(), "EXT-02", "EXT-04",
    tier=1,  # r12: consolidated into m8_r11bc_suite (stays in bench HEADLINE)
)
def x177_r11b_ops_suite(spark, sf_dir):
    """Driver row for the r11 second wave — MJPEG-in-AVI frame stats
    (x175) and measured banded near-dup recall (x176) — union-folded
    into the shared kind-tagged suite shape (2 small members → lazy
    union per the SCALE.md composition rule)."""
    __r0, __r1 = D.overlap(  # guide §2.6
        lambda: x175_video_frame_stats(spark, sf_dir),
        lambda: x176_image_neardup_recall(spark, sf_dir),
    )
    vf = _suite_shape(
        __r0, "vf",
        id1=F.col("doc_id"), id2=F.col("frame_no"), v1=F.col("width"),
        v2=F.col("height"), v3=F.col("px_sum"),
    )
    rc = _suite_shape(
        __r1, "rc",
        id1=F.col("doc_a"), id2=F.col("doc_b"), v1=F.col("hamming"),
        v2=F.col("in_banded"),
    )
    return vf.unionAll(rc)


# ===========================================================================
# r11 third wave: decode-validity classification (x178 — progressive
# JPEGs counted distinctly from corrupt, VERDICT r10 'What's missing' #4)
# and video perceptual dedup (x179 — the aHash keep-one applied to the
# new MJPEG frame-0 decode) — funded by consolidating the x168/x171 r10
# wave suites into m5_r10fg_suite.
# ===========================================================================


def _x178_sql() -> str:
    # fixture domain: docs whose printable projection fills >= 1 block
    # row (rows = min(n // bpr, 8) >= 1  <=>  n >= bpr); class is the
    # mixed-fixture degradation rule
    return """WITH ascii_docs AS (
         SELECT doc_id, regexp_replace(text, '[^ -~]', '', 'g') AS text
         FROM documents),
dom AS (SELECT doc_id FROM (
          SELECT doc_id, length(text) AS n,
                 2 + ascii(substr(text, 1, 1)) % 4 AS bpr
          FROM ascii_docs WHERE length(text) >= 1)
        WHERE n // bpr >= 1)
SELECT doc_id, CASE WHEN doc_id % 5 = 0 THEN 'progressive'
                    WHEN doc_id % 5 = 1 THEN 'corrupt'
                    ELSE 'baseline' END AS decode_class
FROM dom"""


@register("x178_jpeg_decode_funnel", _x178_sql(), "EXT-04", "EXT-05", tier=1)
def x178_jpeg_decode_funnel(spark, sf_dir):
    """Decode-validity classification over a degraded JPEG corpus
    (VERDICT r10 'What's missing' #4): the mixed fixture rewrites every
    5th payload's SOF0 marker to SOF2 (a structurally-valid PROGRESSIVE
    frame header) and zero-prefixes every 5th+1, and
    :func:`operators.multimodal.jpeg_decode_class` routes each payload
    by doing the REAL work — full baseline decode attempt, then the
    SOFn header scan — so progressive images land in the
    needs-fuller-codec queue instead of the trash. The oracle recomputes
    the class from the degradation rule; a hash match proves the
    classifier's byte-parse boundary sits exactly between 'decodes',
    'valid frame header only' and 'no signature'."""
    from .operators.multimodal import (
        attach_consistent_jpeg_payload,
        jpeg_decode_class,
    )

    return jpeg_decode_class(
        attach_consistent_jpeg_payload(
            _t(spark, sf_dir, "documents"), mixed=True
        )
    )


def _video_sig_ctes(extra_pred: str = "") -> str:
    """The frame-0 aHash signature closed form as a CTE chain (ascii
    projection → eligible-video dims → sig), shared by x179 (keep-one),
    x184 (incremental ingest) and c10 (composed pipeline, which passes
    the corruption-gate predicate via ``extra_pred``) — one definition,
    three consumers, per the _c8_ctes convention. Frame 0 of the AVI
    fixture is constant 8x8 blocks of the byte window [0, bpr*rows0):
    the 8x8 nearest resample samples byte
    ((k//8 * rows0) // 8) * bpr + ((k%8) * bpr) // 8 — then the exact
    ahash_sql threshold/bit packing (no flip: JPEG rows are top-down).
    v2 also exposes the stored-frame-count closed form nfe
    (least(nf, n - bpr + 1)) for duration gates."""
    s_expr = (
        "list_transform(range(0, 64), k -> ascii(substr(text, CAST("
        "(((k // 8) * rows0) // 8) * bpr + (((k % 8) * bpr) // 8) + 1"
        " AS INTEGER), 1)))"
    )
    return f"""ascii_docs AS (
         SELECT doc_id, regexp_replace(text, '[^ -~]', '', 'g') AS text
         FROM documents),
v2 AS (SELECT doc_id, text,
              2 + ascii(substr(text, 1, 1)) % 4 AS bpr,
              least(length(text) // (2 + ascii(substr(text, 1, 1)) % 4), 8)
                  AS rows0,
              least(2 + ascii(substr(text, 1, 1)) % 3,
                    greatest(length(text)
                             - (2 + ascii(substr(text, 1, 1)) % 4) + 1, 0))
                  AS nfe
       FROM ascii_docs
       WHERE length(text) >= 1
         AND length(text) // (2 + ascii(substr(text, 1, 1)) % 4) >= 1
         {extra_pred}),
sig AS MATERIALIZED (
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
        FROM (SELECT doc_id, {s_expr} AS s FROM v2) y) z)"""


def _x179_sql() -> str:
    return f"""WITH {_video_sig_ctes()},
keep AS (SELECT h_hi, h_lo, min(doc_id) AS mn FROM sig GROUP BY 1, 2)
SELECT sig.doc_id, sig.h_hi, sig.h_lo, (sig.doc_id = k.mn) AS keep
FROM sig JOIN keep k USING (h_hi, h_lo)"""


@register(
    "x179_video_perceptual_dedup", _x179_sql(), "EXT-01", "EXT-02", "EXT-04",
    tier=1,
)
def x179_video_perceptual_dedup(spark, sf_dir):
    """Video-level perceptual dedup composing the new MJPEG decode path
    with the dedup machinery: each video's FIRST frame (every MJPEG
    frame is a keyframe) decodes through the real chunk-walk + JPEG
    path and hashes with the x157 aHash kernel
    (:func:`operators.multimodal.video_frame_ahash`); videos sharing a
    frame-0 signature collapse to the min-id survivor — the thumbnail
    dedup a 100 TB video corpus runs before paying for full-sequence
    fingerprinting. Output (doc_id, h_hi, h_lo, keep); oracle recomputes
    the signature from the fixture's constant-block closed form and the
    keep rule from the group min."""
    from .operators.multimodal import (
        video_frame_ahash,
    )

    sig = D._persist(
        video_frame_ahash(
            consistent_media_payloads(spark, sf_dir)
        )
    )
    keep = sig.groupBy("h_hi", "h_lo").agg(F.min("doc_id").alias("__mn"))
    return sig.join(keep, ["h_hi", "h_lo"]).select(
        "doc_id", "h_hi", "h_lo",
        (F.col("doc_id") == F.col("__mn")).alias("keep"),
    )


# ---------------------------------------------------------------------------
# m5_r10fg_suite — the x168/x171 r10 wave suites as ONE driver row (funds
# the x180 slot)
# ---------------------------------------------------------------------------


def _m5_sql() -> str:
    return f"""SELECT concat('f_', kind) AS kind, id1, id2, v1, v2, v3, d1,
       d2, s1
FROM ({member_oracle('x168_r10f_ops_suite')})
UNION ALL
SELECT concat('g_', kind), id1, id2, v1, v2, v3, d1, d2, s1
FROM ({member_oracle('x171_r10g_ops_suite')})"""


@register(
    "m5_r10fg_suite", _m5_sql(), "EXT-01", "EXT-02", "EXT-04", "EXT-05",
    tier=1,  # r12: consolidated into m17_r10fg9bc_suite (stays in bench HEADLINE)
)
def m5_r10fg_suite(spark, sf_dir):
    """Driver row consolidating two same-shaped r10 wave suites (x168 =
    GIF aHash + dual-hash pairs, x171 = incremental image dedup +
    per-source image profile) — r11 window math: their two slots fund
    this row plus x180. Kind-namespace prefixes, member oracles embedded
    verbatim; x168/x171 and their members stay benched (frozen series
    untouched)."""
    from .registry import REGISTRY

    def widen(df, prefix):
        return df.select(
            F.concat(F.lit(prefix), F.col("kind")).alias("kind"),
            "id1", "id2", "v1", "v2", "v3", "d1", "d2", "s1",
        )

    f, g = D.overlap(  # guide §2.6: member construction overlapped
        lambda: REGISTRY["x168_r10f_ops_suite"].fn(spark, sf_dir),
        lambda: REGISTRY["x171_r10g_ops_suite"].fn(spark, sf_dir),
    )
    return widen(f, "f_").unionAll(widen(g, "g_"))


# ---------------------------------------------------------------------------
# x180_r11c_ops_suite — the r11 third-wave operators under one driver hash
# ---------------------------------------------------------------------------


def _x180_sql() -> str:
    z = "CAST(0 AS BIGINT)"
    zd = "CAST(0.0 AS DOUBLE)"
    return f"""SELECT 'cls' AS kind, doc_id AS id1, {z} AS id2, {z} AS v1,
       {z} AS v2, {z} AS v3, {zd} AS d1, {zd} AS d2, decode_class AS s1
FROM ({member_oracle('x178_jpeg_decode_funnel')})
UNION ALL
SELECT 'vdup', doc_id, {z}, h_hi, h_lo, CAST(keep AS BIGINT), {zd}, {zd},
       CAST(NULL AS VARCHAR)
FROM ({member_oracle('x179_video_perceptual_dedup')})"""


@register(
    "x180_r11c_ops_suite", _x180_sql(), "EXT-01", "EXT-02", "EXT-04",
    "EXT-05",
    tier=1,  # r12: consolidated into m8_r11bc_suite (stays in bench HEADLINE)
)
def x180_r11c_ops_suite(spark, sf_dir):
    """Driver row for the r11 third wave — the JPEG decode-validity
    funnel (x178) and video perceptual dedup (x179) — union-folded into
    the shared kind-tagged suite shape (2 small members → lazy union per
    the SCALE.md composition rule)."""
    __r0, __r1 = D.overlap(  # guide §2.6
        lambda: x178_jpeg_decode_funnel(spark, sf_dir),
        lambda: x179_video_perceptual_dedup(spark, sf_dir),
    )
    cls = _suite_shape(
        __r0, "cls",
        id1=F.col("doc_id"), s1=F.col("decode_class"),
    )
    vdup = _suite_shape(
        __r1, "vdup",
        id1=F.col("doc_id"), v1=F.col("h_hi"), v2=F.col("h_lo"),
        v3=F.col("keep").cast("long"),
    )
    return cls.unionAll(vdup)


# ===========================================================================
# r11 fourth wave: video header profile (x181 — metadata screening with no
# pixel decode) and scene-change deltas over the sampled frames (x182 —
# the temporal statistic the x175 decode feeds) — funded by consolidating
# the x145/x148 r9 wave suites into m6_r9bc_suite.
# ===========================================================================


def _x181_sql() -> str:
    # the AVI fixture's avih closed forms: us_per_frame = 1e6 // fps with
    # fps = 5 + first % 10; n_frames = nfe; dims = frame 0's
    return """WITH ascii_docs AS (
         SELECT doc_id, regexp_replace(text, '[^ -~]', '', 'g') AS text
         FROM documents),
vdims AS (SELECT doc_id, length(text) AS n,
          ascii(substr(text, 1, 1)) AS first,
          2 + ascii(substr(text, 1, 1)) % 4 AS bpr,
          2 + ascii(substr(text, 1, 1)) % 3 AS nf
   FROM ascii_docs WHERE length(text) >= 1),
eff AS (SELECT doc_id, first, bpr, n,
               least(nf, greatest(n - bpr + 1, 0)) AS nfe
        FROM vdims)
SELECT doc_id, CAST(nfe AS BIGINT) AS n_frames,
       CAST(1000000 // (5 + first % 10) AS BIGINT) AS us_per_frame,
       CAST(bpr * 8 AS BIGINT) AS width,
       CAST(least(n // bpr, 8) * 8 AS BIGINT) AS height
FROM eff WHERE nfe >= 1"""


@register("x181_video_header_profile", _x181_sql(), "EXT-04", tier=1)
def x181_video_header_profile(spark, sf_dir):
    """Video metadata extraction WITHOUT pixel decode
    (:func:`operators.multimodal.avi_header_profile`): frame count,
    frame interval, declared dims read from the avih main header via the
    real RIFF walk — the screening pass a 100 TB video corpus runs
    before paying for any codec work (the parse_image_header economics
    on the video container). Oracle recomputes every field from the
    fixture's closed forms; a hash match proves the walker found and
    field-parsed the actual header bytes."""
    from .operators.multimodal import (
        avi_header_profile,
    )

    return avi_header_profile(
        consistent_media_payloads(spark, sf_dir)
    )


def _x182_sql() -> str:
    # composes the registered x175 member oracle: the temporal statistic
    # is a lag window over the per-frame stats both engines already agree
    # on — shared text, no drift
    return f"""WITH vf AS MATERIALIZED (SELECT doc_id, frame_no, px_sum
     FROM ({member_oracle('x175_video_frame_stats')}) z),
d AS (SELECT doc_id,
             px_sum - lag(px_sum) OVER (PARTITION BY doc_id
                                        ORDER BY frame_no) AS dd
      FROM vf)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_sampled,
       CAST(coalesce(sum(abs(dd)), 0) AS BIGINT) AS delta_sum
FROM d GROUP BY doc_id"""


@register("x182_video_scene_change", _x182_sql(), "EXT-04", tier=1)
def x182_video_scene_change(spark, sf_dir):
    """Temporal scene-change score per video: total absolute luminance
    delta between consecutive SAMPLED frames (the statistic a frame
    sampler feeds to pick shot boundaries / dedup static clips), over
    the x175 decode — a doc_id-partitioned lag window on the per-frame
    stats, so the temporal pass adds zero Python and one bounded
    shuffle. delta_sum = 0 flags a static video (every sampled frame
    identical); n_sampled counts the frames the score is based on."""
    from pyspark.sql import Window

    vf = x175_video_frame_stats(spark, sf_dir).select(
        "doc_id", "frame_no", "px_sum"
    )
    w = Window.partitionBy("doc_id").orderBy("frame_no")
    d = vf.withColumn("dd", F.col("px_sum") - F.lag("px_sum").over(w))
    return d.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_sampled"),
        F.coalesce(F.sum(F.abs("dd")), F.lit(0)).cast("long").alias("delta_sum"),
    )


# ---------------------------------------------------------------------------
# m6_r9bc_suite — the x145/x148 r9 wave suites as ONE driver row (funds
# the x183 slot)
# ---------------------------------------------------------------------------


def _m6_sql() -> str:
    return f"""SELECT concat('b_', kind) AS kind, id1, id2, v1, v2, v3, d1,
       d2, s1
FROM ({member_oracle('x145_r9b_ops_suite')})
UNION ALL
SELECT concat('c_', kind), id1, id2, v1, v2, v3, d1, d2, s1
FROM ({member_oracle('x148_r9c_ops_suite')})"""


@register(
    "m6_r9bc_suite", _m6_sql(), "EXT-01", "EXT-02", "EXT-05",
    tier=1,  # r12: consolidated into m17_r10fg9bc_suite (stays in bench HEADLINE)
)
def m6_r9bc_suite(spark, sf_dir):
    """Driver row consolidating two same-shaped r9 wave suites (x145 =
    pack utilization + cross-split leakage, x148 = shingle novelty +
    seq-len histogram) — r11 window math: their two slots fund this row
    plus x183. Kind-namespace prefixes, member oracles embedded
    verbatim; x145/x148 and their members stay benched (frozen series
    untouched)."""
    from .registry import REGISTRY

    def widen(df, prefix):
        return df.select(
            F.concat(F.lit(prefix), F.col("kind")).alias("kind"),
            "id1", "id2", "v1", "v2", "v3", "d1", "d2", "s1",
        )

    b, c = D.overlap(  # guide §2.6: member construction overlapped
        lambda: REGISTRY["x145_r9b_ops_suite"].fn(spark, sf_dir),
        lambda: REGISTRY["x148_r9c_ops_suite"].fn(spark, sf_dir),
    )
    return widen(b, "b_").unionAll(widen(c, "c_"))


# ---------------------------------------------------------------------------
# x183_r11d_ops_suite — the r11 fourth-wave operators under one driver hash
# ---------------------------------------------------------------------------


def _x183_sql() -> str:
    z = "CAST(0 AS BIGINT)"
    zd = "CAST(0.0 AS DOUBLE)"
    return f"""SELECT 'hdr' AS kind, doc_id AS id1, {z} AS id2,
       n_frames AS v1, us_per_frame AS v2, width * 1000 + height AS v3,
       {zd} AS d1, {zd} AS d2, CAST(NULL AS VARCHAR) AS s1
FROM ({member_oracle('x181_video_header_profile')})
UNION ALL
SELECT 'scn', doc_id, {z}, n_sampled, delta_sum, {z}, {zd}, {zd},
       CAST(NULL AS VARCHAR)
FROM ({member_oracle('x182_video_scene_change')})"""


@register(
    "x183_r11d_ops_suite", _x183_sql(), "EXT-04",
    tier=1,  # r12: consolidated into m9_r11de_suite (stays in bench HEADLINE)
)
def x183_r11d_ops_suite(spark, sf_dir):
    """Driver row for the r11 fourth wave — the video header profile
    (x181) and scene-change deltas (x182) — union-folded into the
    shared kind-tagged suite shape (2 small members → lazy union per
    the SCALE.md composition rule)."""
    __r0, __r1 = D.overlap(  # guide §2.6
        lambda: x181_video_header_profile(spark, sf_dir),
        lambda: x182_video_scene_change(spark, sf_dir),
    )
    hdr = _suite_shape(
        __r0, "hdr",
        id1=F.col("doc_id"), v1=F.col("n_frames"), v2=F.col("us_per_frame"),
        v3=F.col("width") * 1000 + F.col("height"),
    )
    scn = _suite_shape(
        __r1, "scn",
        id1=F.col("doc_id"), v1=F.col("n_sampled"), v2=F.col("delta_sum"),
    )
    return hdr.unionAll(scn)


# ===========================================================================
# r11 fifth wave: incremental video ingest dedup (x184 — the x45/x57/x169
# nightly-ingest pattern on the frame-0 video signatures) and audio energy
# screening (x185 — VAD-style pre-filter over real decoded PCM) — funded
# by consolidating the x151/x174 wave suites into m7_r9d10h_suite.
# ===========================================================================


def _x184_sql() -> str:
    return f"""WITH {_video_sig_ctes()},
old AS (SELECT DISTINCT h_hi, h_lo FROM sig WHERE doc_id % 10 < 8),
new AS (SELECT * FROM sig WHERE doc_id % 10 >= 8),
keepn AS (SELECT h_hi, h_lo, min(doc_id) AS doc_id FROM new GROUP BY 1, 2)
SELECT k.doc_id, (o.h_hi IS NOT NULL) AS is_dup_of_corpus
FROM keepn k LEFT JOIN old o ON k.h_hi = o.h_hi AND k.h_lo = o.h_lo"""


@register(
    "x184_incremental_video_dedup", _x184_sql(), "EXT-01", "EXT-02", "EXT-04",
    tier=1,
)
def x184_incremental_video_dedup(spark, sf_dir):
    """Nightly-ingest video dedup (the x45/x57/x169 incremental pattern
    on frame-0 signatures): the new batch (doc_id%10 >= 8) dedups within
    itself (min doc_id per signature) and flags survivors whose
    signature already exists in the corpus index (doc_id%10 < 8) — the
    check an ingest pipeline runs before admitting videos. Corpus side
    is a DISTINCT ~16-byte signature index; the probe is one equi-join
    on the two halves, broadcastable at any batch size. Oracle shares
    the _video_sig_ctes closed form with x179."""
    from .operators.multimodal import (
        video_frame_ahash,
    )

    sig = D._persist(
        video_frame_ahash(
            consistent_media_payloads(spark, sf_dir)
        )
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


def _x185_sql() -> str:
    # the attach_wav_payload closed forms (the x86 oracle's f/c CTEs):
    # n constant samples of value v -> n_windows = ceil(n/64),
    # sum_sq = n*v*v, peak = v
    return """WITH f AS (
  SELECT doc_id,
         CASE WHEN length(coalesce(text, '')) = 0 THEN 0
              ELSE ascii(substr(coalesce(text, ''), 1, 1)) END AS first,
         octet_length(encode(coalesce(text, ''))) AS nb
  FROM documents),
c AS (SELECT doc_id, 40 + nb % 216 AS n, 1 + first % 127 AS v FROM f)
SELECT doc_id,
       CAST((n + 63) // 64 AS BIGINT) AS n_windows,
       CAST(n * v * v AS BIGINT) AS sum_sq,
       CAST(v AS BIGINT) AS peak_abs
FROM c"""


@register("x185_audio_energy_screen", _x185_sql(), "EXT-04", tier=1)
def x185_audio_energy_screen(spark, sf_dir):
    """Audio energy screening over REAL decoded PCM
    (:func:`operators.multimodal.pcm_energy_screen`): 64-sample window
    count, exact int64 sum of squares and peak absolute amplitude — the
    VAD-style silence/clipping pre-filter a speech corpus runs before
    paying for features. The chunk walker earns its keep on the same
    fixture trick as x86 (LIST/INFO chunks on odd firsts); the oracle
    recomputes the energy from the constant-sample closed forms."""
    from .operators.multimodal import attach_wav_payload, pcm_energy_screen

    return pcm_energy_screen(
        attach_wav_payload(_t(spark, sf_dir, "documents"))
    )


# ---------------------------------------------------------------------------
# m7_r9d10h_suite — the x151/x174 wave suites as ONE driver row (funds the
# x186 slot)
# ---------------------------------------------------------------------------


def _m7_sql() -> str:
    return f"""SELECT concat('d_', kind) AS kind, id1, id2, v1, v2, v3, d1,
       d2, s1
FROM ({member_oracle('x151_r9d_ops_suite')})
UNION ALL
SELECT concat('h_', kind), id1, id2, v1, v2, v3, d1, d2, s1
FROM ({member_oracle('x174_r10h_ops_suite')})"""


@register(
    "m7_r9d10h_suite", _m7_sql(), "EXT-04", "EXT-05", "EXT-ANALYTICS",
    "EXT-ANOM",
    tier=1,  # r12: consolidated into m18_r9d10h11bc_suite (stays in bench HEADLINE)
)
def m7_r9d10h_suite(spark, sf_dir):
    """Driver row consolidating two same-shaped wave suites (x151 = runs
    test + ordinal patterns, x174 = caption-image correlation +
    curriculum/split mix) — r11 window math: their two slots fund this
    row plus x186. Kind-namespace prefixes, member oracles embedded
    verbatim; x151/x174 and their members stay benched (frozen series
    untouched)."""
    from .registry import REGISTRY

    def widen(df, prefix):
        return df.select(
            F.concat(F.lit(prefix), F.col("kind")).alias("kind"),
            "id1", "id2", "v1", "v2", "v3", "d1", "d2", "s1",
        )

    d, h = D.overlap(  # guide §2.6: member construction overlapped
        lambda: REGISTRY["x151_r9d_ops_suite"].fn(spark, sf_dir),
        lambda: REGISTRY["x174_r10h_ops_suite"].fn(spark, sf_dir),
    )
    return widen(d, "d_").unionAll(widen(h, "h_"))


# ---------------------------------------------------------------------------
# x186_r11e_ops_suite — the r11 fifth-wave operators under one driver hash
# ---------------------------------------------------------------------------


def _x186_sql() -> str:
    z = "CAST(0 AS BIGINT)"
    zd = "CAST(0.0 AS DOUBLE)"
    return f"""SELECT 'vinc' AS kind, doc_id AS id1, {z} AS id2,
       CAST(is_dup_of_corpus AS BIGINT) AS v1, {z} AS v2, {z} AS v3,
       {zd} AS d1, {zd} AS d2, CAST(NULL AS VARCHAR) AS s1
FROM ({member_oracle('x184_incremental_video_dedup')})
UNION ALL
SELECT 'nrg', doc_id, {z}, n_windows, sum_sq, peak_abs, {zd}, {zd},
       CAST(NULL AS VARCHAR)
FROM ({member_oracle('x185_audio_energy_screen')})"""


@register(
    "x186_r11e_ops_suite", _x186_sql(), "EXT-01", "EXT-02", "EXT-04",
    tier=1,  # r12: consolidated into m9_r11de_suite (stays in bench HEADLINE)
)
def x186_r11e_ops_suite(spark, sf_dir):
    """Driver row for the r11 fifth wave — incremental video ingest
    dedup (x184) and audio energy screening (x185) — union-folded into
    the shared kind-tagged suite shape (2 small members → lazy union per
    the SCALE.md composition rule)."""
    __r0, __r1 = D.overlap(  # guide §2.6
        lambda: x184_incremental_video_dedup(spark, sf_dir),
        lambda: x185_audio_energy_screen(spark, sf_dir),
    )
    vinc = _suite_shape(
        __r0, "vinc",
        id1=F.col("doc_id"), v1=F.col("is_dup_of_corpus").cast("long"),
    )
    nrg = _suite_shape(
        __r1, "nrg",
        id1=F.col("doc_id"), v1=F.col("n_windows"), v2=F.col("sum_sq"),
        v3=F.col("peak_abs"),
    )
    return vinc.unionAll(nrg)


# ===========================================================================
# r11 sixth wave: c10 — the composed VIDEO curation pipeline, completing
# the composed-pipeline family across modalities (c1/c2 text, c7
# pretraining endgame, c8/c9 image, c10 video) — funded by consolidating
# the d3/d4 dedup suites into d5_dedup_agg_suite.
# ===========================================================================

#: c10's duration quality gate: drop too-short videos (a real curation
#: run drops stills and micro-clips); the fixture's stored-frame count
#: is the nfe closed form (2 + first % 3 capped by text length, so 2..4
#: on long texts) — a gate at 3 drops the first%3 == 0 class, giving the
#: stage real teeth at every SF.
C10_MIN_FRAMES = 3


def _c10_sql() -> str:
    return f"""WITH c7m AS (SELECT doc_id, split, shard
        FROM ({member_oracle('c7_pretraining_pipeline')}) z),
{_video_sig_ctes(extra_pred=f"AND doc_id % {C8_CORRUPT_MOD} <> 0")},
keep AS (SELECT h_hi, h_lo, min(doc_id) AS mn FROM sig GROUP BY 1, 2),
surv AS (SELECT s.doc_id, s.h_hi, s.h_lo
         FROM sig s JOIN keep k USING (h_hi, h_lo) WHERE s.doc_id = k.mn),
qual AS (SELECT surv.doc_id, surv.h_hi, surv.h_lo, v2.nfe
         FROM surv JOIN v2 USING (doc_id) WHERE v2.nfe >= {C10_MIN_FRAMES})
SELECT q.doc_id, CAST(q.nfe AS BIGINT) AS n_frames, q.h_hi, q.h_lo,
       c7m.split, c7m.shard
FROM qual q JOIN c7m USING (doc_id)"""


@register(
    "c10_video_pipeline", _c10_sql(), "EXT-01", "EXT-02", "EXT-04",
)
def c10_video_pipeline(spark, sf_dir):
    """The composed VIDEO curation pipeline — the c8/c9 stage skeleton on
    the video modality, completing the composed family (c1/c2 text, c7
    endgame, c8/c9 image, c10 video):

      1. decode-validity gate: every C8_CORRUPT_MOD-th AVI payload is
         corrupted (2-zero-byte prefix breaks the RIFF magic) and the
         gate IS the real chunk walk + frame-0 JPEG decode — a payload
         the walker rejects emits no signature;
      2. video dedup: exact frame-0 aHash signature (the x179 rule),
         min-id survivor per group — signature AND stored-frame count
         ride ONE Arrow pass (video_frame_ahash with_meta=True);
      3. duration quality gate: n_frames >= 3 (drop stills and
         micro-clips), read from the ACTUAL '00dc' chunk count;
      4. pair with the training layout: join survivors to the c7
         split/shard manifest.

    ONE composed oracle (the shared _video_sig_ctes closed form with the
    corruption predicate, the group-min keep rule, the nfe duration
    form, the c7 member oracle) hash-checks every stage. Scale: one
    Arrow decode pass total, one 16-byte-signature shuffle, a row-local
    gate, one doc_id equi-join — the c8 shape on video."""
    return _c10_frames(spark, sf_dir)["result"]


#: The c10 chain frames memo — the _C9_FRAMES_CACHE twin on the video
#: modality (same eviction + re-persist-on-access contract); x187 is the
#: multi-consumer that funds it. sig feeds 2 consumers (keep agg, surv
#: join); the result manifest is ≤ |survivors| × 6 narrow columns.
_C10_FRAMES_CACHE: dict = {}


def _c10_frames(spark, sf_dir):
    from .operators.multimodal import (
        video_frame_ahash,
    )
    from .r9_queries import _c7_result

    app = spark.sparkContext.applicationId

    def _build():
        docs = _t(spark, sf_dir, "documents")

        def _media_chain():
            mm = consistent_media_payloads(spark, sf_dir)
            corrupted = F.when(
                F.col("doc_id") % C8_CORRUPT_MOD == 0,
                F.concat(F.unhex(F.lit("0000")), F.col("payload")),
            ).otherwise(F.col("payload"))
            mmc = mm.select("doc_id", corrupted.alias("payload"))
            sig = video_frame_ahash(mmc, with_meta=True)
            keep = sig.groupBy("h_hi", "h_lo").agg(
                F.min("doc_id").alias("__mn")
            )
            surv = (
                sig.join(keep, ["h_hi", "h_lo"])
                .filter(F.col("doc_id") == F.col("__mn"))
                .drop("__mn")
            )
            qual = surv.filter(F.col("n_frames") >= C10_MIN_FRAMES)
            return sig, qual

        # decode chain vs c7 layout chain — independent until the final
        # join; overlap them (dedup.overlap, §2.6)
        (sig, qual), manifest = D.overlap(
            _media_chain,
            lambda: _c7_result(spark, sf_dir).select(
                "doc_id", "split", "shard"
            ),
        )
        result = qual.join(manifest, "doc_id").select(
            "doc_id", "n_frames", "h_hi", "h_lo", "split", "shard"
        )
        return {"sig": sig, "result": result}

    st = D.memo_get_or_build(_C10_FRAMES_CACHE, app, (app, sf_dir), _build)
    D._persist(st["sig"])
    _c7_result(spark, sf_dir)  # re-persist the embedded c7 manifest
    return st


def _c10_result(spark, sf_dir):
    """The memoized, persisted c10 survivor manifest — for multi-consumer
    rows (x187) that pair video survivors with other modalities."""
    return D._persist(_c10_frames(spark, sf_dir)["result"])


# ---------------------------------------------------------------------------
# d5_dedup_agg_suite — the d3/d4 dedup suites as ONE driver row (funds the
# c10 slot)
# ---------------------------------------------------------------------------


def _d5_sql() -> str:
    return f"""SELECT concat('3_', kind) AS kind, id1, id2, v1, v2, v3, d1,
       d2, s1
FROM ({member_oracle('d3_dedup_core_suite')})
UNION ALL
SELECT concat('4_', kind), id1, id2, v1, v2, v3, d1, d2, s1
FROM ({member_oracle('d4_cc_term_suite')})"""


@register(
    "d5_dedup_agg_suite", _d5_sql(), "EXT-01", "EXT-02", "EXT-05", "OP-05",
    "OP-28",
)
def d5_dedup_agg_suite(spark, sf_dir):
    """Driver row consolidating the two dedup consolidation suites (d3 =
    exact + n-gram Jaccard, d4 = connected components + term/doc freq) —
    r11 window math: their two slots fund this row plus c10. Carries
    d3's OP-05 and d4's OP-28 coverage. Kind-namespace prefixes, member
    oracles embedded verbatim; d3/d4 and their members stay benched
    (frozen series untouched)."""
    from .registry import REGISTRY

    def widen(df, prefix):
        return df.select(
            F.concat(F.lit(prefix), F.col("kind")).alias("kind"),
            "id1", "id2", "v1", "v2", "v3", "d1", "d2", "s1",
        )

    d3, d4 = D.overlap(  # guide §2.6: member construction overlapped
        lambda: REGISTRY["d3_dedup_core_suite"].fn(spark, sf_dir),
        lambda: REGISTRY["d4_cc_term_suite"].fn(spark, sf_dir),
    )
    return widen(d3, "3_").unionAll(widen(d4, "4_"))


# ===========================================================================
# r11 seventh wave: the cross-modal pairing audit (x187 — which docs
# survive BOTH the c9 image and c10 video curations, per split: the
# joint-training usable set) and the per-source video capacity profile
# (x188 — x170's sheet on the video modality) — funded by consolidating
# the w5/j13 suites into w6_windowtemporal_suite.
# ===========================================================================


def _x187_sql() -> str:
    # one c9 chain + one c10 chain, each MATERIALIZED (referenced once
    # but heavy; materialization keeps DuckDB from re-inlining them into
    # both sides of the FULL OUTER join — the x144 lesson)
    return f"""WITH c9r AS MATERIALIZED (SELECT doc_id, split
            FROM ({member_oracle('c9_multimodal_lsh')}) a),
c10r AS MATERIALIZED (SELECT doc_id, split
            FROM ({member_oracle('c10_video_pipeline')}) b),
j AS (SELECT coalesce(c9r.split, c10r.split) AS split,
             (c9r.doc_id IS NOT NULL) AS has_img,
             (c10r.doc_id IS NOT NULL) AS has_vid
      FROM c9r FULL OUTER JOIN c10r USING (doc_id))
SELECT split,
       CAST(sum(CASE WHEN has_img AND has_vid THEN 1 ELSE 0 END) AS BIGINT)
           AS n_both,
       CAST(sum(CASE WHEN has_img AND NOT has_vid THEN 1 ELSE 0 END)
            AS BIGINT) AS n_image_only,
       CAST(sum(CASE WHEN has_vid AND NOT has_img THEN 1 ELSE 0 END)
            AS BIGINT) AS n_video_only
FROM j GROUP BY split"""


@register(
    "x187_crossmodal_pairs", _x187_sql(), "EXT-04", "EXT-05", tier=1,
)
def x187_crossmodal_pairs(spark, sf_dir):
    """Cross-modal pairing audit: per split, how many documents survived
    BOTH the c9 image curation and the c10 video curation (the set a
    joint image+video training run can actually use), versus one
    modality only — the coverage sheet that decides whether a paired
    objective is feasible or the corpus is effectively unimodal. Both
    pipelines place docs via the same c7 manifest, so split agrees on
    matched rows by construction; one doc_id full-outer join over the
    two survivor manifests, ≤ |splits| rows out.

    Composition (r12, VERDICT r11 'What's wrong: x189' — adjudicated by
    TWO same-session A/Bs, isolated and at full-bench depth, SCALE.md):
    the structural cause of the r11 inflation was the double c7 chain
    (x187 paid curation+tokenize+pack once under the c9 subtree and
    again under c10's) — fixed by the _c9_result/_c10_result/_c7_result
    memos, after which the LAZY UNION form measured at-or-under the
    split-rc (checkpoint-both-manifests) form in isolation (7.78 vs
    8.09 median) and clearly under it at 88-row bench depth (12.6 vs
    16.6 median, all 3 interleaved pairs): the two pipeline chains are
    independent subtrees that fill the cores under one action, the s4
    x84a lesson. Ships lazy; MPS_X187_SPLIT=1 flips to the split-rc
    form for future A/Bs."""
    import os

    from .operators.dedup import persist_pool_mark, release_cached_intermediates

    mark = persist_pool_mark()
    # the two chains are independent past the shared c7 memo — overlap
    # their construction (operators/dedup.overlap, guide §2.6)
    c9r, c10r = D.overlap(
        lambda: _c9_result(spark, sf_dir),
        lambda: _c10_result(spark, sf_dir),
    )
    c9 = c9r.select("doc_id", F.col("split").alias("s9"))
    c10 = c10r.select("doc_id", F.col("split").alias("s10"))
    if os.environ.get("MPS_X187_SPLIT"):
        c9 = c9.localCheckpoint(eager=True)
        c10 = c10.localCheckpoint(eager=True)
        release_cached_intermediates(since=mark)
    j = c9.join(c10, "doc_id", "full_outer").select(
        F.coalesce("s9", "s10").alias("split"),
        F.col("s9").isNotNull().alias("has_img"),
        F.col("s10").isNotNull().alias("has_vid"),
    )
    return j.groupBy("split").agg(
        F.sum((F.col("has_img") & F.col("has_vid")).cast("long"))
        .cast("long").alias("n_both"),
        F.sum((F.col("has_img") & ~F.col("has_vid")).cast("long"))
        .cast("long").alias("n_image_only"),
        F.sum((F.col("has_vid") & ~F.col("has_img")).cast("long"))
        .cast("long").alias("n_video_only"),
    )


def _x188_sql() -> str:
    return f"""WITH hdr AS (SELECT doc_id, n_frames, us_per_frame
            FROM ({member_oracle('x181_video_header_profile')}) z)
SELECT d.source, CAST(count(*) AS BIGINT) AS n_videos,
       CAST(sum(hdr.n_frames) AS BIGINT) AS total_frames,
       CAST(sum(hdr.n_frames * hdr.us_per_frame) AS BIGINT)
           AS total_duration_us,
       CAST(sum(CASE WHEN hdr.n_frames < 3 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_short
FROM hdr JOIN documents d USING (doc_id)
GROUP BY d.source"""


@register(
    "x188_video_source_profile", _x188_sql(), "EXT-04", "EXT-05", tier=1,
)
def x188_video_source_profile(spark, sf_dir):
    """Per-source video corpus capacity sheet (the x170 image sheet on
    the video modality, from HEADERS only — no codec cost): video count,
    total frames, exact integer total duration (Σ n_frames ×
    us_per_frame) and the under-3-frame count the c10 duration gate will
    drop — what a data team reads to budget a video-training ingest per
    crawl source. One header-walk Arrow pass + one map-side-combined
    aggregate; ≤ |sources| rows out."""
    from .operators.multimodal import (
        avi_header_profile,
    )

    docs = _t(spark, sf_dir, "documents")
    hdr = avi_header_profile(consistent_media_payloads(spark, sf_dir))
    return (
        hdr.join(docs.select("doc_id", "source"), "doc_id")
        .groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_videos"),
            F.sum("n_frames").cast("long").alias("total_frames"),
            F.sum(F.col("n_frames") * F.col("us_per_frame"))
            .cast("long").alias("total_duration_us"),
            F.sum((F.col("n_frames") < 3).cast("long"))
            .cast("long").alias("n_short"),
        )
    )


# ---------------------------------------------------------------------------
# w6_windowtemporal_suite — the w5/j13 suites as ONE driver row (funds the
# x189 slot)
# ---------------------------------------------------------------------------


def _w6_sql() -> str:
    return f"""SELECT concat('w_', kind) AS kind, id1, id2, v1, v2, v3, d1,
       d2, s1
FROM ({member_oracle('w5_windowthread_suite')})
UNION ALL
SELECT concat('j_', kind), id1, id2, v1, v2, v3, d1, d2, s1
FROM ({member_oracle('j13_order_temporal_suite')})"""


@register(
    "w6_windowtemporal_suite", _w6_sql(), "EXT-06", "EXT-08", "EXT-09",
    "EXT-ORDER", "EXT-JOIN",
)
def w6_windowtemporal_suite(spark, sf_dir):
    """Driver row consolidating two same-shaped r10 suites (w5 = batch
    window pair + streaming threading, j13 = distributed percentiles +
    temporal joins) — r11 window math: their two slots fund this row
    plus x189. Kind-namespace prefixes, member oracles embedded
    verbatim; w5/j13 and their members stay benched (frozen series
    untouched)."""
    from .registry import REGISTRY

    def widen(df, prefix):
        return df.select(
            F.concat(F.lit(prefix), F.col("kind")).alias("kind"),
            "id1", "id2", "v1", "v2", "v3", "d1", "d2", "s1",
        )

    w = REGISTRY["w5_windowthread_suite"].fn(spark, sf_dir)
    j = REGISTRY["j13_order_temporal_suite"].fn(spark, sf_dir)
    return widen(w, "w_").unionAll(widen(j, "j_"))


# ---------------------------------------------------------------------------
# x189_r11f_ops_suite — the r11 seventh-wave operators under one driver hash
# ---------------------------------------------------------------------------


def _x189_sql() -> str:
    z = "CAST(0 AS BIGINT)"
    zd = "CAST(0.0 AS DOUBLE)"
    return f"""SELECT 'xm' AS kind, {z} AS id1, {z} AS id2, n_both AS v1,
       n_image_only AS v2, n_video_only AS v3, {zd} AS d1, {zd} AS d2,
       split AS s1
FROM ({member_oracle('x187_crossmodal_pairs')})
UNION ALL
SELECT 'vsp', {z}, {z}, n_videos, total_frames, total_duration_us, {zd},
       CAST(n_short AS DOUBLE), source
FROM ({member_oracle('x188_video_source_profile')})"""


@register(
    "x189_r11f_ops_suite", _x189_sql(), "EXT-04", "EXT-05",
)
def x189_r11f_ops_suite(spark, sf_dir):
    """Driver row for the r11 seventh wave — the cross-modal pairing
    audit (x187) and the per-source video capacity profile (x188) —
    union-folded into the shared kind-tagged suite shape (2 small
    members → lazy union per the SCALE.md composition rule)."""
    r187, r188 = D.overlap(
        lambda: x187_crossmodal_pairs(spark, sf_dir),
        lambda: x188_video_source_profile(spark, sf_dir),
    )
    xm = _suite_shape(
        r187, "xm",
        v1=F.col("n_both"), v2=F.col("n_image_only"),
        v3=F.col("n_video_only"), s1=F.col("split"),
    )
    vsp = _suite_shape(
        r188, "vsp",
        v1=F.col("n_videos"), v2=F.col("total_frames"),
        v3=F.col("total_duration_us"), d2=F.col("n_short"),
        s1=F.col("source"),
    )
    return xm.unionAll(vsp)
