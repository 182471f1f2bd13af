"""Round-10 registered queries: the composed multimodal curation
pipeline (c8 — VERDICT r9 'Next round' #1: EXT-04 had real decoders but
no composed row), plus the driver-window row that funds and verifies it
(d3_dedup_core_suite consolidates the x01/x02 dedup standalones to free
the two slots: −2 standalones +1 suite +1 c8 keeps tier-0 ==
DRIVER_WINDOW), per the s4/c7 convention from r9.

Registration/oracle conventions follow r7-r9_queries: every standalone
here is tier 1, every one is also driver-verified same-round, and suite
oracles compose the members' SQL via member_oracle() so member edits
can't drift.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from functools import reduce

from . import analytics_queries  # noqa: F401  (j13 composes p2/j12 oracles)
from . import r7_queries  # noqa: F401  (t3 composes q15's registered oracle)
from . import r8_queries  # noqa: F401  (t3 composes t2's registered oracle)
from . import r9_queries  # noqa: F401  (c8 composes c7's registered oracle)
from .extension_queries import _suite_shape
from .operators import audit as A
from .operators import dedup as D
from .operators.multimodal import attach_bmp_payload, decode_payloads
from .registry import _t, member_oracle, register

# ---------------------------------------------------------------------------
# c8 — the composed multimodal curation pipeline
# ---------------------------------------------------------------------------

#: Every 13th payload is corrupted with a 2-zero-byte prefix so the
#: decode-validity gate has real work: no image container's magic starts
#: 0x0000 (PNG \x89PNG, BMP 'BM', GIF 'GIF8', JPEG \xff\xd8), so
#: parse_image_header returns None for exactly these rows and the decode
#: falls back to the declared 'application/octet-stream' — making
#: "mime = 'image/bmp'" a REAL byte-parse-driven gate with the closed-form
#: oracle predicate doc_id % 13 <> 0.
C8_CORRUPT_MOD = 13

#: Dimension quality gate: drop tiny images. The BMP fixture's dims are a
#: closed form of the text (width = 16 + first-codepoint % 64, height =
#: 16 + byte-length % 64 — attach_bmp_payload), so the gate is
#: oracle-exact while still being read from the ACTUAL header bytes on
#: the Spark side.
C8_MIN_DIM = 24


def _c8_mm(docs):
    """The c8 multimodal fixture: genuine BMP payloads (attach_bmp_payload)
    with every C8_CORRUPT_MOD-th payload corrupted and the declared meta
    mime downgraded to 'application/octet-stream' so only a successful
    header parse can claim 'image/bmp'."""
    mm = attach_bmp_payload(docs)
    corrupted = F.when(
        F.col("doc_id") % C8_CORRUPT_MOD == 0,
        F.concat(F.unhex(F.lit("0000")), F.col("payload")),
    ).otherwise(F.col("payload"))
    return mm.select(
        "doc_id",
        corrupted.alias("payload"),
        F.struct(
            F.length(corrupted).cast("long").alias("n_bytes"),
            F.lit("application/octet-stream").alias("mime"),
        ).alias("meta"),
    )


def _c8_ctes(materialized: bool = False) -> str:
    """The c8 image-curation chain's CTE body (mm → gate → keep → qual),
    shared by the c8 oracle (final paired manifest) and the x154 funnel
    oracle (per-stage counts) so the stage definitions exist once — the
    _c1_ctes twin for the multimodal side. The oracle can't parse blobs,
    but every stage is a closed form of (doc_id, text): validity = the
    corruption rule, dims = the BMP fixture's closed form (x14's
    oracle), payload equality = text equality (payload bytes are
    header(text-derived dims) + UTF-8 text, an injective function of
    text). ``materialized`` is for composers referencing several stages
    at once (DuckDB inlines plain CTEs per reference — the x144
    lesson)."""
    m = " MATERIALIZED" if materialized else ""
    return f"""mm AS{m} (SELECT doc_id, text,
              CAST(54 + octet_length(encode(text)) AS BIGINT) AS n_bytes,
              CAST(16 + (CASE WHEN length(text) = 0 THEN 0
                              ELSE ascii(substr(text, 1, 1)) END) % 64
                   AS BIGINT) AS width,
              CAST(16 + octet_length(encode(text)) % 64 AS BIGINT) AS height
       FROM documents),
gate AS{m} (SELECT * FROM mm WHERE doc_id % {C8_CORRUPT_MOD} <> 0),
keep AS{m} (SELECT * FROM (
           SELECT *, min(doc_id) OVER (PARTITION BY text) AS mn FROM gate)
         WHERE doc_id = mn),
qual AS{m} (SELECT * FROM keep
         WHERE width >= {C8_MIN_DIM} AND height >= {C8_MIN_DIM})"""


def _c8_sql() -> str:
    return f"""WITH c7m AS (SELECT doc_id, split, shard
             FROM ({member_oracle('c7_pretraining_pipeline')}) z),
{_c8_ctes()}
SELECT q.doc_id, q.n_bytes, q.width, q.height, c7m.split, c7m.shard
FROM qual q JOIN c7m USING (doc_id)"""


@register(
    "c8_multimodal_pipeline", _c8_sql(), "EXT-01", "EXT-04", "EXT-05",
)
def c8_multimodal_pipeline(spark, sf_dir):
    """The composed MULTIMODAL curation pipeline (VERDICT r9 #1) — the c7
    endgame pattern applied to the image side of a paired dataset, each
    stage consuming the previous stage's output:

      1. decode-validity gate: parse_image_header reads the ACTUAL
         header bytes per payload (x14's real Arrow decode); only a
         successful BMP parse yields mime 'image/bmp' (corrupted
         payloads fall back to the declared octet-stream mime and drop);
      2. exact payload dedup: md5(payload) computed JVM-side rides
         through the decode pass (decode_payloads carry_cols), min
         doc_id wins per payload group — x01's rule on the BYTES, the
         image analog of text exact-dedup;
      3. dimension quality gate: width/height >= 24, read from the
         decoded header, the "drop tiny thumbnails" gate a real
         image-curation run applies;
      4. pair with the training layout: join survivors to the c7
         split/shard manifest — the (payload, caption) rows a paired
         image-text run would feed, placed in the SAME split/shard
         layout as their captions so no pair straddles splits.

    Output: one row per surviving image with its decoded n_bytes/dims
    and its c7 split/shard. ONE composed oracle (closed forms of every
    stage over the c7 member oracle) hash-checks the stage plumbing.

    Scale: one Arrow decode pass (hash carried through — no second
    payload scan), one dedup shuffle on the 16-byte hash, a row-local
    gate, one doc_id equi-join to the manifest. No stage widens the
    payload column beyond the single decode pass."""
    from .r9_queries import _c7_result

    # decode chain vs c7 layout chain — independent until the final join;
    # overlap their construction (dedup.overlap, guide §2.6)
    st, manifest = D.overlap(
        lambda: _c8_stage_frames(spark, sf_dir),
        lambda: _c7_result(spark, sf_dir).select("doc_id", "split", "shard"),
    )
    return st["qual"].join(manifest, "doc_id").select(
        "doc_id", "n_bytes", "width", "height", "split", "shard"
    )


#: The c8 stage frames, memoized per (session, sf_dir) with the same
#: foreign-session eviction as r9's _C1_MANIFEST_CACHE: c8, x154 and
#: x155 each consume the image-curation chain, and inside the x156
#: lazy-union row two members would otherwise carry INDEPENDENT decode
#: subtrees and pay the Arrow pass twice in one action. The persisted
#: members re-persist through the tracked pool on every access so
#: bench-harness releases stay safe.
_C8_FRAMES_CACHE: dict = {}


def _c8_stage_frames(spark, sf_dir):
    """The c8 image-curation chain's stage frames, shared by c8 (final
    paired manifest), the x154 funnel (per-stage counts) and x155 (via
    c8) so the stage definitions exist once — the _c1_stage_frames twin
    on the Spark side. Returns ``{"corpus", "valid", "keep", "qual"}``;
    valid/keep persist (each feeds the next stage AND a funnel count)."""
    app = spark.sparkContext.applicationId

    def _build():
        docs = _t(spark, sf_dir, "documents")
        mm = _c8_mm(docs).withColumn("pmd5", F.md5("payload"))
        dec = decode_payloads(mm, carry_cols=("pmd5",))
        valid = dec.filter(F.col("mime") == "image/bmp")
        keep = (
            valid.withColumn(
                "__mn", F.min("doc_id").over(Window.partitionBy("pmd5"))
            )
            .filter(F.col("doc_id") == F.col("__mn"))
            .drop("__mn", "pmd5", "mime")
        )
        qual = keep.filter(
            (F.col("width") >= C8_MIN_DIM) & (F.col("height") >= C8_MIN_DIM)
        )
        return {"corpus": docs, "valid": valid, "keep": keep, "qual": qual}

    st = D.memo_get_or_build(_C8_FRAMES_CACHE, app, (app, sf_dir), _build)
    D._persist(st["valid"])
    D._persist(st["keep"])
    return st


# ---------------------------------------------------------------------------
# d3_dedup_core_suite — the x01/x02 dedup standalones as ONE driver row
# (funds the c8 slot)
# ---------------------------------------------------------------------------


def _d3_sql() -> str:
    z = "CAST(0 AS BIGINT)"
    zd = "CAST(0.0 AS DOUBLE)"
    return f"""SELECT 'ex' AS kind, keep_id AS id1, {z} AS id2, n_copies AS v1,
       {z} AS v2, {z} AS v3, {zd} AS d1, {zd} AS d2, text AS s1
FROM ({member_oracle('x01_dedup_exact')})
UNION ALL
SELECT 'jac', doc_a, doc_b, {z}, {z}, {z}, CAST(jaccard AS DOUBLE), {zd},
       CAST(NULL AS VARCHAR)
FROM ({member_oracle('x02_dedup_ngram_jaccard')})"""


@register(
    "d3_dedup_core_suite", _d3_sql(), "EXT-01", "EXT-02", "OP-05",
    tier=1,  # r11: consolidated into d5_dedup_agg_suite (stays in bench HEADLINE)
)
def d3_dedup_core_suite(spark, sf_dir):
    """Driver row consolidating the core dedup standalones (x01 exact
    min-id dedup, x02 inverted-index n-gram Jaccard — r10 window math:
    their two slots fund this row plus the c8 pipeline row). Member
    oracles embedded verbatim; x02 stays in the bench HEADLINE for the
    frozen r4 series."""
    from .extension_queries import x01_dedup_exact, x02_dedup_ngram_jaccard

    __r0, __r1 = D.overlap(  # guide §2.6
        lambda: x01_dedup_exact(spark, sf_dir),
        lambda: x02_dedup_ngram_jaccard(spark, sf_dir),
    )
    ex = _suite_shape(
        __r0, "ex",
        id1=F.col("keep_id"), v1=F.col("n_copies"), s1=F.col("text"),
    )
    jac = _suite_shape(
        __r1, "jac",
        id1=F.col("doc_a"), id2=F.col("doc_b"), d1=F.col("jaccard"),
    )
    return ex.unionAll(jac)


# ===========================================================================
# r10 second wave: the c8 audit half — per-stage multimodal funnel (x154)
# and the paired-dataset profile (x155) — funded by consolidating the
# x05/x06 embedding standalones into s5_embcore_suite.
# ===========================================================================


def _x154_sql() -> str:
    # every stage CTE is referenced twice (by the next stage AND by the
    # counts union), so the chain materializes — the x144/x152 DuckDB
    # CTE-inlining lesson; c7m is referenced once and stays plain.
    return f"""WITH c7m AS (SELECT doc_id
             FROM ({member_oracle('c7_pretraining_pipeline')}) z),
{_c8_ctes(materialized=True)},
paired AS (SELECT q.doc_id FROM qual q JOIN c7m USING (doc_id)),
st AS (SELECT 'raw' AS stage, doc_id FROM mm
  UNION ALL SELECT 'valid', doc_id FROM gate
  UNION ALL SELECT 'unique', doc_id FROM keep
  UNION ALL SELECT 'sized', doc_id FROM qual
  UNION ALL SELECT 'paired', doc_id FROM paired)
SELECT stage, CAST(count(*) AS BIGINT) AS n_docs FROM st GROUP BY stage"""


@register("x154_multimodal_funnel", _x154_sql(), "EXT-04", "EXT-05", tier=1)
def x154_multimodal_funnel(spark, sf_dir):
    """Per-stage multimodal curation funnel (the x152 pattern applied to
    c8): document counts at every image-curation stage — raw corpus →
    decode-valid → payload-unique → dimension-sized → caption-paired.
    A second driver-hashed witness of the c8 stage plumbing from a
    different angle than the manifest row: a gate wired to the wrong
    input shifts these counts even when the final manifest happens to
    agree. Stage definitions shared with c8 itself (_c8_stage_frames /
    _c8_ctes — one definition, two consumers); 5 rows out at any
    corpus scale."""
    from .r9_queries import _c7_result

    st = _c8_stage_frames(spark, sf_dir)
    paired = st["qual"].join(
        _c7_result(spark, sf_dir).select("doc_id"),
        "doc_id",
        "left_semi",
    )
    stages = [
        ("raw", st["corpus"]),
        ("valid", st["valid"]),
        ("unique", st["keep"]),
        ("sized", st["qual"]),
        ("paired", paired),
    ]
    outs = [
        f.agg(F.count("*").cast("long").alias("n_docs")).select(
            F.lit(name).alias("stage"), "n_docs"
        )
        for name, f in stages
    ]
    return reduce(lambda a, b: a.unionAll(b), outs)


def _x155_sql() -> str:
    from .extension_queries import _TOKS_CTE

    # caption tokens come from the SAME corpus-wide toks CTE c7's n_tok is
    # built on (len(w) — byte-identical definition), NOT from embedding the
    # whole c7 oracle a second time: c8r already contains one c1+c7 chain,
    # and a second chain measured 150s plain / 60s materialized at sf0.01
    # vs ~20s for this form (the x144 lesson's budget arithmetic).
    return f"""WITH c8r AS MATERIALIZED (SELECT doc_id, split, n_bytes
            FROM ({member_oracle('c8_multimodal_pipeline')}) z),
{_TOKS_CTE}
SELECT c8r.split, CAST(count(*) AS BIGINT) AS n_pairs,
       CAST(sum(c8r.n_bytes) AS BIGINT) AS image_bytes,
       CAST(sum(len(toks.w)) AS BIGINT) AS caption_tok
FROM c8r JOIN toks USING (doc_id)
GROUP BY c8r.split"""


@register(
    "x155_paired_profile", _x155_sql(), "EXT-04", "EXT-05", tier=1,
)
def x155_paired_profile(spark, sf_dir):
    """Paired image-text dataset profile per split: pair count, total
    image bytes, total caption tokens — the size sheet a multimodal
    training run budgets loaders and context from, over exactly the c8
    survivors. n_tok joins from the c7 manifest (already driver-hashed
    there) rather than re-tokenizing, so the two rows cannot disagree
    on tokenization; ≤ |splits| (3) rows out."""
    from .r9_queries import _c7_result

    pairs = c8_multimodal_pipeline(spark, sf_dir).select(
        "doc_id", "split", "n_bytes"
    )
    ntok = _c7_result(spark, sf_dir).select("doc_id", "n_tok")
    return (
        pairs.join(ntok, "doc_id")
        .groupBy("split")
        .agg(
            F.count("*").cast("long").alias("n_pairs"),
            F.sum("n_bytes").cast("long").alias("image_bytes"),
            F.sum("n_tok").cast("long").alias("caption_tok"),
        )
    )


# ---------------------------------------------------------------------------
# s5_embcore_suite — the x05/x06 embedding standalones as ONE driver row
# (funds the x156 slot)
# ---------------------------------------------------------------------------


def _s5_sql() -> str:
    z = "CAST(0 AS BIGINT)"
    zd = "CAST(0.0 AS DOUBLE)"
    return f"""SELECT 'cos' AS kind, doc_a AS id1, doc_b AS id2, {z} AS v1,
       {z} AS v2, {z} AS v3, CAST(cos_sim AS DOUBLE) AS d1, {zd} AS d2,
       CAST(NULL AS VARCHAR) AS s1
FROM ({member_oracle('x05_dedup_embedding_cosine')})
UNION ALL
SELECT 'knn', q_id, n_id, rk, {z}, {z}, round(score, 4), {zd},
       CAST(NULL AS VARCHAR)
FROM ({member_oracle('x06_knn_bruteforce')})"""


@register(
    "s5_embcore_suite", _s5_sql(), "EXT-02", "EXT-03",
    tier=1,  # r12: consolidated into m12_embsetwin_suite (stays in bench HEADLINE)
)
def s5_embcore_suite(spark, sf_dir):
    """Driver row consolidating the embedding-core standalones (x05
    banded-SRP cosine near-dup pairs, x06 brute-force kNN ground truth —
    r10 window math: their two slots fund this row plus x156). Member
    oracles embedded verbatim; x05/x06 stay in the bench HEADLINE for
    the frozen r4 series."""
    from .extension_queries import x05_dedup_embedding_cosine, x06_knn_bruteforce

    __r0, __r1 = D.overlap(  # guide §2.6
        lambda: x05_dedup_embedding_cosine(spark, sf_dir),
        lambda: x06_knn_bruteforce(spark, sf_dir),
    )
    cos = _suite_shape(
        __r0, "cos",
        id1=F.col("doc_a"), id2=F.col("doc_b"), d1=F.col("cos_sim"),
    )
    knn = _suite_shape(
        __r1, "knn",
        id1=F.col("q_id"), id2=F.col("n_id"), v1=F.col("rk"),
        d1=F.col("score"),
    )
    return cos.unionAll(knn)


# ---------------------------------------------------------------------------
# x156_r10b_ops_suite — the r10 second-wave operators under one driver hash
# ---------------------------------------------------------------------------


def _x156_sql() -> str:
    z = "CAST(0 AS BIGINT)"
    zd = "CAST(0.0 AS DOUBLE)"
    return f"""SELECT 'fun' AS kind, {z} AS id1, {z} AS id2, n_docs AS v1,
       {z} AS v2, {z} AS v3, {zd} AS d1, {zd} AS d2, stage AS s1
FROM ({member_oracle('x154_multimodal_funnel')})
UNION ALL
SELECT 'pair', {z}, {z}, n_pairs, image_bytes, caption_tok, {zd}, {zd}, split
FROM ({member_oracle('x155_paired_profile')})"""


@register(
    "x156_r10b_ops_suite", _x156_sql(), "EXT-04", "EXT-05",
    tier=1,  # r11: consolidated into m3_r10bc_suite (stays in bench HEADLINE)
)
def x156_r10b_ops_suite(spark, sf_dir):
    """Driver row for the r10 second wave — the multimodal curation
    funnel (x154) and the paired-dataset profile (x155), the audit half
    of the c8 pipeline — union-folded into the shared kind-tagged suite
    shape (2 small members → lazy union per the SCALE.md composition
    rule; the heavy decode/curation subtrees are shared through the
    memoized _c8_stage_frames and the c1 manifest memo)."""
    __r0, __r1 = D.overlap(  # guide §2.6
        lambda: x154_multimodal_funnel(spark, sf_dir),
        lambda: x155_paired_profile(spark, sf_dir),
    )
    fun = _suite_shape(
        __r0, "fun",
        v1=F.col("n_docs"), s1=F.col("stage"),
    )
    pair = _suite_shape(
        __r1, "pair",
        v1=F.col("n_pairs"), v2=F.col("image_bytes"),
        v3=F.col("caption_tok"), s1=F.col("split"),
    )
    return fun.unionAll(pair)


# ===========================================================================
# r10 third wave: image perceptual-hash dedup — the aHash signature (x157)
# and banded hamming near-dup pairing (x158) over REAL decoded pixels —
# funded by consolidating the x27/x28 standalones into d4_cc_term_suite.
# ===========================================================================

#: Memoized image signature / pair frames (r12 optimization round) — the
#: video/audio sig+pairs memo contract applied to the BMP modality: seven
#: rows (x157, x158, x163, x167, x169, x176, x172-via-sig) each rebuilt
#: `image_ahash(attach_consistent_bmp_payload(documents))` and five of
#: them its `image_neardup_pairs` output, so the m3/m4/m16 consolidation
#: rows paid the signature kernel and the band/posting-list pass once PER
#: member. Same contract as r12's _SIG_FRAME_CACHE: keyed on
#: applicationId + sf_dir, foreign-session eviction, re-persist +
#: eager-materialize on access (operators/dedup.materialize_shared),
#: released between bench rows — every timed row still computes from
#: parquet. MPS_IMG_MEMO_OFF=1 restores the per-consumer builds for A/Bs.
#: c9 and the GIF/JPEG signature rows keep their own builds (different
#: payload inputs).
_IMG_FRAME_CACHE: dict = {}


def _img_memo_off() -> bool:
    import os

    return bool(os.environ.get("MPS_IMG_MEMO_OFF"))


def _memo_img_frame(spark, key, build):
    app = spark.sparkContext.applicationId
    key = (app,) + key
    df = D.memo_get_or_build(_IMG_FRAME_CACHE, app, key, build)
    return D.materialize_shared(D._persist(df), ("img",) + key)


def image_sig_frame(spark, sf_dir):
    """The memoized persisted aHash signature frame (doc_id, h_hi, h_lo)
    over the consistent-BMP payloads."""
    from .operators.multimodal import attach_consistent_bmp_payload, image_ahash

    return _memo_img_frame(
        spark, (sf_dir, "ahash"),
        lambda: image_ahash(
            attach_consistent_bmp_payload(_t(spark, sf_dir, "documents"))
        ),
    )


def image_dsig_frame(spark, sf_dir):
    """The memoized persisted dHash signature frame (x164's kernel) over
    the same consistent-BMP payloads (x164 + x167's re-score side)."""
    from .operators.multimodal import attach_consistent_bmp_payload, image_dhash

    return _memo_img_frame(
        spark, (sf_dir, "dhash"),
        lambda: image_dhash(
            attach_consistent_bmp_payload(_t(spark, sf_dir, "documents"))
        ),
    )


def image_pairs_frame(spark, sf_dir):
    """The memoized banded near-dup pair frame (doc_a, doc_b, hamming ≤ 3)
    over :func:`image_sig_frame` (consumers x158/x163/x167/x169?/x176)."""
    from .operators.multimodal import image_neardup_pairs

    return _memo_img_frame(
        spark, (sf_dir, "pairs"),
        lambda: image_neardup_pairs(image_sig_frame(spark, sf_dir)),
    )


def _x157_sql() -> str:
    from .extension_queries import _CONSISTENT_DIMS_CTES
    from .operators.multimodal import ahash_sql

    return f"WITH {_CONSISTENT_DIMS_CTES}\n{ahash_sql('dims')}"


@register("x157_image_ahash", _x157_sql(), "EXT-02", "EXT-04", tier=1)
def x157_image_ahash(spark, sf_dir):
    """Average-hash perceptual signature per image
    (:func:`operators.multimodal.image_ahash`): the REAL numpy BMP
    decoder extracts pixel arrays from spec-consistent payloads, the
    nearest-neighbor 8×8 resample + strict integer mean threshold emit
    64 bits as two 32-bit halves. The oracle recomputes the identical
    bits from the fixture's closed form — so the driver hash proves the
    decode→resample→threshold kernel bit-for-bit, the image analog of
    the x04 SimHash row."""
    from .operators.multimodal import attach_consistent_bmp_payload, image_ahash

    if _img_memo_off():
        return image_ahash(
            attach_consistent_bmp_payload(_t(spark, sf_dir, "documents"))
        )
    return image_sig_frame(spark, sf_dir)


def _x158_sql() -> str:
    from .extension_queries import _CONSISTENT_DIMS_CTES
    from .operators.multimodal import ahash_pairs_sql, ahash_sql

    # sig feeds the 4-way band union AND both verify joins — MATERIALIZED
    # per the x144 CTE-inlining lesson
    return f"""WITH {_CONSISTENT_DIMS_CTES},
sig AS MATERIALIZED ({ahash_sql('dims')}),
{ahash_pairs_sql('sig')}"""


@register("x158_image_neardup", _x158_sql(), "EXT-02", "EXT-04", tier=1)
def x158_image_neardup(spark, sf_dir):
    """Near-duplicate image pairs
    (:func:`operators.multimodal.image_neardup_pairs`): banded-LSH
    candidates (4 exact 16-bit bands — pigeonhole-complete at the
    hamming <= 3 threshold) verified by exact 64-bit hamming distance
    over the x157 signatures. THE dedup operator a multimodal corpus
    runs that text dedup can't express: re-encoded/near-identical
    images pair even when their byte payloads differ."""
    from .operators.multimodal import (
        attach_consistent_bmp_payload,
        image_ahash,
        image_neardup_pairs,
    )

    if _img_memo_off():
        sig = image_ahash(
            attach_consistent_bmp_payload(_t(spark, sf_dir, "documents"))
        )
        return image_neardup_pairs(sig)
    return image_pairs_frame(spark, sf_dir)


# ---------------------------------------------------------------------------
# d4_cc_term_suite — the x27/x28 standalones as ONE driver row (funds the
# x159 slot)
# ---------------------------------------------------------------------------


def _d4_sql() -> str:
    z = "CAST(0 AS BIGINT)"
    zd = "CAST(0.0 AS DOUBLE)"
    return f"""SELECT 'cc' AS kind, doc_id AS id1, rep AS id2,
       CAST(keep AS BIGINT) AS v1, {z} AS v2, {z} AS v3, {zd} AS d1,
       {zd} AS d2, CAST(NULL AS VARCHAR) AS s1
FROM ({member_oracle('x27_dedup_connected_components')})
UNION ALL
SELECT 'tdf', doc_id, {z}, tf, df, rk, {zd}, {zd}, term
FROM ({member_oracle('x28_term_doc_freq')})"""


@register(
    "d4_cc_term_suite", _d4_sql(), "EXT-01", "EXT-02", "EXT-05", "OP-28",
    tier=1,  # r11: consolidated into d5_dedup_agg_suite (stays in bench HEADLINE)
)
def d4_cc_term_suite(spark, sf_dir):
    """Driver row consolidating the connected-components dedup (x27) and
    term-document-frequency (x28) standalones — r10 window math: their
    two slots fund this row plus x159. Member oracles embedded verbatim;
    both stay in the bench HEADLINE for the frozen r4 series."""
    from .extension_queries import (
        x27_dedup_connected_components,
        x28_term_doc_freq,
    )

    __r0, __r1 = D.overlap(  # guide §2.6
        lambda: x27_dedup_connected_components(spark, sf_dir),
        lambda: x28_term_doc_freq(spark, sf_dir),
    )
    cc = _suite_shape(
        __r0, "cc",
        id1=F.col("doc_id"), id2=F.col("rep"), v1=F.col("keep").cast("long"),
    )
    tdf = _suite_shape(
        __r1, "tdf",
        id1=F.col("doc_id"), v1=F.col("tf"), v2=F.col("df"), v3=F.col("rk"),
        s1=F.col("term"),
    )
    return cc.unionAll(tdf)


# ---------------------------------------------------------------------------
# x159_r10c_ops_suite — the r10 third-wave operators under one driver hash
# ---------------------------------------------------------------------------


def _x159_sql() -> str:
    z = "CAST(0 AS BIGINT)"
    zd = "CAST(0.0 AS DOUBLE)"
    return f"""SELECT 'ah' AS kind, doc_id AS id1, {z} AS id2, h_hi AS v1,
       h_lo AS v2, {z} AS v3, {zd} AS d1, {zd} AS d2,
       CAST(NULL AS VARCHAR) AS s1
FROM ({member_oracle('x157_image_ahash')})
UNION ALL
SELECT 'ham', doc_a, doc_b, hamming, {z}, {z}, {zd}, {zd},
       CAST(NULL AS VARCHAR)
FROM ({member_oracle('x158_image_neardup')})"""


@register(
    "x159_r10c_ops_suite", _x159_sql(), "EXT-02", "EXT-04",
    tier=1,  # r11: consolidated into m3_r10bc_suite (stays in bench HEADLINE)
)
def x159_r10c_ops_suite(spark, sf_dir):
    """Driver row for the r10 third wave — the image aHash signature
    (x157) and the banded hamming near-dup pairing (x158) — union-folded
    into the shared kind-tagged suite shape (2 small members → lazy
    union per the SCALE.md composition rule)."""
    __r0, __r1 = D.overlap(  # guide §2.6
        lambda: x157_image_ahash(spark, sf_dir),
        lambda: x158_image_neardup(spark, sf_dir),
    )
    ah = _suite_shape(
        __r0, "ah",
        id1=F.col("doc_id"), v1=F.col("h_hi"), v2=F.col("h_lo"),
    )
    ham = _suite_shape(
        __r1, "ham",
        id1=F.col("doc_a"), id2=F.col("doc_b"), v1=F.col("hamming"),
    )
    return ah.unionAll(ham)


# ===========================================================================
# r10 fourth wave: permutation entropy (x160 — the statistic x150's
# histogram supports) and curriculum phases (x161 — quality-quartile
# training schedule over the c1 survivors) — funded by consolidating the
# x15_16/x24 standalones into w5_windowthread_suite.
# ===========================================================================


@register(
    "x160_permutation_entropy",
    A.permutation_entropy_daily_sql(r9_queries._X149_EVENTS_CTE),
    "EXT-ANALYTICS", tier=1,
)
def x160_permutation_entropy(spark, sf_dir):
    """Per-type normalized permutation entropy over the daily-count
    series (:func:`operators.audit.permutation_entropy_daily`, Bandt &
    Pompe 2002): the one-number series-complexity score the x150
    ordinal-pattern histogram exists to support — 1 = maximally
    irregular, 0 = a single repeated shape. Fixed pivot columns keep
    the ln-term chain textual-order deterministic in both engines."""
    return A.permutation_entropy_daily(_t(spark, sf_dir, "events"))


def _x161_sql() -> str:
    from .operators import textanalysis as T

    return f"""WITH c1m AS MATERIALIZED (SELECT doc_id, quality
             FROM ({member_oracle('c1_curation_pipeline')}) z),
{T.curriculum_phases_sql('c1m')}"""


@register(
    "x161_curriculum_phases", _x161_sql(), "EXT-05", tier=1,
)
def x161_curriculum_phases(spark, sf_dir):
    """Curriculum-learning phase assignment over the c1 survivors
    (:func:`operators.textanalysis.curriculum_phases`): quality-quartile
    phases 1..4 via exact discrete percentiles (the p2 cum-count
    device) — the easy→hard schedule a curriculum data loader reads,
    computed the scalable 2-pass way (value-grouped boundary pass +
    row-local CASE against a 1-row broadcast), never a global ntile.
    Consumes the memoized c1 result frame so x174's union action (and
    any same-session consumer) pays the curation chain once."""
    from .operators import textanalysis as T
    from .r9_queries import _c1_result

    return T.curriculum_phases(_c1_result(spark, sf_dir))


# ---------------------------------------------------------------------------
# w5_windowthread_suite — the x15_16/x24 standalones as ONE driver row
# (funds the x162 slot)
# ---------------------------------------------------------------------------


def _w5_sql() -> str:
    z = "CAST(0 AS BIGINT)"
    zd = "CAST(0.0 AS DOUBLE)"
    return f"""SELECT concat('wb_', kind) AS kind, window_start_us AS id1,
       {z} AS id2, n_events AS v1, {z} AS v2, {z} AS v3,
       round(sum_value, 2) AS d1, {zd} AS d2, CAST(NULL AS VARCHAR) AS s1
FROM ({member_oracle('x15_16_window_batch')})
UNION ALL
SELECT 'sth', id, coalesce(response_to, {z}), {z},
       CAST(response_to IS NULL AS BIGINT), {z}, {zd}, {zd},
       CAST(NULL AS VARCHAR)
FROM ({member_oracle('x24_stream_threading')})"""


@register(
    "w5_windowthread_suite", _w5_sql(), "EXT-06", "EXT-08", "EXT-09",
    tier=1,  # r11: consolidated into w6_windowtemporal_suite (stays benched)
)
def w5_windowthread_suite(spark, sf_dir):
    """Driver row consolidating the batch window-agg pair (x15_16) and
    the streaming threading replay (x24) — r10 window math: their two
    slots fund this row plus x162. x24's nullable response_to rides as
    (coalesce(x, 0), is-null flag) so the hash never formats a NULL
    long. Member oracles embedded verbatim; both members stay
    registered tier 1 (neither was a HEADLINE standalone — the frozen
    r4 series' window row is x15_window_tumbling, untouched)."""
    from .extension_queries import x15_16_window_batch, x24_stream_threading

    wb = x15_16_window_batch(spark, sf_dir).select(
        F.concat(F.lit("wb_"), F.col("kind")).alias("kind"),
        F.col("window_start_us").cast("long").alias("id1"),
        F.lit(0).cast("long").alias("id2"),
        F.col("n_events").cast("long").alias("v1"),
        F.lit(0).cast("long").alias("v2"),
        F.lit(0).cast("long").alias("v3"),
        F.round("sum_value", 2).cast("double").alias("d1"),
        F.lit(0.0).alias("d2"),
        F.lit(None).cast("string").alias("s1"),
    )
    st = _suite_shape(
        x24_stream_threading(spark, sf_dir), "sth",
        id1=F.col("id"),
        id2=F.coalesce(F.col("response_to"), F.lit(0)),
        v2=F.col("response_to").isNull().cast("long"),
    )
    return wb.unionAll(st)


# ---------------------------------------------------------------------------
# x162_r10d_ops_suite — the r10 fourth-wave operators under one driver hash
# ---------------------------------------------------------------------------


def _x162_sql() -> str:
    z = "CAST(0 AS BIGINT)"
    zd = "CAST(0.0 AS DOUBLE)"
    return f"""SELECT 'pe' AS kind, {z} AS id1, {z} AS id2, n_win AS v1,
       {z} AS v2, {z} AS v3, pe AS d1, {zd} AS d2, event_type AS s1
FROM ({member_oracle('x160_permutation_entropy')})
UNION ALL
SELECT 'cur', doc_id, {z}, phase, {z}, {z}, CAST(quality AS DOUBLE), {zd},
       CAST(NULL AS VARCHAR)
FROM ({member_oracle('x161_curriculum_phases')})"""


@register(
    "x162_r10d_ops_suite", _x162_sql(), "EXT-05", "EXT-ANALYTICS",
    tier=1,  # r11: consolidated into m4_r10de_suite (stays in bench HEADLINE)
)
def x162_r10d_ops_suite(spark, sf_dir):
    """Driver row for the r10 fourth wave — permutation entropy (x160)
    and curriculum phases (x161) — union-folded into the shared
    kind-tagged suite shape (2 small members → lazy union per the
    SCALE.md composition rule)."""
    __r0, __r1 = D.overlap(  # guide §2.6
        lambda: x160_permutation_entropy(spark, sf_dir),
        lambda: x161_curriculum_phases(spark, sf_dir),
    )
    pe = _suite_shape(
        __r0, "pe",
        v1=F.col("n_win"), d1=F.col("pe"), s1=F.col("event_type"),
    )
    cur = _suite_shape(
        __r1, "cur",
        id1=F.col("doc_id"), v1=F.col("phase"), d1=F.col("quality"),
    )
    return pe.unionAll(cur)


# ===========================================================================
# r10 fifth wave: image dedup keep-one (x163 — the CC collapse turning
# x158's pairs into a survivor manifest) and the dHash companion signature
# (x164) — funded by consolidating the p2/j12 standalones into
# j13_order_temporal_suite.
# ===========================================================================


def _x163_sql() -> str:
    # p referenced twice (both edge directions) — MATERIALIZED per the
    # x144 CTE-inlining lesson; the node set is exactly x157's doc set
    return f"""WITH RECURSIVE
p AS MATERIALIZED (SELECT doc_a, doc_b
     FROM ({member_oracle('x158_image_neardup')}) z),
nodes AS (SELECT doc_id FROM ({member_oracle('x157_image_ahash')}) w),
edges AS (SELECT doc_a AS src, doc_b AS dst FROM p
          UNION ALL SELECT doc_b, doc_a FROM p),
reach AS (SELECT doc_id, doc_id AS n FROM nodes
          UNION
          SELECT r.doc_id, e.dst FROM reach r JOIN edges e ON e.src = r.n)
SELECT doc_id, CAST(min(n) AS BIGINT) AS rep, (doc_id = min(n)) AS keep
FROM reach GROUP BY doc_id"""


@register("x163_image_dedup_keep_one", _x163_sql(), "EXT-02", "EXT-04", tier=1)
def x163_image_dedup_keep_one(spark, sf_dir):
    """Image dedup DECISION (the x27 collapse applied to the image
    graph): connected components over the x158 near-dup pairs, min-id
    representative per cluster, keep = is-the-representative —
    singletons keep themselves without ever entering the iterative
    part. Turns the pair list into the survivor manifest an image
    curation run actually applies."""
    from .operators.multimodal import (
        attach_consistent_bmp_payload,
        image_ahash,
        image_neardup_pairs,
    )

    if _img_memo_off():
        sig = D._persist(
            image_ahash(
                attach_consistent_bmp_payload(_t(spark, sf_dir, "documents"))
            )
        )
        pairs = image_neardup_pairs(sig).select("doc_a", "doc_b")
    else:
        sig = image_sig_frame(spark, sf_dir)
        pairs = image_pairs_frame(spark, sf_dir).select("doc_a", "doc_b")
    return D.dedup_keep_one(sig.select("doc_id"), pairs)


def _x164_sql() -> str:
    from .extension_queries import _CONSISTENT_DIMS_CTES
    from .operators.multimodal import dhash_sql

    return f"WITH {_CONSISTENT_DIMS_CTES}\n{dhash_sql('dims')}"


@register("x164_image_dhash", _x164_sql(), "EXT-02", "EXT-04", tier=1)
def x164_image_dhash(spark, sf_dir):
    """Difference-hash perceptual signature per image
    (:func:`operators.multimodal.image_dhash`): horizontal-gradient
    bits over the real decoded pixels' (grid+1)×grid resample — aHash's
    standard production companion (a pair surviving both hashes is a
    far stronger near-dup signal; different failure modes). Oracle
    recomputes identical bits from the consistent-BMP closed form."""
    from .operators.multimodal import attach_consistent_bmp_payload, image_dhash

    if _img_memo_off():
        return image_dhash(
            attach_consistent_bmp_payload(_t(spark, sf_dir, "documents"))
        )
    return image_dsig_frame(spark, sf_dir)


# ---------------------------------------------------------------------------
# j13_order_temporal_suite — the p2/j12 standalones as ONE driver row
# (funds the x165 slot)
# ---------------------------------------------------------------------------


def _j13_sql() -> str:
    z = "CAST(0 AS BIGINT)"
    zd = "CAST(0.0 AS DOUBLE)"
    return f"""SELECT 'pct' AS kind, {z} AS id1, {z} AS id2,
       CAST(round(p25 * 100) AS BIGINT) AS v1,
       CAST(round(p50 * 100) AS BIGINT) AS v2,
       CAST(round(p75 * 100) AS BIGINT) AS v3,
       {zd} AS d1, {zd} AS d2, l_returnflag AS s1
FROM ({member_oracle('p2_percentile_disc_distributed')})
UNION ALL
SELECT concat('tj_', kind), event_id, coalesce(user_id, {z}), ts_us,
       coalesce(click_ts_us, {z}), coalesce(signup_id, {z}),
       CAST(coalesce(click_value, 0.0) AS DOUBLE), {zd}, event_type
FROM ({member_oracle('j12_temporal_joins')})"""


@register(
    "j13_order_temporal_suite", _j13_sql(), "EXT-ORDER", "EXT-JOIN",
    tier=1,  # r11: consolidated into w6_windowtemporal_suite (stays benched)
)
def j13_order_temporal_suite(spark, sf_dir):
    """Driver row consolidating the distributed percentile_disc row (p2)
    and the temporal-join suite (j12) — r10 window math: their two slots
    fund this row plus x165. p2's three price percentiles ride the long
    slots as half-up cents (exact — percentile_disc returns actual data
    values, 2-decimal by fixture construction); j12's per-kind NULL
    columns coalesce to 0 (unambiguous — which columns are NULL is
    determined by the member's own kind tag). Member oracles embedded
    verbatim; both stay tier-1-verified in the driver replica, and p2
    stays in the bench HEADLINE for the frozen r4 series (j12 was never
    a HEADLINE standalone — its j1/j2 members are)."""
    from .analytics_queries import j12_temporal_joins
    from .registry import REGISTRY

    p2 = REGISTRY["p2_percentile_disc_distributed"].fn(spark, sf_dir)
    zl = F.lit(0).cast("long")
    pct = p2.select(
        F.lit("pct").alias("kind"),
        zl.alias("id1"),
        zl.alias("id2"),
        F.round(F.col("p25") * 100).cast("long").alias("v1"),
        F.round(F.col("p50") * 100).cast("long").alias("v2"),
        F.round(F.col("p75") * 100).cast("long").alias("v3"),
        F.lit(0.0).alias("d1"),
        F.lit(0.0).alias("d2"),
        F.col("l_returnflag").cast("string").alias("s1"),
    )
    tj = j12_temporal_joins(spark, sf_dir).select(
        F.concat(F.lit("tj_"), F.col("kind")).alias("kind"),
        F.col("event_id").cast("long").alias("id1"),
        F.coalesce(F.col("user_id"), zl).cast("long").alias("id2"),
        F.col("ts_us").cast("long").alias("v1"),
        F.coalesce(F.col("click_ts_us"), zl).cast("long").alias("v2"),
        F.coalesce(F.col("signup_id"), zl).cast("long").alias("v3"),
        F.coalesce(F.col("click_value"), F.lit(0.0)).cast("double").alias("d1"),
        F.lit(0.0).alias("d2"),
        F.col("event_type").cast("string").alias("s1"),
    )
    return pct.unionAll(tj)


# ---------------------------------------------------------------------------
# x165_r10e_ops_suite — the r10 fifth-wave operators under one driver hash
# ---------------------------------------------------------------------------


def _x165_sql() -> str:
    z = "CAST(0 AS BIGINT)"
    zd = "CAST(0.0 AS DOUBLE)"
    return f"""SELECT 'keep' AS kind, doc_id AS id1, rep AS id2,
       CAST(keep AS BIGINT) AS v1, {z} AS v2, {z} AS v3, {zd} AS d1,
       {zd} AS d2, CAST(NULL AS VARCHAR) AS s1
FROM ({member_oracle('x163_image_dedup_keep_one')})
UNION ALL
SELECT 'dh', doc_id, {z}, h_hi, h_lo, {z}, {zd}, {zd},
       CAST(NULL AS VARCHAR)
FROM ({member_oracle('x164_image_dhash')})"""


@register(
    "x165_r10e_ops_suite", _x165_sql(), "EXT-02", "EXT-04",
    tier=1,  # r11: consolidated into m4_r10de_suite (stays in bench HEADLINE)
)
def x165_r10e_ops_suite(spark, sf_dir):
    """Driver row for the r10 fifth wave — image dedup keep-one (x163)
    and the dHash signature (x164) — union-folded into the shared
    kind-tagged suite shape (2 small members → lazy union per the
    SCALE.md composition rule)."""
    __r0, __r1 = D.overlap(  # guide §2.6
        lambda: x163_image_dedup_keep_one(spark, sf_dir),
        lambda: x164_image_dhash(spark, sf_dir),
    )
    keep = _suite_shape(
        __r0, "keep",
        id1=F.col("doc_id"), id2=F.col("rep"), v1=F.col("keep").cast("long"),
    )
    dh = _suite_shape(
        __r1, "dh",
        id1=F.col("doc_id"), v1=F.col("h_hi"), v2=F.col("h_lo"),
    )
    return keep.unionAll(dh)


# ===========================================================================
# r10 sixth wave: the GIF-decoded aHash (x166 — the x157 bits carried
# through the real LZW decoder) and dual-hash verified pairs (x167 —
# aHash candidates re-scored by dHash) — funded by consolidating the
# q15/t2 TPC-H suites into t3_tpch_join_agg_suite.
# ===========================================================================


def _x166_sql() -> str:
    from .extension_queries import _CONSISTENT_DIMS_CTES
    from .operators.multimodal import ahash_sql

    # flip=False: GIF rows are stored top-down, so the GIF-decoded image
    # is the vertical MIRROR of the BMP fixture's (whose pixel array is
    # bottom-up) — order-free stats (x60/x78) share one oracle across
    # containers, the order-sensitive hash cannot
    return f"WITH {_CONSISTENT_DIMS_CTES}\n{ahash_sql('dims', flip=False)}"


@register("x166_gif_ahash", _x166_sql(), "EXT-02", "EXT-04", tier=1)
def x166_gif_ahash(spark, sf_dir):
    """The x157 aHash kernel carried through GENUINE GIF87a payloads —
    real LZW compression on the fixture side (encode_gif8) and the real
    pure-Python LZW decoder on the query side (the x78 device). The
    SAME decode→resample→threshold kernel runs unchanged; only the
    oracle's row addressing differs (GIF stores rows top-down where the
    BMP fixture's array is bottom-up — see ahash_sql), which is itself
    evidence the hash reads the DECODED pixel geometry, not the raw
    byte stream."""
    from .operators.multimodal import attach_consistent_gif_payload, image_ahash

    return image_ahash(
        attach_consistent_gif_payload(_t(spark, sf_dir, "documents"))
    )


def _x167_sql() -> str:
    from .extension_queries import _CONSISTENT_DIMS_CTES
    from .operators.multimodal import dhash_sql

    # p and dsig each feed two references (dsig joins as both pair sides)
    return f"""WITH p AS MATERIALIZED (SELECT doc_a, doc_b, hamming AS ham_a
     FROM ({member_oracle('x158_image_neardup')}) z),
{_CONSISTENT_DIMS_CTES},
dsig AS MATERIALIZED ({dhash_sql('dims')})
SELECT p.doc_a, p.doc_b, p.ham_a,
       CAST(bit_count(xor(a.h_hi, b.h_hi))
            + bit_count(xor(a.h_lo, b.h_lo)) AS BIGINT) AS ham_d
FROM p JOIN dsig a ON a.doc_id = p.doc_a
       JOIN dsig b ON b.doc_id = p.doc_b"""


@register("x167_dualhash_pairs", _x167_sql(), "EXT-02", "EXT-04", tier=1)
def x167_dualhash_pairs(spark, sf_dir):
    """Dual-hash near-dup verification: every x158 candidate pair
    re-scored by the INDEPENDENT dHash distance — (doc_a, doc_b, ham_a,
    ham_d). A pair small under BOTH hashes is the production-grade
    image-dup signal (the two hashes fail differently: aHash on global
    brightness, dHash on gradients); a pair small under aHash alone is
    the review queue. Two doc_id equi-joins past the x158 plan — no new
    candidate generation."""
    from .operators.multimodal import (
        attach_consistent_bmp_payload,
        image_ahash,
        image_dhash,
        image_neardup_pairs,
    )

    if _img_memo_off():
        mm = attach_consistent_bmp_payload(_t(spark, sf_dir, "documents"))
        pairs = image_neardup_pairs(image_ahash(mm)).withColumnRenamed(
            "hamming", "ham_a"
        )
        dsig = D._persist(image_dhash(mm))
    else:
        pairs = image_pairs_frame(spark, sf_dir).withColumnRenamed(
            "hamming", "ham_a"
        )
        dsig = image_dsig_frame(spark, sf_dir)
    a = dsig.select(
        F.col("doc_id").alias("doc_a"),
        F.col("h_hi").alias("a_hi"),
        F.col("h_lo").alias("a_lo"),
    )
    b = dsig.select(
        F.col("doc_id").alias("doc_b"),
        F.col("h_hi").alias("b_hi"),
        F.col("h_lo").alias("b_lo"),
    )
    ham_d = (
        F.bit_count(F.col("a_hi").bitwiseXOR(F.col("b_hi")))
        + F.bit_count(F.col("a_lo").bitwiseXOR(F.col("b_lo")))
    ).cast("long")
    return (
        pairs.join(a, "doc_a")
        .join(b, "doc_b")
        .withColumn("ham_d", ham_d)
        .select("doc_a", "doc_b", "ham_a", "ham_d")
    )


# ---------------------------------------------------------------------------
# t3_tpch_join_agg_suite — the q15/t2 consolidation suites as ONE driver
# row (funds the x168 slot)
# ---------------------------------------------------------------------------


def _t3_sql() -> str:
    z = "CAST(0 AS BIGINT)"
    zd = "CAST(0.0 AS DOUBLE)"
    return f"""SELECT concat('j_', kind) AS kind, id1, id2, v1, {z} AS v2,
       {z} AS v3, d1, d2, s1
FROM ({member_oracle('q15_joins_suite')})
UNION ALL
SELECT concat('a_', kind), id1, id2, v1, {z}, {z}, d1, d2, s1
FROM ({member_oracle('t2_aggstress_suite')})"""


@register(
    "t3_tpch_join_agg_suite", _t3_sql(), "EXT-JOIN", "EXT-AGG", "EXT-TOPK",
    tier=1,  # r12: consolidated into m13_joinprofile_suite (stays in bench HEADLINE)
)
def t3_tpch_join_agg_suite(spark, sf_dir):
    """Driver row consolidating two same-shaped TPC-H consolidation
    suites (q15 = q7+q10 joins, t2 = q18+t1 agg stress) — r10 window
    math: their two slots fund this row plus x168. Both members keep
    their identical (kind, id1, id2, v1, d1, d2, s1) shape with a
    kind-namespace prefix; member oracles embedded verbatim; q15/t2 and
    THEIR members all stay benched (frozen series untouched)."""
    from .registry import REGISTRY

    zl = F.lit(0).cast("long")

    def widen(df, prefix):
        return df.select(
            F.concat(F.lit(prefix), F.col("kind")).alias("kind"),
            "id1", "id2", "v1", zl.alias("v2"), zl.alias("v3"),
            "d1", "d2", "s1",
        )

    q15, t2 = D.overlap(  # guide §2.6: member construction overlapped
        lambda: REGISTRY["q15_joins_suite"].fn(spark, sf_dir),
        lambda: REGISTRY["t2_aggstress_suite"].fn(spark, sf_dir),
    )
    return widen(q15, "j_").unionAll(widen(t2, "a_"))


# ---------------------------------------------------------------------------
# x168_r10f_ops_suite — the r10 sixth-wave operators under one driver hash
# ---------------------------------------------------------------------------


def _x168_sql() -> str:
    z = "CAST(0 AS BIGINT)"
    zd = "CAST(0.0 AS DOUBLE)"
    return f"""SELECT 'gah' AS kind, doc_id AS id1, {z} AS id2, h_hi AS v1,
       h_lo AS v2, {z} AS v3, {zd} AS d1, {zd} AS d2,
       CAST(NULL AS VARCHAR) AS s1
FROM ({member_oracle('x166_gif_ahash')})
UNION ALL
SELECT 'dual', doc_a, doc_b, ham_a, ham_d, {z}, {zd}, {zd},
       CAST(NULL AS VARCHAR)
FROM ({member_oracle('x167_dualhash_pairs')})"""


@register(
    "x168_r10f_ops_suite", _x168_sql(), "EXT-02", "EXT-04",
    tier=1,  # r11: consolidated into m5_r10fg_suite (stays in bench HEADLINE)
)
def x168_r10f_ops_suite(spark, sf_dir):
    """Driver row for the r10 sixth wave — the GIF-decoded aHash (x166)
    and dual-hash verified pairs (x167) — union-folded into the shared
    kind-tagged suite shape (2 small members → lazy union per the
    SCALE.md composition rule)."""
    __r0, __r1 = D.overlap(  # guide §2.6
        lambda: x166_gif_ahash(spark, sf_dir),
        lambda: x167_dualhash_pairs(spark, sf_dir),
    )
    gah = _suite_shape(
        __r0, "gah",
        id1=F.col("doc_id"), v1=F.col("h_hi"), v2=F.col("h_lo"),
    )
    dual = _suite_shape(
        __r1, "dual",
        id1=F.col("doc_a"), id2=F.col("doc_b"), v1=F.col("ham_a"),
        v2=F.col("ham_d"),
    )
    return gah.unionAll(dual)


# ===========================================================================
# r10 seventh wave: incremental image dedup (x169 — the x45/x57 nightly-
# ingest pattern on perceptual signatures) and the per-source image
# profile (x170) — funded by consolidating the s2/w4 suites into
# s6_setwindow_suite.
# ===========================================================================


def _x169_sql() -> str:
    from .extension_queries import _CONSISTENT_DIMS_CTES
    from .operators.multimodal import ahash_sql

    return f"""WITH {_CONSISTENT_DIMS_CTES},
sig AS MATERIALIZED ({ahash_sql('dims')}),
old AS (SELECT DISTINCT h_hi, h_lo FROM sig WHERE doc_id % 10 < 8),
new AS (SELECT * FROM sig WHERE doc_id % 10 >= 8),
keepn AS (SELECT h_hi, h_lo, min(doc_id) AS doc_id FROM new GROUP BY 1, 2)
SELECT k.doc_id, (o.h_hi IS NOT NULL) AS is_dup_of_corpus
FROM keepn k LEFT JOIN old o ON k.h_hi = o.h_hi AND k.h_lo = o.h_lo"""


@register(
    "x169_incremental_image_dedup", _x169_sql(), "EXT-01", "EXT-02", "EXT-04",
    tier=1,
)
def x169_incremental_image_dedup(spark, sf_dir):
    """Nightly-ingest image dedup (the x45/x57 incremental pattern on
    perceptual signatures): the new batch (doc_id%10 >= 8) dedups
    within itself (min doc_id per aHash signature) and flags survivors
    whose signature already exists in the corpus index (doc_id%10 < 8)
    — exactly what an ingest pipeline checks before admitting images.
    The corpus side is a DISTINCT signature index (~16 bytes/image);
    the probe is one equi-join on the two 32-bit halves, broadcastable
    at any batch size."""
    from .operators.multimodal import attach_consistent_bmp_payload, image_ahash

    if _img_memo_off():
        sig = D._persist(
            image_ahash(
                attach_consistent_bmp_payload(_t(spark, sf_dir, "documents"))
            )
        )
    else:
        sig = image_sig_frame(spark, sf_dir)
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


def _x170_sql() -> str:
    from .extension_queries import _CONSISTENT_DIMS_CTES

    return f"""WITH {_CONSISTENT_DIMS_CTES},
src AS (SELECT d.doc_id, d.source FROM documents d)
SELECT s.source, CAST(count(*) AS BIGINT) AS n_images,
       CAST(sum(54 + m.w * m.h) AS BIGINT) AS total_bytes,
       CAST(sum(m.w) AS BIGINT) AS sum_w,
       CAST(sum(m.h) AS BIGINT) AS sum_h,
       CAST(sum(CASE WHEN m.w < 32 OR m.h < 8 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_small
FROM dims m JOIN src s USING (doc_id)
WHERE m.h >= 1
GROUP BY s.source"""


@register(
    "x170_source_image_profile", _x170_sql(), "EXT-04", "EXT-05", tier=1,
)
def x170_source_image_profile(spark, sf_dir):
    """Per-source image corpus profile over REAL header decodes: image
    count, total payload bytes, dimension sums (exact ints — averages
    are a division away without float-sum hazards), and the undersized
    count — the image-side capacity sheet next to x147's sequence-length
    histogram. One Arrow parse pass + one (source) map-side-combined
    aggregate; ≤ |sources| rows out."""
    from .operators.multimodal import (
        attach_consistent_bmp_payload,
        decode_payloads,
    )

    docs = _t(spark, sf_dir, "documents")
    # height >= 1 mirrors both the builder's own fixture filter and the
    # oracle's `WHERE m.h >= 1` predicate explicitly (ADVICE r10): the
    # decode side must never admit a degenerate-height header the oracle's
    # closed form excludes, even if the fixture's filter ever changes.
    dec = decode_payloads(attach_consistent_bmp_payload(docs)).filter(
        F.col("height") >= 1
    )
    return (
        dec.join(docs.select("doc_id", "source"), "doc_id")
        .groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_images"),
            F.sum("n_bytes").cast("long").alias("total_bytes"),
            F.sum("width").cast("long").alias("sum_w"),
            F.sum("height").cast("long").alias("sum_h"),
            F.sum(
                ((F.col("width") < 32) | (F.col("height") < 8)).cast("long")
            )
            .cast("long")
            .alias("n_small"),
        )
    )


# ---------------------------------------------------------------------------
# s6_setwindow_suite — the s2/w4 consolidation suites as ONE driver row
# (funds the x171 slot)
# ---------------------------------------------------------------------------


def _s6_sql() -> str:
    z = "CAST(0 AS BIGINT)"
    zd = "CAST(0.0 AS DOUBLE)"
    return f"""SELECT concat('s_', kind) AS kind, id1, {z} AS id2, v1,
       {z} AS v2, {z} AS v3, d1, {zd} AS d2, s1
FROM ({member_oracle('s2_setgroup_suite')})
UNION ALL
SELECT concat('w_', kind), id1, id2, {z}, {z}, {z}, d1, d2, s1
FROM ({member_oracle('w4_window_suite')})"""


@register(
    "s6_setwindow_suite", _s6_sql(), "EXT-SET", "EXT-AGG", "EXT-WINDOW",
    "EXT-TOPK",
    tier=1,  # r12: consolidated into m12_embsetwin_suite (stays in bench HEADLINE)
)
def s6_setwindow_suite(spark, sf_dir):
    """Driver row consolidating two same-family consolidation suites
    (s2 = set ops + grouping analytics, w4 = window analytics) — r10
    window math: their two slots fund this row plus x171. Both members'
    narrower shapes widen into the standard 9 columns with a
    kind-namespace prefix; member oracles embedded verbatim; s2/w4 and
    their members all stay benched (frozen series untouched)."""
    from .registry import REGISTRY

    zl = F.lit(0).cast("long")
    zd = F.lit(0.0)
    s2 = REGISTRY["s2_setgroup_suite"].fn(spark, sf_dir).select(
        F.concat(F.lit("s_"), F.col("kind")).alias("kind"),
        "id1", zl.alias("id2"), "v1", zl.alias("v2"), zl.alias("v3"),
        "d1", zd.alias("d2"), "s1",
    )
    w4 = REGISTRY["w4_window_suite"].fn(spark, sf_dir).select(
        F.concat(F.lit("w_"), F.col("kind")).alias("kind"),
        "id1", "id2", zl.alias("v1"), zl.alias("v2"), zl.alias("v3"),
        "d1", "d2", "s1",
    )
    return s2.unionAll(w4)


# ---------------------------------------------------------------------------
# x171_r10g_ops_suite — the r10 seventh-wave operators under one driver hash
# ---------------------------------------------------------------------------


def _x171_sql() -> str:
    z = "CAST(0 AS BIGINT)"
    zd = "CAST(0.0 AS DOUBLE)"
    return f"""SELECT 'incr' AS kind, doc_id AS id1, {z} AS id2,
       CAST(is_dup_of_corpus AS BIGINT) AS v1, {z} AS v2, {z} AS v3,
       {zd} AS d1, {zd} AS d2, CAST(NULL AS VARCHAR) AS s1
FROM ({member_oracle('x169_incremental_image_dedup')})
UNION ALL
SELECT 'prof', {z}, {z}, n_images, total_bytes, sum_w + sum_h, {zd},
       CAST(n_small AS DOUBLE), source
FROM ({member_oracle('x170_source_image_profile')})"""


@register(
    "x171_r10g_ops_suite", _x171_sql(), "EXT-01", "EXT-02", "EXT-04",
    "EXT-05",
    tier=1,  # r11: consolidated into m5_r10fg_suite (stays in bench HEADLINE)
)
def x171_r10g_ops_suite(spark, sf_dir):
    """Driver row for the r10 seventh wave — incremental image dedup
    (x169) and the per-source image profile (x170) — union-folded into
    the shared kind-tagged suite shape (2 small members → lazy union
    per the SCALE.md composition rule)."""
    __r0, __r1 = D.overlap(  # guide §2.6
        lambda: x169_incremental_image_dedup(spark, sf_dir),
        lambda: x170_source_image_profile(spark, sf_dir),
    )
    incr = _suite_shape(
        __r0, "incr",
        id1=F.col("doc_id"), v1=F.col("is_dup_of_corpus").cast("long"),
    )
    prof = _suite_shape(
        __r1, "prof",
        v1=F.col("n_images"), v2=F.col("total_bytes"),
        v3=F.col("sum_w") + F.col("sum_h"), d2=F.col("n_small"),
        s1=F.col("source"),
    )
    return incr.unionAll(prof)


# ===========================================================================
# r10 eighth wave: caption-image size rank correlation (x172 — the paired-
# dataset bias probe) and the curriculum×split mix audit (x173) — funded by
# consolidating the x08_11/q_scalar standalones into t4_profile_scalar_suite.
# ===========================================================================

#: x172's fixed probe panel (the x142 device): bounded at every SF, so the
#: two global rank windows never see more than ~512 rows.
X172_PANEL_SQL = (
    "doc_id < 4096 AND substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)"
    " IN ('0', '1')"
)


def _x172_sql() -> str:
    from .extension_queries import _TOKS_CTE

    d2 = "sum((rb - rt) * (rb - rt))"
    return f"""WITH c8r AS MATERIALIZED (SELECT doc_id, n_bytes
     FROM ({member_oracle('c8_multimodal_pipeline')}) z
     WHERE {X172_PANEL_SQL}),
{_TOKS_CTE},
j AS (SELECT c8r.doc_id, c8r.n_bytes, CAST(len(toks.w) AS BIGINT) AS n_tok
      FROM c8r JOIN toks USING (doc_id)),
r AS (SELECT doc_id,
             row_number() OVER (ORDER BY n_bytes, doc_id) AS rb,
             row_number() OVER (ORDER BY n_tok, doc_id) AS rt
      FROM j)
SELECT CAST(count(*) AS BIGINT) AS n_pairs,
       CAST({d2} AS BIGINT) AS sum_d2,
       CASE WHEN count(*) > 1
            THEN round(1 - 6.0 * {d2}
                       / (count(*) * (count(*) * count(*) - 1)), 4)
            ELSE 0.0 END AS rho
FROM r"""


@register(
    "x172_caption_image_corr", _x172_sql(), "EXT-04", "EXT-05",
    "EXT-ANALYTICS", tier=1,
)
def x172_caption_image_corr(spark, sf_dir):
    """Caption-length vs image-size Spearman over the c8 paired dataset
    (the x126 deterministic-rank convention: row_number with doc_id
    tiebreak, exact int64 Σd², rho one rounded IEEE expression) — the
    modality-balance bias probe a paired-dataset audit runs ("are
    longer captions systematically attached to bigger images"), on the
    fixed md5-chosen panel so the global rank windows stay ≤512 rows at
    any corpus scale. n_tok joins from the c7 manifest (the x155
    consistency device)."""
    from .r9_queries import _c7_result

    panel = c8_multimodal_pipeline(spark, sf_dir).select(
        "doc_id", "n_bytes"
    ).filter(
        (F.col("doc_id") < 4096)
        & F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1).isin("0", "1")
    )
    j = panel.join(
        _c7_result(spark, sf_dir).select("doc_id", "n_tok"),
        "doc_id",
    )
    rb = F.row_number().over(Window.orderBy("n_bytes", "doc_id"))
    rt = F.row_number().over(Window.orderBy("n_tok", "doc_id"))
    ranked = j.select(rb.alias("rb"), rt.alias("rt"))
    n = F.count("*")
    d2 = F.sum((F.col("rb") - F.col("rt")) * (F.col("rb") - F.col("rt")))
    rho = F.when(
        n > 1,
        F.round(F.lit(1) - F.lit(6.0) * d2 / (n * (n * n - 1)), 4),
    ).otherwise(F.lit(0.0))
    return ranked.agg(
        n.cast("long").alias("n_pairs"),
        d2.cast("long").alias("sum_d2"),
        rho.cast("double").alias("rho"),
    )


def _x173_sql() -> str:
    from .operators import textanalysis as T

    return f"""WITH ph AS (SELECT doc_id, phase
           FROM ({member_oracle('x161_curriculum_phases')}) z)
SELECT {T.split_case_sql()} AS split, phase,
       CAST(count(*) AS BIGINT) AS n_docs
FROM ph GROUP BY 1, 2"""


@register(
    "x173_phase_split_mix", _x173_sql(), "EXT-05", tier=1,
)
def x173_phase_split_mix(spark, sf_dir):
    """Curriculum×split mix audit: document counts per (split, phase)
    over the x161 assignment — the report proving the quality-quartile
    schedule is available in EVERY split (a curriculum whose val split
    lacks phase-4 docs validates nothing). Split is the x138 row-local
    hash rule applied directly (no c7 chain re-run); ≤ 3·4 rows out."""
    from .operators import textanalysis as T

    ph = x161_curriculum_phases(spark, sf_dir).select("doc_id", "phase")
    return (
        T.split_assign(ph)
        .groupBy("split", "phase")
        .agg(F.count("*").cast("long").alias("n_docs"))
        .select("split", "phase", "n_docs")
    )


# ---------------------------------------------------------------------------
# t4_profile_scalar_suite — the x08_11/q_scalar standalones as ONE driver
# row (funds the x174 slot)
# ---------------------------------------------------------------------------


def _t4_sql() -> str:
    z = "CAST(0 AS BIGINT)"
    zd = "CAST(0.0 AS DOUBLE)"
    return f"""SELECT 'prof' AS kind, doc_id AS id1,
       CAST(round(punct_ratio * 10000) AS BIGINT) AS id2,
       n_tokens AS v1, n_subtokens AS v2, n_chars AS v3,
       CAST(quality AS DOUBLE) AS d1,
       CAST(round(stop_ratio * 10000) AS DOUBLE) AS d2,
       concat_ws('|', lang_pred, fingerprint) AS s1
FROM ({member_oracle('x08_11_text_profile')})
UNION ALL
SELECT 'qs', {z}, {z},
       CAST(round(q6_revenue * 100) AS BIGINT),
       CAST(round(promo_pct * 100) AS BIGINT),
       CAST(round(avg_yearly * 100) AS BIGINT),
       CAST(q19_revenue AS DOUBLE), {zd}, CAST(NULL AS VARCHAR)
FROM ({member_oracle('q_scalar_suite')})"""


@register(
    "t4_profile_scalar_suite", _t4_sql(), "EXT-05", "EXT-AGG",
    tier=1,  # r12: consolidated into m13_joinprofile_suite (stays in bench HEADLINE)
)
def t4_profile_scalar_suite(spark, sf_dir):
    """Driver row consolidating the one-pass text profile (x08_11) and
    the TPC-H scalar four-pack (q_scalar) — r10 window math: their two
    slots fund this row plus x174. The profile's round(_,4) ratios ride
    as exact ×10⁴ scalings and its two strings pipe-join into s1; the
    scalar row's 2-decimal aggregates ride as half-up cents. Member
    oracles embedded verbatim; both stay tier-1-verified (x08_11 stays
    in the bench HEADLINE for the frozen r4 series; c1's oracle keeps
    composing the registered x08_11 text unchanged)."""
    from .registry import REGISTRY

    zl = F.lit(0).cast("long")
    prof = REGISTRY["x08_11_text_profile"].fn(spark, sf_dir).select(
        F.lit("prof").alias("kind"),
        F.col("doc_id").cast("long").alias("id1"),
        F.round(F.col("punct_ratio") * 10000).cast("long").alias("id2"),
        F.col("n_tokens").cast("long").alias("v1"),
        F.col("n_subtokens").cast("long").alias("v2"),
        F.col("n_chars").cast("long").alias("v3"),
        F.col("quality").cast("double").alias("d1"),
        F.round(F.col("stop_ratio") * 10000).cast("double").alias("d2"),
        F.concat_ws("|", "lang_pred", "fingerprint").alias("s1"),
    )
    qs = REGISTRY["q_scalar_suite"].fn(spark, sf_dir).select(
        F.lit("qs").alias("kind"),
        zl.alias("id1"),
        zl.alias("id2"),
        F.round(F.col("q6_revenue") * 100).cast("long").alias("v1"),
        F.round(F.col("promo_pct") * 100).cast("long").alias("v2"),
        F.round(F.col("avg_yearly") * 100).cast("long").alias("v3"),
        F.col("q19_revenue").cast("double").alias("d1"),
        F.lit(0.0).alias("d2"),
        F.lit(None).cast("string").alias("s1"),
    )
    return prof.unionAll(qs)


# ---------------------------------------------------------------------------
# x174_r10h_ops_suite — the r10 eighth-wave operators under one driver hash
# ---------------------------------------------------------------------------


def _x174_sql() -> str:
    z = "CAST(0 AS BIGINT)"
    zd = "CAST(0.0 AS DOUBLE)"
    return f"""SELECT 'corr' AS kind, {z} AS id1, {z} AS id2, n_pairs AS v1,
       sum_d2 AS v2, {z} AS v3, rho AS d1, {zd} AS d2,
       CAST(NULL AS VARCHAR) AS s1
FROM ({member_oracle('x172_caption_image_corr')})
UNION ALL
SELECT 'mix', phase, {z}, n_docs, {z}, {z}, {zd}, {zd}, split
FROM ({member_oracle('x173_phase_split_mix')})"""


@register(
    "x174_r10h_ops_suite", _x174_sql(), "EXT-04", "EXT-05", "EXT-ANALYTICS",
    tier=1,  # r11: consolidated into m7_r9d10h_suite (stays in bench HEADLINE)
)
def x174_r10h_ops_suite(spark, sf_dir):
    """Driver row for the r10 eighth wave — the caption-image rank
    correlation (x172) and the curriculum×split mix audit (x173) —
    union-folded into the shared kind-tagged suite shape (2 small
    members → lazy union per the SCALE.md composition rule; the c1/c8
    chains underneath are shared through the session memos)."""
    __r0, __r1 = D.overlap(  # guide §2.6
        lambda: x172_caption_image_corr(spark, sf_dir),
        lambda: x173_phase_split_mix(spark, sf_dir),
    )
    corr = _suite_shape(
        __r0, "corr",
        v1=F.col("n_pairs"), v2=F.col("sum_d2"), d1=F.col("rho"),
    )
    mix = _suite_shape(
        __r1, "mix",
        id1=F.col("phase"), v1=F.col("n_docs"), s1=F.col("split"),
    )
    return corr.unionAll(mix)
