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

from . import r9_queries  # noqa: F401  (c8 composes c7's registered oracle)
from .extension_queries import _suite_shape
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


def _c8_sql() -> str:
    # the oracle can't parse blobs, but every c8 stage is a closed form of
    # (doc_id, text): validity = the corruption rule, dims = the BMP
    # fixture's closed form (x14's oracle), payload equality = text
    # equality (payload bytes are header(text-derived dims) + UTF-8 text,
    # an injective function of text)
    return f"""WITH c7m AS (SELECT doc_id, split, shard
             FROM ({member_oracle('c7_pretraining_pipeline')}) z),
mm AS (SELECT doc_id, text,
              CAST(54 + octet_length(encode(text)) AS BIGINT) AS n_bytes,
              CAST(16 + (CASE WHEN length(text) = 0 THEN 0
                              ELSE ascii(substr(text, 1, 1)) END) % 64
                   AS BIGINT) AS width,
              CAST(16 + octet_length(encode(text)) % 64 AS BIGINT) AS height
       FROM documents),
gate AS (SELECT * FROM mm WHERE doc_id % {C8_CORRUPT_MOD} <> 0),
keep AS (SELECT * FROM (
           SELECT *, min(doc_id) OVER (PARTITION BY text) AS mn FROM gate)
         WHERE doc_id = mn),
qual AS (SELECT * FROM keep
         WHERE width >= {C8_MIN_DIM} AND height >= {C8_MIN_DIM})
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
    from .r9_queries import c7_pretraining_pipeline

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
    manifest = c7_pretraining_pipeline(spark, sf_dir).select(
        "doc_id", "split", "shard"
    )
    return qual.join(manifest, "doc_id").select(
        "doc_id", "n_bytes", "width", "height", "split", "shard"
    )


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
)
def d3_dedup_core_suite(spark, sf_dir):
    """Driver row consolidating the core dedup standalones (x01 exact
    min-id dedup, x02 inverted-index n-gram Jaccard — r10 window math:
    their two slots fund this row plus the c8 pipeline row). Member
    oracles embedded verbatim; x02 stays in the bench HEADLINE for the
    frozen r4 series."""
    from .extension_queries import x01_dedup_exact, x02_dedup_ngram_jaccard

    ex = _suite_shape(
        x01_dedup_exact(spark, sf_dir), "ex",
        id1=F.col("keep_id"), v1=F.col("n_copies"), s1=F.col("text"),
    )
    jac = _suite_shape(
        x02_dedup_ngram_jaccard(spark, sf_dir), "jac",
        id1=F.col("doc_a"), id2=F.col("doc_b"), d1=F.col("jaccard"),
    )
    return ex.unionAll(jac)
