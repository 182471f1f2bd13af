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
    from .r9_queries import c7_pretraining_pipeline

    docs = _t(spark, sf_dir, "documents")
    mm = attach_consistent_bmp_payload(docs)
    corrupted = F.when(
        F.col("doc_id") % C8_CORRUPT_MOD == 0,
        F.concat(F.unhex(F.lit("0000")), F.col("payload")),
    ).otherwise(F.col("payload"))
    mm = mm.select("doc_id", corrupted.alias("payload"))
    # gate + signature + dims in ONE Arrow pass: corrupted payloads fail
    # the real decode and emit nothing
    sig = D._persist(image_ahash(mm, with_dims=True))
    pairs = image_neardup_pairs(
        sig.select("doc_id", "h_hi", "h_lo")
    ).select("doc_a", "doc_b")
    keep = (
        D.dedup_keep_one(sig.select("doc_id"), pairs)
        .filter(F.col("keep"))
        .select("doc_id")
    )
    qual = sig.join(keep, "doc_id").filter(F.col("height") >= C9_MIN_H)
    manifest = c7_pretraining_pipeline(spark, sf_dir).select(
        "doc_id", "split", "shard"
    )
    return qual.join(manifest, "doc_id").select(
        "doc_id", "width", "height", "h_hi", "h_lo", "split", "shard"
    )


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

    b = REGISTRY["x156_r10b_ops_suite"].fn(spark, sf_dir)
    c = REGISTRY["x159_r10c_ops_suite"].fn(spark, sf_dir)
    return widen(b, "b_").unionAll(widen(c, "c_"))
