"""Oracle-paired LLM-data-pipeline queries (SURVEY.md §2.10, driver
north-star): dedup (exact / n-gram Jaccard / MinHash-LSH / SimHash /
embedding-cosine), similarity search (brute-force + IVF), text analysis
(tokens / quality / lang-id / fingerprints / winnowing), multimodal column
plumbing, and time-window aggregation in batch + Structured Streaming form.

Oracle SQL here is largely GENERATED from the same constants the Spark
operators use (seeds, band layout, stopword/marker lists, thresholds) so the
two sides cannot drift independently.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .functions.text import normalize_text
from .operators import dedup as D
from .operators import similarity as S
from .operators import textanalysis as T
from .operators import windows as W
from .operators.multimodal import attach_payload, decode_payloads
from .registry import REGISTRY, _t, register

# ---------------------------------------------------------------------------
# shared SQL fragments (mirror dedup.tokens_col / doc_shingles exactly)
# ---------------------------------------------------------------------------

NORM_SQL = r"lower(trim(regexp_replace(text, '\s+', ' ', 'g')))"
_TOKS_CTE = (
    f"normtext AS (SELECT doc_id, {NORM_SQL} AS t FROM documents),\n"
    "toks AS (SELECT doc_id, string_split(t, ' ') AS w FROM normtext)"
)
# word 3-grams, distinct per doc (k=3 ⇒ positions 1..len(w)-2)
_DS_CTE = (
    "ds AS (SELECT DISTINCT doc_id, sh FROM toks, "
    "UNNEST(list_transform(range(1, len(w)-1), "
    "i -> array_to_string(w[i:i+2], ' '))) AS u(sh))"
)
_JACCARD_TAIL = """
sizes AS (SELECT doc_id, count(*) AS n FROM {src} GROUP BY doc_id),
inter AS (SELECT x.doc_id AS doc_a, y.doc_id AS doc_b, count(*) AS i
          FROM {src} x JOIN {src} y USING (sh)
          WHERE x.doc_id < y.doc_id GROUP BY 1, 2{cand_join})
SELECT doc_a, doc_b, i / CAST(na.n + nb.n - i AS DOUBLE) AS jaccard
FROM inter JOIN sizes na ON doc_a = na.doc_id JOIN sizes nb ON doc_b = nb.doc_id
WHERE i / CAST(na.n + nb.n - i AS DOUBLE) >= {threshold}
"""

JACCARD_THRESHOLD = 0.5
MAX_DOC_FREQ = 100
COSINE_DUP_THRESHOLD = 0.4


# ---------------------------------------------------------------------------
# OP-31 normalize (the reference's Rust subprocess, as a pandas UDF)
# ---------------------------------------------------------------------------

@register(
    "op31_normalize_text",
    f"SELECT doc_id, {NORM_SQL} AS normalized FROM documents",
    "OP-31",
)
def op31_normalize_text(spark, sf_dir):
    """OP-31 (normalize_tags.mjs:1-21): the external line-protocol subprocess
    replaced by an Arrow-vectorized pandas UDF (NFKC + casefold + collapse).
    On the ASCII fixture corpus this coincides with the SQL-expressible
    lower/trim/collapse subset (SURVEY §7.5), making it oracle-checkable."""
    d = _t(spark, sf_dir, "documents")
    return d.select("doc_id", normalize_text(F.col("text")).alias("normalized"))


# ---------------------------------------------------------------------------
# EXT-01/02 dedup family
# ---------------------------------------------------------------------------

@register(
    "x01_dedup_exact",
    """SELECT text, CAST(min(doc_id) AS BIGINT) AS keep_id,
              CAST(count(*) AS BIGINT) AS n_copies
       FROM documents GROUP BY text""",
    "EXT-01", "OP-05",
    tier=1,  # r10: consolidated into d3_dedup_core_suite
)
def x01_dedup_exact(spark, sf_dir):
    """EXT-01: exact dedup, deterministic min-id representative."""
    return D.exact_dedup(_t(spark, sf_dir, "documents"), ["text"])


@register(
    "x02_dedup_ngram_jaccard",
    "WITH "
    + _TOKS_CTE
    + ",\n"
    + _DS_CTE
    + ",\n"
    + f"rare AS (SELECT sh FROM ds GROUP BY sh HAVING count(*) <= {MAX_DOC_FREQ}),\n"
    + "dsf AS (SELECT ds.doc_id, ds.sh FROM ds JOIN rare USING (sh)),"
    + _JACCARD_TAIL.format(src="dsf", cand_join="", threshold=JACCARD_THRESHOLD),
    "EXT-02",
    tier=1,  # r10: consolidated into d3 (stays in bench HEADLINE, r4 series)
)
def x02_dedup_ngram_jaccard(spark, sf_dir):
    """EXT-02 exact tier: word-3-gram Jaccard ≥ 0.5 via inverted-index
    self-join with a stop-shingle document-frequency cap (scale guard,
    applied identically in the oracle)."""
    return D.ngram_jaccard_pairs(
        _t(spark, sf_dir, "documents"),
        threshold=JACCARD_THRESHOLD,
        max_doc_freq=MAX_DOC_FREQ,
    )


def _mh_sig_cols_sql() -> str:
    """The minhash-signature SELECT list (mh0..mhN aggregate minima) —
    the ONE oracle-side rendering of dedup.mh_seed_chunk's hash family,
    shared by every banding oracle (x03, c2, x83) so banding semantics
    cannot drift between them."""
    def mh(i: int) -> str:
        seed, off = D.mh_seed_chunk(i)
        return f"min(substr(md5(sh || '#{seed}'), {off}, {D.CHUNK_LEN})) AS mh{i}"

    return ",\n       ".join(mh(i) for i in range(D.NUM_HASHES))


def _mh_bands_sql(sig: str) -> str:
    """The banded (doc_id, band_key) UNION ALL over a signature CTE named
    ``sig`` — the oracle-side mirror of dedup.band_keys_df."""
    band_selects = []
    for b in range(D.NUM_HASHES // D.BAND_ROWS):
        cols = " || '|' || ".join(
            f"mh{i}" for i in range(b * D.BAND_ROWS, (b + 1) * D.BAND_ROWS)
        )
        band_selects.append(
            f"SELECT doc_id, '{b}' || '|' || {cols} AS band_key FROM {sig}"
        )
    return "\nUNION ALL\n".join(band_selects)


def _minhash_pairs_cte(src: str) -> str:
    """Banded-MinHash candidate + exact-Jaccard-verify CTE chain over the
    (doc_id, sh) shingle table named ``src``; terminates in ``mhpairs``
    with columns (doc_a, doc_b, jaccard >= threshold). Parameterized on
    the source so the composed pipelines (c2) can run it over a
    survivor-restricted shingle set with byte-identical band semantics."""
    mins = _mh_sig_cols_sql()
    bands = _mh_bands_sql("sig")
    return f"""sig AS (SELECT doc_id, {mins} FROM {src} GROUP BY doc_id),
bands AS ({bands}),
cand AS (SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
         FROM bands x JOIN bands y USING (band_key)
         WHERE x.doc_id < y.doc_id),
sizes AS (SELECT doc_id, count(*) AS n FROM {src} GROUP BY doc_id),
inter AS (SELECT x.doc_id AS doc_a, y.doc_id AS doc_b, count(*) AS i
          FROM {src} x JOIN {src} y USING (sh)
          WHERE x.doc_id < y.doc_id GROUP BY 1, 2),
interc AS (SELECT inter.* FROM inter JOIN cand USING (doc_a, doc_b)),
mhpairs AS (
    SELECT doc_a, doc_b, i / CAST(na.n + nb.n - i AS DOUBLE) AS jaccard
    FROM interc JOIN sizes na ON doc_a = na.doc_id
                JOIN sizes nb ON doc_b = nb.doc_id
    WHERE i / CAST(na.n + nb.n - i AS DOUBLE) >= {JACCARD_THRESHOLD})"""


def _minhash_sql() -> str:
    return f"""WITH {_TOKS_CTE},
{_DS_CTE},
{_minhash_pairs_cte('ds')}
SELECT doc_a, doc_b, jaccard FROM mhpairs"""


@register(
    "x03_dedup_minhash_lsh", _minhash_sql(), "EXT-02",
    tier=1,  # r9: consolidated into d2_signature_suite (stays in bench HEADLINE)
)
def x03_dedup_minhash_lsh(spark, sf_dir):
    """EXT-02 scale tier: banded MinHash-LSH candidates (md5-hex min
    signatures — engine-portable, so the oracle computes byte-identical
    bands) verified with exact Jaccard."""
    return D.minhash_dedup_pairs(
        _t(spark, sf_dir, "documents"), threshold=JACCARD_THRESHOLD
    )


def _simhash_sql() -> str:
    terms = []
    for b in range(D.SIMHASH_BITS):
        j, kbit = b // 4 + 1, b % 4
        tok_bit = (
            f"((((strpos('{D.HEX}', substr(md5(tok), {j}, 1)) - 1) // {2 ** kbit}) % 2) * 2 - 1)"
        )
        terms.append(
            f"(CASE WHEN list_sum(list_transform(w2, tok -> {tok_bit})) > 0 "
            f"THEN {2 ** b} ELSE 0 END)"
        )
    total = "\n         + ".join(terms)
    return (
        "WITH "
        + _TOKS_CTE
        + ",\ntd AS (SELECT doc_id, list_distinct(w) AS w2 FROM toks)\n"
        + f"SELECT doc_id, CAST({total} AS BIGINT) AS simhash FROM td"
    )


@register(
    "x04_dedup_simhash", _simhash_sql(), "EXT-02",
    tier=1,  # r9: consolidated into d2_signature_suite (stays in bench HEADLINE)
)
def x04_dedup_simhash(spark, sf_dir):
    """EXT-02 signature tier: 16-bit SimHash from md5 nibbles; equal
    signatures = near-dup candidates."""
    return D.simhash_docs(_t(spark, sf_dir, "documents"))


def _banded_srp_sql() -> str:
    """DuckDB form of the banded SRP candidate generation, from the SAME
    literal hyperplanes and band layout the Spark operator embeds
    (similarity.hyperplane_signs / N_BANDS / BAND_PLANES)."""
    from .operators.similarity import BAND_PLANES, N_BANDS, hyperplane_signs

    signs = hyperplane_signs(n_planes=N_BANDS * BAND_PLANES)

    def bit(p: int) -> str:
        plane = ", ".join(str(s) for s in signs[p])
        return (
            "(CASE WHEN list_inner_product(CAST(embedding AS DOUBLE[]), "
            f"[{plane}]) > 0 THEN '1' ELSE '0' END)"
        )

    band_selects = "\nUNION ALL\n".join(
        f"SELECT vec_id, '{b}|' || "
        + " || ".join(bit(b * BAND_PLANES + j) for j in range(BAND_PLANES))
        + " AS band_key FROM embeddings"
        for b in range(N_BANDS)
    )
    return f"""WITH bands AS ({band_selects}),
cand AS (SELECT DISTINCT x.vec_id AS doc_a, y.vec_id AS doc_b
         FROM bands x JOIN bands y USING (band_key)
         WHERE x.vec_id < y.vec_id)
SELECT doc_a, doc_b,
       round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                    CAST(b.embedding AS DOUBLE[])), 4) AS cos_sim
FROM cand JOIN embeddings a ON a.vec_id = doc_a
          JOIN embeddings b ON b.vec_id = doc_b
WHERE round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                   CAST(b.embedding AS DOUBLE[])), 4)
      >= {COSINE_DUP_THRESHOLD}"""


@register(
    "x05_dedup_embedding_cosine",
    _banded_srp_sql(),
    "EXT-02", "EXT-03",
    tier=1,  # r10: consolidated into s5 (stays in bench HEADLINE, r4 series)
)
def x05_dedup_embedding_cosine(spark, sf_dir):
    """EXT-02 embedding tier (SCALE form — registered default): cosine
    near-dup pairs from banded SRP-LSH candidates (8 bands × 3 planes;
    ≈0.90 per-pair recall even at the loose 0.4 threshold, ≈1.0 for real
    near-dups — measured in tests/test_similarity.py) verified with exact
    cosine. No crossJoin anywhere in the plan (pinned in
    tests/test_plans.py); the all-pairs exact form stays available as x05b
    (tier-1) and as the recall baseline. Oracle shares the literal
    hyperplanes and banding, so the semantics are hash-checked exactly."""
    return S.embedding_near_dup_pairs_bucketed(
        _t(spark, sf_dir, "embeddings"), threshold=COSINE_DUP_THRESHOLD
    )


@register(
    "x05b_dedup_cosine_allpairs",
    f"""SELECT a.vec_id AS doc_a, b.vec_id AS doc_b,
               round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                            CAST(b.embedding AS DOUBLE[])), 4) AS cos_sim
        FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        WHERE round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                           CAST(b.embedding AS DOUBLE[])), 4)
              >= {COSINE_DUP_THRESHOLD}""",
    "EXT-02", "EXT-03",
    tier=1,
)
def x05b_dedup_cosine_allpairs(spark, sf_dir):
    """EXT-02 embedding tier, EXACT all-pairs baseline (O(n²) compare
    volume — oracle/recall ground truth only; the registered scale tier is
    the bucketed x05)."""
    return S.embedding_near_dup_pairs(
        _t(spark, sf_dir, "embeddings"), threshold=COSINE_DUP_THRESHOLD
    )


# ---------------------------------------------------------------------------
# EXT-03 similarity search
# ---------------------------------------------------------------------------

def _x06_sql(panel: str = "vec_id < 40") -> str:
    """x06's oracle, parameterized by the probe-panel predicate so x142's
    recall row can re-run the identical formulation over its own
    md5-chosen panel (r9); the registered x06 uses the default."""
    return f"""WITH q AS (SELECT vec_id AS q_id, embedding AS qv FROM embeddings
                 WHERE {panel}),
       scored AS (SELECT q_id, e.vec_id AS n_id,
                         round(list_cosine_similarity(CAST(qv AS DOUBLE[]),
                                                      CAST(e.embedding AS DOUBLE[])), 6) AS score
                  FROM q, embeddings e WHERE e.vec_id <> q_id),
       ranked AS (SELECT q_id, n_id, score,
                         row_number() OVER (PARTITION BY q_id
                                            ORDER BY score DESC, n_id) AS rk
                  FROM scored)
       SELECT q_id, n_id, CAST(rk AS BIGINT) AS rk, round(score, 4) AS score
       FROM ranked WHERE rk <= 5"""


@register(
    "x06_knn_bruteforce",
    _x06_sql(),
    "EXT-03",
    tier=1,  # r10: consolidated into s5 (stays in bench HEADLINE, r4 series)
)
def x06_knn_bruteforce(spark, sf_dir):
    """EXT-03 baseline: exact cosine top-5 for a FIXED 40-probe set
    (vec_id < 40 — O(1) in the corpus, unlike the previous vec_id%50
    corpus-fraction set, whose driver-collected probe matrix grew linearly
    with scale). The bounded probe set broadcasts; the corpus streams
    once; grouped top-k via row_number. Probe sets beyond
    MAX_BROADCAST_PROBES reroute to the blocked cogroup tier inside the
    operator."""
    emb = _t(spark, sf_dir, "embeddings")
    return S.knn_bruteforce(emb, emb.filter(F.col("vec_id") < 40), k=5)


def _x07_sql(panel: str = "vec_id % 50 = 0") -> str:
    """x07's oracle, probe-panel-parameterized like :func:`_x06_sql`."""
    return f"""WITH cent AS (SELECT vec_id AS cell, embedding AS cv FROM embeddings
                    WHERE vec_id < 80),
       assigned AS (
           SELECT v_id, vec, cell FROM (
               SELECT e.vec_id AS v_id, e.embedding AS vec, c.cell,
                      row_number() OVER (
                          PARTITION BY e.vec_id
                          ORDER BY round(list_cosine_similarity(
                              CAST(e.embedding AS DOUBLE[]),
                              CAST(c.cv AS DOUBLE[])), 6) DESC, c.cell) AS rk
               FROM embeddings e, cent c)
           WHERE rk = 1),
       q AS (SELECT vec_id AS q_id, embedding AS qv FROM embeddings
             WHERE {panel}),
       probe AS (
           SELECT q_id, qv, cell FROM (
               SELECT q.q_id, q.qv, c.cell,
                      row_number() OVER (
                          PARTITION BY q.q_id
                          ORDER BY round(list_cosine_similarity(
                              CAST(q.qv AS DOUBLE[]),
                              CAST(c.cv AS DOUBLE[])), 6) DESC, c.cell) AS rk
               FROM q, cent c)
           WHERE rk <= 2),
       scored AS (
           SELECT p.q_id, a.v_id AS n_id,
                  round(list_cosine_similarity(CAST(p.qv AS DOUBLE[]),
                                               CAST(a.vec AS DOUBLE[])), 6) AS score
           FROM probe p JOIN assigned a USING (cell)
           WHERE p.q_id <> a.v_id),
       ranked AS (
           SELECT q_id, n_id, score,
                  row_number() OVER (PARTITION BY q_id
                                     ORDER BY score DESC, n_id) AS rk
           FROM scored)
       SELECT q_id, n_id, CAST(rk AS BIGINT) AS rk, round(score, 4) AS score
       FROM ranked WHERE rk <= 5"""


@register(
    "x07_knn_ivf",
    _x07_sql(),
    "EXT-03",
    tier=1,  # r9: consolidated into s4_ann_suite (stays in bench HEADLINE)
)
def x07_knn_ivf(spark, sf_dir):
    """EXT-03 scale tier: IVF — centroids = a FIXED 80-vector seed set
    (vec_id < 80, O(1) in the corpus: ivf_assign collects the centroid
    table to the driver, so a corpus-fraction set would grow linearly —
    the same unbounded-collect pattern fixed for x06 probes), nprobe=2.
    Approximate relative to brute force, but DETERMINISTIC given the
    centroid set (assignment and probe ties break on cell id, ranking ties
    on neighbor id), so the full cell→probe→rank pipeline has an exact SQL
    oracle; recall vs x06 ground truth is additionally asserted in
    tests/test_similarity.py."""
    emb = _t(spark, sf_dir, "embeddings")
    return S.knn_ivf(
        emb,
        emb.filter(F.col("vec_id") % 50 == 0),
        emb.filter(F.col("vec_id") < 80),
        k=5,
        nprobe=2,
    )


# ---------------------------------------------------------------------------
# EXT-05 text analysis
# ---------------------------------------------------------------------------

_X08_SQL = (
    "WITH "
    + _TOKS_CTE
    + r""",
       sub AS (SELECT doc_id,
                      len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\s]', 0)) AS n_sub,
                      length(text) AS n_chars
               FROM documents)
       SELECT toks.doc_id,
              CAST(len(w) AS BIGINT) AS n_tokens,
              CAST(n_sub AS BIGINT) AS n_subtokens,
              CAST(n_chars AS BIGINT) AS n_chars
       FROM toks JOIN sub ON toks.doc_id = sub.doc_id"""
)


@register("x08_token_stats", _X08_SQL, "EXT-05", tier=1)
def x08_token_stats(spark, sf_dir):
    return T.token_stats(_t(spark, sf_dir, "documents"))


def _quality_sql() -> str:
    stoplist = ", ".join(f"'{s}'" for s in T.STOPWORDS)
    return (
        "WITH "
        + _TOKS_CTE
        + f""",
        m AS (SELECT toks.doc_id,
                     CAST(len(w) AS DOUBLE) AS n_tok,
                     CAST(len(list_filter(w, t -> list_contains([{stoplist}], t))) AS DOUBLE) AS n_stop,
                     CAST(length(regexp_replace(d.text, '[^!-/:-@\\[-`{{-~]', '', 'g')) AS DOUBLE) AS n_punct,
                     CAST(length(d.text) AS DOUBLE) AS n_chars
              FROM toks JOIN documents d ON toks.doc_id = d.doc_id),
        r AS (SELECT doc_id,
                     CASE WHEN n_tok > 0 THEN n_stop / n_tok ELSE 0.0 END AS stop_ratio,
                     CASE WHEN n_chars > 0 THEN n_punct / n_chars ELSE 0.0 END AS punct_ratio,
                     CASE WHEN n_tok > 0 THEN (n_chars - (n_tok - 1)) / n_tok ELSE 0.0 END AS mean_tok_len
              FROM m)
        SELECT doc_id, round(stop_ratio, 4) AS stop_ratio,
               round(punct_ratio, 4) AS punct_ratio,
               round(stop_ratio * 0.4 + (1.0 - punct_ratio) * 0.4
                     + least(mean_tok_len / 10.0, 1.0) * 0.2, 4) AS quality
        FROM r"""
    )


@register("x09_quality_score", _quality_sql(), "EXT-05", tier=1)
def x09_quality_score(spark, sf_dir):
    return T.quality_score(_t(spark, sf_dir, "documents"))


def _lang_id_sql() -> str:
    langs = list(T.LANG_MARKERS)
    score_cols = ",\n                 ".join(
        "CAST(len(list_filter(w, t -> list_contains(["
        + ", ".join(f"'{m}'" for m in T.LANG_MARKERS[lang])
        + f"], t))) AS BIGINT) AS s_{lang}"
        for lang in langs
    )
    whens = []
    for i, lang in enumerate(langs):
        conds = [f"s_{lang} > 0"]
        conds += [f"s_{lang} > s_{other}" for other in langs[:i]]
        conds += [f"s_{lang} >= s_{other}" for other in langs[i + 1 :]]
        whens.append(f"WHEN {' AND '.join(conds)} THEN '{lang}'")
    case = "CASE " + " ".join(whens) + " ELSE 'und' END"
    return (
        "WITH "
        + _TOKS_CTE
        + f""",
        sc AS (SELECT doc_id,
                 {score_cols}
               FROM toks)
        SELECT doc_id, {case} AS lang_pred FROM sc"""
    )


@register("x10_lang_id", _lang_id_sql(), "EXT-05", tier=1)
def x10_lang_id(spark, sf_dir):
    """Heuristic marker-word language ID (argmax, first-lang tie-break)."""
    return T.lang_id(_t(spark, sf_dir, "documents"))


_X11_SQL = f"SELECT doc_id, md5({NORM_SQL}) AS fingerprint FROM documents"


@register("x11_fingerprint_md5", _X11_SQL, "EXT-05", tier=1)
def x11_fingerprint_md5(spark, sf_dir):
    return T.fingerprint_md5(_t(spark, sf_dir, "documents"))


@register(
    "x08_11_text_profile",
    f"""SELECT t.doc_id, t.n_tokens, t.n_subtokens, t.n_chars,
               q.stop_ratio, q.punct_ratio, q.quality, l.lang_pred, f.fingerprint
        FROM ({_X08_SQL}) t
        JOIN ({_quality_sql()}) q USING (doc_id)
        JOIN ({_lang_id_sql()}) l USING (doc_id)
        JOIN ({_X11_SQL}) f USING (doc_id)""",
    "EXT-05",
    tier=1,  # r10: consolidated into t4 (stays in bench HEADLINE, r4 series)
)
def x08_11_text_profile(spark, sf_dir):
    """EXT-05 one-pass profile: token stats + quality + lang-id + md5
    fingerprint as a single row-local projection over ONE tokenize barrier
    (operators/textanalysis.text_profile) — vs four separate corpus scans.
    The oracle composes the four standalone generated SQLs by doc_id join;
    Spark computes them in one pass with zero shuffles."""
    return T.text_profile(_t(spark, sf_dir, "documents"))


@register(
    "x12_winnow_fingerprints",
    "WITH "
    + _TOKS_CTE
    + """,
       grams AS (SELECT doc_id,
                        list_transform(range(1, len(w) - 1),
                                       i -> md5(array_to_string(w[i:i+2], ' '))) AS g
                 FROM toks),
       mins AS (SELECT doc_id,
                       CASE WHEN len(g) >= 4
                            THEN list_transform(range(1, len(g) - 2),
                                                i -> list_aggregate(g[i:i+3], 'min'))
                            ELSE g END AS m
                FROM grams)
       SELECT DISTINCT doc_id, fp FROM mins, UNNEST(list_distinct(m)) AS u(fp)""",
    "EXT-05",
    tier=1,  # r7: driver row moved into x50_scale_analysis_suite ('winnow')
)
def x12_winnow_fingerprints(spark, sf_dir):
    """Winnowing fingerprints (k=3-gram md5, window-4 min)."""
    return T.winnow_fingerprints(_t(spark, sf_dir, "documents"), k=3, window=4)


# ---------------------------------------------------------------------------
# EXT-04 multimodal
# ---------------------------------------------------------------------------

@register(
    "x13_multimodal_meta",
    """SELECT doc_id,
              CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
              'image/fake' AS mime,
              md5(text) AS payload_md5
       FROM documents""",
    "EXT-04",
    tier=1,
)
def x13_multimodal_meta(spark, sf_dir):
    """EXT-04: binary payload column + typed metadata; metadata-only reads
    prune the payload chunk entirely (verify via ReadSchema)."""
    mm = attach_payload(_t(spark, sf_dir, "documents"))
    return mm.select(
        "doc_id",
        F.col("meta.n_bytes").alias("n_bytes"),
        F.col("meta.mime").alias("mime"),
        F.md5("payload").alias("payload_md5"),
    )


@register(
    "x14_multimodal_decode",
    """SELECT doc_id,
              CAST(54 + octet_length(encode(text)) AS BIGINT) AS n_bytes,
              CAST(16 + (CASE WHEN length(text) = 0 THEN 0
                              ELSE ascii(substr(text, 1, 1)) END) % 64 AS BIGINT) AS width,
              CAST(16 + octet_length(encode(text)) % 64 AS BIGINT) AS height,
              'image/bmp' AS mime
       FROM documents""",
    "EXT-04",
    tier=1,  # r9: consolidated into m2_multimodal_suite (stays in bench HEADLINE)
)
def x14_multimodal_decode(spark, sf_dir):  # the Arrow decode path
    """EXT-04: REAL header decode via mapInPandas. attach_bmp_payload builds
    a genuine BMP per document (JVM-side binary assembly, dims a closed form
    of the text); parse_image_header reads mime/width/height back from the
    actual header bytes. The oracle computes the same closed form, so the
    driver hash proves the byte-level parse — pixel decoding (PIL/ffmpeg)
    remains the only stubbed step (operators/multimodal.py)."""
    from .operators.multimodal import attach_bmp_payload

    return decode_payloads(attach_bmp_payload(_t(spark, sf_dir, "documents")))


# ---------------------------------------------------------------------------
# EXT-06/07 window aggregation (batch form; streaming in streaming/jobs.py)
# ---------------------------------------------------------------------------

_X15_SQL = """SELECT (epoch_us(ts) // 600000000) * 600000000 AS window_start_us,
              CAST(count(*) AS BIGINT) AS n_events,
              round(sum(value), 2) AS sum_value
       FROM events GROUP BY 1"""

_X16_SQL = """SELECT ws AS window_start_us, CAST(count(*) AS BIGINT) AS n_events,
              round(sum(value), 2) AS sum_value
       FROM (
           SELECT (epoch_us(ts) // 300000000) * 300000000 AS ws, value FROM events
           UNION ALL
           SELECT (epoch_us(ts) // 300000000) * 300000000 - 300000000 AS ws, value
           FROM events
       ) GROUP BY ws"""


@register("x15_window_tumbling", _X15_SQL, "EXT-06", tier=1)
def x15_window_tumbling(spark, sf_dir):
    return W.tumbling_window_agg(_t(spark, sf_dir, "events"), width_s=600)


@register("x16_window_sliding", _X16_SQL, "EXT-06", tier=1)
def x16_window_sliding(spark, sf_dir):
    return W.sliding_window_agg(_t(spark, sf_dir, "events"), width_s=600, slide_s=300)


@register(
    "x15_16_window_batch",
    f"""SELECT 'tumble' AS kind, window_start_us, n_events, sum_value
        FROM ({_X15_SQL})
        UNION ALL
        SELECT 'slide' AS kind, window_start_us, n_events, sum_value
        FROM ({_X16_SQL})""",
    "EXT-06",
    tier=1,  # r10: consolidated into w5 (stays in bench HEADLINE, r4 series)
)
def x15_16_window_batch(spark, sf_dir):
    """EXT-06 batch forms as one tagged result: epoch-aligned tumbling
    (600s) + sliding (600s width / 300s slide) via Spark's native
    ``window()`` — each branch is exactly the standalone x15/x16 plan."""
    e = _t(spark, sf_dir, "events")
    tumble = W.tumbling_window_agg(e, width_s=600).select(
        F.lit("tumble").alias("kind"), "window_start_us", "n_events", "sum_value"
    )
    slide = W.sliding_window_agg(e, width_s=600, slide_s=300).select(
        F.lit("slide").alias("kind"), "window_start_us", "n_events", "sum_value"
    )
    return tumble.unionByName(slide)


@register(
    "x17_window_session",
    """WITH marked AS (
           SELECT user_id, ts, epoch_us(ts) AS us,
                  CASE WHEN epoch_us(ts) - lag(epoch_us(ts))
                           OVER (PARTITION BY user_id ORDER BY ts) > 1800000000
                       THEN 1 ELSE 0 END AS brk
           FROM events),
       sess AS (
           SELECT user_id, us,
                  CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY us
                                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS BIGINT) AS session_id
           FROM marked)
       SELECT user_id, session_id,
              min(us) AS session_start_us, max(us) AS session_end_us,
              CAST(count(*) AS BIGINT) AS n_events
       FROM sess GROUP BY user_id, session_id""",
    "EXT-07",
    tier=1,
)
def x17_window_session(spark, sf_dir):
    return W.session_window_agg(_t(spark, sf_dir, "events"), gap_s=1800)


@register(
    "x18_stream_tumbling",
    # tier 1 since r9: consolidated into st3_stream_window_suite (stays in
    # bench HEADLINE for the frozen r4 series)
    """SELECT (epoch_us(ts) // 600000000) * 600000000 AS window_start_us,
              CAST(count(*) AS BIGINT) AS n_events,
              round(sum(value), 2) AS sum_value
       FROM events GROUP BY 1""",
    "EXT-06", "EXT-08",
    tier=1,
)
def x18_stream_tumbling(spark, sf_dir):
    """EXT-06/08 via REAL Structured Streaming: readStream over the events
    parquet, watermark + tumbling window agg, availableNow trigger, memory
    sink — a full replay emits exactly the batch result, which is what the
    oracle checks."""
    from .streaming.jobs import run_tumbling_stream

    return run_tumbling_stream(spark, sf_dir, width_s=600)


@register(
    "x19_stream_session",
    """WITH marked AS (
           SELECT user_id, epoch_us(ts) AS us,
                  CASE WHEN epoch_us(ts) - lag(epoch_us(ts))
                           OVER (PARTITION BY user_id ORDER BY ts) >= 1800000000
                       THEN 1 ELSE 0 END AS brk
           FROM events),
       sess AS (
           SELECT user_id, us,
                  sum(brk) OVER (PARTITION BY user_id ORDER BY us
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                      AS session_id
           FROM marked)
       SELECT user_id, min(us) AS session_start_us,
              CAST(count(*) AS BIGINT) AS n_events
       FROM sess GROUP BY user_id, session_id""",
    "EXT-07", "EXT-08",
    tier=1,  # r9: consolidated into st3_stream_window_suite (stays in bench HEADLINE)
)
def x19_stream_session(spark, sf_dir):
    """EXT-07 via REAL Structured Streaming: native ``session_window`` with
    a watermark, availableNow replay, memory sink. Note the gap boundary:
    ``session_window`` windows are end-EXCLUSIVE ([start, last+gap)), so an
    event at exactly ``gap`` after its predecessor starts a NEW session —
    the oracle's break condition is ``>=`` where the batch lag-based
    formulation (x17) uses ``>``."""
    from .streaming.jobs import run_session_window_stream

    return run_session_window_stream(spark, sf_dir, gap_s=1800)


@register(
    "x20_stream_dedup",
    """SELECT user_id, CAST(count(DISTINCT event_type) AS BIGINT) AS n_unique_types
       FROM events GROUP BY user_id""",
    "EXT-09",
    tier=1,  # r9: consolidated into st4_stream_pair_suite (stays in bench HEADLINE)
)
def x20_stream_dedup(spark, sf_dir):
    """EXT-09: stateful streaming dedup via ``dropDuplicatesWithinWatermark``
    on (user_id, event_type). The bounded replay lands in one micro-batch
    (single file source), where the dedup state sees every row, so the
    retained set equals batch-distinct — the oracle-checkable invariant.
    (Across micro-batches the operator only guarantees dedup within the
    watermark horizon — that weaker contract is the point of the operator:
    bounded state on an unbounded stream.)"""
    from .streaming.jobs import run_stream_dedup

    return run_stream_dedup(spark, sf_dir)

@register(
    "x21_stream_sliding",
    """SELECT ws AS window_start_us, CAST(count(*) AS BIGINT) AS n_events,
              round(sum(value), 2) AS sum_value
       FROM (
           SELECT (epoch_us(ts) // 300000000) * 300000000 AS ws, value FROM events
           UNION ALL
           SELECT (epoch_us(ts) // 300000000) * 300000000 - 300000000 AS ws, value
           FROM events
       ) GROUP BY ws""",
    "EXT-06", "EXT-08",
    tier=1,
)
def x21_stream_sliding(spark, sf_dir):
    """EXT-06 via REAL Structured Streaming: watermarked sliding window
    (600s width, 300s slide) — full replay equals the batch sliding agg."""
    from .streaming.jobs import run_sliding_stream

    return run_sliding_stream(spark, sf_dir, width_s=600, slide_s=300)


@register(
    "x22_stream_stream_join",
    """SELECT p.event_id AS purchase_id, c.event_id AS click_id,
              epoch_us(p.ts) AS p_ts_us, epoch_us(c.ts) AS c_ts_us
       FROM events p JOIN events c
         ON p.user_id = c.user_id
        AND epoch_us(c.ts) >= epoch_us(p.ts) - 1800000000
        AND epoch_us(c.ts) <= epoch_us(p.ts)
       WHERE p.event_type = 'purchase' AND c.event_type = 'click'""",
    "EXT-08", "EXT-09",
    tier=1,  # r9: consolidated into st4_stream_pair_suite (stays in bench HEADLINE)
)
def x22_stream_stream_join(spark, sf_dir):
    """EXT-08/09: stream-stream inner join with watermarks + event-time
    range condition (bounded state); purchases × same-user clicks within
    the trailing 30 minutes."""
    from .streaming.jobs import run_stream_stream_join

    return run_stream_stream_join(spark, sf_dir, lookback_s=1800)


@register(
    "x23_stream_stateful_seq",
    """SELECT user_id, event_id,
              CAST(row_number() OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS BIGINT) AS seq
       FROM events""",
    "EXT-09",
    tier=1,
)
def x23_stream_stateful_seq(spark, sf_dir):
    """EXT-09: custom stateful operator (applyInPandasWithState) — per-user
    monotone sequence numbers carried in explicit group state."""
    from .streaming.jobs import run_stateful_seq_stream

    return run_stateful_seq_stream(spark, sf_dir)

def _op20_stream_oracle() -> str:
    from .fixture_queries import _OP20_ORACLE

    return _OP20_ORACLE


@register(
    "x24_stream_threading", _op20_stream_oracle(), "OP-20", "EXT-09",
    tier=1,  # r10: consolidated into w5 (stays in bench HEADLINE, r4 series)
)
def x24_stream_threading(spark, sf_dir):
    """EXT-09: the reference's OP-20 threading walk as a STREAMING stateful
    operator (applyInPandasWithState; per-video state = prior ids +
    deletion times). Bounded replay equals the batch op20 oracle."""
    from .streaming.jobs import run_stream_threading

    return run_stream_threading(spark, sf_dir)


def _hyperplane_sql(panel: str = "vec_id % 50 = 0") -> str:
    from .operators.similarity import N_PLANES, hyperplane_signs

    signs = hyperplane_signs()
    bucket = " + ".join(
        "(CASE WHEN list_inner_product(CAST(embedding AS DOUBLE[]), ["
        + ", ".join(str(s) for s in signs[p])
        + f"]) > 0 THEN {2 ** p} ELSE 0 END)"
        for p in range(N_PLANES)
    )
    return f"""WITH b AS (SELECT vec_id, embedding, CAST({bucket} AS BIGINT) AS bucket
                FROM embeddings),
       q AS (SELECT vec_id AS q_id, embedding AS qv, bucket FROM b
             WHERE {panel}),
       scored AS (SELECT q_id, c.vec_id AS n_id,
                         round(list_cosine_similarity(CAST(qv AS DOUBLE[]),
                                                      CAST(c.embedding AS DOUBLE[])), 6) AS score
                  FROM q JOIN b c USING (bucket) WHERE c.vec_id <> q_id),
       ranked AS (SELECT q_id, n_id, score,
                         row_number() OVER (PARTITION BY q_id
                                            ORDER BY score DESC, n_id) AS rk
                  FROM scored)
       SELECT q_id, n_id, CAST(rk AS BIGINT) AS rk, round(score, 4) AS score
       FROM ranked WHERE rk <= 5"""


@register(
    "x25_knn_hyperplane_lsh", _hyperplane_sql(), "EXT-03",
    tier=1,  # r9: consolidated into s4_ann_suite (stays in bench HEADLINE)
)
def x25_knn_hyperplane_lsh(spark, sf_dir):
    """EXT-03 LSH tier: signed-random-projection buckets (8 deterministic
    md5-parity hyperplanes, shared literally with the oracle), candidates =
    same bucket, exact cosine rank within."""
    from .operators.similarity import knn_hyperplane_lsh

    emb = _t(spark, sf_dir, "embeddings")
    return knn_hyperplane_lsh(emb, emb.filter(F.col("vec_id") % 50 == 0), k=5)

def _features_sql() -> str:
    from .operators.multimodal import N_FEATURES

    cols = ",\n              ".join(
        f"CASE WHEN length(text) >= {i} THEN CAST(ascii(substr(text, {i}, 1)) AS DOUBLE)"
        f" ELSE 0.0 END AS f{i - 1}"
        for i in range(1, N_FEATURES + 1)
    )
    return f"SELECT doc_id,\n              {cols}\n       FROM documents"


@register(
    "x26_multimodal_features", _features_sql(), "EXT-04",
    tier=1,  # r9: consolidated into m2_multimodal_suite (stays in bench HEADLINE)
)
def x26_multimodal_features(spark, sf_dir):
    """EXT-04: payload → fixed-width feature vector via mapInPandas
    (deterministic stub = first 8 payload bytes, so it IS oracle-checked;
    a real model call swaps in per Arrow batch). Features surfaced as
    scalar columns for the cross-engine hash."""
    from .operators.multimodal import N_FEATURES, attach_payload, extract_features

    feats = extract_features(attach_payload(_t(spark, sf_dir, "documents")))
    return feats.select(
        "doc_id", *[F.col("features")[i].alias(f"f{i}") for i in range(N_FEATURES)]
    )


def _cc_sql() -> str:
    return f"""WITH RECURSIVE {_TOKS_CTE},
{_DS_CTE},
rare AS (SELECT sh FROM ds GROUP BY sh HAVING count(*) <= {MAX_DOC_FREQ}),
dsf AS (SELECT ds.doc_id, ds.sh FROM ds JOIN rare USING (sh)),
sizes AS (SELECT doc_id, count(*) AS n FROM dsf GROUP BY doc_id),
inter AS (SELECT x.doc_id AS doc_a, y.doc_id AS doc_b, count(*) AS i
          FROM dsf x JOIN dsf y USING (sh)
          WHERE x.doc_id < y.doc_id GROUP BY 1, 2),
pairs AS (SELECT doc_a, doc_b
          FROM inter JOIN sizes na ON doc_a = na.doc_id
                     JOIN sizes nb ON doc_b = nb.doc_id
          WHERE i / CAST(na.n + nb.n - i AS DOUBLE) >= {JACCARD_THRESHOLD}),
edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
          UNION ALL SELECT doc_b, doc_a FROM pairs),
reach AS (SELECT doc_id, doc_id AS n FROM documents
          UNION
          SELECT r.doc_id, e.dst FROM reach r JOIN edges e ON e.src = r.n)
SELECT doc_id, CAST(min(n) AS BIGINT) AS rep,
       (doc_id = min(n)) AS keep
FROM reach GROUP BY doc_id"""


@register(
    "x27_dedup_connected_components", _cc_sql(), "EXT-02",
    tier=1,  # r10: consolidated into d4 (stays in bench HEADLINE, r4 series)
)
def x27_dedup_connected_components(spark, sf_dir):
    """EXT-02 cluster tier: near-dup pairs (same shingle-Jaccard spec as
    x02) → connected components by iterative min-label propagation →
    keep-one decision per document. Oracle = DuckDB recursive CTE computing
    min-reachable-id, byte-identical semantics."""
    docs = _t(spark, sf_dir, "documents")
    pairs = D.ngram_jaccard_pairs(
        docs, threshold=JACCARD_THRESHOLD, max_doc_freq=MAX_DOC_FREQ
    ).select("doc_a", "doc_b")
    return D.dedup_keep_one(docs, pairs)


# ---------------------------------------------------------------------------
# EXT-05 term weighting + sentiment lexicon (SURVEY §2.10; VERDICT r1 item 5)
# ---------------------------------------------------------------------------

@register(
    "x28_term_doc_freq",
    "WITH "
    + _TOKS_CTE
    + """,
       tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
              FROM toks, UNNEST(w) AS u(term) GROUP BY doc_id, term),
       dfq AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term),
       r AS (SELECT tf.doc_id, tf.term, tf.tf, dfq.df,
                    row_number() OVER (PARTITION BY tf.doc_id
                                       ORDER BY tf.tf DESC, dfq.df ASC, tf.term ASC) AS rk
             FROM tf JOIN dfq USING (term))
       SELECT doc_id, term, tf, df, CAST(rk AS BIGINT) AS rk
       FROM r WHERE rk <= 5""",
    "EXT-05", "OP-28",
    tier=1,  # r10: consolidated into d4 (stays in bench HEADLINE, r4 series)
)
def x28_term_doc_freq(spark, sf_dir):
    """EXT-05 term weighting (CountVectorizer-equivalent document-frequency
    statistics): per-(doc, term) tf, per-term df, top-5 terms per doc by
    (tf DESC, df ASC, term ASC) — the integer-exact order statistic behind
    tf·idf; see operators/textanalysis.term_doc_freq for the scale notes
    (explode → partial aggs → term-key shuffle join → per-doc top-k).
    Also the driver-verified home of OP-28 (explode/flatten-then-count,
    index.mjs:37)."""
    return T.term_doc_freq(_t(spark, sf_dir, "documents"), top_k=5)


def _sentiment_sql() -> str:
    vals = ", ".join(f"('{w}', {wt})" for w, wt in T.SENTIMENT_LEXICON.items())
    return (
        "WITH "
        + _TOKS_CTE
        + f""",
        lex(term, weight) AS (VALUES {vals}),
        hits AS (SELECT doc_id,
                        CAST(sum(CASE WHEN weight > 0 THEN 1 ELSE 0 END) AS BIGINT) AS pos_hits,
                        CAST(sum(CASE WHEN weight < 0 THEN 1 ELSE 0 END) AS BIGINT) AS neg_hits,
                        CAST(sum(weight) AS BIGINT) AS score
                 FROM toks, UNNEST(w) AS u(term) JOIN lex USING (term)
                 GROUP BY doc_id)
        SELECT d.doc_id,
               coalesce(pos_hits, 0) AS pos_hits,
               coalesce(neg_hits, 0) AS neg_hits,
               coalesce(score, 0) AS score,
               CASE WHEN coalesce(score, 0) > 0 THEN 'pos'
                    WHEN coalesce(score, 0) < 0 THEN 'neg'
                    ELSE 'neu' END AS label
        FROM documents d LEFT JOIN hits USING (doc_id)"""
    )


@register(
    "x31_multimodal_resize",
    # empty/NULL text: the Spark stub emits 1024 zero bytes — the CASE arm
    # pins the DuckDB side to the same md5 (division by length(text) would
    # otherwise yield NULL and break parity on fixture regeneration)
    """SELECT doc_id,
              CASE WHEN text IS NULL OR length(text) = 0
                   THEN '0f343b0931126a20f133d67c2b018a3b'
                   ELSE md5(substr(repeat(text,
                                          CAST((1024 + length(text) - 1)
                                               // length(text) AS INT)),
                            1, 1024)) END AS resized_md5,
              CAST(32 AS BIGINT) AS width, CAST(32 AS BIGINT) AS height
       FROM documents""",
    "EXT-04",
    tier=1,
)
def x31_multimodal_resize(spark, sf_dir):
    """EXT-04 payload→payload transform (resize/transcode template): the
    stub "resize" cycles the payload to width×height bytes over mapInPandas
    — binary stays Arrow-batched end to end. Output payload hashes as md5
    hex (ASCII corpus ⇒ DuckDB repeat/substr slices the same bytes)."""
    from .operators.multimodal import resize_payloads

    resized = resize_payloads(
        attach_payload(_t(spark, sf_dir, "documents")), width=32, height=32
    )
    return resized.select(
        "doc_id", F.md5("payload").alias("resized_md5"), "width", "height"
    )


@register(
    "x30_multimodal_frames",
    """WITH n AS (SELECT doc_id, text,
                        CAST((length(text) + 63) // 64 AS INT) AS nf
                 FROM documents)
       SELECT doc_id, CAST(fno AS BIGINT) AS frame_no,
              md5(substr(text, fno * 64 + 1, 64)) AS frame_md5
       FROM n, UNNEST(range(0, nf)) AS u(fno)
       WHERE fno % 4 = 0""",
    "EXT-04",
    tier=1,
)
def x30_multimodal_frames(spark, sf_dir):
    """EXT-04 frame sampling: payload → MANY rows (one per kept frame) via
    mapInPandas — the video analog of explode; every 4th 64-byte chunk.
    Frames surface as md5 hex so the cross-engine hash is byte-stable (the
    fixture corpus is pure ASCII, so DuckDB's char-based substr slices the
    same bytes Spark's binary chunking does)."""
    from .operators.multimodal import sample_frames

    frames = sample_frames(attach_payload(_t(spark, sf_dir, "documents")))
    return frames.select("doc_id", "frame_no", F.md5("frame").alias("frame_md5"))


@register("x29_sentiment_lexicon", _sentiment_sql(), "EXT-05", tier=1)
def x29_sentiment_lexicon(spark, sf_dir):
    """EXT-05 sentiment-lexicon scorer: explode tokens → broadcast-join the
    ±1 wordlist → per-doc hit counts + signed score, zero-hit docs kept with
    explicit 0 (left join back to documents). The lexicon is generated into
    the oracle VALUES list from the same constant."""
    return T.sentiment_score(_t(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# EXT-05 additions: Gopher repetition filter + deterministic sampling
# ---------------------------------------------------------------------------

def _x32_sql() -> str:
    from .operators.textanalysis import REP_RATIO_MAX, TTR_MIN

    return (
        "WITH "
        + _TOKS_CTE
        + """,
grams AS (SELECT doc_id, g FROM toks,
          UNNEST(list_transform(range(1, len(w)),
                 i -> array_to_string(w[i:i+1], ' '))) AS u(g)),
gc AS (SELECT doc_id, g, count(*) AS c FROM grams GROUP BY 1, 2),
gs AS (SELECT doc_id, sum(c) AS n_grams, max(c) AS top_gram_n FROM gc GROUP BY 1),
ws AS (SELECT doc_id, len(w) AS n_words, len(list_distinct(w)) AS n_distinct
       FROM toks),
j AS (SELECT ws.doc_id, n_words, n_distinct,
             CAST(coalesce(n_grams, 0) AS BIGINT) AS n_grams,
             CAST(coalesce(top_gram_n, 0) AS BIGINT) AS top_gram_n
      FROM ws LEFT JOIN gs ON ws.doc_id = gs.doc_id),
r AS (SELECT *,
             round(CASE WHEN n_grams > 0
                        THEN top_gram_n / CAST(n_grams AS DOUBLE)
                        ELSE 0.0 END, 4) AS rep_ratio,
             round(CASE WHEN n_words > 0
                        THEN n_distinct / CAST(n_words AS DOUBLE)
                        ELSE 0.0 END, 4) AS ttr
      FROM j)
SELECT doc_id, CAST(n_words AS BIGINT) AS n_words,
       CAST(n_distinct AS BIGINT) AS n_distinct, n_grams, top_gram_n,
       rep_ratio, ttr,
"""
        + f"       (rep_ratio <= {REP_RATIO_MAX} AND ttr >= {TTR_MIN}) AS keep\n"
        + "FROM r"
    )


@register("x32_gopher_repetition", _x32_sql(), "EXT-05", tier=1)
def x32_gopher_repetition(spark, sf_dir, docs=None):
    """EXT-05 repetition filter (Gopher-shaped rule, Rae et al. 2021): top
    word-2-gram fraction + type-token ratio per doc, keep-flag from the
    rounded ratios. Word stats row-local; the gram stats are two
    partial-aggregate shuffles keyed by doc_id."""
    return T.repetition_stats(
        docs if docs is not None else _t(spark, sf_dir, "documents")
    )


def _x33_sql() -> str:
    from .operators.textanalysis import SAMPLE_CUTOFFS, SAMPLE_DEFAULT_CUTOFF

    cases = " ".join(
        f"WHEN lang = '{stratum}' THEN '{cut}'"
        for stratum, cut in sorted(SAMPLE_CUTOFFS.items())
    )
    return f"""SELECT doc_id, lang, source
FROM documents
WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)
      < CASE {cases} ELSE '{SAMPLE_DEFAULT_CUTOFF}' END"""


@register("x33_stratified_sample", _x33_sql(), "EXT-05", tier=1)
def x33_stratified_sample(spark, sf_dir, docs=None):
    """EXT-05 deterministic stratified sampling: lexicographic md5-hex
    cutoff per stratum (en ≈ 0.5, others ≈ 0.25). Row-local, zero shuffle,
    reproducible across engines/runs/partitionings, and nested across rates
    (a lower rate yields a subset) — the down-scaling-ablation property
    ``DataFrame.sample`` cannot give."""
    return T.stratified_sample(
        docs if docs is not None else _t(spark, sf_dir, "documents")
    ).select(
        "doc_id", "lang", "source"
    )


# ---------------------------------------------------------------------------
# EXT-03 addition: deterministic k-means training for IVF centroids
# ---------------------------------------------------------------------------

def _x34_sql() -> str:
    from .operators.similarity import KMEANS_QUANT

    q = KMEANS_QUANT

    def assign(cent: str, tag: str) -> str:
        return f"""a{tag} AS (
    SELECT v_id, vec, cell FROM (
        SELECT e.vec_id AS v_id, CAST(e.embedding AS DOUBLE[]) AS vec, c.cell,
               row_number() OVER (
                   PARTITION BY e.vec_id
                   ORDER BY round(list_cosine_similarity(
                       CAST(e.embedding AS DOUBLE[]), c.cv), 6) DESC, c.cell
               ) AS rk
        FROM embeddings e, {cent} c)
    WHERE rk = 1)"""

    def mean(tag: str) -> str:
        # no WITH ORDINALITY in DuckDB: unnest + generate_subscripts give
        # the same (val, 1-based pos) pairs
        return f"""e{tag} AS (
    SELECT cell, unnest(vec) AS val, generate_subscripts(vec, 1) AS pos
    FROM a{tag}),
m{tag} AS (
    SELECT cell, pos, sum(CAST(round(val * {q}) AS BIGINT)) AS s,
           count(*) AS n
    FROM e{tag}
    GROUP BY 1, 2)"""

    return f"""WITH cent0 AS (SELECT vec_id AS cell, CAST(embedding AS DOUBLE[]) AS cv
               FROM embeddings WHERE vec_id < 80),
{assign('cent0', '1')},
{mean('1')},
cent1 AS (SELECT cell, list(s / (n * {q}.0) ORDER BY pos) AS cv
          FROM m1 GROUP BY cell),
{assign('cent1', '2')},
{mean('2')}
SELECT cell, CAST(pos - 1 AS BIGINT) AS pos,
       CAST(CASE WHEN s < 0 THEN -((2 * abs(s) + n) // (2 * n))
                 ELSE (2 * abs(s) + n) // (2 * n) END AS DOUBLE) / {q}
           AS val,
       CAST(n AS BIGINT) AS n_members
FROM m2"""


@register("x34_ivf_train_kmeans", _x34_sql(), "EXT-03", tier=1)
def x34_ivf_train_kmeans(spark, sf_dir):
    """EXT-03 iterative tier: two deterministic Lloyd's iterations refining
    the x07 fixed 80-vector seed centroids. Assignment is the pinned IVF pattern
    (broadcast centroids, round-6 cosine, min-cell ties); means are exact
    quantized-integer sums, so even this ITERATIVE algorithm has a
    bit-exact SQL oracle (unrolled CTEs) instead of a weak rows-only check.
    Output is the exploded centroid store (cell, pos, val, n_members)."""
    emb = _t(spark, sf_dir, "embeddings")
    return S.kmeans_train(emb, emb.filter(F.col("vec_id") < 80), iters=2)


# ---------------------------------------------------------------------------
# EXT-05 additions: PII scrubbing, sequence packing, domain-mix resampling
# ---------------------------------------------------------------------------

#: Deterministic PII injection shared by the Spark query and its oracle:
#: the fixture corpus contains no emails/IPs/phones (word-salad text), so
#: the registered query plants one of each per doc — the operator under
#: test is the scrubber, not the generator.
def _pii_suffix_spark() -> list:
    return [
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@mail.example.com ip 10.0."),
        (F.col("doc_id") % 256).cast("string"),
        F.lit(".7 call +1555"),
        F.lpad(F.col("doc_id").cast("string"), 6, "0"),
    ]
_PII_SUFFIX_SQL = (
    "text || ' contact user' || CAST(doc_id AS VARCHAR)"
    " || '@mail.example.com ip 10.0.' || CAST(doc_id % 256 AS VARCHAR)"
    " || '.7 call +1555' || lpad(CAST(doc_id AS VARCHAR), 6, '0')"
)


def _x35_sql() -> str:
    cur = "t0"
    ctes = [f"t0 AS (SELECT doc_id, {_PII_SUFFIX_SQL} AS c FROM documents)"]
    counts = []
    for i, (name, pat, repl) in enumerate(T.PII_PATTERNS, start=1):
        ctes.append(
            f"t{i} AS (SELECT doc_id, "
            + ", ".join(counts)
            + (", " if counts else "")
            + f"CAST(len(regexp_extract_all(c, '{pat}')) AS BIGINT) AS n_{name}, "
            f"regexp_replace(c, '{pat}', '{repl}', 'g') AS c FROM t{i - 1})"
        )
        counts.append(f"n_{name}")
        cur = f"t{i}"
    cols = ", ".join(counts)
    return (
        "WITH " + ",\n".join(ctes) + f"\nSELECT doc_id, {cols}, c AS clean_text FROM {cur}"
    )


@register("x35_pii_scrub", _x35_sql(), "EXT-05", tier=1)
def x35_pii_scrub(spark, sf_dir):
    """EXT-05 PII redaction: email → IPv4 → intl-phone scrub with per-category
    counts (operators/textanalysis.pii_scrub). Row-local codegen regex, zero
    shuffle; patterns restricted to the Java∩RE2 regex subset so the DuckDB
    oracle scrubs byte-identically."""
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", F.concat(F.col("text"), *_pii_suffix_spark()).alias("text")
    )
    return T.pii_scrub(docs)


def _x36_sql() -> str:
    cap = T.PACK_CAPACITY
    return f"""WITH normtext AS (SELECT doc_id, source, {NORM_SQL} AS t FROM documents),
toks AS (SELECT doc_id, source, string_split(t, ' ') AS w FROM normtext),
base AS (SELECT doc_id, source AS shard, CAST(len(w) AS BIGINT) AS n_tok FROM toks),
c AS (SELECT doc_id, shard, n_tok,
             sum(n_tok) OVER (PARTITION BY shard ORDER BY doc_id
                              ROWS UNBOUNDED PRECEDING) AS cum
      FROM base)
SELECT doc_id, shard, n_tok,
       CAST(floor((cum - n_tok) / {cap}) AS BIGINT) AS start_pack,
       CAST(greatest(floor((cum - n_tok) / {cap}),
                     floor((cum - 1) / {cap})) AS BIGINT) AS end_pack
FROM c"""


@register("x36_sequence_pack", _x36_sql(), "EXT-05", tier=1)
def x36_sequence_pack(spark, sf_dir):
    """EXT-05 sequence packing: concat-then-chunk assignment of docs to
    fixed-capacity token windows, per source shard in doc_id order
    (operators/textanalysis.sequence_pack) — the padding-free context-window
    fill of LLM pretraining. One running-sum window per shard."""
    return T.sequence_pack(_t(spark, sf_dir, "documents"))


def _x37_sql() -> str:
    whole_cases = " ".join(
        f"WHEN '{src}' THEN {n}" for src, (n, _) in sorted(T.MIX_WEIGHTS.items())
    )
    cut_cases = " ".join(
        f"WHEN '{src}' THEN '{cut}'" for src, (_, cut) in sorted(T.MIX_WEIGHTS.items())
    )
    return f"""WITH w AS (
  SELECT doc_id, source,
         CASE source {whole_cases} ELSE {T.MIX_DEFAULT[0]} END
         + CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)
                     < CASE source {cut_cases} ELSE '{T.MIX_DEFAULT[1]}' END
                THEN 1 ELSE 0 END AS n
  FROM documents)
SELECT doc_id, source, CAST(u.copy AS BIGINT) AS copy
FROM w, UNNEST(range(1, n + 1)) AS u(copy)
WHERE n >= 1"""


@register("x37_mix_resample", _x37_sql(), "EXT-05", tier=1)
def x37_mix_resample(spark, sf_dir):
    """EXT-05 domain-mix rebalancing: per-source target weights (2× / 1.5× /
    0.25× / 1×) via whole-copy explode plus the nested-sample md5 coin
    (operators/textanalysis.mix_resample). Row-local, zero shuffle."""
    return T.mix_resample(_t(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# EXT-03/05 additions: int8 quantization, overlap chunking, decontamination
# ---------------------------------------------------------------------------

@register(
    "x38_embedding_quantize_int8",
    """WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS x FROM embeddings),
       s AS (SELECT vec_id, x,
                    list_max(list_transform(x, e -> abs(e))) / 127.0 AS sc
             FROM v)
       SELECT vec_id,
              round(sc * 127.0, 6) AS max_abs,
              CASE WHEN sc > 0
                   THEN list_transform(x, e -> CAST(round(e / sc) AS INTEGER))
                   ELSE list_transform(x, e -> 0) END AS qvec,
              round(CASE WHEN sc > 0
                         THEN list_sum(list_transform(
                                  x, e -> pow(e - round(e / sc) * sc, 2)))
                         ELSE 0.0 END / len(x), 6) AS mse
       FROM s""",
    "EXT-03",
    tier=1,
)
def x38_embedding_quantize_int8(spark, sf_dir):
    """EXT-03 storage tier: symmetric per-vector int8 quantization with
    round-trip MSE diagnostics (operators/similarity.quantize_int8) — the
    4x compression pass before IVF/LSH indexing. Row-local JVM HOFs, zero
    shuffle, no Python."""
    return S.quantize_int8(_t(spark, sf_dir, "embeddings"))


def _x39_sql() -> str:
    w, st = T.CHUNK_WINDOW, T.CHUNK_STRIDE
    return f"""WITH normtext AS (SELECT doc_id, {NORM_SQL} AS t FROM documents),
toks AS (SELECT doc_id, string_split(t, ' ') AS w FROM normtext),
base AS (SELECT doc_id, w, len(w) AS n FROM toks
         WHERE len(w) >= 1 AND w[1] <> ''),
st AS (SELECT doc_id, w, CAST(n AS BIGINT) AS n_tok,
              unnest(range(0, n, {st})) AS start,
              generate_subscripts(range(0, n, {st}), 1) - 1 AS chunk_id
       FROM base)
SELECT doc_id, n_tok, CAST(chunk_id AS BIGINT) AS chunk_id,
       CAST(start AS BIGINT) AS start,
       CAST(len(w[start + 1:start + {w}]) AS BIGINT) AS chunk_len,
       array_to_string(w[start + 1:start + {w}], ' ') AS chunk_text
FROM st
WHERE start = 0 OR start + {w} - {st} < n_tok"""


@register("x39_chunk_overlap", _x39_sql(), "EXT-05", tier=1)
def x39_chunk_overlap(spark, sf_dir):
    """EXT-05 overlapping context-window chunking: 32-token chunks at
    24-token stride (operators/textanalysis.chunk_overlap) — the RAG-shape
    doc splitter. Row-local sequence+slice explode, zero shuffle."""
    return T.chunk_overlap(_t(spark, sf_dir, "documents"))


def _x40_sql() -> str:
    return (
        "WITH "
        + _TOKS_CTE
        + ",\n"
        + _DS_CTE
        + """,
bsh AS (SELECT DISTINCT sh FROM ds WHERE doc_id % 97 = 0),
corp AS (SELECT doc_id, sh FROM ds WHERE doc_id % 97 <> 0),
spine AS (SELECT doc_id FROM documents WHERE doc_id % 97 <> 0),
sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_sh FROM corp GROUP BY doc_id),
hits AS (SELECT corp.doc_id, CAST(count(*) AS BIGINT) AS n_hits
         FROM corp JOIN bsh USING (sh) GROUP BY corp.doc_id)
SELECT p.doc_id, CAST(COALESCE(s.n_sh, 0) AS BIGINT) AS n_sh,
       COALESCE(h.n_hits, 0) AS n_hits,
       round(COALESCE(h.n_hits, 0)
             / CAST(greatest(COALESCE(s.n_sh, 0), 1) AS DOUBLE), 4)
           AS hit_ratio,
       (round(COALESCE(h.n_hits, 0)
              / CAST(greatest(COALESCE(s.n_sh, 0), 1) AS DOUBLE), 4)
        >= 0.1) AS contaminated
FROM spine p LEFT JOIN sizes s ON p.doc_id = s.doc_id
             LEFT JOIN hits h ON p.doc_id = h.doc_id"""
    )


@register("x40_decontaminate", _x40_sql(), "EXT-05", tier=1)
def x40_decontaminate(spark, sf_dir):
    """EXT-05 benchmark decontamination: distinct word-3-gram overlap of
    every corpus doc (doc_id % 97 != 0) against the benchmark subset
    (doc_id % 97 == 0), with a 10% contamination flag
    (operators/textanalysis.decontaminate). Benchmark shingle set
    broadcasts; corpus shingles stream once with partial-agg hit counts."""
    docs = _t(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("doc_id") % 97 != 0)
    benchmark = docs.filter(F.col("doc_id") % 97 == 0)
    return T.decontaminate(corpus, benchmark)


@register("x41_dedup_cc_star", _cc_sql(), "EXT-02", tier=1)
def x41_dedup_cc_star(spark, sf_dir):
    """EXT-02 adversarial-graph cluster tier: the same near-dup keep-one
    decision as x27 but via large-star/small-star contraction
    (operators/dedup.connected_components_star) — O(log n) rounds on ANY
    graph shape, where min-label propagation needs diameter rounds and a
    pathological near-dup chain would trip its round guard. Oracle:
    identical recursive-CTE min-reachable SQL as x27 (same output by
    construction)."""
    docs = _t(spark, sf_dir, "documents")
    pairs = D.ngram_jaccard_pairs(
        docs, threshold=JACCARD_THRESHOLD, max_doc_freq=MAX_DOC_FREQ
    ).select("doc_a", "doc_b")
    return D.dedup_keep_one(docs, pairs, algorithm="star")


# ---------------------------------------------------------------------------
# Driver-window consolidation for the r4 pipeline ops (the same pattern as
# j12/op21_30: one kind-tagged union carries five query shapes into the
# hash-verified window; each stays registered standalone at tier 1).
# ---------------------------------------------------------------------------

def _x42_sql() -> str:
    return f"""SELECT 'pii' AS kind, doc_id, n_email AS v1, n_ip AS v2,
       n_phone AS v3, CAST(0 AS BIGINT) AS v4, md5(clean_text) AS s1
FROM ({_x35_sql()})
UNION ALL
SELECT 'pack', doc_id, n_tok, start_pack, end_pack, CAST(0 AS BIGINT), shard
FROM ({_x36_sql()})
UNION ALL
SELECT 'mix', doc_id, copy, CAST(0 AS BIGINT), CAST(0 AS BIGINT),
       CAST(0 AS BIGINT), source
FROM ({_x37_sql()})
UNION ALL
SELECT 'chunk', doc_id, chunk_id, start, chunk_len, n_tok, md5(chunk_text)
FROM ({_x39_sql()})
UNION ALL
SELECT 'decon', doc_id, n_sh, n_hits,
       CAST(round(hit_ratio * 10000) AS BIGINT),
       CAST(contaminated AS BIGINT), NULL
FROM ({_x40_sql()})"""


@register("x42_pipeline_suite", _x42_sql(), "EXT-05", "EXT-02", "EXT-03")
def x42_pipeline_suite(spark, sf_dir):
    """Driver-verified representative for the r4 training-pipeline surface:
    PII scrub (x35), sequence packing (x36), mix resampling (x37), overlap
    chunking (x39), and benchmark decontamination (x40) union-folded into
    one kind-tagged result (text payloads md5-compressed, ratios fixed-point
    — every column hash-stable). Each member query stays registered
    standalone at tier 1 with its own full-fidelity oracle."""
    zero = F.lit(0).cast("long")
    pii = x35_pii_scrub(spark, sf_dir).select(
        F.lit("pii").alias("kind"),
        "doc_id",
        F.col("n_email").alias("v1"),
        F.col("n_ip").alias("v2"),
        F.col("n_phone").alias("v3"),
        zero.alias("v4"),
        F.md5("clean_text").alias("s1"),
    )
    pack = x36_sequence_pack(spark, sf_dir).select(
        F.lit("pack").alias("kind"),
        "doc_id",
        F.col("n_tok").alias("v1"),
        F.col("start_pack").alias("v2"),
        F.col("end_pack").alias("v3"),
        zero.alias("v4"),
        F.col("shard").alias("s1"),
    )
    mix = x37_mix_resample(spark, sf_dir).select(
        F.lit("mix").alias("kind"),
        "doc_id",
        F.col("copy").alias("v1"),
        zero.alias("v2"),
        zero.alias("v3"),
        zero.alias("v4"),
        F.col("source").alias("s1"),
    )
    chunk = x39_chunk_overlap(spark, sf_dir).select(
        F.lit("chunk").alias("kind"),
        "doc_id",
        F.col("chunk_id").alias("v1"),
        F.col("start").alias("v2"),
        F.col("chunk_len").alias("v3"),
        F.col("n_tok").alias("v4"),
        F.md5("chunk_text").alias("s1"),
    )
    decon = x40_decontaminate(spark, sf_dir).select(
        F.lit("decon").alias("kind"),
        "doc_id",
        F.col("n_sh").alias("v1"),
        F.col("n_hits").alias("v2"),
        F.round(F.col("hit_ratio") * 10000).cast("long").alias("v3"),
        F.col("contaminated").cast("long").alias("v4"),
        F.lit(None).cast("string").alias("s1"),
    )
    return pii.unionByName(pack).unionByName(mix).unionByName(chunk).unionByName(decon)


def _x43_sql() -> str:
    # the batch x35 pipeline with the text payload md5-compressed
    return (
        f"SELECT doc_id, n_email, n_ip, n_phone, md5(clean_text) AS clean_md5\n"
        f"FROM ({_x35_sql()})"
    )


@register("x43_stream_pii_scrub", _x43_sql(), "EXT-05", "EXT-08", tier=1)
def x43_stream_pii_scrub(spark, sf_dir):
    """EXT-05/08: the PII scrubber applied to a document STREAM — stateless
    row-local transform in append mode over the bounded file-source replay
    (streaming/jobs.run_stream_transform); the same Column expressions the
    batch tier plans, per micro-batch. Oracle = the batch pipeline, which
    the bounded replay must reproduce exactly."""
    from .streaming.jobs import read_documents_stream, run_stream_transform

    def scrub(stream):
        injected = stream.select(
            "doc_id", F.concat(F.col("text"), *_pii_suffix_spark()).alias("text")
        )
        return T.pii_scrub(injected).select(
            "doc_id",
            "n_email",
            "n_ip",
            "n_phone",
            F.md5("clean_text").alias("clean_md5"),
        )

    return run_stream_transform(read_documents_stream(spark, sf_dir), scrub)


@register(
    "x44_bpe_pair_counts",
    "WITH "
    + _TOKS_CTE
    + """,
grams AS (SELECT array_to_string(w[i:i+1], ' ') AS pair
          FROM toks, UNNEST(range(1, len(w))) AS u(i)),
counts AS (SELECT pair, CAST(count(*) AS BIGINT) AS n FROM grams GROUP BY pair),
ranked AS (SELECT pair, n, row_number() OVER (ORDER BY n DESC, pair) AS rk
           FROM counts)
SELECT pair, n, CAST(rk AS BIGINT) AS rk FROM ranked WHERE rk <= 50""",
    "EXT-05",
    tier=1,
)
def x44_bpe_pair_counts(spark, sf_dir, docs=None):
    """EXT-05 tokenizer-training primitive: corpus-wide adjacent-token-pair
    frequencies, top 50 — the counting step of one BPE merge iteration
    (Sennrich et al. 2016). In-row 2-gram explode (non-distinct, unlike
    the dedup shingles) → ONE partial-agg groupBy(pair) → global top-k via
    TakeOrderedAndProject (rank ties broken by pair text). At 100 TB the
    pair dictionary partial-aggregates map-side, and only |pairs| rows —
    not token occurrences — cross the shuffle."""
    toked = T._with_tokens(
        docs if docs is not None else _t(spark, sf_dir, "documents"),
        "doc_id", "text",
    )
    toks = F.col("__toks")
    n2 = F.size(toks) - 1
    grams = F.when(
        n2 >= 1,
        F.transform(
            F.sequence(F.lit(1), n2), lambda i: F.array_join(F.slice(toks, i, 2), " ")
        ),
    ).otherwise(F.array().cast("array<string>"))
    counts = (
        toked.select(F.explode(grams).alias("pair"))
        .groupBy("pair")
        .agg(F.count("*").cast("long").alias("n"))
    )
    from pyspark.sql import Window as _W

    return (
        counts.withColumn(
            "rk", F.row_number().over(_W.orderBy(F.desc("n"), F.asc("pair"))).cast("long")
        )
        .filter(F.col("rk") <= 50)
        .select("pair", "n", "rk")
    )


@register(
    "x45_incremental_dedup",
    f"""WITH old AS (SELECT md5({NORM_SQL}) AS fp FROM documents WHERE doc_id % 10 < 8),
       new AS (SELECT doc_id, source, md5({NORM_SQL}) AS fp FROM documents
               WHERE doc_id % 10 >= 8)
       SELECT n.doc_id, n.source,
              (o.fp IS NOT NULL) AS is_dup_of_corpus
       FROM new n LEFT JOIN (SELECT DISTINCT fp FROM old) o ON n.fp = o.fp""",
    "EXT-01",
    tier=1,
)
def x45_incremental_dedup(spark, sf_dir):
    """EXT-01 incremental-ingest tier: flag each NEW document (doc_id%10≥8
    — standing in for today's crawl) whose normalized-text fingerprint
    already exists in the accumulated corpus (doc_id%10<8). The corpus
    side reduces to DISTINCT fingerprints before the join — at 100 TB
    that fingerprint index is the thing a production pipeline keeps
    bucketed on disk (sources/bucketed.py) so each nightly increment
    joins against it with zero corpus re-shuffle."""
    docs = _t(spark, sf_dir, "documents")
    fp = F.md5(normalize_text(F.col("text")))
    old = (
        docs.filter(F.col("doc_id") % 10 < 8).select(fp.alias("fp")).distinct()
    )
    new = docs.filter(F.col("doc_id") % 10 >= 8).select(
        "doc_id", "source", fp.alias("fp")
    )
    return (
        new.join(old.withColumnRenamed("fp", "ofp"), new.fp == F.col("ofp"), "left")
        .select("doc_id", "source", F.col("ofp").isNotNull().alias("is_dup_of_corpus"))
    )


@register(
    "x46_best_per_source",
    f"""WITH q AS ({_quality_sql()})
SELECT d.source, q.doc_id, q.quality, CAST(rk AS BIGINT) AS rk
FROM (SELECT q.doc_id, q.quality,
             row_number() OVER (PARTITION BY d2.source
                                ORDER BY q.quality DESC, q.doc_id) AS rk
      FROM q JOIN documents d2 ON q.doc_id = d2.doc_id) q
JOIN documents d ON q.doc_id = d.doc_id
WHERE rk <= 5""",
    "EXT-05", "EXT-TOPK",
    tier=1,
)
def x46_best_per_source(spark, sf_dir):
    """EXT-05 curation tier: keep the 5 highest-quality documents per
    source — the 'best N per domain' cut every curated pretraining mix
    applies. Quality comes from the SAME column builders as x09 (no
    drift), computed in the same projection as the window's input; the
    only shuffle is the per-source top-k (TakeOrdered within partition),
    ties broken by doc_id for cross-engine rank stability."""
    from pyspark.sql import Window as _W

    docs = _t(spark, sf_dir, "documents")
    toked = T._with_tokens(docs, "doc_id", "text", extra=["text", "source"])
    scored = toked.select(
        "source", "doc_id", T._quality_cols(F.col("__toks"), "text")[2]
    )
    w = _W.partitionBy("source").orderBy(F.desc("quality"), F.asc("doc_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= 5)
        .select("source", "doc_id", "quality", "rk")
    )


def _x47_sql() -> str:
    stoplist = ", ".join(f"'{s}'" for s in T.STOPWORDS)
    return f"""WITH RECURSIVE {_TOKS_CTE},
{_DS_CTE},
rare AS (SELECT sh FROM ds GROUP BY sh HAVING count(*) <= {MAX_DOC_FREQ}),
dsf AS (SELECT ds.doc_id, ds.sh FROM ds JOIN rare USING (sh)),
sizes AS (SELECT doc_id, count(*) AS n FROM dsf GROUP BY doc_id),
inter AS (SELECT x.doc_id AS doc_a, y.doc_id AS doc_b, count(*) AS i
          FROM dsf x JOIN dsf y USING (sh)
          WHERE x.doc_id < y.doc_id GROUP BY 1, 2),
pairs AS (SELECT doc_a, doc_b
          FROM inter JOIN sizes na ON doc_a = na.doc_id
                     JOIN sizes nb ON doc_b = nb.doc_id
          WHERE i / CAST(na.n + nb.n - i AS DOUBLE) >= {JACCARD_THRESHOLD}),
edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
          UNION ALL SELECT doc_b, doc_a FROM pairs),
reach AS (SELECT doc_id, doc_id AS n FROM documents
          UNION
          SELECT r.doc_id, e.dst FROM reach r JOIN edges e ON e.src = r.n),
comp AS (SELECT doc_id, min(n) AS comp FROM reach GROUP BY doc_id),
m AS (SELECT toks.doc_id,
             CAST(len(w) AS DOUBLE) AS n_tok,
             CAST(len(list_filter(w, t -> list_contains([{stoplist}], t))) AS DOUBLE) AS n_stop,
             CAST(length(regexp_replace(d.text, '[^!-/:-@\\[-`{{-~]', '', 'g')) AS DOUBLE) AS n_punct,
             CAST(length(d.text) AS DOUBLE) AS n_chars
      FROM toks JOIN documents d ON toks.doc_id = d.doc_id),
q AS (SELECT doc_id,
             round(CASE WHEN n_tok > 0 THEN n_stop / n_tok ELSE 0.0 END * 0.4
                   + (1.0 - CASE WHEN n_chars > 0 THEN n_punct / n_chars ELSE 0.0 END) * 0.4
                   + least(CASE WHEN n_tok > 0 THEN (n_chars - (n_tok - 1)) / n_tok ELSE 0.0 END / 10.0, 1.0) * 0.2,
                   4) AS quality
      FROM m),
j AS (SELECT c.doc_id, c.comp, q.quality FROM comp c JOIN q USING (doc_id)),
best AS (SELECT comp, doc_id AS rep
         FROM (SELECT comp, doc_id,
                      row_number() OVER (PARTITION BY comp
                                         ORDER BY quality DESC, doc_id) AS rk
               FROM j)
         WHERE rk = 1)
SELECT j.doc_id, b.rep, (j.doc_id = b.rep) AS keep
FROM j JOIN best b ON j.comp = b.comp"""


@register("x47_dedup_keep_best", _x47_sql(), "EXT-02", "EXT-05", tier=1)
def x47_dedup_keep_best(spark, sf_dir):
    """EXT-02 quality-aware cluster collapse: same near-dup clusters as
    x27, but the representative is the member with the highest x09 quality
    score (ties → min doc_id) — "keep the cleanest copy". The score is the
    SAME rounded composite as x09 (shared column builders), so the
    cross-engine argmax is hash-stable."""
    docs = _t(spark, sf_dir, "documents")
    pairs = D.ngram_jaccard_pairs(
        docs, threshold=JACCARD_THRESHOLD, max_doc_freq=MAX_DOC_FREQ
    ).select("doc_a", "doc_b")
    toked = T._with_tokens(docs, "doc_id", "text")
    scored = toked.select(
        "doc_id", T._quality_cols(F.col("__toks"), "text")[2]
    )
    return D.dedup_keep_best(
        scored, pairs, F.col("quality"), id_col="doc_id"
    )


def _x48_sql(panel: str = "vec_id % 50 = 0") -> str:
    from .operators.similarity import N_PLANES, hyperplane_signs

    signs = hyperplane_signs()
    bucket = " + ".join(
        "(CASE WHEN list_inner_product(CAST(embedding AS DOUBLE[]), ["
        + ", ".join(str(s) for s in signs[p])
        + f"]) > 0 THEN {2 ** p} ELSE 0 END)"
        for p in range(N_PLANES)
    )
    dots2 = "[" + ", ".join(
        "list_inner_product(CAST(b.embedding AS DOUBLE[]), ["
        + ", ".join(str(s) for s in signs[p])
        + "])"
        for p in range(N_PLANES)
    ) + "]"
    return f"""WITH b AS (SELECT vec_id, embedding, CAST({bucket} AS BIGINT) AS bucket
                FROM embeddings),
       q AS (SELECT vec_id AS q_id, b.embedding AS qv, bucket,
                    {dots2} AS dots
             FROM b WHERE {panel}),
       qd AS (SELECT q_id, bucket, unnest(dots) AS d,
                     generate_subscripts(dots, 1) - 1 AS p
              FROM q),
       flips AS (SELECT q_id, xor(bucket, CAST(1 << p AS BIGINT)) AS bucket
                 FROM (SELECT q_id, bucket, p,
                              row_number() OVER (PARTITION BY q_id
                                                 ORDER BY abs(d), p) AS rk
                       FROM qd)
                 WHERE rk <= 2),
       probes AS (SELECT q_id, bucket FROM q
                  UNION ALL SELECT q_id, bucket FROM flips),
       scored AS (SELECT pr.q_id, c.vec_id AS n_id,
                         round(list_cosine_similarity(CAST(q.qv AS DOUBLE[]),
                                                      CAST(c.embedding AS DOUBLE[])), 6) AS score
                  FROM probes pr
                  JOIN q ON pr.q_id = q.q_id
                  JOIN b c ON pr.bucket = c.bucket
                  WHERE c.vec_id <> pr.q_id),
       ranked AS (SELECT q_id, n_id, score,
                         row_number() OVER (PARTITION BY q_id
                                            ORDER BY score DESC, n_id) AS rk
                  FROM scored)
       SELECT q_id, n_id, CAST(rk AS BIGINT) AS rk, round(score, 4) AS score
       FROM ranked WHERE rk <= 5"""


@register("x48_knn_multiprobe_lsh", _x48_sql(), "EXT-03", tier=1)
def x48_knn_multiprobe_lsh(spark, sf_dir):
    """EXT-03 multi-probe LSH (Lv et al. VLDB'07): each probe also searches
    the 2 buckets across its least-confident hyperplanes (smallest |dot|)
    — the recall-recovery dial the x25 single-bucket tier documents.
    Probe volume ×3 on the probe side only; corpus reads stay
    bucket-equi-join and partition-prunable."""
    from .operators.similarity import knn_hyperplane_multiprobe

    emb = _t(spark, sf_dir, "embeddings")
    return knn_hyperplane_multiprobe(
        emb, emb.filter(F.col("vec_id") % 50 == 0), k=5, n_flips=2
    )


#: Fixture-demo threshold, like x05's COSINE_DUP_THRESHOLD: the synthetic
#: clustered-Gaussian embeddings have no true near-dup pairs above ~0.5, so
#: 0.4 is what exercises the drop path at every SF (a production SemDeDup
#: runs ~0.95+; the operator takes it as a parameter).
SEMDEDUP_THRESHOLD = 0.4


def _x51_sql() -> str:
    return f"""WITH cent AS (SELECT vec_id AS cell, embedding AS cv FROM embeddings
                    WHERE vec_id < 80),
       assigned AS (
           SELECT v_id, vec, cell FROM (
               SELECT e.vec_id AS v_id, e.embedding AS vec, c.cell,
                      row_number() OVER (
                          PARTITION BY e.vec_id
                          ORDER BY round(list_cosine_similarity(
                              CAST(e.embedding AS DOUBLE[]),
                              CAST(c.cv AS DOUBLE[])), 6) DESC, c.cell) AS rk
               FROM embeddings e, cent c)
           WHERE rk = 1),
       dups AS (
           SELECT b.v_id, min(a.v_id) AS dup_of
           FROM assigned a JOIN assigned b
             ON a.cell = b.cell AND a.v_id < b.v_id
           WHERE round(list_cosine_similarity(CAST(a.vec AS DOUBLE[]),
                                              CAST(b.vec AS DOUBLE[])), 6)
                 >= {SEMDEDUP_THRESHOLD}
           GROUP BY b.v_id)
       SELECT s.v_id AS vec_id, s.cell, (d.v_id IS NULL) AS keep, d.dup_of
       FROM assigned s LEFT JOIN dups d ON s.v_id = d.v_id"""


@register("x51_semdedup", _x51_sql(), "EXT-02", "EXT-03", tier=1)
def x51_semdedup(spark, sf_dir):
    """EXT-02/03 semantic dedup (SemDeDup, Abbas et al. 2023): nearest-
    centroid clustering confines the O(n²) cosine compare volume to
    within-cell gram matrices; drop every vector duplicating (cos ≥ the
    fixture-demo threshold above) a lower-id cell-mate
    (operators/similarity.semdedup). Oracle = the same assignment +
    within-cell pair rule in closed SQL form."""
    emb = _t(spark, sf_dir, "embeddings")
    return S.semdedup(
        emb, emb.filter(F.col("vec_id") < 80), threshold=SEMDEDUP_THRESHOLD
    )


def _x52_sql() -> str:
    return (
        "WITH "
        + _TOKS_CTE
        + """,
       terms AS (SELECT doc_id, u.term FROM toks, UNNEST(w) AS u(term)),
       freqs AS (SELECT term, count(*) AS tf FROM terms GROUP BY term),
       tot AS (SELECT CAST(sum(tf) AS DOUBLE) AS total FROM freqs),
       lp AS (SELECT t.doc_id, ln(f.tf / tot.total) AS lp
              FROM terms t JOIN freqs f USING (term), tot),
       agg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tok,
                      round(avg(lp), 4) AS avg_logp
               FROM lp GROUP BY doc_id)
       SELECT d.doc_id, COALESCE(a.n_tok, 0) AS n_tok,
              COALESCE(a.avg_logp, 0.0) AS avg_logp
       FROM documents d LEFT JOIN agg a USING (doc_id)"""
    )


@register("x52_unigram_logprob", _x52_sql(), "EXT-05", tier=1)
def x52_unigram_logprob(spark, sf_dir, docs=None):
    """EXT-05 corpus-LM quality score (CCNet-shaped, Wenzek et al. 2020):
    mean ln-probability of each doc's tokens under the corpus unigram
    distribution (operators/textanalysis.unigram_logprob) — two shuffles
    (term agg, doc agg) at any scale, hot terms handled by AQE skew-join."""
    return T.unigram_logprob(
        docs if docs is not None else _t(spark, sf_dir, "documents")
    )


BM25_QUERY = ("spark", "hash", "merge", "window")
BM25_TOP_K = 20


def _x53_sql() -> str:
    terms = ", ".join(f"'{t}'" for t in BM25_QUERY)
    return (
        "WITH "
        + _TOKS_CTE
        + f""",
       terms AS (SELECT doc_id, u.term FROM toks, UNNEST(w) AS u(term)),
       dl AS (SELECT doc_id, CAST(count(*) AS DOUBLE) AS dl
              FROM terms GROUP BY doc_id),
       tf AS (SELECT doc_id, term, CAST(count(*) AS DOUBLE) AS tf
              FROM terms WHERE term IN ({terms}) GROUP BY doc_id, term),
       dfq AS (SELECT term, CAST(count(*) AS DOUBLE) AS df
               FROM tf GROUP BY term),
       sc AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs, avg(dl) AS avgdl
              FROM dl),
       per_term AS (
           SELECT tf.doc_id,
                  ln(1.0 + (sc.n_docs - dfq.df + 0.5) / (dfq.df + 0.5))
                  * (tf.tf * 2.2)
                  / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / sc.avgdl)) AS s
           FROM tf JOIN dfq USING (term) JOIN dl USING (doc_id), sc),
       scored AS (SELECT doc_id, round(sum(s), 4) AS score
                  FROM per_term GROUP BY doc_id),
       ranked AS (SELECT doc_id, score,
                         row_number() OVER (ORDER BY score DESC, doc_id) AS rk
                  FROM scored)
       SELECT doc_id, score, CAST(rk AS BIGINT) AS rk
       FROM ranked WHERE rk <= {BM25_TOP_K}"""
    )


@register("x53_bm25_topk", _x53_sql(), "EXT-05", "EXT-TOPK", tier=1)
def x53_bm25_topk(spark, sf_dir, docs=None):
    """EXT-05 text retrieval: Okapi BM25 top-20 over a fixed 4-term query
    (operators/textanalysis.bm25_topk, Lucene-default idf) — the lexical
    counterpart of the EXT-03 kNN tiers. k1=1.2, b=0.75 shared literally
    with the oracle."""
    return T.bm25_topk(
        docs if docs is not None else _t(spark, sf_dir, "documents"), BM25_QUERY, top_k=BM25_TOP_K
    )


# ---------------------------------------------------------------------------
# Driver-window consolidation suites (VERDICT r4 item 4): every r4 operator
# that only had a tier-1 registration gets a driver-verified representative
# by union-folding into a kind-tagged common shape, exactly like x42. Member
# queries stay registered standalone at tier 1 with full-fidelity oracles.
# ---------------------------------------------------------------------------

_SUITE_SCHEMA = (
    "kind", "id1", "id2", "v1", "v2", "v3", "d1", "d2", "s1"
)


def _suite_shape(df, kind, **cols):
    """Project a member query's output into the shared suite shape: longs
    default 0, doubles 0.0, strings NULL."""
    zl = F.lit(0).cast("long")
    zd = F.lit(0.0)
    ns = F.lit(None).cast("string")
    defaults = {
        "id1": zl, "id2": zl, "v1": zl, "v2": zl, "v3": zl,
        "d1": zd, "d2": zd, "s1": ns,
    }
    out = [F.lit(kind).alias("kind")]
    for name in _SUITE_SCHEMA[1:]:
        c = cols.get(name)
        if c is None:
            out.append(defaults[name].alias(name))
        elif name.startswith(("id", "v")):
            out.append(c.cast("long").alias(name))
        elif name.startswith("d"):
            out.append(c.cast("double").alias(name))
        else:
            out.append(c.cast("string").alias(name))
    return df.select(*out)


def _suite_materialize(df):
    """Materialize one suite member's shaped output NOW — localCheckpoint
    eager = one action over the member's own plan; the suite's final
    union then just scans materialized blocks.

    Why (VERDICT r7 'What's wrong #2'): a suite that unions many member
    plans into ONE action lets independent member subtrees' stages run
    concurrently, so every member's ``_persist`` frames coexist in the
    storage pool while execution memory is under peak concurrent demand —
    under unified memory that evicts cached frames mid-action and
    recomputes them. That is how x77 recorded 35.0s warm against a 17.1s
    same-process member sum in BENCH_r07 (and warm > cold: the pressure
    grows with accumulated JVM state, which the cold-first ordering made
    look inverted). Measured standalone the union form is fine (~1.1x
    member sum — diagnosed r8, 4 isolated runs: 36.2 cold / 19.9, 18.9,
    17.0 warm); measured late in a 47-query process it degraded 2x,
    while the members run individually even LATER in that same process
    stayed fast — so the fix is to make the suite BE the sequence of
    member actions, the exact regime that stays fast. Members sharing a
    persisted frame still share it: persists are released once by the
    suite fn (via :func:`_suite_release`) after ALL members are
    materialized — a checkpointed member never re-reads them, so late
    release costs nothing. On a real cluster this matches how a 100 TB
    curation pipeline checkpoints stage boundaries anyway.

    This is NOT a blanket rule — sequentialization forfeits the stage
    concurrency a union action gets across independent member subtrees,
    which is what MANY-SMALL-MEMBER suites live on. x77 (7 heavy
    persist-thrashing members) uses this and went 35.0 → 23.1s in the
    full bench; x84a (18 sub-second members) measured FASTER lazy
    (r8 same-session A/B: union 20.7-26.3s vs sequential 25.9-27.5s
    warm) and stays union, as does x84b, whose graph kernels
    additionally share one memoized persisted edge frame across members
    (union row ~= member sum every round). Per-suite adjudication:
    SCALE.md benchmark methodology.

    MPS_SUITE_UNION=1 reverts to the lazy union form (and
    :func:`_suite_release` to releasing nothing) — the A/B probe used to
    adjudicate the two forms per suite; see SCALE.md."""
    import os

    if os.environ.get("MPS_SUITE_UNION"):
        return df
    return df.localCheckpoint(eager=True)


def _suite_release(mark: int = 0) -> None:
    """Drop the tracked persists a suite's members appended after ``mark``
    (a :func:`operators.dedup.persist_pool_mark` snapshot taken before the
    first member was built) once they are all materialized. Scoped, not
    global: releasing the whole pool from here silently dropped caches
    created by EARLIER queries in the same process — e.g. the memoized x85
    edge frame — forcing later consumers to recompute (ADVICE r8). No-op
    under MPS_SUITE_UNION (the lazy form must keep its persists alive until
    the caller's consuming action completes — the caller releases, as
    bench.run() does)."""
    import os

    if not os.environ.get("MPS_SUITE_UNION"):
        from .operators.dedup import release_cached_intermediates

        release_cached_intermediates(since=mark)


# suite-composition helper: the canonical member-oracle lookup lives in
# registry.py — alias it so every suite module uses the same implementation
from .registry import member_oracle as _member_oracle  # noqa: E402


def _x49_sql() -> str:
    # zd: DuckDB types a bare 0.0 literal as DECIMAL(2,1), which round-trips
    # through the driver's value hash differently than Spark's DOUBLE zero —
    # every float slot is cast so both engines emit the same logical type.
    z = "CAST(0 AS BIGINT)"
    zd = "CAST(0.0 AS DOUBLE)"
    return f"""SELECT 'cc_star' AS kind, doc_id AS id1, rep AS id2,
       CAST(keep AS BIGINT) AS v1, {z} AS v2, {z} AS v3,
       {zd} AS d1, {zd} AS d2, NULL AS s1
FROM ({_member_oracle('x41_dedup_cc_star')})
UNION ALL
SELECT 'incr', doc_id, {z}, CAST(is_dup_of_corpus AS BIGINT), {z}, {z},
       {zd}, {zd}, source
FROM ({_member_oracle('x45_incremental_dedup')})
UNION ALL
SELECT 'best', doc_id, rk, {z}, {z}, {z}, CAST(quality AS DOUBLE), {zd}, source
FROM ({_member_oracle('x46_best_per_source')})
UNION ALL
SELECT 'keep_best', doc_id, rep, CAST(keep AS BIGINT), {z}, {z},
       {zd}, {zd}, NULL
FROM ({_member_oracle('x47_dedup_keep_best')})
UNION ALL
SELECT 'spii', doc_id, {z}, n_email, n_ip, n_phone, {zd}, {zd}, clean_md5
FROM ({_member_oracle('x43_stream_pii_scrub')})"""


@register(
    "x49_dedup_quality_suite",
    _x49_sql(),
    "EXT-01", "EXT-02", "EXT-05", "EXT-08", "EXT-TOPK",
)
def x49_dedup_quality_suite(spark, sf_dir):
    """Driver-verified representative for the r4 dedup/quality surface:
    large-star/small-star connected components (x41), incremental
    snapshot-vs-corpus dedup (x45), best-N-per-source selection (x46),
    quality-aware keep-best collapse (x47), and the streamed PII scrubber
    (x43 — a real availableNow Structured Streaming replay inside a
    driver-hashed row) union-folded into one kind-tagged shape.

    The x41 and x47 members consume the SAME near-dup pair graph AND the
    same component structure (they differ only in which cluster member
    survives), so the suite builds the pair graph once, persists it, runs
    star contraction once, and feeds the one label table to both collapse
    policies — vs calling the standalone members, which would pay the
    pair shuffle and an iterative clustering twice each."""
    docs = _t(spark, sf_dir, "documents")
    pairs = D._persist(
        D.ngram_jaccard_pairs(
            docs, threshold=JACCARD_THRESHOLD, max_doc_freq=MAX_DOC_FREQ
        ).select("doc_a", "doc_b")
    )
    comp = D.connected_components_star(pairs)
    toked = T._with_tokens(docs, "doc_id", "text")
    scored = toked.select("doc_id", T._quality_cols(F.col("__toks"), "text")[2])
    # batch members' construction overlapped (guide §2.6); streaming
    # members (session-conf-mutating replays) stay sequential below
    __m_x45, __m_x46 = D.overlap(
        lambda: x45_incremental_dedup(spark, sf_dir),
        lambda: x46_best_per_source(spark, sf_dir),
    )
    return (
        _suite_shape(
            D.dedup_keep_one(docs, pairs, algorithm="star", components=comp),
            "cc_star",
            id1=F.col("doc_id"), id2=F.col("rep"), v1=F.col("keep"),
        )
        .unionAll(_suite_shape(
            __m_x45, "incr",
            id1=F.col("doc_id"), v1=F.col("is_dup_of_corpus"),
            s1=F.col("source"),
        ))
        .unionAll(_suite_shape(
            __m_x46, "best",
            id1=F.col("doc_id"), id2=F.col("rk"), d1=F.col("quality"),
            s1=F.col("source"),
        ))
        .unionAll(_suite_shape(
            D.dedup_keep_best(
                scored, pairs, F.col("quality"), id_col="doc_id",
                components=comp,
            ),
            "keep_best",
            id1=F.col("doc_id"), id2=F.col("rep"), v1=F.col("keep"),
        ))
        .unionAll(_suite_shape(
            x43_stream_pii_scrub(spark, sf_dir), "spii",
            id1=F.col("doc_id"), v1=F.col("n_email"), v2=F.col("n_ip"),
            v3=F.col("n_phone"), s1=F.col("clean_md5"),
        ))
    )


def _x50_sql() -> str:
    # zd: see _x49_sql — keep every float slot DOUBLE in both engines.
    z = "CAST(0 AS BIGINT)"
    zd = "CAST(0.0 AS DOUBLE)"
    return f"""SELECT 'gopher' AS kind, doc_id AS id1, top_gram_n AS id2,
       n_words AS v1, n_distinct AS v2, n_grams AS v3,
       CAST(rep_ratio AS DOUBLE) AS d1, CAST(ttr AS DOUBLE) AS d2,
       CAST(keep AS VARCHAR) AS s1
FROM ({_member_oracle('x32_gopher_repetition')})
UNION ALL
SELECT 'sample', doc_id, {z}, {z}, {z}, {z}, {zd}, {zd}, concat_ws('|', lang, source)
FROM ({_member_oracle('x33_stratified_sample')})
UNION ALL
SELECT 'kmeans', cell, pos, n_members, {z}, {z}, CAST(val AS DOUBLE), {zd}, NULL
FROM ({_member_oracle('x34_ivf_train_kmeans')})
UNION ALL
SELECT 'quant', vec_id, {z}, {z}, {z}, {z}, CAST(max_abs AS DOUBLE),
       CAST(mse AS DOUBLE), array_to_string(qvec, ',')
FROM ({_member_oracle('x38_embedding_quantize_int8')})
UNION ALL
SELECT 'bpe', {z}, {z}, n, rk, {z}, {zd}, {zd}, pair
FROM ({_member_oracle('x44_bpe_pair_counts')})
UNION ALL
SELECT 'mplsh', q_id, n_id, rk, {z}, {z}, CAST(score AS DOUBLE), {zd}, NULL
FROM ({_member_oracle('x48_knn_multiprobe_lsh')})
UNION ALL
SELECT 'semded', vec_id, cell, CAST(keep AS BIGINT), COALESCE(dup_of, -1), {z},
       {zd}, {zd}, NULL
FROM ({_member_oracle('x51_semdedup')})
UNION ALL
SELECT 'unigram', doc_id, {z}, n_tok, {z}, {z}, CAST(avg_logp AS DOUBLE), {zd}, NULL
FROM ({_member_oracle('x52_unigram_logprob')})
UNION ALL
SELECT 'bm25', doc_id, {z}, rk, {z}, {z}, CAST(score AS DOUBLE), {zd}, NULL
FROM ({_member_oracle('x53_bm25_topk')})
UNION ALL
SELECT 'winnow', doc_id, {z}, {z}, {z}, {z}, {zd}, {zd}, fp
FROM ({_member_oracle('x12_winnow_fingerprints')})"""


@register("x50_scale_analysis_suite", _x50_sql(), "EXT-02", "EXT-03", "EXT-05")
def x50_scale_analysis_suite(spark, sf_dir):
    """Driver-verified representative for the r4/r5 analysis/ANN surface:
    Gopher repetition signals (x32), deterministic stratified sampling
    (x33), k-means IVF training (x34), int8 embedding quantization (x38),
    BPE-style pair counting (x44), multi-probe SRP-LSH kNN (x48), SemDeDup
    semantic dedup (x51), the corpus-LM unigram quality score (x52),
    Okapi BM25 top-k retrieval (x53), and — since r7 — winnowing
    fingerprints (x12, standalone demoted to tier 1) union-folded into
    one kind-tagged shape.

    The six token-consuming members (x32/x33/x44/x52/x53/x12) share ONE
    persisted tokenize pass — _with_tokens recognizes the pre-tokenized
    frame and passes it through, so the suite pays tokenization once
    instead of five times per action. Measured neutral at sf0.1 (the
    fixture corpus tokenizes in ~0.3s, so cache round-trips offset the
    saving); the shape is kept because at corpus scale the regex-heavy
    tokenize pass dominates and 5 scans → 1 scan + spillable cache reads
    is the right trade."""
    toked = D._persist(
        T._with_tokens(
            _t(spark, sf_dir, "documents"), "doc_id", "text",
            extra=["text", "lang", "source"],
        )
    )
    # batch members' construction overlapped (guide §2.6); streaming
    # members (session-conf-mutating replays) stay sequential below
    __m_x34, __m_x38, __m_x48, __m_x51 = D.overlap(
        lambda: x34_ivf_train_kmeans(spark, sf_dir),
        lambda: x38_embedding_quantize_int8(spark, sf_dir),
        lambda: x48_knn_multiprobe_lsh(spark, sf_dir),
        lambda: x51_semdedup(spark, sf_dir),
    )
    return (
        _suite_shape(
            x32_gopher_repetition(spark, sf_dir, docs=toked), "gopher",
            id1=F.col("doc_id"), id2=F.col("top_gram_n"),
            v1=F.col("n_words"), v2=F.col("n_distinct"), v3=F.col("n_grams"),
            d1=F.col("rep_ratio"), d2=F.col("ttr"), s1=F.col("keep"),
        )
        .unionAll(_suite_shape(
            x33_stratified_sample(spark, sf_dir, docs=toked), "sample",
            id1=F.col("doc_id"),
            s1=F.concat_ws("|", "lang", "source"),
        ))
        .unionAll(_suite_shape(
            __m_x34, "kmeans",
            id1=F.col("cell"), id2=F.col("pos"), v1=F.col("n_members"),
            d1=F.col("val"),
        ))
        .unionAll(_suite_shape(
            __m_x38, "quant",
            id1=F.col("vec_id"), d1=F.col("max_abs"), d2=F.col("mse"),
            s1=F.expr("array_join(transform(qvec, x -> cast(x as string)), ',')"),
        ))
        .unionAll(_suite_shape(
            x44_bpe_pair_counts(spark, sf_dir, docs=toked), "bpe",
            v1=F.col("n"), v2=F.col("rk"), s1=F.col("pair"),
        ))
        .unionAll(_suite_shape(
            __m_x48, "mplsh",
            id1=F.col("q_id"), id2=F.col("n_id"), v1=F.col("rk"),
            d1=F.col("score"),
        ))
        .unionAll(_suite_shape(
            __m_x51, "semded",
            id1=F.col("vec_id"), id2=F.col("cell"), v1=F.col("keep"),
            v2=F.coalesce("dup_of", F.lit(-1)),
        ))
        .unionAll(_suite_shape(
            x52_unigram_logprob(spark, sf_dir, docs=toked), "unigram",
            id1=F.col("doc_id"), v1=F.col("n_tok"), d1=F.col("avg_logp"),
        ))
        .unionAll(_suite_shape(
            x53_bm25_topk(spark, sf_dir, docs=toked), "bm25",
            id1=F.col("doc_id"), v1=F.col("rk"), d1=F.col("score"),
        ))
        # r7: x12's driver row lives here now (standalone demoted to tier
        # 1) — a sixth consumer of the shared tokenize pass
        .unionAll(_suite_shape(
            T.winnow_fingerprints(toked, k=3, window=4), "winnow",
            id1=F.col("doc_id"), s1=F.col("fp"),
        ))
    )


# ---------------------------------------------------------------------------
# EXT-03: product quantization + IVF-PQ
# ---------------------------------------------------------------------------

def _pq_d2i_sql(vexpr: str, cexpr: str) -> str:
    """Quantized-integer subspace distance, unrolled left-to-right so the
    accumulation order matches the kernel's sequential loop bit-for-bit
    (``s.m`` is the 0-based subspace; DuckDB lists are 1-based)."""
    diff = lambda i: f"({vexpr}[s.m*8+{i}] - {cexpr}[s.m*8+{i}])"
    terms = " + ".join(f"{diff(i)} * {diff(i)}" for i in range(1, 9))
    return f"CAST(floor(({terms}) * 1000000.0 + 0.5) AS BIGINT)"


def _x54_sql() -> str:
    return f"""WITH cb AS (SELECT vec_id AS code, CAST(embedding AS DOUBLE[]) AS cv
                  FROM embeddings WHERE vec_id < 16),
       v AS (SELECT vec_id AS v_id, CAST(embedding AS DOUBLE[]) AS vec
             FROM embeddings),
       s AS (SELECT m FROM generate_series(0, 7) AS t(m)),
       d AS (SELECT v.v_id, s.m, cb.code, {_pq_d2i_sql('v.vec', 'cb.cv')} AS d2i
             FROM v, s, cb),
       chosen AS (SELECT v_id, m, code, d2i FROM (
             SELECT v_id, m, code, d2i,
                    row_number() OVER (PARTITION BY v_id, m
                                       ORDER BY d2i, code) AS rk
             FROM d) WHERE rk = 1)
       SELECT v_id, array_to_string(list(code ORDER BY m), ',') AS codes,
              CAST(sum(d2i) AS DOUBLE) / 1000000.0 AS err2
       FROM chosen GROUP BY v_id"""


@register("x54_pq_encode", _x54_sql(), "EXT-03", tier=1)
def x54_pq_encode(spark, sf_dir):
    """EXT-03: product-quantization encoding (Jégou et al. TPAMI 2011) —
    8 subspaces × 16 codes from a FIXED 16-vector seed codebook (the
    O(1)-codebook contract; a trained codebook comes from kmeans_train per
    subspace). Distances are quantized integers end-to-end, so even argmin
    tie-breaks are bit-identical to the oracle."""
    emb = _t(spark, sf_dir, "embeddings")
    return (
        S.pq_encode(emb, emb.filter(F.col("vec_id") < 16))
        .select(
            "v_id",
            F.array_join(F.col("codes").cast("array<string>"), ",").alias("codes"),
            "err2",
        )
    )


def _x55_sql(panel: str = "vec_id < 40") -> str:
    """x55's oracle, probe-panel-parameterized like :func:`_x06_sql` so
    x142's recall row can re-run the identical IVF-PQ formulation over
    its own md5-chosen panel (r10); the registered x55 uses the
    default (text byte-identical to the pre-parameterization form)."""
    return f"""WITH cent AS (SELECT vec_id AS cell, embedding AS cv FROM embeddings
                    WHERE vec_id < 80),
       cb AS (SELECT vec_id AS code, CAST(embedding AS DOUBLE[]) AS cv
              FROM embeddings WHERE vec_id < 16),
       s AS (SELECT m FROM generate_series(0, 7) AS t(m)),
       assigned AS (
           SELECT v_id, vec, cell FROM (
               SELECT e.vec_id AS v_id, CAST(e.embedding AS DOUBLE[]) AS vec,
                      c.cell,
                      row_number() OVER (
                          PARTITION BY e.vec_id
                          ORDER BY round(list_cosine_similarity(
                              CAST(e.embedding AS DOUBLE[]),
                              CAST(c.cv AS DOUBLE[])), 6) DESC, c.cell) AS rk
               FROM embeddings e, cent c)
           WHERE rk = 1),
       enc AS (SELECT v_id, m, code, d2i FROM (
           SELECT a.v_id, s.m, cb.code, {_pq_d2i_sql('a.vec', 'cb.cv')} AS d2i,
                  row_number() OVER (PARTITION BY a.v_id, s.m
                                     ORDER BY {_pq_d2i_sql('a.vec', 'cb.cv')},
                                              cb.code) AS rk
           FROM assigned a, s, cb) WHERE rk = 1),
       q AS (SELECT vec_id AS q_id, CAST(embedding AS DOUBLE[]) AS qv
             FROM embeddings WHERE {panel}),
       probe AS (
           SELECT q_id, qv, cell FROM (
               SELECT q.q_id, q.qv, c.cell,
                      row_number() OVER (
                          PARTITION BY q.q_id
                          ORDER BY round(list_cosine_similarity(
                              q.qv, CAST(c.cv AS DOUBLE[])), 6) DESC,
                              c.cell) AS rk
               FROM q, cent c)
           WHERE rk <= 2),
       dt AS (SELECT q.q_id, s.m, cb.code,
                     {_pq_d2i_sql('q.qv', 'cb.cv')} AS d2i
              FROM q, s, cb),
       scored AS (
           SELECT p.q_id, a.v_id AS n_id, sum(dt.d2i) AS adist_i
           FROM probe p
           JOIN assigned a USING (cell)
           JOIN enc e ON e.v_id = a.v_id
           JOIN dt ON dt.q_id = p.q_id AND dt.m = e.m AND dt.code = e.code
           WHERE a.v_id <> p.q_id
           GROUP BY p.q_id, a.v_id),
       ranked AS (
           SELECT q_id, n_id, adist_i,
                  row_number() OVER (PARTITION BY q_id
                                     ORDER BY adist_i, n_id) AS rk
           FROM scored)
       SELECT q_id, n_id, CAST(rk AS BIGINT) AS rk,
              CAST(adist_i AS DOUBLE) / 1000000.0 AS adist
       FROM ranked WHERE rk <= 5"""


@register("x55_knn_ivfpq", _x55_sql(), "EXT-03", tier=1)
def x55_knn_ivfpq(spark, sf_dir):
    """EXT-03 compressed-index tier: full IVF-PQ — coarse cells (the x07
    80-vector seed quantizer, nprobe=2) prune the scan, PQ codes (the x54
    8×16 codebook) stand in for vectors, Asymmetric Distance Computation
    ranks candidates. Bounded 40-query probe set; every distance is a
    quantized integer so the whole pipeline has an exact SQL oracle."""
    emb = _t(spark, sf_dir, "embeddings")
    return S.knn_ivfpq(
        emb,
        emb.filter(F.col("vec_id") < 40),
        emb.filter(F.col("vec_id") < 80),
        emb.filter(F.col("vec_id") < 16),
        k=5,
        nprobe=2,
    )


def _pq_adc_sql(panel: str = "vec_id < 40") -> str:
    """x153's oracle (probe-panel-parameterized like :func:`_x06_sql`):
    exhaustive ADC — the x55 formulation minus the coarse quantizer, so
    every encoded vector scores against every panel query."""
    return f"""WITH cb AS (SELECT vec_id AS code, CAST(embedding AS DOUBLE[]) AS cv
                  FROM embeddings WHERE vec_id < 16),
       s AS (SELECT m FROM generate_series(0, 7) AS t(m)),
       v AS (SELECT vec_id AS v_id, CAST(embedding AS DOUBLE[]) AS vec
             FROM embeddings),
       enc AS (SELECT v_id, m, code, d2i FROM (
           SELECT v.v_id, s.m, cb.code, {_pq_d2i_sql('v.vec', 'cb.cv')} AS d2i,
                  row_number() OVER (PARTITION BY v.v_id, s.m
                                     ORDER BY {_pq_d2i_sql('v.vec', 'cb.cv')},
                                              cb.code) AS rk
           FROM v, s, cb) WHERE rk = 1),
       q AS (SELECT vec_id AS q_id, CAST(embedding AS DOUBLE[]) AS qv
             FROM embeddings WHERE {panel}),
       dt AS (SELECT q.q_id, s.m, cb.code,
                     {_pq_d2i_sql('q.qv', 'cb.cv')} AS d2i
              FROM q, s, cb),
       scored AS (
           SELECT dt.q_id, e.v_id AS n_id, sum(dt.d2i) AS adist_i
           FROM enc e JOIN dt ON dt.m = e.m AND dt.code = e.code
           WHERE e.v_id <> dt.q_id
           GROUP BY dt.q_id, e.v_id),
       ranked AS (
           SELECT q_id, n_id, adist_i,
                  row_number() OVER (PARTITION BY q_id
                                     ORDER BY adist_i, n_id) AS rk
           FROM scored)
       SELECT q_id, n_id, CAST(rk AS BIGINT) AS rk,
              CAST(adist_i AS DOUBLE) / 1000000.0 AS adist
       FROM ranked WHERE rk <= 5"""


@register("x153_knn_pq_adc", _pq_adc_sql(), "EXT-03", tier=1)
def x153_knn_pq_adc(spark, sf_dir):
    """EXT-03 exhaustive-ADC tier (r10): PQ codes score against every
    panel query with NO coarse pruning — the Jégou et al. 2011 ADC
    baseline IVF-PQ trades recall against. Same 8×16 seed codebook and
    quantized-integer distances as x54/x55, so the full scan has an
    exact SQL oracle; its measured recall@5 rides in x142 (rc_pq)."""
    emb = _t(spark, sf_dir, "embeddings")
    return S.knn_pq_adc(
        emb, emb.filter(F.col("vec_id") < 40), emb.filter(F.col("vec_id") < 16), k=5
    )


# ---------------------------------------------------------------------------
# EXT-02/EXT-05: span-level exact substring dedup
# ---------------------------------------------------------------------------

def _x56_sql() -> str:
    k = 8
    return (
        "WITH "
        + _TOKS_CTE
        + f""",
       wins AS (SELECT doc_id, CAST(u.pos AS BIGINT) AS pos,
                       md5(array_to_string(w[u.pos:u.pos+{k - 1}], ' ')) AS wh
                FROM toks,
                     UNNEST(list_transform(range(1, len(w)-{k}+2), i -> i))
                       AS u(pos)),
       dup AS (SELECT * FROM (
                SELECT doc_id, pos, count(*) OVER (PARTITION BY wh) AS c
                FROM wins) WHERE c >= 2),
       marked AS (SELECT doc_id, pos, pos + {k - 1} AS e,
                         CASE WHEN pos > COALESCE(max(pos + {k - 1}) OVER (
                                  PARTITION BY doc_id ORDER BY pos
                                  ROWS BETWEEN UNBOUNDED PRECEDING
                                           AND 1 PRECEDING), -1)
                              THEN 1 ELSE 0 END AS nw
                  FROM dup),
       islands AS (SELECT doc_id, pos, e,
                          sum(nw) OVER (PARTITION BY doc_id ORDER BY pos
                                        ROWS BETWEEN UNBOUNDED PRECEDING
                                                 AND CURRENT ROW) AS island
                   FROM marked)
       SELECT doc_id, min(pos) AS span_start, max(e) AS span_end,
              CAST(count(*) AS BIGINT) AS n_windows
       FROM islands GROUP BY doc_id, island"""
    )


@register("x56_substring_dedup_spans", _x56_sql(), "EXT-02", "EXT-05", tier=1)
def x56_substring_dedup_spans(spark, sf_dir):
    """EXT-02/05 span tier (Lee et al. ACL 2022 ExactSubstr, word
    granularity): 8-token windows occurring ≥2× corpus-wide, merged per
    document into maximal overlapping spans by gaps-and-islands window
    functions. Doc-level dedup (x01–x05) drops whole documents; this is
    the operator that CUTS the boilerplate region and keeps the rest."""
    return D.duplicate_spans(_t(spark, sf_dir, "documents"), k=8)


# ---------------------------------------------------------------------------
# c1: the composed curation pipeline — stages FEEDING each other, not a
# kind-tagged union of independent operators like x42/x49/x50
# ---------------------------------------------------------------------------

#: c1 stage gates (documented constants so Spark and the oracle agree):
#: quality median on the fixture corpus is ~0.514, so 0.505 keeps ~60%;
#: lang 'en' keeps ~90%; n_tokens >= 16 cuts the bottom ~5%.
C1_QUALITY_GATE = 0.505
C1_MIN_TOKENS = 16


def _c1_ctes(materialized: bool = False) -> str:
    """The c1 curation chain's CTE body (prof → k1 → k2 → near-dup k3 →
    decontaminated k4), shared by the c1 oracle (final manifest SELECT)
    and the x152 funnel oracle (per-stage counts) so the stage
    definitions exist once. ``materialized`` inserts AS MATERIALIZED on
    the expensive multiply-referenced CTEs for composers that reference
    several stages at once (DuckDB inlines plain CTEs per reference —
    the x144 lesson); c1 itself keeps the default so its long-verified
    oracle text stays byte-identical."""
    profile = REGISTRY["x08_11_text_profile"].oracle
    m = " MATERIALIZED" if materialized else ""
    return f"""prof AS{m} ({profile}),
k1 AS{m} (SELECT * FROM prof
       WHERE doc_id % 97 <> 0 AND quality >= {C1_QUALITY_GATE}
         AND lang_pred = 'en' AND n_tokens >= {C1_MIN_TOKENS}),
k2 AS{m} (SELECT * FROM (
        SELECT *, min(doc_id) OVER (PARTITION BY fingerprint) AS mn FROM k1)
       WHERE doc_id = mn),
{_TOKS_CTE},
{_DS_CTE},
ds2 AS (SELECT ds.doc_id, ds.sh FROM ds JOIN k2 USING (doc_id)),
rare AS (SELECT sh FROM ds2 GROUP BY sh HAVING count(*) <= {MAX_DOC_FREQ}),
dsf AS (SELECT ds2.doc_id, ds2.sh FROM ds2 JOIN rare USING (sh)),
sizes AS (SELECT doc_id, count(*) AS n FROM dsf GROUP BY doc_id),
inter AS (SELECT x.doc_id AS doc_a, y.doc_id AS doc_b, count(*) AS i
          FROM dsf x JOIN dsf y USING (sh)
          WHERE x.doc_id < y.doc_id GROUP BY 1, 2),
pairs AS (SELECT doc_a, doc_b
          FROM inter JOIN sizes na ON doc_a = na.doc_id
                     JOIN sizes nb ON doc_b = nb.doc_id
          WHERE i / CAST(na.n + nb.n - i AS DOUBLE) >= {JACCARD_THRESHOLD}),
edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
          UNION ALL SELECT doc_b, doc_a FROM pairs),
reach AS (SELECT doc_id, doc_id AS n FROM k2
          UNION
          SELECT r.doc_id, e.dst FROM reach r JOIN edges e ON e.src = r.n),
k3 AS{m} (SELECT doc_id FROM reach GROUP BY doc_id HAVING doc_id = min(n)),
bsh AS (SELECT DISTINCT sh FROM ds WHERE doc_id % 97 = 0),
s3 AS (SELECT ds.doc_id, ds.sh FROM ds JOIN k3 USING (doc_id)),
szs AS (SELECT doc_id, count(*) AS n_sh FROM s3 GROUP BY doc_id),
hits AS (SELECT s3.doc_id, count(*) AS n_hits
         FROM s3 JOIN bsh USING (sh) GROUP BY s3.doc_id),
k4 AS{m} (SELECT k3.doc_id FROM k3
       LEFT JOIN szs ON k3.doc_id = szs.doc_id
       LEFT JOIN hits ON k3.doc_id = hits.doc_id
       WHERE round(COALESCE(hits.n_hits, 0)
                   / CAST(greatest(COALESCE(szs.n_sh, 0), 1) AS DOUBLE), 4)
             < 0.1)"""


def _c1_sql() -> str:
    return f"""WITH RECURSIVE
{_c1_ctes()}
SELECT k2.doc_id, k2.n_tokens, k2.quality, k2.lang_pred
FROM k2 JOIN k4 ON k2.doc_id = k4.doc_id"""


@register(
    "c1_curation_pipeline",
    None,  # oracle bound below — needs REGISTRY["x08_11_text_profile"]
    "EXT-01", "EXT-02", "EXT-05",
)
def c1_curation_pipeline(spark, sf_dir):
    """The composed training-data curation pipeline — each stage consumes
    the previous stage's survivors, the shape a real Dolma/FineWeb-style
    corpus build runs end-to-end:

      1. profile gate: one-pass quality/lang/token profile (x08-x11
         machinery), keep quality >= 0.505, lang 'en', >= 16 tokens;
      2. exact dedup: min-doc_id winner per md5 fingerprint (x01 rule) —
         a count window, no join;
      3. near-dup collapse: shingle-Jaccard pairs + connected components
         keep-one (x02/x27 machinery) over the REMAINING docs only — the
         pair generation cost already benefits from upstream pruning;
      4. decontamination: drop docs overlapping the benchmark split's
         3-gram shingles >= 10% (x40 machinery);
      5. manifest: (doc_id, n_tokens, quality, lang_pred) of survivors.

    One oracle covers the whole chain (recursive-CTE composition of the
    member SQL), so the driver hash-checks stage PLUMBING — that each
    stage's filter feeds the next — not just each operator alone."""
    st = _c1_stage_frames(spark, sf_dir)
    return st["k2"].join(st["k4"], "doc_id", "left_semi").select(
        "doc_id", "n_tokens", "quality", "lang_pred"
    )


def _c1_stage_frames(spark, sf_dir):
    """The c1 curation chain's stage frames, shared by c1 (final
    manifest) and the x152 funnel (per-stage per-source attrition
    counts) so the stage definitions exist once (the _c1_ctes twin on
    the Spark side). Returns ``{"corpus", "k1", "k2", "k3", "k4"}`` —
    corpus/k1 lazy, k2 persisted (it feeds three consumers), k3/k4 as
    doc_id frames. (r13: eagerly materializing the three persisted
    frames was A/B'd for x152 and lost — see x152's call-site note.)"""
    _p = D._persist
    docs = _t(spark, sf_dir, "documents")
    benchmark = docs.filter(F.col("doc_id") % 97 == 0)
    corpus = docs.filter(F.col("doc_id") % 97 != 0)

    prof = T.text_profile(corpus)
    k1 = prof.filter(
        (F.col("quality") >= C1_QUALITY_GATE)
        & (F.col("lang_pred") == "en")
        & (F.col("n_tokens") >= C1_MIN_TOKENS)
    )
    # k2 feeds three consumers (survivor semi-join, the keep-one spine via
    # survivors, and the final manifest join) and the shingle table feeds
    # two (pair generation, decontamination) — persist both so the
    # profile/tokenize passes are paid once per corpus scan, not once per
    # downstream stage (measured at sf0.1: c1 warm 7.9s → see commit).
    k2 = _p(
        k1.withColumn(
            "__mn", F.min("doc_id").over(Window.partitionBy("fingerprint"))
        )
        .filter(F.col("doc_id") == F.col("__mn"))
        .drop("__mn")
    )
    survivors = _p(
        corpus.join(k2.select("doc_id"), "doc_id", "left_semi")
    )
    sets = _p(D.doc_shingles(survivors))
    pairs = D.ngram_jaccard_pairs(
        survivors,
        threshold=JACCARD_THRESHOLD,
        max_doc_freq=MAX_DOC_FREQ,
        shingles=sets,
    ).select("doc_a", "doc_b")
    k3 = (
        D.dedup_keep_one(survivors, pairs)
        .filter(F.col("keep"))
        .select("doc_id")
    )
    survivors3 = survivors.join(k3, "doc_id", "left_semi")
    k4 = (
        T.decontaminate(
            survivors3,
            benchmark,
            shingles=sets.join(k3, "doc_id", "left_semi"),
        )
        .filter(~F.col("contaminated"))
        .select("doc_id")
    )
    return {"corpus": corpus, "k1": k1, "k2": k2, "k3": k3, "k4": k4}


# bind c1's oracle now that the function referencing REGISTRY can run
REGISTRY["c1_curation_pipeline"].oracle = _c1_sql()


@register(
    "x57_stream_incremental_dedup",
    f"""WITH old AS (SELECT DISTINCT md5({NORM_SQL}) AS fp FROM documents
                  WHERE doc_id % 10 < 8),
       new AS (SELECT doc_id, source, md5({NORM_SQL}) AS fp FROM documents
               WHERE doc_id % 10 >= 8),
       keep AS (SELECT fp, min(doc_id) AS doc_id FROM new GROUP BY fp)
       SELECT k.doc_id, n.source, (o.fp IS NOT NULL) AS is_dup_of_corpus
       FROM keep k JOIN new n ON k.doc_id = n.doc_id
       LEFT JOIN old o ON k.fp = o.fp""",
    "EXT-01", "EXT-08",
    tier=1,
)
def x57_stream_incremental_dedup(spark, sf_dir):
    """EXT-01/08: the x45 nightly-ingest dedup as a REAL streaming job —
    within-stream min-id collapse per fingerprint (streaming aggregation,
    deterministic) plus a stream-static broadcast join against the corpus
    fingerprint index, replayed availableNow
    (streaming/jobs.run_stream_incremental_dedup). Oracle = the closed
    batch form the bounded replay must reproduce exactly."""
    from .streaming.jobs import run_stream_incremental_dedup

    return run_stream_incremental_dedup(spark, sf_dir)


def _x58_sql() -> str:
    q = S.KMEANS_QUANT
    return f"""WITH cb AS (SELECT vec_id AS code, CAST(embedding AS DOUBLE[]) AS cv
                  FROM embeddings WHERE vec_id < 16),
       v AS (SELECT vec_id AS v_id, CAST(embedding AS DOUBLE[]) AS vec
             FROM embeddings),
       s AS (SELECT m FROM generate_series(0, 7) AS t(m)),
       chosen AS (SELECT v_id, m, code FROM (
             SELECT v.v_id, s.m, cb.code,
                    row_number() OVER (PARTITION BY v.v_id, s.m
                                       ORDER BY {_pq_d2i_sql('v.vec', 'cb.cv')},
                                                cb.code) AS rk
             FROM v, s, cb) WHERE rk = 1),
       vals AS (SELECT v_id, unnest(vec) AS val,
                       generate_subscripts(vec, 1) - 1 AS pos
                FROM v),
       member AS (SELECT (vals.pos // 8) AS m, c.code, vals.pos, vals.val
                  FROM vals JOIN chosen c
                    ON c.v_id = vals.v_id AND c.m = (vals.pos // 8)),
       means AS (SELECT m, code, pos,
                        sum(CAST(round(val * {q}) AS BIGINT)) AS s,
                        count(*) AS n
                 FROM member GROUP BY 1, 2, 3)
       SELECT CAST(m AS BIGINT) AS m, CAST(code AS BIGINT) AS code,
              CAST(pos AS BIGINT) AS pos,
              CAST(CASE WHEN s < 0 THEN -((2 * abs(s) + n) // (2 * n))
                        ELSE (2 * abs(s) + n) // (2 * n) END AS DOUBLE) / {q}
                  AS val,
              CAST(n AS BIGINT) AS n_members
       FROM means"""


@register("x58_pq_train_codebooks", _x58_sql(), "EXT-03", tier=1)
def x58_pq_train_codebooks(spark, sf_dir):
    """EXT-03: one Lloyd's refinement of the x54 PQ codebooks — assign
    every vector's subspaces to the seed codebook (quantized-int L2,
    pq_encode's exact rule), recompute each (subspace, code) centroid as
    the exact integer mean of its member subvectors
    (operators/similarity.pq_train). The iterative-training counterpart
    of x34 for the PQ tier, with the same closed-form integer-mean
    oracle."""
    emb = _t(spark, sf_dir, "embeddings")
    return S.pq_train(emb, emb.filter(F.col("vec_id") < 16))


@register(
    "x59_fuzzy_name_match",
    """SELECT a.c_custkey AS key_a, b.c_custkey AS key_b,
              CAST(levenshtein(a.c_name, b.c_name) AS BIGINT) AS dist
       FROM customer a JOIN customer b
         ON substr(a.c_name, 1, 15) = substr(b.c_name, 1, 15)
        AND a.c_custkey < b.c_custkey
       WHERE levenshtein(a.c_name, b.c_name) <= 1""",
    "EXT-02",
    tier=1,
)
def x59_fuzzy_name_match(spark, sf_dir):
    """EXT-02 record-linkage tier: fuzzy self-match on customer names —
    edit distance <= 1 within BLOCKS keyed by the 15-char name prefix.
    Blocking is what makes fuzzy matching feasible at scale: the
    all-pairs O(n²) edit-distance comparison collapses to an equi-join on
    the block key (shuffle-partitionable, AQE-splittable when a block is
    hot), and only within-block candidates pay the Levenshtein evaluation
    — the standard blocked record-linkage plan (Fellegi-Sunter shape)
    with the candidate predicate entirely in whole-stage codegen, no
    Python. The block key is a precision/recall dial: a coarser prefix
    raises recall and pair volume together."""
    c = _t(spark, sf_dir, "customer")
    a = c.select(
        F.col("c_custkey").alias("key_a"),
        F.col("c_name").alias("name_a"),
        F.substring("c_name", 1, 15).alias("blk"),
    )
    b = c.select(
        F.col("c_custkey").alias("key_b"),
        F.col("c_name").alias("name_b"),
        F.substring("c_name", 1, 15).alias("blk"),
    )
    return (
        a.join(b, "blk")
        .filter(F.col("key_a") < F.col("key_b"))
        .withColumn("dist", F.levenshtein("name_a", "name_b").cast("long"))
        .filter(F.col("dist") <= 1)
        .select("key_a", "key_b", "dist")
    )


def _c2_sql() -> str:
    profile = REGISTRY["x08_11_text_profile"].oracle
    return f"""WITH RECURSIVE
prof AS ({profile}),
k1 AS (SELECT * FROM prof
       WHERE doc_id % 97 <> 0 AND quality >= {C1_QUALITY_GATE}
         AND lang_pred = 'en' AND n_tokens >= {C1_MIN_TOKENS}),
k2 AS (SELECT * FROM (
        SELECT *, min(doc_id) OVER (PARTITION BY fingerprint) AS mn FROM k1)
       WHERE doc_id = mn),
{_TOKS_CTE},
{_DS_CTE},
ds2 AS (SELECT ds.doc_id, ds.sh FROM ds JOIN k2 USING (doc_id)),
{_minhash_pairs_cte('ds2')},
edges AS (SELECT doc_a AS src, doc_b AS dst FROM mhpairs
          UNION ALL SELECT doc_b, doc_a FROM mhpairs),
reach AS (SELECT doc_id, doc_id AS n FROM k2
          UNION
          SELECT r.doc_id, e.dst FROM reach r JOIN edges e ON e.src = r.n),
k3 AS (SELECT doc_id FROM reach GROUP BY doc_id HAVING doc_id = min(n)),
bsh AS (SELECT DISTINCT sh FROM ds WHERE doc_id % 97 = 0),
s3 AS (SELECT ds.doc_id, ds.sh FROM ds JOIN k3 USING (doc_id)),
szs AS (SELECT doc_id, count(*) AS n_sh FROM s3 GROUP BY doc_id),
hits AS (SELECT s3.doc_id, count(*) AS n_hits
         FROM s3 JOIN bsh USING (sh) GROUP BY s3.doc_id),
k4 AS (SELECT k3.doc_id FROM k3
       LEFT JOIN szs ON k3.doc_id = szs.doc_id
       LEFT JOIN hits ON k3.doc_id = hits.doc_id
       WHERE round(COALESCE(hits.n_hits, 0)
                   / CAST(greatest(COALESCE(szs.n_sh, 0), 1) AS DOUBLE), 4)
             < 0.1)
SELECT k2.doc_id, k2.n_tokens, k2.quality, k2.lang_pred
FROM k2 JOIN k4 ON k2.doc_id = k4.doc_id"""


@register(
    "c2_curation_pipeline_lsh",
    None,  # bound below, like c1
    "EXT-01", "EXT-02", "EXT-05",
    tier=1,
)
def c2_curation_pipeline_lsh(spark, sf_dir):
    """The c1 pipeline with every stage on its SCALE tier: the near-dup
    stage swaps exact all-shared-shingle Jaccard (x02 machinery — the
    posting-list join is the 100 TB bottleneck) for banded MinHash-LSH
    candidates with exact verification (x03 machinery), and the
    clustering swaps min-label propagation for large-star/small-star
    contraction (O(log n) rounds on any graph shape). Same gates, same
    manifest columns — the pair this demonstrates: the composed pipeline
    is tier-swappable without touching the surrounding stages, and BOTH
    tiers carry a full composed oracle."""
    docs = _t(spark, sf_dir, "documents")
    benchmark = docs.filter(F.col("doc_id") % 97 == 0)
    corpus = docs.filter(F.col("doc_id") % 97 != 0)

    prof = T.text_profile(corpus)
    k1 = prof.filter(
        (F.col("quality") >= C1_QUALITY_GATE)
        & (F.col("lang_pred") == "en")
        & (F.col("n_tokens") >= C1_MIN_TOKENS)
    )
    # r13 NEGATIVE RESULT: persist_now on the three chain frames (the c2
    # profile showed a 24.9 CPU-s broadcast build re-running the profile
    # chain plus twin shingle-set builds racing the lazy persists) A/B'd
    # NEUTRAL — 8.81 eager vs 8.53 lazy median over 4 interleaved runs;
    # the duplicate builds fill idle cores while eager passes serialize.
    # Stays lazy (matches the r12 x88/c1 eager negatives).
    k2 = D._persist(
        k1.withColumn(
            "__mn", F.min("doc_id").over(Window.partitionBy("fingerprint"))
        )
        .filter(F.col("doc_id") == F.col("__mn"))
        .drop("__mn")
    )
    survivors = D._persist(
        corpus.join(k2.select("doc_id"), "doc_id", "left_semi")
    )
    # ONE shingle-set table feeds both the LSH stage and decontamination
    # (exploded back to (doc_id, sh) rows for the latter) — the same
    # share-the-shingles move c1 makes; without it decontaminate paid a
    # full second tokenize+shingle pass over the survivor corpus
    # (measured at sf0.1: 1.6s of c2's 4.3s warm — review r6).
    sets = D._persist(D.doc_shingle_sets(survivors))
    pairs = D.minhash_dedup_pairs(
        survivors, threshold=JACCARD_THRESHOLD, sets=sets
    ).select("doc_a", "doc_b")
    k3 = (
        D.dedup_keep_one(survivors, pairs, algorithm="star")
        .filter(F.col("keep"))
        .select("doc_id")
    )
    survivors3 = survivors.join(k3, "doc_id", "left_semi")
    k4 = (
        T.decontaminate(
            survivors3,
            benchmark,
            shingles=sets.select(
                "doc_id", F.explode("sh_set").alias("sh")
            ).join(k3, "doc_id", "left_semi"),
        )
        .filter(~F.col("contaminated"))
        .select("doc_id")
    )
    return k2.join(k4, "doc_id", "left_semi").select(
        "doc_id", "n_tokens", "quality", "lang_pred"
    )


REGISTRY["c2_curation_pipeline_lsh"].oracle = _c2_sql()


#: The consistent-BMP fixture's closed-form (doc_id, text, w, h) CTEs —
#: the oracle-side twin of attach_consistent_bmp_payload, shared by the
#: pixel-stats oracles (x60/x78/x115 here) and the r10 aHash oracles
#: (x157/x158) so the fixture's closed form exists once.
_CONSISTENT_DIMS_CTES = """ascii_docs AS (
         SELECT doc_id, regexp_replace(text, '[^ -~]', '', 'g') AS text
         FROM documents),
       dims AS (
         SELECT doc_id, text,
                16 + (CASE WHEN length(text) = 0 THEN 0
                           ELSE ascii(substr(text, 1, 1)) END % 16) * 4 AS w,
                least(length(text)
                      // (16 + (CASE WHEN length(text) = 0 THEN 0
                                     ELSE ascii(substr(text, 1, 1)) END % 16) * 4),
                      16) AS h
         FROM ascii_docs)"""

_X60_SQL = f"""WITH {_CONSISTENT_DIMS_CTES},
       px AS (
         SELECT doc_id, w, h,
                list_transform(range(1, CAST(w * h AS BIGINT) + 1),
                               i -> ascii(substr(text, CAST(i AS INTEGER), 1)))
                    AS p
         FROM dims WHERE h >= 1)
       SELECT doc_id, CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
              CAST(list_min(p) AS BIGINT) AS px_min,
              CAST(list_max(p) AS BIGINT) AS px_max,
              CAST(list_sum(p) AS BIGINT) AS px_sum
       FROM px"""


@register("x60_multimodal_pixel_stats", _X60_SQL, "EXT-04", tier=1)
def x60_multimodal_pixel_stats(spark, sf_dir):
    """EXT-04 with a REAL codec under driver hash: spec-consistent 8-bit
    BMPs are assembled JVM-side (pixel array = the text's leading UTF-8
    bytes, a closed form), then the pure-numpy BMP decoder
    (operators/multimodal.decode_bmp_pixels — strict header validation,
    padding, bottom-up order) extracts actual pixel arrays whose integer
    stats the oracle recomputes from the closed form. This replaces the
    'decode is a stub' caveat with a genuinely exercised decode path; the
    same kernel also decodes real-world 8/24-bit BMPs and 8-bit
    gray/RGB/RGBA PNGs (stdlib zlib + all five spec filters,
    tests/test_pixel_codecs.py)."""
    from .operators.multimodal import attach_consistent_bmp_payload, pixel_stats

    return pixel_stats(
        attach_consistent_bmp_payload(_t(spark, sf_dir, "documents"))
    )


@register("x78_gif_pixel_stats", _X60_SQL, "EXT-04", tier=1)
def x78_gif_pixel_stats(spark, sf_dir):
    """EXT-04 GIF tier: the SAME closed-form pixel content as x60, but
    carried through spec-valid GIF87a payloads — real LZW compression on
    the fixture side (operators/multimodal.encode_gif8) and the real
    pure-Python LZW decoder + grayscale-palette collapse on the query
    side (decode_gif_pixels). Because the closed form is identical, the
    x60 oracle verifies this path unchanged."""
    from .operators.multimodal import attach_consistent_gif_payload, pixel_stats

    return pixel_stats(
        attach_consistent_gif_payload(_t(spark, sf_dir, "documents"))
    )


_BPR = "2 + (CASE WHEN length(t) = 0 THEN 0 ELSE ascii(substr(t, 1, 1)) END % 4)"

_X115_SQL = f"""WITH ascii_docs AS (
         SELECT doc_id, regexp_replace(text, '[^ -~]', '', 'g') AS t
         FROM documents),
       dims AS (
         SELECT doc_id, t, {_BPR} AS bpr,
                least(length(t) // ({_BPR}), 8) AS nrows
         FROM ascii_docs),
       px AS (
         SELECT doc_id, bpr, nrows,
                list_transform(range(1, CAST(bpr * nrows AS BIGINT) + 1),
                               i -> ascii(substr(t, CAST(i AS INTEGER), 1)))
                    AS p
         FROM dims WHERE nrows >= 1)
       SELECT doc_id,
              CAST(bpr * 8 AS BIGINT) AS width,
              CAST(nrows * 8 AS BIGINT) AS height,
              CAST(list_min(p) AS BIGINT) AS px_min,
              CAST(list_max(p) AS BIGINT) AS px_max,
              CAST(64 * list_sum(p) AS BIGINT) AS px_sum
       FROM px"""


@register("x115_jpeg_pixel_stats", _X115_SQL, "EXT-04", tier=1)
def x115_jpeg_pixel_stats(spark, sf_dir):
    """EXT-04 JPEG tier (r7) — the LAST pixel-decode stub closed: each
    text byte becomes one CONSTANT 8x8 block in a spec-valid
    baseline-sequential JPEG (full forward-DCT + Annex-K-Huffman
    encoder on the fixture side), and the query side runs the REAL
    pure-numpy decoder (operators/jpeg.py: marker walk, canonical
    Huffman, dequant, batched IDCT, level shift). Constant blocks under
    an all-ones quant table make the lossy codec exactly lossless (zero
    AC energy, exact DC), so the oracle recomputes the decoded-pixel
    stats in closed form: every used text byte appears exactly 64 times.
    The decoder's general paths (AC coefficients, 4:2:0 subsampling,
    color, restart markers) are pinned against an independent loop-IDCT
    in tests/test_jpeg_codec.py; with this row, BMP, PNG, GIF, JPEG and
    WAV all have driver-hashed REAL decode paths."""
    from .operators.multimodal import attach_consistent_jpeg_payload, pixel_stats

    return pixel_stats(
        attach_consistent_jpeg_payload(_t(spark, sf_dir, "documents"))
    )
