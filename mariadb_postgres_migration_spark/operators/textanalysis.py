"""Text-analysis operators for training-data pipelines (SURVEY.md §2.10
EXT-05): token statistics, quality scoring, heuristic language ID, and
document fingerprinting (exact md5 + winnowing). All JVM built-ins; every
formula is written with engine-portable primitives (int ratios, fixed
evaluation order) so the DuckDB oracle reproduces values bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import normalize_text_native
from .dedup import ensure_min_parallelism, materialize, tokens_col


def _with_tokens(
    docs: DataFrame, id_col: str, text_col: str, extra: list[str] | None = None
) -> DataFrame:
    """(doc_id, __toks[, text]) with tokenization evaluated once per row —
    see dedup.materialize for why a barrier is required before any
    higher-order function over the token array."""
    cols = [F.col(id_col).alias("doc_id")] + [F.col(c) for c in (extra or [text_col])]
    if "__toks" in docs.columns:
        # already-tokenized input (a suite sharing ONE tokenize pass across
        # several member operators): select the requested shape, keep the
        # bound token column — never re-tokenize
        return docs.select(*cols, F.col("__toks"))
    return materialize(
        ensure_min_parallelism(docs).select(*cols), tokens_col(text_col), "__toks"
    )

#: Stopword sample for quality scoring (fixed, shared with oracles).
STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it")

#: Marker words per language for heuristic language ID. Deterministic
#: tie-break: first language in this order wins (chained >= comparisons).
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "is"),
    "de": ("der", "die", "das", "und", "ist"),
    "fr": ("le", "la", "les", "et", "est"),
    "es": ("el", "la", "los", "y", "es"),
}


def _token_count_cols(toks: Column, text_col: str) -> list[Column]:
    """Shared token-stat columns: whitespace tokens + a BPE-ish subword
    proxy (runs of letters / digits / single punctuation), both pure regex."""
    bpe_ish = F.regexp_extract_all(
        F.lower(F.col(text_col)), F.lit(r"[a-z]+|[0-9]+|[^a-z0-9\s]"), 0
    )
    return [
        F.size(toks).cast("long").alias("n_tokens"),
        F.size(bpe_ish).cast("long").alias("n_subtokens"),
        F.length(F.col(text_col)).cast("long").alias("n_chars"),
    ]


def _quality_cols(toks: Column, text_col: str) -> list[Column]:
    """Shared quality-heuristic columns: stopword ratio, punctuation ratio,
    and the composite score. Ratios are int/int divisions (exact in IEEE
    double for our magnitudes) evaluated in a fixed order; the composite is
    rounded to 4dp for cross-engine hash stability."""
    n_tok = F.size(toks).cast("double")
    n_stop = F.size(
        F.filter(toks, lambda t: t.isin(*[F.lit(s) for s in STOPWORDS]))
    ).cast("double")
    n_punct = F.length(F.regexp_replace(F.col(text_col), r"[^!-/:-@\[-`{-~]", "")).cast(
        "double"
    )
    n_chars = F.length(F.col(text_col)).cast("double")
    stop_ratio = F.when(n_tok > 0, n_stop / n_tok).otherwise(F.lit(0.0))
    punct_ratio = F.when(n_chars > 0, n_punct / n_chars).otherwise(F.lit(0.0))
    mean_tok_len = F.when(n_tok > 0, (n_chars - (n_tok - 1)) / n_tok).otherwise(
        F.lit(0.0)
    )
    score = stop_ratio * 0.4 + (1.0 - punct_ratio) * 0.4 + F.least(
        mean_tok_len / 10.0, F.lit(1.0)
    ) * 0.2
    return [
        F.round(stop_ratio, 4).alias("stop_ratio"),
        F.round(punct_ratio, 4).alias("punct_ratio"),
        F.round(score, 4).alias("quality"),
    ]


def _lang_pred_expr(toks: Column) -> Column:
    """Shared language-ID argmax: chained comparisons so the FIRST language
    in LANG_MARKERS order wins ties; 'und' when nothing matches."""
    scores = lang_scores(toks)
    langs = list(scores)
    pred = F.lit("und")
    # build the chain backwards so earlier langs take precedence on ties
    for i in range(len(langs) - 1, -1, -1):
        lang = langs[i]
        cond = scores[lang] > 0
        for other in langs[:i]:  # must strictly beat every earlier language
            cond = cond & (scores[lang] > scores[other])
        for other in langs[i + 1 :]:  # and be >= every later one
            cond = cond & (scores[lang] >= scores[other])
        pred = F.when(cond, F.lit(lang)).otherwise(pred)
    return pred.alias("lang_pred")


def token_stats(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Token counting (see _token_count_cols)."""
    docs = _with_tokens(docs, id_col, text_col)
    return docs.select(F.col("doc_id"), *_token_count_cols(F.col("__toks"), text_col))


def quality_score(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Quality heuristics (see _quality_cols)."""
    docs = _with_tokens(docs, id_col, text_col)
    return docs.select(F.col("doc_id"), *_quality_cols(F.col("__toks"), text_col))


def _marker_hits(toks: Column, markers: tuple[str, ...]) -> Column:
    marker_arr = F.array(*[F.lit(m) for m in markers])
    return F.size(F.filter(toks, lambda t: F.array_contains(marker_arr, t))).cast("long")


def lang_scores(toks: Column) -> dict[str, Column]:
    return {lang: _marker_hits(toks, markers) for lang, markers in LANG_MARKERS.items()}


def lang_id(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Heuristic language ID (see _lang_pred_expr)."""
    docs = _with_tokens(docs, id_col, text_col)
    return docs.select(F.col("doc_id"), _lang_pred_expr(F.col("__toks")))


def text_profile(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """EXT-05 one-pass document profile: token stats + quality heuristics +
    language ID + md5 fingerprint as a SINGLE projection over one tokenize
    barrier — the scale form of running the four analyses separately (which
    would re-scan and re-tokenize the corpus four times, or force three
    doc_id joins). Built from the SAME column builders the standalone
    operators use, so the fused tier cannot drift from them. All row-local
    JVM expressions; no shuffle at all."""
    docs = _with_tokens(docs, id_col, text_col)
    toks = F.col("__toks")
    return docs.select(
        F.col("doc_id"),
        *_token_count_cols(toks, text_col),
        *_quality_cols(toks, text_col),
        _lang_pred_expr(toks),
        F.md5(normalize_text_native(F.col(text_col))).alias("fingerprint"),
    )


def term_doc_freq(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", top_k: int = 5
) -> DataFrame:
    """EXT-05 term weighting (CountVectorizer-equivalent document-frequency
    statistics): per (doc, term) term frequency, per-term document frequency,
    and each doc's ``top_k`` representative terms ranked by
    (tf DESC, df ASC, term ASC) — the integer-exact order statistic behind
    tf·idf (prefer frequent-in-doc, rare-in-corpus terms). Keeping the
    ranking on (tf, df) integers rather than a float tf·ln(N/df) score makes
    the result bit-identical across engines (no transcendental libm calls in
    the hashed output); a downstream tf·idf weight is one expression over
    the returned (tf, df) columns.

    Scale shape: explode → partial-agg counts per (doc, term) → df as a
    COUNT WINDOW over the term partition (r4: one shuffle of the tf table
    on term, no sort needed for a partition-only frame — replaces the
    df-groupBy + join-back form, which exchanged the tf table on term
    TWICE; measured 1.21s → 0.86s at sf0.1, identical output) → per-doc
    top-k window. Every fact-sized stage has map-side combine; no
    broadcast of the term dictionary is assumed (at 100 TB it is itself
    huge); a hot term is a hot partition in either formulation."""
    toked = _with_tokens(docs, id_col, text_col)
    tf = (
        toked.select("doc_id", F.explode(F.col("__toks")).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count("*").cast("long").alias("tf"))
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("tf"), F.asc("df"), F.asc("term")
    )
    return (
        tf.withColumn("df", F.count("*").over(Window.partitionBy("term")).cast("long"))
        .withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= top_k)
        .select("doc_id", "term", "tf", "df", "rk")
    )


#: Sentiment lexicon (fixed wordlist, shared with oracles): word → ±1 weight.
SENTIMENT_LEXICON: dict[str, int] = {
    "good": 1, "great": 1, "excellent": 1, "love": 1,
    "happy": 1, "best": 1, "wonderful": 1, "amazing": 1,
    "bad": -1, "terrible": -1, "awful": -1, "hate": -1,
    "sad": -1, "worst": -1, "horrible": -1, "poor": -1,
}


def sentiment_score(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """EXT-05 sentiment-lexicon scorer (SURVEY §2.10, cf. PAPERS.md Spark
    sentiment entry): explode tokens, BROADCAST-join the lexicon (the scale
    pattern for any wordlist/dictionary scorer — the lexicon is small, the
    corpus is not), aggregate hit counts and the signed score per document,
    then left-join back so zero-hit documents keep an explicit 0 row.

    The lexicon travels as a real DataFrame (not a literal IN-list) so the
    same plan shape holds when the wordlist grows to thousands of entries."""
    spark = docs.sparkSession
    lex = spark.createDataFrame(
        [(w, wt) for w, wt in SENTIMENT_LEXICON.items()], "term string, weight int"
    )
    toked = _with_tokens(docs, id_col, text_col)
    hits = (
        toked.select("doc_id", F.explode(F.col("__toks")).alias("term"))
        .join(F.broadcast(lex), "term")  # bounded: fixed sentiment lexicon
        .groupBy("doc_id")
        .agg(
            F.sum(F.when(F.col("weight") > 0, 1).otherwise(0)).alias("pos_hits"),
            F.sum(F.when(F.col("weight") < 0, 1).otherwise(0)).alias("neg_hits"),
            F.sum("weight").alias("score"),
        )
    )
    base = docs.select(F.col(id_col).alias("doc_id"))
    out = base.join(hits, "doc_id", "left").select(
        "doc_id",
        F.coalesce("pos_hits", F.lit(0)).cast("long").alias("pos_hits"),
        F.coalesce("neg_hits", F.lit(0)).cast("long").alias("neg_hits"),
        F.coalesce("score", F.lit(0)).cast("long").alias("score"),
    )
    return out.withColumn(
        "label",
        F.when(F.col("score") > 0, "pos").when(F.col("score") < 0, "neg").otherwise("neu"),
    )


def fingerprint_md5(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Exact-content fingerprint: md5 of the normalized text — the engine's
    portable stand-in for a rolling hash when the unit is the whole doc."""
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.md5(normalize_text_native(F.col(text_col))).alias("fingerprint"),
    )


def winnow_fingerprints(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    window: int = 4,
) -> DataFrame:
    """Winnowing (Schleimer et al., SIGMOD'03): per position, hash the word
    k-gram; keep the window-min hash of each sliding window; distinct mins
    are the document's fingerprints. Both the token and gram arrays sit
    behind materialize barriers (see dedup.materialize) so the pipeline is
    linear per row — no Python, no window-function shuffle (the array never
    leaves its row)."""
    toked = _with_tokens(docs, id_col, text_col)
    toks = F.col("__toks")
    n = F.size(toks) - (k - 1)
    grams_expr = F.when(
        n >= 1,
        F.transform(
            F.sequence(F.lit(1), n),
            lambda i: F.md5(F.array_join(F.slice(toks, i, k), " ")),
        ),
    ).otherwise(F.array().cast("array<string>"))
    grammed = materialize(toked.select("doc_id", grams_expr.alias("__g0")), F.col("__g0"), "__grams").drop("__g0")
    grams = F.col("__grams")
    n_windows = F.size(grams) - (window - 1)
    mins = F.when(
        n_windows >= 1,
        F.transform(
            F.sequence(F.lit(1), n_windows),
            lambda i: F.array_min(F.slice(grams, i, window)),
        ),
    ).otherwise(grams)  # shorter than one window: every gram is a fingerprint
    return grammed.select(
        F.col("doc_id"), F.explode(F.array_distinct(mins)).alias("fp")
    )


# ---------------------------------------------------------------------------
# Gopher-style repetition filter + deterministic stratified sampling
# ---------------------------------------------------------------------------

#: Repetition-filter thresholds (Gopher, Rae et al. 2021 §A1.1 uses the
#: same SHAPE of rule — "fraction of characters in the most common n-gram";
#: values tuned to split the fixture corpus non-trivially: rep_ratio median
#: 0.033 / p90 0.069, ttr median 0.46).
REP_RATIO_MAX = 0.05
TTR_MIN = 0.4


def repetition_stats(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """EXT-05 (Gopher-style repetition metrics): per doc, the fraction of
    word-2-grams consumed by the single most frequent 2-gram (``rep_ratio``)
    and the type-token ratio (``ttr``); ``keep`` flags docs passing both
    thresholds — the published repeated-text heuristic for pruning
    low-quality training documents.

    Plan: ENTIRELY row-local, zero shuffle. Every statistic — including the
    most-frequent-2-gram count — is a function of one document's own token
    array, so the top-gram count is a sorted-run-length fold over the in-row
    grams array (array_sort + aggregate HOF) instead of the
    explode → groupBy(doc,gram) → groupBy(doc) → join-back corpus pattern,
    which paid two doc-keyed shuffles and a join for per-row information
    (and was the r4 bench regression: x32 cold 3.36s → ~2.1s from this
    change). At 100 TB this now scans and filters in one pass with no
    exchange at all. Flags compare the ROUNDED ratios so the oracle's
    decision is bit-identical (both engines round half-away-from-zero on
    doubles)."""
    toked = _with_tokens(docs, id_col, text_col)
    toks = F.col("__toks")
    n2 = F.size(toks) - 1
    grams = F.when(
        n2 >= 1,
        F.transform(
            F.sequence(F.lit(1), n2), lambda i: F.array_join(F.slice(toks, i, 2), " ")
        ),
    ).otherwise(F.array().cast("array<string>"))
    base = toked.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_words"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_distinct"),
        grams.alias("__grams"),
    )
    # longest equal-run in the sorted grams array == count of the most
    # frequent gram; null init makes the first element start run=1 even for
    # a legitimately-empty-string gram
    zero = F.lit(0).cast("long")
    init = F.struct(
        F.lit(None).cast("string").alias("prev"),
        zero.alias("run"),
        zero.alias("best"),
    )

    def _merge(acc, x):
        run = (
            F.when(x.eqNullSafe(acc["prev"]), acc["run"] + 1)
            .otherwise(F.lit(1))
            .cast("long")
        )
        return F.struct(
            x.alias("prev"), run.alias("run"), F.greatest(acc["best"], run).alias("best")
        )

    j = base.select(
        "doc_id",
        "n_words",
        "n_distinct",
        F.size("__grams").cast("long").alias("n_grams"),
        F.aggregate(
            F.array_sort("__grams"), init, _merge, lambda acc: acc["best"]
        ).alias("top_gram_n"),
    )
    n_grams = F.col("n_grams")
    top_n = F.col("top_gram_n")
    rep = F.round(
        F.when(n_grams > 0, top_n / n_grams.cast("double")).otherwise(F.lit(0.0)), 4
    )
    ttr = F.round(
        F.when(
            F.col("n_words") > 0, F.col("n_distinct") / F.col("n_words").cast("double")
        ).otherwise(F.lit(0.0)),
        4,
    )
    return j.select(
        "doc_id",
        "n_words",
        "n_distinct",
        n_grams.alias("n_grams"),
        top_n.alias("top_gram_n"),
        rep.alias("rep_ratio"),
        ttr.alias("ttr"),
        ((rep <= F.lit(REP_RATIO_MAX)) & (ttr >= F.lit(TTR_MIN))).alias("keep"),
    )


#: Per-stratum sampling thresholds as 8-hex-char lexicographic cutoffs on
#: md5(doc_id) — '80000000' ≈ rate 0.5, '40000000' ≈ 0.25. String
#: comparison on fixed-width lowercase hex is engine-portable (no
#: hex→int conversion differences), the same trick the MinHash oracle uses.
SAMPLE_CUTOFFS: dict[str, str] = {"en": "80000000"}
SAMPLE_DEFAULT_CUTOFF = "40000000"


def stratified_sample(
    docs: DataFrame,
    id_col: str = "doc_id",
    stratum_col: str = "lang",
    cutoffs: dict[str, str] | None = None,
    default_cutoff: str = SAMPLE_DEFAULT_CUTOFF,
) -> DataFrame:
    """EXT-05 (deterministic stratified sampling): keep a row iff the first
    8 hex chars of md5(id) sort below its stratum's cutoff. Row-local, zero
    shuffle, and exactly reproducible across engines and runs — unlike
    ``DataFrame.sample``, whose output depends on partitioning. The per-id
    hash means resampling at a different rate yields a SUPERSET/SUBSET
    (nested samples), the property training-data pipelines need for
    down-scaling ablations."""
    cutoffs = SAMPLE_CUTOFFS if cutoffs is None else cutoffs
    bucket = F.substring(F.md5(F.col(id_col).cast("string")), 1, 8)
    cutoff = F.lit(default_cutoff)
    for stratum, cut in sorted(cutoffs.items()):
        cutoff = F.when(F.col(stratum_col) == stratum, F.lit(cut)).otherwise(cutoff)
    return docs.filter(bucket < cutoff)


# ---------------------------------------------------------------------------
# PII scrubbing, sequence packing, domain-mix resampling
# ---------------------------------------------------------------------------

#: PII patterns chosen from the regex subset where Java (Spark) and RE2
#: (DuckDB) agree: no backreferences, no lookaround, unambiguous greedy
#: quantifiers — leftmost-longest and leftmost-first coincide on these.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ip", r"([0-9]{1,3}\.){3}[0-9]{1,3}", "<IP>"),
    ("phone", r"\+[0-9]{7,15}", "<PHONE>"),
)


def pii_scrub(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """EXT-05 (PII redaction): replace emails / IPv4s / intl phone numbers
    with typed placeholder tokens and count the redactions per category.

    Row-local, zero shuffle, whole-stage-codegen regex — the shape every
    compliance pass over a 100 TB crawl needs. Patterns apply in a fixed
    order (email → ip → phone), each count taken on the text as already
    scrubbed by the previous stages, and the placeholders contain no
    characters any pattern can re-match, so scrubbing is confluent: the
    oracle applies the same pipeline and gets byte-identical text. The
    scrub chain is materialized stage-by-stage (select barriers) so each
    regex runs once per row, not once per downstream consumer."""
    out = docs.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("__clean"))
    kept: list[str] = []
    for name, pat, repl in PII_PATTERNS:
        out = out.select(
            "doc_id",
            *kept,
            F.regexp_count(F.col("__clean"), F.lit(pat)).cast("long").alias(f"n_{name}"),
            F.regexp_replace("__clean", pat, repl).alias("__clean"),
        )
        kept.append(f"n_{name}")
    return out.select("doc_id", *kept, F.col("__clean").alias("clean_text"))


#: Pack capacity in tokens. 256 ≈ 4-6 fixture docs per pack; the operator is
#: capacity-agnostic.
PACK_CAPACITY = 256


def sequence_pack(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shard_col: str = "source",
    capacity: int = PACK_CAPACITY,
    shard_cols: list[str] | None = None,
) -> DataFrame:
    """EXT-05 (sequence packing): assign each document a position in a
    stream of fixed-capacity token windows — the concat-then-chunk packing
    LLM pretraining uses to fill context windows without padding.

    Within each shard (``shard_col``), documents concatenate in ``id_col``
    order; a doc occupies token offsets [cum−n_tok, cum) and therefore
    spans packs ``start_pack..end_pack`` (a doc may straddle a boundary —
    exactly how GPT-style chunking slices). One window (running sum) per
    shard: the shuffle is keyed by shard, skew follows shard size, and at
    100 TB the shard key is what you'd make finer (source × day) to bound
    any one ordered scan — the assignment stays deterministic under any
    such refinement because it never looks across shards.

    ``shard_cols`` (r9): a COMPOSITE shard key kept under its own column
    names — the c7 pipeline packs per (split, shard) after the x138/x139
    assignments; default keeps the single ``shard_col`` → ``shard``
    aliasing x36 pins."""
    if shard_cols is None:
        group_sel = [F.col(shard_col).alias("shard")]
        group_names = ["shard"]
    else:
        group_sel = [F.col(c) for c in shard_cols]
        group_names = list(shard_cols)
    toked = _with_tokens(docs, id_col, text_col, extra=[text_col, *group_names] if shard_cols else [text_col, shard_col])
    n_tok = F.size("__toks").cast("long")
    w = Window.partitionBy(*group_names).orderBy("doc_id")
    out = toked.select(
        "doc_id", *group_sel, n_tok.alias("n_tok")
    ).withColumn("cum", F.sum("n_tok").over(w))
    start = F.floor((F.col("cum") - F.col("n_tok")) / capacity).cast("long")
    end = F.floor((F.col("cum") - 1) / capacity).cast("long")
    return out.select(
        "doc_id",
        *group_names,
        "n_tok",
        start.alias("start_pack"),
        F.greatest(start, end).alias("end_pack"),
    )


#: Target sampling weight per source for mix rebalancing; >1 duplicates
#: (floor(w) copies + fractional md5 coin), <1 downsamples. Fractions are
#: 8-hex-char lexicographic md5 cutoffs like SAMPLE_CUTOFFS.
MIX_WEIGHTS: dict[str, tuple[int, str]] = {
    # source → (whole copies, fractional cutoff on md5(doc_id))
    "src0": (2, "00000000"),   # 2.0×
    "src1": (1, "80000000"),   # 1.5×
    "src2": (0, "40000000"),   # 0.25×
}
MIX_DEFAULT: tuple[int, str] = (1, "00000000")  # 1.0× pass-through


def mix_resample(
    docs: DataFrame,
    id_col: str = "doc_id",
    source_col: str = "source",
    weights: dict[str, tuple[int, str]] | None = None,
    default: tuple[int, str] = MIX_DEFAULT,
) -> DataFrame:
    """EXT-05 (domain-mix rebalancing): resample each source to a target
    weight — the "2× wikipedia, 0.25× common-crawl" knob of a pretraining
    data recipe. A row yields ``floor(w)`` copies plus one more iff
    md5(id) sorts below the fractional cutoff (the same engine-portable
    coin as :func:`stratified_sample`, so samples nest across recipes).

    Row-local explode, zero shuffle, deterministic under repartitioning;
    ``copy`` indexes the duplicates so downstream packing/shuffling can
    treat them as distinct rows."""
    weights = MIX_WEIGHTS if weights is None else weights
    whole = F.lit(default[0])
    cutoff = F.lit(default[1])
    for src, (n, cut) in sorted(weights.items()):
        whole = F.when(F.col(source_col) == src, F.lit(n)).otherwise(whole)
        cutoff = F.when(F.col(source_col) == src, F.lit(cut)).otherwise(cutoff)
    coin = F.substring(F.md5(F.col(id_col).cast("string")), 1, 8) < cutoff
    n_copies = (whole + coin.cast("int")).alias("__n")
    return (
        docs.select(F.col(id_col).alias("doc_id"), F.col(source_col).alias("source"), n_copies)
        .filter(F.col("__n") >= 1)
        .select(
            "doc_id",
            "source",
            F.explode(F.sequence(F.lit(1), F.col("__n"))).alias("copy"),
        )
        .withColumn("copy", F.col("copy").cast("long"))
    )


#: Context-window chunking: window tokens per chunk, advancing by stride
#: (overlap = CHUNK_WINDOW - CHUNK_STRIDE).
CHUNK_WINDOW = 32
CHUNK_STRIDE = 24


def chunk_overlap(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = CHUNK_WINDOW,
    stride: int = CHUNK_STRIDE,
) -> DataFrame:
    """EXT-05 (overlapping context-window chunking): split each document
    into ``window``-token chunks whose starts advance by ``stride`` tokens
    (RAG-style overlap keeps boundary context in two chunks).

    Row-local explode — chunk starts are an in-row ``sequence``, each chunk
    an ``slice`` + join over the materialized token array; zero shuffle,
    output rows ≈ n_tok/stride per doc. Empty/whitespace-only docs yield
    no chunks — the guard filters the PHANTOM token explicitly, because
    split-tokenizing '' returns [''] in BOTH engines (size 1, not 0), so
    a bare n_tok ≥ 1 check would emit an empty chunk row (review r5).
    Generation stops at the first chunk that reaches the document's end —
    no redundant tail chunk fully contained in its predecessor."""
    toked = _with_tokens(docs, id_col, text_col)
    n_tok = F.size("__toks")
    nonempty = (n_tok >= 1) & (F.element_at("__toks", 1) != F.lit(""))
    chunks = toked.filter(nonempty).select(
        "doc_id",
        n_tok.cast("long").alias("n_tok"),
        F.posexplode(F.sequence(F.lit(0), n_tok - 1, F.lit(stride))).alias(
            "chunk_id", "start"
        ),
        F.col("__toks"),
    ).filter(
        # keep a start iff the PREVIOUS chunk didn't already cover the end
        (F.col("start") == 0) | (F.col("start") + (window - stride) < F.col("n_tok"))
    )
    piece = F.slice("__toks", F.col("start") + 1, window)
    return chunks.select(
        "doc_id",
        "n_tok",
        F.col("chunk_id").cast("long").alias("chunk_id"),
        F.col("start").cast("long").alias("start"),
        F.size(piece).cast("long").alias("chunk_len"),
        F.array_join(piece, " ").alias("chunk_text"),
    )


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    flag_ratio: float = 0.1,
    shingles: DataFrame | None = None,
) -> DataFrame:
    """EXT-05 (benchmark decontamination): per corpus document, how many of
    its distinct word-k-gram shingles appear anywhere in the benchmark set,
    plus a contamination flag at ``flag_ratio`` — the n-gram-overlap test
    (GPT-3 appendix C / Gopher A.3 shape) every pretraining corpus runs
    against its eval suites before training.

    The benchmark's distinct shingle set is eval-suite-sized — small by
    construction at any corpus scale — so it BROADCASTS into a left-semi
    shape: corpus shingles stream once, hits partial-aggregate per doc,
    and clean docs rejoin via the document spine (left join, zero-fill).
    The ratio compares rounded (both engines half-away-from-zero) so the
    flag is hash-stable."""
    from .dedup import doc_shingles

    corpus = docs.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("text"))
    bench_sh = (
        doc_shingles(benchmark, id_col, text_col, k).select("sh").distinct()
    )
    # shingles: precomputed (doc_id, sh) for the same docs — shared with
    # other shingle consumers by the c1 pipeline so the corpus tokenizes once
    ds = shingles if shingles is not None else doc_shingles(corpus, "doc_id", "text", k)
    sizes = ds.groupBy("doc_id").agg(F.count("*").cast("long").alias("n_sh"))
    hits = (
        ds.join(F.broadcast(bench_sh), "sh")  # bounded: benchmark shingle set (eval-suite-sized by contract)
        .groupBy("doc_id")
        .agg(F.count("*").cast("long").alias("n_hits"))
    )
    n_sh = F.coalesce("n_sh", F.lit(0)).cast("long")
    ratio = F.round(
        F.coalesce("n_hits", F.lit(0)) / F.greatest(n_sh, F.lit(1)).cast("double"), 4
    )
    # anchor on the DOCS spine, not the shingle aggregation: a doc with
    # fewer than k tokens has zero shingles and would otherwise vanish from
    # the output entirely — a caller using `contaminated` as a keep-list
    # would silently drop every short document (ADVICE r4).
    return (
        corpus.select("doc_id")
        .join(sizes, "doc_id", "left")
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            n_sh.alias("n_sh"),
            F.coalesce("n_hits", F.lit(0)).cast("long").alias("n_hits"),
            ratio.alias("hit_ratio"),
            (ratio >= F.lit(flag_ratio)).alias("contaminated"),
        )
    )


def unigram_logprob(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """EXT-05 (corpus-LM quality score): per document, the mean natural-log
    probability of its tokens under the corpus's own unigram distribution —
    the KenLM-shaped "how typical is this text" heuristic (CCNet,
    Wenzek et al. 2020 buckets on exactly this kind of LM score; a real
     5-gram KenLM swaps into the same plan). Low scores flag gibberish /
    rare-token soup; high scores flag boilerplate.

    Output: (doc_id, n_tok, avg_logp rounded to 4) — docs with zero tokens
    score 0.0 via the spine join, never vanish.

    Plan: tokens explode once; the unigram table is ONE partial-aggregated
    groupBy(term); corpus total token count rides along as a window-less
    broadcast (scalar subquery shape: sum over the term table, which is
    vocabulary-sized, not corpus-sized). The per-token logp join is keyed
    by term — hot terms are exactly the rows AQE's skew-join splits — and
    the per-doc mean partial-aggregates map-side. Two shuffles total
    (term agg, doc agg) at any corpus size.
    """
    toked = _with_tokens(docs, id_col, text_col)
    toks = (
        toked.select("doc_id", F.explode("__toks").alias("term"))
    )
    freqs = toks.groupBy("term").agg(F.count("*").alias("tf"))
    # vocabulary-sized scalar: total tokens = sum of term frequencies
    total = freqs.agg(F.sum("tf").cast("double").alias("__total"))
    logp = (
        toks.join(F.broadcast(total))  # bounded: 1-row scalar total
        .join(freqs, "term")
        .select("doc_id", F.log(F.col("tf") / F.col("__total")).alias("lp"))
    )
    spine = docs.select(F.col(id_col).alias("doc_id"))
    agg = logp.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_tok"),
        F.round(F.avg("lp"), 4).alias("avg_logp"),
    )
    return spine.join(agg, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_tok", F.lit(0)).cast("long").alias("n_tok"),
        F.coalesce("avg_logp", F.lit(0.0)).alias("avg_logp"),
    )


def bm25_topk(
    docs: DataFrame,
    query_terms: tuple[str, ...],
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
    top_k: int = 20,
) -> DataFrame:
    """EXT-05 text retrieval: Okapi BM25 ranking of documents against a
    fixed query-term set (Robertson & Zaragoza 2009, the Lucene-default
    ``ln(1 + (N - df + 0.5)/(df + 0.5))`` idf form) — the lexical
    counterpart of the EXT-03 embedding kNN tiers, and the scorer a
    retrieval-augmented data pipeline runs over its corpus index.

    Output: top ``top_k`` (doc_id, score, rk) by (score DESC, doc_id) —
    only documents containing ≥1 query term are candidates, as in any
    inverted-index engine.

    Plan: the query-term filter is a broadcast literal isin pushed into
    the token explode, so the expensive per-(doc,term) aggregation only
    sees query-term hits (≈ |q|/|vocab| of the corpus token volume);
    document lengths partial-aggregate in the same pass over the full
    token stream; N, avgdl, and the per-term df ride as broadcast scalars
    / a term-count map (all bounded by |q| and the doc count, never by
    corpus tokens). One doc-keyed shuffle for the final sum + global
    top-k. Scores round to 4dp so cross-engine double-summation order
    cannot flip a rank."""
    toked = _with_tokens(docs, id_col, text_col)
    terms = toked.select("doc_id", F.explode("__toks").alias("term"))
    dl = terms.groupBy("doc_id").agg(F.count("*").cast("double").alias("dl"))
    tf = (
        terms.filter(F.col("term").isin(*query_terms))
        .groupBy("doc_id", "term")
        .agg(F.count("*").cast("double").alias("tf"))
    )
    df_ = tf.groupBy("term").agg(F.count("*").cast("double").alias("df"))
    scalars = dl.agg(
        F.count("*").cast("double").alias("n_docs"),
        F.avg("dl").alias("avgdl"),
    )
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    per_term = (
        tf.join(F.broadcast(df_), "term")  # bounded: <= |query_terms| rows (tf is pre-filtered to the query)
        .join(F.broadcast(scalars))
        .join(dl, "doc_id")
        .select(
            "doc_id",
            (
                idf
                * (F.col("tf") * (k1 + 1.0))
                / (F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl")))
            ).alias("s"),
        )
    )
    # distributed partial top-k (TakeOrdered) FIRST — an unpartitioned
    # row_number window would funnel every candidate doc into one reducer;
    # the rank window then runs over only the k survivors
    topk = (
        per_term.groupBy("doc_id")
        .agg(F.round(F.sum("s"), 4).alias("score"))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(top_k)
    )
    w = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    return topk.withColumn("rk", F.row_number().over(w).cast("long"))


def _bpe_apply_merge(syms: Column, a: str, b: str) -> Column:
    """One BPE merge applied to a symbol array: the left-to-right greedy
    fold — if the accumulated tail is ``a`` and the next symbol is ``b``,
    collapse them to ``a+b``; the merged symbol never re-merges with the
    element that produced it (non-overlapping by construction: 'aaa'
    under (a,a) → [aa, a]). JVM-side ``aggregate`` HOF, no Python."""
    ab = F.lit(a + b)
    return F.aggregate(
        syms,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) >= 1) & (F.element_at(acc, -1) == F.lit(a)) & (x == F.lit(b)),
            F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(ab)),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def _bpe_train(
    docs: DataFrame, id_col: str, text_col: str, iters: int
) -> tuple[list[tuple[int, str, str, int]], DataFrame]:
    """The shared count → argmax → apply training loop: returns the
    learned ``(rk, lhs, rhs, count)`` merges and the post-training
    weighted symbol vocabulary (persisted via the drainable registry)."""
    from .dedup import _persist

    toked = _with_tokens(docs, id_col, text_col)
    words = (
        toked.select(F.explode(F.col("__toks")).alias("w"))
        .filter((F.col("w") != "") & F.col("w").rlike("^[!-~]+$"))
        .groupBy("w")
        .agg(F.count("*").cast("long").alias("n"))
    )
    vocab = _persist(
        words.select(
            F.transform(
                F.sequence(F.lit(1), F.length("w")),
                lambda i: F.col("w").substr(i, F.lit(1)),
            ).alias("s"),
            "n",
        )
    )
    merges: list[tuple[int, str, str, int]] = []
    for rk in range(1, iters + 1):
        sz = F.size("s")
        pairs = vocab.filter(sz >= 2).select(
            F.explode(
                F.arrays_zip(
                    F.slice("s", 1, sz - 1).alias("a"),
                    F.slice(F.col("s"), 2, sz - 1).alias("b"),
                )
            ).alias("p"),
            "n",
        )
        best = (
            pairs.groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
            .agg(F.sum("n").cast("long").alias("c"))
            .orderBy(F.desc("c"), F.asc("a"), F.asc("b"))
            .limit(1)
            .collect()
        )
        if not best:
            break
        a, b, c = best[0]["a"], best[0]["b"], int(best[0]["c"])
        merges.append((rk, a, b, c))
        vocab = _persist(vocab.select(_bpe_apply_merge(F.col("s"), a, b).alias("s"), "n"))
    return merges, vocab


def bpe_train_merges(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", iters: int = 3
) -> DataFrame:
    """ITERATIVE BPE tokenizer training (Sennrich et al. 2016): learn
    ``iters`` merges over the word vocabulary — x44 is one iteration's
    COUNTING step; this runs the full count → argmax → apply loop and
    proves the merges were applied (the rank-0 row is the post-training
    distinct-symbol count, which only comes out right if every fold ran).

    Output: (rk, lhs, rhs, n) — merge ranks 1..iters with their pair
    counts, plus rank 0 carrying the final symbol-vocabulary size.

    Scale shape: the loop state is the weighted WORD vocabulary (|V|
    rows, not corpus tokens — one explode+groupBy builds it, after which
    the corpus is never rescanned), persisted and re-folded per
    iteration like PageRank's score table. Each iteration is one
    partial-aggregable pair-count shuffle over |V| rows and ONE 1-row
    driver collect (the argmax — O(1) driver state by contract, the same
    bounded-collect pattern as the k-means centroid step). Words are
    restricted to printable-ASCII so the chr(31)-delimited DuckDB oracle
    fold (list_reduce) is byte-safe."""
    merges, vocab = _bpe_train(docs, id_col, text_col, iters)
    return bpe_merges_output(docs.sparkSession, merges, vocab)


def bpe_merges_output(spark, merges, vocab: DataFrame) -> DataFrame:
    """The x80 output shape from an already-run training: merge rows +
    the rank-0 post-training distinct-symbol count. Split out so a suite
    can run the deterministic training ONCE and derive both the train
    and encode outputs from it (review r6: x84 trained twice)."""
    merge_rows = spark.createDataFrame(
        merges, "rk long, lhs string, rhs string, n long"
    )
    vocab_row = (
        vocab.select(F.explode("s").alias("t"))
        .agg(F.count_distinct("t").cast("long").alias("n"))
        .select(
            F.lit(0).cast("long").alias("rk"),
            F.lit(None).cast("string").alias("lhs"),
            F.lit(None).cast("string").alias("rhs"),
            "n",
        )
    )
    return merge_rows.unionByName(vocab_row)


def bpe_encode_topk(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    iters: int = 3,
    k: int = 50,
) -> DataFrame:
    """The ENCODE side of BPE: train ``iters`` merges (same loop as
    :func:`bpe_train_merges`), then count the resulting subword symbols
    corpus-wide and return the top ``k`` — "token counting with a learned
    BPE tokenizer" as one operator. Because the vocabulary carries word
    frequencies, the corpus-wide symbol counts are an explode + one
    partial-aggregable shuffle over |V| rows, never a second corpus
    scan; the top-k is orderBy+limit (TakeOrderedAndProject) with the
    rank window applied only to the k survivors (see
    :func:`bpe_encode_output`)."""
    _, vocab = _bpe_train(docs, id_col, text_col, iters)
    return bpe_encode_output(vocab, k)


def bpe_encode_output(vocab: DataFrame, k: int = 50) -> DataFrame:
    """The x81 output shape from an already-trained vocabulary: symbol
    counts, global top-k first via orderBy+limit (TakeOrderedAndProject —
    the x53 pattern; an unpartitioned row_number window would funnel every
    symbol row into one reducer before any got filtered), THEN the rank
    window over just the k survivors."""
    counts = (
        vocab.select(F.explode("s").alias("sym"), "n")
        .groupBy("sym")
        .agg(F.sum("n").cast("long").alias("n"))
    )
    topk = counts.orderBy(F.desc("n"), F.asc("sym")).limit(k)
    return topk.withColumn(
        "rk",
        F.row_number().over(Window.orderBy(F.desc("n"), F.asc("sym"))).cast("long"),
    ).select("sym", "n", "rk")


def bigram_logprob(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """EXT-05 (conditional-LM quality score): per document, the mean
    natural-log probability of its token *bigrams* under the corpus's own
    add-1-smoothed bigram model — ``ln((c(w1,w2) + 1) / (c(w1·) + V))``
    with ``c(w1·)`` the context count (bigrams starting at w1) and ``V``
    the corpus vocabulary size. The conditional complement to
    :func:`unigram_logprob`: a doc of common words in improbable ORDER
    (shuffled text, keyword-stuffed spam) scores near the unigram model
    but far below the bigram model.

    Output: (doc_id, n_bigram, avg_logp rounded to 4); docs with < 2
    tokens score 0.0 via the spine join.

    Plan: the bigram list is a higher-order ``transform`` over the bound
    token array (no second tokenize), exploded once; the model is two
    partial-aggregated groupBys (pair counts, context counts) plus a
    1-row vocabulary scalar (broadcast). The per-occurrence join is keyed
    by (w1, w2) / w1 — hot contexts are what AQE's skew-join splits. Three
    shuffles total (pair agg, context agg, doc agg) at any corpus size.
    """
    toked = _with_tokens(docs, id_col, text_col)
    pairs = F.when(
        F.size("__toks") >= 2,
        # sequence(0, size-2) would DESCEND for size < 2 (Spark generates
        # decreasing sequences when stop < start) — hence the guard
        F.expr(
            "transform(sequence(0, size(__toks) - 2),"
            " i -> struct(__toks[i] AS w1, __toks[i + 1] AS w2))"
        ),
    ).otherwise(F.expr("array()"))
    bg = toked.select("doc_id", F.explode(pairs).alias("bg")).select(
        "doc_id", "bg.w1", "bg.w2"
    )
    c12 = bg.groupBy("w1", "w2").agg(F.count("*").alias("c12"))
    c1 = bg.groupBy("w1").agg(F.count("*").alias("c1"))
    vocab = (
        toked.select(F.explode("__toks").alias("term"))
        .agg(F.count_distinct("term").alias("__v"))
    )
    lp = (
        bg.join(c12, ["w1", "w2"])
        .join(c1, "w1")
        .join(F.broadcast(vocab))  # bounded: BPE vocab <= base symbols + merge budget
        .select(
            "doc_id",
            F.log(
                (F.col("c12") + F.lit(1)).cast("double")
                / (F.col("c1") + F.col("__v")).cast("double")
            ).alias("lp"),
        )
    )
    agg = lp.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_bigram"),
        F.round(F.avg("lp"), 4).alias("avg_logp"),
    )
    spine = docs.select(F.col(id_col).alias("doc_id"))
    return spine.join(agg, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_bigram", F.lit(0)).cast("long").alias("n_bigram"),
        F.coalesce("avg_logp", F.lit(0.0)).alias("avg_logp"),
    )


def char_entropy(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """EXT-05 (character-distribution quality signal): per document, the
    Shannon entropy of the normalized text's character distribution —
    near-zero entropy flags repeated-character junk, unusually high
    entropy flags base64/hex blobs; both are standard pre-training
    filters (Gopher's symbol-ratio family, Rae et al. 2021).

    Uses the algebraic form ``H = ln(n) − (Σ c·ln c)/n`` so ONE aggregate
    pass over the (doc, char) counts suffices — no second join to bring
    the total back per row.

    Output: (doc_id, n_chars, n_distinct_chars, entropy rounded to 4);
    empty/NULL docs score 0 via the spine join.

    Plan: character positions explode via ``sequence(1, length(t))`` (the
    same total-character row count every term-frequency operator already
    pays), the (doc, char) groupBy partial-aggregates map-side to ≤
    |alphabet| rows per doc per task, and the doc-level rollup is the
    second and last shuffle.
    """
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        normalize_text_native(F.coalesce(F.col(text_col), F.lit(""))).alias("__t"),
    )
    # r13: split('') yields exactly one element per character (verified
    # identical to the former substr(__t, i, 1) walk incl. supplementary
    # chars; the empty string never reaches it thanks to the length
    # filter) — one O(n) pass instead of an O(n) substr per position,
    # which is quadratic per document on UTF8String. Measured at sf0.1:
    # 2.9s → 1.0s warm. (A parallelism floor on this pass was also A/B'd
    # and LOST — 1.45 vs 1.01 median — the BMP-floor economics: the
    # remaining per-char work is too cheap to pay an extra exchange.)
    chars = (
        base.filter(F.length("__t") > 0)
        .select("doc_id", F.explode(F.split("__t", "")).alias("ch"))
    )
    counts = chars.groupBy("doc_id", "ch").agg(F.count("*").alias("cnt"))
    agg = counts.groupBy("doc_id").agg(
        F.sum("cnt").cast("long").alias("n_chars"),
        F.count("*").cast("long").alias("n_distinct_chars"),
        F.sum(F.col("cnt").cast("double") * F.log(F.col("cnt").cast("double"))).alias("__s"),
    )
    spine = docs.select(F.col(id_col).alias("doc_id"))
    return spine.join(agg, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_chars", F.lit(0)).cast("long").alias("n_chars"),
        F.coalesce("n_distinct_chars", F.lit(0)).cast("long").alias("n_distinct_chars"),
        F.coalesce(
            F.round(
                F.log(F.col("n_chars").cast("double")) - F.col("__s") / F.col("n_chars"),
                4,
            ),
            F.lit(0.0),
        ).alias("entropy"),
    )


def zlib_ratio(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", level: int = 6
) -> DataFrame:
    """EXT-05 (compression-ratio boilerplate signal): per document, the
    DEFLATE-compressed size of the UTF-8 text next to its raw size, and
    the integer ratio ``1000·zlib_bytes div raw_bytes`` — highly
    compressible docs are template/boilerplate repeats, incompressible
    ones are random blobs; both tails get filtered in production corpus
    curation (RefinedWeb, Penedo et al. 2023 uses exactly this signal).

    This is a deliberate Python-tier operator (zlib is a C library with
    no JVM-expression equivalent): Arrow-batched ``mapInPandas`` over
    only (id, text), one row out per row in, no shuffle at all — the
    plan is scan → MapInPandas → project, embarrassingly parallel at any
    scale. All outputs are integers (byte counts), so results are exact
    and engine-deterministic for a fixed zlib; there is no SQL oracle
    (DuckDB cannot DEFLATE), making this a rows-only registry entry —
    the value-level pin lives in tests/test_order_stats.py against
    locally computed ground truth.
    """
    import pandas as pd  # noqa: F401 — signals the pandas requirement

    out_schema = (
        f"{id_col} long, raw_bytes long, zlib_bytes long, ratio_milli long"
    )

    def compress(batches):
        import zlib

        import pandas as pd

        for pdf in batches:
            raw = [
                (t if isinstance(t, str) else "").encode("utf-8")
                for t in pdf[text_col]
            ]
            rb = [len(b) for b in raw]
            zb = [len(zlib.compress(b, level)) for b in raw]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "raw_bytes": rb,
                    "zlib_bytes": zb,
                    "ratio_milli": [
                        (1000 * z) // r if r else 0 for z, r in zip(zb, rb)
                    ],
                }
            )

    return docs.select(id_col, text_col).mapInPandas(compress, out_schema)


def pmi_collocations(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_count: int = 5,
    k: int = 30,
) -> DataFrame:
    """Top-k collocations by bigram frequency, annotated with pointwise
    LIFT — p(w1,w2) / (p(w1)·p(w2)), the exponential of PMI (EXT-05):
    the phrase-mining step that finds multi-word units ("new york",
    "machine learning") a unigram tokenizer treats as independent —
    input to phrase-aware vocabularies and stop-phrase lists.

    Cross-engine float discipline: all counts are exact int64 sums; the
    lift is ONE deterministic IEEE expression over six exact integers
    (c12·N1² / (N12·c1·c2), each factor cast to double, rounded to 4) —
    no transcendental anywhere (ranking is by the integer count with
    text tiebreak, never by the float), so the driver hash is safe by
    construction rather than by ln-ulp luck.

    Plan: bigrams ride the bound token array (one tokenize), then two
    partial-aggregated groupBys (pair, unigram) + two broadcast-sized
    scalar totals; the top-k is a TakeOrderedAndProject and is itself
    the broadcast build side (<= k rows) of both count-lookup joins —
    the vocabulary-sized c1/c2 tables are only ever streamed, never
    built, so the plan survives an unbounded vocabulary. Three shuffles
    at any corpus size.

    Returns ``(rk, w1, w2, c12, lift)``."""
    toked = _with_tokens(docs, id_col, text_col)
    pairs = F.when(
        F.size("__toks") >= 2,
        F.expr(
            "transform(sequence(0, size(__toks) - 2),"
            " i -> struct(__toks[i] AS w1, __toks[i + 1] AS w2))"
        ),
    ).otherwise(F.expr("array()"))
    bg = toked.select(F.explode(pairs).alias("bg")).select("bg.w1", "bg.w2")
    uni = toked.select(F.explode("__toks").alias("w"))
    c12 = bg.groupBy("w1", "w2").agg(F.count("*").cast("long").alias("c12"))
    c1 = uni.groupBy(F.col("w").alias("w1")).agg(
        F.count("*").cast("long").alias("c1")
    )
    c2 = uni.groupBy(F.col("w").alias("w2")).agg(
        F.count("*").cast("long").alias("c2")
    )
    n1 = uni.agg(F.count("*").cast("long").alias("n1"))
    n12 = bg.agg(F.count("*").cast("long").alias("n12"))
    top = (
        c12.filter(F.col("c12") >= min_count)
        .sort(F.desc("c12"), F.asc("w1"), F.asc("w2"))
        .limit(k)
    )
    # bounded: `top` is exactly <= k rows (LIMIT k above) — it is the ONLY
    # broadcast-able side here.  c1/c2 are vocabulary-sized (unbounded at
    # 100 TB) and must stay the streamed probe side, never the build side.
    # Each join emits <= k rows, so the second join's build side is again
    # <= k rows.
    ranked = c2.join(F.broadcast(c1.join(F.broadcast(top), "w1")), "w2")  # bounded: <= k-row top (see block comment above)
    wr = Window.orderBy(F.desc("c12"), F.asc("w1"), F.asc("w2"))
    return (
        ranked.join(F.broadcast(n1))  # bounded: 1-row scalar total
        .join(F.broadcast(n12))
        .select(
            F.row_number().over(wr).cast("long").alias("rk"),
            "w1", "w2", "c12",
            F.round(
                (
                    F.col("c12").cast("double")
                    * F.col("n1").cast("double")
                    * F.col("n1").cast("double")
                )
                / (
                    F.col("n12").cast("double")
                    * F.col("c1").cast("double")
                    * F.col("c2").cast("double")
                ),
                4,
            ).alias("lift"),
        )
    )


def pmi_collocations_sql(
    toks_cte: str, min_count: int = 5, k: int = 30
) -> str:
    """DuckDB oracle for :func:`pmi_collocations`; ``toks_cte`` must be
    the shared tokenize CTE body yielding ``(doc_id, w)`` with ``w`` the
    token ARRAY (the _TOKS_CTE convention)."""
    return f"""WITH {toks_cte},
bg AS (SELECT u.pair[1] AS w1, u.pair[2] AS w2
       FROM toks, UNNEST(list_transform(range(1, len(w)),
                                        i -> [w[i], w[i + 1]])) AS u(pair)),
uni AS (SELECT u.term AS w FROM toks, UNNEST(w) AS u(term)),
c12 AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c12 FROM bg GROUP BY 1, 2),
c1 AS (SELECT w AS w1, CAST(count(*) AS BIGINT) AS c1 FROM uni GROUP BY 1),
c2 AS (SELECT w AS w2, CAST(count(*) AS BIGINT) AS c2 FROM uni GROUP BY 1),
n1 AS (SELECT CAST(count(*) AS BIGINT) AS n1 FROM uni),
n12 AS (SELECT CAST(count(*) AS BIGINT) AS n12 FROM bg),
top AS (SELECT * FROM c12 WHERE c12 >= {min_count}
        ORDER BY c12 DESC, w1, w2 LIMIT {k})
SELECT CAST(row_number() OVER (ORDER BY c12 DESC, w1, w2) AS BIGINT) AS rk,
       w1, w2, c12,
       round((CAST(c12 AS DOUBLE) * CAST(n1 AS DOUBLE) * CAST(n1 AS DOUBLE))
             / (CAST(n12 AS DOUBLE) * CAST(c1 AS DOUBLE) * CAST(c2 AS DOUBLE)),
             4) AS lift
FROM top JOIN c1 USING (w1) JOIN c2 USING (w2), n1, n12"""


def vocab_richness(
    docs: DataFrame,
    group_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-source vocabulary-richness profile (EXT-05): token count,
    EXACT type (distinct-term) count, hapax-legomena count (terms
    occurring exactly once in the source) and the two classic integer
    ratios — type/token and hapax/type in ppm. Template-generated or
    boilerplate-heavy sources show collapsed type/token and hapax
    shares next to natural text; the lexical-diversity screen beside
    x127's length-shape drift and x64's per-term odds.

    All counts are exact int64; the ratios are exact integer divisions
    (1e6·a div b), so the row is hash-stable by construction.

    Plan: one tokenize pass, ONE (source, term) partial-aggregated
    groupBy of the token stream — the same full-vocabulary shuffle any
    term statistic pays, map-side combined — then a |vocab|→|sources|
    aggregate. No joins, no windows.

    Returns ``(source, n_terms, n_types, n_hapax, ttr_ppm, hapax_ppm)``."""
    toked = _with_tokens(docs, id_col, text_col, extra=[group_col, text_col])
    tf = (
        toked.select(F.col(group_col).alias("g"), F.explode("__toks").alias("term"))
        .groupBy("g", "term")
        .agg(F.count("*").cast("long").alias("c"))
    )
    return (
        tf.groupBy(F.col("g").alias(group_col))
        .agg(
            F.sum("c").cast("long").alias("n_terms"),
            F.count("*").cast("long").alias("n_types"),
            F.sum(F.when(F.col("c") == 1, 1).otherwise(0))
            .cast("long")
            .alias("n_hapax"),
        )
        .select(
            group_col, "n_terms", "n_types", "n_hapax",
            F.expr("CAST((1000000 * n_types) DIV n_terms AS BIGINT)")
            .alias("ttr_ppm"),
            F.expr("CAST((1000000 * n_hapax) DIV n_types AS BIGINT)")
            .alias("hapax_ppm"),
        )
    )


def vocab_richness_sql(group_col: str = "source") -> str:
    """DuckDB oracle for :func:`vocab_richness` over the documents
    table (inlines the shared normalization)."""
    from ..extension_queries import NORM_SQL  # shared normalize recipe

    return f"""WITH toked AS (SELECT {group_col} AS g,
                     string_split({NORM_SQL}, ' ') AS w
              FROM documents),
tf AS (SELECT g, u.term, CAST(count(*) AS BIGINT) AS c
       FROM toked, UNNEST(w) AS u(term) GROUP BY g, u.term),
acc AS (SELECT g, CAST(sum(c) AS BIGINT) AS n_terms,
               CAST(count(*) AS BIGINT) AS n_types,
               CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_hapax
        FROM tf GROUP BY g)
SELECT g AS {group_col}, n_terms, n_types, n_hapax,
       (1000000 * n_types) // n_terms AS ttr_ppm,
       (1000000 * n_hapax) // n_types AS hapax_ppm
FROM acc"""


#: Zipf probe ranks: frequency is compared at rank r vs rank 2r for each
#: power of two — under a Zipf law with exponent s, f(2r)/f(r) = 2^-s
#: (≈ 500 milli at s = 1) at EVERY r, so the profile doubles as both the
#: slope estimate and the goodness-of-fit check with zero logarithms.
ZIPF_PROBE_RANKS = (1, 2, 4, 8, 16, 32, 64, 128, 256, 512)


def zipf_doubling_profile(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Zipf rank-frequency doubling profile of the corpus vocabulary
    (EXT-05): the term-frequency ratio f(2r)/f(r) in integer milli at
    each power-of-two rank r ≤ 512 — natural language sits near 500
    milli across the whole profile (Zipf s ≈ 1); template/generated text
    collapses the head (ratios → 1000) or the tail. The corpus-level
    complement to x132's per-source richness, with the log-log
    regression replaced by exact integer ratios (no transcendental
    anywhere, hash-stable by construction).

    Plan: one map-side-combined term count (the standard vocabulary
    shuffle), then a distributed TakeOrdered top-1024 by (count DESC,
    term ASC) — the only rows that can hold ranks ≤ 1024 — so the rank
    window runs on a 1024-row bounded frame, never the vocabulary. The
    probe join is rank = 2·rank on two ≤10-row filters of that frame.

    Returns ``(rk, term, f_r, f_2r, ratio_milli)`` for each probe rank
    present in the vocabulary."""
    toked = _with_tokens(docs, id_col, text_col)
    counts = (
        toked.select(F.explode("__toks").alias("term"))
        .groupBy("term")
        .agg(F.count("*").cast("long").alias("f"))
    )
    top = counts.sort(F.desc("f"), F.asc("term")).limit(1024)
    w = Window.orderBy(F.desc("f"), F.asc("term"))
    ranked = top.select(
        "term", "f", F.row_number().over(w).cast("long").alias("rk")
    )
    probes = ranked.filter(F.col("rk").isin(*ZIPF_PROBE_RANKS))
    doubled = (
        ranked.filter(F.col("rk") % 2 == 0)
        .select(
            F.expr("rk DIV 2").cast("long").alias("rk"),
            F.col("f").alias("f2"),
        )
        .filter(F.col("rk").isin(*ZIPF_PROBE_RANKS))
    )
    # bounded: both sides are <= |ZIPF_PROBE_RANKS| rows
    return (
        probes.join(F.broadcast(doubled), "rk")
        .select(
            "rk", "term", F.col("f").alias("f_r"), F.col("f2").alias("f_2r"),
            F.expr("CAST((1000 * f2) DIV f AS BIGINT)").alias("ratio_milli"),
        )
    )


def zipf_doubling_profile_sql(toks_cte: str) -> str:
    """DuckDB oracle for :func:`zipf_doubling_profile`; ``toks_cte``
    must be the shared tokenize CTE (the _TOKS_CTE convention)."""
    ranks = ", ".join(str(r) for r in ZIPF_PROBE_RANKS)
    return f"""WITH {toks_cte},
counts AS (SELECT u.term, CAST(count(*) AS BIGINT) AS f
           FROM toks, UNNEST(w) AS u(term) GROUP BY u.term),
top AS (SELECT term, f FROM counts ORDER BY f DESC, term LIMIT 1024),
ranked AS (SELECT term, f,
                  CAST(row_number() OVER (ORDER BY f DESC, term) AS BIGINT)
                  AS rk
           FROM top),
probes AS (SELECT * FROM ranked WHERE rk IN ({ranks})),
doubled AS (SELECT rk // 2 AS rk, f AS f2 FROM ranked
            WHERE rk % 2 = 0 AND rk // 2 IN ({ranks}))
SELECT p.rk, p.term, p.f AS f_r, d.f2 AS f_2r,
       (1000 * d.f2) // p.f AS ratio_milli
FROM probes p JOIN doubled d USING (rk)"""


#: split thresholds in per-mille of the hash space: train < 980,
#: val < 990, test otherwise — the standard 98/1/1 training split.
SPLIT_PERMILLE = (("train", 980), ("val", 990))


#: Curriculum boundaries: quartiles of the quality score (4 phases).
CURRICULUM_QS = (0.25, 0.50, 0.75)


def curriculum_phases(
    manifest: DataFrame,
    quality_col: str = "quality",
    id_col: str = "doc_id",
) -> DataFrame:
    """EXT-05 (curriculum ordering): assign each curated document a
    training phase 1..4 by quality quartile — the easy→hard (or
    low→high-quality-last) schedule curriculum-learning data loaders
    consume. Boundaries are exact discrete percentiles (the p2
    cum-count device: p_q = min v with cum ≥ floor(q·(n−1)) + 1), so
    the assignment is deterministic and oracle-exact; phase = 1 + the
    number of boundaries strictly below the doc's quality.

    Plan (the scalable 2-pass shape, NOT a global ntile): pass 1 groups
    by quality VALUE (bounded by score granularity, ~10⁴ distinct at
    any corpus scale) and runs the cumulative window on that tiny
    value-grouped frame; pass 2 is a row-local CASE against the 1-row
    broadcast boundary frame. A global ntile/row_number would funnel
    the corpus through one partition — this never does.

    Returns ``(doc_id, quality, phase)``."""
    from .dedup import _persist

    surv = _persist(
        manifest.select(
            F.col(id_col).alias("doc_id"), F.col(quality_col).alias("quality")
        )
    )
    c = surv.groupBy("quality").agg(F.count("*").alias("cnt"))
    w = c.select(
        F.col("quality").alias("v"),
        F.sum("cnt").over(Window.orderBy("quality")).alias("cum"),
        F.sum("cnt").over(Window.partitionBy()).alias("n"),
    )
    b = w.agg(
        *[
            F.min(
                F.when(
                    F.col("cum") >= F.floor(F.lit(q) * (F.col("n") - 1)) + 1,
                    F.col("v"),
                )
            ).alias(f"p{int(q * 100)}")
            for q in CURRICULUM_QS
        ]
    )
    phase = (
        F.lit(1)
        + (F.col("quality") > F.col("p25")).cast("long")
        + (F.col("quality") > F.col("p50")).cast("long")
        + (F.col("quality") > F.col("p75")).cast("long")
    ).cast("long")
    # bounded: the boundary frame is exactly 1 row (three quantile scalars)
    return surv.crossJoin(F.broadcast(b)).select(
        "doc_id", "quality", phase.alias("phase")
    )


def curriculum_phases_sql(manifest_cte: str = "c1m") -> str:
    """DuckDB oracle twin of :func:`curriculum_phases` over a CTE named
    ``manifest_cte`` yielding (doc_id, quality)."""
    bs = ",\n             ".join(
        f"min(CASE WHEN cum >= floor({q} * (n - 1)) + 1 THEN v END)"
        f" AS p{int(q * 100)}"
        for q in CURRICULUM_QS
    )
    return f"""c AS (SELECT quality AS v, count(*) AS cnt FROM {manifest_cte}
       GROUP BY 1),
w AS (SELECT v, sum(cnt) OVER (ORDER BY v) AS cum,
             sum(cnt) OVER () AS n
      FROM c),
b AS (SELECT {bs}
      FROM w)
SELECT m.doc_id, m.quality,
       CAST(1 + (CASE WHEN m.quality > b.p25 THEN 1 ELSE 0 END)
              + (CASE WHEN m.quality > b.p50 THEN 1 ELSE 0 END)
              + (CASE WHEN m.quality > b.p75 THEN 1 ELSE 0 END)
            AS BIGINT) AS phase
FROM {manifest_cte} m, b"""


def split_assign(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """``docs`` plus a deterministic ``split`` column — the per-document
    half of :func:`split_manifest` (h = first 8 md5 hex chars of
    ``id:':split'`` as int64, h mod 1000 vs :data:`SPLIT_PERMILLE`).
    Split out (r9) so the composed pretraining pipeline (c7) can FILTER
    on the assignment while the manifest keeps aggregating over it —
    one hash definition, two consumers. Row-local, zero shuffle."""
    from .reconcile import hex_chunk

    h = hex_chunk(
        F.md5(F.concat(F.col(id_col).cast("string"), F.lit(":split"))), 1
    )
    frac = h % 1000
    split = F.lit("test")
    for name, bound in reversed(SPLIT_PERMILLE):
        split = F.when(frac < bound, F.lit(name)).otherwise(split)
    return docs.withColumn("split", split)


def split_case_sql(id_expr: str = "doc_id") -> str:
    """The DuckDB ``CASE`` expression mirroring :func:`split_assign` —
    shared by :func:`split_manifest_sql` and the c7 pipeline oracle so
    the split rule exists once per engine."""
    from .reconcile import hex_chunk_sql

    h = hex_chunk_sql(f"md5(CAST({id_expr} AS VARCHAR) || ':split')", 1)
    cases = " ".join(
        f"WHEN ({h}) % 1000 < {bound} THEN '{name}'"
        for name, bound in SPLIT_PERMILLE
    )
    return f"CASE {cases} ELSE 'test' END"


def split_manifest(
    docs: DataFrame,
    group_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Deterministic train/val/test split manifest (EXT-05 pipeline op):
    every document lands in exactly one split by pure hash arithmetic —
    h = first 8 md5 hex chars of ``id:':split'`` as int64, split by
    h mod 1000 against :data:`SPLIT_PERMILLE` — so the split is
    reproducible across runs, engines and cluster sizes with NO stored
    assignment table, and adding documents never reshuffles existing
    ones (the property a random split lacks). The manifest reports per
    (split, source) document and character counts — the leakage check
    ("is val drawn from the same source mix as train") reads straight
    off it.

    Plan: one row-local hash projection + one (split, source)
    map-side-combined aggregate; output is 3 × |sources| rows at any
    corpus scale.

    Returns ``(split, source, n_docs, n_chars)``."""
    return (
        split_assign(docs, id_col)
        .select(
            "split",
            F.col(group_col).alias("source"),
            F.length(F.col(text_col)).cast("long").alias("nc"),
        )
        .groupBy("split", "source")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("nc").cast("long").alias("n_chars"),
        )
    )


def split_manifest_sql(group_col: str = "source") -> str:
    """DuckDB oracle for :func:`split_manifest` over the documents
    table."""
    return f"""SELECT {split_case_sql()} AS split,
       {group_col} AS source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(length(text)) AS BIGINT) AS n_chars
FROM documents GROUP BY 1, 2"""


def rendezvous_assign(
    docs: DataFrame, n_shards: int = 16, id_col: str = "doc_id"
) -> DataFrame:
    """``docs`` plus the HRW ``shard`` column — the per-document half of
    :func:`rendezvous_shards` (argmax of md5(id '#' shard) as an in-row
    ``array_max`` over n_shards (hash, shard) structs). Split out (r9)
    so the composed pretraining pipeline (c7) can route documents while
    the balance report keeps aggregating — one assignment definition,
    two consumers. Row-local, zero row expansion, zero shuffle."""
    entries = F.array(
        *[
            F.struct(
                F.md5(
                    F.concat(F.col(id_col).cast("string"), F.lit(f"#{s}"))
                ).alias("h"),
                F.lit(s).cast("long").alias("s"),
            )
            for s in range(n_shards)
        ]
    )
    return docs.withColumn("shard", F.array_max(entries).getField("s"))


def rendezvous_assign_sql(table: str = "documents", n_shards: int = 16) -> str:
    """DuckDB ``(doc_id, shard)`` assignment mirroring
    :func:`rendezvous_assign` via the independent unnest+rank formulation
    (the :func:`rendezvous_shards_sql` pattern, parameterized by source
    table for the c7 pipeline oracle)."""
    return f"""SELECT doc_id, CAST(s AS BIGINT) AS shard FROM (
  SELECT t.doc_id, u.s AS s,
         row_number() OVER (
             PARTITION BY t.doc_id
             ORDER BY md5(CAST(t.doc_id AS VARCHAR) || '#'
                          || CAST(u.s AS VARCHAR)) DESC, u.s DESC) AS rn
  FROM {table} t, UNNEST(range({n_shards})) AS u(s)) WHERE rn = 1"""


def rendezvous_shards(
    docs: DataFrame,
    n_shards: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Rendezvous (highest-random-weight) shard assignment report
    (EXT-05 pipeline op, Thaler & Ravishankar 1998): each document goes
    to the shard with the largest md5(id '#' shard) — the consistent-
    hashing scheme whose property a mod-N split lacks: adding or
    removing ONE shard moves only ~1/N of documents, never reshuffles
    everything. The report is the per-shard doc/char balance a 100 TB
    writer checks before committing a layout.

    The argmax is ROW-LOCAL: an in-row array_max over n_shards
    (hash, shard) structs (lexicographic struct order = hash first,
    shard id as the deterministic tiebreak, mirrored exactly by the
    oracle's ORDER BY h DESC, s DESC) — zero row expansion, zero
    shuffle before the final ≤ n_shards-group aggregate.

    Returns ``(shard, n_docs, n_chars)``."""
    return (
        rendezvous_assign(docs, n_shards, id_col)
        .select(
            "shard",
            F.length(F.col(text_col)).cast("long").alias("nc"),
        )
        .groupBy("shard")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("nc").cast("long").alias("n_chars"),
        )
    )


def rendezvous_shards_sql(n_shards: int = 16) -> str:
    """DuckDB oracle for :func:`rendezvous_shards` over the documents
    table (explicit n_shards-way unnest + rank — a second, independent
    formulation of the same argmax)."""
    return f"""WITH cand AS (SELECT doc_id, length(text) AS nc, u.s AS s,
                     md5(CAST(doc_id AS VARCHAR) || '#'
                         || CAST(u.s AS VARCHAR)) AS h
              FROM documents, UNNEST(range({n_shards})) AS u(s)),
rk AS (SELECT *, row_number() OVER (PARTITION BY doc_id
                                    ORDER BY h DESC, s DESC) AS rn
       FROM cand)
SELECT CAST(s AS BIGINT) AS shard, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(nc) AS BIGINT) AS n_chars
FROM rk WHERE rn = 1 GROUP BY s"""


def seqlen_histogram(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """Sequence-length histogram at power-of-two buckets (EXT-05
    pipeline op, r9): per (source, bucket) — document count and token
    total, where bucket = number of binary digits of the token count
    (floor(log2 n)+1 for n ≥ 1; 1 for n = 0 since bin(0) = '0') — the
    integer-exact log2 bucketing both engines compute as
    length(bin(n)), no float log near the boundaries. This is the
    capacity-planning report behind :data:`PACK_CAPACITY`: which
    sources are long-tailed, how much of the token mass sits above the
    context window.

    Plan: row-local tokenize + bucket, one (source, bucket) map-side-
    combined aggregate; ≤ |sources| × 64 rows at any corpus scale."""
    toked = _with_tokens(docs, id_col, text_col, extra=[text_col, source_col])
    n_tok = F.size("__toks").cast("long")
    return (
        toked.select(
            F.col(source_col).alias("source"), n_tok.alias("n_tok")
        )
        .select(
            "source",
            F.length(F.expr("bin(n_tok)")).cast("long").alias("len_bucket"),
            "n_tok",
        )
        .groupBy("source", "len_bucket")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("n_tok").cast("long").alias("total_tok"),
        )
    )


def seqlen_histogram_sql(toks_cte: str) -> str:
    """DuckDB oracle for :func:`seqlen_histogram`; ``toks_cte`` must be
    the shared tokenize CTE (the _TOKS_CTE convention)."""
    return f"""WITH {toks_cte}
SELECT d.source,
       CAST(length(bin(CAST(len(w) AS BIGINT))) AS BIGINT) AS len_bucket,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(len(w)) AS BIGINT) AS total_tok
FROM toks JOIN documents d USING (doc_id)
GROUP BY 1, 2"""


def pack_utilization(
    packed: DataFrame,
    capacity: int = PACK_CAPACITY,
    group_cols: tuple[str, str] = ("split", "shard"),
) -> DataFrame:
    """Packing-efficiency report over a :func:`sequence_pack` layout
    (EXT-05 pipeline op, r9): per shard group — document count, total
    tokens, pack count (max end_pack + 1: packs are dense from 0 by the
    running-sum construction), fill rate in exact per-mille
    (1000·Σtok DIV (n_packs·capacity) — the padding-waste metric packing
    exists to minimize; the deficit vs 1000 is paid only in each group's
    LAST pack), and how many documents straddle a pack boundary (the
    cross-document attention-contamination count a trainer masks).

    One map-side-combined aggregate over the pack manifest; ≤ |splits| ×
    |shards| rows out at any corpus scale. Overflow bound: 1000·Σtok per
    group crosses int64 only past ~9·10¹⁵ tokens in ONE shard group
    (≈36 PB of text in one of 48 shards) — unreachable by 3+ orders at
    the 100 TB design point, unlike the x135 bound, which was reachable
    and is guarded."""
    agg = packed.groupBy(*group_cols).agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("n_tok").cast("long").alias("total_tok"),
        (F.max("end_pack") + 1).cast("long").alias("n_packs"),
        F.sum((F.col("end_pack") > F.col("start_pack")).cast("long"))
        .cast("long")
        .alias("n_straddlers"),
    )
    return agg.select(
        *group_cols,
        "n_docs",
        "total_tok",
        "n_packs",
        F.expr(f"1000 * total_tok DIV (n_packs * {capacity})").alias(
            "fill_permille"
        ),
        "n_straddlers",
    )


def pack_utilization_sql(packed_cte: str, capacity: int = PACK_CAPACITY) -> str:
    """DuckDB oracle for :func:`pack_utilization`; ``packed_cte`` is the
    SQL producing the (split, shard, n_tok, start_pack, end_pack) pack
    manifest (e.g. the c7 pipeline oracle)."""
    return f"""SELECT split, shard, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_tok) AS BIGINT) AS total_tok,
       CAST(max(end_pack) + 1 AS BIGINT) AS n_packs,
       1000 * CAST(sum(n_tok) AS BIGINT)
           // (CAST(max(end_pack) + 1 AS BIGINT) * {capacity}) AS fill_permille,
       CAST(sum(CASE WHEN end_pack > start_pack THEN 1 ELSE 0 END) AS BIGINT)
           AS n_straddlers
FROM ({packed_cte}) GROUP BY split, shard"""


def split_leakage(
    docs: DataFrame,
    shingles: DataFrame,
    split_col: str = "split",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Cross-split contamination report (EXT-01/02/05 pipeline op, r9):
    for every ordered split pair — the count of distinct word-3-gram
    shingles present in BOTH splits' documents (the x40 decontaminate
    machinery turned inward: train→val leakage instead of corpus→
    benchmark), each split's distinct-shingle count, the shared share in
    exact per-mille of the smaller side, and the exact-duplicate count
    (matching md5(text) across the pair — zero by construction after an
    exact-dedup-then-split pipeline, which makes it the regression
    canary proving dedup ran BEFORE splitting).

    Plan: one distinct over (split, shingle) — the same shuffle class as
    the decontamination join — then ONE groupBy per key frame collecting
    the ≤|splits| split set and expanding ordered pairs row-locally
    (r12: replaced the key-equi self-joins, which exchanged each frame
    twice and sort-merged it against itself); the pair frame itself is
    ≤ C(|splits|,2) rows. The distinct shingle/fingerprint frames feed 2-3 consumers
    each and go through the tracked persist pool so the upstream chain
    (in x144: the whole c1 curation) is paid once, mirroring the
    oracle's MATERIALIZED CTEs. A split with NO shingles never appears in
    the per-split size frame, so its pairs are absent from the output
    entirely — identically in both engines (ADVICE r9: the least()==0
    guard in the per-mille expression is therefore defensive, not the
    path such splits take)."""
    import os

    from .dedup import _persist

    sp = docs.select(F.col(id_col).alias("doc_id"), F.col(split_col).alias("split"))
    ssh = _persist(
        shingles.join(sp, "doc_id")
        .select("split", "sh")
        .distinct()
    )
    sizes = ssh.groupBy("split").agg(F.count("*").cast("long").alias("n_sh"))
    pairs = (
        sizes.select(F.col("split").alias("split_a"), F.col("n_sh").alias("n_sh_a"))
        .join(
            F.broadcast(  # bounded: <= |splits| (3) rows — the per-split size frame
                sizes.select(
                    F.col("split").alias("split_b"), F.col("n_sh").alias("n_sh_b")
                )
            ),
            F.col("split_a") < F.col("split_b"),
        )
    )

    def _cross_split_counts(frame, key: str, out_col: str):
        """Count keys present in BOTH splits of each ordered pair.

        The r12 form: ONE exchange (groupBy key → sorted split set) + a
        row-local ≤C(|splits|,2) pair expansion + a tiny pair aggregate,
        replacing the key-equi self-join (TWO exchanges of the frame plus
        a sort-merge of it against itself). Identical result: the
        self-join emits exactly one row per (key, ordered split pair
        present), which is what the expansion of the per-key split set
        emits; ``sort_array`` orders by the same binary string comparison
        as the join's ``x.split < y.split``. ``MPS_X144_SELFJOIN=1``
        restores the self-join form for interleaved A/Bs."""
        if os.environ.get("MPS_X144_SELFJOIN"):
            return (
                frame.alias("x")
                .join(
                    frame.alias("y"),
                    (F.col(f"x.{key}") == F.col(f"y.{key}"))
                    & (F.col("x.split") < F.col("y.split")),
                )
                .groupBy(
                    F.col("x.split").alias("split_a"),
                    F.col("y.split").alias("split_b"),
                )
                .agg(F.count("*").cast("long").alias(out_col))
            )
        g = frame.groupBy(key).agg(
            F.sort_array(F.collect_set("split")).alias("__ss")
        )
        n = F.size(F.col("__ss"))
        expanded = F.flatten(
            F.transform(
                F.sequence(F.lit(1), n - 1),
                lambda i: F.transform(
                    F.sequence(i + 1, n),
                    lambda j: F.struct(
                        F.element_at(F.col("__ss"), i).alias("split_a"),
                        F.element_at(F.col("__ss"), j).alias("split_b"),
                    ),
                ),
            )
        )
        empty = F.array().cast(
            "array<struct<split_a:string,split_b:string>>"
        )
        return (
            g.select(
                F.explode(F.when(n >= 2, expanded).otherwise(empty)).alias("p")
            )
            .groupBy(
                F.col("p.split_a").alias("split_a"),
                F.col("p.split_b").alias("split_b"),
            )
            .agg(F.count("*").cast("long").alias(out_col))
        )

    shared = _cross_split_counts(ssh, "sh", "n_shared_sh")
    fps = _persist(
        docs.select(
            F.col(split_col).alias("split"), F.md5(F.col(text_col)).alias("fp")
        )
        .distinct()
    )
    fdup = _cross_split_counts(fps, "fp", "n_dup_fp")
    return (
        pairs.join(shared, ["split_a", "split_b"], "left")
        .join(fdup, ["split_a", "split_b"], "left")
        .select(
            "split_a",
            "split_b",
            F.coalesce("n_shared_sh", F.lit(0)).cast("long").alias("n_shared_sh"),
            "n_sh_a",
            "n_sh_b",
            F.when(F.least("n_sh_a", "n_sh_b") == 0, F.lit(0).cast("long"))
            .otherwise(
                F.expr(
                    "1000 * coalesce(n_shared_sh, 0)"
                    " DIV least(n_sh_a, n_sh_b)"
                )
            )
            .alias("containment_permille"),
            F.coalesce("n_dup_fp", F.lit(0)).cast("long").alias("n_dup_fp"),
        )
    )


def split_leakage_sql() -> str:
    """DuckDB oracle tail for :func:`split_leakage`. The caller's WITH
    context must define CTEs ``ssh(split, sh)`` (distinct shingles per
    split) and ``fps(split, fp)`` (distinct md5-text fingerprints per
    split) — and should mark the expensive upstream CTEs
    ``AS MATERIALIZED``: DuckDB inlines plain CTEs per reference, and
    with the c1 survivor chain upstream the naive inlined form
    re-curated the corpus once per reference (measured 210s at sf0.01 vs
    ~2s materialized). Returns the final 3-pair SELECT."""
    return """SELECT p.split_a, p.split_b,
       COALESCE(s.n_shared_sh, 0) AS n_shared_sh,
       p.n_sh_a, p.n_sh_b,
       CASE WHEN least(p.n_sh_a, p.n_sh_b) = 0 THEN 0
            ELSE 1000 * COALESCE(s.n_shared_sh, 0)
                 // least(p.n_sh_a, p.n_sh_b) END AS containment_permille,
       COALESCE(f.n_dup_fp, 0) AS n_dup_fp
FROM (SELECT sa.split AS split_a, sb.split AS split_b,
             sa.n_sh AS n_sh_a, sb.n_sh AS n_sh_b
      FROM (SELECT split, CAST(count(*) AS BIGINT) AS n_sh
            FROM ssh GROUP BY split) sa
      JOIN (SELECT split, CAST(count(*) AS BIGINT) AS n_sh
            FROM ssh GROUP BY split) sb
        ON sa.split < sb.split) p
LEFT JOIN (SELECT a.split AS split_a, b.split AS split_b,
                  CAST(count(*) AS BIGINT) AS n_shared_sh
           FROM ssh a JOIN ssh b
             ON a.sh = b.sh AND a.split < b.split
           GROUP BY 1, 2) s
  ON s.split_a = p.split_a AND s.split_b = p.split_b
LEFT JOIN (SELECT a.split AS split_a, b.split AS split_b,
                  CAST(count(*) AS BIGINT) AS n_dup_fp
           FROM fps a JOIN fps b
             ON a.fp = b.fp AND a.split < b.split
           GROUP BY 1, 2) f
  ON f.split_a = p.split_a AND f.split_b = p.split_b"""
