"""Deduplication operators (SURVEY.md §2.10 EXT-01/02; driver north-star
"LLM-data-pipeline dedup").

Scale design (100 TB corpus):

* Exact dedup is a hash-groupBy on the content key — one shuffle; with
  AQE skew handling a hot duplicate cluster splits at runtime.
* N-gram Jaccard is exact pairwise similarity but only materializes pairs
  that SHARE a shingle, via an inverted-index self-join. A document-
  frequency cap on shingles (``max_doc_freq``) drops stop-shingles that
  would otherwise contribute O(df²) candidate pairs — the standard
  pair-explosion guard; the cap is part of the operator contract so the
  oracle applies the identical cap.
* MinHash/LSH replaces the all-shared-shingle join with a banded signature
  join: candidates = documents agreeing on ALL rows of ≥1 band. Hashes are
  md5-hex substrings (lexicographic min) so signatures are engine-portable —
  the DuckDB oracle computes byte-identical signatures, which Spark's own
  seeded MinHashLSH cannot offer. The 12 hash functions are 8-hex-char
  (32-bit) disjoint chunks of 3 seeded md5s — md5's 128 output bits are
  independent, so slicing one wide hash into k narrow ones is the standard
  way to pay 1 hash invocation for 4 hash functions. Signatures are
  row-local (min over the doc's own shingle array), so they are computed
  IN-ROW over the shingle-set table — no explode and no extra shuffle; the
  shingle-set table itself is computed once and persisted, feeding
  signatures, banding, and candidate verification from one pass.
* SimHash packs a 16-bit signature from per-token md5 nibbles: ONE md5 per
  token, its first 4 hex nibbles packed into a small int, then 16 integer
  bit-ballots — near-dups collide on the exact signature.

Expression-tree size is a first-class concern here: these operators are
where naive construction (k aggregates each re-hashing every token, a
shuffle per signature row) produces generated code past the JIT's huge-
method limits, degrading whole stages to interpreted execution. Every
rewrite above was measured, not guessed (bench.py).

All hot paths are JVM built-ins (split/transform/explode/groupBy) — no
Python UDFs.
"""

from __future__ import annotations

import threading

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import normalize_text_native

HEX = "0123456789abcdef"

#: Cached intermediates created by dedup operators (posting lists, shingle
#: sets). They must stay materialized while the returned lazy DataFrame is
#: consumed, so the operator cannot unpersist them itself — ownership
#: passes to the caller via :func:`release_cached_intermediates` (bench.py
#: drains between runs). Strong references are deliberate: a
#: ``DataFrame.persist`` entry lives in the JVM CacheManager until an
#: explicit unpersist (Python GC / ContextCleaner never reclaim it), so a
#: weakly-held handle would just make the cache unreleasable once the
#: wrapper is collected. Long-lived sessions running many dedup queries
#: should drain periodically (or ``spark.catalog.clearCache()``); the cost
#: of NOT draining is bounded by storage-level spill-to-disk, not OOM
#: (ADVICE r1).
_PERSISTED: list[DataFrame] = []

#: Epoch counter bumped by :func:`release_cached_intermediates` — the
#: staleness signal for :func:`materialize_shared`: after a release, every
#: shared frame's cache is empty again, so the next access must re-run the
#: eager materialization pass.
_PERSIST_EPOCH: int = 0

#: (memo key) → epoch at which the frame was last eagerly materialized.
_MATERIALIZED_AT: dict = {}

#: Per-key re-entrant locks guarding memo get-or-build sections and shared
#: eager materializations, so :func:`overlap` threads never build (or
#: noop-materialize) the same frame twice. Lock nesting follows the memo
#: dependency DAG (pairs→sig→payload, c9/c10/c11→c7→c1), which is acyclic,
#: so no lock-order cycle exists.
_MEMO_LOCKS: dict = {}
#: Created at import (ADVICE r12): a lazily-initialized guard can be
#: instantiated twice by racing overlap threads, leaving two threads each
#: holding a different "guard" — correctness then rests on CPython dict
#: atomicity instead of the lock.
_MEMO_LOCKS_GUARD = threading.Lock()


def memo_lock(key):
    """The re-entrant lock for one memo key (created on first use)."""
    with _MEMO_LOCKS_GUARD:
        return _MEMO_LOCKS.setdefault(key, threading.RLock())


def _evict_memo_locks(stale_apps: set) -> None:
    """Drop locks whose key (recursively) embeds a foreign applicationId —
    called alongside the memo caches' foreign-session eviction so a
    long-lived process spanning many Spark sessions (pytest) does not leak
    an RLock per key per session (ADVICE r12). Only foreign-app keys are
    evicted, so a lock object currently held by this session's overlap
    threads is never replaced out from under them."""

    def contains(t, values) -> bool:
        for x in t:
            if isinstance(x, tuple):
                if contains(x, values):
                    return True
            elif x in values:
                return True
        return False

    with _MEMO_LOCKS_GUARD:
        for lk in [
            lk
            for lk in _MEMO_LOCKS
            if isinstance(lk, tuple) and contains(lk, stale_apps)
        ]:
            del _MEMO_LOCKS[lk]


def overlap(*thunks):
    """Run independent frame-building thunks on concurrent driver threads
    and return their results in order (guide §2.6 — overlap independent
    jobs). Spark happily runs several jobs at once inside one application;
    query functions only serialize their construction-time actions (CC
    convergence probes, eager memo materializations, Arrow decode passes)
    because the driver calls them sequentially. For rows composing
    independent chains (x206's three modality pipelines, the dual-sheet
    rows' two keep-one tiers, c12/c13's media chain vs c7 layout chain)
    the chains' scheduler-bound rounds back-fill each other's idle cores.

    Shared sub-frames stay computed exactly once: every memo get-or-build
    and shared materialization is guarded by :func:`memo_lock`, so the
    first thread to need a shared dependency builds it while the others
    block on that key, then proceed concurrently past it.

    ``MPS_OVERLAP_OFF=1`` restores sequential construction for A/Bs.
    Exceptions propagate to the caller (first one wins); results are
    positionally ordered so call sites read naturally."""
    import os

    if len(thunks) < 2 or os.environ.get("MPS_OVERLAP_OFF"):
        return [t() for t in thunks]
    from pyspark import InheritableThread

    results: list = [None] * len(thunks)
    errors: list = []

    def _run(i, t):
        try:
            results[i] = t()
        except BaseException as e:  # noqa: BLE001 — re-raised below
            errors.append(e)

    threads = [
        InheritableThread(target=_run, args=(i, t))
        for i, t in enumerate(thunks)
    ]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    if errors:
        raise errors[0]
    return results


def memo_get_or_build(cache: dict, app: str, key, build):
    """Locked get-or-build for the per-session memo dicts (the
    _C1/_C7/_C8/_C9/_C10/_C11/payload/sig/img frame caches), so
    :func:`overlap` threads sharing a dependency build it exactly once:
    the first thread to need the key builds under that key's lock while
    the others block, then every later access is a lock-free-fast hit.
    Foreign-session eviction (the established memo contract) happens
    under the cache's dict lock so concurrent evictors never race the
    iteration. Different keys of one cache (e.g. the video and audio sig
    frames) build concurrently — only dict bookkeeping serializes."""
    dict_lock = memo_lock((id(cache), "dict"))
    with dict_lock:
        stale = [k for k in cache if k[0] != app]
        for k in stale:
            del cache[k]
        if stale:
            _evict_memo_locks({k[0] for k in stale})
        hit = cache.get(key)
    if hit is not None:
        return hit
    with memo_lock((id(cache), key)):
        with dict_lock:
            hit = cache.get(key)
        if hit is None:
            hit = build()
            with dict_lock:
                cache[key] = hit
        return hit


def _persist(df: DataFrame) -> DataFrame:
    df = df.persist()
    _PERSISTED.append(df)
    return df


def materialize_shared(df: DataFrame, key) -> DataFrame:
    """Eagerly materialize a persisted SHARED frame (one noop pass) so that
    the concurrent jobs AQE schedules against it — broadcast-exchange builds
    in particular — read the populated cache instead of RACING to recompute
    the expensive subtree. A lazily-persisted frame referenced by several
    broadcast subqueries is computed once PER concurrent job until some job
    populates the cache (measured on x218: six 5-10 CPU-second duplicate
    decode stages per action; cache-hit builds cost ~0.04s). Keyed +
    epoch-guarded so one row's repeated accesses pay a single pass, while
    the between-rows release (which empties the cache) re-arms it — every
    timed bench row still computes the frame from the parquet inputs.
    ``MPS_EAGER_MEMO_OFF=1`` restores lazy materialization for A/Bs."""
    import os

    if os.environ.get("MPS_EAGER_MEMO_OFF"):
        return df
    guard = memo_lock(("materialized-at-dict",))
    with memo_lock(("materialize", key)):
        with guard:  # dict snapshot/cleanup atomic vs other keys' threads
            stale = [
                k for k, v in _MATERIALIZED_AT.items() if v != _PERSIST_EPOCH
            ]
            for k in stale:
                del _MATERIALIZED_AT[k]
            fresh = _MATERIALIZED_AT.get(key) == _PERSIST_EPOCH
        if not fresh:
            df.write.format("noop").mode("overwrite").save()
            with guard:
                _MATERIALIZED_AT[key] = _PERSIST_EPOCH
    return df


def persist_now(df: DataFrame) -> DataFrame:
    """Persist + materialize immediately — :func:`materialize_shared` for a
    frame built fresh per call (no memo key, so no epoch guard needed): the
    expensive subtree is computed exactly once by this pass, and every
    concurrent consumer job reads the cache. Same ``MPS_EAGER_MEMO_OFF``
    bypass."""
    import os

    df = _persist(df)
    if not os.environ.get("MPS_EAGER_MEMO_OFF"):
        df.write.format("noop").mode("overwrite").save()
    return df


def persist_pool_mark() -> int:
    """Current length of the tracked-persist pool. Capture BEFORE building
    a bounded scope's frames, then pass to
    :func:`release_cached_intermediates` to drop only that scope's entries —
    a blanket release from inside a suite would also drop caches earlier
    queries in the same process still rely on (ADVICE r8)."""
    return len(_PERSISTED)


def release_cached_intermediates(since: int = 0) -> int:
    """Unpersist intermediates cached by dedup operators — all of them, or
    only those appended after ``since`` (a :func:`persist_pool_mark`
    snapshot); returns how many were released. Call after the consuming
    action completes.

    No-op off the main driver thread (ADVICE r12): a release from inside an
    :func:`overlap` worker pops pool entries that concurrent SIBLING threads
    appended after the mark, and its epoch bump races their in-flight
    :func:`materialize_shared` passes — which can record an unpersisted
    frame as materialized and silently recompute the expensive subtree the
    cache exists to prevent. The owning action's main-thread release drains
    the pool; skipping the worker-thread one is pure hygiene deferral."""
    if threading.current_thread() is not threading.main_thread():
        return 0
    global _PERSIST_EPOCH
    _PERSIST_EPOCH += 1
    n = max(len(_PERSISTED) - since, 0)
    while len(_PERSISTED) > since:
        _PERSISTED.pop().unpersist(blocking=False)
    return n


def ensure_min_parallelism(df: DataFrame) -> DataFrame:
    """Repartition a tiny scan up to the session's core count before heavy
    per-row compute (shingling/hashing). A small parquet fixture is one row
    group → ONE task, serializing everything downstream. At 100 TB scans
    arrive as thousands of splits and this is a no-op; it only fires when
    the input has fewer partitions than cores, i.e. when the shuffle it adds
    is trivially small. Scoped to compute-heavy operators on purpose — a
    blanket floor in the reader measurably hurt join-heavy queries (extra
    round-robin shuffle on every input defeats broadcast planning)."""
    if df.isStreaming:
        # no .rdd on a streaming frame; micro-batch parallelism is the
        # file source's concern, and the floor is a batch-fixture fix
        return df
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def tokens_col(text_col: str = "text") -> Column:
    """Whitespace tokens of the natively-normalized text."""
    return F.split(normalize_text_native(F.col(text_col)), " ")


def materialize(df: DataFrame, expr: Column, name: str) -> DataFrame:
    """Evaluation barrier: bind ``expr`` to a column attribute.

    A lambda body in a higher-order function re-evaluates any outer
    expression tree it references once PER ARRAY ELEMENT (e.g.
    ``transform(sequence(1, n), i -> slice(toks, i, k))`` recomputes the
    whole normalize+split behind ``toks`` n times per row — O(n²) work), and
    Catalyst's CollapseProject re-inlines a plain projection, so a separate
    ``select`` is not a fix. Wrapping the expression in a one-element
    ``explode(array(...))`` puts a Generate node between producer and
    consumer: the expression is evaluated exactly once per row and consumers
    read a bound attribute. Row-local — no shuffle, scale-free."""
    return df.withColumn(name, F.explode(F.array(expr)))


def shingles_expr(tokens: Column, k: int) -> Column:
    """Distinct word k-grams. Guarded: Spark's ``sequence(1, n)`` DESCENDS
    when n < 1, so short docs explicitly yield an empty array (DuckDB's
    ``range`` is empty there — semantics must agree)."""
    n = F.size(tokens) - (k - 1)
    grams = F.transform(
        F.sequence(F.lit(1), n), lambda i: F.array_join(F.slice(tokens, i, k), " ")
    )
    return F.when(n >= 1, F.array_distinct(grams)).otherwise(
        F.array().cast("array<string>")
    )


def doc_shingles(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", k: int = 3
) -> DataFrame:
    """(doc_id, shingle) inverted-index rows, distinct per doc."""
    toked = materialize(
        ensure_min_parallelism(docs).select(F.col(id_col).alias("doc_id"), text_col),
        tokens_col(text_col),
        "__toks",
    )
    return toked.select(
        "doc_id", F.explode(shingles_expr(F.col("__toks"), k)).alias("sh")
    )


def _pair_combinations(ids: Column) -> Column:
    """All i<j element pairs of a sorted id array, as (doc_a, doc_b) structs —
    the posting-list pair generator. Guarded: ``sequence`` DESCENDS when
    end < start, so singleton lists must yield an empty array explicitly."""
    n = F.size(ids)
    pairs = F.flatten(
        F.transform(
            F.sequence(F.lit(1), n - 1),
            lambda i: F.transform(
                F.sequence(i + 1, n),
                lambda j: F.struct(
                    F.element_at(ids, i).alias("doc_a"),
                    F.element_at(ids, j).alias("doc_b"),
                ),
            ),
        )
    )
    return F.when(n >= 2, pairs).otherwise(
        F.array().cast("array<struct<doc_a:long,doc_b:long>>")
    )


def doc_shingle_sets(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", k: int = 3
) -> DataFrame:
    """(doc_id, sh_set, n_sh): per-doc distinct shingle ARRAY — the row-local
    form of the inverted index, for candidate-pair verification where the
    pair set is already known and exploding would be waste."""
    toked = materialize(
        ensure_min_parallelism(docs).select(F.col(id_col).alias("doc_id"), text_col),
        tokens_col(text_col),
        "__toks",
    )
    return toked.select(
        "doc_id", shingles_expr(F.col("__toks"), k).alias("sh_set")
    ).withColumn("n_sh", F.size("sh_set"))


def exact_dedup(
    docs: DataFrame, key_cols: list[str], id_col: str = "doc_id"
) -> DataFrame:
    """EXT-01: exact dedup — keep the min-id representative per key group.

    Deterministic (unlike ``dropDuplicates``, which keeps an arbitrary row)
    and therefore oracle-checkable; one shuffle on the key.
    """
    return docs.groupBy(*key_cols).agg(
        F.min(id_col).alias("keep_id"), F.count("*").cast("long").alias("n_copies")
    )


def _pair_jaccard(
    ds: DataFrame,
    candidates: DataFrame | None = None,
    max_doc_freq: int | None = None,
) -> DataFrame:
    """Exact Jaccard for doc pairs sharing ≥1 shingle (optionally restricted
    to a candidate pair set). ``ds`` is the (doc_id, sh) inverted index.

    Posting-list formulation: ONE groupBy(sh) builds each shingle's sorted
    doc list; candidate pairs come from in-row array combinations, so the
    expensive shingling subtree is evaluated once instead of appearing under
    both sides of a self-join plus two size joins (a naive a⋈b-on-sh plan
    re-evaluates it ~8×). ``max_doc_freq`` caps posting-list length (the
    stop-shingle guard — drops O(df²) pair explosions); per-doc sizes are
    derived from the SAME capped posting lists so the Jaccard denominator
    matches the oracle's post-cap index exactly.

    ``grouped`` (the capped posting lists) feeds three consumers — pair
    generation and both size lookups — so it is persisted: one shingling
    pass + one shuffle total, then narrow reads."""
    grouped = ds.groupBy("sh").agg(F.sort_array(F.collect_list("doc_id")).alias("ids"))
    if max_doc_freq is not None:
        grouped = grouped.filter(F.size("ids") <= max_doc_freq)
    grouped = _persist(grouped)
    inter = (
        grouped.select(F.explode(_pair_combinations(F.col("ids"))).alias("p"))
        .select("p.doc_a", "p.doc_b")
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("inter"))
    )
    if candidates is not None:
        inter = inter.join(candidates, ["doc_a", "doc_b"])
    sizes = (
        grouped.select(F.explode("ids").alias("doc_id"))
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_sh"))
    )
    na = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("na"))
    nb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("nb"))
    return (
        inter.join(na, "doc_a")
        .join(nb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            (
                F.col("inter")
                / (F.col("na") + F.col("nb") - F.col("inter")).cast("double")
            ).alias("jaccard"),
        )
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    threshold: float = 0.5,
    max_doc_freq: int | None = 100,
    shingles: DataFrame | None = None,
) -> DataFrame:
    """EXT-02 (exact tier): near-duplicate pairs by word-k-gram Jaccard.

    ``shingles``: a precomputed ``(doc_id, sh)`` distinct-shingle table for
    the same docs — pass it when several stages consume one shingle table
    (the c1 pipeline shares it with decontamination) so tokenization and
    shingling are paid once per corpus scan, not once per operator.

    ``max_doc_freq`` is the stop-shingle cap (see module docstring); pairs
    whose every shared shingle is dropped simply can't be emitted, which is
    the documented approximation at scale.

    Plan note: prefix filtering (Vernica et al., SIGMOD'10 — explode only
    each doc's rarest ``n−⌈t·n⌉+1`` shingles, verify candidates with in-row
    ``array_intersect``) was prototyped and produced byte-identical output
    but measured 2.2× SLOWER at sf0.1 (5.1s vs 2.3s): the two extra
    shuffles carrying per-doc shingle arrays cost more than the candidate
    reduction saves while posting lists are df-capped anyway. Revisit only
    if the cap has to rise.
    """
    ds = shingles if shingles is not None else doc_shingles(docs, id_col, text_col, k)
    return _pair_jaccard(ds, max_doc_freq=max_doc_freq).filter(
        F.col("jaccard") >= threshold
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

NUM_HASHES = 12
BAND_ROWS = 3  # 4 bands × 3 rows
CHUNKS_PER_MD5 = 4  # 32 hex chars → 4 disjoint 8-char (32-bit) hash fns
CHUNK_LEN = 8


def mh_seed_chunk(i: int) -> tuple[int, int]:
    """Hash function i = chunk ``i % 4`` of md5 seeded with ``i // 4``:
    1-based hex offset = 1 + 8·chunk. Shared by the Spark side and the
    oracle-SQL generator so the two cannot drift."""
    seed, chunk = divmod(i, CHUNKS_PER_MD5)
    return seed, 1 + CHUNK_LEN * chunk


def minhash_signatures(ds: DataFrame, num_hashes: int = NUM_HASHES) -> DataFrame:
    """Per-doc MinHash signature from (doc_id, sh) inverted-index rows: for
    hash fn i, min over shingles of an 8-hex-char md5 chunk (lexicographic
    min on fixed-width hex is engine-portable, unlike seeded integer
    permutations). Aggregation form — one shuffle; prefer the in-row form
    inside :func:`minhash_dedup_pairs` when the shingle SET table is already
    materialized."""
    aggs = []
    for i in range(num_hashes):
        seed, off = mh_seed_chunk(i)
        aggs.append(
            F.min(
                F.substring(F.md5(F.concat(F.col("sh"), F.lit(f"#{seed}"))), off, CHUNK_LEN)
            ).alias(f"mh{i}")
        )
    return ds.groupBy("doc_id").agg(*aggs)


def minhash_signatures_inrow(sets: DataFrame, num_hashes: int = NUM_HASHES) -> DataFrame:
    """Row-local MinHash over the per-doc shingle ARRAY: zero shuffles.

    The seeded md5 array is materialized once per seed (barrier — see
    :func:`materialize`), then each of its 4 chunk-hash minima is a cheap
    substring pass; total hash work is 3 md5 per shingle for 12 hash fns.
    Docs with no shingles are dropped (no signature ⇒ no bands), matching
    the aggregation form where such docs have no inverted-index rows."""
    n_seeds = (num_hashes + CHUNKS_PER_MD5 - 1) // CHUNKS_PER_MD5
    s = sets.filter(F.col("n_sh") >= 1)
    for seed in range(n_seeds):
        s = materialize(
            s,
            F.expr(f"transform(sh_set, x -> md5(concat(x, '#{seed}')))"),
            f"__h{seed}",
        )
    mh = []
    for i in range(num_hashes):
        seed, off = mh_seed_chunk(i)
        mh.append(
            F.expr(
                f"array_min(transform(__h{seed}, h -> substring(h, {off}, {CHUNK_LEN})))"
            ).alias(f"mh{i}")
        )
    return s.select("doc_id", *mh)


def band_keys_df(
    sig: DataFrame, num_hashes: int = NUM_HASHES, band_rows: int = BAND_ROWS
) -> DataFrame:
    """(doc_id, band_key) rows from a signature table: every band's key is
    the '|'-concat of its minhash chunk strings, prefixed by the band
    index, emitted by ONE in-row array explode."""
    if num_hashes % band_rows != 0:
        # shared guard for BOTH banding consumers (self-join + cross-set):
        # a remainder would silently compute-and-drop the trailing hashes
        raise ValueError(
            f"num_hashes={num_hashes} must be divisible by band_rows="
            f"{band_rows}: the remainder hashes would be computed and "
            "shuffled but silently excluded from every band"
        )
    n_bands = num_hashes // band_rows
    band_keys = F.array(
        *[
            F.concat_ws(
                "|",
                F.lit(str(b)),
                *[F.col(f"mh{i}") for i in range(b * band_rows, (b + 1) * band_rows)],
            )
            for b in range(n_bands)
        ]
    )
    return sig.select("doc_id", F.explode(band_keys).alias("band_key"))


def lsh_candidate_pairs(
    sig: DataFrame, num_hashes: int = NUM_HASHES, band_rows: int = BAND_ROWS
) -> DataFrame:
    """Banded LSH: docs agreeing on every row of ≥1 band become candidates.
    The band key is a concat of the band's minhash strings. Bands are
    emitted by ONE in-row array explode (a per-band union would re-evaluate
    the whole signature subtree n_bands times), and the per-band self-join
    is the posting-list pair generator — one groupBy(band_key) instead of a
    self-join that recomputes signatures under both sides."""
    bands = band_keys_df(sig, num_hashes, band_rows)  # guard lives there
    return (
        bands.groupBy("band_key")
        .agg(F.sort_array(F.collect_list("doc_id")).alias("ids"))
        .select(F.explode(_pair_combinations(F.col("ids"))).alias("p"))
        .select("p.doc_a", "p.doc_b")
        .distinct()
    )


def minhash_dedup_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    threshold: float = 0.5,
    sets: DataFrame | None = None,
) -> DataFrame:
    """EXT-02 (scale tier): LSH candidates → exact Jaccard verification.

    At 100 TB the all-shared-shingle join of :func:`ngram_jaccard_pairs` is
    the bottleneck; this replaces it with O(bands) narrow joins and only
    verifies the candidate set — by joining the (few) candidate pairs
    against per-doc shingle ARRAYS and intersecting in-row, so no pair
    explosion and no posting-list aggregation happens at all in the
    verification tier.

    The shingle-set table is the ONLY scan of the corpus: computed once,
    persisted (memory, disk spill), and read three times (signatures,
    verify-left, verify-right). Signatures are in-row
    (:func:`minhash_signatures_inrow`) so candidate generation's sole
    shuffle is the narrow band-key groupBy.
    """
    # ``sets``: a precomputed persisted (doc_id, sh_set, n_sh) table for
    # the same docs — pass it when another stage consumes the same shingle
    # sets (c2 shares it with decontamination) so shingling is paid once.
    if sets is None:
        sets = _persist(doc_shingle_sets(docs, id_col, text_col, k))
    cand = lsh_candidate_pairs(minhash_signatures_inrow(sets))
    a = sets.select(
        F.col("doc_id").alias("doc_a"), F.col("sh_set").alias("sa"), F.col("n_sh").alias("na")
    )
    b = sets.select(
        F.col("doc_id").alias("doc_b"), F.col("sh_set").alias("sb"), F.col("n_sh").alias("nb")
    )
    inter = F.size(F.array_intersect(F.col("sa"), F.col("sb")))
    return (
        cand.join(a, "doc_a")
        .join(b, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            (inter / (F.col("na") + F.col("nb") - inter).cast("double")).alias(
                "jaccard"
            ),
        )
        .filter(F.col("jaccard") >= threshold)
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

SIMHASH_BITS = 16


def simhash_vals_sql(toks_col: str, bits: int = SIMHASH_BITS) -> str:
    """Per-distinct-token packed hash: first ``bits/4`` hex nibbles of ONE
    md5, little-endian nibble order, so bit b of the packed int equals the
    oracle's ``(strpos(HEX, md5[b/4+1]) - 1) >> (b%4) & 1``."""
    nib = (bits + 3) // 4
    val = " + ".join(
        f"(instr('{HEX}', substring(h, {j + 1}, 1)) - 1) * {16 ** j}"
        for j in range(nib)
    )
    return (
        f"transform(transform(array_distinct({toks_col}), "
        f"t -> substring(md5(t), 1, {nib})), h -> {val})"
    )


def simhash_sig_sql(vals_col: str, bits: int = SIMHASH_BITS) -> str:
    """Signature from packed per-token hashes: bit b of the signature is 1
    iff the ±1 ballot Σ_t (2·bit_b(t)−1) is positive. 16 integer array
    passes — no hashing, tiny generated code (vs the naive 16-aggregates-
    each-re-hashing-every-token tree that blows past JIT method limits)."""
    terms = " + ".join(
        f"(CASE WHEN aggregate({vals_col}, 0L, (a, v) -> "
        f"a + ((v div {2 ** b}) % 2) * 2 - 1) > 0 THEN {2 ** b} ELSE 0 END)"
        for b in range(bits)
    )
    return f"CAST({terms} AS BIGINT)"


def simhash_docs(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """EXT-02 (signature tier): (doc_id, simhash). Near-dups = equal
    signatures (group on simhash); hamming-≤k variants pivot the signature
    into band columns exactly like LSH. One md5 per distinct token; the
    packed-hash array sits behind a barrier so the 16 bit-ballots read a
    bound attribute instead of re-hashing."""
    toked = materialize(
        ensure_min_parallelism(docs).select(F.col(id_col).alias("doc_id"), text_col),
        tokens_col(text_col),
        "__toks",
    )
    withvals = materialize(toked, F.expr(simhash_vals_sql("__toks")), "__vals")
    return withvals.select(
        "doc_id", F.expr(simhash_sig_sql("__vals")).alias("simhash")
    )


# ---------------------------------------------------------------------------
# Connected components → keep-one representative
# ---------------------------------------------------------------------------


def connected_components(
    pairs: DataFrame, max_iter: int = 25
) -> DataFrame:
    """EXT-02 (cluster tier): (doc_id, comp) from undirected near-dup
    ``(doc_a, doc_b)`` pairs; ``comp`` is the min doc_id reachable, so it
    doubles as the canonical representative.

    Iterative min-label propagation: each round every node takes the min of
    its own label and its neighbors' labels. Rounds needed = component
    diameter — for near-dup clusters (dense cliques plus short chains) that
    is small and independent of corpus size, which is what makes the loop
    viable at 100 TB: each round is ONE shuffle join + ONE groupBy over the
    edge list, and ``localCheckpoint`` truncates lineage so plan depth stays
    constant instead of growing per round (the classic iterative-Spark
    failure mode). Convergence is detected with a LIMIT-1 probe, not a full
    count. For adversarial long-chain graphs the large-star/small-star
    algorithm (Kiveris et al., "Connected Components in MapReduce") halves
    rounds to O(log n); near-dup graphs don't need it.

    Round-latency engineering (matters on a 1000-executor cluster where
    every extra job is a scheduler round-trip, and dominates at small
    scale): labels are initialized to ``min(self, direct neighbors)`` —
    the first propagation fused into the node-list build, so dense-clique
    components (the near-dup common case) converge on the very next probe
    — and checkpoints are LAZY: the convergence probe is the action that
    materializes each round's labels, so a round costs ONE job, not an
    eager-checkpoint job plus a probe job.
    """
    # Undirect the edge list with a row-local explode, NOT a self-union: the
    # union form evaluates the (expensive — shingle/LSH) pair-generation
    # subtree once per branch when the persist materializes, doubling the
    # dominant cost of the whole query (measured: x27 warm 5.8s → 3.5s at
    # sf0.1 from this change alone).
    edges = (
        pairs.select(
            F.explode(
                F.array(
                    F.struct(
                        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
                    ),
                    F.struct(
                        F.col("doc_b").alias("src"), F.col("doc_a").alias("dst")
                    ),
                )
            ).alias("e")
        )
        .select("e.src", "e.dst")
        .persist()
    )
    labels = (
        edges.groupBy(F.col("src").alias("doc_id"))
        .agg(F.min("dst").alias("min_dst"))
        .select("doc_id", F.least("doc_id", "min_dst").alias("comp"))
        .localCheckpoint(eager=False)
    )
    converged = False
    for _ in range(max_iter):
        # tag which union branch a row came from so ONE aggregation yields
        # both the new label (min over self+neighbors) and the old label
        # (min over the self branch only) — the convergence probe then reads
        # the already-checkpointed result instead of re-joining old vs new
        # labels (one fewer shuffle join per round)
        prop = edges.join(labels, edges.src == labels.doc_id).select(
            F.col("dst").alias("doc_id"), "comp", F.lit(False).alias("own")
        )
        new_labels = (
            labels.select("doc_id", "comp", F.lit(True).alias("own"))
            .union(prop)
            .groupBy("doc_id")
            .agg(
                F.min("comp").alias("comp"),
                F.min(F.when(F.col("own"), F.col("comp"))).alias("old_comp"),
            )
            .localCheckpoint(eager=False)
        )
        changed = (
            new_labels.filter(F.col("comp") < F.col("old_comp")).limit(1).count()
        )
        labels = new_labels.select("doc_id", "comp")
        if changed == 0:
            converged = True
            break
    edges.unpersist()
    if not converged:
        # a silent exit here would split components with diameter > max_iter
        # (long near-dup chains) and yield wrong keep-one decisions
        raise RuntimeError(
            f"connected_components did not converge within max_iter={max_iter} "
            "rounds — the pair graph has a component with larger diameter; "
            "raise max_iter or switch to large-star/small-star"
        )
    return labels


def dedup_keep_one(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    algorithm: str = "min_label",
    components: DataFrame | None = None,
) -> DataFrame:
    """EXT-02 end-to-end dedup decision: every document mapped to its
    cluster representative (``rep``) with ``keep`` = is-the-representative.
    Singletons (no near-dup edge) keep themselves via the left-join
    coalesce — no giant node list is ever built for them, so the iterative
    part only pays for documents that actually have duplicates.

    ``algorithm``: 'min_label' (default — diameter-bounded graphs) or
    'star' (:func:`connected_components_star`, the long-chain tier).
    ``components``: a precomputed (doc_id, comp) label table for the same
    pair graph — pass it when several collapse policies run over one graph
    (the x49 suite) so the iterative clustering is paid once."""
    if components is None:
        cc = connected_components_star if algorithm == "star" else connected_components
        components = cc(pairs)
    comp = components.withColumnRenamed("comp", "rep")
    return (
        docs.select(F.col(id_col).alias("doc_id"))
        .join(comp, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("rep", F.col("doc_id")).alias("rep"),
        )
        .withColumn("keep", F.col("doc_id") == F.col("rep"))
    )


def connected_components_star(pairs: DataFrame, max_iter: int = 40) -> DataFrame:
    """Large-star/small-star connected components (Kiveris et al.,
    "Connected Components in MapReduce and Beyond") — the adversarial-graph
    tier of :func:`connected_components`, same (doc_id, comp) output.

    Min-label propagation needs diameter rounds, so a pathological
    near-dup CHAIN (each doc similar only to its neighbors — OCR drift,
    successive crawl snapshots) of length d costs d shuffles and trips the
    max_iter guard. Star contraction converges in O(log² n) worst case /
    O(log n) in practice because both operations hang whole subtrees
    directly under the current minimum.

    Both operations are join-shaped, never collect_list-shaped: per-node
    minima partial-aggregate map-side and rehang via an edge join, so a
    hot node (a star's center) never materializes its neighbor list in one
    reducer — the skew resistance that makes the algorithm the 100 TB
    fallback. Each round: large-star (larger neighbors rehang under the
    node's min) then small-star (smaller neighbors + the node rehang under
    the minimum smaller neighbor), then a changed-probe on the
    lazily-checkpointed edge set (one job per round, like the min-label
    loop). Terminates when the edge set is a fixed point: every edge
    (child, root) with root = its component's minimum."""
    # canonical directed form: (hi, lo), self-loops dropped, distinct
    e = (
        pairs.select(
            F.greatest("doc_a", "doc_b").alias("hi"),
            F.least("doc_a", "doc_b").alias("lo"),
        )
        .filter(F.col("hi") != F.col("lo"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    for _ in range(max_iter):
        # large-star over the undirected adjacency: every neighbor v > u
        # rehangs under m(u) = min(N(u) ∪ {u})
        adj = e.select(F.col("hi").alias("u"), F.col("lo").alias("v")).union(
            e.select(F.col("lo").alias("u"), F.col("hi").alias("v"))
        )
        m = adj.groupBy("u").agg(F.least(F.min("v"), F.first("u")).alias("m"))
        large = (
            adj.join(m, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("hi"), F.col("m").alias("lo"))
            .filter(F.col("hi") != F.col("lo"))
            .distinct()
        )
        # small-star on the directed (hi → lo) form: the node and all its
        # smaller neighbors rehang under the minimum smaller neighbor
        m2 = large.groupBy("hi").agg(F.min("lo").alias("m"))
        small = (
            large.join(m2, "hi")
            .select(F.col("lo").alias("child"), F.col("m").alias("root"))
            .union(m2.select(F.col("hi").alias("child"), F.col("m").alias("root")))
            .filter(F.col("child") != F.col("root"))
            .distinct()
            .select(F.col("child").alias("hi"), F.col("root").alias("lo"))
            .localCheckpoint(eager=False)
        )
        # ONE-job fixed-point probe: the edge sets are duplicate-free, so
        # small == e iff their signed-weight union has no nonzero group —
        # replaces exceptAll + two full counts (3 scheduler round-trips per
        # round) with a single shuffle probe, and the count() that
        # materializes it doubles as the checkpoint trigger.
        changed = (
            small.select("hi", "lo", F.lit(1).alias("w"))
            .union(e.select("hi", "lo", F.lit(-1).alias("w")))
            .groupBy("hi", "lo")
            .agg(F.sum("w").alias("s"))
            .filter(F.col("s") != 0)
            .limit(1)
            .count()
        )
        e = small
        if changed == 0:
            roots = e.select(F.col("lo").alias("doc_id")).subtract(
                e.select(F.col("hi").alias("doc_id"))
            )
            return e.select(
                F.col("hi").alias("doc_id"), F.col("lo").alias("comp")
            ).union(roots.select("doc_id", F.col("doc_id").alias("comp")))
    raise RuntimeError(
        f"connected_components_star did not converge within max_iter={max_iter}"
    )


def dedup_keep_best(
    docs: DataFrame,
    pairs: DataFrame,
    score_col: Column,
    id_col: str = "doc_id",
    components: DataFrame | None = None,
) -> DataFrame:
    """EXT-02 quality-aware keep-one: like :func:`dedup_keep_one`, but the
    cluster representative is the member with the HIGHEST ``score_col``
    (ties → min id) instead of the smallest id — what a training-data
    pipeline actually wants when collapsing a near-dup cluster ("keep the
    cleanest copy", not "keep the oldest crawl").

    One extra shuffle over keep-one: the per-cluster argmax window on the
    component label. Scores evaluate once per doc in the same projection
    that joins the label, so no second corpus pass; singletons bypass the
    window entirely only in effect (their cluster is themselves)."""
    from pyspark.sql import Window as _W

    comp = connected_components(pairs) if components is None else components
    labeled = (
        docs.select(F.col(id_col).alias("doc_id"), score_col.alias("__score"))
        .join(comp, "doc_id", "left")
        .select(
            "doc_id", "__score", F.coalesce("comp", F.col("doc_id")).alias("comp")
        )
    )
    w = _W.partitionBy("comp").orderBy(F.desc("__score"), F.asc("doc_id"))
    best = (
        labeled.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") == 1)
        .select(F.col("comp"), F.col("doc_id").alias("rep"))
    )
    return (
        labeled.join(best, "comp")
        .select(
            "doc_id",
            "rep",
            (F.col("doc_id") == F.col("rep")).alias("keep"),
        )
    )


def duplicate_spans(
    docs: DataFrame,
    k: int = 8,
    min_count: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """EXT-02/EXT-05 span-level exact substring dedup (the operator behind
    Lee et al., "Deduplicating Training Data Makes Language Models Better",
    ACL 2022 — their ExactSubstr, at word granularity): find every k-token
    window whose exact content occurs ≥ ``min_count`` times in the corpus
    (across OR within documents), then merge each document's duplicated
    windows into maximal overlapping spans.

    Output: ``(doc_id, span_start, span_end, n_windows)`` — 1-based
    inclusive token positions of each merged duplicated span; the caller
    cuts those token ranges (or drops docs above a duplication ratio).

    Scale shape: windows are built IN-ROW (transform over sequence behind a
    materialize barrier — no token explode) and hashed to md5 before the
    one corpus-wide shuffle on the window hash; the duplicate test is a
    count window over that hash (partial-aggregable, same device as x28's
    doc-frequency), and span merging is the classic gaps-and-islands
    computed with doc-partitioned window functions — all JVM built-ins, no
    Python in the path. Hash width: 128-bit md5 over ~100 TB of windows
    (~1e13) gives collision odds ~1e-13 — and a collision only ever
    over-marks a span, never corrupts data."""
    toked = materialize(
        ensure_min_parallelism(docs).select(F.col(id_col).alias("doc_id"), text_col),
        tokens_col(text_col),
        "__toks",
    )
    n = F.size(F.col("__toks")) - (k - 1)
    wins = F.when(
        n >= 1,
        F.transform(
            F.sequence(F.lit(1), n),
            lambda i: F.struct(
                i.cast("long").alias("pos"),
                F.md5(F.array_join(F.slice(F.col("__toks"), i, k), " ")).alias("wh"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<pos:bigint,wh:string>>"))
    exploded = materialize(toked, wins, "__wins").select(
        "doc_id", F.explode("__wins").alias("w")
    ).select("doc_id", "w.pos", "w.wh")
    dup = exploded.withColumn(
        "__c", F.count("*").over(Window.partitionBy("wh"))
    ).filter(F.col("__c") >= min_count)
    w_doc = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    spans = (
        dup.withColumn("__end", F.col("pos") + (k - 1))
        .withColumn("__prev_end", F.max("__end").over(w_doc))
        .withColumn(
            "__new",
            F.when(
                F.col("pos") > F.coalesce(F.col("__prev_end"), F.lit(-1)), 1
            ).otherwise(0),
        )
        .withColumn(
            "__island",
            F.sum("__new").over(
                Window.partitionBy("doc_id")
                .orderBy("pos")
                .rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
    )
    return spans.groupBy("doc_id", "__island").agg(
        F.min("pos").alias("span_start"),
        F.max("__end").alias("span_end"),
        F.count("*").alias("n_windows"),
    ).drop("__island")


def incremental_neardup(
    batch: DataFrame,
    corpus: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    threshold: float = 0.5,
    num_hashes: int = NUM_HASHES,
    band_rows: int = BAND_ROWS,
) -> DataFrame:
    """Nightly-ingest NEAR-dup: each new-batch doc checked against the
    existing corpus via banded MinHash-LSH + exact Jaccard verification —
    the near-dup sibling of the exact-fingerprint incremental dedup
    (x45/x57/x72). Returns one row per batch doc: ``(doc_id, is_neardup,
    dup_of, jaccard)`` with the BEST corpus match (highest Jaccard, ties
    to the lowest corpus id) or (-1, 0.0) when nothing clears the
    threshold.

    Scale shape: candidates come from a band-key equi-join of the batch's
    bands against the corpus INDEX's bands — never batch×corpus. At
    100 TB the corpus (signatures, band keys, shingle arrays) is a
    precomputed bucketed table maintained incrementally (write survivors'
    rows back per ingest, the x45 pattern); here both sides derive from
    the fixture in one scan each. Verification joins only the candidate
    pairs against the two shingle-ARRAY tables and intersects in-row —
    no posting-list pair explosion. Batch-side state is batch-sized,
    corpus-side work is index-lookup-shaped: candidates × O(1)."""
    bsets = _persist(doc_shingle_sets(batch, id_col, text_col, k))
    csets = _persist(doc_shingle_sets(corpus, id_col, text_col, k))
    bbands = band_keys_df(
        minhash_signatures_inrow(bsets, num_hashes), num_hashes, band_rows
    ).withColumnRenamed("doc_id", "new_id")
    cbands = band_keys_df(
        minhash_signatures_inrow(csets, num_hashes), num_hashes, band_rows
    ).withColumnRenamed("doc_id", "corpus_id")
    cand = bbands.join(cbands, "band_key").select("new_id", "corpus_id").distinct()
    a = bsets.select(
        F.col("doc_id").alias("new_id"),
        F.col("sh_set").alias("sa"),
        F.col("n_sh").alias("na"),
    )
    b = csets.select(
        F.col("doc_id").alias("corpus_id"),
        F.col("sh_set").alias("sb"),
        F.col("n_sh").alias("nb"),
    )
    inter = F.size(F.array_intersect(F.col("sa"), F.col("sb")))
    pairs = (
        cand.join(a, "new_id")
        .join(b, "corpus_id")
        .select(
            "new_id",
            "corpus_id",
            (inter / (F.col("na") + F.col("nb") - inter).cast("double")).alias(
                "jaccard"
            ),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    best = (
        pairs.withColumn(
            "__rk",
            F.row_number().over(
                Window.partitionBy("new_id").orderBy(
                    F.desc("jaccard"), F.asc("corpus_id")
                )
            ),
        )
        .filter(F.col("__rk") == 1)
        .drop("__rk")
    )
    spine = batch.select(F.col(id_col).alias("doc_id")).distinct()
    return spine.join(
        best.withColumnRenamed("new_id", "doc_id"), "doc_id", "left"
    ).select(
        "doc_id",
        F.col("corpus_id").isNotNull().alias("is_neardup"),
        F.coalesce("corpus_id", F.lit(-1)).cast("long").alias("dup_of"),
        F.coalesce(F.col("jaccard"), F.lit(0.0)).cast("double").alias("jaccard"),
    )


def prefix_filter_jaccard_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    t_num: int = 1,
    t_den: int = 2,
) -> DataFrame:
    """EXT-02 exact near-dup WITHOUT a document-frequency cap: prefix
    filtering (Bayardo et al., WWW'07 "Scaling Up All Pairs Similarity
    Search"). Order each doc's shingles by global rarity (ascending df,
    then shingle text — a total order), keep only the first
    ``n - ceil(t*n) + 1`` as the doc's PREFIX, and generate candidate
    pairs from prefix collisions only. Theorem: two sets with Jaccard
    ≥ t must share a prefix element under any common total order — so
    unlike the df-capped inverted-index join (:func:`ngram_jaccard_pairs`)
    or banded MinHash (false negatives by design), this is EXACT while
    joining only on each doc's rarest few shingles. Stop-shingles are
    structurally excluded from candidate generation (they rank last and
    fall outside every prefix), not dropped by a tuning knob — the
    O(df²) pair explosion cannot happen, which is the property that
    matters at 10⁹ documents.

    The threshold is the rational ``t_num/t_den`` so the prefix length
    ``ceil(t*n) = (n*t_num + t_den - 1) div t_den`` is exact integer
    math; the final Jaccard compare mirrors x02's single double
    division, identical in both engines.

    Shuffle budget: shingle df (groupBy sh), rarity rank + size (one
    window pass on doc_id), prefix self-join (on sh — posting lists are
    prefix-only, so short), candidate verify (two hash joins on doc id +
    one groupBy pair). The shingle table is persisted once and feeds
    df, ranking, and both verify sides.
    """
    # r13 NEGATIVE RESULT: persist_now here (the profile showed twin
    # broadcast-build stage pairs re-shingling the corpus off the lazy
    # persist) A/B'd WORSE — 8.73 eager vs 6.86 lazy median over 5
    # interleaved runs (an earlier apparent eager win was confounded by
    # the since-reverted candidate spread): the racing duplicate builds
    # fill otherwise-idle cores, while the eager noop pass serializes the
    # critical path. Stays lazy, confirming the r12 x88 persist_now call.
    ds = _persist(doc_shingles(docs, id_col, text_col, k))
    dftab = ds.groupBy("sh").agg(F.count("*").alias("__df"))
    w = Window.partitionBy("doc_id")
    ranked = (
        ds.join(dftab, "sh")
        .withColumn("__rnk", F.row_number().over(w.orderBy("__df", "sh")))
        .withColumn("__n", F.count("*").over(w))
    )
    # `div` keeps the ceil fold in integers end-to-end (a double divide
    # + floor is only exact below 2^53, and the docstring promises exact)
    ceil_tn = F.expr(f"(__n * {t_num} + {t_den - 1}) div {t_den}")
    prefix = ranked.filter(
        F.col("__rnk") <= F.col("__n") - ceil_tn + 1
    ).select("doc_id", "sh")
    cand = (
        prefix.alias("a")
        .join(prefix.alias("b"), "sh")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )
    # r13 NEGATIVE RESULT (VERDICT r12 #5): a keyed repartition of the
    # candidate frame before the verify join (the scoped alternative to
    # the r12-rejected session-wide knob) was A/B'd and LOST — spread
    # 6.98 vs unspread 6.02 median over 4 interleaved runs at sf0.1. The
    # verify work AQE coalesces to 5 tasks is already cheaper than the
    # extra exchange + 32-task scheduling it takes to spread it.
    inter = (
        cand.join(ds.select(F.col("doc_id").alias("doc_a"), "sh"), "doc_a")
        .join(ds.select(F.col("doc_id").alias("doc_b"), "sh"), ["doc_b", "sh"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("inter"))
    )
    sizes = ds.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    na = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("na"))
    nb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("nb"))
    return (
        inter.join(na, "doc_a")
        .join(nb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.col("inter").cast("long").alias("inter"),
            F.col("na").cast("long").alias("n_a"),
            F.col("nb").cast("long").alias("n_b"),
            (
                F.col("inter")
                / (F.col("na") + F.col("nb") - F.col("inter")).cast("double")
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= t_num / t_den)
    )


def editdist1_pairs(df: DataFrame, id_col: str, s_col: str) -> DataFrame:
    """EXACT edit-distance-≤1 similarity self-join via deletion
    neighborhoods (the FastSS / SymSpell candidate scheme, Bocek et al.
    2007): every string explodes into the bag ``{s} ∪ del1(s)`` (itself
    plus each single-character deletion), candidates are id-ordered pairs
    sharing ANY bag element — one equi-join shuffle, NO cartesian — and a
    JVM ``levenshtein`` verification keeps exactly the true pairs.

    Zero false negatives by construction: if ``d(a,b) ≤ 1`` then either
    ``a = b``, or one is a deletion of the other (so ``b ∈ del1(a)`` or
    ``a ∈ del1(b)``), or they differ by one substitution at position i
    (so ``del_i(a) = del_i(b)``) — in every case the bags intersect. The
    driver hash match against the exhaustive all-pairs oracle is the
    completeness proof run as data. The same machinery extends to
    distance k with k-deletion neighborhoods (bag size C(n,k)); k=1 is
    the id/name-typo dedup workhorse.

    Scale shape: bag size is length+1 rows per string — the exploded
    table is O(total characters), same order as any tokenize pass; the
    equi-join key is high-entropy (a variant is nearly the whole string),
    so buckets stay small under any realistic key distribution; the
    verify step is a row-local integer function. Contrast the oracle's
    O(n²) levenshtein matrix.

    Returns ``(id_a, id_b, dist)`` with ``id_a < id_b``, ``dist ≤ 1``.
    """
    # parallelism floor BEFORE the explode: a one-row-group fixture scan
    # otherwise runs the whole explode → join-probe → levenshtein chain as
    # ONE task (the broadcast join adds no exchange to re-spread it) —
    # measured 5.9s single-task vs sub-second 32-way at sf0.1
    base = ensure_min_parallelism(
        df.select(F.col(id_col).alias("rid"), F.col(s_col).alias("s"))
    )
    variants = base.select(
        "rid", "s",
        F.explode(
            F.concat(
                F.array(F.col("s")),
                F.expr(
                    "transform(sequence(1, length(s)),"
                    " i -> concat(substr(s, 1, i - 1), substr(s, i + 1)))"
                ),
            )
        ).alias("v"),
    )
    a = variants.select(
        F.col("rid").alias("id_a"), F.col("s").alias("sa"), "v"
    )
    b = variants.select(
        F.col("rid").alias("id_b"), F.col("s").alias("sb"), "v"
    )
    cand = (
        a.join(b, "v")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sa", "sb")
        .distinct()
    )
    return (
        cand.withColumn("dist", F.levenshtein("sa", "sb").cast("long"))
        .filter(F.col("dist") <= 1)
        .select("id_a", "id_b", "dist")
    )


def editdist1_pairs_sql(rows_cte: str) -> str:
    """DuckDB oracle for :func:`editdist1_pairs`: the exhaustive
    all-pairs levenshtein join the Spark plan exists to avoid —
    algorithmically independent, so the hash match proves the deletion
    neighborhood missed nothing. ``rows_cte`` must yield ``(rid, s)``."""
    return f"""WITH r AS ({rows_cte})
SELECT a.rid AS id_a, b.rid AS id_b,
       CAST(levenshtein(a.s, b.s) AS BIGINT) AS dist
FROM r a JOIN r b ON a.rid < b.rid
WHERE levenshtein(a.s, b.s) <= 1"""


def tfidf_cosine_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.6,
    max_doc_freq: int = 100,
) -> DataFrame:
    """Sparse TF-IDF cosine near-dup pairs (EXT-02): doc pairs whose
    tf·idf vectors have cosine ≥ ``threshold`` — the WEIGHTED sibling of
    word-shingle Jaccard (x02): Jaccard treats every shingle equally, so
    boilerplate-heavy pairs score high; idf weighting discounts exactly
    those terms.

    Cross-engine float discipline: weights are INTEGERS — tf ·
    idf_milli, with idf_milli = floor(1000·ln(N/df) + 0.5) quantized
    once per term from two exact integers. Dot products and norms are
    then exact int64 sums (order-free), and the cosine is one
    deterministic IEEE expression over three exact integers, rounded to
    4. The only transcendental is the per-term idf quantization (the
    x52/x95 ln-precedent), never inside an accumulation.

    Terms with df > ``max_doc_freq`` are dropped from the vector space
    entirely — the same stop-term scale guard as x02, applied
    identically in the oracle: posting lists are df-capped so the
    term-keyed pair join is O(Σ df²) with df ≤ cap, never corpus².
    idf also makes these terms near-worthless, so the guard cuts the
    quadratic blowup exactly where the weights vanish.

    Returns ``(doc_a, doc_b, dot, cosine)``."""
    toked = materialize(
        ensure_min_parallelism(docs).select(F.col(id_col).alias("doc_id"), text_col),
        tokens_col(text_col),
        "__toks",
    )
    tf = (
        toked.select("doc_id", F.explode("__toks").alias("term"))
        .filter(F.col("term") != "")
        .groupBy("doc_id", "term")
        .agg(F.count("*").cast("long").alias("tf"))
    )
    n_docs = toked.select(F.count("*").cast("long").alias("n_docs"))
    df_t = (
        tf.groupBy("term")
        .agg(F.count("*").cast("long").alias("df"))
        .filter(F.col("df") <= max_doc_freq)
    )
    wts = _persist(
        tf.join(df_t, "term")
        .join(F.broadcast(n_docs))  # bounded: 1-row scalar total
        .select(
            "doc_id", "term",
            (
                F.col("tf")
                * F.floor(
                    F.lit(1000.0)
                    * F.log(F.col("n_docs").cast("double") / F.col("df").cast("double"))
                    + F.lit(0.5)
                ).cast("long")
            ).cast("long").alias("w"),
        )
    )
    a = wts.select(F.col("doc_id").alias("doc_a"), "term", F.col("w").alias("wa"))
    b = wts.select(F.col("doc_id").alias("doc_b"), "term", F.col("w").alias("wb"))
    dots = (
        a.join(b, "term")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.sum(F.col("wa") * F.col("wb")).cast("long").alias("dot"))
    )
    norms = wts.groupBy("doc_id").agg(
        F.sum(F.col("w") * F.col("w")).cast("long").alias("n2")
    )
    na = norms.select(F.col("doc_id").alias("doc_a"), F.col("n2").alias("na2"))
    nb = norms.select(F.col("doc_id").alias("doc_b"), F.col("n2").alias("nb2"))
    cos = (
        F.col("dot").cast("double")
        / (F.sqrt(F.col("na2").cast("double")) * F.sqrt(F.col("nb2").cast("double")))
    )
    return (
        dots.join(na, "doc_a")
        .join(nb, "doc_b")
        .filter(cos >= threshold)
        .select("doc_a", "doc_b", "dot", F.round(cos, 4).alias("cosine"))
    )


def tfidf_cosine_pairs_sql(
    toks_cte: str, threshold: float = 0.6, max_doc_freq: int = 100
) -> str:
    """DuckDB oracle for :func:`tfidf_cosine_pairs`; ``toks_cte`` is the
    shared tokenize CTE body yielding ``(doc_id, w)`` token arrays."""
    return f"""WITH {toks_cte},
tf AS (SELECT doc_id, u.term, CAST(count(*) AS BIGINT) AS tf
       FROM toks, UNNEST(w) AS u(term) WHERE u.term <> ''
       GROUP BY doc_id, u.term),
nd AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM toks),
dft AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term
        HAVING count(*) <= {max_doc_freq}),
wts AS (SELECT doc_id, term,
               CAST(tf * CAST(floor(1000.0 * ln(CAST(n_docs AS DOUBLE)
                                                / CAST(df AS DOUBLE)) + 0.5)
                              AS BIGINT) AS BIGINT) AS w
        FROM tf JOIN dft USING (term), nd),
dots AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                CAST(sum(a.w * b.w) AS BIGINT) AS dot
         FROM wts a JOIN wts b ON a.term = b.term AND a.doc_id < b.doc_id
         GROUP BY 1, 2),
norms AS (SELECT doc_id, CAST(sum(w * w) AS BIGINT) AS n2 FROM wts GROUP BY 1)
SELECT doc_a, doc_b, dot,
       round(CAST(dot AS DOUBLE)
             / (sqrt(CAST(na.n2 AS DOUBLE)) * sqrt(CAST(nb.n2 AS DOUBLE))),
             4) AS cosine
FROM dots JOIN norms na ON doc_a = na.doc_id JOIN norms nb ON doc_b = nb.doc_id
WHERE CAST(dot AS DOUBLE)
      / (sqrt(CAST(na.n2 AS DOUBLE)) * sqrt(CAST(nb.n2 AS DOUBLE)))
      >= {threshold}"""


def cluster_size_histogram(assignments: DataFrame) -> DataFrame:
    """Histogram of near-dup cluster sizes from a ``(doc_id, rep)``
    assignment table (EXT-01/02 audit): how much of the corpus sits in
    clusters of 1, 2, 3, ... — the dedup IMPACT report every curation
    run reads before deciding thresholds ("is duplication a long tail of
    pairs or a few mega-clusters?"), and the regression canary for the
    clustering operators themselves (a threshold bug shifts this
    histogram violently while per-doc spot checks look fine).

    All counts exact int64; two map-side-combined aggregates (rep →
    size, size → clusters); output is ≤ |max cluster size| rows at any
    corpus scale.

    Returns ``(cluster_size, n_clusters, n_docs)``."""
    sizes = assignments.groupBy("rep").agg(
        F.count("*").cast("long").alias("cluster_size")
    )
    return (
        sizes.groupBy("cluster_size")
        .agg(F.count("*").cast("long").alias("n_clusters"))
        .select(
            "cluster_size", "n_clusters",
            (F.col("cluster_size") * F.col("n_clusters"))
            .cast("long")
            .alias("n_docs"),
        )
    )


def cluster_size_histogram_sql(assignments_sql: str) -> str:
    """DuckDB oracle for :func:`cluster_size_histogram`;
    ``assignments_sql`` must yield ``(doc_id, rep)`` rows."""
    return f"""WITH asg AS ({assignments_sql}),
sizes AS (SELECT rep, CAST(count(*) AS BIGINT) AS cluster_size
          FROM asg GROUP BY rep)
SELECT cluster_size, CAST(count(*) AS BIGINT) AS n_clusters,
       CAST(cluster_size * count(*) AS BIGINT) AS n_docs
FROM sizes GROUP BY cluster_size"""


def shingle_novelty(shingles: DataFrame) -> DataFrame:
    """Per-document shingle NOVELTY (EXT-01/02/05 profiling op, r9): the
    exact fraction (in per-mille) of a document's distinct word-3-gram
    shingles whose corpus-wide FIRST appearance (min doc_id) is this
    document — near 1000 for genuinely new text, collapsing toward 0
    for template/boilerplate-dominated docs even when no single pair
    crosses a dedup threshold. The per-doc novelty curve is the
    between-the-thresholds signal the pairwise dedup operators (x02-x05)
    can't see.

    Plan: one groupBy(sh) min-aggregate (the same single shingle-keyed
    shuffle class as exact dedup), a co-partitioned join back on sh,
    then a doc-keyed count — never doc×doc. Docs with <3 tokens have no
    shingles and are absent in both engines; n_sh ≥ 1 for every emitted
    row, so the per-mille needs no zero guard."""
    fs = shingles.groupBy("sh").agg(F.min("doc_id").alias("first_doc"))
    per = (
        shingles.join(fs, "sh")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_sh"),
            F.sum((F.col("first_doc") == F.col("doc_id")).cast("long"))
            .cast("long")
            .alias("n_novel"),
        )
    )
    return per.select(
        "doc_id",
        "n_sh",
        "n_novel",
        F.expr("1000 * n_novel DIV n_sh").alias("novelty_permille"),
    )


def shingle_novelty_sql(ds_cte_name: str = "ds") -> str:
    """DuckDB oracle tail for :func:`shingle_novelty`; the caller's WITH
    context must define ``ds_cte_name`` as the distinct (doc_id, sh)
    shingle CTE (the shared _DS_CTE convention)."""
    return f"""SELECT doc_id, n_sh, n_novel,
       1000 * n_novel // n_sh AS novelty_permille
FROM (SELECT {ds_cte_name}.doc_id, CAST(count(*) AS BIGINT) AS n_sh,
             CAST(sum(CASE WHEN fs.first_doc = {ds_cte_name}.doc_id
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_novel
      FROM {ds_cte_name}
      JOIN (SELECT sh, min(doc_id) AS first_doc
            FROM {ds_cte_name} GROUP BY sh) fs USING (sh)
      GROUP BY {ds_cte_name}.doc_id)"""
