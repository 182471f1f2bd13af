"""EXT-05 additions: Gopher-style repetition filter and deterministic
stratified sampling — operator-level properties the oracle parity test
(test_core_queries) can't express: nested samples across rates, stability
under repartitioning, and short-doc edge cases."""

from pyspark.sql import Row
from pyspark.sql import functions as F

from mariadb_postgres_migration_spark.operators.textanalysis import (
    repetition_stats,
    stratified_sample,
)
from mariadb_postgres_migration_spark.sources.parquet import read_parquet_table


def test_repetition_short_and_degenerate_docs(spark):
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="word"),  # 1 token: no 2-grams
            Row(doc_id=2, text="a a a a a a"),  # maximal repetition
            Row(doc_id=3, text="one two three four"),  # all distinct
        ]
    )
    out = {r["doc_id"]: r for r in repetition_stats(docs).collect()}
    assert out[1]["n_grams"] == 0 and out[1]["rep_ratio"] == 0.0
    assert out[1]["ttr"] == 1.0
    # 5 grams, all "a a" → rep_ratio 1.0; ttr 1/6
    assert out[2]["n_grams"] == 5 and out[2]["top_gram_n"] == 5
    assert out[2]["rep_ratio"] == 1.0 and not out[2]["keep"]
    assert out[3]["rep_ratio"] == round(1 / 3, 4)  # 3 grams, each once
    assert out[3]["ttr"] == 1.0


def test_stratified_sample_nested_and_partition_stable(spark, sf_dir):
    docs = read_parquet_table(spark, sf_dir, "documents")
    half = {r["doc_id"] for r in stratified_sample(
        docs, cutoffs={}, default_cutoff="80000000").collect()}
    quarter = {r["doc_id"] for r in stratified_sample(
        docs, cutoffs={}, default_cutoff="40000000").collect()}
    assert quarter <= half, "lower rate must be a subset (nested samples)"
    n = docs.count()
    assert 0.4 * n < len(half) < 0.6 * n
    assert 0.15 * n < len(quarter) < 0.35 * n
    # repartitioning must not change the sample (unlike DataFrame.sample)
    re = {r["doc_id"] for r in stratified_sample(
        docs.repartition(13), cutoffs={}, default_cutoff="80000000").collect()}
    assert re == half


def test_stratified_sample_per_stratum_cutoff(spark, sf_dir):
    docs = read_parquet_table(spark, sf_dir, "documents")
    out = stratified_sample(docs)  # en≈0.5, others≈0.25
    rates = {
        r["lang"]: r["rate"]
        for r in out.groupBy("lang")
        .agg(F.count("*").alias("kept"))
        .join(docs.groupBy("lang").agg(F.count("*").alias("tot")), "lang")
        .select("lang", (F.col("kept") / F.col("tot")).alias("rate"))
        .collect()
    }
    assert rates["en"] > 0.35
    for lang, rate in rates.items():
        if lang != "en":
            assert rate < 0.4


def test_unigram_logprob_hand_computed(spark):
    """Exact check on a 3-doc corpus: freq table {a:3, b:2, c:1}/6; doc
    scores are means of ln(p); the empty doc keeps a zero-filled row."""
    import math

    from pyspark.sql import Row

    from mariadb_postgres_migration_spark.operators.textanalysis import (
        unigram_logprob,
    )

    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="a a b"),
            Row(doc_id=2, text="a b c"),
        ]
    )
    out = {r["doc_id"]: r for r in unigram_logprob(docs).collect()}
    lp = {"a": math.log(3 / 6), "b": math.log(2 / 6), "c": math.log(1 / 6)}
    assert out[1]["n_tok"] == 3
    assert out[1]["avg_logp"] == round((2 * lp["a"] + lp["b"]) / 3, 4)
    assert out[2]["n_tok"] == 3
    assert out[2]["avg_logp"] == round((lp["a"] + lp["b"] + lp["c"]) / 3, 4)


def test_bm25_hand_computed_and_distributed_topk(spark):
    """BM25 on a 3-doc corpus against the closed-form formula, and the
    plan must take the distributed TakeOrdered path (no unpartitioned
    row_number window over the full candidate set)."""
    import math

    from pyspark.sql import Row

    from mariadb_postgres_migration_spark.operators.textanalysis import bm25_topk

    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="spark spark hash"),
            Row(doc_id=2, text="hash join join join"),
            Row(doc_id=3, text="sort sort sort sort"),
        ]
    )
    out = bm25_topk(docs, ("spark", "hash"), top_k=2)
    rows = {r["doc_id"]: r for r in out.collect()}

    def score(tfs, dl, N=3.0, avgdl=11 / 3, k1=1.2, b=0.75):
        dfs = {"spark": 1.0, "hash": 2.0}
        return round(
            sum(
                math.log(1.0 + (N - dfs[t] + 0.5) / (dfs[t] + 0.5))
                * (tf * (k1 + 1.0))
                / (tf + k1 * (1.0 - b + b * dl / avgdl))
                for t, tf in tfs.items()
            ),
            4,
        )

    assert set(rows) == {1, 2}  # doc 3 has no query term; top_k=2
    assert rows[1]["score"] == score({"spark": 2.0, "hash": 1.0}, 3.0)
    assert rows[2]["score"] == score({"hash": 1.0}, 4.0)
    assert rows[1]["rk"] == 1 and rows[2]["rk"] == 2
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
