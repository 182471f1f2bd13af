"""x101 streamed KMV sketch: the per-language k-min state must equal the
batch sketch even when the replay is split across MANY micro-batches —
AND across a shuffled file order, because k-min set union is commutative
and associative (the stronger claim x73/x82 cannot make: this stateful
operator has NO arrival-order assumption). Single-replay oracle parity
is covered by test_core_queries."""

from pyspark.sql import Window
from pyspark.sql import functions as F

from tests.stream_replay import run_split_replay

from mariadb_postgres_migration_spark.sources.parquet import read_parquet_table
from mariadb_postgres_migration_spark.streaming.jobs import stream_kmv_state


def _latest_per_lang(tbl):
    w = Window.partitionBy("lang").orderBy(F.desc("emit"))
    return (
        tbl.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select("lang", "k_used", "kth_hash", "est_distinct")
    )


def test_kmv_state_is_split_invariant(spark, sf_dir, tmp_path):
    from mariadb_postgres_migration_spark.streaming.jobs import run_stream_kmv

    docs = read_parquet_table(spark, sf_dir, "documents")
    src_dir = str(tmp_path / "doc_files")
    docs.repartition(4).write.parquet(src_dir)  # >= 4 data files

    # one-batch ground truth: documents.parquet is a single file, so the
    # registered runner's availableNow replay is exactly one micro-batch
    whole = sorted(map(tuple, run_stream_kmv(spark, sf_dir).collect()))
    n_batches, rows = run_split_replay(
        spark, src_dir, docs.schema, stream_kmv_state, "append",
        post=_latest_per_lang,
    )
    assert n_batches >= 4, f"replay was not split ({n_batches} batches)"
    assert sorted(map(tuple, rows)) == whole


def test_kmv_state_small_lang_is_exact_count(spark, tmp_path):
    # a language with < k distinct normalized texts must report
    # est_distinct == k_used == the true distinct count (sketch = full set)
    rows = [(i, "xx", f"text {i % 7}") for i in range(50)]
    docs = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    src_dir = str(tmp_path / "tiny")
    docs.repartition(2).write.parquet(src_dir)
    _, out = run_split_replay(
        spark, src_dir, docs.schema, stream_kmv_state, "append",
        post=_latest_per_lang,
    )
    [(lang, k_used, kth, est)] = [tuple(r) for r in out]
    assert (lang, k_used, est) == ("xx", 7, 7)
