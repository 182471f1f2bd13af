"""x141 streamed split manifest: the (split, source) ledger must equal
the batch manifest even when the replay is split across MANY
micro-batches (both aggregates are additive, so not even arrival order
matters). Single-replay oracle parity is covered by test_core_queries."""

from tests.stream_replay import run_split_replay

from mariadb_postgres_migration_spark.sources.parquet import read_parquet_table
from mariadb_postgres_migration_spark.streaming.jobs import stream_split_manifest


def test_split_manifest_accumulates_across_micro_batches(spark, sf_dir, tmp_path):
    docs = read_parquet_table(spark, sf_dir, "documents")
    src_dir = str(tmp_path / "doc_files")
    docs.repartition(3).write.parquet(src_dir)  # >= 3 data files

    batch = sorted(map(tuple, stream_split_manifest(docs).collect()))
    n_batches, rows = run_split_replay(
        spark, src_dir, docs.schema, stream_split_manifest, "complete"
    )
    assert n_batches >= 3, f"replay was not split ({n_batches} batches)"
    assert sorted(map(tuple, rows)) == batch
