"""x91 streamed CMS: the counter state must equal the batch counter
table even when the replay is split across MANY micro-batches (the
additive-counter mergeability claim). Single-replay oracle parity is
covered by test_core_queries."""

from tests.stream_replay import run_split_replay

from mariadb_postgres_migration_spark.sources.parquet import read_parquet_table
from mariadb_postgres_migration_spark.streaming.jobs import stream_cms_counters


def test_cms_state_accumulates_across_micro_batches(spark, sf_dir, tmp_path):
    docs = read_parquet_table(spark, sf_dir, "documents")
    src_dir = str(tmp_path / "doc_files")
    docs.repartition(3).write.parquet(src_dir)  # >= 3 data files

    batch = sorted(map(tuple, stream_cms_counters(docs).collect()))
    n_batches, rows = run_split_replay(
        spark, src_dir, docs.schema, stream_cms_counters, "complete"
    )
    assert n_batches >= 3, f"replay was not split ({n_batches} batches)"
    assert sorted(map(tuple, rows)) == batch
