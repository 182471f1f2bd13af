"""x121 streamed HLL: the register state must equal the batch register
build even when the replay is split across MANY micro-batches (the
elementwise-max mergeability claim — commutative, associative,
duplicate-insensitive, so not even arrival order matters). Single-replay
oracle parity is covered by test_core_queries."""

from tests.stream_replay import run_split_replay

from mariadb_postgres_migration_spark.sources.parquet import read_parquet_table
from mariadb_postgres_migration_spark.streaming.jobs import stream_hll_registers


def test_hll_registers_accumulate_across_micro_batches(spark, sf_dir, tmp_path):
    docs = read_parquet_table(spark, sf_dir, "documents")
    src_dir = str(tmp_path / "doc_files")
    docs.repartition(3).write.parquet(src_dir)  # >= 3 data files

    batch = sorted(map(tuple, stream_hll_registers(docs).collect()))
    n_batches, rows = run_split_replay(
        spark, src_dir, docs.schema, stream_hll_registers, "complete"
    )
    assert n_batches >= 3, f"replay was not split ({n_batches} batches)"
    assert sorted(map(tuple, rows)) == batch


def test_hll_register_merge_is_duplicate_insensitive(spark):
    # pre_distinct=False (the streaming form) must equal the batch
    # distinct form: a max cannot observe duplicates
    from mariadb_postgres_migration_spark.operators.sketches import hll_registers

    rows = [("g", i % 50) for i in range(500)]  # heavy duplication
    df = spark.createDataFrame(rows, "g string, k long")
    a = sorted(map(tuple, hll_registers(df, ["g"], "k").collect()))
    b = sorted(map(tuple, hll_registers(df, ["g"], "k", pre_distinct=False).collect()))
    assert a == b
