"""x73 streamed funnel: the stateful stream must equal the batch window
cascade even when the in-order replay is split across micro-batches.
Single-replay oracle parity is covered by test_core_queries."""

from pyspark.sql import Window
from pyspark.sql import functions as F

from tests.stream_replay import run_split_replay

from mariadb_postgres_migration_spark.audit_queries import funnel_stages
from mariadb_postgres_migration_spark.sources.parquet import read_parquet_table
from mariadb_postgres_migration_spark.streaming.jobs import funnel_state_stream


def test_stream_funnel_matches_batch_across_time_ordered_batches(
    spark, sf_dir, tmp_path
):
    events = read_parquet_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    us = F.unix_micros(F.col("ts").cast("timestamp"))

    # three sequential time slices written one after another (ascending
    # mtime), so maxFilesPerTrigger=1 replays them in time order — the
    # streaming funnel's arrival contract
    lo, hi = events.agg(F.min(us), F.max(us)).collect()[0]
    cut1, cut2 = lo + (hi - lo) // 3, lo + 2 * (hi - lo) // 3
    src = str(tmp_path / "slices")
    for pred in [us <= cut1, (us > cut1) & (us <= cut2), us > cut2]:
        events.filter(pred).coalesce(1).write.mode("append").parquet(src)

    w = Window.partitionBy("user_id").orderBy(F.desc("emit"))
    n_batches, rows = run_split_replay(
        spark, src, events.schema, funnel_state_stream, "append",
        post=lambda t: (
            t.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .select("user_id", "stage", "t1_us", "t2_us", "t3_us")
        ),
    )
    streamed = sorted(map(tuple, rows))
    assert n_batches >= 3, f"replay was not split ({n_batches} non-empty batches)"

    batch = sorted(
        map(
            tuple,
            funnel_stages(
                events.select("user_id", us.alias("us"), "event_type")
            ).collect(),
        )
    )
    assert streamed == batch
