"""Shared split-replay harness for the streamed-operator equivalence
tests: replay a multi-file parquet directory one file per micro-batch
(availableNow + maxFilesPerTrigger=1) through a streaming aggregation
into a uuid-named memory sink, return the non-empty batch count and the
collected rows, and drop the temp view (the memory sink otherwise pins
its results in the driver for the session's lifetime)."""

import tempfile
import uuid


def run_split_replay(spark, src_dir, schema, agg, output_mode, post=None):
    """``agg``: streaming DataFrame -> DataFrame. ``post``: optional
    final-table transform applied before collect (e.g. latest-emit-per-
    key selection). Returns ``(n_nonempty_batches, rows)``."""
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")  # one micro-batch PER FILE
        .parquet(src_dir)
    )
    name = f"rp_{uuid.uuid4().hex[:10]}"
    with tempfile.TemporaryDirectory(prefix="mps_ckpt_") as ckpt:
        q = (
            agg(stream)
            .writeStream.format("memory")
            .queryName(name)
            .outputMode(output_mode)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        n_batches = len(
            [p for p in q.recentProgress if p["numInputRows"] > 0]
        )
        tbl = spark.table(name)
        rows = (post(tbl) if post is not None else tbl).collect()
        spark.catalog.dropTempView(name)
    return n_batches, rows
