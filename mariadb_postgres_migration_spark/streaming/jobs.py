"""Structured Streaming jobs (SURVEY.md §2.10 EXT-06..09).

The reference is strictly batch; this is the engine's streaming surface over
the ``events`` table shape: tumbling/sliding windows with watermarks,
session windows, and stateful dedup. Each job reads the same parquet as a
file-source stream (``availableNow`` trigger replays it as a bounded
stream), so semantics are testable without an unbounded source; in
production the source line changes to Kafka/files-on-arrival and the
trigger to continuous micro-batches — the transformations stay identical.

Memory-sink collection is test-scale only; production sinks are
``writeStream.format("parquet"/"kafka")`` with checkpointing.
"""

from __future__ import annotations

import os
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schemas import FIXTURE_SCHEMAS
from ..sources.parquet import (
    _ensure_read_conf,
    events_schema,
    events_ts_storage_type,
    normalize_events_ts,
)


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over events.parquet (schema pinned — required for
    streaming reads; ts normalized from its on-disk representation exactly
    like the batch reader)."""
    _ensure_read_conf(spark)
    ts_type = events_ts_storage_type(spark, os.path.join(sf_dir, "events.parquet"))
    # The fixture is a single file; the streaming file source requires a
    # directory basePath, so point at sf_dir and glob-filter to the table.
    df = (
        spark.readStream.schema(events_schema(ts_type))
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    return normalize_events_ts(df)


#: Target bytes of stream input per stateful shuffle partition. Streaming
#: has no AQE: every stateful operator keys its state stores to
#: ``spark.sql.shuffle.partitions`` AT STREAM START, and each partition
#: owns a state store whose per-micro-batch init/commit/checkpoint I/O is
#: paid whether or not rows arrive (a stream-stream join keeps FOUR stores
#: per partition). The batch side coalesces tiny shuffles adaptively; the
#: streaming side needs the equivalent derived up front.
_STREAM_BYTES_PER_PARTITION = 32 << 20


def _stream_shuffle_partitions(
    spark: SparkSession,
    sf_dir: str,
    table: str = "events",
    python_state: bool = False,
) -> int | None:
    """Scale-adaptive stateful-shuffle partition count for a bounded
    replay over ``sf_dir/<table>.parquet``: ceil(input_bytes / 32 MiB),
    floored at 4 (pipelining on a near-empty fixture), capped at the
    session's configured ``spark.sql.shuffle.partitions`` (the cluster-
    sized upper bound — at 100 TB the byte rule hits the cap and the
    session conf governs, exactly like the batch side's pre-AQE bound).

    ``python_state=True`` (the ``applyInPandasWithState`` runners) raises
    the floor to the session's core count: those operators do heavy
    per-group PYTHON compute, and the partition count is also the number
    of parallel Python workers — the measured x24 A/B showed the 4-floor
    costing ~30% there while the JVM-stateful rows want the small count
    (state-store init/commit dominates their tiny inputs).

    ``MPS_STREAM_SHUFFLE_PARTITIONS`` overrides for A/Bs and production
    tuning; returns None (leave the session conf alone) if the source
    file cannot be statted."""
    env = os.environ.get("MPS_STREAM_SHUFFLE_PARTITIONS")
    if env:
        return max(1, int(env))
    try:
        size = os.path.getsize(os.path.join(sf_dir, f"{table}.parquet"))
    except OSError:
        return None
    cap = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    floor = (
        spark.sparkContext.defaultParallelism if python_state else 4
    )
    derived = -(-size // _STREAM_BYTES_PER_PARTITION)
    return min(cap, max(floor, derived))


def _run_to_memory(
    result: DataFrame,
    output_mode: str,
    sf_dir: str | None = None,
    table: str = "events",
    python_state: bool = False,
) -> DataFrame:
    """Run a bounded stream to completion into a memory sink, return the
    materialized result as a DataFrame. When ``sf_dir`` is given, the
    stream starts under the scale-adaptive stateful-shuffle partition
    count (:func:`_stream_shuffle_partitions`); the session conf is
    restored afterwards, so batch plans in the same session never see the
    override. Partition count never changes what a stateful aggregation /
    dedup / join computes — only how many state stores carry it."""
    spark = result.sparkSession
    name = f"mem_{uuid.uuid4().hex[:12]}"
    conf_key = "spark.sql.shuffle.partitions"
    n = (
        _stream_shuffle_partitions(spark, sf_dir, table, python_state)
        if sf_dir
        else None
    )
    prev = spark.conf.get(conf_key, None) if n is not None else None
    with tempfile.TemporaryDirectory(prefix="mps_ckpt_") as ckpt:
        try:
            if n is not None:
                spark.conf.set(conf_key, str(n))
            q = (
                result.writeStream.format("memory")
                .queryName(name)
                .outputMode(output_mode)
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
        finally:
            if n is not None and prev is not None:
                spark.conf.set(conf_key, prev)
        # detach the result from the memory-sink view (localCheckpoint
        # truncates lineage to materialized blocks) and DROP the view —
        # otherwise every streaming run pins its full result set in the
        # driver for the session's lifetime; checkpoint blocks are instead
        # reclaimed by the ContextCleaner once the DataFrame is GC'd
        out = spark.table(name).localCheckpoint(eager=True)
        spark.catalog.dropTempView(name)
        return out


def run_stream_to_jdbc_upsert(
    spark: SparkSession,
    sf_dir: str,
    sink,
    keys: tuple[str, ...] = ("event_id",),
) -> None:
    """Streaming → JDBC sink with idempotent upsert via ``foreachBatch``.

    Spark has no native JDBC streaming sink; ``foreachBatch`` hands each
    micro-batch to the batch upsert writer (sources/jdbc.write_jdbc_upsert:
    in-batch dedup → anti-join against current sink keys → batched append).
    Because the write is keyed-idempotent, a micro-batch REPLAYED after a
    failure (or a whole-stream restart from a fresh checkpoint) inserts
    nothing twice — at-least-once delivery from the engine becomes
    exactly-once EFFECT in the sink, which is the standard Structured
    Streaming exactly-once recipe for non-transactional sinks. Live-tested
    end-to-end against embedded Derby (tests/test_stream_jdbc.py)."""
    from ..sources.jdbc import write_jdbc_upsert

    events = read_events_stream(spark, sf_dir).select(
        "event_id", "user_id", "event_type", "value"
    )

    def _upsert(batch_df: DataFrame, _batch_id: int) -> None:
        write_jdbc_upsert(batch_df, sink, list(keys), batch_df.sparkSession)

    with tempfile.TemporaryDirectory(prefix="mps_ckpt_") as ckpt:
        q = (
            events.writeStream.foreachBatch(_upsert)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()


def run_tumbling_stream(
    spark: SparkSession, sf_dir: str, width_s: int = 600, watermark: str = "30 minutes"
) -> DataFrame:
    """EXT-06/08: watermarked tumbling-window count/sum as a real streaming
    query. With availableNow over a bounded source, complete-mode output
    equals the batch aggregation — the oracle-checkable invariant."""
    events = read_events_stream(spark, sf_dir)
    agg = (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", f"{width_s} seconds").alias("w"))
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.unix_micros(F.col("w.start")).alias("window_start_us"),
            "n_events",
            "sum_value",
        )
    )
    return _run_to_memory(agg, "complete", sf_dir)


def run_session_window_stream(
    spark: SparkSession, sf_dir: str, gap_s: int = 1800, watermark: str = "60 minutes"
) -> DataFrame:
    """EXT-07: native ``session_window`` (streaming-only operator — the
    batch analog is operators/windows.session_window_agg)."""
    events = read_events_stream(spark, sf_dir)
    agg = (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", f"{gap_s} seconds").alias("w"), F.col("user_id"))
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.unix_micros(F.col("w.start")).alias("session_start_us"),
            "n_events",
        )
    )
    return _run_to_memory(agg, "complete", sf_dir)


def run_stream_dedup(
    spark: SparkSession, sf_dir: str, watermark: str = "60 minutes"
) -> DataFrame:
    """EXT-09: stateful streaming dedup on (user_id, event_type) within the
    watermark — ``dropDuplicatesWithinWatermark`` keeps state bounded (the
    unbounded-state version of dropDuplicates would OOM a real stream)."""
    events = read_events_stream(spark, sf_dir)
    deduped = events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["user_id", "event_type"]
    )
    counted = deduped.groupBy("user_id").agg(F.count("*").alias("n_unique_types"))
    return _run_to_memory(counted, "complete", sf_dir)

def run_sliding_stream(
    spark: SparkSession,
    sf_dir: str,
    width_s: int = 600,
    slide_s: int = 300,
    watermark: str = "30 minutes",
) -> DataFrame:
    """EXT-06: watermarked SLIDING window — each event lands in
    width/slide overlapping windows; Spark expands the assignment inside
    the aggregate (no self-union of the stream)."""
    events = read_events_stream(spark, sf_dir)
    agg = (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", f"{width_s} seconds", f"{slide_s} seconds").alias("w"))
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.unix_micros(F.col("w.start")).alias("window_start_us"),
            "n_events",
            "sum_value",
        )
    )
    return _run_to_memory(agg, "complete", sf_dir)


def run_stream_stream_join(
    spark: SparkSession,
    sf_dir: str,
    lookback_s: int = 1800,
    watermark: str = "60 minutes",
) -> DataFrame:
    """EXT-08/09: stream-stream inner join — each purchase pairs with the
    same user's clicks in the preceding ``lookback_s`` seconds. Both sides
    carry watermarks and the join has an event-time range condition, which
    is what lets Spark expire buffered state (without it, stream-stream
    join state grows forever). Bounded availableNow replay emits exactly
    the batch interval-join result."""
    events = read_events_stream(spark, sf_dir)
    p = (
        events.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", watermark)
    )
    c = (
        events.filter(F.col("event_type") == "click")
        .select(F.col("event_id").alias("click_id"), "user_id", F.col("ts").alias("c_ts"))
        .withWatermark("c_ts", watermark)
    )
    joined = p.join(
        c,
        (F.col("p_user") == F.col("user_id"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr(f"INTERVAL {lookback_s} SECONDS"))
        & (F.col("c_ts") <= F.col("p_ts")),
    )
    out = joined.select(
        "purchase_id",
        "click_id",
        F.unix_micros("p_ts").alias("p_ts_us"),
        F.unix_micros("c_ts").alias("c_ts_us"),
    )
    return _run_to_memory(out, "append", sf_dir)


def run_stateful_seq_stream(
    spark: SparkSession, sf_dir: str, watermark: str = "60 minutes"
) -> DataFrame:
    """EXT-09: CUSTOM stateful operator via ``applyInPandasWithState`` —
    a per-user monotone sequence number that survives across micro-batches
    (the state is the count so far; each batch's rows are ordered by
    (ts, event_id) and numbered from it). This is the extension point for
    operators Spark lacks natively — e.g. a streamed OP-20 comment-threading
    would keep the per-video alive-comment list in exactly this state slot.
    On a bounded single-batch replay the output equals batch
    ``row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)``,
    which is the oracle form."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    events = read_events_stream(spark, sf_dir)

    def assign_seq(key, pdf_iter, state):
        n = state.get[0] if state.exists else 0
        rows = pd.concat(list(pdf_iter)).sort_values(["ts", "event_id"])
        seq = list(range(n + 1, n + 1 + len(rows)))
        state.update((n + len(rows),))
        yield pd.DataFrame(
            {"user_id": rows["user_id"], "event_id": rows["event_id"], "seq": seq}
        )

    res = (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            assign_seq,
            "user_id BIGINT, event_id BIGINT, seq BIGINT",
            "n BIGINT",
            "append",
            GroupStateTimeout.NoTimeout,
        )
    )
    return _run_to_memory(res, "append", sf_dir, python_state=True)

def run_stream_threading(
    spark: SparkSession, sf_dir: str, watermark: str = "60 minutes"
) -> DataFrame:
    """EXT-09: STREAMED OP-20 — the reference's comment-threading walk
    (index.mjs:62-78) as a stateful streaming operator. Per video, group
    state carries the (id, deleted_us) of every comment seen so far; each
    micro-batch's new comments resolve their caret backrefs against
    state + batch via the same pure-Python walk the property tests pin
    (operators/threading.resolve_backrefs_py). Prior comments' content and
    creation times don't matter to later rows (only their id/deleted_us do)
    — that's what makes the state O(comments) small instead of
    O(full rows). deleted_us=NULL is carried as -1 (state array slots are
    non-null longs). Comments are synthesized from events exactly like the
    batch op20 query, so a bounded replay matches the batch oracle."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    from ..operators.threading import resolve_backrefs_py

    events = read_events_stream(spark, sf_dir)
    comments = events.select(
        F.col("ts"),
        F.col("event_id").alias("id"),
        F.col("user_id").alias("video_id"),
        F.repeat(F.lit("^"), (F.col("event_id") % 4).cast("int")).alias("content"),
        F.unix_micros("ts").alias("created_us"),
        F.when(
            F.col("event_id") % 10 == 0,
            F.unix_micros("ts") + (F.col("event_id") % 3) * 3600000000,
        ).alias("deleted_us"),
    )

    def thread_group(key, pdf_iter, state):
        prior_ids, prior_dels = state.get if state.exists else ([], [])
        prior_ids, prior_dels = list(prior_ids), list(prior_dels)
        rows = pd.concat(list(pdf_iter)).sort_values("id")
        ids = [int(i) for i in rows["id"]]
        dels = [None if pd.isna(d) else int(d) for d in rows["deleted_us"]]
        resp = resolve_backrefs_py(
            prior_ids + ids,
            [""] * len(prior_ids) + rows["content"].tolist(),
            [0] * len(prior_ids) + [int(c) for c in rows["created_us"]],
            [None if d == -1 else d for d in prior_dels] + dels,
        )[len(prior_ids):]
        state.update(
            (prior_ids + ids, prior_dels + [-1 if d is None else d for d in dels])
        )
        yield pd.DataFrame(
            {"id": ids, "response_to": pd.array(resp, dtype="Int64")}
        )

    res = (
        comments.withWatermark("ts", watermark)
        .groupBy("video_id")
        .applyInPandasWithState(
            thread_group,
            "id BIGINT, response_to BIGINT",
            "ids ARRAY<BIGINT>, dels ARRAY<BIGINT>",
            "append",
            GroupStateTimeout.NoTimeout,
        )
    )
    return _run_to_memory(res, "append", sf_dir, python_state=True)


def read_documents_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over documents.parquet (schema pinned, same
    glob-filter trick as the events stream)."""
    _ensure_read_conf(spark)
    return (
        spark.readStream.schema(FIXTURE_SCHEMAS["documents"])
        .option("pathGlobFilter", "documents.parquet")
        .parquet(sf_dir)
    )


def run_stream_transform(docs_stream: DataFrame, transform) -> DataFrame:
    """Run a STATELESS row-local transform over a bounded document stream
    (append mode — no watermark needed because no state exists). The point
    being demonstrated: every row-local operator in this engine (PII scrub,
    quality scoring, chunking, ...) composes with Structured Streaming
    unchanged — the same Column expressions plan into each micro-batch."""
    return _run_to_memory(transform(docs_stream), "append")


def run_stream_incremental_dedup(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """EXT-01/EXT-08: streamed nightly-ingest dedup — the streaming form of
    the x45 batch check. The incoming crawl (doc_id % 10 >= 8) arrives as a
    bounded document stream; each batch's fingerprints are (a) collapsed
    within-stream to the min-doc_id winner per fingerprint (a streaming
    aggregation — deterministic, unlike arrival-order dropDuplicates) and
    (b) flagged against the accumulated corpus (doc_id % 10 < 8) via a
    STREAM-STATIC join on the distinct corpus fingerprint index.

    Scale shape: the static side is the fingerprint index a production
    pipeline keeps bucketed on disk (sources/bucketed.py) — the
    stream-static join plans it as a build side per micro-batch with zero
    corpus re-shuffle, and the within-stream aggregation state is bounded
    by distinct fingerprints per replay window."""
    from ..functions.text import normalize_text
    from ..sources.parquet import read_parquet_table

    fp = F.md5(normalize_text(F.col("text")))
    corpus_fp = (
        read_parquet_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 10 < 8)
        .select(fp.alias("ofp"))
        .distinct()
    )
    new = (
        read_documents_stream(spark, sf_dir)
        .filter(F.col("doc_id") % 10 >= 8)
        .select("doc_id", "source", fp.alias("fp"))
    )
    flagged = new.join(
        F.broadcast(corpus_fp), new.fp == F.col("ofp"), "left"  # bounded: small-index tier by contract (x72 Bloom / x83 bucketed index are the scale tiers)
    ).select(
        "doc_id", "source", "fp", F.col("ofp").isNotNull().alias("is_dup")
    )
    kept = (
        flagged.groupBy("fp")
        .agg(
            F.min("doc_id").alias("doc_id"),
            F.min_by("source", "doc_id").alias("source"),
            # same per fp group by construction (flag depends only on fp)
            F.first("is_dup").alias("is_dup_of_corpus"),
        )
        .select("doc_id", "source", "is_dup_of_corpus")
    )
    return _run_to_memory(kept, "complete", sf_dir, table="documents")


def run_stream_checksum(
    spark: SparkSession, sf_dir: str, n_buckets: int = 64
) -> DataFrame:
    """Continuously-maintained table checksum over the events ingest
    stream (EXT-08/09 meets the x66 reconciliation surface).

    XOR is its own inverse and order-independent, so the per-bucket
    (count, xor-of-digest-chunks) aggregate is EXACTLY maintainable as
    streaming state: each micro-batch folds its rows into the bucket
    accumulators and the state is forever bucket-count-sized, never
    row-count-sized. After the bounded availableNow replay the state
    must equal the batch checksum of the same table — the oracle — and
    in production the standing query's state IS the live source-side
    checksum that x66-style comparison reads instead of rescanning
    100 TB."""
    ev = read_events_stream(spark, sf_dir)
    return _run_to_memory(
        events_checksum_agg(ev, n_buckets), "complete", sf_dir
    )


def events_checksum_agg(ev: DataFrame, n_buckets: int = 64) -> DataFrame:
    """The bucketed-XOR checksum aggregation over an events-shaped frame —
    works unchanged on a batch OR streaming DataFrame (the multi-micro-
    batch accumulation equivalence is pinned in tests/test_stream_checksum
    by replaying a 3-file directory one file per trigger)."""
    from ..operators.reconcile import CHUNK_OFFSETS, hex_chunk, row_digest

    dg = row_digest(
        F.col("event_id"),
        F.coalesce(F.col("user_id"), F.lit(-1)),
        F.coalesce(F.col("event_type"), F.lit("~")),
        F.coalesce(F.unix_micros(F.col("ts").cast("timestamp")), F.lit(-1)),
        F.coalesce(F.floor(F.col("value") * 100 + 0.5).cast("long"), F.lit(-1)),
        F.coalesce(F.col("props"), F.lit("~")),
    )
    return (
        ev.select(
            F.pmod(F.col("event_id"), F.lit(n_buckets)).cast("long").alias("bucket"),
            hex_chunk(dg, CHUNK_OFFSETS[0]).alias("__c1"),
            hex_chunk(dg, CHUNK_OFFSETS[1]).alias("__c2"),
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.expr("bit_xor(__c1)").alias("x1"),
            F.expr("bit_xor(__c2)").alias("x2"),
        )
    )


FUNNEL_OUT_SCHEMA = (
    "user_id BIGINT, stage BIGINT, t1_us BIGINT, t2_us BIGINT, t3_us BIGINT,"
    " emit BIGINT"
)


def funnel_state_stream(events: DataFrame, stages=("signup", "click", "purchase")):
    """Per-user funnel state machine via ``applyInPandasWithState``
    (EXT-09): state = the three qualifying stage timestamps so far; each
    micro-batch's rows are processed in (ts, event_id) order and advance
    the state monotonically. Assumes in-time-order arrival ACROSS batches
    (the streaming funnel contract everywhere); within a batch, sorting
    makes the first qualifying event the minimum, so a bounded in-order
    replay equals the batch window cascade (x71's oracle) exactly.
    ``emit`` counts state versions so a multi-batch consumer can keep the
    latest row per user."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    s0, s1, s2 = stages

    def step(key, pdf_iter, state):
        t1, t2, t3, n_emit = state.get if state.exists else (-1, -1, -1, 0)
        rows = pd.concat(list(pdf_iter)).sort_values(["us", "event_id"])
        for us, et in zip(rows["us"], rows["event_type"]):
            us = int(us)
            if et == s0 and t1 < 0:
                t1 = us
            elif et == s1 and t1 >= 0 and us > t1 and t2 < 0:
                t2 = us
            elif et == s2 and t2 >= 0 and us > t2 and t3 < 0:
                t3 = us
        n_emit += 1
        state.update((t1, t2, t3, n_emit))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "stage": [(t1 >= 0) + (t2 >= 0) + (t3 >= 0)],
                "t1_us": [t1 if t1 >= 0 else None],
                "t2_us": [t2 if t2 >= 0 else None],
                "t3_us": [t3 if t3 >= 0 else None],
                "emit": [n_emit],
            }
        )

    return (
        events.select(
            "user_id",
            F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
            "event_id",
            "event_type",
        )
        .groupBy("user_id")
        .applyInPandasWithState(
            step,
            FUNNEL_OUT_SCHEMA,
            "t1 BIGINT, t2 BIGINT, t3 BIGINT, n BIGINT",
            "append",
            GroupStateTimeout.NoTimeout,
        )
    )


def run_stream_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded replay of the streamed funnel; keeps each user's LATEST
    state version so the result is the final funnel table whatever the
    micro-batch split was (tests replay one time-ordered file per
    trigger and compare to batch x71)."""
    from pyspark.sql import Window

    events = read_events_stream(spark, sf_dir)
    res = _run_to_memory(
        funnel_state_stream(events), "append", sf_dir, python_state=True
    )
    w = Window.partitionBy("user_id").orderBy(F.desc("emit"))
    return (
        res.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select("user_id", "stage", "t1_us", "t2_us", "t3_us")
    )


def run_stream_windowed_topk(
    spark: SparkSession,
    sf_dir: str,
    width_s: int = 3600,
    k: int = 3,
    watermark: str = "30 minutes",
) -> DataFrame:
    """EXT-06 meets the heavy-hitter surface: per tumbling window, the
    top-k interacted items (events' ``props.k``) by count.

    The STREAMING side maintains only the (window, item) counts — a
    native watermarked aggregation whose state is windows x items, never
    raw events. Ranking is deliberately OUTSIDE the stream: window
    functions over a streaming aggregate are unsupported (and top-k
    per window needs the window CLOSED anyway), so the rank runs on the
    materialized counts after replay — in production, on each window's
    finalized rows as the watermark passes. Ties break by item id for
    cross-engine rank stability."""
    events = read_events_stream(spark, sf_dir)
    counts = (
        events.withColumn(
            "item", F.get_json_object("props", "$.k").try_cast("long")
        )
        .filter(F.col("item").isNotNull())
        .withWatermark("ts", watermark)
        .groupBy(F.window("ts", f"{width_s} seconds").alias("w"), "item")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .select(
            F.unix_micros(F.col("w.start")).alias("window_start_us"), "item", "n"
        )
    )
    done = _run_to_memory(counts, "complete", sf_dir)
    from pyspark.sql import Window

    wr = Window.partitionBy("window_start_us").orderBy(
        F.desc("n"), F.asc("item")
    )
    return (
        done.withColumn("rk", F.row_number().over(wr).cast("long"))
        .filter(F.col("rk") <= k)
        .select("window_start_us", "rk", "item", "n")
    )


ANOMALY_OUT_SCHEMA = "event_id LONG, user_id LONG, n LONG, anomaly BOOLEAN"


def rolling_anomaly_state_stream(
    events: DataFrame, window: int = 20, min_n: int = 8, z: int = 3
) -> DataFrame:
    """Streamed per-user rolling anomaly flags as an arbitrary-stateful
    operator (``applyInPandasWithState``, like x73's funnel but with a
    RING-BUFFER state shape instead of a stage machine): state per user
    is the trailing ``window`` quantized-cent values, nothing else, so
    streaming state is O(users × window) forever. Each arriving event is
    flagged against the CURRENT baseline with the same pure-integer
    algebra as batch x75 ((n·x−S)² > z²·(n·SS−S²), baseline excludes the
    arriving row), then pushed into the buffer — under in-time-order
    arrival the replay is row-identical to the batch window cascade
    (x75's oracle). Unlike the funnel's one-row-per-batch state
    versioning, this operator emits one row PER EVENT, so append-mode
    output needs no latest-version collapse.

    Spark 4's successor API (``transformWithStateInPandas``) was probed
    first, but its state server requires the ``protobuf`` Python package,
    absent from this container (same environmental class as the JPEG
    codec gap) — the semantics here are API-independent."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    z2 = z * z

    def step(key, pdf_iter, state):
        buf = list(state.get[0]) if state.exists else []
        pdf = pd.concat(list(pdf_iter)).sort_values(["us", "event_id"])
        out = {"event_id": [], "user_id": [], "n": [], "anomaly": []}
        for event_id, cents in zip(pdf["event_id"], pdf["cents"]):
            cents = int(cents)
            n, s = len(buf), sum(buf)
            ss = sum(v * v for v in buf)
            dev = n * cents - s
            flag = n >= min_n and dev * dev > z2 * (n * ss - s * s)
            out["event_id"].append(int(event_id))
            out["user_id"].append(int(key[0]))
            out["n"].append(n)
            out["anomaly"].append(bool(flag))
            buf.append(cents)
            if len(buf) > window:
                buf = buf[-window:]
        state.update((buf,))
        yield pd.DataFrame(out)

    cents = F.floor(F.col("value") * 100 + 0.5).cast("long")
    return (
        events.select(
            "user_id",
            F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
            "event_id",
            cents.alias("cents"),
        )
        .groupBy("user_id")
        .applyInPandasWithState(
            step,
            ANOMALY_OUT_SCHEMA,
            "vals ARRAY<BIGINT>",
            "append",
            GroupStateTimeout.NoTimeout,
        )
    )


def run_stream_rolling_anomaly(
    spark: SparkSession, sf_dir: str, window: int = 20, min_n: int = 8, z: int = 3
) -> DataFrame:
    """Bounded availableNow replay of the streamed rolling anomaly."""
    events = read_events_stream(spark, sf_dir)
    return _run_to_memory(
        rolling_anomaly_state_stream(events, window, min_n, z), "append",
        sf_dir, python_state=True,
    )


def stream_cms_counters(docs: DataFrame) -> DataFrame:
    """The x89 count-min counter aggregation over a documents-shaped
    frame — batch or streaming UNCHANGED: the d×W counters are additive,
    so the complete-mode streaming aggregate accumulates exactly across
    any micro-batch split (the same mergeability that makes the sketch a
    100 TB operator makes it a streaming operator for free). State is
    forever ≤ d·W rows — corpus-size-independent, like x70's buckets."""
    from ..operators.sketches import cms_counters
    from ..operators.textanalysis import _with_tokens

    toked = _with_tokens(docs, "doc_id", "text")
    return cms_counters(toked.select(F.explode(F.col("__toks")).alias("term")))


def run_stream_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuously-maintained CMS over the documents ingest stream,
    replayed bounded (availableNow) and hash-compared to the batch
    counter table — the live term-frequency sketch a curation pipeline
    reads instead of re-counting the corpus (multi-micro-batch
    accumulation equivalence pinned in tests/test_stream_cms.py)."""
    docs = read_documents_stream(spark, sf_dir)
    return _run_to_memory(
        stream_cms_counters(docs), "complete", sf_dir, table="documents"
    )


KMV_STATE_K = 64

KMV_OUT_SCHEMA = (
    "lang STRING, k_used BIGINT, kth_hash BIGINT, est_distinct BIGINT,"
    " emit BIGINT"
)


def stream_kmv_state(docs: DataFrame, k: int = KMV_STATE_K) -> DataFrame:
    """EXT-09: the x87 KMV distinct sketch as STREAMING GROUP STATE — the
    live per-language distinct-CONTENT cardinality a curation pipeline
    reads for dedup-rate forecasting, instead of re-scanning the corpus.
    State per language is the k smallest 32-bit fingerprint hashes seen —
    k longs FOREVER, corpus-size-independent — and merging a batch into
    the state is the same k-min set union that makes KMV mergeable across
    shards (sketches.py), so the replayed sketch is bit-identical to the
    batch sketch under ANY micro-batch split: set union is commutative
    and associative, no arrival-order dependence at all (unlike x73/x82,
    this stateful operator doesn't even need in-time-order arrival).

    The fingerprint hash (md5 of OP-31-normalized text → first 8 hex
    chars as a long) is computed JVM-side BEFORE the stateful step; the
    Python state function only merges longs into a sorted k-list. Each
    batch emits a versioned sketch row per language; the bounded-replay
    runner keeps the latest version (the x73 convention), which equals
    the batch x87-style sketch — the driver pins that equality against
    a plain batch-SQL oracle."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    from ..functions.text import normalize_text_native
    from ..operators.reconcile import hex_chunk
    from ..operators.sketches import HASH_SPACE

    def step(key, pdf_iter, state):
        if state.exists:
            hs, n_emit = set(state.get[0]), state.get[1]
        else:
            hs, n_emit = set(), 0
        for pdf in pdf_iter:
            hs.update(int(h) for h in pdf["h"])
        top = sorted(hs)[:k]
        n_emit += 1
        state.update((top, n_emit))
        k_used = len(top)
        kth = top[-1] if top else 0
        est = k_used if k_used < k else (k - 1) * HASH_SPACE // max(kth, 1)
        yield pd.DataFrame(
            {
                "lang": [key[0]],
                "k_used": [k_used],
                "kth_hash": [kth],
                "est_distinct": [est],
                "emit": [n_emit],
            }
        )

    hashed = docs.select(
        F.coalesce(F.col("lang"), F.lit("~")).alias("lang"),
        hex_chunk(
            F.md5(normalize_text_native(F.coalesce(F.col("text"), F.lit("")))), 1
        ).alias("h"),
    )
    return hashed.groupBy("lang").applyInPandasWithState(
        step,
        KMV_OUT_SCHEMA,
        "top ARRAY<BIGINT>, n BIGINT",
        "append",
        GroupStateTimeout.NoTimeout,
    )


def run_stream_kmv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded availableNow replay of the streamed KMV sketch; keeps each
    language's LATEST state version — the final sketch table, equal to
    the batch computation whatever the micro-batch split was
    (tests/test_stream_kmv.py replays split files)."""
    from pyspark.sql import Window

    docs = read_documents_stream(spark, sf_dir)
    res = _run_to_memory(
        stream_kmv_state(docs), "append", sf_dir, table="documents",
        python_state=True,
    )
    w = Window.partitionBy("lang").orderBy(F.desc("emit"))
    return (
        res.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select("lang", "k_used", "kth_hash", "est_distinct")
    )


def stream_hll_registers(docs: DataFrame) -> DataFrame:
    """EXT-09: the x119 HLL register table maintained over the documents
    ingest stream — register merge is elementwise MAX, so (like the CMS
    counters' additive merge) the complete-mode streaming aggregate
    accumulates exactly across ANY micro-batch split with no
    arrival-order assumption, and state is ≤ m rows per language
    FOREVER. The fourth sketch-as-stream form next to x91 (CMS, sum
    merge), x101 (KMV, k-min set-union merge in arbitrary state) and
    x82 (ring buffer): HLL needs no custom state at all — the register
    law IS a groupBy max, so Spark's own aggregation state machinery
    carries it (one chained aggregation; the batch form's distinct
    pre-pass is skipped, which a max cannot observe —
    sketches.hll_registers)."""
    from ..functions.text import normalize_text_native
    from ..operators.sketches import hll_registers

    base = docs.select(
        F.coalesce(F.col("lang"), F.lit("~")).alias("lang"),
        normalize_text_native(F.coalesce(F.col("text"), F.lit(""))).alias("k"),
    )
    return hll_registers(base, ["lang"], "k", pre_distinct=False)


def run_stream_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded availableNow replay of the streamed HLL registers —
    hash-compared to the batch register build (multi-batch accumulation
    equivalence pinned in tests/test_stream_hll.py)."""
    docs = read_documents_stream(spark, sf_dir)
    return _run_to_memory(
        stream_hll_registers(docs), "complete", sf_dir, table="documents"
    )


def stream_split_manifest(docs: DataFrame) -> DataFrame:
    """EXT-09: the x138 train/val/test split manifest maintained over the
    documents ingest STREAM — both aggregates (doc count, char sum) are
    additive, so the complete-mode streaming aggregate accumulates
    exactly across ANY micro-batch split with no arrival-order
    assumption, and state is 3 × |sources| rows forever. The fifth
    aggregate-as-stream form next to x91 (CMS, sum), x101 (KMV, k-min
    union), x82 (ring buffer) and x121 (HLL, max): the operator a live
    ingest pipeline runs so the split ledger is ALWAYS current — no
    nightly batch recount — and, because membership is pure id-hash
    arithmetic (see operators.textanalysis.split_manifest), the
    streamed ledger provably equals the batch manifest (the oracle)."""
    from ..operators.textanalysis import split_manifest

    # split_manifest is one row-local projection + one additive groupBy —
    # legal unchanged on a streaming frame in complete mode
    return split_manifest(docs)


def run_stream_split_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded availableNow replay of the streamed split manifest —
    hash-compared to the batch manifest (multi-batch accumulation
    equivalence pinned in tests/test_stream_split.py)."""
    docs = read_documents_stream(spark, sf_dir)
    return _run_to_memory(
        stream_split_manifest(docs), "complete", sf_dir, table="documents"
    )
