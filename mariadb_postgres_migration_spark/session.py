"""SparkSession factory with scale-oriented defaults.

The reference (/root/reference/src/index.mjs:9-12) opens two DB pools and does
all transforms single-threaded on the Node event loop, fully materializing
every table in heap. Here the session is configured so Catalyst + AQE own the
physical strategy: adaptive shuffle coalescing, skew-join splitting, Arrow for
any Python exchange, and UTC so timestamp arithmetic is reproducible across
engines (the DuckDB oracle is timezone-naive).
"""

from __future__ import annotations

from pyspark.sql import SparkSession

#: Defaults applied to every engine session. Sized for local[32]/128GiB test
#: rig but chosen to be the *right* settings on a 1000-executor cluster too:
#: AQE picks runtime shuffle partition counts, so the static
#: ``spark.sql.shuffle.partitions`` is only an upper bound pre-coalesce.
ENGINE_CONF: dict[str, str] = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.parquet.filterPushdown": "true",
    # NOTE: parquet aggregate pushdown (MIN/MAX/COUNT from footers) only
    # exists in the DSv2 scan, and parquet stays on the v1 path unless
    # spark.sql.sources.useV1SourceList excludes it — setting the conf
    # alone was inert and claimed an optimization the engine never got
    # (review r5). The v1 path is kept deliberately: it is the tested,
    # default-everywhere reader.
    "spark.sql.session.timeZone": "UTC",
    # small dims (region/nation/playlists-analog) must broadcast; 64 MiB keeps
    # genuinely-large build sides on the shuffle path.
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    "spark.sql.shuffle.partitions": "64",
    # 128 MiB input splits: at 100 TB that is ~800k tasks, the sane default.
    "spark.sql.files.maxPartitionBytes": str(128 * 1024 * 1024),
}


def tws_available() -> bool:
    """Whether Spark 4's ``transformWithStateInPandas`` successor API can
    run here: its state server needs the ``protobuf`` Python package,
    absent from the current container (streaming/jobs.py documents the
    probe). bench.py logs this each run so the round the environment
    gains the dependency, the x73/x82 migration (pre-written in SCALE.md)
    becomes a same-round task instead of a rediscovery."""
    try:
        import google.protobuf  # noqa: F401

        return True
    except ImportError:
        return False


def get_session(
    app_name: str = "mps-engine",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults.

    ``master`` is only set when given so the engine also runs under an
    externally-managed session (the driver harness passes its own).
    """
    builder = SparkSession.builder.appName(app_name)
    if master:
        builder = builder.master(master)
    conf = dict(ENGINE_CONF)
    if shuffle_partitions is not None:
        conf["spark.sql.shuffle.partitions"] = str(shuffle_partitions)
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
