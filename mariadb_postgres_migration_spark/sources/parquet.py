"""Parquet source/sink (OP-01..04, OP-07 analogs on file storage).

The reference's scans are full-table SELECTs materialized in heap
(/root/reference/src/index.mjs:22,33,61,85 — its core anti-pattern). Here a
"scan" is a lazy DataFrame over parquet: Catalyst prunes columns and pushes
predicates into the scan (verify with ``df.explain`` → ``PushedFilters`` /
``ReadSchema``), so a 2-column projection over 100 TB reads 2 columns.
"""

from __future__ import annotations

import hashlib
import os
import tempfile
import zipfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DataType,
    LongType,
    StructField,
    StructType,
    TimestampNTZType,
)

from ..schemas import FIXTURE_SCHEMAS


def _ensure_package_on_workers(spark: SparkSession) -> None:
    """Ship this package to executor Python workers via ``addPyFile``.

    The driver harness builds its own plain SparkSession and puts the repo
    on the *driver's* sys.path only; cloudpickle serializes our pandas-UDF /
    applyInPandas functions by reference to this package, so the workers
    must be able to import it. A zip of the package shipped once per
    SparkContext makes every UDF importable everywhere (works identically on
    a real cluster — this is the standard deploy path for Python deps).
    """
    sc = spark.sparkContext
    if getattr(sc, "_mps_pkg_shipped", False):
        return
    # concurrent driver threads (operators/dedup.overlap) reach here on
    # their first table read; one zip build + addPyFile is enough, and the
    # pid-keyed tmp path below is shared within a process, so the whole
    # ship step is serialized behind one lock (first thread ships, the
    # rest see _mps_pkg_shipped or the finished zip)
    from ..operators.dedup import memo_lock

    with memo_lock(("pkg-ship", id(sc))):
        if getattr(sc, "_mps_pkg_shipped", False):
            return
        _ship_package(sc)


def _ship_package(sc) -> None:
    pkg_dir = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sources = []
    for root, _dirs, files in os.walk(pkg_dir):
        if "__pycache__" in root:
            continue
        for fn in files:
            if fn.endswith(".py"):
                sources.append(os.path.join(root, fn))
    sources.sort()
    # Cache key = fingerprint of the source CONTENT (paths + mtimes +
    # sizes), never the pid: a recycled pid once matched a stale zip from
    # an older checkout and workers ran week-old code (AttributeError on
    # a since-added symbol) while the driver ran current code.
    fp = hashlib.sha256()
    for full in sources:
        st = os.stat(full)
        fp.update(f"{os.path.relpath(full, pkg_dir)}|{st.st_mtime_ns}|{st.st_size}\n".encode())
    zpath = os.path.join(
        tempfile.gettempdir(),
        f"mps_pkg_{os.path.basename(pkg_dir)}_{fp.hexdigest()[:16]}.zip",
    )
    if not os.path.exists(zpath):
        tmp = zpath + f".tmp{os.getpid()}"
        with zipfile.ZipFile(tmp, "w") as zf:
            for full in sources:
                rel = os.path.relpath(full, os.path.dirname(pkg_dir))
                zf.write(full, rel)
        os.replace(tmp, zpath)  # atomic: concurrent sessions see whole zips
    sc.addPyFile(zpath)
    sc._mps_pkg_shipped = True


def _ensure_read_conf(spark: SparkSession) -> None:
    """Runtime confs the fixture scans require, set defensively because the
    driver harness owns its own session:

    * ``nanosAsLong`` — events.parquet stores timestamp[ns], which Spark's
      parquet reader otherwise rejects (PARQUET_TYPE_ILLEGAL); as long nanos
      we convert losslessly ourselves.
    * session timezone UTC — timestamp↔epoch conversions must agree with the
      timezone-naive DuckDB oracle regardless of host timezone.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    _ensure_package_on_workers(spark)


#: Footer-peeked storage type of ``events.ts``, cached per (path, mtime)
#: (one footer read per path per process; data is never scanned for the
#: peek). The mtime in the key invalidates the pin when a fixture is
#: regenerated at the same path with a different ts storage type — a plain
#: per-path cache served the stale schema and broke the re-read (ADVICE r4).
_EVENTS_TS_TYPE: dict[tuple[str, float], DataType] = {}


def events_ts_storage_type(spark: SparkSession, path: str) -> DataType:
    """The Spark type ``events.ts`` arrives as, which depends on how the
    fixture generator wrote the parquet file:

    * int64 nanoseconds → ``LongType`` (scannable only via
      ``spark.sql.legacy.parquet.nanosAsLong``)
    * timestamp[us/ms] not adjusted to UTC → ``TimestampNTZType``
    * timestamp adjusted to UTC → ``TimestampType``

    Resolved by Spark's own footer schema inference (reads footers only, no
    data scan — safe on any filesystem the session can reach), cached per
    path.
    """
    import os

    try:
        # a parquet "file" is often a directory whose part-files can be
        # rewritten in place without touching the directory's own mtime —
        # fold direct children into the fingerprint
        mtime = os.path.getmtime(path)
        if os.path.isdir(path):
            mtime = max(
                [mtime]
                + [e.stat().st_mtime for e in os.scandir(path) if e.is_file()]
            )
        key = (path, mtime)
    except OSError:
        # non-local path (s3://, hdfs://) — mtime unavailable; fall back to
        # per-path pinning, correct for immutable object-store fixtures
        key = (path, -1.0)
    if key not in _EVENTS_TS_TYPE:
        # drop superseded pins for the same path so regeneration churn
        # can't grow the cache without bound
        for stale in [k for k in _EVENTS_TS_TYPE if k[0] == path and k != key]:
            del _EVENTS_TS_TYPE[stale]
        _EVENTS_TS_TYPE[key] = spark.read.parquet(path).schema["ts"].dataType
    return _EVENTS_TS_TYPE[key]


def events_schema(ts_type: DataType) -> StructType:
    """The pinned events schema with ``ts`` typed as stored on disk."""
    base = FIXTURE_SCHEMAS["events"]
    return StructType(
        [f if f.name != "ts" else StructField("ts", ts_type, f.nullable) for f in base.fields]
    )


def normalize_events_ts(df: DataFrame) -> DataFrame:
    """Normalize ``events.ts`` from its storage representation to a real UTC
    ``TimestampType`` column so every downstream operator sees one shape.

    Long = int64 nanoseconds (integer div keeps full precision — ns longs
    overflow double math); NTZ = wall-clock micros interpreted as UTC (the
    session timezone is forced to UTC in ``_ensure_read_conf``, so the cast
    is exact and matches the timezone-naive DuckDB oracle).
    """
    dt = df.schema["ts"].dataType
    if isinstance(dt, LongType):
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    if isinstance(dt, TimestampNTZType):
        return df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def read_parquet_table(
    spark: SparkSession, sf_dir: str, name: str, *, pin_schema: bool = True
) -> DataFrame:
    """OP-01 full scan: lazy parquet scan with a pinned schema.

    ``pin_schema`` guards against silent schema drift between scale factors;
    the pinned StructType must be a (name, type)-compatible subset of the
    footer schema or Spark errors at read. ``events.ts`` storage varies by
    fixture generation (int64 nanos vs timestamp[us] NTZ) — the reader pins
    the footer's actual type and normalizes to TimestampType (UTC) so
    downstream operators always see a real timestamp column.
    """
    _ensure_read_conf(spark)
    path = os.path.join(sf_dir, f"{name}.parquet")
    reader = spark.read
    if pin_schema and name in FIXTURE_SCHEMAS:
        schema = FIXTURE_SCHEMAS[name]
        if name == "events":
            schema = events_schema(events_ts_storage_type(spark, path))
        reader = reader.schema(schema)
    df = reader.parquet(path)
    if name == "events":
        df = normalize_events_ts(df)
    return df


def load_fixture_tables(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] | None = None
) -> dict[str, DataFrame]:
    names = names or tuple(FIXTURE_SCHEMAS)
    return {n: read_parquet_table(spark, sf_dir, n) for n in names}


def write_clustered_parquet(
    df: DataFrame, path: str, cluster_by: list[str], *, num_partitions: int | None = None
) -> None:
    """OP-07 physical clustering (reference ``CLUSTER t USING t_pkey``,
    /root/reference/src/queries.mjs:17, index.mjs:128-132).

    Postgres CLUSTER rewrites the table in index order; the Spark-native
    analog is a range-partitioned, within-partition-sorted write: range
    partitioning gives globally ordered files (file i < file j for i < j),
    which at 100 TB enables min/max-statistics file skipping on the cluster
    key — the same locality benefit CLUSTER buys Postgres.
    """
    cols = [df[c] for c in cluster_by]
    part = (
        df.repartitionByRange(num_partitions, *cols)
        if num_partitions
        else df.repartitionByRange(*cols)
    )
    part.sortWithinPartitions(*cols).write.mode("overwrite").parquet(path)
