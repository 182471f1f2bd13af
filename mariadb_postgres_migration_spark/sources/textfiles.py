"""CSV / JSON-lines source & sink wrappers (general source surface).

The reference only speaks JDBC; an engine replacing it also needs the flat
interchange formats every pipeline ends up touching. The scale rules here:

* **Schemas are always pinned.** ``inferSchema`` (CSV) / schema sampling
  (JSON) is an extra full pass over the data before the real job — at
  100 TB that doubles the scan. Every reader below requires an explicit
  StructType; a malformed row lands in ``_corrupt_record`` (PERMISSIVE)
  instead of failing the job, mirroring the repair-not-crash posture of the
  OP-13/14 layer.
* **JSON means JSON Lines.** ``multiLine=true`` forces one task per FILE
  (a whole document must be parsed by one reader) — a non-splittable scan
  that serializes the cluster; line-delimited JSON splits like any text
  file.
* **Writes shard per executor** — one file per partition, no driver-side
  concatenation; layout control (file count / ordering) comes from
  ``repartition``/``write_clustered_parquet``-style pre-shaping, same as
  parquet.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

from .parquet import _ensure_read_conf


def read_csv_table(
    spark: SparkSession,
    path: str,
    schema: StructType,
    *,
    header: bool = True,
    sep: str = ",",
) -> DataFrame:
    """Lazy CSV scan with a pinned schema — no inference pass. Column
    pruning still applies (Spark's CSV parser skips unrequested fields);
    filters evaluate post-parse, so heavy analytics should convert to
    parquet first (write_clustered_parquet) rather than re-scan CSV."""
    _ensure_read_conf(spark)
    return (
        spark.read.schema(schema)
        .option("header", str(header).lower())
        .option("sep", sep)
        .option("mode", "PERMISSIVE")
        .csv(path)
    )


def write_csv(
    df: DataFrame, path: str, *, header: bool = True, sep: str = ","
) -> None:
    """Executor-parallel CSV write (one shard per partition)."""
    df.write.mode("overwrite").option("header", str(header).lower()).option(
        "sep", sep
    ).csv(path)


def read_jsonl_table(
    spark: SparkSession, path: str, schema: StructType
) -> DataFrame:
    """Lazy JSON-Lines scan with a pinned schema — no sampling pass, and
    splittable (never ``multiLine``, which is one-task-per-file). Nested
    structs/arrays in ``schema`` parse natively; fields absent from a line
    are NULL, malformed lines surface per-row instead of failing the job."""
    _ensure_read_conf(spark)
    return spark.read.schema(schema).option("mode", "PERMISSIVE").json(path)


def write_jsonl(df: DataFrame, path: str) -> None:
    """Executor-parallel JSON-Lines write (one shard per partition)."""
    df.write.mode("overwrite").json(path)


def read_orc_table(
    spark: SparkSession, path: str, schema: StructType | None = None
) -> DataFrame:
    """ORC scan (columnar like parquet: predicate pushdown, column
    pruning, and stripe-level min/max skipping all apply). Schema is
    optional — ORC embeds one — but pinning it keeps reads stable when a
    path mixes files written by different producers."""
    _ensure_read_conf(spark)
    r = spark.read
    if schema is not None:
        r = r.schema(schema)
    return r.orc(path)


def write_orc(df: DataFrame, path: str) -> None:
    """Executor-parallel ORC write with the same layout posture as the
    parquet sinks: shape file count/order upstream via repartition /
    clustered writes; zlib default compression."""
    df.write.mode("overwrite").orc(path)
