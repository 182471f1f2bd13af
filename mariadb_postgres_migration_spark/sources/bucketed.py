"""Bucketed tables: pre-shuffled storage for co-located joins (SURVEY §4's
"bucketing for co-located joins" note, and the 100 TB answer to repeated
joins on the same key).

A table bucketed by the join key is the shuffle, persisted: every
subsequent join or aggregation on that key skips its Exchange entirely —
the scan arrives already hash-distributed (and, with sortBy, sorted). For a
fact table joined on the same key by many downstream queries this converts
the single largest cost at 100 TB (a full-table shuffle per query) into a
one-time write-side cost. tests/test_bucketed.py proves the plan property:
bucketed ⋈ bucketed on the bucket key contains ZERO shuffle exchanges.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed_table(
    df: DataFrame,
    table_name: str,
    path: str,
    bucket_cols: list[str],
    num_buckets: int = 8,
    sort: bool = True,
) -> None:
    """Write ``df`` as an external bucketed+sorted parquet table. Bucket
    count must match across tables meant to co-join (Spark only elides the
    shuffle when both sides agree)."""
    writer = df.write.mode("overwrite").option("path", path).bucketBy(
        num_buckets, *bucket_cols
    )
    if sort:
        writer = writer.sortBy(*bucket_cols)
    writer.format("parquet").saveAsTable(table_name)


def drop_table(spark: SparkSession, table_name: str) -> None:
    spark.sql(f"DROP TABLE IF EXISTS {table_name}")
