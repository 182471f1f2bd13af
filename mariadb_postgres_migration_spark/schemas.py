"""Explicit schemas for every table the engine touches.

The reference relies on implicit schemas (``SELECT *`` at
/root/reference/src/queries.mjs:3-5 plus sink ColumnSets at
/root/reference/src/column_sets.mjs:25-98). At 100 TB implicit inference is a
correctness and performance hazard (a schema-inference pass over parquet
footers is cheap, but JDBC inference types by sampling and string columns
drift), so every source is pinned here.

Two families:
  * FIXTURE_SCHEMAS — the driver's TPC-H-ish star schema + events/documents/
    embeddings (/root/repo/TESTDATA.md).
  * MIGRATION_SCHEMAS — the w0bm migration-domain tables (SURVEY.md §1.2),
    source (MariaDB-shaped) and sink (PostgreSQL-shaped).
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampNTZType,
    TimestampType,
)


def _st(*fields: tuple) -> StructType:
    return StructType([StructField(n, t, nullable) for n, t, nullable in fields])


FIXTURE_SCHEMAS: dict[str, StructType] = {
    "region": _st(("r_regionkey", IntegerType(), False), ("r_name", StringType(), False)),
    "nation": _st(
        ("n_nationkey", IntegerType(), False),
        ("n_name", StringType(), False),
        ("n_regionkey", IntegerType(), False),
    ),
    "customer": _st(
        ("c_custkey", LongType(), False),
        ("c_name", StringType(), False),
        ("c_nationkey", IntegerType(), False),
        ("c_acctbal", DoubleType(), False),
        ("c_mktsegment", StringType(), False),
    ),
    "supplier": _st(
        ("s_suppkey", LongType(), False),
        ("s_name", StringType(), False),
        ("s_nationkey", IntegerType(), False),
        ("s_acctbal", DoubleType(), False),
    ),
    "part": _st(
        ("p_partkey", LongType(), False),
        ("p_name", StringType(), False),
        ("p_brand", StringType(), False),
        ("p_type", StringType(), False),
        ("p_size", IntegerType(), False),
        ("p_retailprice", DoubleType(), False),
    ),
    "orders": _st(
        ("o_orderkey", LongType(), False),
        ("o_custkey", LongType(), False),
        ("o_orderstatus", StringType(), False),
        ("o_totalprice", DoubleType(), False),
        # driver parquet stores timestamp[ms] NOT adjusted to UTC → NTZ;
        # pinning NTZ avoids a session-timezone-dependent coercion.
        ("o_orderdate", TimestampNTZType(), False),
        ("o_orderpriority", StringType(), False),
    ),
    "lineitem": _st(
        ("l_orderkey", LongType(), False),
        ("l_partkey", LongType(), False),
        ("l_suppkey", LongType(), False),
        ("l_linenumber", IntegerType(), False),
        ("l_quantity", DoubleType(), False),
        ("l_extendedprice", DoubleType(), False),
        ("l_discount", DoubleType(), False),
        ("l_tax", DoubleType(), False),
        ("l_returnflag", StringType(), False),
        ("l_linestatus", StringType(), False),
        ("l_shipdate", TimestampNTZType(), False),
    ),
    "events": _st(
        ("event_id", LongType(), False),
        # the fixture generator has written this as int64 nanos (scannable
        # only via spark.sql.legacy.parquet.nanosAsLong → LongType) and as
        # timestamp[us] not-adjusted-to-UTC (→ TimestampNTZType); the reader
        # peeks the footer, substitutes the storage type here, and normalizes
        # to a real UTC TimestampType column — see sources/parquet.py.
        ("ts", LongType(), False),
        ("user_id", LongType(), False),
        ("event_type", StringType(), False),
        ("value", DoubleType(), False),
        ("props", StringType(), True),
    ),
    "documents": _st(
        ("doc_id", LongType(), False),
        ("text", StringType(), False),
        ("lang", StringType(), True),
        ("source", StringType(), True),
        ("n_chars", LongType(), True),
    ),
    "embeddings": _st(
        ("vec_id", LongType(), False),
        ("embedding", ArrayType(FloatType()), False),
        ("label", IntegerType(), True),
    ),
}

#: w0bm source tables (MariaDB side; SURVEY.md §1.2, queries.mjs:3-11).
MIGRATION_SOURCE_SCHEMAS: dict[str, StructType] = {
    "users": _st(
        ("id", LongType(), False),
        ("username", StringType(), False),
        ("password", StringType(), True),
        ("created_at", TimestampType(), False),
        ("updated_at", TimestampType(), True),
        ("deleted_at", TimestampType(), True),
        # banend arrives as string: MySQL zero-dates / garbage must survive the
        # wire to be repaired by the ColumnSet (column_sets.mjs:10-17).
        ("banend", StringType(), True),
        ("banreason", StringType(), True),
        ("categories", StringType(), True),  # JSON text (index.mjs:25)
    ),
    "videos": _st(
        ("id", LongType(), False),
        ("file", StringType(), False),
        ("user_id", LongType(), True),
        ("created_at", TimestampType(), False),
        ("updated_at", TimestampType(), True),
        ("deleted_at", TimestampType(), True),
        ("hash", StringType(), True),
    ),
    "taggable_tags": _st(("tag_id", LongType(), False), ("name", StringType(), False)),
    "taggable_taggables": _st(
        ("taggable_id", LongType(), False), ("tag_id", LongType(), False)
    ),
    "comments": _st(
        ("id", LongType(), False),
        ("user_id", LongType(), True),
        ("video_id", LongType(), False),
        ("content", StringType(), True),
        ("created_at", TimestampType(), False),
        ("updated_at", TimestampType(), True),
        ("deleted_at", TimestampType(), True),
    ),
    "messages": _st(
        ("id", LongType(), False),
        ("from", LongType(), True),
        ("to", LongType(), True),
        ("subject", StringType(), True),
        ("content", StringType(), True),
        ("created_at", TimestampType(), False),
        ("updated_at", TimestampType(), True),
        ("deleted_at", TimestampType(), True),
    ),
    "favorites": _st(
        ("user_id", LongType(), False),
        ("video_id", LongType(), False),
        # created_at as string: 2% invalid dates exercise catch_invalid
        # (column_sets.mjs:96, FIXTURES.md B1).
        ("created_at", StringType(), True),
    ),
    # sink-side pre-existing table, read as a build side (queries.mjs:14).
    "playlists": _st(
        ("id", LongType(), False),
        ("user_id", LongType(), False),
        ("title", StringType(), False),
    ),
}

#: w0bm sink tables (PostgreSQL side; column_sets.mjs:25-98).
MIGRATION_SINK_SCHEMAS: dict[str, StructType] = {
    "users": _st(
        ("id", LongType(), False),
        ("username", StringType(), False),
        ("password", StringType(), False),
        ("created_at", TimestampType(), False),
        ("updated_at", TimestampType(), True),
        ("deleted_at", TimestampType(), True),
        ("banned", TimestampType(), True),
        ("banreason", StringType(), True),
        ("filters", ArrayType(StringType()), True),
    ),
    "videos": _st(
        ("id", LongType(), False),
        ("file", StringType(), False),
        ("created_at", TimestampType(), False),
        ("updated_at", TimestampType(), True),
        ("deleted_at", TimestampType(), True),
        ("hash", StringType(), True),
        ("tags", ArrayType(StringType()), True),
    ),
    "tags": _st(("normalized", StringType(), False), ("tag", StringType(), False)),
    "comments": _st(
        ("id", LongType(), False),
        ("user_id", LongType(), True),
        ("video_id", LongType(), False),
        ("content", StringType(), True),
        ("created_at", TimestampType(), False),
        ("updated_at", TimestampType(), True),
        ("deleted_at", TimestampType(), True),
        ("response_to", LongType(), True),
    ),
    "messages": _st(
        ("id", LongType(), False),
        ("from_user", LongType(), True),
        ("to_user", LongType(), True),
        ("title", StringType(), True),
        ("content", StringType(), True),
        ("created_at", TimestampType(), False),
        ("updated_at", TimestampType(), True),
        ("deleted_at", TimestampType(), True),
    ),
    "playlist_video": _st(
        ("playlist_id", LongType(), True),
        ("video_id", LongType(), False),
        ("created_at", TimestampType(), True),
    ),
}

FIXTURE_TABLES = tuple(FIXTURE_SCHEMAS)
