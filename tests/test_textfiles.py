"""CSV / JSON-lines source-sink roundtrips with pinned schemas (the
no-inference-pass contract) including nested structs over JSONL."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from mariadb_postgres_migration_spark.sources.parquet import read_parquet_table
from mariadb_postgres_migration_spark.sources.textfiles import (
    read_csv_table,
    read_jsonl_table,
    write_csv,
    write_jsonl,
)

NATION_SCHEMA = StructType(
    [
        StructField("n_nationkey", LongType()),
        StructField("n_name", StringType()),
        StructField("n_regionkey", LongType()),
    ]
)


def test_csv_roundtrip_pinned_schema(spark, sf_dir, tmp_path):
    src = read_parquet_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    path = str(tmp_path / "nation_csv")
    write_csv(src, path)
    back = read_csv_table(spark, path, NATION_SCHEMA)
    assert back.schema == NATION_SCHEMA  # pinned, not inferred
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, src.collect()))


def test_csv_malformed_rows_do_not_fail_the_job(spark, tmp_path):
    raw = tmp_path / "bad"
    raw.mkdir()
    (raw / "part.csv").write_text(
        "n_nationkey,n_name,n_regionkey\n1,ALPHA,2\nnot_a_number,BETA,3\n"
    )
    back = read_csv_table(spark, str(raw), NATION_SCHEMA).collect()
    rows = {(r["n_nationkey"], r["n_name"]) for r in back}
    assert (1, "ALPHA") in rows
    assert (None, "BETA") in rows  # PERMISSIVE: bad cell -> NULL, row kept


def test_jsonl_roundtrip_nested_struct(spark, sf_dir, tmp_path):
    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField(
                "meta",
                StructType(
                    [
                        StructField("n_chars", LongType()),
                        StructField("words", ArrayType(StringType())),
                    ]
                ),
            ),
        ]
    )
    src = (
        read_parquet_table(spark, sf_dir, "documents")
        .limit(50)
        .select(
            "doc_id",
            F.struct(
                F.length("text").cast("long").alias("n_chars"),
                F.slice(F.split("text", " "), 1, 3).alias("words"),
            ).alias("meta"),
        )
    )
    path = str(tmp_path / "docs_jsonl")
    write_jsonl(src, path)
    back = read_jsonl_table(spark, path, schema)
    assert back.schema == schema

    def norm(df):
        return sorted(
            (r["doc_id"], r["meta"]["n_chars"], tuple(r["meta"]["words"]))
            for r in df.collect()
        )

    assert norm(back) == norm(src)


def test_jsonl_missing_fields_are_null(spark, tmp_path):
    raw = tmp_path / "sparse"
    raw.mkdir()
    (raw / "part.json").write_text('{"doc_id": 1}\n{"doc_id": 2, "extra": 9}\n')
    schema = StructType(
        [StructField("doc_id", LongType()), StructField("missing", StringType())]
    )
    back = read_jsonl_table(spark, str(raw), schema).collect()
    assert {(r["doc_id"], r["missing"]) for r in back} == {(1, None), (2, None)}
