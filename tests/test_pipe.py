"""OP-31 tier (a) tests: the per-partition line-protocol subprocess path
must agree with the pandas-UDF normalize tier on the same spec, and enforce
the strict 1:1 mapping contract."""

import sys

import pytest
from pyspark.sql import functions as F

from mariadb_postgres_migration_spark.functions.pipe import pipe_transform
from mariadb_postgres_migration_spark.functions.text import normalize_text

#: stand-in for the reference's normalize binary: same spec as
#: functions.text (NFKC + casefold + whitespace collapse), line protocol.
NORMALIZE_CMD = [
    sys.executable,
    "-c",
    (
        "import sys, unicodedata\n"
        "for line in sys.stdin:\n"
        "    s = line.rstrip('\\n')\n"
        "    print(' '.join(unicodedata.normalize('NFKC', s).casefold().split()))\n"
    ),
]


@pytest.fixture(scope="module")
def tags_df(spark):
    rows = [
        (1, "Music"),
        (2, "  spaced  out  "),
        (3, "ﬁlm"),
        (4, "ＭＵＳＩＣ"),
        (5, "Träumerei"),
        (6, "plain"),
    ]
    return spark.createDataFrame(rows, "tag_id long, name string")


def test_pipe_matches_pandas_udf_tier(spark, tags_df):
    piped = {
        r["tag_id"]: r["normalized"]
        for r in pipe_transform(tags_df, "name", NORMALIZE_CMD, id_col="tag_id").collect()
    }
    udfed = {
        r["tag_id"]: r["normalized"]
        for r in tags_df.select(
            "tag_id", normalize_text(F.col("name")).alias("normalized")
        ).collect()
    }
    assert piped == udfed
    assert piped[3] == "film" and piped[4] == "music"


def test_pipe_protocol_violation_raises(spark, tags_df):
    drop_lines_cmd = [sys.executable, "-c", "import sys; sys.stdin.read(); print('x')"]
    with pytest.raises(Exception, match="protocol violation|PythonException|Py4J"):
        pipe_transform(
            tags_df.coalesce(1), "name", drop_lines_cmd, id_col="tag_id"
        ).collect()


def test_pipe_chunking_preserves_order(spark):
    df = spark.range(1, 501).select(
        F.col("id").alias("tag_id"), F.concat(F.lit("Tag_"), F.col("id")).alias("name")
    )
    out = pipe_transform(
        df, "name", NORMALIZE_CMD, id_col="tag_id", max_batch_lines=64
    ).collect()
    assert len(out) == 500
    for r in out:
        assert r["normalized"] == f"tag_{r['tag_id']}"


def test_pipe_tier_maps_null_to_null(spark):
    """NULL inputs must come back NULL (parity with the pandas-UDF and
    native tiers), not crash the line protocol (review r5)."""
    df = spark.createDataFrame(
        [(1, "A B"), (2, None), (3, "c  d")], "id long, text string"
    )
    out = {r["id"]: r["norm"] for r in
           pipe_transform(df, "text", command=NORMALIZE_CMD, id_col="id", out_col="norm").collect()}
    assert out[2] is None
    assert out[1] is not None and out[3] is not None
