"""Round-11 operator tests: the ADVICE-r10 hardening (oracle/engine
drift guards), then the r11 waves (perceptual-dedup composed pipeline,
MJPEG-in-AVI video decode, banded-recall measurement) as they land."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mariadb_postgres_migration_spark.operators.multimodal import (
    AHASH_GRID,
    ahash_sql,
    attach_consistent_bmp_payload,
    decode_payloads,
    dhash_sql,
)
from mariadb_postgres_migration_spark.registry import (
    REGISTRY,
    load_all_query_modules,
)

load_all_query_modules()


@pytest.fixture(scope="module")
def q(spark, sf_dir):
    def _run(name):
        return REGISTRY[name].fn(spark, sf_dir)

    return _run


def test_hash_sql_builders_reject_non_default_grid():
    """ADVICE r10: ahash_sql/dhash_sql hardcode the grid=8 literal
    geometry; registering a non-default grid against them must be a loud
    error, not a silent engine/oracle desync."""
    with pytest.raises(ValueError, match="grid=8"):
        ahash_sql(grid=4)
    with pytest.raises(ValueError, match="grid=8"):
        dhash_sql(grid=16)
    # the default stays callable
    assert "h_hi" in ahash_sql() and "h_hi" in dhash_sql(grid=AHASH_GRID)


def test_consistent_bmp_builder_drops_subwidth_texts(spark):
    """ADVICE r10 (x170): a doc whose printable-ASCII projection is
    shorter than its closed-form width would decode to height 0. The
    builder must drop it (its h>=1 fixture filter is the twin of the
    oracles' `WHERE h >= 1`), so no height-0 payload can ever reach the
    decode side of x170/x157/x158.

    '0' -> width 16 + (ord('0')%16)*4 = 16; 15 printable chars < 16.
    'p' -> width 16 + (ord('p')%16)*4 = 16; padding text to exactly one
    row survives with height 1."""
    docs = spark.createDataFrame(
        [
            (1, "0" * 15),       # printable length 15 < width 16 -> dropped
            (2, "p" * 16),       # exactly one row -> height 1, kept
            (3, ""),             # empty projection -> dropped
            (4, "é" * 40),  # nothing printable-ASCII -> dropped
        ],
        "doc_id long, text string",
    )
    mm = attach_consistent_bmp_payload(docs)
    dec = decode_payloads(mm).filter(F.col("height") >= 1)
    rows = {r["doc_id"]: r for r in dec.collect()}
    assert set(rows) == {2}
    assert rows[2]["width"] == 16 and rows[2]["height"] == 1
    # and the unfiltered decode agrees: the builder never emitted h=0
    assert decode_payloads(mm).count() == 1
