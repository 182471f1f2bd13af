"""Sink-side operator tests: OP-04 parquet batch sink round-trip and OP-07
physical clustering (range-partitioned, within-partition-sorted write — the
Spark analog of Postgres CLUSTER, SURVEY §2.1).
"""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
import pytest

from mariadb_postgres_migration_spark.sources.parquet import (
    read_parquet_table,
    write_clustered_parquet,
)


@pytest.fixture(scope="module")
def orders(spark, sf_dir):
    return read_parquet_table(spark, sf_dir, "orders")


def test_parquet_sink_roundtrip(spark, orders, tmp_path):
    """OP-04: write → read-back preserves rows and schema."""
    out = str(tmp_path / "orders_sink")
    orders.write.mode("overwrite").parquet(out)
    back = spark.read.parquet(out)
    assert back.count() == orders.count()
    assert {f.name: f.dataType for f in back.schema} == {
        f.name: f.dataType for f in orders.schema
    }


def test_clustered_write_is_globally_sorted(spark, orders, tmp_path):
    """OP-07: files are range-disjoint on the cluster key and each file is
    internally sorted — min/max footer stats become file-skipping ranges."""
    out = str(tmp_path / "orders_clustered")
    write_clustered_parquet(orders, out, ["o_orderkey"], num_partitions=4)
    files = sorted(glob.glob(f"{out}/part-*.parquet"))
    assert len(files) > 1
    ranges = []
    for f in files:
        keys = pq.read_table(f, columns=["o_orderkey"])["o_orderkey"].to_pylist()
        assert keys == sorted(keys), f"{f} not internally sorted"
        ranges.append((keys[0], keys[-1]))
    # part-file index order IS the range order for repartitionByRange
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2, "files overlap on the cluster key"
    total = sum(pq.read_metadata(f).num_rows for f in files)
    assert total == orders.count()
