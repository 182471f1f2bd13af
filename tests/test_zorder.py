"""Z-order clustering: Morton-code correctness and a REAL data-skipping
assertion — parquet footer min/max stats must prune a second-dimension
predicate under z-order where single-key clustering cannot."""

import glob

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from mariadb_postgres_migration_spark.sources.parquet import (
    read_parquet_table,
    write_clustered_parquet,
)
from mariadb_postgres_migration_spark.sources.zorder import (
    write_zordered_parquet,
    zorder_code,
)


def test_morton_code_interleaves_bits_exactly(spark):
    # with min=0/max=3 and bits=2, _scaled is the identity on {0..3}
    rows = [(x, y) for x in range(4) for y in range(4)]
    df = spark.createDataFrame(rows, "x long, y long")
    got = {
        (r["x"], r["y"]): r["z"]
        for r in df.withColumn("z", zorder_code(df, ["x", "y"], bits=2)).collect()
    }
    for (x, y), z in got.items():
        expect = sum(((x >> b) & 1) << (2 * b) for b in range(2)) | sum(
            ((y >> b) & 1) << (2 * b + 1) for b in range(2)
        )
        assert z == expect, f"({x},{y}): {z} != {expect}"


def test_zorder_requires_two_dimensions(spark, sf_dir):
    events = read_parquet_table(spark, sf_dir, "events")
    with pytest.raises(ValueError, match=">= 2 dimensions"):
        zorder_code(events, ["user_id"])


def _files_overlapping_value_range(path: str, col: str, lo: float, hi: float) -> tuple[int, int]:
    """(overlapping, total) data files whose footer [min,max] for ``col``
    intersects [lo, hi] — what a stats-pruning reader would scan."""
    files = [f for f in glob.glob(f"{path}/*.parquet") if "_SUCCESS" not in f]
    hit = 0
    for f in files:
        md = pq.ParquetFile(f).metadata
        fmin, fmax = None, None
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                c = md.row_group(rg).column(ci)
                if c.path_in_schema == col and c.statistics is not None:
                    mn, mx = c.statistics.min, c.statistics.max
                    fmin = mn if fmin is None else min(fmin, mn)
                    fmax = mx if fmax is None else max(fmax, mx)
        assert fmin is not None, f"no {col} stats in {f}"
        if fmax >= lo and fmin <= hi:
            hit += 1
    return hit, len(files)


def test_zorder_prunes_second_dimension_where_single_key_cannot(spark, sf_dir, tmp_path):
    events = read_parquet_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "value"
    )
    zpath, kpath = str(tmp_path / "z"), str(tmp_path / "k")
    write_zordered_parquet(events, zpath, ["user_id", "value"], num_files=16)
    write_clustered_parquet(events, kpath, ["user_id"], num_partitions=16)

    lo, hi = events.agg(F.min("value"), F.max("value")).collect()[0]
    mid = (lo + hi) / 2
    qlo, qhi = mid - (hi - lo) / 16, mid + (hi - lo) / 16  # middle 1/8 band

    z_hit, z_total = _files_overlapping_value_range(zpath, "value", qlo, qhi)
    k_hit, k_total = _files_overlapping_value_range(kpath, "value", qlo, qhi)
    # (range partitioning may leave a couple of files empty on small data,
    # so compare fractions, not a fixed file count)
    assert z_total >= 8 and k_total >= 8
    # user_id-clustered files are random in `value` → no pruning at all
    assert k_hit == k_total
    # the Morton layout must give the value dimension real pruning power
    assert z_hit <= z_total // 2, f"z-order pruned nothing: {z_hit}/{z_total}"

    # and the rewrite is lossless
    back = spark.read.parquet(zpath)
    assert back.count() == events.count()
    assert (
        back.join(events, on=["event_id", "user_id", "value"], how="inner").count()
        == events.count()
    )


def test_null_dimension_values_sort_to_the_bottom_bucket(spark):
    df = spark.createDataFrame(
        [(0, 0.0), (3, 3.0), (None, 1.0), (2, None)], "x long, y double"
    )
    rows = df.withColumn("z", zorder_code(df, ["x", "y"], bits=2)).collect()
    by_xy = {(r["x"], r["y"]): r["z"] for r in rows}
    # a NULL in a dimension contributes bucket 0 (bottom corner), never the top
    assert by_xy[(None, 1.0)] < by_xy[(3, 3.0)]
    assert by_xy[(2, None)] < by_xy[(3, 3.0)]
    assert by_xy[(0, 0.0)] == 0
