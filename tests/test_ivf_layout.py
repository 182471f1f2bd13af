"""Pin the IVF storage pattern the x07 docstring promises: the corpus
written `partitionBy(cell)` turns an nprobe-cell probe into a
partition-pruned read — the plan must show partition filters and touch
only the probed cells' files."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mariadb_postgres_migration_spark.operators.similarity import ivf_assign
from mariadb_postgres_migration_spark.plans.inspect import formatted_plan
from mariadb_postgres_migration_spark.sources.parquet import read_parquet_table


@pytest.fixture(scope="module")
def cell_store(spark, sf_dir, tmp_path_factory):
    emb = read_parquet_table(spark, sf_dir, "embeddings")
    centroids = emb.filter(F.col("vec_id") % 25 == 0)
    assigned = ivf_assign(emb, centroids)
    path = str(tmp_path_factory.mktemp("ivf") / "corpus_by_cell")
    assigned.write.mode("overwrite").partitionBy("cell").parquet(path)
    return path


def test_probe_read_is_partition_pruned(spark, cell_store):
    probe = spark.read.parquet(cell_store).filter(F.col("cell").isin(0, 25))
    text = formatted_plan(probe)
    assert "PartitionFilters" in text
    assert "cell" in text
    # the pruned scan returns only the probed cells
    cells = {r["cell"] for r in probe.select("cell").distinct().collect()}
    assert cells <= {0, 25}


def test_cell_partition_counts_match_assignment(spark, sf_dir, cell_store):
    emb = read_parquet_table(spark, sf_dir, "embeddings")
    centroids = emb.filter(F.col("vec_id") % 25 == 0)
    direct = ivf_assign(emb, centroids).groupBy("cell").count()
    stored = spark.read.parquet(cell_store).groupBy("cell").count()
    assert sorted(map(tuple, direct.collect())) == sorted(map(tuple, stored.collect()))
