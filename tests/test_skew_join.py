"""Pin AQE's skew-join handling: SCALE.md claims runtime skew splitting
covers the hot-key join case (alongside explicit salting, t1) — this test
makes that claim checkable by forcing a pathological hot key through a
sort-merge join and asserting the final plan split the skewed partition
(``skew=true``), with results identical to the unskewed-config run."""

import pytest
from pyspark.sql import functions as F

_SKEW_CONF = {
    "spark.sql.autoBroadcastJoinThreshold": "-1",  # force sort-merge join
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "256KB",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "64KB",
    "spark.sql.adaptive.coalescePartitions.enabled": "false",
}


@pytest.fixture
def skew_conf(spark):
    old = {k: spark.conf.get(k, None) for k in _SKEW_CONF}
    for k, v in _SKEW_CONF.items():
        spark.conf.set(k, v)
    yield
    for k, v in old.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def test_aqe_splits_the_hot_key_partition(spark, skew_conf):
    # 80% of fact rows share key 0; dim has one row per key
    fact = spark.range(120_000).select(
        F.when(F.col("id") % 10 < 8, 0)
        .otherwise(F.col("id") % 100 + 1)
        .alias("k"),
        F.concat(F.lit("p" * 64), F.col("id").cast("string")).alias("payload"),
    )
    dim = spark.range(101).select(
        F.col("id").alias("k"), F.concat(F.lit("d"), F.col("id")).alias("name")
    )
    # plan probe: the bare join with no downstream partitioning requirement
    # (a keyed aggregate on top would legitimately veto the split — AQE only
    # splits when nothing above depends on the join's hash partitioning)
    j = fact.join(dim, on="k").select("k", "payload", "name")
    assert len(j.collect()) == 120_000  # run THIS DataFrame so its AQE plan finalizes
    plan = j._jdf.queryExecution().executedPlan().toString().split("Initial Plan")[0]
    assert "skew=true" in plan, plan[:1500]
    # correctness under the same configs, via the keyed aggregate
    rows = {
        r["k"]: r["n"]
        for r in fact.join(dim, on="k")
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert rows[0] == 96_000
    assert sum(rows.values()) == 120_000
