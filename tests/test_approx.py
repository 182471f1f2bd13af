"""Approximate aggregates (SURVEY §2.4 "not present" list — engine
surface): HLL-sketch distinct counts are engine-specific by construction,
so the check is a relative-error bound against the exact count, not an
oracle hash."""

from pyspark.sql import functions as F

from mariadb_postgres_migration_spark.sources.parquet import read_parquet_table


def test_approx_count_distinct_within_tolerance(spark, sf_dir):
    orders = read_parquet_table(spark, sf_dir, "orders")
    row = orders.agg(
        F.approx_count_distinct("o_custkey", rsd=0.02).alias("approx"),
        F.countDistinct("o_custkey").alias("exact"),
    ).collect()[0]
    rel_err = abs(row["approx"] - row["exact"]) / row["exact"]
    assert rel_err < 0.05, f"approx={row['approx']} exact={row['exact']}"


def test_approx_quantiles_bracket_exact_median(spark, sf_dir):
    lineitem = read_parquet_table(spark, sf_dir, "lineitem")
    lo, med, hi = lineitem.approxQuantile("l_extendedprice", [0.25, 0.5, 0.75], 0.01)
    assert lo <= med <= hi
    exact_med = lineitem.selectExpr(
        "percentile(l_extendedprice, 0.5) AS m"
    ).collect()[0]["m"]
    assert abs(med - exact_med) / exact_med < 0.05


def test_registered_sketch_bounds(spark, sf_dir):
    """The registered sketch query (p3) must sit inside its advertised
    error bounds vs the exact aggregations on the same data."""
    from pyspark.sql import functions as F

    from mariadb_postgres_migration_spark.analytics_queries import p3_approx_sketches
    from mariadb_postgres_migration_spark.sources.parquet import read_parquet_table

    approx = {r["l_returnflag"]: r for r in p3_approx_sketches(spark, sf_dir).collect()}
    l = read_parquet_table(spark, sf_dir, "lineitem")
    exact = {
        r["l_returnflag"]: r
        for r in l.groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_orderkey").alias("orders"),
            F.percentile("l_extendedprice", F.lit(0.5)).alias("p50"),
            F.percentile("l_extendedprice", F.lit(0.95)).alias("p95"),
        )
        .collect()
    }
    assert set(approx) == set(exact)
    for flag, a in approx.items():
        e = exact[flag]
        assert abs(a["approx_orders"] - e["orders"]) <= max(3, 0.05 * e["orders"])
        spread = e["p95"] - e["p50"] + 1e-9
        assert abs(a["approx_p50"] - e["p50"]) <= 0.1 * spread + 1e-6
        assert abs(a["approx_p95"] - e["p95"]) <= 0.1 * spread + 1e-6
