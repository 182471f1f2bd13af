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
