"""The plain-SQL front door must agree with the DataFrame registry: the
same query expressed over registered temp views returns identical results
(same scans, same Catalyst plans underneath)."""

from __future__ import annotations

import pytest

from mariadb_postgres_migration_spark.registry import REGISTRY, load_all_query_modules
from mariadb_postgres_migration_spark.views import register_fixture_views

load_all_query_modules()


@pytest.fixture(scope="module", autouse=True)
def views(spark, sf_dir):
    return register_fixture_views(spark, sf_dir)


def test_all_fixture_views_registered(spark, views):
    for name in views:
        assert spark.sql(f"SELECT * FROM {name} LIMIT 1").columns


def test_sql_q6_matches_dataframe_query(spark, sf_dir):
    sql = spark.sql(
        """SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
           FROM lineitem
           WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
             AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
             AND l_discount BETWEEN 0.03 AND 0.07
             AND l_quantity < 24"""
    ).collect()
    df = REGISTRY["q6_forecast_revenue"].fn(spark, sf_dir).collect()
    assert [tuple(r) for r in sql] == [tuple(r) for r in df]


def test_sql_join_matches_dataframe_query(spark, sf_dir):
    sql = spark.sql(
        """SELECT n.n_nationkey, n.n_name, r.r_name AS region_name
           FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey"""
    ).collect()
    df = REGISTRY["op17_dict_lookup_join"].fn(spark, sf_dir).collect()
    assert sorted(map(tuple, sql)) == sorted(map(tuple, df))


def test_sql_sees_normalized_event_timestamps(spark):
    """events.ts arrives as int64 nanos in the parquet footer; the view must
    expose the normalized TimestampType the readers produce."""
    dtype = dict(spark.sql("SELECT ts FROM events").dtypes)["ts"]
    assert dtype == "timestamp"
