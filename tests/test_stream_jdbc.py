"""Streaming → JDBC end-to-end against embedded Derby: foreachBatch +
keyed upsert turns at-least-once micro-batch delivery into exactly-once
sink effect — replaying the whole stream must insert nothing twice."""

from __future__ import annotations

import pytest

from mariadb_postgres_migration_spark.sources.jdbc import JdbcSink, read_jdbc_table, JdbcSource
from mariadb_postgres_migration_spark.sources.parquet import read_parquet_table
from mariadb_postgres_migration_spark.streaming.jobs import run_stream_to_jdbc_upsert

DERBY_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


@pytest.fixture(scope="module")
def derby_url(tmp_path_factory):
    db_dir = tmp_path_factory.mktemp("derby_stream") / "db"
    return f"jdbc:derby:{db_dir};create=true"


def test_stream_upsert_is_exactly_once_in_effect(spark, sf_dir, derby_url):
    sink = JdbcSink(
        url=derby_url, table="stream_events", driver=DERBY_DRIVER, batch_size=2000
    )
    # first full replay populates the sink; second replay (fresh checkpoint,
    # so every micro-batch re-fires) must be a no-op thanks to the keyed
    # anti-join upsert
    run_stream_to_jdbc_upsert(spark, sf_dir, sink)
    run_stream_to_jdbc_upsert(spark, sf_dir, sink)

    back = read_jdbc_table(
        spark, JdbcSource(url=derby_url, table="stream_events", driver=DERBY_DRIVER)
    )
    expected = read_parquet_table(spark, sf_dir, "events").count()
    assert back.count() == expected
    assert back.select("event_id").distinct().count() == expected
