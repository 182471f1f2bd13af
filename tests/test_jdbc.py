"""Option-plumbing tests for the JDBC source/sink layer (no database exists
in this environment; what we can verify is that every scan/write knob the
100 TB design depends on lands in the options Spark will receive)."""

from mariadb_postgres_migration_spark.sources.jdbc import (
    JdbcSink,
    JdbcSource,
    cluster_sql,
    sequence_restart_sql,
)


def test_mysql_source_options_carry_scan_shape():
    src = JdbcSource(
        url="jdbc:mysql://localhost/w0bm",
        table="comments",
        user="w0bm",
        partition_column="id",
        num_partitions=64,
        lower_bound=1,
        upper_bound=1_000_000,
    )
    opts = src.options()
    assert opts["url"].endswith("?zeroDateTimeBehavior=convertToNull")
    assert opts["partitionColumn"] == "id"
    assert opts["numPartitions"] == "64"
    assert (opts["lowerBound"], opts["upperBound"]) == ("1", "1000000")
    assert opts["pushDownPredicate"] == "true"
    assert opts["fetchsize"] == "10000"


def test_zero_date_param_appends_not_duplicates():
    src = JdbcSource(url="jdbc:mysql://h/db?useSSL=false", table="t")
    assert src.options()["url"] == "jdbc:mysql://h/db?useSSL=false&zeroDateTimeBehavior=convertToNull"
    pg = JdbcSource(url="jdbc:postgresql://h/db", table="t")
    assert pg.options()["url"] == "jdbc:postgresql://h/db"  # mysql-only knob


def test_sink_options_batch_and_isolation():
    sink = JdbcSink(url="jdbc:postgresql://h/db", table="videos", batch_size=5000)
    opts = sink.options()
    assert opts["batchsize"] == "5000"
    assert opts["isolationLevel"] == "READ_COMMITTED"


def test_side_effect_ddl():
    assert (
        sequence_restart_sql("users", 2001)
        == "ALTER SEQUENCE users_id_seq RESTART WITH 2001"
    )
    assert cluster_sql("videos") == "CLUSTER videos USING videos_pkey"
