"""JDBC source/sink (OP-01..06): the production path of the engine.

The reference reads MariaDB over a unix socket and writes PostgreSQL through
one giant multi-row INSERT per table (/root/reference/src/index.mjs:22-27 —
both full-table materializations). Here both ends are Spark JDBC relations:

* reads are PARTITIONED (``partitionColumn``/``numPartitions``) so a 100 TB
  table arrives as parallel range scans instead of one cursor, with
  predicate/projection pushdown into the source engine;
* writes are batched appends (``batchsize``) from every executor
  concurrently — the reference's single-statement write is its scaling
  ceiling, this is the fix;
* upsert (OP-05 ``ON CONFLICT DO NOTHING``, index.mjs:55) has no native
  Spark JDBC mode; :func:`write_jdbc_upsert` implements the documented
  portable strategy (anti-join against current sink keys, then append).
  True conflict-race safety needs a sink-side staging table + MERGE, noted
  in the docstring — at migration scale the anti-join form is exact because
  the pipeline is the only writer.

Verified two ways (tests/test_jdbc.py): option-plumbing unit tests pin the
MySQL/Postgres scan and write knobs, and a LIVE integration tier runs the
real read→append→autorange→upsert path end-to-end against embedded Apache
Derby (the JDBC engine that ships inside the Spark distribution) — no
external database required. The reference's actual MariaDB/PG endpoints
(index.mjs:9-12) differ only in URL/driver/options, which is what the
plumbing tests cover.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass(frozen=True)
class JdbcSource:
    """Connection + scan-shape options for one JDBC table read.

    ``zero_date_to_null`` appends MySQL's ``zeroDateTimeBehavior`` so
    ``0000-00-00`` arrives as NULL instead of failing the read — the JDBC
    layer's half of OP-14 (SURVEY §1.3); the repair expression owns the
    string-typed cases.
    """

    url: str
    table: str
    user: str = ""
    password: str = ""
    driver: str | None = None
    partition_column: str | None = None
    num_partitions: int = 32
    lower_bound: int | None = None
    upper_bound: int | None = None
    fetch_size: int = 10_000
    zero_date_to_null: bool = True
    extra: dict[str, str] = field(default_factory=dict)

    def options(self) -> dict[str, str]:
        url = self.url
        if self.zero_date_to_null and url.startswith(("jdbc:mysql", "jdbc:mariadb")):
            sep = "&" if "?" in url else "?"
            url = f"{url}{sep}zeroDateTimeBehavior=convertToNull"
        opts = {
            "url": url,
            "dbtable": self.table,
            "user": self.user,
            "password": self.password,
            "fetchsize": str(self.fetch_size),
            # let the source engine evaluate pushed filters (default, but
            # explicit: this is the scan-reduction contract)
            "pushDownPredicate": "true",
        }
        if self.driver:
            opts["driver"] = self.driver
        if self.partition_column:
            # Spark requires ALL of partitionColumn/lowerBound/upperBound/
            # numPartitions or none — emitting a partial set fails at read
            # time with an opaque IllegalArgumentException, so fail HERE
            # with the remedy named (bounds come from autorange_bounds)
            if self.lower_bound is None or self.upper_bound is None:
                raise ValueError(
                    f"JdbcSource(table={self.table!r}): partition_column="
                    f"{self.partition_column!r} needs BOTH lower_bound and "
                    "upper_bound (use autorange_bounds(spark, src) to probe "
                    "them), or drop partition_column for a single-split read"
                )
            opts["partitionColumn"] = self.partition_column
            opts["numPartitions"] = str(self.num_partitions)
            opts["lowerBound"] = str(self.lower_bound)
            opts["upperBound"] = str(self.upper_bound)
        opts.update(self.extra)
        return opts


def read_jdbc_table(spark: SparkSession, src: JdbcSource) -> DataFrame:
    """OP-01/02/03: a lazy partitioned JDBC scan. Column pruning and filter
    pushdown reach the remote engine via Catalyst (SURVEY §4); sorted scans
    need no ORDER BY here — window specs carry ordering (OP-03)."""
    return spark.read.format("jdbc").options(**src.options()).load()


def autorange_bounds(
    spark: SparkSession, src: JdbcSource, id_col: str = "id"
) -> JdbcSource:
    """Fill lower/upper partition bounds with one min/max probe query —
    the idiomatic way to range-partition a JDBC read when bounds are not
    known ahead of time. One tiny single-row query, never a full scan."""
    from dataclasses import replace

    probe = replace(src, partition_column=None)
    # quote identifiers the way Spark's JdbcDialects do (backtick for the
    # MySQL family — the jdbc:mariadb scheme parses ANSI double quotes as
    # string literals under default sql_mode — ANSI double-quote otherwise):
    # engines that fold unquoted identifiers (Derby, Postgres) would
    # otherwise miss a case-preserved column
    q = "`" if src.url.startswith(("jdbc:mysql", "jdbc:mariadb")) else '"'
    bounds_sql = (
        f"(SELECT MIN({q}{id_col}{q}) AS {q}lo{q}, "
        f"MAX({q}{id_col}{q}) AS {q}hi{q} FROM {src.table}) b"
    )
    probe = replace(probe, table=bounds_sql)
    row = read_jdbc_table(spark, probe).collect()[0]
    return replace(
        src,
        partition_column=id_col,
        lower_bound=int(row["lo"] or 0),
        upper_bound=int(row["hi"] or 1),
    )


@dataclass(frozen=True)
class JdbcSink:
    url: str
    table: str
    user: str = ""
    password: str = ""
    driver: str | None = None
    batch_size: int = 10_000
    isolation_level: str = "READ_COMMITTED"
    extra: dict[str, str] = field(default_factory=dict)

    def options(self) -> dict[str, str]:
        opts = {
            "url": self.url,
            "dbtable": self.table,
            "user": self.user,
            "password": self.password,
            "batchsize": str(self.batch_size),
            "isolationLevel": self.isolation_level,
        }
        if self.driver:
            opts["driver"] = self.driver
        opts.update(self.extra)
        return opts


def write_jdbc_append(df: DataFrame, sink: JdbcSink) -> None:
    """OP-04: batched executor-parallel INSERTs (vs the reference's one
    unbounded statement, index.mjs:27). FK phase ordering (OP-32) is the
    caller's concern, exactly as in the reference."""
    df.write.format("jdbc").options(**sink.options()).mode("append").save()


def write_jdbc_upsert(
    df: DataFrame, sink: JdbcSink, keys: list[str], spark: SparkSession
) -> None:
    """OP-05 ``ON CONFLICT DO NOTHING``: dedup within the batch, then
    anti-join against the sink's CURRENT keys, then plain append.

    Exact when this pipeline is the sink's only writer (the migration
    scenario). Under concurrent writers the race window needs sink-side
    enforcement — staging table + ``INSERT … ON CONFLICT`` / MERGE executed
    by the DBA hook, same place the reference ran its ALTER SEQUENCE.

    A sink table that does not exist yet counts as empty: the first call
    plain-appends (Spark's JDBC writer creates the table), which is what
    lets this serve as a ``foreachBatch`` streaming sink from batch one
    (streaming/jobs.run_stream_to_jdbc_upsert)."""
    deduped = df.dropDuplicates(keys)
    try:
        existing = (
            spark.read.format("jdbc")
            .options(**sink.options())  # already carries dbtable=sink.table
            .load()
            .select(*keys)
        )
    except Exception as e:  # noqa: BLE001 — engines word "no such table" differently
        # only the missing-TABLE case may fall through to create-by-append:
        # require both the sink table's name and a not-exists phrasing in the
        # message, so a missing database/schema or a permissions error that
        # merely mentions "exists" still propagates with its real cause
        msg = str(e).lower()
        table_missing = sink.table.lower() in msg and (
            "does not exist" in msg or "doesn't exist" in msg or "not found" in msg
        )
        if not table_missing:
            raise
        write_jdbc_append(deduped, sink)
        return
    fresh = deduped.join(existing, on=keys, how="left_anti")
    write_jdbc_append(fresh, sink)


def sequence_restart_sql(table: str, next_value: int, id_col: str = "id") -> str:
    """OP-06: the post-load sequence fixup statement the reference executes
    (queries.mjs:16). The engine computes ``next_value`` (pipeline.
    sequence_restarts) and hands the DDL to the sink-side hook — Spark has
    no sequences to restart."""
    return f"ALTER SEQUENCE {table}_{id_col}_seq RESTART WITH {next_value}"


def cluster_sql(table: str) -> str:
    """OP-07 (JDBC side): Postgres CLUSTER DDL (queries.mjs:17). The
    lakehouse analog is sources.parquet.write_clustered_parquet."""
    return f"CLUSTER {table} USING {table}_pkey"


def with_write_order(df: DataFrame, cluster_by: list[str]) -> DataFrame:
    """OP-07 for JDBC sinks: range-repartition + in-partition sort so rows
    ARRIVE in cluster order — insertion order is physical order for a fresh
    table, making the sink-side CLUSTER a no-op (or unnecessary)."""
    return df.repartitionByRange(*[F.col(c) for c in cluster_by]).sortWithinPartitions(
        *cluster_by
    )
