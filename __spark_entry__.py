"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (reference entry point B, the
videos_with_tags 3-way join + distinct group-concat, SURVEY.md §3) on
sf0.001. ``queries()``/``oracle_sql()`` expose every implemented operator
from SURVEY.md §2 with its DuckDB oracle; both are maintained in
``mariadb_postgres_migration_spark.fixture_queries`` (core relational
surface) and ``mariadb_postgres_migration_spark.extension_queries``
(LLM-pipeline extensions), this module just re-exports the registry.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from mariadb_postgres_migration_spark import fixture_queries as _fq

try:  # extensions land incrementally; the core registry must not break
    from mariadb_postgres_migration_spark import extension_queries as _xq  # noqa: F401
except ImportError:  # pragma: no cover
    _xq = None

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return _fq.REGISTRY["op18_flagship_group_concat"].fn(spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _fq.queries()


def oracle_sql() -> dict[str, str]:
    return _fq.oracle_sql()
