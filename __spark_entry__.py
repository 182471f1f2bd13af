"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (reference entry point B, the
videos_with_tags 3-way join + distinct group-concat, SURVEY.md §3) on
sf0.001. ``queries()``/``oracle_sql()`` expose every implemented operator
from SURVEY.md §2 with its DuckDB oracle; the registry lives in
``mariadb_postgres_migration_spark.registry`` and is populated by the
query modules (fixture_queries: core relational surface;
analytics_queries: sorts/top-k/set-ops/windows + TPC-H-style heavies;
extension_queries: LLM-pipeline dedup/similarity/text/multimodal).

Ordering contract: the registry is TIERED — the first 50 entries (tier 0)
cover every SURVEY §2 OP id and extension family, sized to the driver's
50-query correctness window; the remainder (tier 1) is the breadth tail
(standalone forms of consolidated suites, exact all-pairs baselines, extra
stream variants), locally verified by the same oracle machinery in
tests/test_core_queries.py.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from mariadb_postgres_migration_spark import registry as _registry

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return queries()["op18_flagship_group_concat"](spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _registry.queries()


def oracle_sql() -> dict[str, str]:
    return _registry.oracle_sql()
