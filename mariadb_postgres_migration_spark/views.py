"""Temp-view registration: the engine's plain-SQL front door.

Everything in the registry is DataFrame-first, but a user replacing the
reference may simply want ``spark.sql(...)`` over the same tables. Views
are lazy aliases over the schema-pinned readers (sources/parquet.py), so a
SQL query gets the identical scan contract — pruned ReadSchema, pushed
filters, nanos-normalized ``events.ts`` — as the DataFrame API; Catalyst
compiles both to the same plans (pinned in tests/test_views.py by result
equality with registered queries).
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from .schemas import FIXTURE_SCHEMAS
from .sources.parquet import read_parquet_table


def register_fixture_views(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] | None = None
) -> tuple[str, ...]:
    """Create (or replace) one temp view per fixture table; returns the
    registered names. Views are session-scoped and lazy — nothing is read
    until a query runs."""
    names = names or tuple(FIXTURE_SCHEMAS)
    for name in names:
        read_parquet_table(spark, sf_dir, name).createOrReplaceTempView(name)
    return names
