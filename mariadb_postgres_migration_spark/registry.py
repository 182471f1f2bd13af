"""Central query registry: name → (Spark callable, DuckDB oracle SQL).

Query modules (fixture_queries, analytics_queries, extension_queries)
register into ``REGISTRY`` at import; ``__spark_entry__`` re-exports it as
the driver contract. See fixture_queries docstring for the hash-stability
rules every registered query must obey.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from .sources.parquet import read_parquet_table

SEP = ",,,"  # reference tag_select_separator (config.json:15)
PASSWORD_PLACEHOLDER = "not set yet"  # reference config.json:14


@dataclass
class QueryDef:
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB SQL; None → rows-only check
    ops: tuple[str, ...] = field(default_factory=tuple)  # SURVEY §2 ids covered
    tier: int = 0  # 0 = driver-verified window (first 50); 1 = breadth tail


REGISTRY: dict[str, QueryDef] = {}

#: The driver hash-checks exactly the first N registered queries, in
#: registration order. Tier-0 registrations are capped to N so every operator
#: family and every SURVEY §2 OP id lands inside the verified window; tier-1
#: queries are the breadth tail (each one's OP ids are also covered by a
#: tier-0 query) and are verified by the local DuckDB oracle replica
#: (tests/test_core_queries.py) instead.
DRIVER_WINDOW = 50


def register(name: str, oracle: str | None, *ops: str, tier: int = 0):
    def deco(fn):
        if name in REGISTRY:
            # a silent dict overwrite turned two TPC-H variants into dead
            # code for a full round (review r5) — duplicates are a bug
            raise ValueError(f"duplicate query registration: {name}")
        REGISTRY[name] = QueryDef(fn=fn, oracle=oracle, ops=ops, tier=tier)
        return fn

    return deco


def member_oracle(name: str) -> str:
    """A registered member query's oracle SQL, for composition into a
    consolidation suite's oracle — suites built this way track member
    edits by construction instead of hand-duplicating SQL. Raises for a
    rows-only member (oracle None): silently returning None would embed
    the literal text 'None' into the composed SQL and surface as a
    confusing DuckDB syntax error far from the cause."""
    oracle = REGISTRY[name].oracle
    if oracle is None:
        raise ValueError(f"member {name!r} has no oracle (rows-only check) "
                         "and cannot be composed into a suite oracle")
    return oracle


def _ordered() -> dict[str, QueryDef]:
    """Registry in driver-exposure order: tier 0 first (stable within tier)."""
    return dict(sorted(REGISTRY.items(), key=lambda kv: kv[1].tier))


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return read_parquet_table(spark, sf_dir, name)


def load_all_query_modules() -> None:
    """Import every query module for its registration side effects."""
    from . import fixture_queries  # noqa: F401
    from . import extension_queries  # noqa: F401
    from . import analytics_queries  # noqa: F401
    from . import audit_queries  # noqa: F401
    from . import r7_queries  # noqa: F401
    from . import r8_queries  # noqa: F401
    from . import r9_queries  # noqa: F401
    from . import r10_queries  # noqa: F401
    from . import r11_queries  # noqa: F401
    from . import r12_queries  # noqa: F401


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    load_all_query_modules()
    return {name: q.fn for name, q in _ordered().items()}


def oracle_sql() -> dict[str, str]:
    load_all_query_modules()
    return {name: q.oracle for name, q in _ordered().items() if q.oracle is not None}
