"""Pin the tiered-registry contract: the driver hash-verifies exactly the
first DRIVER_WINDOW registered queries, so tier 0 must stay at exactly that
size and must cover every queryable SURVEY §2 operator id and extension
family. A failure here means a registration change silently pushed
something out of the driver's verified window."""

from __future__ import annotations

from mariadb_postgres_migration_spark.registry import (
    DRIVER_WINDOW,
    REGISTRY,
    load_all_query_modules,
    oracle_sql,
    queries,
)

load_all_query_modules()

#: Side-effect operators exempt from the queryable contract (SURVEY §2:
#: OP-04 sink, OP-06 sequence DDL half, OP-07 clustered write, OP-32 DAG —
#: exercised in tests/test_sinks.py / test_migration.py instead). OP-06's
#: queryable core (max+1) is covered by op19.
SIDE_EFFECT_OPS = {"OP-04", "OP-07", "OP-32"}


def _tier0():
    return {n: q for n, q in REGISTRY.items() if q.tier == 0}


def test_tier0_is_exactly_the_driver_window():
    assert len(_tier0()) == DRIVER_WINDOW


def test_tier0_queries_register_before_tail():
    """queries()/oracle_sql() must present every tier-0 entry before any
    tier-1 entry — that ordering IS the driver-window mechanism."""
    tiers = [REGISTRY[name].tier for name in queries()]
    assert tiers == sorted(tiers)
    first_window = list(queries())[:DRIVER_WINDOW]
    assert all(REGISTRY[n].tier == 0 for n in first_window)


def test_every_queryable_op_id_in_window():
    covered = {op for q in _tier0().values() for op in q.ops}
    need = {f"OP-{i:02d}" for i in range(1, 33)} - SIDE_EFFECT_OPS
    missing = sorted(need - covered)
    assert not missing, f"OP ids with no driver-verified query: {missing}"


def test_every_extension_family_in_window():
    covered = {op for q in _tier0().values() for op in q.ops}
    need = {f"EXT-{i:02d}" for i in range(1, 10)}
    missing = sorted(need - covered)
    assert not missing, f"extension families with no driver-verified query: {missing}"


def test_every_named_extension_family_in_window():
    """The coverage guard from the r6 verdict: EVERY extension-family id
    used anywhere in the registry (EXT-AUDIT, EXT-GRAPH, EXT-CDC, ... —
    not just the numbered EXT-01..09) must appear in at least one tier-0
    query's ops tuple, so a future consolidation can't silently drop a
    family out of the driver-verified window."""
    all_families = {
        op for q in REGISTRY.values() for op in q.ops if op.startswith("EXT-")
    }
    covered = {op for q in _tier0().values() for op in q.ops}
    missing = sorted(all_families - covered)
    assert not missing, f"extension families with no driver-verified query: {missing}"


def test_every_tier0_query_has_an_oracle():
    """Tier-0 entries take driver correctness slots — each must carry SQL
    for the full rows+schema+hash check, never the weaker rows-only path."""
    sqls = oracle_sql()
    missing = [n for n in _tier0() if n not in sqls]
    assert not missing, f"tier-0 queries without oracle SQL: {missing}"
