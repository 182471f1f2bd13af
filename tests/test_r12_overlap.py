"""Round-12 optimization-round overlap tests: the concurrent
frame-construction helper (operators/dedup.overlap, guide §2.6 "overlap
independent jobs") and the locked memo get-or-build
(operators/dedup.memo_get_or_build) that keeps shared dependencies
built exactly once under that concurrency.

The overlap is a driver-scheduling detail: every overlapped row must be
row-identical to its sequential form (MPS_OVERLAP_OFF=1), thunk results
must come back positionally ordered, exceptions must propagate, and a
memo key hammered from many threads must run its build exactly once.
"""

from __future__ import annotations

import pytest

from mariadb_postgres_migration_spark.operators import dedup as D
from mariadb_postgres_migration_spark.operators.dedup import (
    release_cached_intermediates,
)
from mariadb_postgres_migration_spark.registry import (
    REGISTRY,
    load_all_query_modules,
)

load_all_query_modules()


def test_overlap_results_positional():
    assert D.overlap(lambda: 1, lambda: 2, lambda: 3) == [1, 2, 3]


def test_overlap_single_thunk_inline():
    # < 2 thunks short-circuits to a plain call (no thread)
    assert D.overlap(lambda: "only") == ["only"]


def test_overlap_env_bypass_sequential(monkeypatch):
    monkeypatch.setenv("MPS_OVERLAP_OFF", "1")
    order: list[int] = []

    def mk(i):
        def t():
            order.append(i)
            return i

        return t

    assert D.overlap(mk(0), mk(1), mk(2)) == [0, 1, 2]
    assert order == [0, 1, 2]  # strictly sequential under the bypass


def test_overlap_exception_propagates():
    def boom():
        raise ValueError("boom")

    with pytest.raises(ValueError, match="boom"):
        D.overlap(lambda: 1, boom)


def test_memo_get_or_build_builds_once_under_threads():
    import threading

    cache: dict = {}
    built = []
    gate = threading.Barrier(8)

    def build():
        built.append(1)
        return object()

    def access():
        gate.wait()  # maximize the build race window
        return D.memo_get_or_build(cache, "app", ("app", "k"), build)

    got = D.overlap(*[access] * 8)
    assert len(built) == 1
    assert all(g is got[0] for g in got)


def test_memo_get_or_build_evicts_foreign_sessions():
    cache: dict = {("dead-app", "k"): object()}
    D.memo_get_or_build(cache, "live-app", ("live-app", "k"), object)
    assert all(k[0] == "live-app" for k in cache)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.mark.parametrize(
    "name",
    [
        "x218_video_dual_source_sheet",  # two keep-one tiers overlapped
        "x206_trimodal_pairs",  # three modality chains overlapped
        "c12_video_dual_pipeline",  # media chain vs c7 chain overlapped
        "x187_crossmodal_pairs",  # two pipeline chains overlapped
        "x216_r12j_ops_suite",  # suite-level member overlap
    ],
)
def test_overlap_arm_equals_sequential_arm(spark, sf_dir, monkeypatch, name):
    """Overlapped construction is a driver-scheduling detail: the
    overlapped arm and the sequential arm must be row-identical."""
    release_cached_intermediates()
    overlapped = _rows(REGISTRY[name].fn(spark, sf_dir))
    release_cached_intermediates()
    monkeypatch.setenv("MPS_OVERLAP_OFF", "1")
    sequential = _rows(REGISTRY[name].fn(spark, sf_dir))
    release_cached_intermediates()
    assert overlapped == sequential, name
