"""Round-12 operator tests.

Wave 1 (VERDICT r11 'What's wrong: x189' / 'What's missing #2'): the
c7/c9/c10 memo caches added so x187 stops rebuilding the full c9 AND c10
chains (image decode + video decode + two c7 builds) inside one action —
each memo must obey the _C1_MANIFEST_CACHE contract (foreign-session
eviction on access, <= 1 live entry per sf_dir, frames survive a full
persist-pool release) and the memoized results must equal the
un-memoized pipelines row-for-row.
"""

from __future__ import annotations

from collections import Counter

import pytest

from mariadb_postgres_migration_spark import r9_queries as R9
from mariadb_postgres_migration_spark import r11_queries as R11
from mariadb_postgres_migration_spark.operators.dedup import (
    release_cached_intermediates,
)
from mariadb_postgres_migration_spark.registry import (
    REGISTRY,
    load_all_query_modules,
)

load_all_query_modules()


@pytest.fixture(scope="module")
def q(spark, sf_dir):
    def _run(name):
        return REGISTRY[name].fn(spark, sf_dir)

    return _run


def _assert_memo_contract(cache, access, spark, sf_dir, count_of):
    """The shared memo contract: dead-session keys evict on access, <= 1
    live entry per sf_dir, and the memoized frame survives a full
    persist-pool release (re-persist-on-access)."""
    cache[("dead-app-id", sf_dir)] = object()
    cache[("dead-app-id", "/elsewhere/sf9")] = object()
    got = access(spark, sf_dir)
    app = spark.sparkContext.applicationId
    assert all(k[0] == app for k in cache)
    per_sf = Counter(k[1] for k in cache)
    assert all(n == 1 for n in per_sf.values())
    n_rows = count_of(got)
    assert n_rows > 0
    release_cached_intermediates()
    assert count_of(access(spark, sf_dir)) == n_rows


def test_c7_manifest_cache_contract(spark, sf_dir):
    _assert_memo_contract(
        R9._C7_MANIFEST_CACHE, R9._c7_result, spark, sf_dir,
        lambda df: df.count(),
    )


def test_c9_frames_cache_contract(spark, sf_dir):
    _assert_memo_contract(
        R11._C9_FRAMES_CACHE, R11._c9_frames, spark, sf_dir,
        lambda st: st["result"].count(),
    )


def test_c10_frames_cache_contract(spark, sf_dir):
    _assert_memo_contract(
        R11._C10_FRAMES_CACHE, R11._c10_frames, spark, sf_dir,
        lambda st: st["result"].count(),
    )


def test_c7_memo_matches_pipeline(q, spark, sf_dir):
    """_c7_result is the SAME rows as the registered c7 pipeline — the
    memo is a materialization detail, never a semantic fork."""
    memo = R9._c7_result(spark, sf_dir)
    direct = q("c7_pretraining_pipeline")
    assert memo.columns == direct.columns
    assert memo.exceptAll(direct).count() == 0
    assert direct.exceptAll(memo).count() == 0


def test_x187_split_rc_matches_lazy_form(q, spark, sf_dir, monkeypatch):
    """The shipped lazy form and the MPS_X187_SPLIT=1 split-rc form
    (eager manifests, early release) must produce identical rows — the
    A/B flip is a physical-form switch only."""
    lazy = sorted(q("x187_crossmodal_pairs").collect())
    monkeypatch.setenv("MPS_X187_SPLIT", "1")
    rc = sorted(q("x187_crossmodal_pairs").collect())
    assert rc == lazy
