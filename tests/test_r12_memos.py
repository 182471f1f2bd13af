"""Round-12 optimization-round memo tests: the shared banded-pair frames
(video/audio — r12_queries.video_pairs_frame / audio_pairs_frame), the
image signature/pair memos (r10_queries.image_sig_frame / image_dsig_frame
/ image_pairs_frame), and the eager-materialization helper
(operators/dedup.materialize_shared / persist_now).

Each memo must (a) obey the _C1_MANIFEST_CACHE contract (foreign-session
eviction, <= 1 live entry per (sf_dir, kind), frames survive a full
persist-pool release), (b) produce results row-identical to the bypassed
per-consumer build (MPS_PAIRS_MEMO_OFF / MPS_IMG_MEMO_OFF), and (c) the
eager materialization must re-arm after a release (epoch guard) so a
bench row never reads a stale empty cache silently.
"""

from __future__ import annotations

from collections import Counter

import pytest

from mariadb_postgres_migration_spark import r10_queries as R10
from mariadb_postgres_migration_spark import r12_queries as R12
from mariadb_postgres_migration_spark.operators import dedup as D
from mariadb_postgres_migration_spark.operators.dedup import (
    release_cached_intermediates,
)
from mariadb_postgres_migration_spark.registry import (
    REGISTRY,
    load_all_query_modules,
)

load_all_query_modules()


def _contract(cache, access, spark, sf_dir, keylen):
    """The shared memo contract (test_r12_ops._assert_memo_contract shape,
    tolerating composite keys): dead-session keys evict on access, the
    frame survives a full persist-pool release with identical row count."""
    cache[("dead-app-id", sf_dir) + ("k",) * (keylen - 2)] = object()
    got = access(spark, sf_dir)
    app = spark.sparkContext.applicationId
    assert all(k[0] == app for k in cache)
    per_key = Counter(k[1:] for k in cache)
    assert all(n == 1 for n in per_key.values())
    n_rows = got.count()
    release_cached_intermediates()
    assert access(spark, sf_dir).count() == n_rows


def test_video_pairs_frame_contract(spark, sf_dir):
    _contract(R12._SIG_FRAME_CACHE, R12.video_pairs_frame, spark, sf_dir, 4)


def test_audio_pairs_frame_contract(spark, sf_dir):
    _contract(R12._SIG_FRAME_CACHE, R12.audio_pairs_frame, spark, sf_dir, 4)


def test_image_frames_contract(spark, sf_dir):
    _contract(R10._IMG_FRAME_CACHE, R10.image_sig_frame, spark, sf_dir, 3)
    _contract(R10._IMG_FRAME_CACHE, R10.image_pairs_frame, spark, sf_dir, 3)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.mark.parametrize(
    "name,flag",
    [
        ("x158_image_neardup", "MPS_IMG_MEMO_OFF"),
        ("x167_dualhash_pairs", "MPS_IMG_MEMO_OFF"),
        ("x163_image_dedup_keep_one", "MPS_IMG_MEMO_OFF"),
        ("x214_video_dualverified_keep_one", "MPS_PAIRS_MEMO_OFF"),
        ("x215_audio_dualverified_keep_one", "MPS_PAIRS_MEMO_OFF"),
        ("x191_video_neardup_recall", "MPS_PAIRS_MEMO_OFF"),
    ],
)
def test_memo_arm_equals_bypass_arm(spark, sf_dir, monkeypatch, name, flag):
    """The memoized pair/signature frames are a materialization detail:
    the memo arm and the per-consumer bypass arm must be row-identical."""
    release_cached_intermediates()
    memo = _rows(REGISTRY[name].fn(spark, sf_dir))
    release_cached_intermediates()
    monkeypatch.setenv(flag, "1")
    bypass = _rows(REGISTRY[name].fn(spark, sf_dir))
    release_cached_intermediates()
    assert memo == bypass, name


def test_materialize_shared_rearms_after_release(spark):
    """The epoch guard: one noop pass per key per release epoch — repeated
    access in one epoch skips the pass, a release re-arms it."""
    df = D._persist(spark.range(10))
    D.materialize_shared(df, ("t", "k"))
    epoch0 = D._MATERIALIZED_AT[("t", "k")]
    D.materialize_shared(df, ("t", "k"))
    assert D._MATERIALIZED_AT[("t", "k")] == epoch0
    release_cached_intermediates()
    df2 = D._persist(spark.range(10))
    D.materialize_shared(df2, ("t", "k"))
    assert D._MATERIALIZED_AT[("t", "k")] == epoch0 + 1


def test_materialize_shared_env_bypass(spark, monkeypatch):
    monkeypatch.setenv("MPS_EAGER_MEMO_OFF", "1")
    release_cached_intermediates()
    df = D._persist(spark.range(5))
    D.materialize_shared(df, ("t2", "k"))
    assert ("t2", "k") not in D._MATERIALIZED_AT


def test_release_is_noop_off_main_thread(spark):
    """ADVICE r12 (medium): a scoped release from an overlap() worker must
    not pop pool entries concurrent sibling threads appended, nor bump the
    epoch under their in-flight materialize_shared passes. Off the main
    driver thread the release is a no-op; the owning action's main-thread
    release drains the pool."""
    import threading

    release_cached_intermediates()
    D._persist(spark.range(3))
    epoch = D._PERSIST_EPOCH
    n_pool = len(D._PERSISTED)
    out = {}
    t = threading.Thread(
        target=lambda: out.setdefault("n", release_cached_intermediates())
    )
    t.start()
    t.join()
    assert out["n"] == 0
    assert D._PERSIST_EPOCH == epoch
    assert len(D._PERSISTED) == n_pool
    assert release_cached_intermediates() == n_pool  # main thread drains
    assert len(D._PERSISTED) == 0


def test_memo_locks_evicted_with_foreign_sessions():
    """ADVICE r12 (low): lock keys embedding a dead session's
    applicationId are pruned alongside the memo caches' foreign-session
    eviction, so multi-session processes (pytest) don't leak an RLock per
    key per session; the live session's locks survive."""
    cache: dict = {}
    dead_lock_key = (id(cache), ("dead-app-lockleak", "x"))
    live_lock_key = (id(cache), ("live-app-lockleak", "x"))
    D.memo_lock(dead_lock_key)
    D.memo_lock(live_lock_key)
    cache[("dead-app-lockleak", "x")] = object()
    D.memo_get_or_build(
        cache, "live-app-lockleak", ("live-app-lockleak", "x"), object
    )

    def contains(t, v):
        return any(
            contains(x, v) if isinstance(x, tuple) else x == v for x in t
        )

    assert not any(
        isinstance(k, tuple) and contains(k, "dead-app-lockleak")
        for k in D._MEMO_LOCKS
    )
    assert live_lock_key in D._MEMO_LOCKS
