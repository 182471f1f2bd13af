"""Property-based OP-20 test (SURVEY §5.5): the window+HOF formulation and
the applyInPandas formulation must both match the pure-Python transcription
of the reference walk (index.mjs:64-78) on randomized comment threads,
including deletion interleavings and the strict-> tie case.
"""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from mariadb_postgres_migration_spark.operators.threading import (
    resolve_backrefs,
    resolve_backrefs_grouped,
    resolve_backrefs_py,
)

BASE = datetime(2020, 1, 1)


@st.composite
def threads(draw):
    """A small multi-video comment set with adversarial timing: created_at
    ticks with id; deleted_at drawn to land before/at/after later rows'
    creation times (the exact-tie case occurs with real probability because
    offsets share the same minute grid)."""
    n = draw(st.integers(min_value=1, max_value=24))
    rows = []
    for i in range(1, n + 1):
        video = draw(st.integers(min_value=1, max_value=3))
        carets = draw(
            st.one_of(st.just(0), st.just(0), st.integers(min_value=1, max_value=6))
        )
        content = "^" * carets + ("x" if draw(st.booleans()) else "")
        created = BASE + timedelta(minutes=i)
        if draw(st.booleans()) and draw(st.booleans()):  # ~25% deleted
            del_min = draw(st.integers(min_value=0, max_value=n + 2))
            deleted = BASE + timedelta(minutes=del_min)
        else:
            deleted = None
        rows.append((i, video, content, created, deleted))
    return rows


def _expected(rows):
    out = {}
    by_video: dict[int, list] = {}
    for r in sorted(rows):
        by_video.setdefault(r[1], []).append(r)
    for video, group in by_video.items():
        resp = resolve_backrefs_py(
            [r[0] for r in group],
            [r[2] for r in group],
            [r[3] for r in group],
            [r[4] for r in group],
        )
        for r, v in zip(group, resp):
            out[r[0]] = v
    return out


@pytest.fixture(scope="module")
def make_df(spark):
    def _make(rows):
        return spark.createDataFrame(
            rows, "id long, video_id long, content string, created_at timestamp, deleted_at timestamp"
        )

    return _make


@given(rows=threads())
@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_hof_matches_reference_walk(make_df, rows):
    df = make_df(rows)
    got = {
        r["id"]: r["response_to"]
        for r in resolve_backrefs(df, order_col="id").collect()
    }
    assert got == _expected(rows)


def test_grouped_matches_hof_on_fixture(spark, make_df):
    """The applyInPandas tier agrees with the HOF tier on a dense example
    (one spark job instead of per-example: the Python walk is already the
    property-tested ground truth above)."""
    rows = []
    i = 1
    for video in (1, 2):
        for j in range(40):
            content = "^" * (j % 5) + "t"
            created = BASE + timedelta(minutes=i)
            deleted = BASE + timedelta(minutes=i + (j % 7)) if j % 3 == 0 else None
            rows.append((i, video, content, created, deleted))
            i += 1
    df = make_df(rows)
    hof = {r["id"]: r["response_to"] for r in resolve_backrefs(df).collect()}
    grouped = {
        r["id"]: r["response_to"] for r in resolve_backrefs_grouped(df).collect()
    }
    assert hof == grouped == _expected(rows)


def test_bounded_lookback_exact_when_deep_enough(spark, make_df):
    """max_lookback=L matches unbounded whenever N + #skipped ≤ L."""
    rows = [(i, 1, "^" * min(i - 1, 3) + "c", BASE + timedelta(minutes=i), None) for i in range(1, 30)]
    df = make_df(rows)
    unbounded = {r["id"]: r["response_to"] for r in resolve_backrefs(df).collect()}
    bounded = {
        r["id"]: r["response_to"]
        for r in resolve_backrefs(df, max_lookback=10).collect()
    }
    assert unbounded == bounded


@given(rows=threads())
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_scaled_tier_matches_reference_walk(make_df, rows):
    """The registered scale tier (resolve_backrefs_scaled → grouped walk)
    matches the pure-Python reference on random threads, like the HOF tier."""
    from mariadb_postgres_migration_spark.operators.threading import (
        resolve_backrefs_scaled,
    )

    df = make_df(rows)
    got = {
        r["id"]: r["response_to"]
        for r in resolve_backrefs_scaled(df, order_col="id").collect()
    }
    assert got == _expected(rows)


def test_hot_single_key_partition_bounded_state(spark, make_df):
    """VERDICT r1 item 4: one zipf-pathological key owning a 100k-row
    partition (FIXTURES.md: video_id is zipf-skewed). The grouped tier must
    complete with O(group) state — no per-row accumulated window frames —
    and agree with the pure-Python reference walk end-to-end."""
    n = 100_000
    rows = []
    for i in range(1, n + 1):
        carets = i % 4
        content = "^" * carets + "t"
        created = BASE + timedelta(seconds=i)
        # ~10% deleted, some deletions landing before later rows' creation
        deleted = BASE + timedelta(seconds=i + (i % 3) * 50) if i % 10 == 0 else None
        rows.append((i, 1, content, created, deleted))
    df = make_df(rows).repartition(8)
    got = {
        r["id"]: r["response_to"]
        for r in resolve_backrefs_grouped(df).collect()
    }
    expected = _expected(rows)
    assert got == expected
    # sanity: the fixture actually exercises skips and deep walks
    assert sum(v is not None for v in expected.values()) > n // 2


def test_grouped_streaming_chunk_boundaries_and_null_keys(spark, make_df):
    """The mapInPandas streaming form must (a) not split a group at an
    Arrow-batch boundary (carry logic) and (b) treat NULL partition keys as
    ONE group, not drop them (pandas groupby default) nor fragment them
    (NaN != NaN)."""
    rows = []
    i = 1
    for video in (None, 7, 8):
        for j in range(25):
            content = "^" * (j % 4) + "t"
            created = BASE + timedelta(minutes=i)
            deleted = BASE + timedelta(minutes=i + 2) if j % 5 == 0 else None
            rows.append((i, video, content, created, deleted))
            i += 1
    df = make_df(rows)
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", None)
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "7")
    try:
        got = {
            r["id"]: r["response_to"]
            for r in resolve_backrefs_grouped(df).collect()
        }
    finally:
        if old is None:
            spark.conf.unset("spark.sql.execution.arrow.maxRecordsPerBatch")
        else:
            spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)
    assert len(got) == len(rows), "rows were dropped or duplicated"
    assert got == _expected(rows)


def test_null_created_at_keeps_deleted_predecessors_in_all_tiers(spark):
    """A referring row with UNKNOWN creation time cannot be proven to
    postdate any deletion, so every tier must KEEP deleted predecessors
    (JS reference: null > x is false). Previously the JVM filter's
    `bdel >= NULL` silently skipped them and the pure-Python walk raised
    TypeError on `None > datetime`."""
    rows = [
        (1, 1, "x", BASE, BASE + timedelta(minutes=5)),  # deleted predecessor
        (2, 1, "^x", None, None),  # NULL created_at, one caret
    ]
    # pure-Python walk: no crash, predecessor kept
    resp = resolve_backrefs_py(
        [r[0] for r in rows], [r[2] for r in rows],
        [r[3] for r in rows], [r[4] for r in rows],
    )
    assert resp == [None, 1]

    df = spark.createDataFrame(
        rows, "id long, video_id long, content string, created_at timestamp, deleted_at timestamp"
    )
    for fn in (resolve_backrefs, resolve_backrefs_grouped):
        got = {r["id"]: r["response_to"] for r in fn(df).select("id", "response_to").collect()}
        assert got == {1: None, 2: 1}, fn.__name__


def test_scaled_bounded_tier_hot_key_frame_and_parity(spark, make_df):
    """VERDICT r5 item 7: the 100 TB skew story for OP-20 (SCALE.md
    §Window/threading) pins the BOUNDED tier on a one-hot-video fixture:
    ``resolve_backrefs_scaled(max_lookback=L)`` must (a) plan a window
    frame bounded at -L — O(p·L) state on a hot key, never the O(p²)
    unbounded collect_list frame — and (b) agree with the pure-Python
    reference walk when N + skipped-deleted ≤ L (this fixture's carets ≤ 3
    and 10% deletion density keep the needed depth far under L=64)."""
    from mariadb_postgres_migration_spark.operators.threading import (
        resolve_backrefs_scaled,
    )

    n = 20_000
    rows = []
    for i in range(1, n + 1):
        content = "^" * (i % 4) + "t"
        created = BASE + timedelta(seconds=i)
        deleted = BASE + timedelta(seconds=i + (i % 3) * 50) if i % 10 == 0 else None
        rows.append((i, 1, content, created, deleted))  # ONE hot video_id
    df = make_df(rows).repartition(8)
    out = resolve_backrefs_scaled(df, order_col="id", max_lookback=64)
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert "-64, -1" in plan, "lookback bound missing from the window frame"
    assert "unboundedpreceding" not in plan.lower()
    got = {r["id"]: r["response_to"] for r in out.collect()}
    expected = _expected(rows)
    assert got == expected
    assert sum(v is not None for v in expected.values()) > n // 2
