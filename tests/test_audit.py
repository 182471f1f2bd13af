"""Invariant tests for the pipeline-health operators (operators/audit.py):
expectation audit semantics, SCD2 interval tiling, the Misra-Gries
exactness guarantee, and corpus-drift plan shape. Oracle parity for the
registered x61–x64 queries is covered by test_core_queries."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from mariadb_postgres_migration_spark.operators import audit as A
from mariadb_postgres_migration_spark.sources.parquet import read_parquet_table


def test_expectations_report_is_consistent(spark, sf_dir):
    orders = read_parquet_table(spark, sf_dir, "orders")
    customer = read_parquet_table(spark, sf_dir, "customer")
    rows = {r["check_name"]: r for r in A.expectations_audit(orders, customer).collect()}
    n = orders.count()
    assert len(rows) == 7
    for r in rows.values():
        assert r["total"] == n
        assert r["ok"] == (r["violations"] == 0)
        assert 0 <= r["violations"] <= n
    # TPC-H data is clean except for the deliberately tight price band
    assert rows["orderkey_unique"]["violations"] == 0
    assert rows["custkey_refint"]["violations"] == 0
    assert rows["totalprice_range"]["violations"] > 0  # both verdicts exercised


def test_expectations_flag_injected_violations(spark):
    orders = spark.createDataFrame(
        [
            (1, 10, "O", 5000.0, "2024-01-01 00:00:00", "1-URGENT"),
            (1, 10, "O", 5000.0, "2024-01-01 00:00:00", "1-URGENT"),  # dup key
            (2, None, "Z", -5.0, None, "bogus"),  # null fk, bad domain/range/format
            (3, 99, "F", 2000.0, "2024-01-02 00:00:00", "5-LOW"),  # fk not in dim
        ],
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate string, o_orderpriority string",
    ).withColumn("o_orderdate", F.to_timestamp("o_orderdate"))
    customer = spark.createDataFrame([(10,)], "c_custkey long")
    got = {r["check_name"]: r["violations"] for r in A.expectations_audit(orders, customer).collect()}
    assert got == {
        "orderkey_unique": 1,
        "custkey_not_null": 1,
        "custkey_refint": 1,  # null fk is not a refint violation, key 99 is
        "orderdate_not_null": 1,
        "status_domain": 1,
        "priority_format": 1,  # 'bogus'
        "totalprice_range": 1,  # -5.0
    }


def test_scd2_intervals_tile_each_user(spark, sf_dir):
    events = read_parquet_table(spark, sf_dir, "events")
    iv = A.scd2_intervals(events).collect()
    by_user = {}
    for r in iv:
        by_user.setdefault(r["user_id"], []).append(r)
    assert by_user
    for user, rows in by_user.items():
        rows.sort(key=lambda r: r["version"])
        # versions contiguous from 1; intervals chain with no gap/overlap
        assert [r["version"] for r in rows] == list(range(1, len(rows) + 1))
        for prev, nxt in zip(rows, rows[1:]):
            assert prev["valid_to_us"] == nxt["valid_from_us"]
            assert prev["valid_from_us"] <= prev["valid_to_us"]
            assert prev["event_type"] != nxt["event_type"]  # runs collapsed
        assert rows[-1]["valid_to_us"] is None  # current state is open-ended


def test_scd2_point_lookup_matches_raw_events(spark, sf_dir):
    """'State as of t' from the intervals == the latest raw event ≤ t."""
    events = read_parquet_table(spark, sf_dir, "events")
    iv = A.scd2_intervals(events)
    raw = events.select(
        "user_id", "event_type", F.unix_micros("ts").alias("us"), "event_id"
    ).collect()
    by_user = {}
    for r in raw:
        by_user.setdefault(r["user_id"], []).append(r)
    user = sorted(by_user)[0]
    seq = sorted(by_user[user], key=lambda r: (r["us"], r["event_id"]))
    t = seq[len(seq) // 2]["us"]
    expect = [r for r in seq if r["us"] <= t][-1]["event_type"]
    got = (
        iv.filter(
            (F.col("user_id") == user)
            & (F.col("valid_from_us") <= t)
            & (F.col("valid_to_us").isNull() | (F.col("valid_to_us") > t))
        )
        .collect()
    )
    assert len(got) == 1 and got[0]["event_type"] == expect


def test_frequent_terms_equals_naive_exact_count(spark, sf_dir):
    docs = read_parquet_table(spark, sf_dir, "documents")
    from mariadb_postgres_migration_spark.operators import textanalysis as T

    toked = T._with_tokens(docs, "doc_id", "text")
    naive = {
        (r["term"], r["n"])
        for r in toked.select(F.explode("__toks").alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .filter(F.col("n") >= 10)
        .collect()
    }
    got = {
        (r["term"], r["n"])
        for r in A.frequent_terms(docs, min_count=10).collect()
    }
    assert got == naive and got  # exact equality, non-trivial result


def test_mg_summary_never_drops_a_guaranteed_heavy_hitter():
    """Unit-level MG bound: a term with count > n/(k+1) in the partition
    must survive the batched summary, however the batches split."""
    toks = [["hot"] * 3 + [f"rare{i}{j}" for j in range(7)] for i in range(40)]
    # n = 400 tokens, "hot" has 120 > 400/(k+1) for k = 9
    gen = A._mg_candidates(k=9)
    batches = [pd.DataFrame({"__toks": toks[i : i + 5]}) for i in range(0, 40, 5)]
    out = pd.concat(list(gen(iter(batches))))
    assert "hot" in set(out["term"])
    assert len(set(out["term"])) <= 9


def test_frequent_terms_rejects_vocabulary_scale_thresholds(spark, sf_dir, monkeypatch):
    docs = read_parquet_table(spark, sf_dir, "documents")
    monkeypatch.setattr(A, "MAX_MG_COUNTERS", 4)
    with pytest.raises(ValueError, match="MG counters"):
        A.frequent_terms(docs, min_count=2)


def test_corpus_drift_reuses_the_term_exchange(spark, sf_dir):
    # a cached tokenize fragment from an earlier test substitutes an
    # InMemoryRelation into ONE branch and hides the exchange reuse this
    # test asserts — pin a cache-free plan
    spark.catalog.clearCache()
    docs = read_parquet_table(spark, sf_dir, "documents")
    df = A.corpus_drift(docs)
    rows = df.collect()  # run first: AQE only materializes reuse in the final plan
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ReusedExchange" in plan  # one term shuffle feeds totals AND output
    assert rows
    for r in rows:
        assert r["n_a"] + r["n_b"] >= 20
        assert r["drift_ratio"] > 0


def test_mg_guarantee_fuzzed_against_random_corpora_and_splits():
    """Property (hypothesis): for ANY token multiset, batch split, and
    counter budget k, every term with total count > n/(k+1) survives the
    batched Misra-Gries summary — the bound frequent_terms' exactness
    rests on."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=200, deadline=None)
    @given(
        tokens=st.lists(st.integers(min_value=0, max_value=30), min_size=1, max_size=400),
        k=st.integers(min_value=1, max_value=12),
        n_batches=st.integers(min_value=1, max_value=5),
        data=st.data(),
    )
    def run(tokens, k, n_batches, data):
        words = [f"t{i}" for i in tokens]
        # random contiguous split into n_batches document groups
        cuts = sorted(
            data.draw(
                st.lists(
                    st.integers(0, len(words)), min_size=n_batches - 1,
                    max_size=n_batches - 1,
                )
            )
        )
        bounds = [0, *cuts, len(words)]
        batches = [
            pd.DataFrame({"__toks": [words[a:b]]}) for a, b in zip(bounds, bounds[1:])
        ]
        out = pd.concat(list(A._mg_candidates(k)(iter(batches))))
        kept = set(out["term"])
        assert len(kept) <= k
        n = len(words)
        from collections import Counter

        for term, cnt in Counter(words).items():
            if cnt > n / (k + 1):
                assert term in kept, f"{term} (count {cnt} > {n}/{k + 1}) dropped"

    run()


def test_profile_table_counts_nulls_distincts_and_canonical_minmax(spark):
    from mariadb_postgres_migration_spark.operators.profile import profile_table

    import datetime as dt

    rows = [
        (1, "a", 1.005, dt.datetime(2024, 1, 1)),
        (2, "b", 2.344, dt.datetime(2024, 6, 1)),
        (3, None, None, None),
        (None, "b", 2.344, dt.datetime(2024, 6, 1)),
    ]
    df = spark.createDataFrame(
        rows, "k long, s string, v double, t timestamp"
    )
    got = {
        r["column_name"]: (
            r["n_rows"], r["n_null"], r["n_distinct"], r["min_s"], r["max_s"]
        )
        for r in profile_table(
            df, [("k", "int"), ("s", "str"), ("v", "cents"), ("t", "ts")]
        ).collect()
    }
    assert got["k"] == (4, 1, 3, "1", "3")
    assert got["s"] == (4, 1, 2, "a", "b")
    # cents: the half-up recipe operates on the BINARY double both engines
    # share — 1.005 stores as 1.00499…, so floor(x*100 + 0.5) = 100 in
    # both (what matters is identity, not decimal prettiness)
    assert got["v"] == (4, 1, 2, "100", "234")
    # ts: epoch micros of the typed min/max
    assert got["t"][0:3] == (4, 1, 2)
    assert got["t"][3] == str(
        int(dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc).timestamp() * 1e6)
    )


def test_profile_table_is_one_pass(spark, sf_dir):
    from mariadb_postgres_migration_spark.operators.profile import profile_table
    from mariadb_postgres_migration_spark.sources.parquet import (
        read_parquet_table as rd,
    )
    from mariadb_postgres_migration_spark.plans.inspect import formatted_plan

    df = profile_table(
        rd(spark, sf_dir, "orders"),
        [("o_orderkey", "int"), ("o_totalprice", "cents")],
    )
    plan = formatted_plan(df)
    # exactly one scan NODE in the plan tree (one-pass claim; the node
    # prints once in the tree as "Scan parquet  (n)" and once again in
    # the details section) and the Expand that implements exact
    # multi-column distinct inside that single pass
    assert plan.count("Scan parquet  (") == 1
    assert "Expand" in plan


def test_cohort_retention_hand_checked(spark):
    from mariadb_postgres_migration_spark.operators.audit import (
        WEEK_US,
        cohort_retention,
    )

    import datetime as dt

    def ts(week, day=0):
        return dt.datetime.fromtimestamp(
            (week * 7 + day) * 86400, dt.timezone.utc
        ).replace(tzinfo=None)

    rows = [
        # user 1: first in week 100, back in weeks 101 and 103 (twice)
        (1, ts(100)), (1, ts(101)), (1, ts(103)), (1, ts(103, 2)),
        # user 2: same cohort, only week 100
        (2, ts(100, 3)),
        # user 3: cohort week 101, back week 102
        (3, ts(101)), (3, ts(102)),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    got = {
        (r["cohort_week"], r["week_offset"]): r["n_users"]
        for r in cohort_retention(df).collect()
    }
    assert got == {
        (100, 0): 2, (100, 1): 1, (100, 3): 1,
        (101, 0): 1, (101, 1): 1,
    }


def test_markov_transitions_hand_checked(spark):
    from mariadb_postgres_migration_spark.operators.audit import (
        markov_transitions,
    )

    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)

    def ev(i, u, et):
        return (i, u, t0 + dt.timedelta(minutes=i), et)

    rows = [
        # user 1: a -> b -> a -> c
        ev(1, 1, "a"), ev(2, 1, "b"), ev(3, 1, "a"), ev(4, 1, "c"),
        # user 2: a -> b (no cross-user transition to user 1's events)
        ev(5, 2, "a"), ev(6, 2, "b"),
        # user 3: single event -> contributes nothing
        ev(7, 3, "a"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string"
    )
    got = {
        (r["from_type"], r["to_type"]): (r["n"], r["p_milli"])
        for r in markov_transitions(df).collect()
    }
    # from 'a': a->b twice, a->c once; from 'b': b->a once
    assert got == {
        ("a", "b"): (2, 666),
        ("a", "c"): (1, 333),
        ("b", "a"): (1, 1000),
    }


def test_decayed_value_hand_checked_staircase(spark):
    from mariadb_postgres_migration_spark.operators.audit import decayed_value

    import datetime as dt

    t0 = dt.datetime(2024, 3, 1)
    rows = [
        # newest event (defines the reference point): full value
        (1, 1, t0, 40.0),
        # 7 days old = exactly one half-life: halved
        (2, 1, t0 - dt.timedelta(days=7), 40.0),
        # 6.99 days old: still full value (staircase, not smooth decay)
        (3, 1, t0 - dt.timedelta(days=7) + dt.timedelta(seconds=1), 40.0),
        # 21 days old = three half-lives: 4000 >> 3 = 500
        (4, 2, t0 - dt.timedelta(days=21), 40.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, value double"
    )
    got = {
        r["user_id"]: (r["n_events"], r["raw_cents"], r["decayed_cents"])
        for r in decayed_value(df).collect()
    }
    assert got == {1: (3, 12000, 4000 + 2000 + 4000), 2: (1, 4000, 500)}


def test_frequent_trigrams_hand_checked(spark):
    from mariadb_postgres_migration_spark.operators.audit import (
        frequent_trigrams,
    )

    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    seqs = {1: "aabab", 2: "aab", 3: "ab"}  # user 3: too short, no trigram
    rows = []
    i = 0
    for u, s in seqs.items():
        for ch in s:
            rows.append((i, u, t0 + dt.timedelta(minutes=i), ch))
            i += 1
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string"
    )
    got = [(r["rk"], r["trigram"], r["n"]) for r in frequent_trigrams(df, k=3).collect()]
    # user1: aab, aba, bab ; user2: aab  -> aab x2, others x1 (tie on text)
    assert got == [(1, "a>a>b", 2), (2, "a>b>a", 1), (3, "b>a>b", 1)]


def test_decayed_value_shift_clamp_matches_oracle_for_negatives(spark):
    """Shift-clamp boundary (review r7 advice + brief): an event older
    than 64 half-lives makes the raw shift >= 64 — Java's shiftright
    masks mod 64 (wrapping to full value!), DuckDB's >> saturates to 0.
    The 62 clamp must live in BOTH engines so a NEGATIVE value (a
    refund) floors to -1 on both sides, not 0-vs--1 or a wrap."""
    import datetime as dt

    import duckdb

    from mariadb_postgres_migration_spark.operators.audit import (
        decayed_value,
        decayed_value_sql,
    )

    t0 = dt.datetime(2024, 3, 1)
    day = dt.timedelta(days=1)
    rows = [
        # newest event anchors the reference point
        (1, 1, t0, 10.0),
        # refund older than 64 half-lives (7d half-life → >448 days):
        # raw shift 65 would WRAP in Java (>> 1) and saturate in DuckDB
        (2, 1, t0 - 455 * day, -10.0),
        # refund exactly at the clamp (62 half-lives = 434 days): -1
        (3, 2, t0 - 434 * day, -10.0),
        # positive value past the clamp: floors to 0 on both sides
        (4, 2, t0 - 500 * day, 10.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, value double"
    )
    got = {
        r["user_id"]: (r["n_events"], r["raw_cents"], r["decayed_cents"])
        for r in decayed_value(df).collect()
    }
    # u1: 1000 + (-1000 >> 62 == -1) ; u2: (-1) + 0
    assert got == {1: (2, 0, 999), 2: (2, 0, -1)}

    us = lambda d: int(d.timestamp() * 1_000_000)  # noqa: E731
    cte = " UNION ALL ".join(
        f"SELECT CAST({u} AS BIGINT) AS u, CAST({us(ts)} AS BIGINT) AS us,"
        f" CAST({int(v * 100)} AS BIGINT) AS cents"
        for (_e, u, ts, v) in rows
    )
    want = {
        int(u): (int(n), int(rc), int(dc))
        for u, n, rc, dc in duckdb.connect()
        .execute(decayed_value_sql(cte, "user_id"))
        .fetchall()
    }
    assert want == got
