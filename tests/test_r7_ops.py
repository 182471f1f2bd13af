"""Operator-level tests for the r7 additions: hand-checked fixtures and
independent-reference comparisons (numpy / pure Python), next to the
oracle-parity rows test_core_queries already runs for each."""

from __future__ import annotations

import datetime as dt
import math

import numpy as np

from pyspark.sql import functions as F


def _ev_rows(spec):
    """[(user, minutes...)] → event rows with ids in global order."""
    t0 = dt.datetime(2024, 1, 1)
    rows = []
    i = 0
    for u, minutes in spec:
        for m in minutes:
            rows.append((i, u, t0 + dt.timedelta(minutes=m)))
            i += 1
    return rows


def test_sessionize_hand_checked(spark):
    from mariadb_postgres_migration_spark.operators.audit import sessionize

    # user 1: events at 0, 10, 50, 90 min with 30-min gap →
    # sessions {0,10}, {50}, {90}; user 2: single event
    rows = _ev_rows([(1, [0, 10, 50, 90]), (2, [5])])
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp")
    got = {
        (r["user_id"], r["session_idx"]): (r["n_events"], r["duration_us"])
        for r in sessionize(df).collect()
    }
    assert got == {
        (1, 0): (2, 600_000_000),
        (1, 1): (1, 0),
        (1, 2): (1, 0),
        (2, 0): (1, 0),
    }


def test_sessionize_gap_boundary_is_exclusive(spark):
    from mariadb_postgres_migration_spark.operators.audit import sessionize

    # gap exactly == 30 min stays in the SAME session (strict > closes)
    rows = _ev_rows([(1, [0, 30]), (2, [0, 30.0000001])])
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp")
    got = {r["user_id"]: r["session_idx"] for r in sessionize(df).collect()
           if r["n_events"] == 1}
    sessions_u1 = [r for r in sessionize(df).collect() if r["user_id"] == 1]
    assert len(sessions_u1) == 1 and sessions_u1[0]["n_events"] == 2
    assert got == {2: 1} or 2 in got  # user 2 split into two sessions


def test_autocorr_matches_numpy(spark):
    from mariadb_postgres_migration_spark.operators.audit import autocorr_daily

    # deterministic weekly-ish pattern over 40 days, one row per event
    counts = [(d, 3 + (d % 7)) for d in range(40)]
    t0 = dt.datetime(2024, 1, 1)
    rows = []
    for d, n in counts:
        for _ in range(n):
            rows.append((t0 + dt.timedelta(days=d),))
    df = spark.createDataFrame(rows, "ts timestamp")
    got = {r["lag"]: (r["n_pairs"], r["r"]) for r in
           autocorr_daily(df, "ts", max_lag=3).collect()}
    v = np.array([n for _, n in counts], dtype=float)
    for k in range(1, 4):
        x, y = v[k:], v[:-k]
        r = np.corrcoef(x, y)[0, 1]
        n_pairs, got_r = got[k]
        assert n_pairs == len(x)
        assert abs(got_r - r) < 5e-4, (k, got_r, r)
    # lag 7 on this pattern would be exactly 1; check via a wider run
    got7 = {r["lag"]: r["r"] for r in autocorr_daily(df, "ts", max_lag=7).collect()}
    assert got7[7] == 1.0


def test_benford_hand_checked(spark):
    from mariadb_postgres_migration_spark.operators.profile import (
        BENFORD_PPM,
        benford_audit,
    )

    # values whose CENTS start with digits 1,1,2,9; zero/negative dropped
    df = spark.createDataFrame(
        [(1.0,), (1.23,), (0.25,), (9.99,), (0.0,), (-5.0,)], "v double"
    )
    got = {r["digit"]: (r["n"], r["n_total"], r["obs_ppm"], r["exp_ppm"])
           for r in benford_audit(df, "v").collect()}
    assert got == {
        1: (2, 4, 500000, BENFORD_PPM[0]),
        2: (1, 4, 250000, BENFORD_PPM[1]),
        9: (1, 4, 250000, BENFORD_PPM[8]),
    }
    assert sum(BENFORD_PPM) == 1_000_000


def test_hll_matches_python_reference(spark):
    """The register table and the integer estimate must equal a direct
    Python transcription of the algorithm over the same md5 hashes."""
    import hashlib

    from mariadb_postgres_migration_spark.operators.sketches import (
        HLL_ALPHA_MILLI,
        HLL_M,
        HLL_MAX_RANK,
        HLL_REM_BITS,
        HLL_Z_SCALE,
        hll_distinct,
    )

    keys = [f"k{i}" for i in range(800)]
    df = spark.createDataFrame([("g", k) for k in keys], "g string, k string")
    [row] = hll_distinct(df, ["g"], "k").collect()

    regs = {}
    for k in set(keys):
        h = int(hashlib.md5(k.encode()).hexdigest()[:8], 16)
        b = h >> HLL_REM_BITS
        w = h % (1 << HLL_REM_BITS)
        r = HLL_MAX_RANK - w.bit_length()
        regs[b] = max(regs.get(b, 0), r)
    z27 = sum(1 << (HLL_MAX_RANK - r) for r in regs.values())
    z27 += (HLL_M - len(regs)) * HLL_Z_SCALE
    est = (HLL_ALPHA_MILLI * HLL_M * HLL_M * HLL_Z_SCALE) // (1000 * z27)
    assert (row["n_zero"], row["z27"], row["est_distinct"], row["exact_distinct"]) == (
        HLL_M - len(regs), z27, est, 800
    )
    # sanity: raw HLL error at m=64 is ~13%; this draw should be sane
    assert abs(est - 800) / 800 < 0.4


def test_pmi_collocations_hand_checked(spark):
    from mariadb_postgres_migration_spark.operators.textanalysis import (
        pmi_collocations,
    )

    # "a b" appears 6x, tokens: a:6, b:6, c:3 → N1=15, N12=12 bigrams
    docs = [(i, "a b c a b" if i % 2 == 0 else "a b") for i in range(6)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = [(r["rk"], r["w1"], r["w2"], r["c12"], r["lift"])
           for r in pmi_collocations(df, min_count=3, k=5).collect()]
    # bigrams per doc: even (3 docs): (a,b),(b,c),(c,a),(a,b); odd (3): (a,b)
    # c12: (a,b)=9, (b,c)=3, (c,a)=3 ; unigrams: a=9, b=9, c=3; N1=21, N12=15
    def lift(c12, c1, c2):
        return round(c12 * 21.0 * 21.0 / (15.0 * c1 * c2), 4)

    assert got == [
        (1, "a", "b", 9, lift(9, 9, 9)),
        (2, "b", "c", 3, lift(3, 9, 3)),
        (3, "c", "a", 3, lift(3, 3, 9)),
    ]


def test_tfidf_cosine_matches_numpy_bruteforce(spark):
    from mariadb_postgres_migration_spark.operators.dedup import (
        tfidf_cosine_pairs,
    )

    texts = {
        0: "apple banana cherry date",
        1: "apple banana cherry fig",
        2: "apple banana cherry date",  # exact dup of 0
        3: "wholly different words here",
        4: "banana banana banana apple",
    }
    df = spark.createDataFrame(list(texts.items()), "doc_id long, text string")
    got = {
        (r["doc_a"], r["doc_b"]): (r["dot"], r["cosine"])
        for r in tfidf_cosine_pairs(df, threshold=0.5).collect()
    }

    # independent reconstruction with the same integer-weight recipe
    tf = {d: {} for d in texts}
    for d, t in texts.items():
        for w in t.split():
            tf[d][w] = tf[d].get(w, 0) + 1
    n = len(texts)
    dfreq = {}
    for d in texts:
        for w in tf[d]:
            dfreq[w] = dfreq.get(w, 0) + 1
    wts = {
        d: {
            w: c * math.floor(1000.0 * math.log(n / dfreq[w]) + 0.5)
            for w, c in tf[d].items()
        }
        for d in texts
    }
    exp = {}
    for a in texts:
        for b in texts:
            if a >= b:
                continue
            dot = sum(wa * wts[b].get(w, 0) for w, wa in wts[a].items())
            na = math.sqrt(sum(v * v for v in wts[a].values()))
            nb = math.sqrt(sum(v * v for v in wts[b].values()))
            if na and nb and dot / (na * nb) >= 0.5:
                exp[(a, b)] = (dot, round(dot / (na * nb), 4))
    assert got == exp
    assert (0, 2) in got and got[(0, 2)][1] == 1.0  # exact dup → cos 1
    assert all(3 not in pair for pair in got)  # disjoint doc never pairs


def test_tfidf_df_cap_drops_stop_terms(spark):
    from mariadb_postgres_migration_spark.operators.dedup import (
        tfidf_cosine_pairs,
    )

    # 'the' is in every doc; with max_doc_freq=2 it leaves the vector
    # space, so two docs sharing ONLY 'the' cannot pair at all
    docs = [(0, "the apple pie"), (1, "the zebra crossing"), (2, "the apple pie")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {(r["doc_a"], r["doc_b"]) for r in
           tfidf_cosine_pairs(df, threshold=0.1, max_doc_freq=2).collect()}
    assert got == {(0, 2)}


def test_sessionize_plans_one_exchange(spark, sf_dir):
    """Both windows (lag flag, running session ordinal) and the final
    (user, session) group must share ONE user-keyed exchange —
    HashPartitioning(u) satisfies the (u, sidx) clustering."""
    from mariadb_postgres_migration_spark.operators.audit import sessionize
    from mariadb_postgres_migration_spark.plans.inspect import exchange_count
    from mariadb_postgres_migration_spark.registry import _t

    assert exchange_count(sessionize(_t(spark, sf_dir, "events"))) == 1


def test_tfidf_plan_has_no_cartesian(spark, sf_dir):
    from mariadb_postgres_migration_spark.operators.dedup import (
        tfidf_cosine_pairs,
    )
    from mariadb_postgres_migration_spark.plans.inspect import formatted_plan
    from mariadb_postgres_migration_spark.registry import _t

    import re

    plan = formatted_plan(tfidf_cosine_pairs(_t(spark, sf_dir, "documents")))
    # every data-sized join must be equi-keyed (term / doc id): at fixture
    # scale they broadcast, at corpus scale they shuffle — never a product.
    # Exactly ONE conditionless join is allowed: the 1-row n_docs scalar
    # (the repo's standard bounded "1-row totals broadcast" pattern).
    assert "CartesianProduct" not in plan
    nlj_nodes = {
        m.group(1)
        for m in re.finditer(r"BroadcastNestedLoopJoin[^\n]*\((\d+)\)", plan)
    }
    assert len(nlj_nodes) <= 1, f"unexpected nested-loop joins: {nlj_nodes}"
