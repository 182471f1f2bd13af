"""Operator-level tests for the r8 additions: hand-checked fixtures and
independent-reference comparisons (numpy / pure Python), next to the
oracle-parity rows test_core_queries already runs for each."""

from __future__ import annotations

import datetime as dt

import numpy as np

# ---------------------------------------------------------------------------
# x124 — CUSUM changepoint
# ---------------------------------------------------------------------------


def _day_rows(spec):
    """[(event_type, day, count)] → one event row per count at that day."""
    t0 = dt.datetime(1970, 1, 1)
    rows = []
    i = 0
    for et, day, n in spec:
        for _ in range(n):
            rows.append((i, et, t0 + dt.timedelta(days=day, hours=1)))
            i += 1
    return rows


def _cusum_brute(series):
    """Transcribed definition: argmax_d |n·cum_d − k·T| (the n-scaled
    S_d = Σ_{i≤d}(v_i − T/n)), ties to largest |S'| then earliest day."""
    days = sorted(series)
    vals = [series[d] for d in days]
    n, total = len(vals), sum(vals)
    best = None
    cum = 0
    for k, (d, v) in enumerate(zip(days, vals), start=1):
        cum += v
        s = abs(n * cum - k * total)
        key = (s, -d)
        if best is None or key > best[0]:
            best = (key, d, s)
    return best[1], best[2], n, total


def test_cusum_level_shift_hand_checked(spark):
    """A clean level shift: 5 days at 2/day then 5 days at 10/day. The
    mean is 6; cumulative deviation bottoms out exactly at the last
    low day (day 4): S'_4 = 10·10 − 5·60 = −200 → s_abs 200."""
    from mariadb_postgres_migration_spark.operators.audit import cusum_changepoint

    spec = [("a", d, 2) for d in range(5)] + [("a", d, 10) for d in range(5, 10)]
    df = spark.createDataFrame(
        _day_rows(spec), "event_id long, event_type string, ts timestamp"
    )
    [row] = cusum_changepoint(df).collect()
    assert (row["cp_day"], row["s_abs"], row["n_days"], row["total"]) == (
        4, 200, 10, 60,
    )


def test_cusum_matches_brute_force_per_type(spark):
    """Two noisy series vs the transcribed-definition brute force,
    including the tie rule."""
    from mariadb_postgres_migration_spark.operators.audit import cusum_changepoint

    rng = np.random.RandomState(8)
    series = {
        "x": {int(d): int(rng.randint(1, 6)) for d in range(20)},
        "y": {int(d): (3 if d < 7 else 9) for d in range(15)},
    }
    spec = [(et, d, n) for et, s in series.items() for d, n in s.items()]
    df = spark.createDataFrame(
        _day_rows(spec), "event_id long, event_type string, ts timestamp"
    )
    got = {
        r["event_type"]: (r["cp_day"], r["s_abs"], r["n_days"], r["total"])
        for r in cusum_changepoint(df).collect()
    }
    for et, s in series.items():
        assert got[et] == _cusum_brute(s), et


# ---------------------------------------------------------------------------
# x125 — label propagation
# ---------------------------------------------------------------------------


def test_label_propagation_recovers_cliques(spark):
    """Two 3-cliques joined by one bridge edge: LPA assigns each clique
    its smallest member's label and the bridge does not merge them
    (the component-recovery fixture CC would merge — the point of LPA)."""
    from mariadb_postgres_migration_spark.operators.graph import label_propagation

    edges = [(1, 2), (1, 3), (2, 3), (10, 11), (10, 12), (11, 12), (3, 10)]
    df = spark.createDataFrame(edges, "a long, b long")
    got = {r["node"]: r["lbl"] for r in label_propagation(df, rounds=3).collect()}
    # hand-unrolled 3 rounds: left clique converges to label 1 (with the
    # bridge node 3 joining it), right clique to label 3 (the bridge id
    # propagated in — the known synchronous-LPA naming quirk; the
    # COMMUNITIES are what matters and they stay distinct)
    assert got == {1: 1, 2: 1, 3: 1, 10: 3, 11: 3, 12: 3}
    left = {got[1], got[2], got[3]}
    right = {got[10], got[11], got[12]}
    assert len(left) == 1 and len(right) == 1 and left != right


def test_label_propagation_is_deterministic_unroll(spark):
    """Same graph, two runs → identical labels (the randomized-LPA paper
    variant would not be; determinism is the operator's contract)."""
    from mariadb_postgres_migration_spark.operators.graph import label_propagation

    edges = [(i, i + 1) for i in range(1, 12)] + [(4, 9), (2, 7)]
    df = spark.createDataFrame(edges, "a long, b long")
    a = sorted(map(tuple, label_propagation(df, rounds=3).collect()))
    b = sorted(map(tuple, label_propagation(df, rounds=3).collect()))
    assert a == b


def test_label_propagation_star_adopts_center(spark):
    """A star: after round 1 every leaf holds the center's label iff the
    center id is smaller (leaf's only neighbor IS the center)."""
    from mariadb_postgres_migration_spark.operators.graph import label_propagation

    edges = [(1, k) for k in range(2, 8)]
    df = spark.createDataFrame(edges, "a long, b long")
    got = {r["node"]: r["lbl"] for r in label_propagation(df, rounds=1).collect()}
    assert all(got[k] == 1 for k in range(2, 8))


# ---------------------------------------------------------------------------
# x126 — Spearman daily
# ---------------------------------------------------------------------------


def _spearman_brute(daily):
    """Deterministic-rank Spearman over [(day, cnt, cents)] rows."""
    ra = {d: i + 1 for i, (d, *_rest) in enumerate(
        sorted(daily, key=lambda r: (r[1], r[0]))
    )}
    rb = {d: i + 1 for i, (d, *_rest) in enumerate(
        sorted(daily, key=lambda r: (r[2], r[0]))
    )}
    n = len(daily)
    sum_d2 = sum((ra[d] - rb[d]) ** 2 for d, *_ in daily)
    rho = 1.0 - (6.0 * sum_d2) / (n * (n * n - 1))
    return n, sum_d2, round(rho, 4)


def test_spearman_perfect_monotone_is_one(spark):
    """Counts and revenue perfectly co-monotone → Σd² = 0, ρ = 1."""
    from mariadb_postgres_migration_spark.operators.audit import spearman_daily

    rows = []
    oid = 0
    for day, cnt in [(0, 1), (1, 2), (2, 3), (3, 4)]:
        for _ in range(cnt):
            rows.append((oid, dt.datetime(1970, 1, 1 + day), 100.0 * cnt))
            oid += 1
    df = spark.createDataFrame(
        rows, "o_orderkey long, o_orderdate timestamp, o_totalprice double"
    )
    [row] = spearman_daily(df).collect()
    assert (row["n_days"], row["sum_d2"], row["rho"]) == (4, 0, 1.0)


def test_spearman_reversed_is_minus_one_and_brute_force(spark):
    from mariadb_postgres_migration_spark.operators.audit import spearman_daily

    # day-count ascending, per-order price so that daily revenue descends
    daily = [(0, 1, 4000), (1, 2, 3000), (2, 3, 2000), (3, 4, 1000)]
    rows = []
    oid = 0
    for day, cnt, rev_total in daily:
        per = rev_total / cnt / 100.0
        for _ in range(cnt):
            rows.append((oid, dt.datetime(1970, 1, 1 + day), per))
            oid += 1
    df = spark.createDataFrame(
        rows, "o_orderkey long, o_orderdate timestamp, o_totalprice double"
    )
    [row] = spearman_daily(df).collect()
    assert row["rho"] == -1.0
    assert (row["n_days"], row["sum_d2"], row["rho"]) == _spearman_brute(daily)


# ---------------------------------------------------------------------------
# x127 — KS source drift
# ---------------------------------------------------------------------------


def _ks_brute(rows):
    """(source → (n_docs, n_total, d_scaled, at_value)) per the scaled
    definition, ties to smallest value."""
    from collections import Counter

    all_c = Counter(v for _, v in rows)
    values = sorted(all_c)
    n_tot = len(rows)
    out = {}
    for s in {g for g, _ in rows}:
        s_c = Counter(v for g, v in rows if g == s)
        n_s = sum(s_c.values())
        cum_s = cum_all = 0
        best = None
        for v in values:
            cum_s += s_c.get(v, 0)
            cum_all += all_c[v]
            d = abs(n_tot * cum_s - n_s * cum_all)
            key = (d, -v)
            if best is None or key > best[0]:
                best = (key, v, d)
        out[s] = (n_s, n_tot, best[2], best[1])
    return out


def test_ks_identical_distributions_zero(spark):
    from mariadb_postgres_migration_spark.operators.profile import ks_source_drift

    rows = [(s, v) for s in ("a", "b") for v in (10, 20, 30)]
    df = spark.createDataFrame(rows, "source string, n_chars long")
    got = {r["source"]: r["d_scaled"] for r in ks_source_drift(df).collect()}
    assert got == {"a": 0, "b": 0}


def test_ks_disjoint_supports_maximal(spark):
    """Source a entirely below source b: at the boundary cum_a = n_a,
    cum_all = n_a → D_scaled = N·n_a − n_a·n_a = n_a·n_b."""
    from mariadb_postgres_migration_spark.operators.profile import ks_source_drift

    rows = [("a", v) for v in (1, 2, 3)] + [("b", v) for v in (10, 11)]
    df = spark.createDataFrame(rows, "source string, n_chars long")
    got = {
        r["source"]: (r["d_scaled"], r["at_value"], r["d_ppm"])
        for r in ks_source_drift(df).collect()
    }
    # D = 1 (the unscaled sup) → d_scaled = N·n_s·1... here n_a·n_b = 6
    assert got["a"] == (6, 3, 400_000)
    assert got["b"] == (6, 3, 600_000)


def test_ks_matches_brute_force(spark):
    from mariadb_postgres_migration_spark.operators.profile import ks_source_drift

    rng = np.random.RandomState(88)
    rows = [("s" + str(int(rng.randint(0, 3))), int(rng.randint(1, 15)))
            for _ in range(200)]
    df = spark.createDataFrame(rows, "source string, n_chars long")
    got = {
        r["source"]: (r["n_docs"], r["n_total"], r["d_scaled"], r["at_value"])
        for r in ks_source_drift(df).collect()
    }
    assert got == _ks_brute(rows)


# ---------------------------------------------------------------------------
# x129 — Mann-Kendall
# ---------------------------------------------------------------------------


def _mk_brute(daily):
    """Transcribed definition over [(day, v)]: S, 18*Var with ties, z."""
    import math

    rows = sorted(daily)
    n = len(rows)
    s = 0
    for i in range(n):
        for j in range(i + 1, n):
            d = rows[j][1] - rows[i][1]
            s += (d > 0) - (d < 0)
    from collections import Counter

    ties = Counter(v for _, v in rows)
    tie18 = sum(t * (t - 1) * (2 * t + 5) for t in ties.values())
    var18 = n * (n - 1) * (2 * n + 5) - tie18
    if s == 0:
        z = 0.0
    else:
        z = round((1 if s > 0 else -1) * (abs(s) - 1) / math.sqrt(var18 / 18.0), 4)
    return n, s, var18, z


def _orders_from_daily(daily):
    rows = []
    oid = 0
    for day, v in daily:
        for _ in range(v):
            rows.append((oid, dt.datetime(1970, 1, 1) + dt.timedelta(days=day)))
            oid += 1
    return rows


def test_mann_kendall_monotone_and_brute(spark):
    from mariadb_postgres_migration_spark.operators.audit import mann_kendall_daily

    # strictly increasing series: S = n(n-1)/2, no ties
    daily = [(d, d + 1) for d in range(8)]
    df = spark.createDataFrame(
        _orders_from_daily(daily), "o_orderkey long, o_orderdate timestamp"
    )
    [r] = mann_kendall_daily(df, "o_orderdate").collect()
    assert (r["n_days"], r["s_stat"]) == (8, 28)
    assert (r["n_days"], r["s_stat"], r["var18"], r["z"]) == _mk_brute(daily)


def test_mann_kendall_ties_and_flat(spark):
    from mariadb_postgres_migration_spark.operators.audit import mann_kendall_daily

    # constant series: S = 0, var18 = 0, z pinned to 0.0 (not NaN)
    daily = [(d, 3) for d in range(6)]
    df = spark.createDataFrame(
        _orders_from_daily(daily), "o_orderkey long, o_orderdate timestamp"
    )
    [r] = mann_kendall_daily(df, "o_orderdate").collect()
    assert (r["s_stat"], r["var18"], r["z"]) == (0, 0, 0.0)

    # noisy series with ties vs brute force
    rng = np.random.RandomState(129)
    daily = [(int(d), int(rng.randint(1, 4))) for d in range(15)]
    df = spark.createDataFrame(
        _orders_from_daily(daily), "o_orderkey long, o_orderdate timestamp"
    )
    [r] = mann_kendall_daily(df, "o_orderdate").collect()
    assert (r["n_days"], r["s_stat"], r["var18"], r["z"]) == _mk_brute(daily)


# ---------------------------------------------------------------------------
# x130 — Theil-Sen
# ---------------------------------------------------------------------------


def _ts_brute(daily):
    from fractions import Fraction
    import math

    rows = sorted(daily)
    # math.trunc(Fraction) is EXACT truncation toward zero, matching
    # Spark `div` / DuckDB `//` (a float divide could round across an
    # integer boundary before truncating)
    slopes = sorted(
        math.trunc(
            Fraction(1000 * (rows[j][1] - rows[i][1]), rows[j][0] - rows[i][0])
        )
        for i in range(len(rows))
        for j in range(i + 1, len(rows))
    )
    n_p = len(slopes)
    # the operator picks CDF position ⌊n/2⌋+1 (1-based) = index n_p//2,
    # i.e. the upper median for even n and the true median for odd n
    return len(rows), n_p, slopes[n_p // 2]


def test_theil_sen_exact_line_and_outlier_immunity(spark):
    from mariadb_postgres_migration_spark.operators.audit import theil_sen_daily

    # exact line v = 5 + 3d -> every pairwise slope is exactly 3000 milli
    daily = [(d, 5 + 3 * d) for d in range(7)]
    df = spark.createDataFrame(
        _orders_from_daily(daily), "o_orderkey long, o_orderdate timestamp"
    )
    [r] = theil_sen_daily(df, "o_orderdate").collect()
    assert (r["n_days"], r["n_pairs"], r["slope_milli"]) == (7, 21, 3000)

    # one wild outlier day does not move the median slope
    daily_out = daily[:-1] + [(6, 1000)]
    df2 = spark.createDataFrame(
        _orders_from_daily(daily_out), "o_orderkey long, o_orderdate timestamp"
    )
    [r2] = theil_sen_daily(df2, "o_orderdate").collect()
    assert r2["slope_milli"] == 3000


def test_theil_sen_matches_brute(spark):
    from mariadb_postgres_migration_spark.operators.audit import theil_sen_daily

    rng = np.random.RandomState(130)
    daily = [(int(d), int(rng.randint(1, 30))) for d in range(12)]
    df = spark.createDataFrame(
        _orders_from_daily(daily), "o_orderkey long, o_orderdate timestamp"
    )
    [r] = theil_sen_daily(df, "o_orderdate").collect()
    n, n_p, med = _ts_brute(daily)
    assert (r["n_days"], r["n_pairs"], r["slope_milli"]) == (n, n_p, med)


# ---------------------------------------------------------------------------
# x131 — Gini
# ---------------------------------------------------------------------------


def test_gini_equality_and_concentration(spark):
    from mariadb_postgres_migration_spark.operators.aggregates import (
        gini_concentration,
    )

    rows = (
        [("eq", k, 100) for k in range(1, 6)]          # perfect equality
        + [("conc", 1, 0), ("conc", 2, 0), ("conc", 3, 0), ("conc", 4, 1000)]
    )
    df = spark.createDataFrame(rows, "g string, k long, cents long")
    got = {r["g"]: (r["n_members"], r["total_cents"], r["gini"])
           for r in gini_concentration(df).collect()}
    assert got["eq"] == (5, 500, 0.0)
    # one holder of everything among n=4: G = (n-1)/n = 0.75
    assert got["conc"] == (4, 1000, 0.75)


def test_gini_matches_brute(spark):
    from mariadb_postgres_migration_spark.operators.aggregates import (
        gini_concentration,
    )

    rng = np.random.RandomState(131)
    vals = [int(rng.randint(0, 500)) for _ in range(40)]
    rows = [("g", k, v) for k, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "g string, k long, cents long")
    [r] = gini_concentration(df).collect()
    xs = sorted(vals)
    n, sx = len(xs), sum(xs)
    num = 2 * sum((i + 1) * x for i, x in enumerate(xs)) - (n + 1) * sx
    assert (r["n_members"], r["total_cents"]) == (n, sx)
    assert r["gini"] == round(num / (n * sx), 4)


# ---------------------------------------------------------------------------
# x132 — vocab richness
# ---------------------------------------------------------------------------


def test_vocab_richness_hand_checked(spark):
    from mariadb_postgres_migration_spark.operators.textanalysis import (
        vocab_richness,
    )

    rows = [
        (0, "a b a c", "s1"),
        (1, "a d", "s1"),          # s1 terms: a:3 b:1 c:1 d:1 -> 6 tokens, 4 types, 3 hapax
        (2, "x x x x", "s2"),      # s2: 4 tokens, 1 type, 0 hapax
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    got = {
        r["source"]: (r["n_terms"], r["n_types"], r["n_hapax"],
                      r["ttr_ppm"], r["hapax_ppm"])
        for r in vocab_richness(df).collect()
    }
    assert got["s1"] == (6, 4, 3, 666_666, 750_000)
    assert got["s2"] == (4, 1, 0, 250_000, 0)


# ---------------------------------------------------------------------------
# x134 — cluster size histogram
# ---------------------------------------------------------------------------


def test_cluster_size_histogram_hand_checked(spark):
    from mariadb_postgres_migration_spark.operators.dedup import (
        cluster_size_histogram,
    )

    # clusters: {1,2,3} rep 1, {10,11} rep 10, {20} rep 20, {30} rep 30
    rows = [(1, 1), (2, 1), (3, 1), (10, 10), (11, 10), (20, 20), (30, 30)]
    df = spark.createDataFrame(rows, "doc_id long, rep long")
    got = {
        r["cluster_size"]: (r["n_clusters"], r["n_docs"])
        for r in cluster_size_histogram(df).collect()
    }
    assert got == {3: (1, 3), 2: (1, 2), 1: (2, 2)}
    # invariant: histogram covers every document exactly once
    assert sum(nd for _, nd in got.values()) == len(rows)


# ---------------------------------------------------------------------------
# x135 — inter-arrival burstiness
# ---------------------------------------------------------------------------


def test_burstiness_metronome_poisson_burst(spark):
    from mariadb_postgres_migration_spark.operators.audit import (
        interarrival_burstiness,
    )

    t0 = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    # metronome: constant 60 s gaps -> CV^2 = 0 -> cv2_milli = n*sum_g2*1000 // sum_g^2
    for k in range(5):
        rows.append((eid, 1, t0 + dt.timedelta(seconds=60 * k))); eid += 1
    # bursty: gaps 1,1,1,597 s
    for s in (0, 1, 2, 3, 600):
        rows.append((eid, 2, t0 + dt.timedelta(seconds=s))); eid += 1
    # all-zero gaps (sub-second burst): cv2 undefined -> NULL
    for _ in range(3):
        rows.append((eid, 3, t0)); eid += 1
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp")
    got = {
        r["user_id"]: (r["n_gaps"], r["sum_g"], r["sum_g2"], r["cv2_milli"])
        for r in interarrival_burstiness(df).collect()
    }
    # metronome: 4 gaps of 60 -> 1000*4*14400 // 240^2 = 1000 (CV^2=... 
    # n*sum_g2/sum_g^2 = 4*14400/57600 = 1.0 -> but that's E[g^2]n/ (sum)^2
    assert got[1] == (4, 240, 14400, 1000)
    burst = got[2]
    assert burst[0] == 4 and burst[1] == 600
    assert burst[3] > 1000  # bursty >> metronomic baseline
    assert got[3] == (2, 0, 0, None)


def test_burstiness_matches_brute(spark):
    from mariadb_postgres_migration_spark.operators.audit import (
        interarrival_burstiness,
    )

    rng = np.random.RandomState(135)
    t0 = dt.datetime(2024, 1, 1)
    rows, eid = [], 0
    gaps = [int(g) for g in rng.randint(0, 500, size=12)]
    t = 0
    times = []
    for g in gaps:
        t += g
        times.append(t)
    for s in [0] + times:
        rows.append((eid, 7, t0 + dt.timedelta(seconds=s))); eid += 1
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp")
    [r] = interarrival_burstiness(df).collect()
    n, sg, sg2 = len(gaps), sum(gaps), sum(g * g for g in gaps)
    assert (r["n_gaps"], r["sum_g"], r["sum_g2"]) == (n, sg, sg2)
    assert r["cv2_milli"] == (1000 * n * sg2) // (sg * sg)


# ---------------------------------------------------------------------------
# x136 — Zipf doubling profile
# ---------------------------------------------------------------------------


def test_zipf_profile_exact_powerlaw(spark):
    from mariadb_postgres_migration_spark.operators.textanalysis import (
        zipf_doubling_profile,
    )

    # corpus with exact f(r) = 512 // r for ranks 1..8 (term names order
    # the ties deterministically)
    docs = []
    did = 0
    words = {f"w{r:02d}": 512 // r for r in range(1, 9)}
    for wrd, cnt in words.items():
        for _ in range(cnt):
            docs.append((did, wrd)); did += 1
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r["rk"]: (r["f_r"], r["f_2r"], r["ratio_milli"])
        for r in zipf_doubling_profile(df).collect()
    }
    # exact halving at every probe: ratio = 500
    assert got[1] == (512, 256, 500)
    assert got[2] == (256, 128, 500)
    assert got[4] == (128, 64, 500)
    assert set(got) == {1, 2, 4}  # rank 16 absent (only 8 terms)


# ---------------------------------------------------------------------------
# x138 — split manifest
# ---------------------------------------------------------------------------


def test_split_manifest_is_total_deterministic_and_ratioed(spark):
    from mariadb_postgres_migration_spark.operators.textanalysis import (
        split_manifest,
    )

    rows = [(i, "x" * (i % 7 + 1), f"s{i % 3}") for i in range(3000)]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = split_manifest(df).collect()
    # exactly one split per document: totals reconstruct the corpus
    assert sum(r["n_docs"] for r in out) == 3000
    assert sum(r["n_chars"] for r in out) == sum(i % 7 + 1 for i in range(3000))
    by_split = {}
    for r in out:
        by_split[r["split"]] = by_split.get(r["split"], 0) + r["n_docs"]
    assert set(by_split) == {"train", "val", "test"}
    # 98/1/1 within loose tolerance at n=3000
    assert by_split["train"] > 2850
    assert 5 <= by_split["val"] <= 80 and 5 <= by_split["test"] <= 80
    # deterministic: identical on re-run
    assert sorted(map(tuple, out)) == sorted(map(tuple, split_manifest(df).collect()))


def test_split_manifest_stable_under_corpus_growth(spark):
    """The hash-split property a random split lacks: adding documents
    never changes an existing document's split."""
    from mariadb_postgres_migration_spark.operators.textanalysis import (
        split_manifest,
    )
    from mariadb_postgres_migration_spark.operators.reconcile import hex_chunk

    from pyspark.sql import functions as F

    rows = [(i, "t", "s") for i in range(500)]
    df_small = spark.createDataFrame(rows, "doc_id long, text string, source string")
    # per-doc assignment extracted via the same expression the operator uses
    h = hex_chunk(F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":split"))), 1)
    assign = {
        r["doc_id"]: r["frac"]
        for r in df_small.select("doc_id", (h % 1000).alias("frac")).collect()
    }
    rows2 = rows + [(i, "t", "s") for i in range(500, 1000)]
    df_big = spark.createDataFrame(rows2, "doc_id long, text string, source string")
    assign2 = {
        r["doc_id"]: r["frac"]
        for r in df_big.select("doc_id", (h % 1000).alias("frac")).collect()
    }
    assert all(assign2[k] == v for k, v in assign.items())


# ---------------------------------------------------------------------------
# x139 — rendezvous shards
# ---------------------------------------------------------------------------


def test_rendezvous_matches_python_hrw_and_minimal_movement(spark):
    import hashlib

    from mariadb_postgres_migration_spark.operators.textanalysis import (
        rendezvous_shards,
    )

    def hrw(doc_id, n):
        return max(
            range(n),
            key=lambda s: (hashlib.md5(f"{doc_id}#{s}".encode()).hexdigest(), s),
        )

    rows = [(i, "y" * (i % 5 + 1)) for i in range(800)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got16 = {r["shard"]: r["n_docs"] for r in rendezvous_shards(df, 16).collect()}
    exp16 = {}
    for i, _t in rows:
        exp16[hrw(i, 16)] = exp16.get(hrw(i, 16), 0) + 1
    assert got16 == exp16
    # HRW property: dropping to 15 shards moves ONLY documents whose
    # winner was shard 15 (~1/16 of the corpus), nobody else
    moved = sum(1 for i, _t in rows if hrw(i, 16) != hrw(i, 15))
    assert moved == exp16.get(15, 0)


# ---------------------------------------------------------------------------
# ADVICE r8 guards: engine-identical degradation at the documented bounds
# ---------------------------------------------------------------------------


def test_gini_all_zero_group_is_zero_both_engines(spark):
    """A group whose members all have cents=0 is perfect equality: gini
    0.0 by definition in BOTH engines (pre-guard it was 0/0 → NaN in
    Spark while DuckDB's round(NaN) differs — an engine-sensitive
    value)."""
    import duckdb

    from mariadb_postgres_migration_spark.operators.aggregates import (
        gini_concentration,
        gini_concentration_sql,
    )

    rows = [("z", 1, 0), ("z", 2, 0), ("ok", 1, 5), ("ok", 2, 15)]
    df = spark.createDataFrame(rows, "g string, k long, cents long")
    got = {r["g"]: r["gini"] for r in gini_concentration(df).collect()}
    assert got["z"] == 0.0

    cte = "SELECT * FROM (VALUES " + ", ".join(
        f"('{g}', {k}, {c})" for g, k, c in rows
    ) + ") AS v(g, k, cents)"
    oracle = {
        g: gini for g, _n, _t, gini in
        duckdb.sql(gini_concentration_sql(cte)).fetchall()
    }
    assert oracle == got


def test_burstiness_overflow_user_nulls_both_engines(spark):
    """Past the documented int64 bound, 1000·n·Σg² would wrap silently in
    Spark while DuckDB raises — the guard NULLs the user identically in
    both engines instead. Two ~2.2-year gaps put Σg² at ~9.8·10¹⁵
    (1000·2·Σg² ≈ 2·10¹⁹ > 2⁶³) while Σg stays inside the isqrt bound,
    exercising the Σg² arm of the guard specifically."""
    import duckdb

    from mariadb_postgres_migration_spark.operators.audit import (
        interarrival_burstiness,
        interarrival_burstiness_sql,
    )

    t0 = dt.datetime(2024, 1, 1)
    big = 70_000_000  # seconds; big² = 4.9e15 per gap
    rows = [
        (0, 9, t0),
        (1, 9, t0 + dt.timedelta(seconds=big)),
        (2, 9, t0 + dt.timedelta(seconds=2 * big)),
        # control user inside the bound
        (3, 1, t0),
        (4, 1, t0 + dt.timedelta(seconds=60)),
        (5, 1, t0 + dt.timedelta(seconds=180)),
    ]
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp")
    got = {
        r["user_id"]: (r["n_gaps"], r["sum_g"], r["sum_g2"], r["cv2_milli"])
        for r in interarrival_burstiness(df).collect()
    }
    assert got[9][3] is None  # guarded, not wrapped
    assert got[9][:3] == (2, 2 * big, 2 * big * big)
    assert got[1][3] is not None

    epoch = dt.datetime(1970, 1, 1)
    cte = "SELECT * FROM (VALUES " + ", ".join(
        f"({u}, {int((ts - epoch).total_seconds()) * 1_000_000}, {eid})"
        for eid, u, ts in rows
    ) + ") AS v(u, us, eid)"
    oracle = {
        u: (n, sg, sg2, cv2) for u, n, sg, sg2, cv2 in
        duckdb.sql(interarrival_burstiness_sql(cte)).fetchall()
    }
    assert oracle == got
