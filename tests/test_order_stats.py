"""Ground-truth tests for the distributed order-statistics operators
(operators/order_stats.py), BFS (operators/graph.bfs_hops) and the r6b
text-quality scores — each checked against an independent local
computation (sorted lists, brute-force dominance, dict-based BFS/LM),
not against the DuckDB oracle (tests/test_core_queries.py already runs
that side): two independent ground truths per operator.
"""

import math
import random
import zlib

import pytest
from pyspark.sql import functions as F

from mariadb_postgres_migration_spark.operators import graph as G
from mariadb_postgres_migration_spark.operators import order_stats as OS
from mariadb_postgres_migration_spark.operators import textanalysis as T


# ---------------------------------------------------------------------------
# exact_quantiles
# ---------------------------------------------------------------------------


def _quantile_truth(values, qs):
    s = sorted(values)
    n = len(s)
    return {q: s[max(1, (q * n + 99) // 100) - 1] for q in qs}


@pytest.mark.parametrize("seed,dist", [(7, "uniform"), (11, "zipf"), (13, "spike")])
def test_exact_quantiles_matches_sorted_list(spark, seed, dist):
    rng = random.Random(seed)
    if dist == "uniform":
        vals = [rng.randrange(-(10**9), 10**9) for _ in range(5000)]
    elif dist == "zipf":
        vals = [int(1000 / (rng.random() + 1e-6)) for _ in range(5000)]
    else:  # one value holds most of the mass — exercises the collapsed-range path
        vals = [42] * 4500 + [rng.randrange(0, 10**6) for _ in range(500)]
    df = spark.createDataFrame([(v,) for v in vals], "p long")
    # refine_limit far below n forces at least one real refinement level
    out = {
        r["q_pct"]: (r["rank"], r["value"])
        for r in OS.exact_quantiles(df, "p", refine_limit=256).collect()
    }
    truth = _quantile_truth(vals, (50, 90, 99))
    n = len(vals)
    for q, want in truth.items():
        rank, got = out[q]
        assert rank == max(1, (q * n + 99) // 100)
        assert got == want, f"q{q}: {got} != {want} ({dist})"


def test_exact_quantiles_small_input_single_level(spark):
    vals = [3, 1, 2]
    df = spark.createDataFrame([(v,) for v in vals], "p long")
    out = {r["q_pct"]: r["value"] for r in OS.exact_quantiles(df, "p").collect()}
    assert out == {50: 2, 90: 3, 99: 3}


def test_exact_quantiles_rejects_empty(spark):
    df = spark.createDataFrame([], "p long")
    with pytest.raises(ValueError):
        OS.exact_quantiles(df, "p")


# ---------------------------------------------------------------------------
# skyline_2d
# ---------------------------------------------------------------------------


def _skyline_truth(rows):
    """Brute-force dominance: (grp, id, mx, mn) survivors."""
    out = []
    for g, i, mx, mn in rows:
        dominated = any(
            og == g and omx >= mx and omn <= mn and (omx > mx or omn < mn)
            for og, _, omx, omn in rows
        )
        if not dominated:
            out.append((g, i, mx, mn))
    return sorted(out)


def test_skyline_matches_bruteforce(spark):
    rng = random.Random(3)
    rows = [
        (f"g{rng.randrange(3)}", i, rng.randrange(20), rng.randrange(20))
        for i in range(400)
    ]
    df = spark.createDataFrame(rows, "grp string, rid long, mx long, mn long")
    got = sorted(
        tuple(r) for r in OS.skyline_2d(df, "grp", "mx", "mn", "rid").collect()
    )
    assert got == _skyline_truth(rows)


def test_skyline_keeps_coordinate_ties(spark):
    # two rows at the identical non-dominated point both survive (neither
    # STRICTLY betters the other)
    rows = [("g", 1, 5, 5), ("g", 2, 5, 5), ("g", 3, 4, 6)]
    df = spark.createDataFrame(rows, "grp string, rid long, mx long, mn long")
    got = sorted(r["rid"] for r in OS.skyline_2d(df, "grp", "mx", "mn", "rid").collect())
    assert got == [1, 2]


# ---------------------------------------------------------------------------
# weighted_sample
# ---------------------------------------------------------------------------


def test_weighted_sample_is_deterministic_topk_by_priority(spark):
    rows = [(f"g{i % 4}", i, 1 + (i * 37) % 500) for i in range(1000)]
    df = spark.createDataFrame(rows, "grp string, rid long, w long")
    out = OS.weighted_sample(df, "grp", "rid", "w", k=5)
    got = [tuple(r) for r in out.collect()]
    # recompute priorities locally from the collected (rid, weight, pri)
    # rows' own pri values: ranks must be 1..5 per group in (pri, rid) order
    by_grp = {}
    for g, rk, rid, w, pri in got:
        by_grp.setdefault(g, []).append((rk, pri, rid))
    assert set(by_grp) == {"g0", "g1", "g2", "g3"}
    for g, members in by_grp.items():
        members.sort()
        assert [m[0] for m in members] == [1, 2, 3, 4, 5]
        assert members == sorted(members, key=lambda m: (m[1], m[2]))
    # determinism: a second run returns the identical sample
    again = [tuple(r) for r in OS.weighted_sample(df, "grp", "rid", "w", k=5).collect()]
    assert sorted(again) == sorted(got)


def test_weighted_sample_favors_heavy_rows(spark):
    # one row with ~all the weight should essentially always be sampled
    rows = [("g", 0, 10**9)] + [("g", i, 1) for i in range(1, 200)]
    df = spark.createDataFrame(rows, "grp string, rid long, w long")
    got = {r["rid"] for r in OS.weighted_sample(df, "grp", "rid", "w", k=3).collect()}
    assert 0 in got


# ---------------------------------------------------------------------------
# bfs_hops
# ---------------------------------------------------------------------------


def _bfs_truth(edges, n_seeds, max_hops):
    adj = {}
    nodes = set()
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
        nodes.update((a, b))
    seeds = sorted(nodes)[:n_seeds]
    hop = {s: 0 for s in seeds}
    frontier = set(seeds)
    for h in range(1, max_hops + 1):
        frontier = {
            n for f in frontier for n in adj.get(f, ()) if n not in hop
        }
        for n in frontier:
            hop[n] = h
        if not frontier:
            break
    return hop


@pytest.mark.parametrize("seed", [5, 9])
def test_bfs_matches_local_bfs(spark, seed):
    rng = random.Random(seed)
    edges = list({(rng.randrange(60), rng.randrange(60)) for _ in range(150)})
    edges = [(a, b) for a, b in edges if a != b]
    df = spark.createDataFrame(edges, "a long, b long")
    got = {r["node"]: r["hop"] for r in G.bfs_hops(df, n_seeds=3, max_hops=3).collect()}
    assert got == _bfs_truth(edges, 3, 3)


def test_bfs_short_circuits_on_disconnected_seed(spark):
    # seed component exhausts at hop 1; the far component is never reached
    edges = [(1, 2), (10, 11), (11, 12), (12, 13), (13, 14)]
    df = spark.createDataFrame(edges, "a long, b long")
    got = {r["node"]: r["hop"] for r in G.bfs_hops(df, n_seeds=1, max_hops=3).collect()}
    assert got == {1: 0, 2: 1}


# ---------------------------------------------------------------------------
# bigram LM / char entropy / zlib ratio
# ---------------------------------------------------------------------------

_CORPUS = [
    (1, "the cat sat on the mat"),
    (2, "the cat sat"),
    (3, "mat the on sat cat the"),  # same words, scrambled order
    (4, "one"),  # single token: zero bigrams
    (5, None),  # NULL text
]


def _bigram_truth():
    import re

    # NULL text tokenizes to NO tokens (the normalize/split chain is
    # NULL-propagating in both engines); empty strings would give ['']
    docs = {
        i: (re.sub(r"\s+", " ", t).strip().lower().split(" ") if t is not None else [])
        for i, t in _CORPUS
    }
    bgs = {i: list(zip(w, w[1:])) for i, w in docs.items()}
    c12, c1 = {}, {}
    for pairs in bgs.values():
        for p in pairs:
            c12[p] = c12.get(p, 0) + 1
            c1[p[0]] = c1.get(p[0], 0) + 1
    vocab = len({w for ws in docs.values() for w in ws})
    out = {}
    for i, pairs in bgs.items():
        if not pairs:
            out[i] = (0, 0.0)
            continue
        lps = [math.log((c12[p] + 1) / (c1[p[0]] + vocab)) for p in pairs]
        out[i] = (len(pairs), round(sum(lps) / len(lps), 4))
    return out


def test_bigram_logprob_matches_local_model(spark):
    df = spark.createDataFrame(_CORPUS, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_bigram"], r["avg_logp"])
        for r in T.bigram_logprob(df).collect()
    }
    assert got == _bigram_truth()
    # scrambled word order scores strictly lower than the canonical order
    assert got[3][1] < got[1][1]


def test_char_entropy_matches_local(spark):
    df = spark.createDataFrame(_CORPUS, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_chars"], r["n_distinct_chars"], r["entropy"])
        for r in T.char_entropy(df).collect()
    }
    import re

    for i, t in _CORPUS:
        norm = re.sub(r"\s+", " ", (t or "")).strip().lower()
        if not norm:
            assert got[i] == (0, 0, 0.0)
            continue
        counts = {}
        for ch in norm:
            counts[ch] = counts.get(ch, 0) + 1
        n = len(norm)
        ent = round(math.log(n) - sum(c * math.log(c) for c in counts.values()) / n, 4)
        assert got[i] == (n, len(counts), ent)
    # all-same-character text has zero entropy
    one = spark.createDataFrame([(9, "aaaaaa")], "doc_id long, text string")
    assert T.char_entropy(one).collect()[0]["entropy"] == 0.0


def test_zlib_ratio_matches_local_zlib(spark):
    df = spark.createDataFrame(_CORPUS, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["raw_bytes"], r["zlib_bytes"], r["ratio_milli"])
        for r in T.zlib_ratio(df).collect()
    }
    for i, t in _CORPUS:
        raw = (t or "").encode("utf-8")
        zb = len(zlib.compress(raw, 6))
        want = (len(raw), zb, (1000 * zb) // len(raw) if raw else 0)
        assert got[i] == want
    # repeated text compresses far better than the mixed corpus rows
    rep = spark.createDataFrame(
        [(1, "spam " * 400), (2, "".join(chr(33 + (i * 7) % 90) for i in range(2000)))],
        "doc_id long, text string",
    )
    ratios = {r["doc_id"]: r["ratio_milli"] for r in T.zlib_ratio(rep).collect()}
    assert ratios[1] < 50 < ratios[2]


# ---------------------------------------------------------------------------
# equidepth_histogram
# ---------------------------------------------------------------------------


def _equidepth_truth(values, n_bins):
    s = sorted(values)
    n = len(s)
    qs = [(100 * i) // n_bins for i in range(1, n_bins)]
    bnd = sorted(s[max(1, (q * n + 99) // 100) - 1] for q in qs)
    buckets = {}
    for v in values:
        b = sum(1 for x in bnd if v > x)
        st = buckets.setdefault(b, [0, 0, None, None])
        st[0] += 1
        st[1] += v
        st[2] = v if st[2] is None else min(st[2], v)
        st[3] = v if st[3] is None else max(st[3], v)
    return {b: tuple(st) for b, st in buckets.items()}


@pytest.mark.parametrize("seed", [3, 17])
def test_equidepth_matches_local_assignment(spark, seed):
    rng = random.Random(seed)
    vals = [rng.randrange(0, 10**7) for _ in range(4000)]
    df = spark.createDataFrame([(v,) for v in vals], "p long")
    got = {
        r["bucket"]: (r["n_rows"], r["sum_v"], r["min_v"], r["max_v"])
        for r in OS.equidepth_histogram(df, "p", n_bins=10, refine_limit=256).collect()
    }
    assert got == _equidepth_truth(vals, 10)
    # equal-frequency property on distinct-heavy data: every bucket holds
    # n/bins rows give or take the boundary ties
    counts = [c for c, *_ in got.values()]
    assert max(counts) - min(counts) <= 10


def test_equidepth_duplicate_heavy_ties_fall_in_lower_bucket(spark):
    # one value holds 80% of the mass: several boundaries collapse onto
    # it, the tied rows all land in the LOWEST bucket whose range admits
    # them (strict > assignment), and the empty buckets simply don't
    # appear — matches the local reference exactly
    vals = [5] * 800 + list(range(100, 300))
    df = spark.createDataFrame([(v,) for v in vals], "p long")
    got = {
        r["bucket"]: (r["n_rows"], r["sum_v"], r["min_v"], r["max_v"])
        for r in OS.equidepth_histogram(df, "p", n_bins=10, refine_limit=64).collect()
    }
    assert got == _equidepth_truth(vals, 10)
    assert got[0][0] == 800  # every tied row in bucket 0


# ---------------------------------------------------------------------------
# ols_trend (operators/aggregates.py)
# ---------------------------------------------------------------------------


def test_ols_trend_matches_numpy_polyfit(spark):
    from mariadb_postgres_migration_spark.operators.aggregates import ols_trend

    rng = random.Random(5)
    rows = []
    for g in range(4):
        base, slope = rng.randrange(1000, 5000), rng.randrange(-50, 50)
        for x in range(0, 40):
            rows.append((g, 20000 + x, base + slope * x + rng.randrange(-9, 10)))
    df = spark.createDataFrame(rows, "g long, x long, y long")
    got = {
        r["g"]: (r["n"], r["slope"], r["intercept"])
        for r in ols_trend(df, "g", F.col("x"), F.col("y")).collect()
    }
    import numpy as np

    for g in range(4):
        xs = [x for gg, x, _ in rows if gg == g]
        ys = [y for gg, _, y in rows if gg == g]
        sl, ic = np.polyfit(xs, ys, 1)
        n, gsl, gic = got[g]
        assert n == 40
        assert abs(gsl - sl) < 1e-4, (g, gsl, sl)
        assert abs(gic - ic) < 1e-2, (g, gic, ic)


def test_ols_trend_exact_line_and_degenerate_groups(spark):
    from mariadb_postgres_migration_spark.operators.aggregates import ols_trend

    rows = (
        # group 1: exact line y = 3x + 7 -> recovered exactly
        [(1, x, 3 * x + 7) for x in range(10)]
        # group 2: a single row (n < min_n) -> dropped
        + [(2, 5, 100)]
        # group 3: all x equal (den = 0) -> dropped
        + [(3, 4, 10), (3, 4, 99)]
    )
    df = spark.createDataFrame(rows, "g long, x long, y long")
    got = {
        r["g"]: (r["slope"], r["intercept"])
        for r in ols_trend(df, "g", F.col("x"), F.col("y")).collect()
    }
    assert got == {1: (3.0, 7.0)}


# ---------------------------------------------------------------------------
# percentile_rank
# ---------------------------------------------------------------------------


def test_percentile_rank_matches_local_percent_rank(spark):
    rng = random.Random(23)
    vals = [rng.randrange(0, 50) for _ in range(400)]  # heavy ties
    rows = list(enumerate(vals))
    df = spark.createDataFrame(rows, "rid long, v long")
    got = {
        r["rid"]: (r["v"], r["pr_milli"])
        for r in OS.percentile_rank(df, "rid", "v").collect()
    }
    s = sorted(vals)
    n = len(vals)
    for rid, v in rows:
        below = sum(1 for x in s if x < v)  # rank()-1 == count strictly below
        assert got[rid] == (v, (1000 * below) // (n - 1)), rid
    # extremes: global min -> 0, global max -> <= 1000
    assert min(p for _, p in got.values()) == 0
    assert max(p for _, p in got.values()) <= 1000


def test_percentile_rank_single_row_and_constant_column(spark):
    df1 = spark.createDataFrame([(1, 7)], "rid long, v long")
    [r] = OS.percentile_rank(df1, "rid", "v").collect()
    assert (r["rid"], r["pr_milli"]) == (1, 0)  # denom clamps to 1
    dfc = spark.createDataFrame([(i, 5) for i in range(10)], "rid long, v long")
    assert {
        r["pr_milli"] for r in OS.percentile_rank(dfc, "rid", "v").collect()
    } == {0}


def test_mad_matches_local_and_shrugs_off_outliers(spark):
    rng = random.Random(31)
    vals = [rng.randrange(900, 1100) for _ in range(999)]
    dirty = vals + [10**12]  # one corrupt row

    def local_mad(v):
        s = sorted(v)
        n = len(s)
        m = s[max(1, (50 * n + 99) // 100) - 1]
        d = sorted(abs(x - m) for x in v)
        return m, d[max(1, (50 * n + 99) // 100) - 1]

    df = spark.createDataFrame([(v,) for v in dirty], "p long")
    [r] = OS.mad_robust(df, "p", refine_limit=128).collect()
    m, mad = local_mad(dirty)
    assert (r["n"], r["median"], r["mad"]) == (1000, m, mad)
    # robustness: the corrupt row barely moves the estimates
    m0, mad0 = local_mad(vals)
    assert abs(m - m0) < 10 and abs(mad - mad0) < 10
