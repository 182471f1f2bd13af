"""PageRank invariants (operators/graph.py). Oracle parity for x68 is
covered by test_core_queries; here: mass conservation under truncation,
bipartite structure effects, hand-checked tiny graph, and partitioning
independence of the fixed-point arithmetic."""

from pyspark.sql import functions as F

from mariadb_postgres_migration_spark.audit_queries import x68_pagerank
from mariadb_postgres_migration_spark.operators import graph as G


def _tiny(spark, rows):
    return spark.createDataFrame(rows, "src long, dst long")


def test_pagerank_hand_checked_two_node_cycle(spark):
    # A -> B -> A: symmetric, every score stays SCALE // 2 (up to the
    # truncation of base + damped share): s = base + (85 * s) div 100
    scores = {r["node"]: r["score_q"] for r in G.pagerank(_tiny(spark, [(1, 2), (2, 1)]), iters=3).collect()}
    assert set(scores) == {1, 2}
    assert scores[1] == scores[2]
    s = G.PR_SCALE // 2
    for _ in range(3):
        s = (15 * G.PR_SCALE) // 200 + (85 * s) // 100
    assert scores[1] == s


def test_pagerank_sink_collects_mass(spark):
    # star: 1..4 all point at 5; the hub must outrank the leaves
    scores = {r["node"]: r["score_q"] for r in G.pagerank(_tiny(spark, [(i, 5) for i in range(1, 5)]), iters=3).collect()}
    assert scores[5] > scores[1]
    assert len({scores[i] for i in range(1, 5)}) == 1  # leaves identical


def test_pagerank_mass_is_conserved_up_to_truncation(spark, sf_dir):
    df = x68_pagerank(spark, sf_dir)
    total = df.agg(F.sum("score_q")).collect()[0][0]
    n = df.count()
    # each integer division truncates < 1 unit per node/edge per iter;
    # mass can only leak DOWN, and only by a sliver
    assert total <= G.PR_SCALE
    assert total >= G.PR_SCALE - 200 * (n + 1), f"lost too much mass: {total}"


def test_pagerank_is_partitioning_independent(spark, sf_dir):
    from mariadb_postgres_migration_spark.registry import _t

    e = (
        _t(spark, sf_dir, "events")
        .select(
            F.col("user_id").alias("src"),
            (F.lit(100_000) + F.get_json_object("props", "$.k").try_cast("long")).alias("dst"),
        )
        .filter(F.col("src").isNotNull() & F.col("dst").isNotNull())
    )
    a = sorted(map(tuple, G.pagerank(e, iters=2).collect()))
    b = sorted(map(tuple, G.pagerank(e.repartition(13), iters=2).collect()))
    assert a == b


# --- x71 funnel ---------------------------------------------------------


def _funnel_rows(spark, rows):
    from mariadb_postgres_migration_spark.audit_queries import funnel_stages

    d = spark.createDataFrame(rows, "user_id long, us long, event_type string")
    return {r["user_id"]: r for r in funnel_stages(d).collect()}


def test_funnel_partial_stages_and_strict_ordering(spark):
    rows = [
        # A: clean 3-stage path
        (1, 10, "signup"), (1, 20, "click"), (1, 30, "purchase"),
        # B: click BEFORE signup must not count; purchase needs a click after
        (2, 10, "click"), (2, 20, "signup"), (2, 30, "purchase"),
        # C: signup only
        (3, 10, "signup"),
        # D: never signed up
        (4, 10, "click"), (4, 20, "purchase"),
        # E: purchase before the qualifying click -> stage 2
        (5, 10, "signup"), (5, 20, "purchase"), (5, 30, "click"),
    ]
    got = _funnel_rows(spark, rows)
    assert got[1]["stage"] == 3 and (got[1]["t1_us"], got[1]["t2_us"], got[1]["t3_us"]) == (10, 20, 30)
    assert got[2]["stage"] == 1 and got[2]["t2_us"] is None  # strict order
    assert got[3]["stage"] == 1
    assert got[4]["stage"] == 0
    assert got[5]["stage"] == 2 and got[5]["t3_us"] is None


def test_funnel_plans_one_exchange_for_all_windows(spark, sf_dir):
    from mariadb_postgres_migration_spark.audit_queries import x71_funnel_stages

    spark.catalog.clearCache()
    df = x71_funnel_stages(spark, sf_dir)
    df.collect()
    # the AQE rendering repeats the tree under "Initial Plan" — count only
    # the final plan's exchanges
    plan = df._jdf.queryExecution().executedPlan().toString().split("Initial Plan")[0]
    n_exchanges = plan.count("Exchange hashpartitioning")
    n_reused = plan.count("ReusedExchange")
    # three stacked windows + the per-user collapse share ONE user_id shuffle
    assert n_exchanges - n_reused <= 1, plan[:1500]
    assert plan.count("Window [min(") == 3


def test_pagerank_empty_graph_returns_empty(spark):
    e = spark.createDataFrame([], "src long, dst long")
    assert G.pagerank(e, iters=2).collect() == []


def test_triangle_counts_k4_pendant_and_canonicalization(spark):
    # K4 on {1,2,3,4}: every node closes 3 triangles. Node 5 is a pendant
    # (no triangle -> absent from the output). Reversed (5,1), self-loop
    # (2,2) and duplicate (3,2) edges exercise canonicalization.
    edges = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4),
             (1, 5), (5, 1), (2, 2), (3, 2)]
    e = spark.createDataFrame(edges, "a long, b long")
    got = {r["node"]: r["n_tri"] for r in G.triangle_counts(e).collect()}
    assert got == {1: 3, 2: 3, 3: 3, 4: 3}


def test_triangle_counts_empty(spark):
    e = spark.createDataFrame([], "a long, b long")
    assert G.triangle_counts(e).collect() == []


def test_kcore_k4_with_tail_peels_to_the_clique(spark):
    # K4 on {1,2,3,4} plus the tail 4-5-6: node 6 (deg 1) peels in round
    # 1, node 5 (then deg 1) in round 2, and the 3-core is exactly the
    # clique with every within-core degree 3.
    edges = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 5), (5, 6)]
    e = spark.createDataFrame(edges, "a long, b long")
    got = {r["node"]: r["deg"] for r in G.kcore(e, k=3, rounds=8).collect()}
    assert got == {1: 3, 2: 3, 3: 3, 4: 3}


def test_kcore_short_circuit_equals_longer_budget(spark):
    # converged peel is a fixpoint: a 2-round budget and an 8-round
    # budget must agree on a graph whose peel converges in round 2
    edges = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 5), (5, 6)]
    e = spark.createDataFrame(edges, "a long, b long")
    fast = sorted(tuple(r) for r in G.kcore(e, k=3, rounds=2).collect())
    slow = sorted(tuple(r) for r in G.kcore(e, k=3, rounds=8).collect())
    assert fast == slow


def test_kcore_bounded_peel_is_the_round_prefix(spark):
    # 10-node path, k=2: each round peels one layer off both ends —
    # after exactly 2 rounds nodes 3..8 survive with end-degrees 1.
    # (The true 2-core of a path is empty; the bounded form returns the
    # round-2 peel state, which is the documented contract.)
    e = spark.createDataFrame([(i, i + 1) for i in range(1, 10)], "a long, b long")
    got = {r["node"]: r["deg"] for r in G.kcore(e, k=2, rounds=2).collect()}
    assert got == {3: 1, 4: 2, 5: 2, 6: 2, 7: 2, 8: 1}
    # ...and the peel eventually empties the path given budget
    assert G.kcore(e, k=2, rounds=8).collect() == []


def test_kcore_threshold_above_max_degree_is_empty(spark):
    e = spark.createDataFrame([(1, 2), (2, 3), (1, 3)], "a long, b long")
    assert G.kcore(e, k=3, rounds=4).collect() == []
    got = {r["node"]: r["deg"] for r in G.kcore(e, k=2, rounds=4).collect()}
    assert got == {1: 2, 2: 2, 3: 2}


def test_random_walks_match_local_simulation(spark):
    import hashlib

    edges = [(1, 2), (2, 3), (3, 4), (4, 1), (1, 3), (2, 5)]
    e = spark.createDataFrame(edges, "a long, b long")
    got = sorted(
        (r["seed"], r["step"], r["node"])
        for r in G.random_walks(e, n_seeds=3, walk_len=4).collect()
    )

    # local reimplementation: same adjacency ranking, same md5 pick
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    adj = {k: sorted(v) for k, v in adj.items()}
    exp = []
    for seed in sorted(adj)[:3]:
        cur = seed
        exp.append((seed, 0, cur))
        for t in range(1, 5):
            h = int(
                hashlib.md5(f"{seed}|{t}|{cur}".encode()).hexdigest()[:8], 16
            )
            cur = adj[cur][h % len(adj[cur])]
            exp.append((seed, t, cur))
    assert got == sorted(exp)


def test_random_walks_steps_are_edges_and_deterministic(spark, sf_dir):
    from mariadb_postgres_migration_spark.audit_queries import _x85_edges
    from mariadb_postgres_migration_spark.operators.dedup import (
        release_cached_intermediates,
    )

    e = _x85_edges(spark, sf_dir)
    w1 = sorted(map(tuple, G.random_walks(e, n_seeds=10, walk_len=2).collect()))
    release_cached_intermediates()
    w2 = sorted(map(tuple, G.random_walks(_x85_edges(spark, sf_dir), n_seeds=10, walk_len=2).collect()))
    assert w1 == w2  # identical across runs/partitionings
    # every (step t-1 -> t) hop is a real undirected edge
    und = {(a, b) for a, b in ((r["a"], r["b"]) for r in e.collect())}
    und |= {(b, a) for a, b in und}
    walks = {}
    for seed, step, node in w1:
        walks.setdefault(seed, {})[step] = node
    for seed, steps in walks.items():
        for t in range(1, max(steps) + 1):
            assert (steps[t - 1], steps[t]) in und
    release_cached_intermediates()


def test_kcore_and_bfs_collapse_symmetric_edge_lists(spark):
    # same contract as random_walks (review r7 advice): BOTH orientations
    # of an undirected edge must collapse to one, or kcore doubles every
    # degree (halving the effective k) and bfs joins do double work
    edges = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 5), (5, 6)]
    canon = spark.createDataFrame(edges, "a long, b long")
    sym = spark.createDataFrame(
        edges + [(b, a) for a, b in edges], "a long, b long"
    )
    kc_canon = sorted(tuple(r) for r in G.kcore(canon, k=3, rounds=8).collect())
    kc_sym = sorted(tuple(r) for r in G.kcore(sym, k=3, rounds=8).collect())
    assert kc_canon == kc_sym == [(1, 3), (2, 3), (3, 3), (4, 3)]
    bfs_canon = sorted(tuple(r) for r in G.bfs_hops(canon, n_seeds=1).collect())
    bfs_sym = sorted(tuple(r) for r in G.bfs_hops(sym, n_seeds=1).collect())
    assert bfs_canon == bfs_sym


def test_random_walks_collapse_symmetric_edge_lists(spark):
    # an input carrying BOTH orientations of an edge must walk exactly
    # like the canonical single-orientation list — duplicate adjacency
    # rows would skew deg and every md5 pick (review r6b)
    canon = spark.createDataFrame([(1, 2), (1, 3), (2, 3)], "a long, b long")
    sym = spark.createDataFrame(
        [(1, 2), (2, 1), (1, 3), (3, 1), (2, 3), (3, 2)], "a long, b long"
    )
    w1 = sorted(map(tuple, G.random_walks(canon, n_seeds=3, walk_len=3).collect()))
    w2 = sorted(map(tuple, G.random_walks(sym, n_seeds=3, walk_len=3).collect()))
    assert w1 == w2


def test_cheapest_paths_hand_checked_weighted_graph(spark):
    # seeds (3 smallest): 1, 2, 3. Edge weights force a cheap detour:
    # 1-4 direct costs 10, but 1-2(1) + 2-4(2) costs 3 within 2 edges.
    edges = [(1, 2, 1), (2, 4, 2), (1, 4, 10), (4, 5, 1), (3, 6, 7)]
    e = spark.createDataFrame(edges, "a long, b long, w long")
    got = {
        r["node"]: r["cost"]
        for r in G.cheapest_paths(e, n_seeds=3, max_edges=3).collect()
    }
    assert got == {
        1: 0, 2: 0, 3: 0,          # seeds
        4: 2,                       # via 2 (2-4), beats 1-4 (10) and 1-2-4 (3)
        5: 3,                       # 2-4-5 = 2+1
        6: 7,                       # 3-6
    }


def test_cheapest_paths_edge_budget_binds(spark):
    # path 1-2-3-4-5 (all weight 1), seed = node 1 only: with a 2-edge
    # budget node 4 is unreachable (inf -> absent), with 3 it costs 3
    e = spark.createDataFrame(
        [(1, 2, 1), (2, 3, 1), (3, 4, 1), (4, 5, 1)], "a long, b long, w long"
    )
    got2 = {r["node"]: r["cost"] for r in G.cheapest_paths(e, n_seeds=1, max_edges=2).collect()}
    got3 = {r["node"]: r["cost"] for r in G.cheapest_paths(e, n_seeds=1, max_edges=3).collect()}
    assert got2 == {1: 0, 2: 1, 3: 2}
    assert got3 == {1: 0, 2: 1, 3: 2, 4: 3}


def test_cheapest_paths_keeps_min_over_parallel_edges(spark):
    # duplicate/parallel edges collapse to their min weight; reversed
    # orientation is the same edge
    e = spark.createDataFrame(
        [(1, 2, 9), (2, 1, 4), (1, 2, 6)], "a long, b long, w long"
    )
    got = {r["node"]: r["cost"] for r in G.cheapest_paths(e, n_seeds=1, max_edges=1).collect()}
    assert got == {1: 0, 2: 4}
