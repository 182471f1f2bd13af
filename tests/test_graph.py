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
