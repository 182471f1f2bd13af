"""Connected-components / keep-one dedup (EXT-02 cluster tier).

Direct graph-shape tests — the x27 oracle parity in test_core_queries
checks the end-to-end pipeline; these pin the component algorithm itself
on graphs small enough to reason about by hand.
"""

from mariadb_postgres_migration_spark.operators.dedup import (
    connected_components,
    dedup_keep_one,
)


def _pairs(spark, edges):
    return spark.createDataFrame(edges, "doc_a long, doc_b long")


def _docs(spark, ids):
    return spark.createDataFrame([(i,) for i in ids], "doc_id long")


def test_chain_collapses_to_min(spark):
    # 5-4-3-2-1 chain: diameter 4 forces multiple propagation rounds
    comp = connected_components(_pairs(spark, [(5, 4), (4, 3), (3, 2), (2, 1)]))
    got = {r.doc_id: r.comp for r in comp.collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1}


def test_disjoint_clique_and_pair(spark):
    comp = connected_components(
        _pairs(spark, [(10, 11), (11, 12), (10, 12), (20, 21)])
    )
    got = {r.doc_id: r.comp for r in comp.collect()}
    assert got == {10: 10, 11: 10, 12: 10, 20: 20, 21: 20}


def test_keep_one_includes_singletons(spark):
    docs = _docs(spark, [1, 2, 3, 4, 99])
    out = dedup_keep_one(docs, _pairs(spark, [(1, 2), (3, 2)])).collect()
    by_id = {r.doc_id: (r.rep, r.keep) for r in out}
    assert by_id == {
        1: (1, True),
        2: (1, False),
        3: (1, False),
        4: (4, True),
        99: (99, True),
    }


def test_empty_pairs_all_kept(spark):
    docs = _docs(spark, [7, 8])
    out = dedup_keep_one(docs, _pairs(spark, [])).collect()
    assert all(r.keep and r.rep == r.doc_id for r in out)


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


def _union_find(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # min-id representative per node
    return {n: find(n) for n in parent}


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    edges=st.lists(
        st.tuples(st.integers(0, 30), st.integers(0, 30)).filter(
            lambda e: e[0] != e[1]
        ),
        min_size=1,
        max_size=40,
    )
)
def test_components_match_union_find(spark, edges):
    got = {
        r.doc_id: r.comp
        for r in connected_components(_pairs(spark, edges)).collect()
    }
    assert got == _union_find(edges)


def test_non_convergence_raises_not_silently_splits(spark):
    """ADVICE r1: a component with diameter > max_iter must raise — a
    silent exit would yield split components and wrong keep-one decisions."""
    import pytest

    chain = _pairs(spark, [(i + 1, i) for i in range(1, 12)])  # diameter 11
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(chain, max_iter=3)


def test_star_cc_matches_min_label_on_random_graphs(spark):
    import random

    from mariadb_postgres_migration_spark.operators.dedup import (
        connected_components,
        connected_components_star,
    )

    rng = random.Random(7)
    rows = []
    # several clusters: cliques, chains, and random cross links
    for base in (0, 100, 200, 300):
        ids = [base + i for i in range(rng.randint(2, 12))]
        for i in range(len(ids) - 1):
            rows.append((ids[i], ids[i + 1]))
        for _ in range(3):
            a, b = rng.sample(ids, 2)
            rows.append((min(a, b), max(a, b)))
    pairs = spark.createDataFrame(rows, "doc_a long, doc_b long")
    want = sorted(map(tuple, connected_components(pairs).collect()))
    got = sorted(map(tuple, connected_components_star(pairs).collect()))
    assert got == want


def test_star_cc_converges_on_long_chain(spark):
    from mariadb_postgres_migration_spark.operators.dedup import (
        connected_components_star,
    )

    n = 120  # min-label would need 120 rounds (far past its max_iter guard)
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n)], "doc_a long, doc_b long"
    )
    labels = connected_components_star(pairs, max_iter=20).collect()
    assert len(labels) == n + 1
    assert all(r["comp"] == 0 for r in labels)
