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
