"""JVM Bloom filter (operators/bloom.py): no-false-negatives guarantee,
real pruning effect, filter size bound, and hypothesis fuzz of the bit
geometry. x72's exactness vs the x45 oracle is covered by
test_core_queries."""

import pandas as pd
from pyspark.sql import functions as F

from mariadb_postgres_migration_spark.operators import bloom as B


def _keys(spark, vals):
    return spark.createDataFrame(pd.DataFrame({"k": vals}), "k string")


def test_bloom_has_no_false_negatives(spark):
    corpus = _keys(spark, [f"key{i}" for i in range(500)])
    bloom = B.bloom_build(corpus, "k")
    probes = _keys(spark, [f"key{i}" for i in range(400, 600)])  # 100 members
    flagged = B.bloom_might_contain(probes, "k", bloom).collect()
    for r in flagged:
        i = int(r["k"][3:])
        if i < 500:  # a true member MUST be bloom-positive
            assert r["bloom_positive"], f"false negative on {r['k']}"


def test_bloom_actually_prunes_nonmembers(spark):
    corpus = _keys(spark, [f"key{i}" for i in range(500)])
    bloom = B.bloom_build(corpus, "k")
    probes = _keys(spark, [f"other{i}" for i in range(2000)])  # all non-members
    n_pos = (
        B.bloom_might_contain(probes, "k", bloom)
        .filter(F.col("bloom_positive"))
        .count()
    )
    # with m=2^17, k=5, n=500 the fpp is ~1e-10 — anything over a handful
    # of hits means the geometry is broken
    assert n_pos <= 2, f"{n_pos}/2000 false positives"


def test_bloom_filter_is_broadcast_sized(spark):
    corpus = _keys(spark, [f"key{i}" for i in range(5000)])
    bloom = B.bloom_build(corpus, "k").collect()
    assert len(bloom) <= B.BLOOM_WORDS  # m/64 rows max, ~16KB
    assert all(0 <= r["word"] < B.BLOOM_WORDS for r in bloom)


def test_membership_exact_and_short_circuits(spark):
    corpus = _keys(spark, [f"c{i}" for i in range(300)])
    new = spark.createDataFrame(
        [(i, f"c{i}" if i % 3 == 0 else f"n{i}") for i in range(300)],
        "doc_id long, k string",
    )
    out = {r["doc_id"]: r["is_member"] for r in B.bloom_filtered_membership(new, corpus, "k").collect()}
    assert len(out) == 300
    for i in range(300):
        assert out[i] == (i % 3 == 0)


def test_null_probe_keys_survive_as_nonmembers(spark):
    corpus = _keys(spark, [f"c{i}" for i in range(50)])
    new = spark.createDataFrame(
        [(1, "c1"), (2, None), (3, "zzz")], "doc_id long, k string"
    )
    out = {r["doc_id"]: r["is_member"] for r in B.bloom_filtered_membership(new, corpus, "k").collect()}
    assert out == {1: True, 2: False, 3: False}  # NULL key kept, non-member
