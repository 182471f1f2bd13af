"""BPE merge training (x80): fold semantics, dry-run behavior, and
engine↔oracle agreement on the degenerate corpus the review flagged
(fewer possible merges than requested iterations)."""

import duckdb
from pyspark.sql import functions as F

from mariadb_postgres_migration_spark.audit_queries import _x80_sql
from mariadb_postgres_migration_spark.operators.textanalysis import (
    _bpe_apply_merge,
    bpe_train_merges,
)


def test_fold_merge_is_greedy_nonoverlapping(spark):
    df = spark.createDataFrame(
        [(["a", "a", "a"],), (["a", "b", "a", "b"],), (["x", "a", "b", "c"],)],
        "s array<string>",
    )
    assert [r[0] for r in df.select(_bpe_apply_merge(F.col("s"), "a", "b")).collect()] == [
        ["a", "a", "a"], ["ab", "ab"], ["x", "ab", "c"],
    ]
    assert [r[0] for r in df.select(_bpe_apply_merge(F.col("s"), "a", "a")).collect()] == [
        ["aa", "a"], ["a", "b", "a", "b"], ["x", "a", "b", "c"],
    ]


def _run_both(spark, texts, iters=3):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = sorted(
        tuple(r) for r in bpe_train_merges(docs, iters=iters).collect()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM (VALUES "
        + ", ".join(f"({i}, '{t}')" for i, t in enumerate(texts))
        + ") AS t(doc_id, text)"
    )
    want = sorted(tuple(r) for r in con.execute(_x80_sql(iters)).fetchall())
    con.close()
    return got, want


def test_engine_matches_oracle_on_normal_corpus(spark):
    texts = ["the cat sat on the mat", "the bat and the cat", "that hat sat flat"]
    got, want = _run_both(spark, texts)
    assert got == want
    assert sum(1 for r in got if r[0] >= 1) == 3  # all three merges learned


def test_engine_matches_oracle_when_merges_run_dry(spark):
    """All words collapse to single symbols after one merge: the engine
    breaks out of the loop, the oracle's LEFT JOIN keeps the vocabulary —
    both must emit ONE merge row and the same rank-0 symbol count
    (review r6: a cross join here zeroed the oracle's vocab)."""
    got, want = _run_both(spark, ["aa aa aa", "aa aa"])
    assert got == want
    merge_rows = [r for r in got if r[0] >= 1]
    # 5 word occurrences x one (a,a) pair per "aa"
    assert len(merge_rows) == 1 and merge_rows[0][1:] == ("a", "a", 5)
    (sym_row,) = [r for r in got if r[0] == 0]
    assert sym_row[3] == 1  # the vocabulary is exactly {'aa'}


def _fold_py(syms, a, b):
    """Pure-Python reference of the greedy merge fold."""
    acc = []
    for x in syms:
        if acc and acc[-1] == a and x == b:
            acc[-1] = a + b
        else:
            acc.append(x)
    return acc


def test_fold_fuzz_matches_python_reference(spark):
    """Property: the JVM aggregate-HOF fold equals the reference fold on
    random symbol streams (run/overlap interactions beyond the
    hand-written cases)."""
    import random

    rng = random.Random(20260814)
    rows, expected = [], []
    for _ in range(120):
        syms = [rng.choice("ab c") for _ in range(rng.randrange(0, 12))]
        rows.append((syms,))
        expected.append(_fold_py(syms, "a", "b"))
    df = spark.createDataFrame(rows, "s array<string>")
    got = [r[0] for r in df.select(_bpe_apply_merge(F.col("s"), "a", "b")).collect()]
    assert got == expected
