"""Span-level exact substring dedup (EXT-02/05, Lee et al. ExactSubstr
shape) — hand-checkable micro-fixtures; x56's oracle parity in
test_core_queries checks the end-to-end pipeline."""

from pyspark.sql import functions as F

from mariadb_postgres_migration_spark.operators.dedup import duplicate_spans


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_shared_run_is_marked_in_both_docs(spark):
    # one shared 10-token run inside distinct padding: with k=4 the run
    # yields 7 duplicated windows per doc merging to ONE span of 10 tokens
    run = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    docs = _docs(
        spark,
        [f"left padding words {run} and more trailing", f"other prefix {run} tail"],
    )
    spans = duplicate_spans(docs, k=4).collect()
    by_doc = {r["doc_id"]: r for r in spans}
    assert set(by_doc) == {0, 1}
    s0, s1 = by_doc[0], by_doc[1]
    # doc 0: run starts at token 4 (1-based), doc 1: at token 3
    assert (s0["span_start"], s0["span_end"]) == (4, 13)
    assert (s1["span_start"], s1["span_end"]) == (3, 12)
    assert s0["n_windows"] == s1["n_windows"] == 7


def test_within_doc_repetition_counts(spark):
    # the duplicate test is occurrences >= 2 anywhere, including the same
    # document — a doc that repeats its own phrase gets both copies marked
    phrase = "one two three four"
    docs = _docs(spark, [f"{phrase} filler words here {phrase}"])
    spans = sorted(
        duplicate_spans(docs, k=4).collect(), key=lambda r: r["span_start"]
    )
    assert [(s["span_start"], s["span_end"]) for s in spans] == [(1, 4), (8, 11)]


def test_disjoint_spans_do_not_merge(spark):
    # two shared runs separated by unique tokens stay separate islands
    a = "red orange yellow green"
    b = "cyan blue indigo violet"
    docs = _docs(
        spark,
        [f"{a} unique middle tokens {b}", f"{a} different bridge words {b}"],
    )
    spans = duplicate_spans(docs, k=4).filter(F.col("doc_id") == 0).collect()
    got = sorted((s["span_start"], s["span_end"]) for s in spans)
    assert got == [(1, 4), (8, 11)]


def test_short_docs_yield_nothing(spark):
    docs = _docs(spark, ["too short", "also short", "too short"])
    assert duplicate_spans(docs, k=8).count() == 0


def test_span_never_exceeds_doc_length(spark):
    # structural invariant over a mixed corpus: spans are within bounds,
    # ordered, and non-overlapping per doc
    texts = [
        "a b c d e f g h i j k l",
        "a b c d e f g h i j k l",
        "x y z a b c d e f g h i",
        "completely different words here now",
    ]
    docs = _docs(spark, texts)
    rows = duplicate_spans(docs, k=4).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append((r["span_start"], r["span_end"]))
    for doc_id, spans in by_doc.items():
        n_tok = len(texts[doc_id].split())
        spans.sort()
        prev_end = 0
        for s, e in spans:
            assert 1 <= s <= e <= n_tok
            assert s > prev_end  # islands never overlap
            prev_end = e
