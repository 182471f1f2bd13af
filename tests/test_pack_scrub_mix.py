"""EXT-05 additions round 4: PII scrubbing, sequence packing, domain-mix
resampling — operator-level properties beyond the oracle parity check:
scrub idempotence, pack contiguity/accounting, and exact copy multiplicity.
"""

from pyspark.sql import Row
from pyspark.sql import functions as F

from mariadb_postgres_migration_spark.operators.textanalysis import (
    PACK_CAPACITY,
    mix_resample,
    pii_scrub,
    sequence_pack,
)
from mariadb_postgres_migration_spark.sources.parquet import read_parquet_table


def test_pii_scrub_counts_and_idempotence(spark):
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="mail a.b+c@x-corp.io and root@a.b.example.org now"),
            Row(doc_id=2, text="host 192.168.0.1 backup 10.0.255.3 dial +4915112345678"),
            Row(doc_id=3, text="nothing to redact here"),
            Row(doc_id=4, text="+123456 too short, +1234567 long enough"),
        ]
    )
    out = {r["doc_id"]: r for r in pii_scrub(docs).collect()}
    assert out[1]["n_email"] == 2 and "<EMAIL>" in out[1]["clean_text"]
    assert "@" not in out[1]["clean_text"].replace("<EMAIL>", "")
    assert out[2]["n_ip"] == 2 and out[2]["n_phone"] == 1
    assert out[3]["n_email"] == out[3]["n_ip"] == out[3]["n_phone"] == 0
    assert out[3]["clean_text"] == "nothing to redact here"
    # 6 digits after '+' is below the phone floor, 7 matches
    assert out[4]["n_phone"] == 1 and "+123456 too short" in out[4]["clean_text"]
    # confluence: scrubbing already-scrubbed text changes nothing
    once = pii_scrub(docs).select(
        F.col("doc_id"), F.col("clean_text").alias("text")
    )
    twice = {r["doc_id"]: r for r in pii_scrub(once).collect()}
    for d in (1, 2, 3, 4):
        assert twice[d]["clean_text"] == out[d]["clean_text"]
        assert twice[d]["n_email"] == twice[d]["n_ip"] == twice[d]["n_phone"] == 0


def test_sequence_pack_accounting(spark, sf_dir):
    docs = read_parquet_table(spark, sf_dir, "documents")
    packed = sequence_pack(docs).collect()
    by_shard: dict[str, list] = {}
    for r in packed:
        by_shard.setdefault(r["shard"], []).append(r)
    assert len(by_shard) > 1
    for shard, rows in by_shard.items():
        rows.sort(key=lambda r: r["doc_id"])
        # concat-then-chunk invariants: packs advance monotonically with the
        # running token total, a doc's span covers exactly its token range,
        # and consecutive docs are contiguous (no gap, no overlap)
        cum = 0
        prev_end_offset = 0
        for r in rows:
            start_offset = cum
            cum += r["n_tok"]
            assert r["start_pack"] == start_offset // PACK_CAPACITY
            assert r["end_pack"] == max(r["start_pack"], (cum - 1) // PACK_CAPACITY)
            assert start_offset == prev_end_offset
            prev_end_offset = cum


def test_mix_resample_multiplicity(spark, sf_dir):
    docs = read_parquet_table(spark, sf_dir, "documents")
    out = mix_resample(docs).groupBy("doc_id", "source").agg(
        F.count("*").alias("n"), F.max("copy").alias("max_copy")
    )
    rows = out.collect()
    # copies are densely numbered 1..n
    assert all(r["n"] == r["max_copy"] for r in rows)
    n_by_source = {}
    for r in rows:
        n_by_source.setdefault(r["source"], set()).add(r["n"])
    # src0 is exactly 2x (fraction cutoff '00000000' never fires)
    assert n_by_source.get("src0", {2}) == {2}
    # src1 rows appear once or twice (1.5x), src2 at most once (0.25x)
    assert n_by_source.get("src1", {1}) <= {1, 2}
    assert n_by_source.get("src2", {1}) <= {1}
    # default sources pass through exactly once
    for src, counts in n_by_source.items():
        if src not in ("src0", "src1", "src2"):
            assert counts == {1}
    # downsampled strata drop rows; every surviving (doc, source) is real
    total_in = docs.count()
    kept_src2 = out.filter(F.col("source") == "src2").count()
    src2_in = docs.filter(F.col("source") == "src2").count()
    assert kept_src2 <= src2_in
    assert out.count() <= 2 * total_in


def test_chunk_overlap_edges(spark):
    from mariadb_postgres_migration_spark.operators.textanalysis import (
        CHUNK_STRIDE,
        CHUNK_WINDOW,
        chunk_overlap,
    )

    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text=" ".join(f"w{i}" for i in range(80))),  # 80 tokens
            Row(doc_id=2, text="single"),
            Row(doc_id=3, text=" ".join(f"v{i}" for i in range(CHUNK_WINDOW))),
        ]
    )
    out = chunk_overlap(docs).collect()
    by_doc: dict[int, list] = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # 80 tokens at stride 24: chunk [48, 80) reaches the end, so start 72
    # (fully contained in its predecessor) is never emitted
    c1 = sorted(by_doc[1], key=lambda r: r["chunk_id"])
    assert [r["start"] for r in c1] == [0, 24, 48]
    assert all(r["chunk_len"] == CHUNK_WINDOW for r in c1)
    # overlap: the last 8 tokens of chunk 0 open chunk 1
    assert c1[0]["chunk_text"].split()[CHUNK_STRIDE:] == c1[1]["chunk_text"].split()[
        : CHUNK_WINDOW - CHUNK_STRIDE
    ]
    # 1-token doc → exactly one 1-token chunk
    assert len(by_doc[2]) == 1 and by_doc[2][0]["chunk_len"] == 1
    # exactly-window doc → one full chunk, no empty successor
    assert len(by_doc[3]) == 1 and by_doc[3][0]["chunk_len"] == CHUNK_WINDOW


def test_quantize_int8_roundtrip(spark):
    from mariadb_postgres_migration_spark.operators.similarity import quantize_int8

    docs = spark.createDataFrame(
        [
            Row(vec_id=1, embedding=[1.0, -0.5, 0.25, 0.0]),
            Row(vec_id=2, embedding=[0.0, 0.0, 0.0, 0.0]),  # all-zero guard
        ]
    )
    out = {r["vec_id"]: r for r in quantize_int8(docs).collect()}
    assert out[1]["qvec"] == [127, -64, 32, 0]  # scale = 1/127
    assert out[1]["max_abs"] == 1.0
    assert out[1]["mse"] < 1e-4
    assert out[2]["qvec"] == [0, 0, 0, 0] and out[2]["mse"] == 0.0


def test_decontaminate_flags_planted_overlap(spark):
    from mariadb_postgres_migration_spark.operators.textanalysis import decontaminate

    bench = spark.createDataFrame(
        [Row(doc_id=100, text="alpha beta gamma delta epsilon")]
    )
    docs = spark.createDataFrame(
        [
            # contains the benchmark 3-gram "beta gamma delta"
            Row(doc_id=1, text="intro beta gamma delta outro fin"),
            Row(doc_id=2, text="totally unrelated words only here"),
        ]
    )
    out = {r["doc_id"]: r for r in decontaminate(docs, bench).collect()}
    assert out[1]["n_hits"] >= 1 and out[1]["contaminated"]
    assert out[2]["n_hits"] == 0 and not out[2]["contaminated"]


def test_decontaminate_keeps_short_and_empty_docs(spark):
    """A doc with fewer than k tokens has zero shingles but must still get
    an output row (n_sh=0, contaminated=false) — a caller filtering on
    `contaminated` as a keep-list must not silently lose short docs
    (ADVICE r4)."""
    from mariadb_postgres_migration_spark.operators.textanalysis import decontaminate

    bench = spark.createDataFrame([Row(doc_id=100, text="alpha beta gamma")])
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="two words"),
            Row(doc_id=2, text=""),
            Row(doc_id=3, text="alpha beta gamma padded out"),
        ]
    )
    out = {r["doc_id"]: r for r in decontaminate(docs, bench).collect()}
    assert set(out) == {1, 2, 3}
    for short_id in (1, 2):
        r = out[short_id]
        assert r["n_sh"] == 0 and r["n_hits"] == 0
        assert r["hit_ratio"] == 0.0 and not r["contaminated"]
    assert out[3]["contaminated"]


def test_chunk_overlap_covers_every_token_property(spark):
    """Property (hypothesis): for random doc lengths, chunks cover every
    token index, starts advance by exactly the stride, and only the final
    chunk may be short."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from mariadb_postgres_migration_spark.operators.textanalysis import (
        CHUNK_STRIDE,
        CHUNK_WINDOW,
        chunk_overlap,
    )

    @settings(max_examples=8, deadline=None)
    @given(st.lists(st.integers(min_value=1, max_value=200), min_size=1, max_size=6))
    def check(lengths):
        docs = spark.createDataFrame(
            [(i, " ".join(f"t{j}" for j in range(n))) for i, n in enumerate(lengths)],
            "doc_id long, text string",
        )
        rows = chunk_overlap(docs).collect()
        by_doc: dict[int, list] = {}
        for r in rows:
            by_doc.setdefault(r["doc_id"], []).append(r)
        for i, n in enumerate(lengths):
            cs = sorted(by_doc[i], key=lambda r: r["chunk_id"])
            assert [r["start"] for r in cs] == [k * CHUNK_STRIDE for k in range(len(cs))]
            covered = set()
            for r in cs:
                assert r["chunk_len"] >= 1
                covered.update(range(r["start"], r["start"] + r["chunk_len"]))
            assert covered == set(range(n))
            # every non-final chunk is full-width
            for r in cs[:-1]:
                assert r["chunk_len"] == CHUNK_WINDOW
            # the final chunk reaches the end; its start is < n
            assert cs[-1]["start"] + cs[-1]["chunk_len"] == n

    check()


def test_chunk_overlap_empty_text_yields_no_chunks(spark):
    """split('') is [''] in both engines — the phantom token must not
    become an empty chunk row (review r5)."""
    from mariadb_postgres_migration_spark.operators.textanalysis import chunk_overlap

    docs = spark.createDataFrame(
        [(1, ""), (2, "   "), (3, "real words here")],
        "doc_id long, text string",
    )
    rows = chunk_overlap(docs).collect()
    assert {r["doc_id"] for r in rows} == {3}
