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
