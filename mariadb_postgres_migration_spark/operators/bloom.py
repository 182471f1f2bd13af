"""A distributed Bloom filter in pure JVM expressions, and the
bloom-accelerated exact membership check built on it.

Spark's own Bloom machinery (``bloom_filter_agg`` / runtime filters) is
not exposed to public SQL, but a Bloom filter is only k hash positions in
an m-bit array — all expressible with ``xxhash64`` + ``pmod`` + a
``bit_or`` word aggregation:

* **build** — each key contributes k bits; bits pack into 64-bit words;
  ``groupBy(word).agg(bit_or(mask))`` builds the array. Map-side partial
  ``bit_or`` combines per word BEFORE the shuffle, so however many keys
  the corpus has, the exchange carries at most (words × partitions) rows
  and the finished filter is m/64 rows (~16 KB for m=2^20) — broadcast
  material.
* **probe** — a key explodes into its k (word, mask) positions, joins the
  broadcast filter, and is bloom-positive iff every mask is fully set.
* **guarantee** — a bloom-NEGATIVE is definitely absent (no false
  negatives by construction), so only bloom-positives proceed to the
  exact join; the final answer is EXACT, the filter only prunes.

This is the hand-rolled form of the semi-join runtime filter every
warehouse applies at 100 TB: the expensive corpus-side join runs over the
(dups + ε·fpp) fraction of the new snapshot instead of all of it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: filter geometry: m = 2^17 bits (2048 longs), k = 5 hashes. For the
#: fixture corpora this is generously oversized (fpp ≈ 0); production
#: sizing is the standard m = -n·ln(p)/ln(2)^2 with these same shapes.
BLOOM_BITS_LOG2 = 17
BLOOM_WORDS = (1 << BLOOM_BITS_LOG2) // 64
BLOOM_K = 5


def _positions(key: Column) -> Column:
    """Array of k bit positions for ``key`` — k independent xxhash64
    streams via seed-suffix concatenation, all JVM-side."""
    m = 1 << BLOOM_BITS_LOG2
    return F.array(
        *[
            F.pmod(F.xxhash64(F.concat(key, F.lit(f"#{i}"))), F.lit(m))
            for i in range(BLOOM_K)
        ]
    )


def _word_mask() -> list[Column]:
    """(word, mask) for a position column named ``pos``. ``shiftleft``
    only takes a literal bit count through the Python API, so the mask
    goes through a SQL expr where the column form is allowed."""
    word = F.expr("CAST(pos / 64 AS BIGINT)").alias("word")
    mask = F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT))").alias("mask")
    return [word, mask]


def bloom_build(keys: DataFrame, key_col: str) -> DataFrame:
    """``(word, bits)`` Bloom array rows for the distinct keys of
    ``keys[key_col]`` — one map-side-combined ``bit_or`` shuffle."""
    pos = F.explode(_positions(F.col(key_col))).alias("pos")
    return (
        keys.select(pos)
        .select(*_word_mask())
        .groupBy("word")
        .agg(F.expr("bit_or(mask)").alias("bits"))
    )


def bloom_might_contain(
    probes: DataFrame, key_col: str, bloom: DataFrame
) -> DataFrame:
    """``probes`` plus a ``bloom_positive`` column: true iff every one of
    the key's k bits is set. The verdict is a pure function of the KEY,
    so it's computed once per distinct key (grouped on the key — no
    synthetic row ids, which are partition-layout-dependent) and joined
    back; the filter itself joins broadcast, and a missing word row means
    those bits are zero → negative."""
    verdicts = (
        probes.select(key_col)
        .distinct()
        .select(key_col, F.explode(_positions(F.col(key_col))).alias("pos"))
        .select(key_col, *_word_mask())
        .join(F.broadcast(bloom), on="word", how="left")  # bounded: fixed m-bit filter (chunked bitmap rows)
        .select(
            key_col,
            (
                F.col("bits").isNotNull()
                & (F.col("bits").bitwiseAND(F.col("mask")) == F.col("mask"))
            ).alias("__hit"),
        )
        .groupBy(key_col)
        .agg(F.min("__hit").alias("bloom_positive"))
    )
    # null-SAFE equality: a NULL probe key must keep its row (verdict from
    # hashing the null-concat positions; the exact join downstream still
    # reports non-membership) — a plain inner join would silently drop it
    return probes.join(
        verdicts.withColumnRenamed(key_col, "__vk"),
        on=F.col(key_col).eqNullSafe(F.col("__vk")),
        how="inner",
    ).drop("__vk")


def bloom_filtered_membership(
    new: DataFrame, corpus_keys: DataFrame, key_col: str
) -> DataFrame:
    """EXACT membership of ``new[key_col]`` in ``corpus_keys[key_col]``,
    bloom-pruned: negatives short-circuit to ``false`` without touching
    the corpus; only positives pay the exact (distinct-corpus) join.
    Output: ``new``'s columns plus ``is_member``."""
    from .dedup import _persist

    distinct_corpus = corpus_keys.select(key_col).distinct()
    bloom = bloom_build(distinct_corpus, key_col)
    # persisted: both the negative and positive branches consume flagged —
    # without the barrier the probe scan + verdict join would run twice
    flagged = _persist(bloom_might_contain(new, key_col, bloom))
    negatives = flagged.filter(~F.col("bloom_positive")).withColumn(
        "is_member", F.lit(False)
    )
    positives = (
        flagged.filter(F.col("bloom_positive"))
        .join(
            distinct_corpus.withColumnRenamed(key_col, "__ck"),
            on=F.col(key_col) == F.col("__ck"),
            how="left",
        )
        .withColumn("is_member", F.col("__ck").isNotNull())
        .drop("__ck")
    )
    return negatives.unionByName(positives).drop("bloom_positive")
