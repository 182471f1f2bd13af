"""KMV (k-minimum-values) distinct-count sketch (EXT-05 scale analysis).

The reference never counts distincts at all (it migrates rows verbatim,
index.mjs:21-168); a 100 TB ingest pipeline needs cardinality estimates
per stratum for shuffle sizing, skew detection, and dedup-rate forecasts
— exact countDistinct is a full shuffle of every distinct key, while a
KMV sketch is a k-row summary per group.

Why KMV and not HyperLogLog: KMV's state (the k smallest hash values) and
its estimate ``(k-1) * 2^32 div h_k`` are pure integer artifacts of an
md5-derived hash, so a DuckDB oracle reproduces them bit-for-bit — HLL's
float harmonic mean and engine-specific hash make it unverifiable here.
Same mergeability story: the union of two KMV sketches is the k smallest
of the merged value sets, so partial aggregation is exact.

Scale shape: Spark executes the per-group k-smallest as a rank window,
and (Spark ≥3.5) the WindowGroupLimit rule pushes the ``rank <= k``
filter below the exchange — each map task ships at most k rows per
group, which IS the mergeable-sketch plan (pinned in
tests/test_sketches.py). The sketch path is two shuffles: the distinct
(group, hash) exchange and the group window; the exact-count column is
a deliberately-paid verification sidecar (see :func:`kmv_distinct`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .reconcile import hex_chunk

#: Estimator scale: hashes are 32-bit (8 md5 hex chars), so the unit
#: interval is [0, 2^32).
HASH_SPACE = 1 << 32


def kmv_distinct(
    df: DataFrame, group_cols: list[str], key_col: str, k: int = 64
) -> DataFrame:
    """Per-group KMV distinct-count estimate next to the exact count.

    Output per group: ``k_used`` (min(k, observed distinct hashes)),
    ``kth_hash`` (the k-th smallest 32-bit hash — the sketch boundary),
    ``est_distinct`` (``(k-1) * 2^32 div kth_hash``, or the exact count
    when the group has fewer than k distinct hashes — the sketch is then
    the full value set and exact by definition), and ``exact_distinct``
    for error inspection. All integers — no float estimate drift.

    The sketch path is one scan, one distinct-(group, hash) exchange
    and a WindowGroupLimit top-k. ``exact_distinct`` is a verification
    sidecar: it is exactly the full countDistinct the sketch exists to
    avoid, kept here so every estimate ships next to its ground truth —
    a production caller at 100 TB would drop that column (and with it
    the second scan), not the sketch.
    """
    # KMV is over the hash SET: distinct on (group, h) directly — an
    # intermediate distinct on the raw key is redundant (Catalyst
    # eliminates it) and md5 collisions must merge anyway.
    hashed = df.select(
        *group_cols,
        hex_chunk(F.md5(F.col(key_col).cast("string")), 1).alias("h"),
    ).distinct()
    w = Window.partitionBy(*group_cols).orderBy("h")
    topk = hashed.withColumn("__rnk", F.row_number().over(w)).filter(
        F.col("__rnk") <= k
    )
    sk = topk.groupBy(*group_cols).agg(
        F.count("*").cast("long").alias("k_used"),
        F.max("h").alias("kth_hash"),
    )
    exact = (
        df.select(*group_cols, key_col)
        .distinct()
        .groupBy(*group_cols)
        .agg(F.count("*").cast("long").alias("exact_distinct"))
    )
    # `div` is true integer division (matching DuckDB's `//`) — a double
    # divide + floor can land one off when rounding crosses an integer.
    est = F.when(F.col("k_used") < k, F.col("k_used")).otherwise(
        F.expr(
            f"CAST({(k - 1) * HASH_SPACE} AS BIGINT)"
            " div greatest(kth_hash, CAST(1 AS BIGINT))"
        )
    )
    return sk.join(exact, group_cols).select(
        *group_cols,
        "k_used",
        "kth_hash",
        est.cast("long").alias("est_distinct"),
        "exact_distinct",
    )


# ---------------------------------------------------------------------------
# Count-min sketch: point-frequency estimates from fixed d×W counter state.
# Completes the sketch toolbox next to the Bloom filter (membership,
# operators/bloom.py), KMV (cardinality, above) and Misra-Gries (heavy
# hitters, operators/audit.py): CMS answers "how often does THIS term
# occur" from d*W integers instead of a corpus-sized term table.
# ---------------------------------------------------------------------------

CMS_DEPTH = 3
CMS_WIDTH = 1024


def _cms_bucket(term, j: int):
    """Row j's bucket for a term: md5 with a per-row seed suffix, first
    8 hex chars as an integer, mod the width — engine-portable (the
    DuckDB oracle reproduces it bit-for-bit via the same nibble fold)."""
    return (
        hex_chunk(F.md5(F.concat(term, F.lit(f"#cms{j}"))), 1) % CMS_WIDTH
    ).cast("long")


def cms_counters(tokens: DataFrame, term_col: str = "term") -> DataFrame:
    """Build the (j, bucket, cnt) counter table — the ENTIRE sketch state
    is ≤ CMS_DEPTH × CMS_WIDTH rows, so the shuffle after the map-side
    partial aggregate moves at most d·W rows per task regardless of
    corpus size, and two sketches merge by adding counters (the
    mergeability that makes this a 100 TB operator)."""
    rows = tokens.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("j"),
                        _cms_bucket(F.col(term_col), j).alias("bucket"),
                    )
                    for j in range(CMS_DEPTH)
                ]
            )
        ).alias("jb")
    ).select("jb.j", "jb.bucket")
    return rows.groupBy("j", "bucket").agg(
        F.count("*").cast("long").alias("cnt")
    )


def cms_estimate(
    counters: DataFrame, probes: DataFrame, term_col: str = "term"
) -> DataFrame:
    """Point-frequency estimate per probe term: ``min`` over the d rows
    of the term's bucket counters — an upper bound on the true count
    (never under; over only by bucket collisions). The counter table is
    d·W rows, so the join is a broadcast by size."""
    pj = probes.select(
        F.col(term_col).alias("term"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("j"),
                        _cms_bucket(F.col(term_col), j).alias("bucket"),
                    )
                    for j in range(CMS_DEPTH)
                ]
            )
        ).alias("jb"),
    ).select("term", "jb.j", "jb.bucket")
    return (
        pj.join(F.broadcast(counters), ["j", "bucket"], "left")
        .groupBy("term")
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est_count"))
    )
