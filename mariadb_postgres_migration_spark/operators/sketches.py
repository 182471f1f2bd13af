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

from .reconcile import hex_chunk, hex_chunk_sql

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
        pj.join(F.broadcast(counters), ["j", "bucket"], "left")  # bounded: d x w fixed sketch counters
        .groupBy("term")
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est_count"))
    )


# ---------------------------------------------------------------------------
# KMV set algebra: union / intersection / Jaccard estimates between two
# strata's sketches. The point of KMV over HLL at 100 TB isn't just
# cardinality — merged k-min sketches answer SET-RELATION questions
# ("how many customers do these two segments share?") from k-row
# summaries, without ever joining the raw key sets (Beyer et al.,
# SIGMOD 2007, "On synopses for distinct-value estimation under multiset
# operations").
# ---------------------------------------------------------------------------


def kmv_set_relations(
    df: DataFrame, group_col: str, key_col: str, k: int = 64
) -> DataFrame:
    """For every unordered pair of groups: KMV estimates of the key-set
    union size, intersection size, and Jaccard similarity, next to the
    exact values.

    The estimator is the standard merged-sketch form: the pair's merged
    sketch is the k smallest hashes of ``K(A) ∪ K(B)`` (computable from
    the two k-row sketches alone); ``union_est`` is the usual
    ``(k-1)·2^32 div h_k`` over it (exact when the merged hash set has
    < k values); ``shared_k`` counts merged-sketch members present in
    BOTH per-group sketches, so ``shared_k / k_used`` estimates the
    Jaccard coefficient and ``inter_est = shared_k · union_est div
    k_used`` the intersection size. Every step is integer arithmetic on
    md5-derived hashes — the DuckDB oracle reproduces the estimates
    bit-for-bit, which is what makes an *approximate* operator
    hash-verifiable: the driver pins the estimator's algebra, while the
    accuracy-vs-exact columns are ±O(1/√k) by construction.

    Plan shape: one distinct-(group, hash) exchange, one WindowGroupLimit
    top-k (each map task ships ≤ k rows per group), and everything
    pairwise happens on k-row-per-group sketch frames — the group-pair
    frame and both sketch sides are broadcast-sized by contract. The
    ``exact_*`` columns are the verification sidecar (same convention as
    :func:`kmv_distinct`): they re-join the raw distinct key sets, which
    is exactly the pairwise work the sketch exists to avoid; a 100 TB
    caller drops them.
    """
    g, key = F.col(group_col), F.col(key_col)
    keys = df.select(g.alias("g"), key.alias("key")).distinct()
    hashed = keys.select(
        "g", hex_chunk(F.md5(F.col("key").cast("string")), 1).alias("h")
    ).distinct()
    w = Window.partitionBy("g").orderBy("h")
    sk = (
        hashed.withColumn("__rnk", F.row_number().over(w))
        .filter(F.col("__rnk") <= k)
        .select("g", "h")
    )
    groups = sk.select("g").distinct()
    pairs = (
        groups.select(F.col("g").alias("g1"))
        .join(F.broadcast(groups.select(F.col("g").alias("g2"))))  # bounded: one row per group key
        .filter(F.col("g1") < F.col("g2"))
    )
    a = sk.select(F.col("g").alias("g1"), "h")
    b = sk.select(F.col("g").alias("g2"), "h")
    merged = (
        pairs.join(F.broadcast(a), "g1")  # bounded: k-row sketch per group
        .select("g1", "g2", "h", F.lit(1).alias("ia"), F.lit(0).alias("ib"))
        .unionAll(
            pairs.join(F.broadcast(b), "g2")  # bounded: k-row sketch per group
            .select("g1", "g2", "h", F.lit(0).alias("ia"), F.lit(1).alias("ib"))
        )
        .groupBy("g1", "g2", "h")
        .agg(F.max("ia").alias("ia"), F.max("ib").alias("ib"))
    )
    wp = Window.partitionBy("g1", "g2").orderBy("h")
    ag = (
        merged.withColumn("__rnk", F.row_number().over(wp))
        .filter(F.col("__rnk") <= k)
        .groupBy("g1", "g2")
        .agg(
            F.count("*").cast("long").alias("k_used"),
            F.max("h").alias("kth"),
            F.sum(F.col("ia") * F.col("ib")).cast("long").alias("shared_k"),
        )
    )
    union_est = F.when(F.col("k_used") < k, F.col("k_used")).otherwise(
        F.expr(
            f"CAST({(k - 1) * HASH_SPACE} AS BIGINT)"
            " div greatest(kth, CAST(1 AS BIGINT))"
        )
    ).cast("long")
    est = ag.select(
        "g1", "g2", "k_used", "shared_k",
        union_est.alias("union_est"),
    ).select(
        "g1", "g2", "k_used", "shared_k", "union_est",
        F.expr("(shared_k * union_est) div k_used").cast("long").alias("inter_est"),
        F.expr("(1000 * shared_k) div k_used").cast("long").alias("jaccard_milli"),
    )
    cnt = keys.groupBy("g").agg(F.count("*").cast("long").alias("c"))
    ex_inter = (
        pairs.join(keys.select(F.col("g").alias("g1"), "key"), "g1")
        .join(keys.select(F.col("g").alias("g2"), "key"), ["g2", "key"])
        .groupBy("g1", "g2")
        .agg(F.count("*").cast("long").alias("exact_inter"))
    )
    return (
        est.join(F.broadcast(cnt.select(F.col("g").alias("g1"), F.col("c").alias("ca"))), "g1")  # bounded: one row per group key
        .join(F.broadcast(cnt.select(F.col("g").alias("g2"), F.col("c").alias("cb"))), "g2")
        .join(ex_inter, ["g1", "g2"], "left")
        .select(
            "g1", "g2", "k_used", "shared_k", "union_est", "inter_est",
            "jaccard_milli",
            F.coalesce("exact_inter", F.lit(0)).cast("long").alias("exact_inter"),
            (F.col("ca") + F.col("cb") - F.coalesce("exact_inter", F.lit(0)))
            .cast("long")
            .alias("exact_union"),
        )
    )


def kmv_set_relations_sql(rows_cte: str, k: int = 64) -> str:
    """DuckDB oracle for :func:`kmv_set_relations`. ``rows_cte`` must
    yield ``(g, key)``; the hash, ranks, merged sketch and estimator are
    the identical integer algebra (hex_chunk_sql is the shared md5→BIGINT
    nibble fold)."""
    from .reconcile import hex_chunk_sql

    h = hex_chunk_sql("md5(CAST(key AS VARCHAR))", 1)
    return f"""WITH r AS ({rows_cte}),
keys AS (SELECT DISTINCT g, key FROM r),
hashed AS (SELECT DISTINCT g, {h} AS h FROM keys),
sk AS (SELECT g, h FROM (
    SELECT g, h, row_number() OVER (PARTITION BY g ORDER BY h) AS rn
    FROM hashed) WHERE rn <= {k}),
gs AS (SELECT DISTINCT g FROM sk),
pairs AS (SELECT a.g AS g1, b.g AS g2 FROM gs a JOIN gs b ON a.g < b.g),
memb AS (SELECT g1, g2, h, max(ia) AS ia, max(ib) AS ib FROM (
    SELECT p.g1, p.g2, s.h, 1 AS ia, 0 AS ib FROM pairs p JOIN sk s ON s.g = p.g1
    UNION ALL
    SELECT p.g1, p.g2, s.h, 0 AS ia, 1 AS ib FROM pairs p JOIN sk s ON s.g = p.g2
  ) GROUP BY g1, g2, h),
rk AS (SELECT *, row_number() OVER (PARTITION BY g1, g2 ORDER BY h) AS rn
       FROM memb),
ag AS (SELECT g1, g2, CAST(count(*) AS BIGINT) AS k_used, max(h) AS kth,
              CAST(sum(ia * ib) AS BIGINT) AS shared_k
       FROM rk WHERE rn <= {k} GROUP BY g1, g2),
est AS (SELECT g1, g2, k_used, shared_k,
               CAST(CASE WHEN k_used < {k} THEN k_used
                    ELSE {(k - 1) * HASH_SPACE} // greatest(kth, 1)
               END AS BIGINT) AS union_est
        FROM ag),
cnt AS (SELECT g, CAST(count(*) AS BIGINT) AS c FROM keys GROUP BY g),
exi AS (SELECT p.g1, p.g2, CAST(count(*) AS BIGINT) AS exact_inter
        FROM pairs p
        JOIN keys a ON a.g = p.g1
        JOIN keys b ON b.g = p.g2 AND b.key = a.key
        GROUP BY p.g1, p.g2)
SELECT e.g1, e.g2, e.k_used, e.shared_k, e.union_est,
       CAST((e.shared_k * e.union_est) // e.k_used AS BIGINT) AS inter_est,
       CAST((1000 * e.shared_k) // e.k_used AS BIGINT) AS jaccard_milli,
       COALESCE(x.exact_inter, 0) AS exact_inter,
       CAST(ca.c + cb.c - COALESCE(x.exact_inter, 0) AS BIGINT) AS exact_union
FROM est e
JOIN cnt ca ON ca.g = e.g1
JOIN cnt cb ON cb.g = e.g2
LEFT JOIN exi x ON x.g1 = e.g1 AND x.g2 = e.g2"""


#: bits packed per bitmap word — 62 keeps every mask positive in a signed
#: BIGINT (shift ≤ 61), sidestepping sign-bit semantics differences.
BITMAP_WORD_BITS = 62


def bitmap_set_relations(
    df: DataFrame, group_col: str, key_col: str
) -> DataFrame:
    """EXACT pairwise set relations between groups via bitmap indexes —
    the dense-id complement to :func:`kmv_set_relations`: per group, the
    distinct non-negative integer keys pack into (word_idx → 62-bit word)
    rows built by one map-side-combined ``bit_or``; a pair's intersection
    is then ``Σ bit_count(wa & wb)`` over an inner word join, union falls
    out by inclusion-exclusion from per-group popcounts. The classic OLAP
    bitmap-index trick: set operations become bitwise ops on tables
    |key domain| / 62 rows per group, independent of row count.

    The ORACLE computes the same relations with plain pairwise
    ``COUNT(DISTINCT)`` joins — no bitmaps anywhere — so the driver hash
    match cross-checks two fully independent algorithms (the same
    two-algorithm pattern as x96's skyline).

    When to use which: bitmaps are exact and cheap while the key domain
    is dense (words ~ domain/62 regardless of group count); KMV (x99)
    stays k rows per group for ANY domain, at ±O(1/√k) error. Requires
    non-negative integer keys; negative/sparse-huge domains re-map
    through a dictionary first.

    Returns ``(g1, g2, n_a, n_b, n_inter, n_union, jaccard_milli)``.
    """
    w = BITMAP_WORD_BITS
    base = df.select(
        F.col(group_col).alias("g"), F.col(key_col).cast("long").alias("k")
    ).filter(F.col("k") >= 0)
    words = (
        base.select(
            "g",
            F.expr(f"k div {w}").alias("widx"),
            # shiftleft via expr: the python F.shiftleft only takes a
            # LITERAL shift amount, not a per-row column
            F.expr(f"shiftleft(CAST(1 AS BIGINT), CAST(k % {w} AS INT))").alias("m"),
        )
        .groupBy("g", "widx")
        .agg(F.bit_or("m").alias("bits"))
    )
    pop = words.groupBy("g").agg(
        F.sum(F.bit_count("bits")).cast("long").alias("n")
    )
    a = words.select(F.col("g").alias("g1"), "widx", F.col("bits").alias("ba"))
    b = words.select(F.col("g").alias("g2"), "widx", F.col("bits").alias("bb"))
    inter = (
        a.join(b, "widx")
        .filter(F.col("g1") < F.col("g2"))
        .groupBy("g1", "g2")
        .agg(
            F.sum(F.bit_count(F.col("ba").bitwiseAND(F.col("bb"))))
            .cast("long")
            .alias("n_inter")
        )
    )
    pa = pop.select(F.col("g").alias("g1"), F.col("n").alias("n_a"))
    pb = pop.select(F.col("g").alias("g2"), F.col("n").alias("n_b"))
    pairs = pa.join(F.broadcast(pb)).filter(F.col("g1") < F.col("g2"))  # bounded: one fixed-size bitmap row per group
    out = (
        pairs.join(inter, ["g1", "g2"], "left")
        .select(
            "g1", "g2", "n_a", "n_b",
            F.coalesce("n_inter", F.lit(0)).cast("long").alias("n_inter"),
        )
        .select(
            "g1", "g2", "n_a", "n_b", "n_inter",
            (F.col("n_a") + F.col("n_b") - F.col("n_inter"))
            .cast("long")
            .alias("n_union"),
        )
    )
    return out.select(
        "*",
        F.expr("(1000 * n_inter) div n_union").cast("long").alias("jaccard_milli"),
    )


def bitmap_set_relations_sql(rows_cte: str) -> str:
    """DuckDB oracle for :func:`bitmap_set_relations`: plain pairwise
    distinct-set joins, no bitmap anywhere — the independent algorithm
    whose agreement proves the bit packing. ``rows_cte`` must yield
    ``(g, k)``."""
    return f"""WITH r AS ({rows_cte}),
  keys AS (SELECT DISTINCT g, k FROM r WHERE k >= 0),
  cnt AS (SELECT g, CAST(count(*) AS BIGINT) AS n FROM keys GROUP BY g),
  pairs AS (SELECT a.g AS g1, b.g AS g2, a.n AS n_a, b.n AS n_b
            FROM cnt a JOIN cnt b ON a.g < b.g),
  inter AS (SELECT x.g AS g1, y.g AS g2, CAST(count(*) AS BIGINT) AS n_inter
            FROM keys x JOIN keys y ON x.g < y.g AND x.k = y.k
            GROUP BY x.g, y.g)
SELECT p.g1, p.g2, p.n_a, p.n_b,
       COALESCE(i.n_inter, 0) AS n_inter,
       CAST(p.n_a + p.n_b - COALESCE(i.n_inter, 0) AS BIGINT) AS n_union,
       CAST((1000 * COALESCE(i.n_inter, 0))
            // (p.n_a + p.n_b - COALESCE(i.n_inter, 0)) AS BIGINT)
         AS jaccard_milli
FROM pairs p LEFT JOIN inter i ON i.g1 = p.g1 AND i.g2 = p.g2"""


# ---------------------------------------------------------------------------
# HyperLogLog — made hash-verifiable via dyadic-integer algebra.
#
# The module docstring (r6) ruled HLL out as "unverifiable" because of its
# float harmonic mean. That was too pessimistic: with 32-bit hashes and m
# registers, every harmonic-mean term 2^-r is a dyadic rational with
# r <= 27, so Z·2^27 = Σ 2^(27-r) is a plain 64-bit INTEGER — exact,
# order-independent, engine-portable. The raw Flajolet estimate
# α·m²/Z then reduces to one integer division. Only the small-range
# (linear-counting) correction needs a transcendental ln; it is emitted
# as the zero-register count n_zero for the caller to apply, keeping the
# verified surface pure-integer. (Flajolet, Fusy, Gandouet, Meunier,
# AofA 2007 — public algorithm and constants.)
# ---------------------------------------------------------------------------

HLL_BUCKET_BITS = 6
HLL_M = 1 << HLL_BUCKET_BITS  # 64 registers
HLL_REM_BITS = 32 - HLL_BUCKET_BITS  # 26 rank bits
HLL_MAX_RANK = HLL_REM_BITS + 1  # 27: all-zero remainder
HLL_Z_SCALE = 1 << HLL_MAX_RANK
#: α_64 = 0.709 (the paper's stated constant for m = 64), in milli.
HLL_ALPHA_MILLI = 709


def hll_registers(
    df: DataFrame, group_cols: list[str], key_col: str,
    pre_distinct: bool = True,
) -> DataFrame:
    """Per-group HLL register table ``(groups..., bucket, r)``: bucket =
    the hash's top 6 bits, r = max over keys of (leading zeros of the
    26-bit remainder + 1). ≤ m rows per group — the mergeable sketch
    state (merge = elementwise max, commutative/associative, which is
    also why the streamed form needs no arrival order).

    Plan: one distinct (group, hash) exchange, then a map-side-combined
    max per (group, bucket) — register rows are the ONLY thing crossing
    the second shuffle. The distinct is a pure shuffle-size optimization
    (duplicates cannot change a max); ``pre_distinct=False`` skips it —
    REQUIRED on a streaming frame, where distinct-then-max would be two
    chained aggregations (unsupported), while the single max-agg is the
    complete-mode streaming sketch for free, like the CMS counters."""
    hashed = df.select(
        *group_cols,
        hex_chunk(F.md5(F.col(key_col).cast("string")), 1).alias("h"),
    )
    if pre_distinct:
        hashed = hashed.distinct()
    w_bits = f"(h % {1 << HLL_REM_BITS})"
    rank = (
        f"CAST({HLL_MAX_RANK} - CASE WHEN {w_bits} = 0 THEN 0"
        f" ELSE length(conv({w_bits}, 10, 2)) END AS BIGINT)"
    )
    return (
        hashed.select(
            *group_cols,
            F.expr(f"h div {1 << HLL_REM_BITS}").cast("long").alias("bucket"),
            F.expr(rank).alias("r"),
        )
        .groupBy(*group_cols, "bucket")
        .agg(F.max("r").cast("long").alias("r"))
    )


def hll_distinct(
    df: DataFrame, group_cols: list[str], key_col: str
) -> DataFrame:
    """Per-group HLL cardinality estimate next to the exact count —
    the m-integers-per-group sibling of :func:`kmv_distinct` (KMV: k
    rows, ±1/√k; HLL: m registers, ±1.04/√m, and the state never grows
    past m longs no matter the cardinality).

    Output: ``n_zero`` (empty registers — the caller's linear-counting
    input), ``z27`` (the dyadic-integer harmonic denominator Z·2^27),
    ``est_distinct`` (α·m²/Z as ONE integer division), and the
    ``exact_distinct`` verification sidecar (same contract as KMV: a
    100 TB caller drops the sidecar, not the sketch)."""
    regs = hll_registers(df, group_cols, key_col)
    per_group = regs.groupBy(*group_cols).agg(
        F.count("*").cast("long").alias("n_regs"),
        F.sum(F.expr(f"shiftleft(CAST(1 AS BIGINT), CAST({HLL_MAX_RANK} - r AS INT))"))
        .cast("long")
        .alias("z_regs"),
    )
    exact = (
        df.select(*group_cols, key_col)
        .distinct()
        .groupBy(*group_cols)
        .agg(F.count("*").cast("long").alias("exact_distinct"))
    )
    num = HLL_ALPHA_MILLI * HLL_M * HLL_M * HLL_Z_SCALE
    return (
        per_group.join(exact, group_cols)
        .select(
            *group_cols,
            (F.lit(HLL_M) - F.col("n_regs")).cast("long").alias("n_zero"),
            (
                F.col("z_regs")
                + (F.lit(HLL_M) - F.col("n_regs")) * F.lit(HLL_Z_SCALE)
            )
            .cast("long")
            .alias("z27"),
            "exact_distinct",
        )
        .select(
            *group_cols,
            "n_zero",
            "z27",
            F.expr(f"CAST({num} AS BIGINT) div (1000 * z27)")
            .cast("long")
            .alias("est_distinct"),
            "exact_distinct",
        )
    )


def hll_distinct_sql(rows_cte: str, group_cols: list[str], key_expr: str) -> str:
    """DuckDB oracle for :func:`hll_distinct`; ``rows_cte`` must yield the
    group columns plus ``key`` (pre-cast to VARCHAR by ``key_expr``)."""
    g = ", ".join(group_cols)
    h = hex_chunk_sql("md5(key)", 1)
    w = f"(h % {1 << HLL_REM_BITS})"
    num = HLL_ALPHA_MILLI * HLL_M * HLL_M * HLL_Z_SCALE
    return f"""WITH rows_in AS ({rows_cte}),
hashed AS (SELECT DISTINCT {g}, {h} AS h
           FROM (SELECT {g}, {key_expr} AS key FROM rows_in)),
regs AS (SELECT {g}, h // {1 << HLL_REM_BITS} AS bucket,
                max({HLL_MAX_RANK} - CASE WHEN {w} = 0 THEN 0
                    ELSE length(bin({w})) END) AS r
         FROM hashed GROUP BY {g}, bucket),
pg AS (SELECT {g}, count(*) AS n_regs,
              sum(1::BIGINT << CAST({HLL_MAX_RANK} - r AS INTEGER)) AS z_regs
       FROM regs GROUP BY {g}),
ex AS (SELECT {g}, CAST(count(DISTINCT key) AS BIGINT) AS exact_distinct
       FROM (SELECT {g}, {key_expr} AS key FROM rows_in) GROUP BY {g})
SELECT {g}, CAST({HLL_M} - n_regs AS BIGINT) AS n_zero,
       CAST(z_regs + ({HLL_M} - n_regs) * {HLL_Z_SCALE} AS BIGINT) AS z27,
       CAST({num} // (1000 * (z_regs + ({HLL_M} - n_regs) * {HLL_Z_SCALE}))
            AS BIGINT) AS est_distinct,
       exact_distinct
FROM pg JOIN ex USING ({g})"""
