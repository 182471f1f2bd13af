"""Migration reconciliation: bucketed table checksums and row-level
snapshot diffs.

The reference performs a one-shot MariaDB→Postgres migration
(reference `src/index.mjs:21-168` — pump every table across, fix
sequences, cluster). The operational question it leaves unanswered is
*did the copy arrive intact* — the job the MySQL ecosystem solves with
``pt-table-checksum`` (bucketed checksums on both sides, compare, then
re-sync only the dirty chunks). These operators are the Spark-native
form of that workflow, sized for 100 TB:

* :func:`table_checksum` — per-bucket ``(count, xor-of-row-digests)``:
  one scan, one partial-aggregable shuffle whose output is ``n_buckets``
  rows, however big the table is. XOR is the aggregation on purpose —
  commutative/associative (order-independent under Spark's unordered
  aggregation), and equal multisets of digests ⇒ equal checksums.
* :func:`checksum_compare` — join the two tiny checksum tables → which
  buckets disagree. 100 TB of comparison becomes a ``n_buckets``-row
  join.
* :func:`snapshot_diff` — the row-level change set (added / removed /
  changed) via a single co-partitioned full-outer join on the key,
  comparing row digests. At scale you FIRST run the checksum pass and
  restrict the diff to dirty buckets (``bucket_filter``), so the
  expensive join touches only the chunks that can possibly differ.

Digest parity: the row digest is md5 over a '|'-joined string built
ONLY from engine-stable serializations (integers, strings, epoch
micros, prices as half-up-rounded cents) — doubles and raw timestamps
never reach the hash, per the engine's output-stability rules. The
DuckDB oracle parses md5 hex chunks with an integer nibble fold
(:func:`hex_chunk_sql`) because DuckDB lacks ``conv``; both sides take
two disjoint 32-bit chunks, so a bucket collision needs a 64-bit
coincidence *within* one bucket.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: hex chunk offsets (1-based) into the 32-char md5 — two disjoint 32-bit
#: words; chunk 3 (17..24) leaves room for MinHash's chunks 1/2 seeds.
CHUNK_OFFSETS = (1, 17)

_HEX = "0123456789abcdef"


def hex_chunk_sql(expr: str, start: int) -> str:
    """DuckDB SQL: parse 8 hex chars of ``expr`` starting at 1-based
    ``start`` into a BIGINT via an integer nibble fold (no float ``**``,
    which loses bits past 2^53)."""
    terms = " + ".join(
        f"(strpos('{_HEX}', substr({expr}, {start + i}, 1)) - 1) * {16 ** (7 - i)}"
        for i in range(8)
    )
    return f"CAST({terms} AS BIGINT)"


def hex_chunk(col: Column, start: int) -> Column:
    """Spark: same 8-hex-char chunk as a long (base-16 ``conv``)."""
    return F.conv(F.substring(col, start, 8), 16, 10).cast("long")


def row_digest(*cols: Column) -> Column:
    """md5 over a '|'-joined engine-stable serialization. Callers must
    pass pre-stabilized columns (ints/strings/epoch-micros/cents) —
    ``concat_ws`` skips NULLs identically in both engines, but a NULL is
    then indistinguishable from an absent field, so callers coalesce
    nullable fields to a sentinel first."""
    return F.md5(F.concat_ws("|", *cols))


def table_checksum(
    df: DataFrame, key: Column, digest: Column, *, n_buckets: int = 64
) -> DataFrame:
    """Per-bucket ``(bucket, n, x1, x2)``: row count and XOR of two 32-bit
    digest chunks. One scan, one agg shuffle, ``n_buckets`` output rows."""
    chunks = [hex_chunk(digest, off) for off in CHUNK_OFFSETS]
    return (
        df.select(
            F.pmod(key, F.lit(n_buckets)).cast("long").alias("bucket"),
            chunks[0].alias("__c1"),
            chunks[1].alias("__c2"),
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.expr("bit_xor(__c1)").alias("x1"),
            F.expr("bit_xor(__c2)").alias("x2"),
        )
    )


def checksum_compare(src_sums: DataFrame, tgt_sums: DataFrame) -> DataFrame:
    """Outer-join the two checksum tables → per-bucket verdict. Absent
    buckets count 0 with a 0 XOR (the identity), so a bucket that exists
    on one side only reports as dirty, not as a null surprise."""
    s = src_sums.select(
        "bucket",
        F.col("n").alias("n_src"),
        F.col("x1").alias("sx1"),
        F.col("x2").alias("sx2"),
    )
    t = tgt_sums.select(
        "bucket",
        F.col("n").alias("n_tgt"),
        F.col("x1").alias("tx1"),
        F.col("x2").alias("tx2"),
    )
    z = F.lit(0).cast("long")
    j = s.join(t, on="bucket", how="full_outer")
    n_src = F.coalesce("n_src", z)
    n_tgt = F.coalesce("n_tgt", z)
    match = (
        (n_src == n_tgt)
        & F.coalesce("sx1", z).eqNullSafe(F.coalesce("tx1", z))
        & F.coalesce("sx2", z).eqNullSafe(F.coalesce("tx2", z))
    )
    return j.select(
        "bucket",
        n_src.alias("n_src"),
        n_tgt.alias("n_tgt"),
        match.alias("match"),
    )


def snapshot_diff(
    src: DataFrame,
    tgt: DataFrame,
    key_col: str,
    digest: Column,
    *,
    bucket_filter: DataFrame | None = None,
    n_buckets: int = 64,
) -> DataFrame:
    """Row-level change set between two snapshots keyed by ``key_col``:
    ``(key, change)`` with change ∈ {'added','removed','changed'} —
    unchanged rows are NOT emitted (at 100 TB the diff output is the
    size of the damage, not of the table).

    One full-outer sort-merge join on the key; both sides carry only
    (key, digest), so the shuffle is two slim columns per side. With
    ``bucket_filter`` (a ``bucket`` DataFrame from
    :func:`checksum_compare`, typically ``.filter(~match)``), both scans
    are pre-restricted by a broadcast semi-join on the bucket — the
    checksum pass turns a table-sized diff into a dirty-chunk-sized one.
    """
    def slim(df: DataFrame) -> DataFrame:
        out = df.select(F.col(key_col).alias("key"), digest.alias("dg"))
        if bucket_filter is not None:
            out = out.join(
                F.broadcast(  # bounded: <= CHECKSUM_BUCKETS dirty-bucket ids
                    bucket_filter.select(
                        F.col("bucket").cast("long").alias("__b")
                    )
                ),
                on=F.pmod(F.col("key"), F.lit(n_buckets)).cast("long")
                == F.col("__b"),
                how="left_semi",
            )
        return out

    s = slim(src).withColumnRenamed("dg", "sdg")
    t = slim(tgt).withColumnRenamed("dg", "tdg")
    j = s.join(t, on="key", how="full_outer")
    change = (
        F.when(F.col("sdg").isNull(), F.lit("added"))
        .when(F.col("tdg").isNull(), F.lit("removed"))
        .when(F.col("sdg") != F.col("tdg"), F.lit("changed"))
    )
    return (
        j.select("key", change.alias("change"))
        .filter(F.col("change").isNotNull())
    )


def apply_changes(
    tgt: DataFrame,
    src: DataFrame,
    diff: DataFrame,
    key_col: str,
) -> DataFrame:
    """Repair a damaged migration target from a :func:`snapshot_diff`
    change set — the re-sync step of the pt-table-checksum workflow
    (checksum → localize → diff → **apply** → re-verify):

    * ``added``   (spurious in tgt)  → delete the target row;
    * ``removed`` (missing from tgt) → insert the source row;
    * ``changed`` (digest mismatch)  → replace with the source row.

    The result is column-identical to ``tgt``'s schema and row-identical
    to ``src`` (exactness pinned in tests/test_reconcile_repair.py).

    Scale shape: two key-equi joins against a change set that is
    damage-sized, not table-sized — an anti join drops deleted/stale
    target rows, a semi join pulls replacement rows from the source, and
    no shuffle side ever carries more than (key, change) beyond the rows
    actually touched. AQE turns both into broadcast joins whenever the
    damage fits, which at 100 TB it should (a diff that does NOT fit the
    broadcast threshold is the signal to re-run the copy, not repair)."""
    bad_keys = diff.select(F.col("key").alias(key_col))
    pull_keys = diff.filter(F.col("change").isin("removed", "changed")).select(
        F.col("key").alias(key_col)
    )
    kept = tgt.join(bad_keys, on=key_col, how="left_anti")
    pulled = src.join(pull_keys, on=key_col, how="left_semi")
    return kept.unionByName(pulled.select(*kept.columns))
