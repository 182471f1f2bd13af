"""Z-order (Morton-curve) clustered parquet writes for MULTI-dimensional
data skipping.

``write_clustered_parquet`` (OP-07) gives perfect min/max file skipping on
ONE key prefix — the Postgres ``CLUSTER`` analog. A 100 TB table queried
by several independent predicates (``user_id = ?``, ``value BETWEEN``,
``ts >= ?``) can't be sorted by all of them at once: linear order on key A
scatters key B across every file. The standard fix (Delta/Iceberg
``OPTIMIZE ZORDER BY``) is to sort by an interleaved-bit Morton code so
file boundaries become axis-aligned boxes in key space, and EVERY z-order
dimension gets tight per-file min/max ranges → the reader prunes files on
any of them.

Everything here is JVM-side whole-stage-codegen arithmetic:

1. one cheap stats pass (min/max per dimension — at 100 TB these come
   from the table's existing statistics instead),
2. per-row scaling to ``bits``-bit integers (fixed shift/multiply),
3. bit interleave as a static unrolled ``shiftleft``/``bitwiseOR``
   expression tree (no UDF, no Python),
4. ``repartitionByRange`` + ``sortWithinPartitions`` on the code —
   exactly one shuffle, identical cost shape to the OP-07 write.

Effectiveness is ASSERTED, not assumed: tests/test_zorder.py reads the
written files' parquet footer statistics with pyarrow and checks that a
2-D box predicate overlaps a small fraction of files under z-order but
nearly all files under single-key order.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: bits per dimension in the Morton code. 16 bits ⇒ 65536 buckets per
#: dimension, far finer than any realistic file count; two dimensions fill
#: 32 of a long's 63 usable bits (4 dims would still fit).
ZORDER_BITS = 16


def _scaled(col: Column, cmin: Column, cmax: Column, bits: int) -> Column:
    """Map a numeric column into [0, 2^bits) by min/max scaling. Constant
    columns (max == min) and NULLs map to bucket 0 — NULLs get their own
    bottom corner of the curve instead of silently landing in the TOP
    bucket (``least`` skips NULL args, so an unguarded NULL would sort as
    the maximum and poison that file's min/max range). Done in double
    then floored — the ordering, not the exact bucket, is what z-ordering
    needs."""
    span = cmax - cmin
    frac = F.when(
        col.isNotNull() & (span > 0), (col.cast("double") - cmin) / span
    ).otherwise(F.lit(0.0))
    # clamp the max value into the top bucket instead of 2^bits
    return F.least(
        F.floor(frac * (1 << bits)).cast("long"), F.lit((1 << bits) - 1)
    )


def _interleave(scaled: list[Column], bits: int) -> Column:
    """Morton code: bit b of dimension d lands at position b*ndims + d.
    Unrolled into a static shift/or tree — stays inside codegen."""
    ndims = len(scaled)
    code = F.lit(0).cast("long")
    for d, col in enumerate(scaled):
        for b in range(bits):
            code = code.bitwiseOR(
                F.shiftleft(F.shiftright(col, b).bitwiseAND(F.lit(1)), b * ndims + d)
            )
    return code


def zorder_code(df: DataFrame, cols: list[str], *, bits: int = ZORDER_BITS) -> Column:
    """The Morton code column for ``cols`` (2+ numeric dimensions), using
    a one-pass min/max stats aggregate for scaling. The stats row is a
    1-row collect — the write-time analog of reading table statistics."""
    if len(cols) < 2:
        raise ValueError("z-ordering needs >= 2 dimensions; use "
                         "write_clustered_parquet for a single key")
    stats = df.agg(
        *[F.min(F.col(c).cast("double")).alias(f"mn_{c}") for c in cols],
        *[F.max(F.col(c).cast("double")).alias(f"mx_{c}") for c in cols],
    ).collect()[0]
    scaled = [
        _scaled(F.col(c), F.lit(stats[f"mn_{c}"]), F.lit(stats[f"mx_{c}"]), bits)
        for c in cols
    ]
    return _interleave(scaled, bits)


def write_zordered_parquet(
    df: DataFrame,
    path: str,
    cols: list[str],
    *,
    num_files: int,
    bits: int = ZORDER_BITS,
) -> None:
    """Rewrite ``df`` as ``num_files`` parquet files clustered on the
    Morton curve over ``cols``. One range shuffle on the code (range, not
    hash, so file i's code interval precedes file i+1's — the curve is cut
    into contiguous segments = axis-aligned boxes), sorted within files so
    row-group stats are tight too. The helper column never reaches disk."""
    code = zorder_code(df, cols, bits=bits)
    (
        df.withColumn("__z", code)
        .repartitionByRange(num_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )
