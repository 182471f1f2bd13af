"""OP-20: temporal-skip backref resolution (comment threading) — the
reference's most intricate operator (/root/reference/src/index.mjs:62-78).

Semantics (SURVEY.md §2.5): within each ``partition_col`` group ordered by
``order_col``, a row whose ``content`` starts with N carets gets
``response_to`` = id of the Nth preceding row that was *still alive when this
row was created* — a predecessor is skipped iff its ``deleted_at`` is
non-null AND strictly less than this row's ``created_at``
(strict ``>`` on the referrer side, index.mjs:71-72: a predecessor deleted at
exactly ``created_at`` is NOT skipped). If fewer than N alive predecessors
exist in the partition, ``response_to`` stays NULL (the JS walk breaks at the
partition edge, index.mjs:68).

Two implementations:

* :func:`resolve_backrefs` — pure built-ins: a window ``collect_list`` of
  (id, deleted_at) structs over the preceding frame, then higher-order
  ``filter``/``reverse``/``try_element_at``. No Python in the loop; whole
  plan stays JVM-side. ``max_lookback`` bounds the frame: the window list is
  O(frame) memory per row, so unbounded is O(p²) state on a p-row partition —
  fine for real comment threads (p ~ thousands), pathological at 100 TB if a
  single key owns millions of rows. With a bound L the cost is O(p·L) and the
  semantics become "Nth alive predecessor among the last L" (exact whenever
  N + #skipped ≤ L).

* :func:`resolve_backrefs_grouped` — exact-unbounded semantics at O(group)
  memory via a streaming ``mapInPandas`` over key-clustered, key-sorted
  partitions: one sequential pass per group, the direct distributed analog
  of the reference's single-threaded walk. Use when unbounded fidelity
  matters and per-key row counts exceed what the window frame should
  hold.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import caret_count


def resolve_backrefs(
    df: DataFrame,
    partition_col: str = "video_id",
    order_col: str = "id",
    content_col: str = "content",
    created_col: str = "created_at",
    deleted_col: str = "deleted_at",
    out_col: str = "response_to",
    max_lookback: int | None = None,
) -> DataFrame:
    """Window + higher-order-function formulation (no UDF)."""
    w = Window.partitionBy(partition_col).orderBy(order_col)
    frame = (
        w.rowsBetween(Window.unboundedPreceding, -1)
        if max_lookback is None
        else w.rowsBetween(-max_lookback, -1)
    )
    prev = F.collect_list(
        F.struct(F.col(order_col).alias("bid"), F.col(deleted_col).alias("bdel"))
    ).over(frame)
    n = caret_count(F.col(content_col))
    # keep a predecessor unless deleted strictly before this row's creation;
    # an unknown (NULL) creation time KEEPS the predecessor — deletion-
    # before-creation cannot be established, and the reference's JS
    # comparison (null > x → false) agrees. Without the explicit NULL arm,
    # `bdel >= NULL` is NULL and the filter would silently SKIP, diverging
    # from the Python/grouped tiers (review r5).
    alive = F.filter(
        prev,
        lambda p: p["bdel"].isNull()
        | F.col(created_col).isNull()
        | (p["bdel"] >= F.col(created_col)),
    )
    resolved = F.when(
        n >= 1, F.try_element_at(F.reverse(alive), n.cast("int"))["bid"]
    ).otherwise(F.lit(None).cast("long"))
    return df.withColumn(out_col, resolved)


def resolve_backrefs_grouped(
    df: DataFrame,
    partition_col: str = "video_id",
    order_col: str = "id",
    content_col: str = "content",
    created_col: str = "created_at",
    deleted_col: str = "deleted_at",
    out_col: str = "response_to",
) -> DataFrame:
    """Exact-unbounded semantics via one Arrow-batched pass per group.

    Shuffles by ``partition_col``, sorts each partition by the key then
    ``order_col``, and streams contiguous groups through
    :func:`_walk_pandas` via ONE ``mapInPandas`` — O(group) walk state, no
    quadratic window state, and one Python invocation per Arrow batch
    rather than per group (the many-small-groups cost of
    ``groupBy().applyInPandas``). A pathologically hot key is the same
    bottleneck the reference's global sequential walk had, minus every
    other key running concurrently.
    """
    import pandas as pd  # local import: executors need it, driver may not

    from pyspark.sql.types import LongType, StructField, StructType

    # build a FRESH StructType: df.schema returns the DataFrame's cached
    # schema object and StructType.add mutates in place — appending to it
    # would corrupt df's own schema and break resolution downstream
    out_schema = StructType(list(df.schema.fields) + [StructField(out_col, LongType())])
    cols = list(df.columns)

    def _walk_pandas(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values(order_col).reset_index(drop=True)
        pdf[out_col] = resolve_backrefs_py(
            pdf[order_col].tolist(),
            pdf[content_col].tolist(),
            pdf[created_col].tolist(),
            pdf[deleted_col].tolist(),
        )
        pdf[out_col] = pdf[out_col].astype("Int64")
        return pdf[cols + [out_col]]

    # Many-small-groups form: groupBy().applyInPandas pays one Python
    # invocation PER GROUP — with thousands of small video_id groups that
    # fixed cost dominates the walk itself (measured ~2.4s at sf0.1).
    # Instead, co-locate and order groups with repartition(key) +
    # sortWithinPartitions(key, order) and stream them through ONE
    # mapInPandas: groups are contiguous in the partition stream, so each
    # Arrow batch is split on group boundaries and an incomplete trailing
    # group is carried into the next batch — one Python invocation per
    # ~10k-row batch, still O(group) walk state, exact same semantics.
    def _same_key(a, b) -> bool:
        # null-aware: Spark co-locates and sorts NULL keys together, but
        # NaN != NaN would make every null-keyed row a chunk boundary
        if pd.isna(a) and pd.isna(b):
            return True
        return a == b

    def _walk_chunk(chunk: "pd.DataFrame") -> "pd.DataFrame":
        # dropna=False: a NULL partition key is one group (as in Spark's
        # groupBy), NOT rows to silently discard
        return pd.concat(
            [
                _walk_pandas(g)
                for _, g in chunk.groupby(partition_col, sort=False, dropna=False)
            ],
            ignore_index=True,
        )

    def _walk_stream(batches):
        carry = None
        for pdf in batches:
            if carry is not None and len(carry):
                pdf = pd.concat([carry, pdf], ignore_index=True)
            if not len(pdf):
                continue
            keys = pdf[partition_col]
            cut = len(pdf) - 1
            while cut > 0 and _same_key(keys.iloc[cut - 1], keys.iloc[-1]):
                cut -= 1
            head, carry = pdf.iloc[:cut], pdf.iloc[cut:]
            if len(head):
                yield _walk_chunk(head)
        if carry is not None and len(carry):
            yield _walk_chunk(carry)

    parts = df.repartition(partition_col).sortWithinPartitions(
        partition_col, order_col
    )
    return parts.mapInPandas(_walk_stream, schema=out_schema)


def resolve_backrefs_scaled(
    df: DataFrame,
    partition_col: str = "video_id",
    order_col: str = "id",
    content_col: str = "content",
    created_col: str = "created_at",
    deleted_col: str = "deleted_at",
    out_col: str = "response_to",
    max_lookback: int | None = None,
) -> DataFrame:
    """The 100 TB default tier for OP-20 (SURVEY §4: ``video_id`` is
    zipf-skewed, so a hot key can own millions of rows).

    * ``max_lookback=None`` (default): the grouped ``applyInPandas`` walk —
      exact unbounded semantics at O(group) memory. Bounded state by
      construction: per group the walk holds one Arrow batch, never the
      O(p²) accumulated window frames of the ``collect_list`` tier.
    * ``max_lookback=L``: the JVM-only window tier with a bounded frame —
      O(p·L) work/state, exact whenever N + #skipped-deleted ≤ L. Choose
      this when Python workers are unavailable and a documented bound is
      acceptable.

    All three tiers (this, :func:`resolve_backrefs` unbounded, and the
    pure-Python reference walk) are property-tested equal on zipf and
    single-hot-key fixtures (tests/test_threading_property.py).
    """
    if max_lookback is not None:
        return resolve_backrefs(
            df, partition_col, order_col, content_col, created_col, deleted_col,
            out_col, max_lookback=max_lookback,
        )
    return resolve_backrefs_grouped(
        df, partition_col, order_col, content_col, created_col, deleted_col, out_col
    )


def resolve_backrefs_py(ids, contents, createds, deleteds):
    """Single-partition reference semantics in pure Python.

    Independent re-implementation of the walk specified by SURVEY.md §2.5
    (behavior of index.mjs:62-78), used by :func:`resolve_backrefs_grouped`
    per group and by the property tests as the ground truth: for row i with
    N leading carets, scan predecessors j = i-1, i-2, …; skip j if
    deleted_at[j] is set and created_at[i] > deleted_at[j]; the Nth
    non-skipped j supplies its id; running out of predecessors leaves None.
    An unknown (None/NaT) created_at[i] keeps every predecessor — the
    same null semantics as the JVM tier's explicit NULL arm.
    """
    out = []
    for i, content in enumerate(contents):
        n = 0
        if content:
            while n < len(content) and content[n] == "^":
                n += 1
        if n == 0:
            out.append(None)
            continue
        remaining, target = n, None
        ci = createds[i]
        for j in range(i - 1, -1, -1):
            dj = deleteds[j]
            # None guard first: `None > dj` raises on plain datetimes (and
            # pandas NaT comparisons are False) — unknown creation keeps j
            if dj is not None and ci is not None and ci > dj:
                continue  # deleted before row i existed: invisible to it
            remaining -= 1
            if remaining == 0:
                target = ids[j]
                break
        out.append(target)
    return out
