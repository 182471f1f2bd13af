"""Join operators (SURVEY.md §2.3, OP-15..17) plus the general surface.

The reference hand-places its joins: the 3-way equi-join ships to MariaDB
(queries.mjs:8-11), the playlists lookup is a driver-side JS ``Map``
build/probe (index.mjs:96-110), the tag dictionary a second ``Map``
(index.mjs:41-45). Here every join is declarative; Catalyst picks
broadcast vs shuffle, and explicit ``broadcast()`` hints mark the build
sides we KNOW are small (a dim filtered to one title) so the plan never
degrades to a sort-merge shuffle of the big side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def three_way_equi_join(
    fact: DataFrame,
    bridge: DataFrame,
    dim: DataFrame,
    fact_key: str,
    bridge_fact_key: str,
    bridge_dim_key: str,
    dim_key: str,
) -> DataFrame:
    """OP-15: ``videos ⋈ taggable_taggables ⋈ taggable_tags``
    (queries.mjs:8-11) as a declarative 2-hop star join.

    Catalyst broadcast-selects / reorders; with AQE a skewed bridge key is
    split at runtime. At 100 TB: bridge and fact co-partition on the fact
    key after the first shuffle, and the dim side broadcasts when under the
    threshold.
    """
    j1 = fact.join(bridge, fact[fact_key] == bridge[bridge_fact_key], "inner")
    return j1.join(dim, bridge[bridge_dim_key] == dim[dim_key], "inner")


def broadcast_lookup(
    probe: DataFrame,
    build: DataFrame,
    on: str | list[str],
    how: str = "inner",
) -> DataFrame:
    """OP-16: the JS ``Map(user_id→playlist_id)`` build/probe
    (index.mjs:96-110) as an explicit broadcast hash join.

    Choose ``how`` for the miss semantics: the reference's ``Map.get`` miss
    leaves the looked-up value undefined but KEEPS the row (pg-promise
    renders undefined as NULL, index.mjs:103-110) — that is ``how='left'``
    (what pipeline.fill_playlist_video uses). ``how='inner'`` drops probe
    rows with no build match. The build side must be pre-filtered/projected
    by the caller (title filter, index.mjs:97) so what broadcasts is
    minimal.
    """
    return probe.join(F.broadcast(build), on=on, how=how)  # bounded: OP-16 contract — caller passes a broadcast-fit dimension


def dict_apply_to_array(
    df: DataFrame,
    array_col: str,
    dictionary: DataFrame,
    key_col: str,
    value_col: str,
    row_key: str,
) -> DataFrame:
    """OP-17: rewrite every element of ``array_col`` through a dictionary
    (tag → normalized tag, index.mjs:41-45), keeping all other columns.

    Strategy: explode → broadcast-join the dictionary → regroup with
    ``collect_list``. This is the scale-safe path: the dictionary may exceed
    driver memory, so no ``collect()``-built literal map; when it is small
    Catalyst broadcasts it anyway. Element order of the rebuilt array follows
    original element position (explicit ``posexplode`` + sort) so results are
    deterministic.

    Null/empty/miss contract (pinned in tests/test_dict_apply.py): a NULL
    input array stays NULL and an empty array stays empty — the
    ``posexplode_outer`` placeholder row (NULL pos) is filtered before the
    regroup so neither comes back as ``[null]``; a dictionary MISS maps the
    element to NULL inside the array (``Map.get`` → undefined parity,
    index.mjs:44).
    """
    other_cols = [c for c in df.columns if c != array_col]
    exploded = df.select(
        *other_cols, F.posexplode_outer(array_col).alias("__pos", "__elem")
    ).filter(F.col("__pos").isNotNull())
    mapped = exploded.join(
        F.broadcast(dictionary.select(F.col(key_col).alias("__elem"), F.col(value_col).alias("__mapped"))),  # bounded: OP-17 contract — enum-sized dictionary
        on="__elem",
        how="left",
    )
    regrouped = (
        mapped.groupBy(row_key)
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("__pos"), F.col("__mapped")))
            ).alias("__pairs")
        )
        .select(
            row_key,
            F.transform(F.col("__pairs"), lambda p: p["__mapped"]).alias("__rebuilt"),
        )
    )
    value_type = regrouped.schema["__rebuilt"].dataType
    # row_key contract: unique per row (the reference keys on videos.id).
    # A violated contract MERGES every same-key row's elements into one
    # rebuilt array and hands it to all of them — corrupt output with no
    # error. The rebuilt length always equals the input length for a
    # well-keyed row, so the per-row guard below turns the corruption into
    # an immediate raise instead (review r5); a single NULL-keyed row is
    # handled correctly via the null-safe join-back.
    guard = (
        f"CASE WHEN size(__rebuilt) = size({array_col}) THEN __rebuilt "
        f"ELSE cast(raise_error(concat('dict_apply_to_array: row_key "
        f"\\'{row_key}\\' is not unique (rebuilt ', cast(size(__rebuilt) "
        f"as string), ' elements for an array of ', "
        f"cast(size({array_col}) as string), ')')) "
        f"as {value_type.simpleString()}) END"
    )
    rebuilt = (
        F.when(F.col(array_col).isNull(), F.lit(None).cast(value_type))
        .when(F.size(array_col) == 0, F.array().cast(value_type))
        .otherwise(F.expr(guard))
    )
    return (
        df.join(
            regrouped.withColumnRenamed(row_key, "__rk"),
            on=F.col(row_key).eqNullSafe(F.col("__rk")),
            how="left",
        )
        .withColumn(array_col, rebuilt)
        .drop("__rebuilt", "__rk")
    )


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
    suffix: str = "_asof",
) -> DataFrame:
    """As-of join (backward): each left row gets the LATEST right row with
    ``right_ts <= left_ts`` for the same key, or NULLs if none exists
    (left-join semantics). Not in the reference (SURVEY §2.3 notes the gap);
    standard in time-series engines.

    Scale strategy: NOT an inequality join (those explode into O(n·m)
    candidate pairs or a nested-loop). Both sides union into one stream,
    shuffle ONCE on the key, sort by (ts, side) within partitions, and a
    running ``last(ignorenulls)`` window carries the most recent right
    payload forward into each left row. Cost: one shuffle + one sort,
    identical to a groupBy over the combined data — at 100 TB this is the
    difference between feasible and not. Right rows at exactly ``left_ts``
    count (side orders right before left on ties → ``<=``).
    """
    payload = F.struct(*[F.col(c).alias(c) for c in right_cols])
    payload_dt = right.select(payload.alias("__r")).schema["__r"].dataType
    l = left.select(
        *key_cols,
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__l"),
        F.lit(None).cast(payload_dt).alias("__r"),
    )
    # a right row with UNKNOWN ts can never satisfy `right_ts <= left_ts`;
    # unfiltered it would sort FIRST (NULLs-first ordering) and its payload
    # would carry forward into every left row (review r5)
    r = right.filter(F.col(right_ts).isNotNull()).select(
        *key_cols,
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        F.lit(None).cast(l.schema["__l"].dataType).alias("__l"),
        payload.alias("__r"),
    )
    w = (
        Window.partitionBy(*key_cols)
        .orderBy("__ts", "__side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = l.unionByName(r).withColumn(
        "__match", F.last("__r", ignorenulls=True).over(w)
    )
    out_left = [F.col(f"__l.{c}").alias(c) for c in left.columns]
    out_right = [F.col(f"__match.{c}").alias(f"{c}{suffix}") for c in right_cols]
    return matched.filter(F.col("__side") == 1).select(*out_left, *out_right)


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    left_ts: str,
    right_ts: str,
    lower_s: float,
    upper_s: float,
) -> DataFrame:
    """Range/interval join: pairs where
    ``left_ts + lower_s <= right_ts <= left_ts + upper_s`` on the same key.

    Scale strategy: bucketize time with bucket width = interval length, so
    every qualifying pair shares one of TWO adjacent buckets; the left side
    emits both bucket keys (a 2× dup, not O(range)), the join is a plain
    equi-join on (key, bucket), and the exact range predicate filters the
    few off-by-one candidates. Turns an inequality join Catalyst would run
    as nested-loop into one shuffle join.
    """
    lo_us = int(lower_s * 1_000_000)
    hi_us = int(upper_s * 1_000_000)
    # width from the ALREADY-CONVERTED integer bounds: computing it as
    # int((upper_s-lower_s)*1e6) can disagree with hi_us-lo_us by 1µs under
    # float rounding, and width < hi_us-lo_us breaks the two-adjacent-buckets
    # coverage invariant.
    width_us = max(hi_us - lo_us, 1)

    def _floor_bucket(us_col):
        # true FLOOR division on longs: pmod is non-negative, so subtracting
        # it yields an exact multiple of width; plain cast('long') truncates
        # toward zero and mis-buckets negative values (pre-1970 timestamps,
        # or negative l_us+lo_us), silently dropping qualifying pairs. The
        # division runs in DECIMAL, not double: a double quotient goes
        # inexact past 2^53 µs (~year 2255) and could break the
        # two-adjacent-buckets invariant by one.
        exact_multiple = (us_col - F.pmod(us_col, F.lit(width_us))).cast("decimal(38,0)")
        return (exact_multiple / F.lit(width_us).cast("decimal(38,0)")).cast("long")

    l_us = F.unix_micros(F.col(left_ts))
    r_us = F.unix_micros(F.col(right_ts))
    l = left.withColumn(
        "__bucket",
        F.explode(
            F.array(
                _floor_bucket(l_us + lo_us),
                _floor_bucket(l_us + lo_us) + 1,
            )
        ),
    )
    r = right.withColumn("__bucket", _floor_bucket(r_us))
    lo_bound = F.unix_micros(F.col(left_ts)) + lo_us
    hi_bound = F.unix_micros(F.col(left_ts)) + hi_us
    return (
        l.join(r, [*key_cols, "__bucket"])
        .filter(
            (F.unix_micros(F.col(right_ts)) >= lo_bound)
            & (F.unix_micros(F.col(right_ts)) <= hi_bound)
        )
        .drop("__bucket")
    )
