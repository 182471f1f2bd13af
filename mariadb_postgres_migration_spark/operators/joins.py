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

from pyspark.sql import DataFrame
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

    ``how='inner'`` reproduces the reference's silent row drop when the map
    lookup misses (``Map.get`` → undefined, index.mjs:105). The build side
    must be pre-filtered/projected by the caller (title filter,
    index.mjs:97) so what broadcasts is minimal.
    """
    return probe.join(F.broadcast(build), on=on, how=how)


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
    """
    other_cols = [c for c in df.columns if c != array_col]
    exploded = df.select(*other_cols, F.posexplode_outer(array_col).alias("__pos", "__elem"))
    mapped = exploded.join(
        F.broadcast(dictionary.select(F.col(key_col).alias("__elem"), F.col(value_col).alias("__mapped"))),
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
            F.transform(F.col("__pairs"), lambda p: p["__mapped"]).alias(array_col),
        )
    )
    return df.drop(array_col).join(regrouped, on=row_key, how="left")
