"""OP-32: the full migration dataflow DAG, Spark-first.

Reproduces the reference's end-to-end pipeline (/root/reference/src/
index.mjs:134-168) as pure DataFrame transformations: every stage below maps
to one of the reference's copy functions, but the execution strategy is
Catalyst's, not hand-scheduled row loops. Phase ordering in the reference
exists only for sink FK constraints (users before videos before comments);
with parquet/lakehouse sinks the stages are independent jobs the Spark
scheduler may run concurrently — ``migrate`` just returns all sink
DataFrames and lets the caller write them (the driver-side analog of
``Promise.all``, index.mjs:137-143).

Per-stage references:

* users       — index.mjs:21-28   (placeholder password, JSON categories)
* videos/tags — index.mjs:31-56   (flagship 3-way join + GROUP_CONCAT +
                normalize dictionary + truncation + conflict-skip)
* comments    — index.mjs:59-80   (sorted scan + caret backref walk)
* messages    — index.mjs:83-87   (rename projection)
* playlists   — index.mjs:90-117  (broadcast title-filtered lookup join)
* sequences   — index.mjs:120-126 (max(id)+1 — returned, not executed:
                parquet sinks have no sequences)

The w0bm-shaped fixture generator for this DAG lives in
``tests/w0bm_fixtures.py``; the golden test is ``tests/test_migration.py``.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .functions.text import normalize_text, truncate30
from .operators.aggregates import distinct_sorted_set
from .operators.columnset import COLUMN_SETS, apply_column_set
from .operators.joins import broadcast_lookup
from .operators.threading import resolve_backrefs


@dataclass(frozen=True)
class MigrationConfig:
    """The reference's config.json knobs that affect data (config.json:14-15)."""

    password_placeholder: str = "not set yet"
    tag_separator: str = ",,,"  # only used at the text-wire parity layer
    favorites_title: str = "Favorites"
    uploads_title: str = "Uploads"


def migrate_users(users: DataFrame, cfg: MigrationConfig) -> DataFrame:
    """users → sink users: constant password substitution (OP-09,
    index.mjs:24), JSON categories → filters array (OP-24, index.mjs:25),
    banend → banned with zero-date repair (OP-14, column_sets.mjs:33-36)."""
    return apply_column_set(
        users.withColumn("password", F.lit(cfg.password_placeholder)),
        COLUMN_SETS["users"],
    )


def migrate_videos_and_tags(
    videos: DataFrame, taggables: DataFrame, tags: DataFrame
) -> tuple[DataFrame, DataFrame]:
    """The flagship stage (entry point B, SURVEY §3): returns
    (videos_out, tags_out).

    The reference round-trips tag sets through a separator-joined string
    because its rows cross a text wire (queries.mjs:8-11 → index.mjs:41-43);
    the engine keeps the array end-to-end: 3-way inner join (OP-15, videos
    without tags drop — comma-join semantics), per-video distinct sorted tag
    array (OP-18), normalization via the vectorized pandas UDF (OP-31)
    applied to the DISTINCT tag dictionary (not per occurrence), then a
    broadcast dictionary join back onto the exploded bridge (OP-17).

    tags_out is the normalize dictionary itself, both columns truncated to
    30 chars (OP-22, index.mjs:50-53) and deduped — the engine form of
    ``ON CONFLICT DO NOTHING`` (OP-05, index.mjs:55).
    """
    # The reference's normalize dictionary is built from the tags that come
    # back from videos_with_tags (index.mjs:36-38) — i.e. only tags attached
    # to ≥1 video. Restrict with semi joins, then normalize ONCE per
    # distinct tag name: at 100 TB the bridge has billions of rows but the
    # dictionary is ~1e6, so the pandas UDF touches only the dictionary.
    used_bridge = taggables.join(
        videos.select(F.col("id").alias("taggable_id")), "taggable_id", "semi"
    )
    dictionary = tags.join(used_bridge, "tag_id", "semi").select(
        "tag_id", "name"
    ).withColumn("normalized", normalize_text(F.col("name")))
    video_tags = (
        videos.join(taggables, videos["id"] == taggables["taggable_id"], "inner")
        .join(dictionary, taggables["tag_id"] == dictionary["tag_id"], "inner")
        .groupBy(videos["id"])
        .agg(distinct_sorted_set("normalized").alias("tags"))
    )
    videos_out = apply_column_set(
        videos.drop("user_id").join(video_tags, "id", "inner"),
        COLUMN_SETS["videos"],
    )
    tags_out = (
        dictionary.select(
            truncate30(F.col("normalized")).alias("normalized"),
            truncate30(F.col("name")).alias("tag"),
        )
        .dropDuplicates(["normalized", "tag"])
    )
    return videos_out, tags_out


def migrate_comments(comments: DataFrame) -> DataFrame:
    """comments → sink comments with OP-20 backref threading. The source
    ORDER BY video_id, id (queries.mjs:3) is NOT reproduced — the window
    spec inside resolve_backrefs carries the ordering requirement."""
    resolved = resolve_backrefs(
        comments,
        partition_col="video_id",
        order_col="id",
        content_col="content",
        created_col="created_at",
        deleted_col="deleted_at",
        out_col="response_to",
    )
    return apply_column_set(resolved, COLUMN_SETS["comments"])


def migrate_messages(messages: DataFrame) -> DataFrame:
    """messages → sink messages: reserved-word renames from/to/subject →
    from_user/to_user/title (OP-08, column_sets.mjs:73-91)."""
    return apply_column_set(messages, COLUMN_SETS["messages"])


def fill_playlist_video(
    rows: DataFrame,
    playlists: DataFrame,
    title: str,
) -> DataFrame:
    """One ``fill_userplaylists_by_title`` instance (index.mjs:94-111):
    title-filtered playlists broadcast as the build side (OP-16/OP-10);
    probe rows keep their video id via ``coalesce(id, video_id)`` (OP-12,
    index.mjs:106); created_at strings repaired (OP-14, column_sets.mjs:96).

    Miss semantics: a user without a matching playlist KEEPS their row with
    NULL playlist_id — the reference's ``Map.get`` miss leaves
    ``playlist_id`` undefined and pg-promise renders undefined as NULL in
    the INSERT (index.mjs:103-110), so the observable sink row exists with
    NULL; hence a LEFT join here (the sink schema marks playlist_id
    nullable). r1 shipped an inner join with a docstring claiming the drop
    was reference parity — that claim was wrong (ADVICE r1)."""
    build = (
        playlists.filter(F.col("title") == F.lit(title))
        .select(
            F.col("user_id").try_cast("long").alias("user_id"),
            F.col("id").try_cast("long").alias("playlist_id"),
        )
        # ONE playlist per user: the reference's Map.set overwrites, so a
        # user with duplicate same-title playlists contributes a single
        # entry (its pick is insertion-order-nondeterministic in JS; max id
        # is the deterministic stand-in). Without this, each probe row
        # fans out once per duplicate playlist (review r5).
        .groupBy("user_id")
        .agg(F.max("playlist_id").alias("playlist_id"))
    )
    probe_cols = rows.columns
    vid = (
        F.coalesce(F.col("id"), F.col("video_id"))
        if "id" in probe_cols and "video_id" in probe_cols
        else (F.col("id") if "id" in probe_cols else F.col("video_id"))
    )
    joined = broadcast_lookup(rows, build, on="user_id", how="left")
    return apply_column_set(
        joined.select(
            F.col("playlist_id"), vid.alias("video_id"), F.col("created_at")
        ),
        COLUMN_SETS["playlist_video"],
    )


def sequence_restarts(sinks: dict[str, DataFrame], id_col: str = "id") -> dict[str, int]:
    """OP-06/OP-19: ``max(id)+1`` per sink table (index.mjs:120-126). The
    ALTER SEQUENCE side effect has no parquet analog; a JDBC sink would run
    these in a post-commit hook. Driver-side single-row collects only."""
    out = {}
    for name, df in sinks.items():
        if id_col in df.columns:
            row = df.agg(F.max(id_col).alias("m")).collect()[0]
            out[name] = (row["m"] or 0) + 1
    return out


def migrate(
    spark: SparkSession,
    source: dict[str, DataFrame],
    playlists: DataFrame,
    cfg: MigrationConfig | None = None,
) -> dict[str, DataFrame]:
    """The whole DAG. ``source`` holds the MariaDB-shaped tables (users,
    videos, taggable_taggables, taggable_tags, comments, messages,
    favorites); ``playlists`` is the PostgreSQL-side pre-existing table
    (queries.mjs:14). Returns every sink DataFrame keyed by sink table name;
    all lazily planned, so a caller writing them concurrently gets the
    reference's ``Promise.all`` parallelism from the Spark scheduler."""
    cfg = cfg or MigrationConfig()
    videos_out, tags_out = migrate_videos_and_tags(
        source["videos"], source["taggable_taggables"], source["taggable_tags"]
    )
    return {
        "users": migrate_users(source["users"], cfg),
        "videos": videos_out,
        "tags": tags_out,
        "comments": migrate_comments(source["comments"]),
        "messages": migrate_messages(source["messages"]),
        "playlist_video": fill_playlist_video(
            source["favorites"], playlists, cfg.favorites_title
        ).unionByName(
            fill_playlist_video(
                source["videos"].select("id", "user_id", "created_at"),
                playlists,
                cfg.uploads_title,
            )
        ),
    }


def migrate_with_audit(
    spark: SparkSession,
    source: dict[str, DataFrame],
    playlists: DataFrame,
    cfg: MigrationConfig | None = None,
):
    """:func:`migrate` with an inline load audit on every sink: each
    returned DataFrame carries an `observe` gate (row count + per-column
    null counts) whose metrics accumulate DURING the caller's writes — the
    per-table verification the reference does by re-querying the sink
    (extra round-trips per table), but with zero additional scans at any
    scale. Returns ``(sinks, observations)`` keyed by sink name."""
    from .functions.quality import observed_quality_gate

    sinks = migrate(spark, source, playlists, cfg)
    audited: dict[str, DataFrame] = {}
    observations = {}
    for name, df in sinks.items():
        audited[name], observations[name] = observed_quality_gate(
            df, name=f"load_audit_{name}"
        )
    return audited, observations
