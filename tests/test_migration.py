"""Golden end-to-end migration test (SURVEY §5.2): run the OP-32 DAG over
the w0bm-shaped Family-B fixtures and compare EVERY sink table against
goldens computed by an independent pure-Python implementation of the
reference semantics (transcribed from SURVEY §2, not from the Spark code).
"""

from __future__ import annotations

import json
import math
import unicodedata
from datetime import datetime

import pytest

from mariadb_postgres_migration_spark.operators.threading import resolve_backrefs_py
from mariadb_postgres_migration_spark.pipeline import (
    MigrationConfig,
    migrate,
    sequence_restarts,
)
from tests.w0bm_fixtures import generate, write_parquet

PLACEHOLDER = "not set yet"


# --------------------------------------------------------------------------
# independent golden implementations (pure Python over the pandas fixtures)
# --------------------------------------------------------------------------

def _norm_tag(s: str) -> str:
    return " ".join(unicodedata.normalize("NFKC", s).casefold().split())


def _parse_ts(v):
    """try-parse semantics: valid 'YYYY-MM-DD HH:MM:SS' → datetime, else None."""
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return None
    if isinstance(v, datetime):
        return v
    try:
        return datetime.strptime(str(v), "%Y-%m-%d %H:%M:%S")
    except ValueError:
        return None


def _parse_json_arr(v):
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return None
    try:
        parsed = json.loads(v)
    except (ValueError, TypeError):
        return None
    if not isinstance(parsed, list):
        return None
    return tuple(str(x) for x in parsed)


def golden_users(users):
    rows = []
    for r in users.itertuples(index=False):
        rows.append(
            (
                r.id,
                r.username,
                PLACEHOLDER,
                r.created_at,
                r.updated_at,
                r.deleted_at,
                _parse_ts(r.banend),
                r.banreason,
                _parse_json_arr(r.categories),
            )
        )
    return rows


def golden_videos_and_tags(videos, taggables, tags):
    video_ids = set(videos["id"].tolist())
    used_tag_ids = {
        t for v, t in zip(taggables["taggable_id"], taggables["tag_id"]) if v in video_ids
    }
    dictionary = {
        int(r.tag_id): (r.name, _norm_tag(r.name))
        for r in tags.itertuples(index=False)
        if int(r.tag_id) in used_tag_ids
    }
    per_video: dict[int, set] = {}
    for v, t in zip(taggables["taggable_id"], taggables["tag_id"]):
        if int(v) in video_ids and int(t) in dictionary:
            per_video.setdefault(int(v), set()).add(dictionary[int(t)][1])
    vrows = []
    for r in videos.itertuples(index=False):
        if int(r.id) not in per_video:
            continue  # comma-join: untagged videos drop
        vrows.append(
            (
                r.id,
                r.file,
                r.created_at,
                r.updated_at,
                r.deleted_at,
                r.hash,
                tuple(sorted(per_video[int(r.id)])),
            )
        )
    trows = sorted({(norm[:30], name[:30]) for (name, norm) in dictionary.values()})
    return vrows, [(n, t) for n, t in trows]


def golden_comments(comments):
    rows = []
    for vid_group in comments.sort_values("id").groupby("video_id"):
        g = vid_group[1]
        created = [t.to_pydatetime() for t in g["created_at"]]
        deleted = [None if t is None or t != t else t.to_pydatetime() for t in g["deleted_at"]]
        resp = resolve_backrefs_py(
            g["id"].tolist(), g["content"].tolist(), created, deleted
        )
        for r, resp_to in zip(g.itertuples(index=False), resp):
            rows.append(
                (
                    r.id,
                    r.user_id,
                    r.video_id,
                    r.content,
                    r.created_at,
                    r.updated_at,
                    None if r.deleted_at != r.deleted_at else r.deleted_at,
                    resp_to,
                )
            )
    return rows


def golden_messages(messages):
    cols = ["id", "from", "to", "subject", "content", "created_at", "updated_at", "deleted_at"]
    return [tuple(row) for row in messages[cols].itertuples(index=False, name=None)]


def golden_playlist_video(favorites, videos, playlists):
    rows = []
    for title, src in (("Favorites", "favorites"), ("Uploads", "uploads")):
        lookup = {
            int(r.user_id): int(r.id)
            for r in playlists.itertuples(index=False)
            if r.title == title
        }
        if src == "favorites":
            it = (
                (int(r.user_id), int(r.video_id), _parse_ts(r.created_at))
                for r in favorites.itertuples(index=False)
            )
        else:
            it = (
                (int(r.user_id), int(r.id), r.created_at)
                for r in videos.itertuples(index=False)
            )
        for user_id, video_id, created in it:
            # Map.get miss → playlist_id undefined → pg-promise renders NULL
            # (index.mjs:103-110): the row is KEPT with NULL playlist_id
            rows.append((lookup.get(user_id), video_id, created))
    return rows


# --------------------------------------------------------------------------
# comparison plumbing
# --------------------------------------------------------------------------

def _cell(v):
    import pandas as pd

    if v is None or (isinstance(v, float) and math.isnan(v)) or v is pd.NaT:
        return None
    if isinstance(v, pd.Timestamp):
        return v.to_pydatetime().isoformat()
    if isinstance(v, datetime):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_cell(x) for x in v)
    if hasattr(v, "item"):  # numpy scalar
        return v.item()
    return v


def _rows(seq):
    # key=repr gives a total order even with NULLs (playlist_video keeps
    # NULL playlist_id rows per the reference's undefined→NULL rendering)
    return sorted((tuple(_cell(v) for v in row) for row in seq), key=repr)


def _spark_rows(df):
    return _rows(tuple(row) for row in df.collect())


# --------------------------------------------------------------------------
# the test
# --------------------------------------------------------------------------

@pytest.fixture(scope="module")
def w0bm(tmp_path_factory):
    tables = generate()
    out = str(tmp_path_factory.mktemp("w0bm"))
    write_parquet(tables, out)
    return tables, out


@pytest.fixture(scope="module")
def sinks(spark, w0bm):
    tables, path = w0bm
    src = {name: spark.read.parquet(f"{path}/{name}.parquet") for name in tables}
    playlists = src.pop("playlists")
    return migrate(spark, src, playlists, MigrationConfig())


def test_users_golden(sinks, w0bm):
    tables, _ = w0bm
    assert _spark_rows(sinks["users"]) == _rows(golden_users(tables["users"]))


def test_videos_golden(sinks, w0bm):
    tables, _ = w0bm
    vrows, _ = golden_videos_and_tags(
        tables["videos"], tables["taggable_taggables"], tables["taggable_tags"]
    )
    assert _spark_rows(sinks["videos"]) == _rows(vrows)


def test_tags_golden(sinks, w0bm):
    tables, _ = w0bm
    _, trows = golden_videos_and_tags(
        tables["videos"], tables["taggable_taggables"], tables["taggable_tags"]
    )
    assert _spark_rows(sinks["tags"]) == _rows(trows)


def test_comments_golden(sinks, w0bm):
    tables, _ = w0bm
    assert _spark_rows(sinks["comments"]) == _rows(golden_comments(tables["comments"]))


def test_messages_golden(sinks, w0bm):
    tables, _ = w0bm
    assert _spark_rows(sinks["messages"]) == _rows(golden_messages(tables["messages"]))


def test_playlist_video_golden(sinks, w0bm):
    tables, _ = w0bm
    assert _spark_rows(sinks["playlist_video"]) == _rows(
        golden_playlist_video(tables["favorites"], tables["videos"], tables["playlists"])
    )


def test_sequence_restarts(sinks, w0bm):
    tables, _ = w0bm
    seqs = sequence_restarts(sinks)
    assert seqs["users"] == int(tables["users"]["id"].max()) + 1
    assert seqs["comments"] == int(tables["comments"]["id"].max()) + 1
    assert "playlist_video" not in seqs  # no id column


def test_migrate_with_audit_counts_ride_the_writes(spark, w0bm):
    """The audited DAG's observation metrics must match the sink row counts
    without any additional counting pass."""
    from mariadb_postgres_migration_spark.pipeline import migrate_with_audit

    tables, path = w0bm
    src = {name: spark.read.parquet(f"{path}/{name}.parquet") for name in tables}
    playlists = src.pop("playlists")
    audited, obs = migrate_with_audit(spark, src, playlists, MigrationConfig())
    for name, df in audited.items():
        df.write.format("noop").mode("overwrite").save()
    for name, df in audited.items():
        assert obs[name].get["rows"] == df.count(), name


def test_duplicate_same_title_playlists_collapse_to_one(spark):
    """The reference's Map.set keeps ONE playlist per user; duplicate
    same-title playlists must not fan the probe rows out (review r5;
    deterministic pick = max playlist id)."""
    from pyspark.sql import functions as F

    from mariadb_postgres_migration_spark.pipeline import fill_playlist_video

    playlists = spark.createDataFrame(
        [(1, 7, "Favorites"), (2, 7, "Favorites"), (3, 8, "Favorites")],
        "id long, user_id long, title string",
    )
    rows = spark.createDataFrame(
        [(7, 100, "2024-01-01 00:00:00"), (8, 200, "2024-01-02 00:00:00")],
        "user_id long, video_id long, created_at string",
    )
    out = fill_playlist_video(rows, playlists, "Favorites").collect()
    assert len(out) == 2  # one sink row per probe row, never per duplicate
    got = {r["video_id"]: r["playlist_id"] for r in out}
    assert got == {100: 2, 200: 3}
