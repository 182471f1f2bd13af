"""Family-B fixture generator: w0bm-shaped synthetic tables (FIXTURES.md §B).

Deterministic (seeded numpy) MariaDB-shaped source tables + the
PostgreSQL-side ``playlists`` table, with every edge case FIXTURES.md calls
out: MySQL zero-dates and garbage timestamps, malformed/empty JSON
categories, mixed-case + Unicode (NFKC) + overlong tag names, duplicate
bridge pairs, caret chains interleaved with deletions (including the exact
``deleted_at == created_at`` strict-> tie), users without playlists, and
string-typed playlist ids (the parseInt path). Written as parquet with
microsecond timestamps so Spark reads them natively.
"""

from __future__ import annotations

import json
from datetime import datetime, timedelta

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

SEED = 42
BASE = datetime(2016, 1, 1, 0, 0, 0)

N_USERS = 200
N_VIDEOS = 400
N_TAGS = 90
N_TAGGABLES = 1500
N_COMMENTS = 2000
N_MESSAGES = 200
N_FAVORITES = 600

EDGE_TAG_NAMES = [
    "Music",
    "music",
    " music ",  # leading/trailing spaces → normalizes to the same tag
    "MUSIC",
    "ﬁlm",  # 'ﬁlm' ligature → NFKC 'film'
    "film",
    "ＭＵＳＩＣ",  # full-width 'ＭＵＳＩＣ' → NFKC 'MUSIC'
    "x" * 45,  # > 30 chars → truncation case
    ("Very Long Tag Name " + "y" * 20),  # > 30 chars, distinct prefix
    "Träumerei",  # non-ASCII casefold
]


def _ts(minutes: float) -> datetime:
    return BASE + timedelta(minutes=float(minutes))


def generate(rng: np.random.Generator | None = None) -> dict[str, pd.DataFrame]:
    rng = rng or np.random.default_rng(SEED)
    tables: dict[str, pd.DataFrame] = {}

    # --- users -----------------------------------------------------------
    uid = np.arange(1, N_USERS + 1)
    created = [_ts(int(i) * 37) for i in uid]
    updated = [
        None if rng.random() < 0.10 else c + timedelta(hours=float(rng.integers(1, 99)))
        for c in created
    ]
    deleted = [
        c + timedelta(days=float(rng.integers(1, 400))) if rng.random() < 0.05 else None
        for c in created
    ]
    banend = []
    for c in created:
        r = rng.random()
        if r < 0.03:
            banend.append("0000-00-00 00:00:00")  # MySQL zero-date
        elif r < 0.05:
            banend.append("not-a-date-" + str(rng.integers(0, 9)))
        elif r < 0.10:
            banend.append((c + timedelta(days=30)).strftime("%Y-%m-%d %H:%M:%S"))
        else:
            banend.append(None)
    cats = []
    for _ in uid:
        r = rng.random()
        if r < 0.05:
            cats.append(None)
        elif r < 0.06:
            cats.append("[]")
        elif r < 0.08:
            cats.append("{not json")  # malformed → NULL
        else:
            k = int(rng.integers(1, 5))
            cats.append(json.dumps(rng.choice(["nsfw", "loud", "music", "art", "gaming"], size=k, replace=False).tolist()))
    tables["users"] = pd.DataFrame(
        {
            "id": uid.astype("int64"),
            "username": [f"user_{i:04d}" for i in uid],
            "password": [f"$2y$10$hash{i:032x}" for i in uid],
            "created_at": created,
            "updated_at": updated,
            "deleted_at": deleted,
            "banend": banend,
            "banreason": [("spam" if b is not None else None) for b in banend],
            "categories": cats,
        }
    )

    # --- videos ----------------------------------------------------------
    vid = np.arange(1, N_VIDEOS + 1)
    v_created = [_ts(int(i) * 13) for i in vid]
    tables["videos"] = pd.DataFrame(
        {
            "id": vid.astype("int64"),
            "file": [f"{i}.webm" for i in vid],
            "user_id": rng.integers(1, N_USERS + 1, size=N_VIDEOS).astype("int64"),
            "created_at": v_created,
            "updated_at": [c + timedelta(hours=1) for c in v_created],
            "deleted_at": [
                c + timedelta(days=9) if rng.random() < 0.08 else None for c in v_created
            ],
            "hash": [f"{rng.integers(0, 2**63):032x}"[:32] for _ in vid],
        }
    )

    # --- taggable_tags ---------------------------------------------------
    names = EDGE_TAG_NAMES + [f"tag_{i:03d}" for i in range(N_TAGS - len(EDGE_TAG_NAMES))]
    tables["taggable_tags"] = pd.DataFrame(
        {"tag_id": np.arange(1, len(names) + 1).astype("int64"), "name": names}
    )

    # --- taggable_taggables (with duplicate pairs) -----------------------
    t_vid = rng.integers(1, N_VIDEOS + 1, size=N_TAGGABLES)
    t_tag = rng.integers(1, len(names) + 1, size=N_TAGGABLES)
    dup_idx = rng.integers(0, N_TAGGABLES, size=N_TAGGABLES // 20)
    t_vid = np.concatenate([t_vid, t_vid[dup_idx]])
    t_tag = np.concatenate([t_tag, t_tag[dup_idx]])
    tables["taggable_taggables"] = pd.DataFrame(
        {"taggable_id": t_vid.astype("int64"), "tag_id": t_tag.astype("int64")}
    )

    # --- comments (caret threading edge machine) -------------------------
    cid, c_user, c_video, c_content, c_created, c_deleted = [], [], [], [], [], []
    # zipf-ish skew over a subset of videos
    video_pool = rng.permutation(vid)[:150]
    weights = 1.0 / np.arange(1, len(video_pool) + 1)
    weights /= weights.sum()
    next_id = 1
    for _ in range(N_COMMENTS):
        v = int(rng.choice(video_pool, p=weights))
        created_at = _ts(next_id * 3)
        r = rng.random()
        if r < 0.30:
            n = int(rng.integers(1, 6))
            content = "^" * n + (" reply text" if rng.random() > 0.1 else "")
        else:
            content = f"comment body {next_id}"
        deleted_at = (
            created_at + timedelta(minutes=float(rng.integers(1, 5000)))
            if rng.random() < 0.10
            else None
        )
        cid.append(next_id)
        c_user.append(int(rng.integers(1, N_USERS + 1)))
        c_video.append(v)
        c_content.append(content)
        c_created.append(created_at)
        c_deleted.append(deleted_at)
        next_id += 1

    # handcrafted block on a video outside the random pool: the SURVEY §2.5
    # edge cases, ids continuing the global sequence
    hv = int(N_VIDEOS)  # dedicated video id

    def add(content, created_at, deleted_at=None):
        nonlocal next_id
        cid.append(next_id)
        c_user.append(1)
        c_video.append(hv)
        c_content.append(content)
        c_created.append(created_at)
        c_deleted.append(deleted_at)
        next_id += 1

    t0 = _ts(10_000_000)
    add("^ caret on first comment of video", t0)  # no predecessor → NULL
    add("root a", t0 + timedelta(minutes=1), deleted_at=t0 + timedelta(minutes=5))
    add("root b", t0 + timedelta(minutes=2))
    # exact tie: predecessor 'root a' deleted AT this row's created_at → NOT skipped
    add("^^", t0 + timedelta(minutes=5))
    # later row: 'root a' deleted strictly before → skipped
    add("^^", t0 + timedelta(minutes=6))
    add("^^^^^ overflow beyond predecessors", t0 + timedelta(minutes=7))
    add("root c", t0 + timedelta(minutes=8), deleted_at=t0 + timedelta(minutes=9))
    add("^ all-recent-deleted walk continues", t0 + timedelta(minutes=10))

    tables["comments"] = pd.DataFrame(
        {
            "id": np.array(cid, dtype="int64"),
            "user_id": np.array(c_user, dtype="int64"),
            "video_id": np.array(c_video, dtype="int64"),
            "content": c_content,
            "created_at": c_created,
            "updated_at": c_created,
            "deleted_at": c_deleted,
        }
    )

    # --- messages --------------------------------------------------------
    mid = np.arange(1, N_MESSAGES + 1)
    m_created = [_ts(int(i) * 11) for i in mid]
    tables["messages"] = pd.DataFrame(
        {
            "id": mid.astype("int64"),
            "from": rng.integers(1, N_USERS + 1, size=N_MESSAGES).astype("int64"),
            "to": rng.integers(1, N_USERS + 1, size=N_MESSAGES).astype("int64"),
            "subject": [f"subject {i}" for i in mid],
            "content": [f"message body {i}" for i in mid],
            "created_at": m_created,
            "updated_at": m_created,
            "deleted_at": [None] * N_MESSAGES,
        }
    )

    # --- favorites (created_at AS STRING, some invalid) ------------------
    f_user = rng.integers(1, N_USERS + 1, size=N_FAVORITES)
    f_created = []
    for i in range(N_FAVORITES):
        if rng.random() < 0.02:
            f_created.append("0000-00-00 00:00:00")
        else:
            f_created.append(_ts(i * 7).strftime("%Y-%m-%d %H:%M:%S"))
    tables["favorites"] = pd.DataFrame(
        {
            "user_id": f_user.astype("int64"),
            "video_id": rng.integers(1, N_VIDEOS + 1, size=N_FAVORITES).astype("int64"),
            "created_at": f_created,
        }
    )

    # --- playlists (pg side; ids AS STRINGS — parseInt path) -------------
    pl_id, pl_user, pl_title = [], [], []
    next_pl = 1
    no_playlist_users = set(rng.choice(uid, size=max(1, N_USERS // 50), replace=False).tolist())
    for u in uid:
        if int(u) in no_playlist_users:
            continue
        for title in ("Favorites", "Uploads"):
            pl_id.append(str(next_pl))
            pl_user.append(str(int(u)))
            pl_title.append(title)
            next_pl += 1
        if rng.random() < 0.10:
            pl_id.append(str(next_pl))
            pl_user.append(str(int(u)))
            pl_title.append("Watch later")
            next_pl += 1
    tables["playlists"] = pd.DataFrame(
        {"id": pl_id, "user_id": pl_user, "title": pl_title}
    )
    return tables


def write_parquet(tables: dict[str, pd.DataFrame], out_dir: str) -> None:
    """Microsecond-timestamp parquet (Spark 4 rejects ns without a legacy
    conf; the engine's own fixtures should simply be us)."""
    import os

    os.makedirs(out_dir, exist_ok=True)
    for name, df in tables.items():
        table = pa.Table.from_pandas(df, preserve_index=False)
        fields = [
            pa.field(f.name, pa.timestamp("us")) if pa.types.is_timestamp(f.type) else f
            for f in table.schema
        ]
        table = table.cast(pa.schema(fields))
        pq.write_table(table, f"{out_dir}/{name}.parquet")
