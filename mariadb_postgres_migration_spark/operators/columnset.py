"""Declarative per-table projection/rename/repair specs — the Spark analog of
pg-promise ColumnSets (/root/reference/src/column_sets.mjs:25-98).

A :class:`ColumnSpec` names a sink column and optionally a source column
(``prop`` rename, column_sets.mjs:34-35,75-86) and a repair expression
(``init`` hook, column_sets.mjs:19-23,67-70). ``apply_column_set`` compiles a
spec list into ONE ``select`` projection, so Catalyst sees a single narrow
projection it can push into the scan — at 100 TB the sink projection IS the
read schema.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import json_string_array, repair_timestamp


@dataclass(frozen=True)
class ColumnSpec:
    name: str  # sink column name
    prop: str | None = None  # source column (defaults to name)
    repair: Callable[[Column], Column] | None = None  # value-repair expression
    cast: str | None = None  # optional sink type cast (try_cast under ANSI)

    def expr(self) -> Column:
        col = F.col(self.prop or self.name)
        if self.repair is not None:
            col = self.repair(col)
        if self.cast is not None:
            col = col.try_cast(self.cast)
        return col.alias(self.name)


def apply_column_set(df: DataFrame, spec: list[ColumnSpec]) -> DataFrame:
    """OP-08/13/14 compiler: one declarative projection per sink table."""
    return df.select(*[c.expr() for c in spec])


def null_to_default(default=None) -> Callable[[Column], Column]:
    """OP-13: ``response_to: col.value || DEFAULT`` (column_sets.mjs:67-70).
    Sink default is modeled as a value (NULL unless configured, SURVEY §7.2).
    Mirrors JS falsiness: 0 would also be replaced — but ids are 1-based so
    only NULL occurs in practice; we implement SQL NULL semantics."""
    return lambda col: F.coalesce(col, F.lit(default))


#: Sink column sets, mirroring column_sets.mjs table-for-table.
USERS_COLUMNS = [
    ColumnSpec("id"),
    ColumnSpec("username"),
    ColumnSpec("password"),  # overwritten upstream with the placeholder (OP-09)
    ColumnSpec("created_at"),
    ColumnSpec("updated_at"),
    ColumnSpec("deleted_at"),
    ColumnSpec("banned", prop="banend", repair=repair_timestamp),
    ColumnSpec("banreason"),
    ColumnSpec("filters", prop="categories", repair=json_string_array),
]

VIDEOS_COLUMNS = [
    ColumnSpec("id"),
    ColumnSpec("file"),
    ColumnSpec("created_at"),
    ColumnSpec("updated_at"),
    ColumnSpec("deleted_at"),
    ColumnSpec("hash"),
    ColumnSpec("tags"),
]

TAGS_COLUMNS = [ColumnSpec("normalized"), ColumnSpec("tag")]

COMMENTS_COLUMNS = [
    ColumnSpec("id"),
    ColumnSpec("user_id"),
    ColumnSpec("video_id"),
    ColumnSpec("content"),
    ColumnSpec("created_at"),
    ColumnSpec("updated_at"),
    ColumnSpec("deleted_at"),
    ColumnSpec("response_to", repair=null_to_default(None)),
]

MESSAGES_COLUMNS = [
    ColumnSpec("id"),
    ColumnSpec("from_user", prop="from"),
    ColumnSpec("to_user", prop="to"),
    ColumnSpec("title", prop="subject"),
    ColumnSpec("content"),
    ColumnSpec("created_at"),
    ColumnSpec("updated_at"),
    ColumnSpec("deleted_at"),
]

PLAYLIST_VIDEO_COLUMNS = [
    ColumnSpec("playlist_id"),
    ColumnSpec("video_id"),
    ColumnSpec("created_at", repair=repair_timestamp),
]

COLUMN_SETS: dict[str, list[ColumnSpec]] = {
    "users": USERS_COLUMNS,
    "videos": VIDEOS_COLUMNS,
    "tags": TAGS_COLUMNS,
    "comments": COMMENTS_COLUMNS,
    "messages": MESSAGES_COLUMNS,
    "playlist_video": PLAYLIST_VIDEO_COLUMNS,
}
