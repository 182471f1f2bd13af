"""Scalar function registry (SURVEY.md §2.8/§2.9, OP-21..31).

Everything here is ANSI-mode-safe (Spark 4 defaults ``spark.sql.ansi.enabled``
on): ``try_to_timestamp`` / ``try_cast`` instead of throwing variants, so a
malformed row degrades to NULL exactly like the reference's repair hooks
(/root/reference/src/column_sets.mjs:10-17) instead of failing a 100 TB job.

The only Python-side function is :func:`normalize_text` — a vectorized
pandas UDF (Arrow-batched) replacing the reference's ``normalize`` Rust
subprocess (/root/reference/src/normalize_tags.mjs:1-21). The submodule's
source is not checked out, so the normalization spec is defined here:
Unicode NFKC → casefold → trim → collapse internal whitespace. On ASCII
input this coincides with ``lower(trim(regexp_replace(s, '\\s+', ' ')))``,
which is the oracle-expressible subset (SURVEY.md §7.5).
"""

from __future__ import annotations

import unicodedata

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType


@F.pandas_udf(StringType())
def normalize_text(s: pd.Series) -> pd.Series:
    """OP-31: NFKC + casefold + trim + whitespace-collapse (Arrow-vectorized).

    Replaces the line-protocol subprocess round-trip
    (normalize_tags.mjs:18-19, strict 1:1 positional mapping) with a
    per-batch vectorized transform — no 1200 KiB stdout ceiling
    (config.json:16), no driver materialization, scales with executors.
    """

    def _norm(t: str | None) -> str | None:
        if t is None:
            return None
        return " ".join(unicodedata.normalize("NFKC", t).casefold().split())

    return s.map(_norm)


def normalize_text_native(col: Column) -> Column:
    """OP-31 tier (c): pure-native approximation (lower/trim/collapse).

    JVM-side, whole-stage-codegen friendly; exact for ASCII. Prefer this in
    hot paths where input is known ASCII; :func:`normalize_text` where full
    Unicode fidelity is required.
    """
    return F.lower(F.trim(F.regexp_replace(col, r"\s+", " ")))


def caret_count(col: Column) -> Column:
    """OP-11/OP-23: length of the leading caret run of ``content``.

    Reference regex ``/^\\^+/`` (index.mjs:62): a comment starting with N
    carets refers to its Nth preceding comment (OP-20).
    """
    return F.length(F.regexp_extract(col, r"^(\^+)", 1))


def truncate30(col: Column, n: int = 30) -> Column:
    """OP-22: ``substring(0, 30)`` truncation for varchar(30) sink columns
    (index.mjs:51-52)."""
    return F.substring(col, 1, n)


def json_string_array(col: Column) -> Column:
    """OP-24: JSON text → array<string> (``JSON.parse(u.categories)``,
    index.mjs:25). Malformed JSON → NULL (from_json semantics), matching the
    engine's repair-not-crash policy."""
    return F.from_json(col, ArrayType(StringType()))


def repair_timestamp(col: Column, default: Column | None = None) -> Column:
    """OP-14/OP-25: the ``ts_default_fallback`` repair
    (column_sets.mjs:10-17): NULL passes through, an unparseable timestamp
    string (MySQL zero-date ``0000-00-00``, garbage) becomes the sink
    DEFAULT, a valid one is kept.

    Spark has no "column default" value (SURVEY.md §7.2); ``default`` is the
    engine-side stand-in (NULL unless given). ``try_cast`` returns NULL on
    malformed input instead of raising under ANSI mode, and is identity when
    the column is already TimestampType — the repair composes with sources
    that deliver either strings or real timestamps.
    """
    parsed = col.try_cast("timestamp")
    if default is None:
        return parsed
    return F.when(col.isNull(), F.lit(None).cast("timestamp")).otherwise(
        F.coalesce(parsed, default)
    )
