"""Local replica of the driver's DuckDB-oracle comparison.

Runs a registry query through Spark AND its oracle SQL through DuckDB over
the same parquet fixtures, then compares row count, sorted column names, and
order-insensitively sorted values. Mirrors the hash-compare severity: exact
equality (no float tolerance) so anything that would break the driver's
value-hash breaks here first.
"""

from __future__ import annotations

import math

import duckdb

FIXTURE_TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in FIXTURE_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _norm_cell(v):
    # numpy scalars/arrays appear on either side depending on Arrow being
    # enabled (Spark) and on DuckDB's df() — normalize to Python values so
    # the comparison tests VALUES, as the driver's hash does, not reprs
    if hasattr(v, "item") and not hasattr(v, "__len__"):
        v = v.item()
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)  # full precision — exact like a hash would be
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return "[" + ",".join(_norm_cell(x) for x in v) + "]"
    return repr(v)


def _normalize(df_pandas):
    cols = sorted(df_pandas.columns)
    rows = [
        tuple(_norm_cell(v) for v in row)
        for row in df_pandas[cols].itertuples(index=False, name=None)
    ]
    return cols, sorted(rows)


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str, name: str = "") -> None:
    got = spark_df.toPandas()
    want = con.execute(sql).df()
    g_cols, g_rows = _normalize(got)
    w_cols, w_rows = _normalize(want)
    assert g_cols == w_cols, f"{name}: column mismatch spark={g_cols} oracle={w_cols}"
    assert len(g_rows) == len(w_rows), (
        f"{name}: row count spark={len(g_rows)} oracle={len(w_rows)}"
    )
    if g_rows != w_rows:
        diffs = [(a, b) for a, b in zip(g_rows, w_rows) if a != b][:5]
        raise AssertionError(f"{name}: value mismatch, first diffs: {diffs}")
