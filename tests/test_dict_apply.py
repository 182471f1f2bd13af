"""Pin OP-17's array-dictionary rewrite NULL/empty/miss contract
(ADVICE r1): NULL array → NULL, empty array → empty, dictionary miss →
NULL element (the reference's ``Map.get`` → undefined, index.mjs:44)."""

from __future__ import annotations

import pytest

from mariadb_postgres_migration_spark.operators.joins import dict_apply_to_array


@pytest.fixture(scope="module")
def applied(spark):
    df = spark.createDataFrame(
        [
            (1, ["a", "b", "a"]),
            (2, []),
            (3, None),
            (4, ["b", "zzz"]),  # zzz misses the dictionary
        ],
        "rid long, tags array<string>",
    )
    dictionary = spark.createDataFrame(
        [("a", "A"), ("b", "B")], "name string, normalized string"
    )
    out = dict_apply_to_array(
        df, "tags", dictionary, key_col="name", value_col="normalized", row_key="rid"
    )
    return {r["rid"]: r["tags"] for r in out.collect()}


def test_elements_rewritten_in_position(applied):
    assert applied[1] == ["A", "B", "A"]


def test_empty_array_stays_empty(applied):
    assert applied[2] == []


def test_null_array_stays_null(applied):
    assert applied[3] is None


def test_dictionary_miss_maps_to_null_element(applied):
    assert applied[4] == ["B", None]


def test_duplicate_row_key_raises_instead_of_merging(spark):
    import pytest
    from pyspark.sql.utils import AnalysisException  # noqa: F401

    df = spark.createDataFrame(
        [(1, ["a"]), (1, ["b"])], "rid long, tags array<string>"
    )
    d = spark.createDataFrame([("a", "A"), ("b", "B")], "k string, v string")
    with pytest.raises(Exception, match="row_key 'rid' is not unique"):
        dict_apply_to_array(df, "tags", d, "k", "v", "rid").collect()


def test_single_null_row_key_still_maps(spark):
    df = spark.createDataFrame([(None, ["a"])], "rid long, tags array<string>")
    d = spark.createDataFrame([("a", "A")], "k string, v string")
    rows = dict_apply_to_array(df, "tags", d, "k", "v", "rid").collect()
    assert len(rows) == 1 and rows[0]["tags"] == ["A"]
