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
