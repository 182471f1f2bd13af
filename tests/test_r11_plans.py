"""Plan pins for the round-11 rows (the SURVEY §4 contract applied to
the new operators): c9's perceptual pipeline pays exactly ONE Arrow
decode/signature pass (dims ride with_dims through it), the pairing and
keep-one stages stay JVM-side on top of the persisted signature frame,
and nothing plans a cartesian / nested-loop expansion."""

from __future__ import annotations

import pytest

from mariadb_postgres_migration_spark.plans import python_eval_count
from mariadb_postgres_migration_spark.plans.inspect import simple_plan
from mariadb_postgres_migration_spark.registry import (
    REGISTRY,
    load_all_query_modules,
)

load_all_query_modules()


@pytest.fixture(scope="module")
def q(spark, sf_dir):
    def _run(name):
        return REGISTRY[name].fn(spark, sf_dir)

    return _run


def _no_expansion(df):
    text = simple_plan(df)
    assert "CartesianProduct" not in text
    assert "BroadcastNestedLoopJoin" not in text


def test_c9_single_signature_pass(q):
    """c9's only Python operator is the aHash kernel (with_dims=True —
    gate + signature + dims in one pass). The pair generation, CC
    keep-one and both final joins are JVM-side; the persisted signature
    frame's lineage may print once per consumer but never a SECOND
    distinct Python kernel (a re-decode for dims would)."""
    df = q("c9_multimodal_lsh")
    # sig is consumed by pairs (2 sides), keep and qual — the persisted
    # frame's single kernel may appear in each consumer's printed lineage
    assert python_eval_count(df) <= 4
    _no_expansion(df)


def test_m3_suite_plan_no_expansion(q):
    _no_expansion(q("m3_r10bc_suite"))
