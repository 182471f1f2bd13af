"""Plan pins for the round-10 rows (the SURVEY §4 contract applied to
the new operators): the c8 pipeline pays exactly ONE Arrow decode pass,
the PQ-ADC tier exactly its two documented kernels, the aHash path one
kernel with JVM-only pairing on top, and nothing anywhere plans a
cartesian / nested-loop expansion."""

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


def test_c8_single_arrow_decode_pass(spark, sf_dir):
    """c8's only Python operator is the decode kernel — the hash rides
    carry_cols through it, so a second payload scan (or a doc_id
    self-join to reunite hash with dims) would show up as a second
    MapInPandas node. Built fresh (memo bypassed) so the pin sees the
    un-shared plan."""
    from mariadb_postgres_migration_spark import r10_queries as R10

    R10._C8_FRAMES_CACHE.clear()
    df = REGISTRY["c8_multimodal_pipeline"].fn(spark, sf_dir)
    assert python_eval_count(df) == 1
    _no_expansion(df)


def test_x153_pq_adc_two_arrow_kernels_no_expansion(q):
    """knn_pq_adc = the pq_encode kernel + the ADC scoring kernel, and
    nothing else Python; the bounded query panel broadcasts as a
    distance table, never as a join side, so no nested-loop/cartesian
    node may appear."""
    df = q("x153_knn_pq_adc")
    assert python_eval_count(df) == 2
    _no_expansion(df)


def test_x157_ahash_single_kernel(q):
    """image_ahash is ONE Arrow pass over the JVM-assembled payloads."""
    df = q("x157_image_ahash")
    assert python_eval_count(df) == 1
    _no_expansion(df)


def test_x158_pairing_adds_no_python_beyond_the_signature(q):
    """The banding, posting-list pair generation and hamming verify are
    all JVM-side: the only Python in the plan is the (persisted) aHash
    kernel's lineage. Candidate generation is the in-row combinations
    form — no signature×signature join shape."""
    df = q("x158_image_neardup")
    assert python_eval_count(df) <= 3  # sig lineage may print per consumer
    _no_expansion(df)


def test_r10_suites_plan_no_expansion(q):
    for name in (
        "d3_dedup_core_suite",
        "s5_embcore_suite",
        "d4_cc_term_suite",
        "x159_r10c_ops_suite",
        "x154_multimodal_funnel",
        "x155_paired_profile",
    ):
        _no_expansion(q(name))
