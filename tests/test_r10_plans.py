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


def test_x164_dhash_single_kernel(q):
    """image_dhash is ONE Arrow pass over the JVM-assembled payloads."""
    df = q("x164_image_dhash")
    assert python_eval_count(df) == 1
    _no_expansion(df)


def test_x166_gif_path_two_kernels(q):
    """The GIF tier pays exactly two Python operators: the LZW fixture
    builder (attach_consistent_gif_payload — fixture assembly, not a hot
    path) and the aHash kernel."""
    df = q("x166_gif_ahash")
    assert python_eval_count(df) == 2
    _no_expansion(df)


def test_x169_incremental_dedup_plan(q):
    """One signature kernel in the lineage; the corpus probe is an
    equi-join on the signature halves — never an expansion node."""
    df = q("x169_incremental_image_dedup")
    assert python_eval_count(df) <= 2  # persisted sig lineage per side
    _no_expansion(df)


def test_x170_profile_single_kernel(q):
    df = q("x170_source_image_profile")
    assert python_eval_count(df) == 1
    _no_expansion(df)


def test_x161_curriculum_no_global_single_partition_sort(q):
    """The curriculum boundary pass must run on the value-grouped frame,
    not funnel the manifest through a global ntile: the plan may carry
    single-partition windows only over the tiny distinct-quality frame,
    and the phase projection joins a 1-row broadcast."""
    from mariadb_postgres_migration_spark.plans.inspect import simple_plan

    df = q("x161_curriculum_phases")
    text = simple_plan(df)
    assert "ntile" not in text.lower()
    _no_expansion_allowing_scalar_cross(df)


def _no_expansion_allowing_scalar_cross(df):
    """x161's phase projection is a crossJoin against a 1-row boundary
    aggregate — the bounded scalar-broadcast shape (a `keys=[]`
    zero-grouping aggregate somewhere among the broadcast build sides),
    which is allowed where a data-sized expansion is not."""
    from mariadb_postgres_migration_spark.plans import broadcast_build_subtrees

    text = simple_plan(df)
    assert "CartesianProduct" not in text
    if "BroadcastNestedLoopJoin" in text:
        subs = broadcast_build_subtrees(df)
        assert any("keys=[]" in s for s in subs), (
            "nested-loop join without a 1-row scalar-aggregate build side"
        )


def test_r10_suites_plan_no_expansion(q):
    for name in (
        "d3_dedup_core_suite",
        "s5_embcore_suite",
        "d4_cc_term_suite",
        "x159_r10c_ops_suite",
        "x154_multimodal_funnel",
        "x155_paired_profile",
        "x165_r10e_ops_suite",
        "x168_r10f_ops_suite",
        "x171_r10g_ops_suite",
        "w5_windowthread_suite",
        "j13_order_temporal_suite",
        "t3_tpch_join_agg_suite",
        "s6_setwindow_suite",
        "x163_image_dedup_keep_one",
        "x167_dualhash_pairs",
    ):
        _no_expansion(q(name))
    # rows carrying a 1-row scalar cross (x161's boundary frame inside
    # x162/x173/x174; q_scalar's four 1-row subplans inside t4) allow
    # ONLY the scalar-broadcast shape
    for name in (
        "x162_r10d_ops_suite",
        "x173_phase_split_mix",
        "x174_r10h_ops_suite",
        "t4_profile_scalar_suite",
    ):
        _no_expansion_allowing_scalar_cross(q(name))
