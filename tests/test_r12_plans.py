"""Plan pins for the round-12 rows (the SURVEY §4 contract applied to
the new operators): the video near-dup tier stays posting-list-shaped
(no cartesian / nested-loop expansion), the recall panel's exhaustive
side stays in-row, and the progressive-JPEG rows pay exactly the
fixture-builder + decode-kernel Python operators and nothing more."""

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


def test_x190_video_neardup_plan(q):
    """x190 = AVI builder + frame-0 hash kernel; pairs come from capped
    posting lists (never video×video), CC/keep-one JVM-side."""
    df = q("x190_video_neardup_keep_one")
    assert python_eval_count(df) <= 4  # persisted sig lineage per consumer
    _no_expansion(df)


def test_x191_recall_panel_stays_in_row(q):
    """The exhaustive pair set comes from in-row combinations over the
    bounded collected panel — no nested-loop / cartesian node even
    though the semantics are 'all panel pairs' (the x176 pin on the
    video signature space)."""
    _no_expansion(q("x191_video_neardup_recall"))


def test_m8_x192_suites_no_expansion(q):
    _no_expansion(q("m8_r11bc_suite"))
    _no_expansion(q("x192_r12a_ops_suite"))


def test_x193_x194_kernels(q):
    """x193 = the progressive fixture builder + the pixel-stats decode
    kernel (two Python ops — the multi-scan decode rides the SAME
    kernel count as the baseline x115 row); x194 = builder + the funnel
    kernel (two)."""
    df = q("x193_progressive_pixel_stats")
    assert python_eval_count(df) == 2
    _no_expansion(df)
    df = q("x194_jpeg_decode_funnel_v2")
    assert python_eval_count(df) == 2
    _no_expansion(df)


def test_m9_x195_suites_no_expansion(q):
    _no_expansion(q("m9_r11de_suite"))
    _no_expansion(q("x195_r12b_ops_suite"))


def test_x196_x197_plans(q):
    """x196 = two fixture builders + two decode kernels (baseline and
    progressive sides of the parity join — four Python ops, one doc_id
    equi-join); x197 = AVI builder + frame-0 hash kernel over the
    persisted x190 sig plus one aggregate."""
    df = q("x196_decode_path_parity")
    assert python_eval_count(df) == 4
    _no_expansion(df)
    df = q("x197_video_neardup_source_sheet")
    assert python_eval_count(df) <= 4
    _no_expansion(df)


def test_m10_x198_suites_no_expansion(q):
    # m10 carries x128's KS-drift / x133's Gini scalar aggregates: a
    # crossJoin against a 1-row scalar-aggregate build side is the
    # allowed broadcast shape (the test_r10_plans
    # _no_expansion_allowing_scalar_cross policy); a cartesian is
    # still forbidden
    from mariadb_postgres_migration_spark.plans import (
        broadcast_build_subtrees,
    )

    df = q("m10_r8ab_suite")
    text = simple_plan(df)
    assert "CartesianProduct" not in text
    if "BroadcastNestedLoopJoin" in text:
        subs = broadcast_build_subtrees(df)
        assert any("keys=[]" in s for s in subs), (
            "nested-loop join without a 1-row scalar-aggregate build side"
        )
    _no_expansion(q("x198_r12c_ops_suite"))
