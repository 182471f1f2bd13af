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


def test_x175_video_two_kernels(q):
    """x175 pays exactly two Python operators: the AVI fixture builder
    (fixture assembly, not a hot path) and the frame-sampling decode
    kernel — the x166 GIF-tier shape on the video container."""
    df = q("x175_video_frame_stats")
    assert python_eval_count(df) == 2
    _no_expansion(df)


def test_x176_recall_panel_stays_in_row(q):
    """The exhaustive pair set comes from in-row combinations over the
    bounded collected panel — no nested-loop / cartesian node may
    appear even though the semantics are 'all panel pairs'."""
    df = q("x176_image_neardup_recall")
    _no_expansion(df)


def test_x177_m4_suites_no_expansion(q):
    _no_expansion(q("x177_r11b_ops_suite"))
    # m4 carries x162 → x161's curriculum boundary frame: a crossJoin
    # against a 1-row scalar aggregate is the allowed broadcast shape
    # (test_r10_plans._no_expansion_allowing_scalar_cross)
    from mariadb_postgres_migration_spark.plans import broadcast_build_subtrees

    df = q("m4_r10de_suite")
    text = simple_plan(df)
    assert "CartesianProduct" not in text
    if "BroadcastNestedLoopJoin" in text:
        subs = broadcast_build_subtrees(df)
        assert any("keys=[]" in s for s in subs), (
            "nested-loop join without a 1-row scalar-aggregate build side"
        )


def test_x178_x179_kernels(q):
    """x178 = the mixed fixture builder + the classifier (two Python
    ops); x179 = the AVI builder + the frame-0 hash kernel, with the
    keep rule a JVM groupBy over the persisted signature."""
    df = q("x178_jpeg_decode_funnel")
    assert python_eval_count(df) == 2
    _no_expansion(df)
    df = q("x179_video_perceptual_dedup")
    assert python_eval_count(df) <= 4  # persisted sig lineage per consumer
    _no_expansion(df)
    _no_expansion(q("x180_r11c_ops_suite"))
    _no_expansion(q("m5_r10fg_suite"))


def test_x181_x182_plans(q):
    """x181 = AVI builder + header walker, no JPEG decode in the plan
    (two Python ops); x182 = the x175 decode + a JVM lag window (two
    Python ops: builder + frame kernel, nothing for the temporal part)."""
    df = q("x181_video_header_profile")
    assert python_eval_count(df) == 2
    _no_expansion(df)
    df = q("x182_video_scene_change")
    assert python_eval_count(df) == 2
    _no_expansion(df)
    _no_expansion(q("x183_r11d_ops_suite"))
    # m6 carries x145 → x144's <=3-row split-pair inequality join — the
    # bounded nested-loop shape test_plans.test_r9_rows_stay_jvm_and_bounded
    # sanctions (<=2 such nodes); a cartesian is still forbidden
    import re

    from mariadb_postgres_migration_spark.plans.inspect import formatted_plan

    text = formatted_plan(q("m6_r9bc_suite"))
    assert "CartesianProduct" not in text
    n_bnlj = len(re.findall(
        r"^\(\d+\) BroadcastNestedLoopJoin\b", text, re.MULTILINE
    ))
    assert n_bnlj <= 2, f"m6: {n_bnlj} nested-loop joins"


def test_x184_x185_plans(q):
    """x184 = AVI builder + frame-0 hash kernel (persisted sig feeds both
    probe sides); x185 = WAV fixture assembly is JVM binary concat, so
    the ONLY Python is the energy kernel."""
    df = q("x184_incremental_video_dedup")
    assert python_eval_count(df) <= 4
    _no_expansion(df)
    df = q("x185_audio_energy_screen")
    assert python_eval_count(df) == 1
    _no_expansion(df)
    _no_expansion(q("x186_r11e_ops_suite"))


def test_c10_single_decode_pass(q):
    """c10's only Python is the AVI builder + the frame-0 hash kernel
    (with_meta carries n_frames through the SAME pass — a second walk
    for the duration gate would add a third kernel); dedup/gate/pairing
    are JVM-side."""
    df = q("c10_video_pipeline")
    assert python_eval_count(df) <= 4  # persisted sig lineage per consumer
    _no_expansion(df)
    _no_expansion(q("d5_dedup_agg_suite"))


def test_x187_x188_plans(q):
    """x187 = two pipeline subtrees + a doc_id full-outer join and one
    small aggregate — no expansion nodes anywhere; x188 = AVI builder +
    header walker (two Python ops) + a map-side-combined aggregate."""
    _no_expansion(q("x187_crossmodal_pairs"))
    df = q("x188_video_source_profile")
    assert python_eval_count(df) == 2
    _no_expansion(df)
    _no_expansion(q("x189_r11f_ops_suite"))
    # w6 carries j13 → p2's distributed percentile machinery (scalar
    # broadcasts only) — same policy as the other m-fold suites
    from mariadb_postgres_migration_spark.plans import broadcast_build_subtrees

    df = q("w6_windowtemporal_suite")
    text = simple_plan(df)
    assert "CartesianProduct" not in text
    if "BroadcastNestedLoopJoin" in text:
        subs = broadcast_build_subtrees(df)
        assert any("keys=[]" in s for s in subs), (
            "nested-loop join without a 1-row scalar-aggregate build side"
        )
