"""Round-12 operator tests.

Wave 1 (VERDICT r11 'What's wrong: x189' / 'What's missing #2'): the
c7/c9/c10 memo caches added so x187 stops rebuilding the full c9 AND c10
chains (image decode + video decode + two c7 builds) inside one action —
each memo must obey the _C1_MANIFEST_CACHE contract (foreign-session
eviction on access, <= 1 live entry per sf_dir, frames survive a full
persist-pool release) and the memoized results must equal the
un-memoized pipelines row-for-row.
"""

from __future__ import annotations

from collections import Counter

import pytest

from mariadb_postgres_migration_spark import r9_queries as R9
from mariadb_postgres_migration_spark import r11_queries as R11
from mariadb_postgres_migration_spark.operators.dedup import (
    release_cached_intermediates,
)
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


def _assert_memo_contract(cache, access, spark, sf_dir, count_of):
    """The shared memo contract: dead-session keys evict on access, <= 1
    live entry per sf_dir, and the memoized frame survives a full
    persist-pool release (re-persist-on-access)."""
    cache[("dead-app-id", sf_dir)] = object()
    cache[("dead-app-id", "/elsewhere/sf9")] = object()
    got = access(spark, sf_dir)
    app = spark.sparkContext.applicationId
    assert all(k[0] == app for k in cache)
    per_sf = Counter(k[1] for k in cache)
    assert all(n == 1 for n in per_sf.values())
    n_rows = count_of(got)
    assert n_rows > 0
    release_cached_intermediates()
    assert count_of(access(spark, sf_dir)) == n_rows


def test_c7_manifest_cache_contract(spark, sf_dir):
    _assert_memo_contract(
        R9._C7_MANIFEST_CACHE, R9._c7_result, spark, sf_dir,
        lambda df: df.count(),
    )


def test_c9_frames_cache_contract(spark, sf_dir):
    _assert_memo_contract(
        R11._C9_FRAMES_CACHE, R11._c9_frames, spark, sf_dir,
        lambda st: st["result"].count(),
    )


def test_c10_frames_cache_contract(spark, sf_dir):
    _assert_memo_contract(
        R11._C10_FRAMES_CACHE, R11._c10_frames, spark, sf_dir,
        lambda st: st["result"].count(),
    )


def test_c7_memo_matches_pipeline(q, spark, sf_dir):
    """_c7_result is the SAME rows as the registered c7 pipeline — the
    memo is a materialization detail, never a semantic fork."""
    memo = R9._c7_result(spark, sf_dir)
    direct = q("c7_pretraining_pipeline")
    assert memo.columns == direct.columns
    assert memo.exceptAll(direct).count() == 0
    assert direct.exceptAll(memo).count() == 0


def test_x187_split_rc_matches_lazy_form(q, spark, sf_dir, monkeypatch):
    """The shipped lazy form and the MPS_X187_SPLIT=1 split-rc form
    (eager manifests, early release) must produce identical rows — the
    A/B flip is a physical-form switch only."""
    lazy = sorted(q("x187_crossmodal_pairs").collect())
    monkeypatch.setenv("MPS_X187_SPLIT", "1")
    rc = sorted(q("x187_crossmodal_pairs").collect())
    assert rc == lazy


# ---------------------------------------------------------------------------
# r12 fourth wave: the audio perceptual tier (WAV fixture builder, energy
# fingerprint, onset stats) — unit parity against the closed forms the
# oracles recompute, plus the decode-discipline devices (LIST chunk,
# silence, short clips).
# ---------------------------------------------------------------------------


def _audio_closed_form(text):
    """The fixture's documented closed form, independently transcribed:
    (spw, rate, v[64]) from the printable projection, or None."""
    import numpy as np

    b = "".join(ch for ch in (text or "") if " " <= ch <= "~").encode()
    n = len(b)
    if not n:
        return None
    first = b[0]
    m = min(n, 32)
    v = np.frombuffer(b, np.uint8)[(np.arange(64) * m) // 64].astype(
        np.int64
    )
    return 2 + first % 7, 8000 + (first % 8) * 1000, v


AUDIO_TEXTS = [
    (1, "hello world this is a longer test clip with some words"),
    (2, "Odd?"),                      # odd first byte -> LIST chunk
    (3, "a"),                         # 1-char intro
    (4, "x" * 200),                   # constant envelope -> all-zero hash
    (5, "The quick brown fox jumps over the lazy dog"),
]


def _audio_mm(spark, silent_mod=None):
    from mariadb_postgres_migration_spark.operators.multimodal import (
        attach_consistent_wav_payload,
    )

    docs = spark.createDataFrame(AUDIO_TEXTS, "doc_id long, text string")
    return attach_consistent_wav_payload(docs, silent_mod=silent_mod)


def test_wav_builder_roundtrip(spark):
    """Payloads are genuine RIFF/WAVE PCM: the real chunk walker decodes
    every one (including the odd-first LIST/INFO variant) to exactly the
    closed-form samples at the closed-form rate."""
    import numpy as np

    from mariadb_postgres_migration_spark.operators.multimodal import (
        decode_wav,
    )

    rows = {r["doc_id"]: bytes(r["payload"]) for r in _audio_mm(spark).collect()}
    assert set(rows) == {d for d, _ in AUDIO_TEXTS}
    for doc_id, text in AUDIO_TEXTS:
        spw, rate, v = _audio_closed_form(text)
        got = decode_wav(rows[doc_id])
        assert got is not None
        grate, arr = got
        assert grate == rate
        assert np.array_equal(arr, np.repeat(v, spw))
        # the odd-first device: a LIST chunk sits between fmt and data
        assert (b"LIST" in rows[doc_id]) == (text.encode()[0] % 2 == 1)


def test_audio_fingerprint_matches_closed_form(spark):
    """The kernel's 64-bit envelope hash equals the oracle's closed form
    (64·v_w² > Σv², strict, spw cancelled) bit-for-bit, and with_meta
    carries the exact integer stats."""
    from mariadb_postgres_migration_spark.operators.multimodal import (
        audio_energy_fingerprint,
    )

    got = {
        r["doc_id"]: r
        for r in audio_energy_fingerprint(
            _audio_mm(spark), with_meta=True
        ).collect()
    }
    for doc_id, text in AUDIO_TEXTS:
        spw, _, v = _audio_closed_form(text)
        total = int((v * v).sum())
        hi = 0
        lo = 0
        for k in range(32):
            hi = (hi << 1) | int(64 * int(v[k]) ** 2 > total)
        for k in range(32, 64):
            lo = (lo << 1) | int(64 * int(v[k]) ** 2 > total)
        r = got[doc_id]
        assert (r["h_hi"], r["h_lo"]) == (hi, lo), text
        assert r["n_samples"] == 64 * spw
        assert r["sum_sq"] == spw * total
        assert r["peak_abs"] == int(v.max())
    # constant envelope -> strict threshold never fires
    assert (got[4]["h_hi"], got[4]["h_lo"]) == (0, 0)


def test_audio_fingerprint_silent_and_rejects(spark):
    """silent_mod clips are spec-valid all-zero PCM (hash 0, sum_sq 0 —
    the c11 VAD-gate fixture); non-WAV payloads and sub-64-sample clips
    emit nothing."""
    from mariadb_postgres_migration_spark.operators.multimodal import (
        audio_energy_fingerprint,
    )
    from pyspark.sql import functions as F

    got = {
        r["doc_id"]: r
        for r in audio_energy_fingerprint(
            _audio_mm(spark, silent_mod=2), with_meta=True
        ).collect()
    }
    assert (got[2]["h_hi"], got[2]["h_lo"], got[2]["sum_sq"]) == (0, 0, 0)
    assert (got[4]["h_hi"], got[4]["h_lo"], got[4]["sum_sq"]) == (0, 0, 0)
    assert got[1]["sum_sq"] > 0
    # corrupt payloads (broken magic) emit nothing
    mm = _audio_mm(spark).select(
        "doc_id",
        F.concat(F.unhex(F.lit("0000")), F.col("payload")).alias("payload"),
    )
    assert audio_energy_fingerprint(mm).count() == 0
    # a truncated clip (< 64 samples) emits nothing: truncate the data
    # chunk by rewriting the payload to its first 100 bytes — the walker
    # rejects the truncated chunk body
    mm2 = _audio_mm(spark).select(
        "doc_id", F.expr("substring(payload, 1, 100)").alias("payload")
    )
    assert audio_energy_fingerprint(mm2).count() == 0


def test_audio_onset_stats_closed_form(spark):
    """n_onsets counts strict energy-doubling steps (spw cancels:
    v_w² > 2·v_{w-1}²) and peak_w is the FIRST argmax window."""
    import numpy as np

    from mariadb_postgres_migration_spark.operators.multimodal import (
        audio_onset_stats,
    )

    got = {
        r["doc_id"]: r for r in audio_onset_stats(_audio_mm(spark)).collect()
    }
    for doc_id, text in AUDIO_TEXTS:
        _, _, v = _audio_closed_form(text)
        sq = v * v
        assert got[doc_id]["n_onsets"] == int(np.sum(sq[1:] > 2 * sq[:-1]))
        assert got[doc_id]["peak_w"] == int(np.argmax(sq))


def test_audio_rows_plans(q):
    """Plan pins for the audio wave: x199 pays the builder + fingerprint
    Python pass (persisted sig lineage may reprint per consumer, never a
    distinct extra kernel), everything downstream is JVM-side, and no
    row plans a cartesian/nested-loop expansion (x200's exhaustive side
    is in-row combinations over the bounded panel)."""
    from mariadb_postgres_migration_spark.plans import python_eval_count
    from mariadb_postgres_migration_spark.plans.inspect import simple_plan

    def no_expansion(df):
        text = simple_plan(df)
        assert "CartesianProduct" not in text
        assert "BroadcastNestedLoopJoin" not in text

    df199 = q("x199_audio_neardup_keep_one")
    assert python_eval_count(df199) <= 4
    no_expansion(df199)
    no_expansion(q("x200_audio_neardup_recall"))
    no_expansion(q("x201_r12d_ops_suite"))
    no_expansion(q("m11_r8cd_suite"))


def test_c11_single_decode_pass_and_gates(q, spark, sf_dir):
    """c11's only Python surface is the builder + fingerprint pass
    (with_meta=True — VAD's sum_sq and the duration gate's n_samples
    ride the SAME Arrow pass); pairing, CC keep-one and the c7 join are
    JVM-side, nothing plans an expansion, and the gates have real teeth
    at this SF (corrupt, silent and micro-clip classes all non-empty and
    all absent from the result)."""
    from pyspark.sql import functions as F

    from mariadb_postgres_migration_spark.plans import python_eval_count
    from mariadb_postgres_migration_spark.plans.inspect import simple_plan
    from mariadb_postgres_migration_spark.r10_queries import C8_CORRUPT_MOD
    from mariadb_postgres_migration_spark.r12_queries import (
        C11_MIN_SAMPLES,
        C11_SILENT_MOD,
    )

    df = q("c11_audio_pipeline")
    # sig is consumed by pairs (2 sides), keep and qual; the c7 manifest
    # contributes its own bounded kernel lineage
    assert python_eval_count(df) <= 6
    text = simple_plan(df)
    assert "CartesianProduct" not in text
    assert "BroadcastNestedLoopJoin" not in text
    rows = df.collect()
    assert rows
    for r in rows:
        assert r["doc_id"] % C8_CORRUPT_MOD != 0          # decode gate
        assert r["doc_id"] % C11_SILENT_MOD != 0          # VAD gate
        assert r["n_samples"] >= C11_MIN_SAMPLES          # duration gate
    # each gated class is non-empty among the eligible corpus (the gates
    # are exercised, not vacuous)
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id")
        .collect()
    )
    ids = {r["doc_id"] for r in docs}
    assert any(d % C8_CORRUPT_MOD == 0 for d in ids)
    assert any(d % C11_SILENT_MOD == 0 for d in ids)
    survivors = {r["doc_id"] for r in rows}
    assert all(d % C11_SILENT_MOD != 0 for d in survivors)


def test_c11_frames_cache_contract(spark, sf_dir):
    from mariadb_postgres_migration_spark import r12_queries as R12

    _assert_memo_contract(
        R12._C11_FRAMES_CACHE, R12._c11_frames, spark, sf_dir,
        lambda st: st["result"].count(),
    )


def test_x206_trimodal_consistent_with_x187(q):
    """The tri-modal Venn must agree with the bimodal x187 audit on the
    image/video margins: per split, x187's n_both == n_all3 + n_img_vid
    and n_image_only == n_img_aud + n_img_only (an independent
    cross-check that the 3-way full-outer didn't drop or double-count a
    membership)."""
    tri = {r["split"]: r for r in q("x206_trimodal_pairs").collect()}
    bi = {r["split"]: r for r in q("x187_crossmodal_pairs").collect()}
    assert set(tri) == set(bi)
    for split, b in bi.items():
        t = tri[split]
        assert b["n_both"] == t["n_all3"] + t["n_img_vid"], split
        assert b["n_image_only"] == t["n_img_aud"] + t["n_img_only"], split
        assert b["n_video_only"] == t["n_vid_aud"] + t["n_vid_only"], split


def test_audio_delta_fingerprint_matches_closed_form(spark):
    """The delta kernel's 63 sign-of-energy-delta bits (+ pad-0 bit 63)
    equal the oracle's closed form (v_{k+1}² > v_k², strict, spw
    cancelled) bit-for-bit."""
    from mariadb_postgres_migration_spark.operators.multimodal import (
        audio_delta_fingerprint,
    )

    got = {
        r["doc_id"]: r
        for r in audio_delta_fingerprint(_audio_mm(spark)).collect()
    }
    for doc_id, text in AUDIO_TEXTS:
        _, _, v = _audio_closed_form(text)
        sq = v * v
        hi = 0
        lo = 0
        for k in range(32):
            hi = (hi << 1) | int(sq[k + 1] > sq[k])
        for k in range(32, 63):
            lo = (lo << 1) | int(sq[k + 1] > sq[k])
        lo <<= 1  # pad bit 63
        r = got[doc_id]
        assert (r["h_hi"], r["h_lo"]) == (hi, lo), text
    # constant envelope -> no strict increase anywhere
    assert (got[4]["h_hi"], got[4]["h_lo"]) == (0, 0)


def test_x209_dual_distances_independent(q):
    """x209's two distances come from genuinely different bit rules: on
    the envelope-banded pairs, ham_e <= 3 always (the candidate
    contract) while ham_d is free to disagree — and both columns must be
    present per pair."""
    rows = q("x209_audio_dualhash_pairs").collect()
    for r in rows:
        assert r["ham_e"] <= 3
        assert 0 <= r["ham_d"] <= 64


def test_wave8_rows_plans(q):
    from mariadb_postgres_migration_spark.plans.inspect import simple_plan

    for name in (
        "x208_audio_delta_fingerprint",
        "x209_audio_dualhash_pairs",
        "x210_r12h_ops_suite",
        "m15_streaming_suite",
    ):
        text = simple_plan(q(name))
        assert "CartesianProduct" not in text, name
        assert "BroadcastNestedLoopJoin" not in text, name


def test_video_keyframe_ahashes_both_frames(spark):
    """One Arrow pass must emit frame-0 columns byte-identical to
    video_frame_ahash AND last-frame columns equal to hashing the
    decoded LAST '00dc' frame directly — proving both signatures come
    from real decoded pixels of the right keyframes."""
    import numpy as np

    from mariadb_postgres_migration_spark.operators.jpeg import (
        decode_jpeg_pixels,
    )
    from mariadb_postgres_migration_spark.operators.multimodal import (
        attach_consistent_avi_payload,
        parse_avi_video_chunks,
        resize_nearest,
        video_frame_ahash,
        video_keyframe_ahashes,
    )

    def ahash(arr):
        s = resize_nearest(arr.astype(np.int64), 8, 8).reshape(-1)
        total = int(s.sum())
        hi = lo = 0
        for k in range(32):
            hi = (hi << 1) | int(64 * int(s[k]) > total)
        for k in range(32, 64):
            lo = (lo << 1) | int(64 * int(s[k]) > total)
        return hi, lo

    # 'P' -> nf = 2 + 80 % 3 = 3 stored frames, so last != first
    text = "Pack my box with five dozen liquor jugs!! " * 3
    docs = spark.createDataFrame([(5, text)], "doc_id long, text string")
    mm = attach_consistent_avi_payload(docs)
    frames = parse_avi_video_chunks(bytes(mm.select("payload").collect()[0][0]))
    assert len(frames) >= 2, "fixture must store multiple frames"
    row = video_keyframe_ahashes(mm).collect()[0]
    f0 = video_frame_ahash(mm).collect()[0]
    assert (row["h_hi"], row["h_lo"]) == (f0["h_hi"], f0["h_lo"])
    assert (row["l_hi"], row["l_lo"]) == ahash(decode_jpeg_pixels(frames[-1]))
    # non-AVI payloads emit nothing
    junk = spark.createDataFrame(
        [(4, bytearray(b"RIFFxxxxWAVE"))], "doc_id long, payload binary"
    )
    assert video_keyframe_ahashes(junk).count() == 0


def test_x212_dual_distances_independent(q):
    """x212's two distances come from different keyframes: on the
    frame-0-banded pairs, ham_0 <= 3 always (the candidate contract)
    while the last-frame ham_z is free to disagree — and both columns
    must be present per pair."""
    rows = q("x212_video_dualframe_pairs").collect()
    for r in rows:
        assert r["ham_0"] <= 3
        assert 0 <= r["ham_z"] <= 64


def test_wave9_rows_plans(q):
    """No-expansion pins for the ninth wave. m16 carries m4 → x162 →
    x161's curriculum boundary frame, whose crossJoin against a 1-row
    scalar aggregate is the sanctioned broadcast shape
    (tests/test_r11_plans.py::test_x177_m4_suites_no_expansion) — m16
    allows exactly that build-side shape but still forbids a true
    CartesianProduct."""
    from mariadb_postgres_migration_spark.plans import broadcast_build_subtrees
    from mariadb_postgres_migration_spark.plans.inspect import simple_plan

    for name in (
        "x211_video_lastframe_ahash",
        "x212_video_dualframe_pairs",
        "x213_r12i_ops_suite",
    ):
        text = simple_plan(q(name))
        assert "CartesianProduct" not in text, name
        assert "BroadcastNestedLoopJoin" not in text, name
    df = q("m16_r10bcde_suite")
    text = simple_plan(df)
    assert "CartesianProduct" not in text
    if "BroadcastNestedLoopJoin" in text:
        subs = broadcast_build_subtrees(df)
        assert any("keys=[]" in s for s in subs), (
            "nested-loop join without a 1-row scalar-aggregate build side"
        )


def test_audio_dual_fingerprints_single_pass_parity(spark):
    """The one-pass dual kernel's columns equal the two standalone
    fingerprint operators bit-for-bit — the single-pass form is a
    materialization detail, never a semantic fork."""
    from mariadb_postgres_migration_spark.operators.multimodal import (
        audio_delta_fingerprint,
        audio_dual_fingerprints,
        audio_energy_fingerprint,
    )

    mm = _audio_mm(spark)
    dual = {r["doc_id"]: r for r in audio_dual_fingerprints(mm).collect()}
    env = {r["doc_id"]: r for r in audio_energy_fingerprint(mm).collect()}
    dlt = {r["doc_id"]: r for r in audio_delta_fingerprint(mm).collect()}
    assert set(dual) == set(env) == set(dlt)
    for doc_id, r in dual.items():
        assert (r["h_hi"], r["h_lo"]) == (env[doc_id]["h_hi"], env[doc_id]["h_lo"])
        assert (r["d_hi"], r["d_lo"]) == (dlt[doc_id]["h_hi"], dlt[doc_id]["h_lo"])


def test_dualverified_never_merges_more(q):
    """Filtering candidate edges by the second signature can only SPLIT
    clusters: the dual-verified keep-one must have at least as many
    survivors as the single-signature tier, on both modalities, and
    every dual-confirmed group must sit inside a single-signature
    group."""
    for dual_name, single_name in (
        ("x214_video_dualverified_keep_one", "x190_video_neardup_keep_one"),
        ("x215_audio_dualverified_keep_one", "x199_audio_neardup_keep_one"),
    ):
        dual = {r["doc_id"]: r["rep"] for r in q(dual_name).collect()}
        single = {r["doc_id"]: r["rep"] for r in q(single_name).collect()}
        assert set(dual) == set(single), dual_name
        n_dual = len(set(dual.values()))
        n_single = len(set(single.values()))
        assert n_dual >= n_single, (dual_name, n_dual, n_single)
        # same dual rep -> same single rep (group refinement)
        by_dual_rep = {}
        for doc, rep in dual.items():
            by_dual_rep.setdefault(rep, set()).add(single[doc])
        assert all(len(s) == 1 for s in by_dual_rep.values()), dual_name


def test_wave10_rows_plans(q):
    """No-expansion pins for the tenth wave. m17 carries m6 → x145 →
    x144's <=3-row split-pair inequality join — the bounded nested-loop
    shape test_plans sanctions (<=2 such nodes, the m6 precedent in
    tests/test_r11_plans.py); a cartesian is still forbidden."""
    import re

    from mariadb_postgres_migration_spark.plans.inspect import (
        formatted_plan,
        simple_plan,
    )

    for name in (
        "x214_video_dualverified_keep_one",
        "x215_audio_dualverified_keep_one",
        "x216_r12j_ops_suite",
    ):
        text = simple_plan(q(name))
        assert "CartesianProduct" not in text, name
        assert "BroadcastNestedLoopJoin" not in text, name
    text = formatted_plan(q("m17_r10fg9bc_suite"))
    assert "CartesianProduct" not in text
    n_bnlj = len(re.findall(
        r"^\(\d+\) BroadcastNestedLoopJoin\b", text, re.MULTILINE
    ))
    assert n_bnlj <= 2, f"m17: {n_bnlj} nested-loop joins"


def test_c12_c13_pipeline_gates(q):
    """Every c12/c13 output row passed the corrupt gate, the (c13)
    silence gate and the duration gate — the stage semantics hold on
    the delivered manifest, not just inside the oracle."""
    rows = q("c12_video_dual_pipeline").collect()
    assert rows, "c12 empty — vacuous pipeline"
    for r in rows:
        assert r["n_frames"] >= 3
        assert r["doc_id"] % 13 != 0  # corrupt gate
    rows = q("c13_audio_dual_pipeline").collect()
    assert rows, "c13 empty — vacuous pipeline"
    for r in rows:
        assert r["n_samples"] >= 256
        assert r["doc_id"] % 13 != 0  # corrupt gate
        assert r["doc_id"] % 6 != 0  # VAD silence gate


def test_c13_refines_c11(q):
    """c13's edge set is c11's FILTERED by the delta confirm (same
    banded generator on both), so its clusters refine and its manifest
    is a SUPERSET of c11's. No such relation holds between c12 and c10:
    c10's dedup is EXACT signature grouping while c12's is the banded
    tier, and the stop-bucket cap means banded edges do not contain the
    exact-equality groups — c12 vs the single BANDED tier is covered by
    test_dualverified_never_merges_more on x214/x190 instead."""
    c11 = {r["doc_id"] for r in q("c11_audio_pipeline").collect()}
    c13 = {r["doc_id"] for r in q("c13_audio_dual_pipeline").collect()}
    assert c11 <= c13, c11 - c13


def test_wave11_rows_plans(q):
    """No-expansion pins for the eleventh wave. m18 carries m7/m8 whose
    members were pinned clean in r11 — but the composed depth can
    surface the sanctioned bounded nested-loop shapes, so the pin
    forbids a true cartesian and caps BNLJ nodes at 2 (the m6/m17
    precedent)."""
    import re

    from mariadb_postgres_migration_spark.plans.inspect import (
        formatted_plan,
        simple_plan,
    )

    for name in (
        "c12_video_dual_pipeline",
        "c13_audio_dual_pipeline",
        "x217_r12k_ops_suite",
    ):
        text = simple_plan(q(name))
        assert "CartesianProduct" not in text, name
        assert "BroadcastNestedLoopJoin" not in text, name
    text = formatted_plan(q("m18_r9d10h11bc_suite"))
    assert "CartesianProduct" not in text
    n_bnlj = len(re.findall(
        r"^\(\d+\) BroadcastNestedLoopJoin\b", text, re.MULTILINE
    ))
    assert n_bnlj <= 2, f"m18: {n_bnlj} nested-loop joins"


def test_dual_sheets_protection_semantics(q):
    """The dual tier confirms a SUBSET of the single tier's edges, so
    per source: dual survivors >= single survivors, n_protected is
    exactly the difference, and every count is bounded by the source's
    clip count."""
    for name, n_col in (
        ("x218_video_dual_source_sheet", "n_videos"),
        ("x219_audio_dual_source_sheet", "n_clips"),
    ):
        rows = q(name).collect()
        assert rows, name
        for r in rows:
            assert r["n_survivors_dual"] >= r["n_survivors_single"], name
            assert (
                r["n_protected"]
                == r["n_survivors_dual"] - r["n_survivors_single"]
            ), name
            assert r["n_survivors_dual"] <= r[n_col], name


def test_wave12_rows_plans(q):
    """No-expansion pins for the twelfth wave. m19 carries m10 → x128's
    KS-drift / x133's Gini scalar aggregates whose crossJoins against
    1-row scalar-aggregate build sides are the sanctioned broadcast
    shape (tests/test_r12_plans.py::test_m10_x198_suites_no_expansion)
    — m19 allows exactly that build-side shape but still forbids a true
    CartesianProduct."""
    from mariadb_postgres_migration_spark.plans import broadcast_build_subtrees
    from mariadb_postgres_migration_spark.plans.inspect import simple_plan

    for name in (
        "x218_video_dual_source_sheet",
        "x219_audio_dual_source_sheet",
        "x220_r12l_ops_suite",
    ):
        text = simple_plan(q(name))
        assert "CartesianProduct" not in text, name
        assert "BroadcastNestedLoopJoin" not in text, name
    df = q("m19_r8ab11de_suite")
    text = simple_plan(df)
    assert "CartesianProduct" not in text
    if "BroadcastNestedLoopJoin" in text:
        subs = broadcast_build_subtrees(df)
        assert any("keys=[]" in s for s in subs), (
            "nested-loop join without a 1-row scalar-aggregate build side"
        )


def test_wave7_rows_plans(q):
    """No-expansion pins for the seventh wave; x205's probe join and
    x206's two full-outer manifest joins stay equi-joins."""
    from mariadb_postgres_migration_spark.plans.inspect import simple_plan

    for name in (
        "x205_incremental_audio_dedup",
        "x206_trimodal_pairs",
        "x207_r12g_ops_suite",
        "m14_sigmodal_suite",
    ):
        text = simple_plan(q(name))
        assert "CartesianProduct" not in text, name
        assert "BroadcastNestedLoopJoin" not in text, name


def test_audio_sheet_rows_plans(q):
    """No-expansion pins for the sixth wave and its funding rows. m13 is
    pinned separately: its t4 member embeds the q_scalar suite, whose
    1-row scalar aggregates legitimately cross-join as
    BroadcastNestedLoopJoin (1-row build sides, bounded at any SF) — so
    m13 allows BNLJ but still forbids a true CartesianProduct."""
    from mariadb_postgres_migration_spark.plans.inspect import simple_plan

    for name in (
        "x202_audio_onset_screen",
        "x203_audio_neardup_source_sheet",
        "x204_r12f_ops_suite",
        "m12_embsetwin_suite",
    ):
        text = simple_plan(q(name))
        assert "CartesianProduct" not in text, name
        assert "BroadcastNestedLoopJoin" not in text, name
    assert "CartesianProduct" not in simple_plan(q("m13_joinprofile_suite"))
