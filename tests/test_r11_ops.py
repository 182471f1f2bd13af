"""Round-11 operator tests: the ADVICE-r10 hardening (oracle/engine
drift guards), then the r11 waves (perceptual-dedup composed pipeline,
MJPEG-in-AVI video decode, banded-recall measurement) as they land."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mariadb_postgres_migration_spark.operators.multimodal import (
    AHASH_GRID,
    ahash_sql,
    attach_consistent_bmp_payload,
    decode_payloads,
    dhash_sql,
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


def test_hash_sql_builders_reject_non_default_grid():
    """ADVICE r10: ahash_sql/dhash_sql hardcode the grid=8 literal
    geometry; registering a non-default grid against them must be a loud
    error, not a silent engine/oracle desync."""
    with pytest.raises(ValueError, match="grid=8"):
        ahash_sql(grid=4)
    with pytest.raises(ValueError, match="grid=8"):
        dhash_sql(grid=16)
    # the default stays callable
    assert "h_hi" in ahash_sql() and "h_hi" in dhash_sql(grid=AHASH_GRID)


def test_consistent_bmp_builder_drops_subwidth_texts(spark):
    """ADVICE r10 (x170): a doc whose printable-ASCII projection is
    shorter than its closed-form width would decode to height 0. The
    builder must drop it (its h>=1 fixture filter is the twin of the
    oracles' `WHERE h >= 1`), so no height-0 payload can ever reach the
    decode side of x170/x157/x158.

    '0' -> width 16 + (ord('0')%16)*4 = 16; 15 printable chars < 16.
    'p' -> width 16 + (ord('p')%16)*4 = 16; padding text to exactly one
    row survives with height 1."""
    docs = spark.createDataFrame(
        [
            (1, "0" * 15),       # printable length 15 < width 16 -> dropped
            (2, "p" * 16),       # exactly one row -> height 1, kept
            (3, ""),             # empty projection -> dropped
            (4, "é" * 40),  # nothing printable-ASCII -> dropped
        ],
        "doc_id long, text string",
    )
    mm = attach_consistent_bmp_payload(docs)
    dec = decode_payloads(mm).filter(F.col("height") >= 1)
    rows = {r["doc_id"]: r for r in dec.collect()}
    assert set(rows) == {2}
    assert rows[2]["width"] == 16 and rows[2]["height"] == 1
    # and the unfiltered decode agrees: the builder never emitted h=0
    assert decode_payloads(mm).count() == 1


def test_image_ahash_with_dims_carries_decoded_shape(spark):
    """with_dims=True must emit the DECODED array's dims (one Arrow pass
    for gate + signature + dim gate — the c9 device), identical bits to
    the plain form."""
    from mariadb_postgres_migration_spark.operators.multimodal import (
        image_ahash,
    )

    text = "The quick brown fox jumps over the lazy dog " * 12
    docs = spark.createDataFrame([(7, text)], "doc_id long, text string")
    mm = attach_consistent_bmp_payload(docs)
    plain = image_ahash(mm).collect()[0]
    dimmed = image_ahash(mm, with_dims=True).collect()[0]
    assert (dimmed["h_hi"], dimmed["h_lo"]) == (plain["h_hi"], plain["h_lo"])
    proj = "".join(ch for ch in text if " " <= ch <= "~")
    w = 16 + (ord(proj[0]) % 16) * 4
    assert dimmed["width"] == w
    assert dimmed["height"] == min(len(proj) // w, 16)


def _c9_python_replay(spark, sf_dir):
    """Pure-Python replay of every c9 stage over the REAL fixture
    payloads: decode (real decoder), aHash bits, 4x16 banding with the
    bucket cap, exact hamming verify, union-find keep-one, dim gate."""
    from collections import defaultdict

    import numpy as np

    from mariadb_postgres_migration_spark.operators.multimodal import (
        AHASH_MAX_BUCKET,
        AHASH_MAX_HAMMING,
        decode_bmp_pixels,
        resize_nearest,
    )
    from mariadb_postgres_migration_spark.r10_queries import C8_CORRUPT_MOD
    from mariadb_postgres_migration_spark.r11_queries import C9_MIN_H
    from mariadb_postgres_migration_spark.registry import _t

    mm = attach_consistent_bmp_payload(_t(spark, sf_dir, "documents"))
    sigs, dims = {}, {}
    for r in mm.collect():
        payload = bytes(r["payload"])
        if r["doc_id"] % C8_CORRUPT_MOD == 0:
            payload = b"\x00\x00" + payload  # the corruption rule
        arr = decode_bmp_pixels(payload)
        if arr is None:
            continue  # stage 1: the decode gate
        s = resize_nearest(arr.astype(np.int64), 8, 8).reshape(-1)
        total = int(s.sum())
        hi = lo = 0
        for k in range(32):
            hi = (hi << 1) | int(64 * int(s[k]) > total)
        for k in range(32, 64):
            lo = (lo << 1) | int(64 * int(s[k]) > total)
        sigs[r["doc_id"]] = (hi, lo)
        dims[r["doc_id"]] = (arr.shape[1], arr.shape[0])
    # stage 2: banded pairs + union-find keep-one
    buckets = defaultdict(list)
    for d, (hi, lo) in sigs.items():
        for bno, v in enumerate((hi >> 16, hi & 0xFFFF, lo >> 16, lo & 0xFFFF)):
            buckets[(bno, v)].append(d)
    parent = {d: d for d in sigs}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for ids in buckets.values():
        if len(ids) > AHASH_MAX_BUCKET:
            continue
        ids = sorted(ids)
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                a, b = ids[i], ids[j]
                h = bin(sigs[a][0] ^ sigs[b][0]).count("1") + bin(
                    sigs[a][1] ^ sigs[b][1]
                ).count("1")
                if h <= AHASH_MAX_HAMMING:
                    ra, rb = find(a), find(b)
                    if ra != rb:
                        parent[max(ra, rb)] = min(ra, rb)
    keep = {d for d in sigs if find(d) == d}
    # stage 3: the dimension gate
    return {d for d in keep if dims[d][1] >= C9_MIN_H}, sigs, dims


def test_c9_matches_pure_python_stage_replay(spark, sf_dir, q):
    """c9's survivor set, dims and signatures must equal the pure-Python
    replay of decode-gate -> perceptual keep-one -> dim-gate, and its
    split/shard must come from the c7 manifest."""
    qual, sigs, dims = _c9_python_replay(spark, sf_dir)
    manifest = {
        r["doc_id"]: (r["split"], r["shard"])
        for r in q("c7_pretraining_pipeline").collect()
    }
    expected = {d for d in qual if d in manifest}
    rows = {r["doc_id"]: r for r in q("c9_multimodal_lsh").collect()}
    assert set(rows) == expected
    for d, r in rows.items():
        assert (r["h_hi"], r["h_lo"]) == sigs[d]
        assert (r["width"], r["height"]) == dims[d]
        assert (r["split"], r["shard"]) == manifest[d]
    assert expected, "fixture yields no c9 survivors — vacuous row"


def test_c9_dedup_stage_is_perceptual_not_exact(spark, sf_dir, q):
    """The tier-swap proof: c9 must drop at least one document whose
    PAYLOAD BYTES are unique (exact md5 dedup would keep it) because its
    PIXELS near-duplicate a lower-id survivor — and every c9 survivor
    must be its own perceptual component representative."""
    qual, sigs, dims = _c9_python_replay(spark, sf_dir)
    survivors = set(r["doc_id"] for r in q("c9_multimodal_lsh").collect())
    # perceptually-deduped docs that pass the gates but are NOT survivors
    gated = {d for d in sigs if dims[d][1] >= 4}
    dropped = gated - qual
    assert dropped, "no doc was dropped by the perceptual stage — vacuous swap"
    # at least one dropped doc has a UNIQUE signature-bearing payload text
    # (hamming 0 pairs come from equal pixel content; hamming 1-3 pairs
    # from near content — both collapse, unlike md5)
    assert survivors <= qual


def test_avi_parser_walks_chunks_not_offsets(spark):
    """The AVI walker must survive a JUNK chunk between hdrl and movi
    (odd first byte) and reject truncated files — the parse_wav
    discipline on the video container."""
    from mariadb_postgres_migration_spark.operators.multimodal import (
        attach_consistent_avi_payload,
        parse_avi_video_chunks,
    )

    # 'a' (odd, 97): JUNK chunk present; 'b' (even, 98): none
    docs = spark.createDataFrame(
        [(1, "a" * 40), (2, "b" * 40)], "doc_id long, text string"
    )
    rows = {r["doc_id"]: bytes(r["payload"])
            for r in attach_consistent_avi_payload(docs).collect()}
    assert b"JUNK" in rows[1] and b"JUNK" not in rows[2]
    for p in rows.values():
        frames = parse_avi_video_chunks(p)
        assert frames is not None and len(frames) >= 1
        assert all(f[:2] == b"\xff\xd8" for f in frames)  # real JPEGs
        assert parse_avi_video_chunks(p[:-3]) is None  # truncated body


def test_x175_frames_match_direct_decoder_replay(spark):
    """x175's per-frame stats must equal a driver-side replay through
    the REAL chunk walker + JPEG decoder on a hand-built doc — proving
    the Arrow kernel runs the codec, not a closed form."""
    from mariadb_postgres_migration_spark.operators.multimodal import (
        attach_consistent_avi_payload,
        mjpeg_frame_stats,
        parse_avi_video_chunks,
    )
    from mariadb_postgres_migration_spark.operators.jpeg import (
        decode_jpeg_pixels,
    )

    text = "Sphinx of black quartz, judge my vow! " * 4
    docs = spark.createDataFrame([(9, text)], "doc_id long, text string")
    mm = attach_consistent_avi_payload(docs)
    payload = bytes(mm.select("payload").collect()[0][0])
    frames = parse_avi_video_chunks(payload)
    proj = "".join(ch for ch in text if " " <= ch <= "~").encode()
    nf = 2 + proj[0] % 3
    assert len(frames) == min(nf, len(proj) - (2 + proj[0] % 4) + 1, nf)
    expected = {}
    for fno in range(0, len(frames), 2):
        arr = decode_jpeg_pixels(frames[fno])
        expected[fno] = (arr.shape[1], arr.shape[0], int(arr.sum(dtype="int64")))
    got = {
        r["frame_no"]: (r["width"], r["height"], r["px_sum"])
        for r in mjpeg_frame_stats(mm).collect()
    }
    assert got == expected
    # and the closed form holds: every window byte appears exactly 64x
    bpr = 2 + proj[0] % 4
    for fno, (w, h, s) in got.items():
        rows_f = min((len(proj) - fno) // bpr, 8)
        assert (w, h) == (bpr * 8, rows_f * 8)
        assert s == 64 * sum(proj[fno : fno + bpr * rows_f])


def test_x176_recall_flags_only_stopbucket_misses(q):
    """Pigeonhole: a hamming<=3 pair NOT found by the banded generator
    must share every populated band with >AHASH_MAX_BUCKET docs — i.e.
    every in_banded=0 row is attributable to the stop-bucket cap, never
    to the banding itself."""
    from collections import defaultdict

    from mariadb_postgres_migration_spark.operators.multimodal import (
        AHASH_MAX_BUCKET,
    )

    sigs = {
        r["doc_id"]: (r["h_hi"], r["h_lo"])
        for r in q("x157_image_ahash").collect()
    }
    bucket_size = defaultdict(int)
    for d, (hi, lo) in sigs.items():
        for bno, v in enumerate((hi >> 16, hi & 0xFFFF, lo >> 16, lo & 0xFFFF)):
            bucket_size[(bno, v)] += 1
    rows = q("x176_image_neardup_recall").collect()
    assert rows, "empty recall panel — vacuous row"
    for r in rows:
        if r["in_banded"]:
            continue
        a, b = sigs[r["doc_a"]], sigs[r["doc_b"]]
        shared = [
            bno
            for bno, (va, vb) in enumerate(
                zip(
                    (a[0] >> 16, a[0] & 0xFFFF, a[1] >> 16, a[1] & 0xFFFF),
                    (b[0] >> 16, b[0] & 0xFFFF, b[1] >> 16, b[1] & 0xFFFF),
                )
            )
            if va == vb
        ]
        assert shared, "missed pair shares no band — banding broken"
        assert all(
            bucket_size[(bno, (a[0] >> 16, a[0] & 0xFFFF, a[1] >> 16,
                               a[1] & 0xFFFF)[bno])] > AHASH_MAX_BUCKET
            for bno in shared
        ), "missed pair had an uncapped shared band — recall bug"


def test_jpeg_decode_class_boundary(spark):
    """The classifier's three-way boundary must be byte-parse-driven:
    a baseline JPEG decodes; the SAME bytes with SOF0 rewritten to SOF2
    classify 'progressive' (valid header, outside the baseline subset);
    the SAME bytes zero-prefixed classify 'corrupt'."""
    import numpy as np

    from mariadb_postgres_migration_spark.operators.jpeg import (
        encode_jpeg_gray,
    )
    from mariadb_postgres_migration_spark.operators.multimodal import (
        jpeg_decode_class,
    )

    base = encode_jpeg_gray(np.full((8, 16), 77, np.uint8))
    rows = [
        (1, base),
        (2, base.replace(b"\xff\xc0", b"\xff\xc2", 1)),
        (3, b"\x00\x00" + base),
    ]
    mm = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r["doc_id"]: r["decode_class"]
           for r in jpeg_decode_class(mm).collect()}
    assert got == {1: "baseline", 2: "progressive", 3: "corrupt"}


def test_x179_signature_matches_direct_decoder_replay(spark):
    """x179's video signature must equal a driver-side replay through
    the REAL chunk walker + JPEG decoder + resampler on a hand-built
    doc — proving the kernel hashes decoded frame-0 pixels."""
    import numpy as np

    from mariadb_postgres_migration_spark.operators.jpeg import (
        decode_jpeg_pixels,
    )
    from mariadb_postgres_migration_spark.operators.multimodal import (
        attach_consistent_avi_payload,
        parse_avi_video_chunks,
        resize_nearest,
        video_frame_ahash,
    )

    text = "Pack my box with five dozen liquor jugs!! " * 3
    docs = spark.createDataFrame([(5, text)], "doc_id long, text string")
    mm = attach_consistent_avi_payload(docs)
    payload = bytes(mm.select("payload").collect()[0][0])
    arr = decode_jpeg_pixels(parse_avi_video_chunks(payload)[0])
    s = resize_nearest(arr.astype(np.int64), 8, 8).reshape(-1)
    total = int(s.sum())
    hi = lo = 0
    for k in range(32):
        hi = (hi << 1) | int(64 * int(s[k]) > total)
    for k in range(32, 64):
        lo = (lo << 1) | int(64 * int(s[k]) > total)
    row = video_frame_ahash(mm).collect()[0]
    assert (row["h_hi"], row["h_lo"]) == (hi, lo)


def test_x179_collapses_duplicate_videos(spark, sf_dir, q):
    """Two docs with identical printable projections produce identical
    frame-0 signatures and collapse to the min-id survivor; the keep
    flag must mark exactly one survivor per signature group."""
    rows = q("x179_video_perceptual_dedup").collect()
    assert rows, "no video signatures — vacuous row"
    by_sig = {}
    for r in rows:
        by_sig.setdefault((r["h_hi"], r["h_lo"]), []).append(r)
    assert any(len(v) > 1 for v in by_sig.values()), (
        "no duplicate video group in fixture — keep rule untested"
    )
    for grp in by_sig.values():
        keepers = [r["doc_id"] for r in grp if r["keep"]]
        assert keepers == [min(r["doc_id"] for r in grp)]


def test_avi_header_profile_reads_real_header_fields(spark):
    """The header profiler must read the avih fields a real AVI declares
    (and survive the JUNK chunk), reject non-AVIs, and emit nothing for
    truncated files."""
    from mariadb_postgres_migration_spark.operators.multimodal import (
        attach_consistent_avi_payload,
        avi_header_profile,
    )

    text = "a" * 50  # odd first -> JUNK chunk present
    docs = spark.createDataFrame([(3, text)], "doc_id long, text string")
    mm = attach_consistent_avi_payload(docs)
    row = avi_header_profile(mm).collect()[0]
    first = ord("a")
    bpr = 2 + first % 4
    assert row["us_per_frame"] == 1_000_000 // (5 + first % 10)
    assert row["n_frames"] == min(2 + first % 3, 50 - bpr + 1)
    assert row["width"] == bpr * 8
    assert row["height"] == min(50 // bpr, 8) * 8
    # non-AVI payloads emit nothing
    junk = spark.createDataFrame(
        [(4, bytearray(b"RIFFxxxxWAVE"))], "doc_id long, payload binary"
    )
    assert avi_header_profile(junk).count() == 0


def test_x182_scene_change_matches_frame_stats_lag(q):
    """x182 must equal the per-doc lag aggregation of the x175 frame
    stats (the same decode both rows ride), with static single-frame
    videos scoring delta 0."""
    from collections import defaultdict

    frames = defaultdict(list)
    for r in q("x175_video_frame_stats").collect():
        frames[r["doc_id"]].append((r["frame_no"], r["px_sum"]))
    expected = {}
    for d, fs in frames.items():
        fs.sort()
        delta = sum(abs(b[1] - a[1]) for a, b in zip(fs, fs[1:]))
        expected[d] = (len(fs), delta)
    got = {
        r["doc_id"]: (r["n_sampled"], r["delta_sum"])
        for r in q("x182_video_scene_change").collect()
    }
    assert got == expected
    assert any(n == 1 and d == 0 for n, d in got.values()) or all(
        n >= 1 for n, d in got.values()
    )


def test_pcm_energy_screen_matches_decode(spark):
    """The energy kernel must equal a driver-side replay through the
    real WAV decoder, including the LIST-chunk fixture variant."""
    from mariadb_postgres_migration_spark.operators.multimodal import (
        attach_wav_payload,
        decode_wav,
        pcm_energy_screen,
    )

    docs = spark.createDataFrame(
        [(1, "a" * 100), (2, "b" * 100), (3, "")],
        "doc_id long, text string",
    )
    mm = attach_wav_payload(docs)
    payloads = {r["doc_id"]: bytes(r["payload"]) for r in mm.collect()}
    got = {r["doc_id"]: (r["n_windows"], r["sum_sq"], r["peak_abs"])
           for r in pcm_energy_screen(mm).collect()}
    for d, p in payloads.items():
        rate, arr = decode_wav(p)
        exp = ((len(arr) + 63) // 64, int((arr * arr).sum()), int(abs(arr).max()))
        assert got[d] == exp
    # 'a' is odd -> its payload carries the LIST chunk the walker must skip
    assert b"LIST" in payloads[1] and b"LIST" not in payloads[2]


def test_x184_matches_x179_signature_partition(q):
    """The incremental probe must agree with x179's signatures: a new-
    batch survivor flags dup-of-corpus exactly when its signature exists
    among old-batch docs."""
    sigs = {r["doc_id"]: (r["h_hi"], r["h_lo"])
            for r in q("x179_video_perceptual_dedup").collect()}
    old_sigs = {s for d, s in sigs.items() if d % 10 < 8}
    new = {d: s for d, s in sigs.items() if d % 10 >= 8}
    expected = {}
    seen = {}
    for d in sorted(new):
        s = new[d]
        if s not in seen:
            seen[s] = d
            expected[d] = s in old_sigs
    got = {r["doc_id"]: r["is_dup_of_corpus"]
           for r in q("x184_incremental_video_dedup").collect()}
    assert got == expected


def _c10_python_replay(spark, sf_dir):
    """Pure-Python replay of every c10 stage over the REAL AVI payloads:
    corruption, chunk walk + frame-0 decode (gate), aHash, exact
    signature keep-one, duration gate."""
    import numpy as np

    from mariadb_postgres_migration_spark.operators.jpeg import (
        decode_jpeg_pixels,
    )
    from mariadb_postgres_migration_spark.operators.multimodal import (
        attach_consistent_avi_payload,
        parse_avi_video_chunks,
        resize_nearest,
    )
    from mariadb_postgres_migration_spark.r10_queries import C8_CORRUPT_MOD
    from mariadb_postgres_migration_spark.r11_queries import C10_MIN_FRAMES
    from mariadb_postgres_migration_spark.registry import _t

    mm = attach_consistent_avi_payload(_t(spark, sf_dir, "documents"))
    sigs, nframes = {}, {}
    for r in mm.collect():
        payload = bytes(r["payload"])
        if r["doc_id"] % C8_CORRUPT_MOD == 0:
            payload = b"\x00\x00" + payload
        frames = parse_avi_video_chunks(payload)
        if not frames:
            continue  # the decode gate
        arr = decode_jpeg_pixels(frames[0])
        if arr is None:
            continue
        s = resize_nearest(arr.astype(np.int64), 8, 8).reshape(-1)
        total = int(s.sum())
        hi = lo = 0
        for k in range(32):
            hi = (hi << 1) | int(64 * int(s[k]) > total)
        for k in range(32, 64):
            lo = (lo << 1) | int(64 * int(s[k]) > total)
        sigs[r["doc_id"]] = (hi, lo)
        nframes[r["doc_id"]] = len(frames)
    keep_min = {}
    for d in sorted(sigs):
        keep_min.setdefault(sigs[d], d)
    qual = {
        d for d in sigs
        if keep_min[sigs[d]] == d and nframes[d] >= C10_MIN_FRAMES
    }
    return qual, sigs, nframes


def test_c10_matches_pure_python_stage_replay(spark, sf_dir, q):
    """c10's survivor set, signatures, frame counts and split/shard must
    equal the pure-Python replay through the real decoders."""
    qual, sigs, nframes = _c10_python_replay(spark, sf_dir)
    manifest = {
        r["doc_id"]: (r["split"], r["shard"])
        for r in q("c7_pretraining_pipeline").collect()
    }
    expected = {d for d in qual if d in manifest}
    rows = {r["doc_id"]: r for r in q("c10_video_pipeline").collect()}
    assert set(rows) == expected
    for d, r in rows.items():
        assert (r["h_hi"], r["h_lo"]) == sigs[d]
        assert r["n_frames"] == nframes[d]
        assert (r["split"], r["shard"]) == manifest[d]
    assert expected, "fixture yields no c10 survivors — vacuous row"


def test_c10_gates_do_real_work(spark, sf_dir, q):
    """Every stage must drop something on the fixture corpus: corrupted
    docs fail the walk, duplicate signatures collapse, and at least one
    single-frame video hits the duration gate."""
    qual, sigs, nframes = _c10_python_replay(spark, sf_dir)
    survivors = {r["doc_id"] for r in q("c10_video_pipeline").collect()}
    assert survivors <= qual
    # decode gate: corrupted ids never appear among signatures
    assert all(d % 13 != 0 for d in sigs)
    # dedup stage drops at least one duplicate-signature doc
    assert len(sigs) > len(set(sigs.values()))
    # duration gate has teeth at this SF
    from mariadb_postgres_migration_spark.r11_queries import C10_MIN_FRAMES

    assert any(n < C10_MIN_FRAMES for n in nframes.values())


def test_x187_crossmodal_counts_match_member_manifests(q):
    """x187's per-split counts must equal the set algebra over the c9
    and c10 survivor manifests it composes."""
    img = {(r["doc_id"], r["split"]) for r in q("c9_multimodal_lsh").collect()}
    vid = {(r["doc_id"], r["split"]) for r in q("c10_video_pipeline").collect()}
    splits = {s for _, s in img | vid}
    expected = {}
    for s in splits:
        i = {d for d, sp in img if sp == s}
        v = {d for d, sp in vid if sp == s}
        expected[s] = (len(i & v), len(i - v), len(v - i))
    got = {
        r["split"]: (r["n_both"], r["n_image_only"], r["n_video_only"])
        for r in q("x187_crossmodal_pairs").collect()
    }
    assert got == expected
    assert any(b for b, _, _ in got.values()), "no cross-modal pairs — vacuous"


def test_x188_profile_matches_header_aggregation(spark, sf_dir, q):
    """x188 must equal the per-source aggregation of the x181 header
    profile (same header decode both rows ride)."""
    from collections import defaultdict

    from mariadb_postgres_migration_spark.registry import _t

    src = {
        r["doc_id"]: r["source"]
        for r in _t(spark, sf_dir, "documents").select("doc_id", "source").collect()
    }
    exp = defaultdict(lambda: [0, 0, 0, 0])
    for r in q("x181_video_header_profile").collect():
        e = exp[src[r["doc_id"]]]
        e[0] += 1
        e[1] += r["n_frames"]
        e[2] += r["n_frames"] * r["us_per_frame"]
        e[3] += 1 if r["n_frames"] < 3 else 0
    got = {
        r["source"]: [r["n_videos"], r["total_frames"],
                      r["total_duration_us"], r["n_short"]]
        for r in q("x188_video_source_profile").collect()
    }
    assert got == dict(exp)
    assert got, "no sources — vacuous row"
