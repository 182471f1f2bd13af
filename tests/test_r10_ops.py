"""Round-10 operator tests: the c8 multimodal curation pipeline (stage
plumbing recomputed in pure Python over REAL byte-built BMPs) and the
decode_payloads carry_cols pass-through it rides on."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mariadb_postgres_migration_spark.operators.multimodal import (
    parse_image_header,
)
from mariadb_postgres_migration_spark.r10_queries import (
    C8_CORRUPT_MOD,
    C8_MIN_DIM,
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


def _py_bmp(text: str) -> bytes:
    """Byte-for-byte Python replica of attach_bmp_payload's JVM assembly."""
    pix = text.encode("utf-8")
    npix = len(pix)
    first = ord(text[0]) if text else 0
    width = 16 + first % 64
    height = 16 + npix % 64

    def le(v: int, n: int) -> bytes:
        return v.to_bytes(n, "little")

    header = (
        b"BM" + le(54 + npix, 4) + b"\x00" * 4 + le(54, 4)
        + le(40, 4) + le(width, 4) + le(height, 4)
        + le(1, 2) + le(8, 2) + le(0, 4) + le(npix, 4)
        + le(0, 4) * 4
    )
    return header + pix


def _py_c8_stages(docs_rows, c7_rows):
    """Pure-Python replay of every c8 stage, with the validity gate run
    through the REAL parse_image_header over Python-built payloads — so
    the tests prove the gate is byte-parse-driven, not just that two
    closed forms agree. Returns (stage doc_id sets, valid-doc detail,
    c7 manifest)."""
    manifest = {r["doc_id"]: (r["split"], r["shard"]) for r in c7_rows}
    raw = {r["doc_id"] for r in docs_rows}
    valid = {}
    for r in docs_rows:
        payload = _py_bmp(r["text"])
        if r["doc_id"] % C8_CORRUPT_MOD == 0:
            payload = b"\x00\x00" + payload
        parsed = parse_image_header(payload)
        if parsed is not None and parsed[0] == "image/bmp":
            valid[r["doc_id"]] = (payload, parsed[1], parsed[2])
    keep: dict[bytes, int] = {}
    for doc_id in sorted(valid):  # min doc_id wins per payload group
        payload = valid[doc_id][0]
        if payload not in keep:
            keep[payload] = doc_id
    unique = set(keep.values())
    sized = {
        d for d in unique
        if valid[d][1] >= C8_MIN_DIM and valid[d][2] >= C8_MIN_DIM
    }
    paired = {d for d in sized if d in manifest}
    stages = {
        "raw": raw, "valid": set(valid), "unique": unique,
        "sized": sized, "paired": paired,
    }
    return stages, valid, manifest


def _py_c8_expected(docs_rows, c7_rows):
    stages, valid, manifest = _py_c8_stages(docs_rows, c7_rows)
    return {
        (d, len(valid[d][0]), valid[d][1], valid[d][2], *manifest[d])
        for d in stages["paired"]
    }


def test_c8_matches_pure_python_stage_replay(spark, sf_dir, q):
    from mariadb_postgres_migration_spark.registry import _t

    docs_rows = _t(spark, sf_dir, "documents").select("doc_id", "text").collect()
    c7_rows = q("c7_pretraining_pipeline").collect()
    expected = _py_c8_expected(docs_rows, c7_rows)
    got = {
        (r["doc_id"], r["n_bytes"], r["width"], r["height"], r["split"], r["shard"])
        for r in q("c8_multimodal_pipeline").collect()
    }
    assert got == expected
    assert got  # non-vacuous: the pipeline keeps real survivors


def test_c8_decode_gate_drops_exactly_the_corrupted(spark, sf_dir, q):
    """No corrupted doc survives, and the corruption is the ONLY reason a
    doc fails the validity gate (every uncorrupted BMP parses)."""
    ids = {r["doc_id"] for r in q("c8_multimodal_pipeline").collect()}
    assert ids
    assert not any(i % C8_CORRUPT_MOD == 0 for i in ids)
    # the corrupted prefix really defeats the byte parser
    assert parse_image_header(b"\x00\x00" + _py_bmp("hello world")) is None
    assert parse_image_header(_py_bmp("hello world")) == (
        "image/bmp", 16 + ord("h") % 64, 16 + 11 % 64,
    )


def test_c8_rows_are_a_subset_of_the_c7_manifest(q):
    """Stage-4 plumbing: every emitted (doc_id, split, shard) exists
    verbatim in the c7 layout — the pairing invents no placement."""
    layout = {
        (r["doc_id"], r["split"], r["shard"])
        for r in q("c7_pretraining_pipeline").collect()
    }
    for r in q("c8_multimodal_pipeline").collect():
        assert (r["doc_id"], r["split"], r["shard"]) in layout


def test_x154_funnel_matches_python_stage_replay(spark, sf_dir, q):
    """The funnel counts must equal the pure-Python stage replay's set
    sizes, and attrition must be monotone raw >= valid >= unique >=
    sized >= paired."""
    from mariadb_postgres_migration_spark.registry import _t

    docs_rows = _t(spark, sf_dir, "documents").select("doc_id", "text").collect()
    c7_rows = q("c7_pretraining_pipeline").collect()
    stages, _, _ = _py_c8_stages(docs_rows, c7_rows)
    got = {
        r["stage"]: r["n_docs"]
        for r in q("x154_multimodal_funnel").collect()
    }
    assert got == {k: len(v) for k, v in stages.items()}
    assert (
        got["raw"] >= got["valid"] >= got["unique"]
        >= got["sized"] >= got["paired"] > 0
    )


def test_x155_profile_matches_python_aggregation(q):
    """x155's per-split sums must equal a driver-side aggregation of the
    SAME c8 rows joined to c7's n_tok."""
    ntok = {
        r["doc_id"]: r["n_tok"]
        for r in q("c7_pretraining_pipeline").collect()
    }
    exp: dict[str, list[int]] = {}
    for r in q("c8_multimodal_pipeline").collect():
        g = exp.setdefault(r["split"], [0, 0, 0])
        g[0] += 1
        g[1] += r["n_bytes"]
        g[2] += ntok[r["doc_id"]]
    got = {
        r["split"]: [r["n_pairs"], r["image_bytes"], r["caption_tok"]]
        for r in q("x155_paired_profile").collect()
    }
    assert got == exp
    assert got


def test_knn_pq_adc_equals_ivfpq_probing_all_cells(spark, sf_dir):
    """Exhaustive ADC must equal IVF-PQ with every cell probed: nprobe =
    |centroids| makes the coarse quantizer a no-op (every vector lands in
    some probed cell), so both rank the identical integer adist over the
    identical candidate set."""
    from mariadb_postgres_migration_spark.operators import similarity as S
    from mariadb_postgres_migration_spark.registry import _t

    emb = _t(spark, sf_dir, "embeddings")
    probes = emb.filter(F.col("vec_id") < 12)
    cb = emb.filter(F.col("vec_id") < 16)
    cents = emb.filter(F.col("vec_id") < 8)
    full = {
        (r["q_id"], r["n_id"], r["rk"])
        for r in S.knn_pq_adc(emb, probes, cb, k=5).collect()
    }
    via_ivf = {
        (r["q_id"], r["n_id"], r["rk"])
        for r in S.knn_ivfpq(emb, probes, cents, cb, k=5, nprobe=8).collect()
    }
    assert full == via_ivf
    assert full


def test_c1_manifest_cache_is_bounded_and_releasable(spark, sf_dir):
    """The memo evicts dead sessions' entries on access, keeps <= 1 live
    entry per sf_dir, and survives a full persist-pool release (the
    re-persist-on-access contract)."""
    from collections import Counter

    from mariadb_postgres_migration_spark import r9_queries as R9
    from mariadb_postgres_migration_spark.operators.dedup import (
        release_cached_intermediates,
    )

    R9._C1_MANIFEST_CACHE[("dead-app-id", sf_dir)] = object()
    R9._C1_MANIFEST_CACHE[("dead-app-id", "/elsewhere/sf9")] = object()
    m = R9._c1_manifest(spark, sf_dir)
    app = spark.sparkContext.applicationId
    assert all(k[0] == app for k in R9._C1_MANIFEST_CACHE)
    per_sf = Counter(k[1] for k in R9._C1_MANIFEST_CACHE)
    assert all(n == 1 for n in per_sf.values())
    n_rows = m.count()
    assert n_rows > 0
    release_cached_intermediates()
    assert R9._c1_manifest(spark, sf_dir).count() == n_rows


def test_decode_payloads_carry_cols_passthrough(spark):
    """carry_cols columns survive the Arrow decode pass unchanged and
    land AFTER the decoded columns."""
    from mariadb_postgres_migration_spark.operators.multimodal import (
        attach_bmp_payload,
        decode_payloads,
    )

    docs = spark.createDataFrame(
        [(1, "alpha"), (2, "beta")], "doc_id long, text string"
    )
    mm = attach_bmp_payload(docs).withColumn("pmd5", F.md5("payload"))
    out = decode_payloads(mm, carry_cols=("pmd5",))
    assert out.columns == ["doc_id", "n_bytes", "width", "height", "mime", "pmd5"]
    got = {r["doc_id"]: r["pmd5"] for r in out.collect()}
    want = {r["doc_id"]: r["pmd5"] for r in mm.select("doc_id", "pmd5").collect()}
    assert got == want


def test_image_ahash_matches_direct_decoder_replay(spark):
    """The operator's bits must equal a driver-side replay through the
    SAME real decoder + resampler on a hand-built doc — proving the
    Arrow kernel actually runs decode_bmp_pixels, not a closed form."""
    import numpy as np

    from mariadb_postgres_migration_spark.operators.multimodal import (
        attach_consistent_bmp_payload,
        decode_bmp_pixels,
        image_ahash,
        resize_nearest,
    )

    text = "The quick brown fox jumps over the lazy dog " * 12
    docs = spark.createDataFrame([(7, text)], "doc_id long, text string")
    mm = attach_consistent_bmp_payload(docs)
    payload = bytes(mm.select("payload").collect()[0][0])
    arr = decode_bmp_pixels(payload)
    assert arr is not None
    s = resize_nearest(arr.astype(np.int64), 8, 8).reshape(-1)
    total = int(s.sum())
    hi = lo = 0
    for k in range(32):
        hi = (hi << 1) | int(64 * int(s[k]) > total)
    for k in range(32, 64):
        lo = (lo << 1) | int(64 * int(s[k]) > total)
    row = image_ahash(mm).collect()[0]
    assert (row["h_hi"], row["h_lo"]) == (hi, lo)


def test_x158_pairs_match_python_banding_replay(spark, sf_dir, q):
    """The pair set must equal a pure-Python replay of the full pipeline:
    4x16 banding over the x157 signatures, the 64-doc bucket cap, exact
    hamming <= 3 verify."""
    from collections import defaultdict

    from mariadb_postgres_migration_spark.operators.multimodal import (
        AHASH_MAX_BUCKET,
        AHASH_MAX_HAMMING,
    )

    sigs = {
        r["doc_id"]: (r["h_hi"], r["h_lo"])
        for r in q("x157_image_ahash").collect()
    }
    buckets = defaultdict(list)
    for d, (hi, lo) in sigs.items():
        for bno, v in enumerate((hi >> 16, hi & 0xFFFF, lo >> 16, lo & 0xFFFF)):
            buckets[(bno, v)].append(d)
    cand = set()
    for ids in buckets.values():
        if len(ids) <= AHASH_MAX_BUCKET:
            ids = sorted(ids)
            for i in range(len(ids)):
                for j in range(i + 1, len(ids)):
                    cand.add((ids[i], ids[j]))
    exp = {}
    for a, b in cand:
        h = bin(sigs[a][0] ^ sigs[b][0]).count("1") + bin(
            sigs[a][1] ^ sigs[b][1]
        ).count("1")
        if h <= AHASH_MAX_HAMMING:
            exp[(a, b)] = h
    got = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in q("x158_image_neardup").collect()
    }
    assert got == exp
    assert got, "fixture yields no near-dup image pairs — vacuous row"
    assert any(h == 0 for h in got.values())  # exact-dup images pair at 0


def test_x160_permutation_entropy_matches_python_replay(q):
    """pe must equal a pure-Python entropy over the SAME x150 histogram
    counts, and sit in [0, 1]."""
    import math
    from collections import defaultdict

    hist = defaultdict(dict)
    for r in q("x150_ordinal_patterns").collect():
        hist[r["event_type"]][r["pattern"]] = r["n_windows"]
    exp = {}
    for et, counts in hist.items():
        total = sum(counts.values())
        s = sum(n * math.log(n) for n in counts.values() if n > 0)
        exp[et] = (total, round((math.log(total) - s / total) / math.log(6), 4))
    got = {
        r["event_type"]: (r["n_win"], r["pe"])
        for r in q("x160_permutation_entropy").collect()
    }
    assert set(got) == set(exp)
    for et in got:
        assert got[et][0] == exp[et][0]
        assert abs(got[et][1] - exp[et][1]) < 1e-9, et
        assert 0.0 <= got[et][1] <= 1.0


def test_x161_curriculum_phases_match_python_quartiles(q):
    """Phases must equal a pure-Python replay of the cum-count discrete
    percentile rule, and the four phases must partition the survivors
    into contiguous quality ranges."""
    rows = q("x161_curriculum_phases").collect()
    assert rows
    qualities = sorted(r["quality"] for r in rows)
    n = len(qualities)

    def pctl(frac):
        k = int(frac * (n - 1)) + 1  # cum >= floor(q(n-1)) + 1, 1-based
        return qualities[k - 1]

    p25, p50, p75 = pctl(0.25), pctl(0.50), pctl(0.75)
    for r in rows:
        exp = 1 + (r["quality"] > p25) + (r["quality"] > p50) + (
            r["quality"] > p75
        )
        assert r["phase"] == exp, (r["doc_id"], r["quality"])
    phases = {r["phase"] for r in rows}
    assert phases <= {1, 2, 3, 4} and len(phases) >= 2
    # monotone: every phase-k quality <= every phase-(k+1) quality
    by_phase = {}
    for r in rows:
        by_phase.setdefault(r["phase"], []).append(r["quality"])
    ordered = sorted(by_phase)
    for a, b in zip(ordered, ordered[1:]):
        assert max(by_phase[a]) <= min(by_phase[b])


def test_image_dhash_matches_direct_decoder_replay(spark):
    """dHash bits must equal a driver-side replay through the SAME real
    decoder + (9, 8) resample on a hand-built doc."""
    import numpy as np

    from mariadb_postgres_migration_spark.operators.multimodal import (
        attach_consistent_bmp_payload,
        decode_bmp_pixels,
        image_dhash,
        resize_nearest,
    )

    text = "Pack my box with five dozen liquor jugs!? " * 14
    docs = spark.createDataFrame([(3, text)], "doc_id long, text string")
    mm = attach_consistent_bmp_payload(docs)
    payload = bytes(mm.select("payload").collect()[0][0])
    arr = decode_bmp_pixels(payload)
    s = resize_nearest(arr.astype(np.int64), 9, 8)
    bits = (s[:, 1:] > s[:, :-1]).reshape(-1)
    hi = lo = 0
    for k in range(32):
        hi = (hi << 1) | int(bits[k])
    for k in range(32, 64):
        lo = (lo << 1) | int(bits[k])
    row = image_dhash(mm).collect()[0]
    assert (row["h_hi"], row["h_lo"]) == (hi, lo)


def test_x163_keep_one_matches_union_find_over_x158_pairs(q):
    """rep/keep must equal a pure-Python union-find over the SAME x158
    pair list, with every signed image present and singletons keeping
    themselves."""
    nodes = {r["doc_id"] for r in q("x157_image_ahash").collect()}
    parent = {d: d for d in nodes}

    def find(a):
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    for r in q("x158_image_neardup").collect():
        ra, rb = find(r["doc_a"]), find(r["doc_b"])
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    comp: dict[int, list[int]] = {}
    for d in nodes:
        comp.setdefault(find(d), []).append(d)
    exp = {}
    for members in comp.values():
        rep = min(members)
        for d in members:
            exp[d] = (rep, d == rep)
    got = {
        r["doc_id"]: (r["rep"], r["keep"])
        for r in q("x163_image_dedup_keep_one").collect()
    }
    assert got == exp
    assert set(got) == nodes
    assert any(not k for _, k in got.values())  # real collapses happened


def test_x166_gif_ahash_matches_direct_lzw_decoder_replay(spark):
    """The GIF-path aHash must equal a driver-side replay through the
    REAL LZW decoder + the same resample/threshold kernel."""
    import numpy as np

    from mariadb_postgres_migration_spark.operators.multimodal import (
        attach_consistent_gif_payload,
        decode_gif_pixels,
        image_ahash,
        resize_nearest,
    )

    text = "How vexingly quick daft zebras jump! " * 16
    docs = spark.createDataFrame([(5, text)], "doc_id long, text string")
    mm = attach_consistent_gif_payload(docs)
    payload = bytes(mm.select("payload").collect()[0][0])
    arr = decode_gif_pixels(payload)
    assert arr is not None
    s = resize_nearest(arr.astype(np.int64), 8, 8).reshape(-1)
    total = int(s.sum())
    hi = lo = 0
    for k in range(32):
        hi = (hi << 1) | int(64 * int(s[k]) > total)
    for k in range(32, 64):
        lo = (lo << 1) | int(64 * int(s[k]) > total)
    row = image_ahash(mm).collect()[0]
    assert (row["h_hi"], row["h_lo"]) == (hi, lo)


def test_x167_dual_hamming_matches_python(q):
    """ham_d must equal driver-side XOR popcounts of the x164 signatures
    over exactly the x158 pair set, with ham_a carried unchanged."""
    dsig = {
        r["doc_id"]: (r["h_hi"], r["h_lo"])
        for r in q("x164_image_dhash").collect()
    }
    pairs = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in q("x158_image_neardup").collect()
    }
    got = {
        (r["doc_a"], r["doc_b"]): (r["ham_a"], r["ham_d"])
        for r in q("x167_dualhash_pairs").collect()
    }
    assert set(got) == set(pairs)
    for (a, b), (ham_a, ham_d) in got.items():
        assert ham_a == pairs[(a, b)]
        exp_d = bin(dsig[a][0] ^ dsig[b][0]).count("1") + bin(
            dsig[a][1] ^ dsig[b][1]
        ).count("1")
        assert ham_d == exp_d
        assert 0 <= ham_d <= 64


def test_x169_incremental_dedup_matches_python_replay(q):
    """is_dup_of_corpus must equal a pure-Python replay over the x157
    signatures: new-batch min-id per signature, flagged iff the
    signature exists in the corpus partition."""
    sigs = {
        r["doc_id"]: (r["h_hi"], r["h_lo"])
        for r in q("x157_image_ahash").collect()
    }
    old = {s for d, s in sigs.items() if d % 10 < 8}
    keep: dict[tuple[int, int], int] = {}
    for d in sorted(sigs):
        if d % 10 >= 8:
            keep.setdefault(sigs[d], d)
    exp = {d: (s in old) for s, d in keep.items()}
    got = {
        r["doc_id"]: r["is_dup_of_corpus"]
        for r in q("x169_incremental_image_dedup").collect()
    }
    assert got == exp
    assert any(got.values()) and not all(got.values())


def test_x170_profile_matches_python_aggregation(spark, sf_dir, q):
    """The per-source sums must equal a driver-side aggregation over the
    REAL header decodes joined to source."""
    from mariadb_postgres_migration_spark.operators.multimodal import (
        attach_consistent_bmp_payload,
        decode_payloads,
    )
    from mariadb_postgres_migration_spark.registry import _t

    docs = _t(spark, sf_dir, "documents")
    dec = {
        r["doc_id"]: (r["n_bytes"], r["width"], r["height"])
        for r in decode_payloads(attach_consistent_bmp_payload(docs)).collect()
    }
    src = {r["doc_id"]: r["source"] for r in docs.select("doc_id", "source").collect()}
    exp: dict[str, list[int]] = {}
    for d, (nb, w, h) in dec.items():
        g = exp.setdefault(src[d], [0, 0, 0, 0, 0])
        g[0] += 1
        g[1] += nb
        g[2] += w
        g[3] += h
        g[4] += int(w < 32 or h < 8)
    got = {
        r["source"]: [
            r["n_images"], r["total_bytes"], r["sum_w"], r["sum_h"],
            r["n_small"],
        ]
        for r in q("x170_source_image_profile").collect()
    }
    assert got == exp


def test_c8_frames_cache_is_bounded_and_releasable(spark, sf_dir):
    """The c8 stage-frame memo mirrors the c1 manifest memo's contract:
    foreign-session entries evict on access, <= 1 live entry per
    sf_dir, and the frames survive a full persist-pool release."""
    from collections import Counter

    from mariadb_postgres_migration_spark import r10_queries as R10
    from mariadb_postgres_migration_spark.operators.dedup import (
        release_cached_intermediates,
    )

    R10._C8_FRAMES_CACHE[("dead-app-id", sf_dir)] = object()
    R10._C8_FRAMES_CACHE[("dead-app-id", "/elsewhere/sf9")] = object()
    st = R10._c8_stage_frames(spark, sf_dir)
    app = spark.sparkContext.applicationId
    assert all(k[0] == app for k in R10._C8_FRAMES_CACHE)
    per_sf = Counter(k[1] for k in R10._C8_FRAMES_CACHE)
    assert all(n == 1 for n in per_sf.values())
    n_valid = st["valid"].count()
    assert n_valid > 0
    release_cached_intermediates()
    assert R10._c8_stage_frames(spark, sf_dir)["valid"].count() == n_valid


def test_x172_spearman_matches_python_replay(q):
    """n/Σd²/rho must equal a pure-Python rank replay over the SAME
    panel pairs and n_tok values."""
    ntok = {
        r["doc_id"]: r["n_tok"]
        for r in q("c7_pretraining_pipeline").collect()
    }
    import hashlib

    panel = []
    for r in q("c8_multimodal_pipeline").collect():
        d = r["doc_id"]
        if d < 4096 and hashlib.md5(str(d).encode()).hexdigest()[0] in "01":
            panel.append((d, r["n_bytes"], ntok[d]))
    rb = {
        d: i + 1
        for i, (d, _, _) in enumerate(
            sorted(panel, key=lambda t: (t[1], t[0]))
        )
    }
    rt = {
        d: i + 1
        for i, (d, _, _) in enumerate(
            sorted(panel, key=lambda t: (t[2], t[0]))
        )
    }
    n = len(panel)
    d2 = sum((rb[d] - rt[d]) ** 2 for d, _, _ in panel)
    rho = round(1 - 6.0 * d2 / (n * (n * n - 1)), 4) if n > 1 else 0.0
    row = q("x172_caption_image_corr").collect()[0]
    assert (row["n_pairs"], row["sum_d2"]) == (n, d2)
    assert abs(row["rho"] - rho) < 1e-9
    assert n > 1  # the fixed panel is non-vacuous at the test SF


def test_x173_mix_matches_python_and_covers_phases(q):
    """Counts must equal a driver-side (split, phase) aggregation of the
    x161 assignment under the x138 hash rule, and the train split must
    see every phase."""
    import hashlib

    from mariadb_postgres_migration_spark.operators.textanalysis import (
        SPLIT_PERMILLE,
    )

    def split_of(doc_id):
        frac = int(
            hashlib.md5(f"{doc_id}:split".encode()).hexdigest()[:8], 16
        ) % 1000
        for name, bound in SPLIT_PERMILLE:
            if frac < bound:
                return name
        return "test"

    exp: dict[tuple[str, int], int] = {}
    phases = q("x161_curriculum_phases").collect()
    for r in phases:
        k = (split_of(r["doc_id"]), r["phase"])
        exp[k] = exp.get(k, 0) + 1
    got = {
        (r["split"], r["phase"]): r["n_docs"]
        for r in q("x173_phase_split_mix").collect()
    }
    assert got == exp
    train_phases = {p for (s, p) in got if s == "train"}
    assert train_phases == {1, 2, 3, 4}
