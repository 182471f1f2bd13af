"""Baseline-JPEG codec tests (operators/jpeg.py) — the same strategy as
the GIF/WAV codec suites: exact round-trips where the math is lossless,
fuzz against an INDEPENDENT reference where it is lossy, hostile-input
rejection, and the Spark-side fixture/oracle agreement.

The reference IDCT here is a literal four-nested-loop transcription of
the T.81 Annex A.3.3 formula (no shared code with the decoder's
matrix-einsum form), so agreement pins zigzag, Huffman, dequant, DC
prediction AND the transform numerics independently."""

from __future__ import annotations

import math

import numpy as np
import pytest

from mariadb_postgres_migration_spark.operators.jpeg import (
    decode_jpeg_pixels,
    encode_jpeg_color,
    encode_jpeg_gray,
)


def _ref_idct_block(coef):
    """T.81 A.3.3, transcribed as loops: f(x,y) = 1/4 ΣΣ C(u)C(v)F(u,v)
    cos((2x+1)uπ/16) cos((2y+1)vπ/16)."""
    out = np.zeros((8, 8))
    for x in range(8):
        for y in range(8):
            s = 0.0
            for u in range(8):
                for v in range(8):
                    cu = 1 / math.sqrt(2) if u == 0 else 1.0
                    cv = 1 / math.sqrt(2) if v == 0 else 1.0
                    s += (
                        cu * cv * coef[u][v]
                        * math.cos((2 * x + 1) * u * math.pi / 16)
                        * math.cos((2 * y + 1) * v * math.pi / 16)
                    )
            out[x, y] = s / 4
    return out


def _ref_fdct_block(block):
    out = np.zeros((8, 8))
    for u in range(8):
        for v in range(8):
            s = 0.0
            for x in range(8):
                for y in range(8):
                    s += (
                        block[x][y]
                        * math.cos((2 * x + 1) * u * math.pi / 16)
                        * math.cos((2 * y + 1) * v * math.pi / 16)
                    )
            cu = 1 / math.sqrt(2) if u == 0 else 1.0
            cv = 1 / math.sqrt(2) if v == 0 else 1.0
            out[u, v] = cu * cv * s / 4
    return out


def _ref_reconstruct_gray(arr, q):
    """Independent encode→decode pipeline prediction for a grayscale
    image: per 8x8 block, loop-FDCT → round-quantize → dequantize →
    loop-IDCT → +128 round/clip."""
    h, w = arr.shape
    out = np.zeros_like(arr)
    for by in range(h // 8):
        for bx in range(w // 8):
            blk = arr[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8].astype(float) - 128
            coef = np.round(_ref_fdct_block(blk) / q) * q
            rec = np.clip(np.round(_ref_idct_block(coef)) + 128, 0, 255)
            out[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8] = rec
    return out


def test_constant_blocks_round_trip_exactly():
    # the x115 fixture contract: constant 8x8 blocks + all-ones quant
    # table → zero AC energy, exact DC → the lossy codec is lossless
    rng = np.random.default_rng(7)
    for _ in range(10):
        bh, bw = int(rng.integers(1, 9)), int(rng.integers(1, 7))
        vals = rng.integers(0, 256, (bh, bw), dtype=np.uint8)
        arr = vals.repeat(8, 0).repeat(8, 1)
        dec = decode_jpeg_pixels(encode_jpeg_gray(arr))
        assert dec is not None and dec.dtype == np.uint8
        assert (dec == arr).all()


def test_ac_coefficients_match_loop_idct_reference():
    # arbitrary (non-constant) content exercises AC runs, ZRL, EOB and
    # magnitude coding; the decoder must equal the independent loop-IDCT
    # reconstruction bit-for-bit (same round/clip convention)
    rng = np.random.default_rng(8)
    for trial in range(4):
        h, w = 8 * int(rng.integers(1, 4)), 8 * int(rng.integers(1, 4))
        arr = rng.integers(0, 256, (h, w), dtype=np.uint8)
        q = np.ones((8, 8), np.int64)
        dec = decode_jpeg_pixels(encode_jpeg_gray(arr, q))
        ref = _ref_reconstruct_gray(arr, q)
        assert (dec == ref).all(), f"trial {trial}"


def test_nontrivial_quant_table_dequantizes():
    # a real quant table (scaled steps) forces multi-step dequantization;
    # smooth gradients survive within quantization error of the reference
    q = np.arange(1, 65).reshape(8, 8).astype(np.int64)
    x = np.arange(32)
    arr = ((x[None, :] * 3 + x[:32, None] * 2) % 256).astype(np.uint8)[:16, :]
    dec = decode_jpeg_pixels(encode_jpeg_gray(arr, q))
    ref = _ref_reconstruct_gray(arr, q)
    assert (dec == ref).all()


def test_color_420_constant_planes_decode_to_jfif_rgb():
    y = np.full((16, 32), 120, np.uint8)
    cb = np.full((8, 16), 60, np.uint8)
    cr = np.full((8, 16), 200, np.uint8)
    dec = decode_jpeg_pixels(encode_jpeg_color(y, cb, cr, sampling=(2, 2)))
    assert dec.shape == (16, 32, 3)
    exp = (
        int(np.clip(round(120 + 1.402 * (200 - 128)), 0, 255)),
        int(np.clip(round(120 - 0.344136 * (60 - 128) - 0.714136 * (200 - 128)), 0, 255)),
        int(np.clip(round(120 + 1.772 * (60 - 128)), 0, 255)),
    )
    assert tuple(dec[3, 17]) == exp
    assert (dec == np.array(exp, np.uint8)).all()


def test_color_420_chroma_blocks_upsample_nearest():
    # distinct constant values per chroma BLOCK: after 2x nearest
    # upsample, each 16x16 luma region gets its own chroma — checks MCU
    # interleaving order AND the upsample geometry
    y = np.full((16, 32), 128, np.uint8)
    cb = np.zeros((8, 16), np.uint8)
    cb[:, :8] = 30
    cb[:, 8:] = 220
    cr = np.full((8, 16), 128, np.uint8)
    dec = decode_jpeg_pixels(encode_jpeg_color(y, cb, cr, sampling=(2, 2)))
    b_left = int(np.clip(round(128 + 1.772 * (30 - 128)), 0, 255))
    b_right = int(np.clip(round(128 + 1.772 * (220 - 128)), 0, 255))
    assert (dec[:, :16, 2] == b_left).all()
    assert (dec[:, 16:, 2] == b_right).all()


def test_color_444_matches_gray_luma():
    # 4:4:4 with neutral chroma must reproduce the grayscale content
    rng = np.random.default_rng(9)
    vals = rng.integers(0, 256, (2, 3), dtype=np.uint8)
    y = vals.repeat(8, 0).repeat(8, 1)
    neutral = np.full(y.shape, 128, np.uint8)
    dec = decode_jpeg_pixels(encode_jpeg_color(y, neutral, neutral, sampling=(1, 1)))
    assert dec.shape == (*y.shape, 3)
    assert (dec[..., 0] == y).all()
    assert (dec[..., 1] == y).all()
    assert (dec[..., 2] == y).all()


def test_byte_stuffing_survives():
    # value 255 blocks make all-1-bits DC codes likely; explicitly force
    # payload bytes of 0xFF and verify the unstuffing path end-to-end
    arr = np.full((8, 8), 255, np.uint8)
    enc = encode_jpeg_gray(arr)
    dec = decode_jpeg_pixels(enc)
    assert (dec == 255).all()


def test_rejects_non_jpeg_and_out_of_subset():
    assert decode_jpeg_pixels(b"") is None
    assert decode_jpeg_pixels(b"BM\x00\x00") is None
    assert decode_jpeg_pixels(b"\xff\xd8\xff\xd9") is None  # empty JPEG
    # progressive: patch a valid file's SOF0 marker to SOF2
    enc = bytearray(encode_jpeg_gray(np.full((8, 8), 10, np.uint8)))
    i = enc.find(b"\xff\xc0")
    enc[i + 1] = 0xC2
    assert decode_jpeg_pixels(bytes(enc)) is None
    # truncated entropy stream must not raise
    assert decode_jpeg_pixels(bytes(encode_jpeg_gray(
        np.full((8, 8), 10, np.uint8)))[:40]) is None


def test_fuzz_truncation_never_raises():
    rng = np.random.default_rng(10)
    enc = encode_jpeg_gray(rng.integers(0, 256, (16, 16), dtype=np.uint8))
    for cut in range(0, len(enc), 7):
        decode_jpeg_pixels(enc[:cut])  # any return is fine; no exception
    # random byte corruption
    for _ in range(50):
        b = bytearray(enc)
        b[int(rng.integers(2, len(b)))] = int(rng.integers(0, 256))
        decode_jpeg_pixels(bytes(b))


def test_header_metadata_agrees_with_parse_image_header():
    from mariadb_postgres_migration_spark.operators.multimodal import (
        parse_image_header,
    )

    arr = np.full((24, 40), 77, np.uint8)
    enc = encode_jpeg_gray(arr)
    assert parse_image_header(enc) == ("image/jpeg", 40, 24)


def test_dispatch_reaches_jpeg_decoder():
    from mariadb_postgres_migration_spark.operators.multimodal import (
        decode_pixels,
    )

    arr = np.full((8, 16), 42, np.uint8)
    dec = decode_pixels(encode_jpeg_gray(arr))
    assert dec is not None and (dec == arr).all()


@pytest.mark.parametrize("n_blocks", [1, 3])
def test_fixture_builder_payloads_decode_to_text_bytes(spark, n_blocks):
    from mariadb_postgres_migration_spark.operators.multimodal import (
        attach_consistent_jpeg_payload,
        pixel_stats,
    )

    text = "Hello, pixel world! " * (4 * n_blocks)
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    rows = pixel_stats(attach_consistent_jpeg_payload(df)).collect()
    assert len(rows) == 1
    b = text.encode()
    bpr = 2 + b[0] % 4
    nrows = min(len(b) // bpr, 8)
    used = b[: bpr * nrows]
    r = rows[0]
    assert (r["width"], r["height"]) == (bpr * 8, nrows * 8)
    assert (r["px_min"], r["px_max"]) == (min(used), max(used))
    assert r["px_sum"] == 64 * sum(used)


def test_encoder_rejects_oversized_quant_table():
    """ADVICE r7: an 8-bit DQT cannot carry entries > 255 — the encoder
    must refuse rather than silently wrap them through a uint8 cast
    (the decoder would then dequantize with a wrong table)."""
    import numpy as np
    import pytest

    from mariadb_postgres_migration_spark.operators.jpeg import encode_jpeg_gray

    img = np.full((8, 8), 128, dtype=np.uint8)
    bad = np.full((8, 8), 300, dtype=np.int64)
    with pytest.raises(ValueError, match=r"\[1, 255\]"):
        encode_jpeg_gray(img, q=bad)
    with pytest.raises(ValueError, match=r"\[1, 255\]"):
        encode_jpeg_gray(img, q=np.zeros((8, 8), dtype=np.int64))
    # in-range table still encodes
    assert encode_jpeg_gray(img, q=np.full((8, 8), 255, dtype=np.int64))[:2] == b"\xff\xd8"


# ---------------------------------------------------------------------------
# Progressive (SOF2) codec — r12
# ---------------------------------------------------------------------------

from mariadb_postgres_migration_spark.operators.jpeg import (  # noqa: E402
    DEFAULT_PROGRESSION,
    encode_jpeg_color_progressive,
    encode_jpeg_gray_progressive,
)


def test_progressive_constant_blocks_round_trip_exactly():
    """The fixture property: constant 8x8 blocks survive the multi-scan
    stream bit-exactly (DC point transform + refinement reassemble the
    exact DC; AC scans are pure end-of-band runs)."""
    rng = np.random.default_rng(7)
    for _ in range(6):
        bpr, rows = int(rng.integers(2, 6)), int(rng.integers(1, 9))
        vals = rng.integers(32, 127, (rows, bpr)).astype(np.uint8)
        arr = vals.repeat(8, 0).repeat(8, 1)
        dec = decode_jpeg_pixels(encode_jpeg_gray_progressive(arr))
        assert dec is not None and np.array_equal(dec, arr)


def test_progressive_matches_baseline_on_arbitrary_content():
    """The strong parity pin: for ANY input, the progressive stream's
    decode must equal the baseline stream's decode of the same array —
    both paths quantize identically (all-ones table), so any divergence
    is an entropy-coding bug (EOB runs, ZRL-in-refinement, buffered
    correction bits, successive approximation)."""
    rng = np.random.default_rng(11)
    for _ in range(10):
        h, w = 8 * int(rng.integers(1, 6)), 8 * int(rng.integers(1, 6))
        arr = rng.integers(0, 256, (h, w)).astype(np.uint8)
        base = decode_jpeg_pixels(encode_jpeg_gray(arr))
        prog = decode_jpeg_pixels(encode_jpeg_gray_progressive(arr))
        assert prog is not None
        assert np.array_equal(base, prog)


def test_progressive_color_matches_baseline_color():
    """3-component parity at 1x1 sampling: interleaved DC scans +
    per-component AC band scans reproduce the baseline color decode."""
    rng = np.random.default_rng(13)
    y, cb, cr = (
        rng.integers(0, 256, (16, 24)).astype(np.uint8) for _ in range(3)
    )
    base = decode_jpeg_pixels(encode_jpeg_color(y, cb, cr, sampling=(1, 1)))
    prog = decode_jpeg_pixels(encode_jpeg_color_progressive(y, cb, cr))
    assert prog is not None and prog.shape == base.shape
    assert np.array_equal(base, prog)


def test_progressive_stream_is_genuinely_multi_scan():
    """The stream must actually exercise the progression: one SOS per
    script entry (AC entries expand per component), and at least one
    refinement scan (Ah > 0) present."""
    arr = np.full((8, 16), 99, np.uint8)
    enc = encode_jpeg_gray_progressive(arr)
    scans = []
    i = 2
    while i + 4 <= len(enc):
        marker = enc[i + 1]
        seglen = int.from_bytes(enc[i + 2:i + 4], "big")
        if marker == 0xDA:
            seg = enc[i + 4:i + 2 + seglen]
            ns = seg[0]
            scans.append((seg[1 + 2 * ns], seg[2 + 2 * ns],
                          seg[3 + 2 * ns] >> 4, seg[3 + 2 * ns] & 0x0F))
            # skip entropy data to the next marker segment
            j = i + 2 + seglen
            while j + 1 < len(enc):
                if enc[j] == 0xFF and enc[j + 1] not in (0x00,) and not (
                    0xD0 <= enc[j + 1] <= 0xD7
                ):
                    break
                j += 1
            i = j
            continue
        i += 2 + seglen
        if marker == 0xD9:
            break
    assert len(scans) == len(DEFAULT_PROGRESSION)
    assert scans == list(DEFAULT_PROGRESSION)
    assert any(ah > 0 for _, _, ah, _ in scans)


def test_progressive_truncation_never_raises():
    rng = np.random.default_rng(17)
    enc = encode_jpeg_gray_progressive(
        rng.integers(0, 256, (16, 16), dtype=np.uint8)
    )
    for cut in range(0, len(enc), 7):
        out = decode_jpeg_pixels(enc[:cut])
        assert out is None or out.shape == (16, 16)


def test_progressive_rejects_baseline_entropy_behind_sof2():
    """The x178 franken fixture contract: a baseline entropy segment
    behind a rewritten SOF2 marker must fail the progressive scan-header
    validation (Ss=0 with Se=63), never decode."""
    enc = bytearray(encode_jpeg_gray(np.full((8, 8), 10, np.uint8)))
    i = enc.find(b"\xff\xc0")
    enc[i + 1] = 0xC2
    assert decode_jpeg_pixels(bytes(enc)) is None
