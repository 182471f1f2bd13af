"""REAL pixel codec tests (EXT-04): numpy BMP/PNG decoders, nearest
resample, BMP24 encoder — no PIL anywhere. Byte-level fixtures are built
in-test from the format specs."""

import struct
import zlib

import numpy as np

from mariadb_postgres_migration_spark.operators.multimodal import (
    attach_consistent_bmp_payload,
    decode_bmp_pixels,
    decode_pixels,
    decode_png_pixels,
    encode_bmp24,
    pixel_stats,
    resize_nearest,
    resize_payloads_real,
)


def _png(arr: np.ndarray, ftype: int = 0) -> bytes:
    """Minimal spec-compliant PNG encoder for gray/RGB 8-bit, one filter
    type for every row (0=None, 2=Up are easy to emit correctly)."""
    if arr.ndim == 2:
        ctype, channels = 0, 1
        flat = arr
    else:
        ctype, channels = 2, arr.shape[2]
        flat = arr.reshape(arr.shape[0], -1)
    h, w = arr.shape[:2]
    raw = bytearray()
    prev = np.zeros(w * channels, dtype=np.int32)
    for y in range(h):
        row = flat[y].astype(np.int32)
        if ftype == 0:
            enc = row
        elif ftype == 2:
            enc = (row - prev) % 256
        else:
            raise ValueError(ftype)
        raw.append(ftype)
        raw += enc.astype(np.uint8).tobytes()
        prev = row

    def chunk(tag, body):
        return (
            struct.pack(">I", len(body))
            + tag
            + body
            + struct.pack(">I", zlib.crc32(tag + body))
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def test_png_gray_roundtrip_filters():
    rng = np.random.default_rng(7)
    arr = rng.integers(0, 256, size=(9, 13), dtype=np.uint8)
    for ftype in (0, 2):
        got = decode_png_pixels(_png(arr, ftype))
        assert got is not None and np.array_equal(got, arr), f"filter {ftype}"


def test_png_rgb_roundtrip():
    rng = np.random.default_rng(8)
    arr = rng.integers(0, 256, size=(5, 7, 3), dtype=np.uint8)
    got = decode_png_pixels(_png(arr))
    assert got is not None and np.array_equal(got, arr)


def test_bmp24_encode_decode_roundtrip():
    rng = np.random.default_rng(9)
    arr = rng.integers(0, 256, size=(6, 5, 3), dtype=np.uint8)
    got = decode_bmp_pixels(encode_bmp24(arr))
    assert got is not None and np.array_equal(got, arr)
    # odd width exercises row padding
    arr2 = rng.integers(0, 256, size=(3, 3, 3), dtype=np.uint8)
    assert np.array_equal(decode_bmp_pixels(encode_bmp24(arr2)), arr2)


def test_resize_nearest_exact_mapping():
    arr = np.arange(16, dtype=np.uint8).reshape(4, 4)
    up = resize_nearest(arr, 8, 8)
    assert up.shape == (8, 8)
    # each source pixel becomes a 2x2 block
    assert np.array_equal(up[::2, ::2], arr)
    down = resize_nearest(arr, 2, 2)
    assert np.array_equal(down, arr[::2, ::2])


def test_garbage_payloads_decode_to_none():
    assert decode_pixels(b"") is None
    assert decode_pixels(b"not an image at all") is None
    assert decode_pixels(b"BM" + b"\x00" * 10) is None


def test_pixel_stats_match_closed_form(spark, sf_dir):
    """The registered shape: JVM-assembled consistent BMPs decoded by the
    REAL numpy decoder must produce exactly the stats computable from the
    text's leading bytes (the closed form the SQL oracle uses)."""
    from mariadb_postgres_migration_spark.sources.parquet import read_parquet_table

    docs = read_parquet_table(spark, sf_dir, "documents").limit(50)
    stats = {r["doc_id"]: r for r in pixel_stats(
        attach_consistent_bmp_payload(docs)
    ).collect()}
    assert stats, "no payload decoded"
    for row in docs.collect():
        text = row["text"]
        b = text.encode()
        first = b[0] if b else 0
        w = 16 + (first % 16) * 4
        h = min(len(b) // w, 16)
        if h < 1:
            assert row["doc_id"] not in stats
            continue
        body = b[: w * h]
        got = stats[row["doc_id"]]
        assert (got["width"], got["height"]) == (w, h)
        assert got["px_min"] == min(body)
        assert got["px_max"] == max(body)
        assert got["px_sum"] == sum(body)


def test_resize_real_roundtrips_through_decoder(spark, sf_dir):
    from mariadb_postgres_migration_spark.sources.parquet import read_parquet_table

    docs = read_parquet_table(spark, sf_dir, "documents").limit(10)
    resized = resize_payloads_real(
        attach_consistent_bmp_payload(docs), width=8, height=8
    ).collect()
    assert resized
    for r in resized:
        arr = decode_bmp_pixels(bytes(r["payload"]))
        assert arr is not None and arr.shape == (8, 8, 3)
        assert r["mime"] == "image/bmp"


def test_bmp8_palette_mapping():
    """8bpp pixels are color-table indices: a non-identity grayscale
    palette must map through, a color palette must expand to RGB, and a
    palette-less synthetic payload keeps raw indices (the engine's own
    closed-form contract)."""
    import struct

    import numpy as np

    from mariadb_postgres_migration_spark.operators.multimodal import (
        decode_bmp_pixels,
    )

    def bmp8(idx_rows, palette=None):
        h, w = len(idx_rows), len(idx_rows[0])
        stride = ((w + 3) // 4) * 4
        n_pal = len(palette) if palette else 0
        pix_off = 54 + 4 * n_pal
        body = b"".join(
            bytes(r) + b"\x00" * (stride - w) for r in reversed(idx_rows)
        )
        hdr = (
            b"BM"
            + struct.pack("<I", pix_off + len(body))
            + b"\x00" * 4
            + struct.pack("<I", pix_off)
            + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 8, 0, len(body), 0, 0, n_pal, 0)
        )
        pal = b"".join(bytes([b_, g, r, 0]) for (b_, g, r) in (palette or []))
        return hdr + pal + body

    rows = [[0, 1, 2, 3]]
    # inverted grayscale ramp: index i -> gray 250 - 10i
    gray_pal = [(250 - 10 * i,) * 3 for i in range(4)]
    out = decode_bmp_pixels(bmp8(rows, gray_pal))
    assert out.shape == (1, 4)
    assert out.tolist() == [[250, 240, 230, 220]]

    # color palette: index expands to its RGB entry
    color_pal = [(10, 20, 30), (40, 50, 60), (70, 80, 90), (1, 2, 3)]  # BGR tuples
    out = decode_bmp_pixels(bmp8(rows, color_pal))
    assert out.shape == (1, 4, 3)
    assert out[0, 0].tolist() == [30, 20, 10]  # RGB of entry 0
    assert out[0, 3].tolist() == [3, 2, 1]

    # palette-less (pix_off == 54): raw indices pass through
    out = decode_bmp_pixels(bmp8(rows, None))
    assert np.array_equal(out, np.array(rows, dtype=np.uint8))


def test_gif_lzw_roundtrip_shapes_and_growth():
    """encode_gif8 → decode_gif_pixels is identity across dictionary
    growth, the 4096-entry clear, constant runs, and tiny images."""
    from mariadb_postgres_migration_spark.operators.multimodal import (
        decode_gif_pixels,
        encode_gif8,
        parse_image_header,
    )

    rng = np.random.default_rng(7)
    for shape in [(1, 1), (3, 5), (16, 76), (100, 200)]:
        a = rng.integers(0, 256, shape).astype(np.uint8)
        g = encode_gif8(a)
        assert parse_image_header(g) == ("image/gif", shape[1], shape[0])
        d = decode_gif_pixels(g)
        assert d is not None and d.shape == a.shape and (d == a).all()
    # > 4096 dictionary entries forces the mid-stream CLEAR path
    a = np.tile(np.arange(256, dtype=np.uint8), 400).reshape(200, 512)
    assert (decode_gif_pixels(encode_gif8(a)) == a).all()
    a = np.full((64, 64), 77, np.uint8)  # max-compression constant image
    assert (decode_gif_pixels(encode_gif8(a)) == a).all()


def test_gif_interlaced_and_color_palette():
    """Hand-built GIF fixtures: an interlaced grayscale image must come
    back in display order, and a non-gray palette must map to RGB."""
    from mariadb_postgres_migration_spark.operators.multimodal import (
        _gif_lzw_encode,
        decode_gif_pixels,
    )

    h, w = 8, 4
    arr = (np.arange(h * w, dtype=np.uint8) * 3).reshape(h, w)
    # interlace pass order for h=8: rows 0, 8.. -> [0], 4.., [4], 2,6, 1,3,5,7
    order = [0, 4, 2, 6, 1, 3, 5, 7]
    stored = arr[order]
    header = (
        b"GIF89a" + w.to_bytes(2, "little") + h.to_bytes(2, "little")
        + bytes([0xF7, 0, 0]) + bytes(v for i in range(256) for v in (i, i, i))
    )
    desc = (
        b"\x2c" + b"\x00" * 4 + w.to_bytes(2, "little")
        + h.to_bytes(2, "little") + bytes([0x40])  # interlace flag
    )
    lzw = _gif_lzw_encode(stored.reshape(-1).tolist(), 8)
    body = bytes([8, len(lzw)]) + lzw + b"\x00\x3b"
    out = decode_gif_pixels(header + desc + body)
    assert out is not None and (out == arr).all()

    # 4-entry RGB local color table, no global table
    pal = [(255, 0, 0), (0, 255, 0), (0, 0, 255), (9, 9, 9)]
    idx = np.array([[0, 1], [2, 3]], np.uint8)
    header = b"GIF89a" + b"\x02\x00\x02\x00" + bytes([0x00, 0, 0])
    desc = (
        b"\x2c" + b"\x00" * 4 + b"\x02\x00\x02\x00"
        + bytes([0x80 | 0x01])  # local table, 4 entries
        + bytes(v for rgb in pal for v in rgb)
    )
    lzw = _gif_lzw_encode(idx.reshape(-1).tolist(), 2)
    body = bytes([2, len(lzw)]) + lzw + b"\x00\x3b"
    out = decode_gif_pixels(header + desc + body)
    assert out is not None and out.shape == (2, 2, 3)
    assert [tuple(px) for px in out.reshape(-1, 3)] == pal


def test_gif_malformed_payloads_decode_to_none():
    from mariadb_postgres_migration_spark.operators.multimodal import (
        decode_gif_pixels,
        encode_gif8,
    )

    whole = encode_gif8(np.zeros((6, 6), np.uint8))
    assert decode_gif_pixels(b"") is None
    assert decode_gif_pixels(b"GIF87a\x00") is None
    assert decode_gif_pixels(whole[:-12]) is None  # truncated data stream
    assert decode_gif_pixels(b"\x89PNG\r\n\x1a\n") is None


def test_gif_pixel_stats_match_closed_form(spark, sf_dir):
    """x78: stats from the REAL LZW decode equal the text closed form —
    and equal x60's BMP-path stats row for row (same pixel content)."""
    from mariadb_postgres_migration_spark.operators.multimodal import (
        attach_consistent_gif_payload,
    )
    from mariadb_postgres_migration_spark.sources.parquet import read_parquet_table

    docs = read_parquet_table(spark, sf_dir, "documents").limit(40)
    gif_stats = {
        r["doc_id"]: r
        for r in pixel_stats(attach_consistent_gif_payload(docs)).collect()
    }
    bmp_stats = {
        r["doc_id"]: r
        for r in pixel_stats(attach_consistent_bmp_payload(docs)).collect()
    }
    assert gif_stats and set(gif_stats) == set(bmp_stats)
    for doc_id, g in gif_stats.items():
        assert g == bmp_stats[doc_id]


def test_gif_lzw_fuzz_roundtrip():
    """Property: _gif_lzw_encode → _gif_lzw_decode is identity for any
    index stream and any legal min-code-size (covers code-width
    boundaries, KwKwK, and table-reset interactions the hand-written
    cases can't enumerate)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from mariadb_postgres_migration_spark.operators.multimodal import (
        _gif_lzw_decode,
        _gif_lzw_encode,
    )

    @settings(max_examples=200, deadline=None)
    @given(
        mcs=st.integers(min_value=2, max_value=8),
        data=st.data(),
    )
    def run(mcs, data):
        idx = data.draw(
            st.lists(
                st.integers(min_value=0, max_value=(1 << mcs) - 1),
                min_size=1,
                max_size=400,
            )
        )
        enc = _gif_lzw_encode(idx, mcs)
        assert _gif_lzw_decode(enc, mcs, len(idx)) == idx

    run()
