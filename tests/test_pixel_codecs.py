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
