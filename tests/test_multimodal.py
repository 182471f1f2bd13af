"""Multimodal plumbing tests (EXT-04): the codec calls are stubs, but the
Spark-side contracts — schemas, Arrow batch iteration, payload→payload and
payload→many-rows shapes, column pruning — are real and pinned here."""

from pyspark.sql import functions as F

from mariadb_postgres_migration_spark.operators.multimodal import (
    FRAME_BYTES,
    attach_payload,
    extract_features,
    resize_payloads,
    sample_frames,
)
from mariadb_postgres_migration_spark.sources.parquet import read_parquet_table


def _mm(spark, sf_dir):
    return attach_payload(read_parquet_table(spark, sf_dir, "documents"))


def test_resize_payload_roundtrip(spark, sf_dir):
    mm = _mm(spark, sf_dir)
    out = resize_payloads(mm, width=8, height=4)
    rows = out.collect()
    assert len(rows) == mm.count()
    assert all(len(r["payload"]) == 8 * 4 for r in rows)
    assert out.schema["payload"].dataType.typeName() == "binary"


def test_sample_frames_counts(spark, sf_dir):
    mm = _mm(spark, sf_dir)
    out = sample_frames(mm, every_n=4)
    # every doc yields ceil(ceil(n_bytes/FRAME_BYTES)/4) frames
    expected = (
        mm.select(
            F.ceil(
                F.ceil(F.col("meta.n_bytes") / FRAME_BYTES) / 4
            ).cast("long").alias("n")
        )
        .agg(F.sum("n"))
        .collect()[0][0]
    )
    assert out.count() == expected
    # frames are at most FRAME_BYTES and numbered by kept frame index
    sample = out.filter(F.col("doc_id") == out.select("doc_id").first()[0]).collect()
    assert all(r["frame_no"] % 4 == 0 for r in sample)
    assert all(len(r["frame"]) <= FRAME_BYTES for r in sample)


def test_extract_features_shape(spark, sf_dir):
    mm = _mm(spark, sf_dir)
    out = extract_features(mm)
    row = out.first()
    assert len(row["features"]) == 8
    assert out.count() == mm.count()


def test_metadata_scan_prunes_payload_column(spark, sf_dir, tmp_path):
    """The 100 TB claim: payload lives in its own parquet column chunk, so
    metadata-only queries must not read it. Written-to-disk round trip —
    pruning over a computed column would prove nothing."""
    from mariadb_postgres_migration_spark.plans import read_schema_columns

    path = str(tmp_path / "mm.parquet")
    _mm(spark, sf_dir).write.mode("overwrite").parquet(path)
    meta_only = spark.read.parquet(path).select("doc_id", F.col("meta.n_bytes"))
    cols = read_schema_columns(meta_only)
    assert "payload" not in " ".join(cols), f"payload read for metadata query: {cols}"


def test_feature_extract_is_arrow_batched(spark, sf_dir):
    """EXT-04 Python tier must be Arrow mapInPandas, never row-at-a-time."""
    from mariadb_postgres_migration_spark.plans.inspect import formatted_plan

    text = formatted_plan(extract_features(_mm(spark, sf_dir)))
    assert "MapInPandas" in text
    assert "BatchEvalPython" not in text


def _png_bytes(w, h):
    """A real, spec-valid PNG built with stdlib zlib only."""
    import struct
    import zlib

    def chunk(tag, data):
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data))
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)  # 8-bit grayscale
    raw = b"".join(b"\x00" + bytes(w) for _ in range(h))  # filter 0 rows
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def _bmp_bytes(w, h, pix=b""):
    import struct

    header = (
        b"BM"
        + struct.pack("<I", 54 + len(pix))
        + b"\x00\x00\x00\x00"
        + struct.pack("<I", 54)
        + struct.pack("<IiiHHIIIIII", 40, w, h, 1, 8, 0, len(pix), 0, 0, 0, 0)
    )
    return header + pix


def _gif_bytes(w, h):
    import struct

    return b"GIF89a" + struct.pack("<HH", w, h) + b"\x00\x00\x00" + b"\x3b"


def _jpeg_bytes(w, h):
    import struct

    sof0 = b"\xff\xc0" + struct.pack(">HBHHB", 11, 8, h, w, 1) + b"\x01\x11\x00"
    return b"\xff\xd8" + b"\xff\xe0" + struct.pack(">H", 4) + b"JF" + sof0


def test_parse_image_header_reads_real_formats():
    """The decode step is REAL for header metadata: dimensions come from
    actual container bytes of all four formats, not a stub (the only
    stubbed step left is pixel decoding, which needs PIL/ffmpeg)."""
    from mariadb_postgres_migration_spark.operators.multimodal import (
        parse_image_header,
    )

    assert parse_image_header(_png_bytes(320, 17)) == ("image/png", 320, 17)
    assert parse_image_header(_bmp_bytes(64, 48, b"xyz")) == ("image/bmp", 64, 48)
    # top-down BMP stores negative height; magnitude is the real size
    import struct

    topdown = bytearray(_bmp_bytes(9, 7))
    topdown[22:26] = struct.pack("<i", -7)
    assert parse_image_header(bytes(topdown)) == ("image/bmp", 9, 7)
    assert parse_image_header(_gif_bytes(200, 100)) == ("image/gif", 200, 100)
    assert parse_image_header(_jpeg_bytes(640, 480)) == ("image/jpeg", 640, 480)
    # spec-legal 0xFF fill bytes before a marker must not derail the scan
    padded = b"\xff\xd8" + b"\xff\xff\xff" + _jpeg_bytes(31, 15)[2:]
    assert parse_image_header(padded) == ("image/jpeg", 31, 15)
    assert parse_image_header(b"just text, no signature") is None
    assert parse_image_header(b"") is None


def test_decode_payloads_parses_real_headers(spark):
    """End-to-end over mixed real formats + an unrecognized payload: the
    mapInPandas decode must emit header-true dims for real containers and
    the documented stub fallback otherwise."""
    from mariadb_postgres_migration_spark.operators.multimodal import (
        decode_payloads,
    )

    rows = [
        (1, _png_bytes(33, 44), {"n_bytes": 0, "mime": "meta/ignored"}),
        (2, _bmp_bytes(21, 12, b"pix"), {"n_bytes": 0, "mime": "meta/ignored"}),
        (3, _gif_bytes(5, 6), {"n_bytes": 0, "mime": "meta/ignored"}),
        (4, _jpeg_bytes(7, 8), {"n_bytes": 0, "mime": "meta/ignored"}),
        (5, b"opaque", {"n_bytes": 0, "mime": "application/blob"}),
    ]
    mm = spark.createDataFrame(
        rows, "doc_id long, payload binary, meta struct<n_bytes:long,mime:string>"
    )
    got = {r["doc_id"]: r for r in decode_payloads(mm).collect()}
    assert (got[1]["mime"], got[1]["width"], got[1]["height"]) == ("image/png", 33, 44)
    assert (got[2]["mime"], got[2]["width"], got[2]["height"]) == ("image/bmp", 21, 12)
    assert (got[3]["mime"], got[3]["width"], got[3]["height"]) == ("image/gif", 5, 6)
    assert (got[4]["mime"], got[4]["width"], got[4]["height"]) == ("image/jpeg", 7, 8)
    assert got[5]["mime"] == "application/blob"  # stub fallback keeps meta mime


def test_attach_bmp_payload_is_spec_valid_bmp(spark, sf_dir):
    """The JVM-assembled payload must be a byte-exact BMP: re-encode one
    row's closed-form dims with the struct-packed reference builder and
    compare whole payloads."""
    from mariadb_postgres_migration_spark.operators.multimodal import (
        attach_bmp_payload,
    )

    docs = read_parquet_table(spark, sf_dir, "documents").limit(20)
    built = {r["doc_id"]: bytes(r["payload"]) for r in attach_bmp_payload(docs).collect()}
    for r in docs.collect():
        text = r["text"] or ""
        pix = text.encode("utf-8")
        w = 16 + (ord(text[0]) if text else 0) % 64
        h = 16 + len(pix) % 64
        assert built[r["doc_id"]] == _bmp_bytes(w, h, pix)


def test_header_parser_rejects_malformed_and_trailing_garbage():
    from mariadb_postgres_migration_spark.operators.multimodal import (
        parse_image_header,
    )

    # negative biWidth has no spec meaning -> reject
    neg_w = bytearray(b"BM" + b"\x00" * 52)
    neg_w[14:18] = (40).to_bytes(4, "little")
    neg_w[18:22] = (-100).to_bytes(4, "little", signed=True)
    neg_w[22:26] = (10).to_bytes(4, "little", signed=True)
    assert parse_image_header(bytes(neg_w)) is None

    # EOI terminates the JPEG scan: a fake SOF in trailing garbage after
    # FFD9 must not produce fabricated dimensions
    fake_sof = b"\xff\xc0\x00\x11\x08\x00\x10\x00\x20"
    jpeg = b"\xff\xd8" + b"\xff\xd9" + fake_sof
    assert parse_image_header(jpeg) is None
