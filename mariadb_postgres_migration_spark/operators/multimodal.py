"""Multimodal column plumbing (SURVEY.md §2.10 EXT-04).

Image/audio/video payloads are opaque ``binary`` columns plus a typed
metadata struct, stored in parquet like any other column — Spark shreds the
binary into its own parquet column chunk, so metadata-only queries never
read payload bytes (column pruning is the 100 TB win here).

Decode / feature-extract runs as Arrow-batched Python over ``mapInPandas``.
The actual codec libraries (PIL/ffmpeg) are not in this container, so the
codec call is STUBBED behind ``_decode_image_stub`` — a deterministic fake
deriving "metadata" from the payload bytes. The Spark-side contract (schema,
batch iteration, partition behavior) is real and tested; swapping the stub
for a real codec changes one function.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)

if TYPE_CHECKING:  # pragma: no cover
    import pandas as pd


def attach_payload(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Build a multimodal-shaped table from the documents fixture: the UTF-8
    bytes of ``text`` stand in for an image payload; metadata is typed."""
    payload = F.encode(F.col(text_col), "UTF-8")
    return docs.select(
        F.col(id_col).alias("doc_id"),
        payload.alias("payload"),
        F.struct(
            F.length(payload).cast("long").alias("n_bytes"),
            F.lit("image/fake").alias("mime"),
        ).alias("meta"),
    )


def parse_image_header(b: bytes) -> tuple[str, int, int] | None:
    """REAL byte-level image header parser — no codec library needed.

    Reads (mime, width, height) from the container header of the four
    formats whose dimensions live at fixed/scannable offsets (per the
    public format specs): PNG (IHDR big-endian), BMP (BITMAPCOREHEADER /
    BITMAPINFOHEADER family little-endian), GIF (logical screen
    descriptor), JPEG (marker scan to the first SOFn frame header).
    Returns None for anything unrecognized — pixel decoding (which DOES
    need PIL/ffmpeg) stays stubbed, but metadata extraction, the thing a
    100 TB curation pass actually runs, is real."""
    if len(b) >= 24 and b[:8] == b"\x89PNG\r\n\x1a\n" and b[12:16] == b"IHDR":
        return (
            "image/png",
            int.from_bytes(b[16:20], "big"),
            int.from_bytes(b[20:24], "big"),
        )
    if len(b) >= 26 and b[:2] == b"BM":
        dib = int.from_bytes(b[14:18], "little")
        if dib == 12:  # BITMAPCOREHEADER: uint16 dims
            return (
                "image/bmp",
                int.from_bytes(b[18:20], "little"),
                int.from_bytes(b[20:22], "little"),
            )
        if dib in (40, 52, 56, 108, 124):  # BITMAPINFOHEADER family
            return (
                "image/bmp",
                int.from_bytes(b[18:22], "little", signed=True),
                # negative height = top-down row order; magnitude is the size
                abs(int.from_bytes(b[22:26], "little", signed=True)),
            )
        return None
    if len(b) >= 10 and b[:6] in (b"GIF87a", b"GIF89a"):
        return (
            "image/gif",
            int.from_bytes(b[6:8], "little"),
            int.from_bytes(b[8:10], "little"),
        )
    if len(b) >= 4 and b[:2] == b"\xff\xd8":  # JPEG: scan markers for SOFn
        sof = {0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
               0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF}
        i = 2
        while i + 4 <= len(b):
            if b[i] != 0xFF:
                return None
            # spec-legal fill bytes: any number of 0xFF may pad before a
            # marker — skip to the last one
            while i + 4 <= len(b) and b[i + 1] == 0xFF:
                i += 1
            if i + 4 > len(b):
                return None
            marker = b[i + 1]
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                i += 2  # standalone markers carry no length
                continue
            if marker in sof:
                if i + 9 <= len(b):
                    return (
                        "image/jpeg",
                        int.from_bytes(b[i + 7 : i + 9], "big"),
                        int.from_bytes(b[i + 5 : i + 7], "big"),
                    )
                return None
            i += 2 + int.from_bytes(b[i + 2 : i + 4], "big")
        return None
    return None


DECODED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("mime", StringType()),
    ]
)


def _decode_image_stub(payload: bytes) -> tuple[int, int]:
    """STUB fallback for payloads with no recognized image signature:
    deterministic fake (width, height) from the raw bytes, so the operator
    stays total over arbitrary binary. Real formats never reach this —
    :func:`parse_image_header` handles them from the actual header bytes."""
    first = payload[0] if payload else 0
    return 16 + first % 64, 16 + len(payload) % 64


def _le_bytes(value, n_bytes: int):
    """Column: little-endian ``n_bytes`` encoding of an integral column —
    per-byte hex/unhex assembly, JVM-side, no UDF."""
    parts = [
        F.unhex(F.lpad(F.hex(F.shiftright(value.cast("long"), 8 * i) % 256), 2, "0"))
        for i in range(n_bytes)
    ]
    return F.concat(*parts)


def attach_bmp_payload(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Build a multimodal table whose payloads are GENUINE BMP files,
    assembled JVM-side from binary concat — 'BM' magic, 54-byte
    BITMAPINFOHEADER with real little-endian dims, then the UTF-8 text
    bytes as the pixel array. Dimensions are a closed form of the text
    (width = 16 + first-codepoint % 64, height = 16 + byte-length % 64),
    which is what makes the decode round-trip oracle-exact: a DuckDB oracle
    can't parse blobs, but it can compute the same closed form — so the
    driver hash proves :func:`parse_image_header` read the header bytes
    correctly."""
    text = F.col(text_col)
    pix = F.encode(text, "UTF-8")
    npix = F.length(pix)
    first = F.when(F.length(text) == 0, 0).otherwise(
        F.ascii(F.substring(text, 1, 1))
    )
    width = (F.lit(16) + first % 64).cast("long")
    height = (F.lit(16) + npix % 64).cast("long")
    header = F.concat(
        F.unhex(F.lit("424D")),            # 'BM'
        _le_bytes(F.lit(54) + npix, 4),    # file size
        F.unhex(F.lit("00000000")),        # reserved
        _le_bytes(F.lit(54), 4),           # pixel-array offset
        _le_bytes(F.lit(40), 4),           # DIB header size (BITMAPINFOHEADER)
        _le_bytes(width, 4),
        _le_bytes(height, 4),
        _le_bytes(F.lit(1), 2),            # planes
        _le_bytes(F.lit(8), 2),            # bits per pixel
        _le_bytes(F.lit(0), 4),            # compression = BI_RGB
        _le_bytes(npix, 4),                # image size
        _le_bytes(F.lit(0), 4),            # x pixels/m
        _le_bytes(F.lit(0), 4),            # y pixels/m
        _le_bytes(F.lit(0), 4),            # colors used
        _le_bytes(F.lit(0), 4),            # important colors
    )
    payload = F.concat(header, pix)
    return docs.select(
        F.col(id_col).alias("doc_id"),
        payload.alias("payload"),
        F.struct(
            F.length(payload).cast("long").alias("n_bytes"),
            F.lit("image/bmp").alias("mime"),
        ).alias("meta"),
    )


def decode_payloads(multimodal: DataFrame) -> DataFrame:
    """EXT-04: Arrow-batched decode over ``mapInPandas``.

    One Python worker per input partition, batches of rows as pandas
    DataFrames — payload bytes never concatenate into one driver buffer
    (contrast the reference's single 1200 KiB subprocess pipe,
    normalize_tags.mjs:4). Output schema is fixed and narrow.

    Recognized image containers (PNG/BMP/GIF/JPEG) decode their REAL
    mime + dimensions from the header bytes via
    :func:`parse_image_header`; unrecognized payloads fall back to the
    deterministic stub dims with the metadata's declared mime.
    """

    def _decode(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            widths, heights, mimes = [], [], []
            for payload, meta in zip(pdf["payload"], pdf["meta"]):
                b = bytes(payload) if payload is not None else b""
                parsed = parse_image_header(b)
                if parsed is not None:
                    mime, w, h = parsed
                else:
                    mime = meta["mime"]
                    w, h = _decode_image_stub(b)
                widths.append(w)
                heights.append(h)
                mimes.append(mime)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": [m["n_bytes"] for m in pdf["meta"]],
                    "width": widths,
                    "height": heights,
                    "mime": mimes,
                }
            )

    return multimodal.mapInPandas(_decode, schema=DECODED_SCHEMA)

RESIZED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("payload", BinaryType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("mime", StringType()),
    ]
)


def _resize_image_stub(payload: bytes, width: int, height: int) -> bytes:
    """STUB codec: deterministic fake "resize" — truncate/cycle the payload
    to width*height bytes (a real implementation decodes, resamples, and
    re-encodes via PIL; not installed here)."""
    if not payload:
        return bytes(width * height)
    reps = (width * height + len(payload) - 1) // len(payload)
    return (payload * reps)[: width * height]


def resize_payloads(
    multimodal: DataFrame, width: int = 32, height: int = 32
) -> DataFrame:
    """EXT-04: batch resize over ``mapInPandas`` — the payload column goes
    IN and a new payload comes OUT, so this is the template for any
    payload→payload transform (transcode, crop, re-encode). Binary stays
    Arrow-batched end to end; nothing widens to strings."""

    def _resize(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            out = [
                _resize_image_stub(
                    bytes(p) if p is not None else b"", width, height
                )
                for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": out,
                    "width": [width] * len(pdf),
                    "height": [height] * len(pdf),
                    "mime": ["image/fake-resized"] * len(pdf),
                }
            )

    return multimodal.mapInPandas(_resize, schema=RESIZED_SCHEMA)


FRAMES_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_no", LongType()),
        StructField("frame", BinaryType()),
    ]
)

FRAME_BYTES = 64


def sample_frames(
    multimodal: DataFrame, every_n: int = 4, frame_bytes: int = FRAME_BYTES
) -> DataFrame:
    """EXT-04: frame sampling — a payload→MANY-rows transform (one row per
    kept frame), the video analog of explode. The stub treats the payload
    as fixed-size ``frame_bytes`` chunks and keeps every ``every_n``-th (a
    real implementation seeks keyframes via ffmpeg). mapInPandas may emit
    more output rows than input rows, which is exactly what frame
    extraction needs — no collect, no driver involvement."""

    def _frames(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            ids, nos, frames = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload) if payload is not None else b""
                n_frames = (len(b) + frame_bytes - 1) // frame_bytes
                for fno in range(0, n_frames, every_n):
                    ids.append(doc_id)
                    nos.append(fno)
                    frames.append(b[fno * frame_bytes : (fno + 1) * frame_bytes])
            yield pd.DataFrame({"doc_id": ids, "frame_no": nos, "frame": frames})

    return multimodal.mapInPandas(_frames, schema=FRAMES_SCHEMA)


N_FEATURES = 8


def extract_features(multimodal: DataFrame) -> DataFrame:
    """EXT-04: payload → fixed-width float feature vector (the embedding
    hand-off point for similarity search). The stub features are the first
    8 payload bytes as doubles (zero-padded) — deterministic and therefore
    SQL-expressible, so unlike the codec stubs this one IS oracle-checked
    (x26). A real extractor swaps in a model call per Arrow batch."""
    from pyspark.sql.types import ArrayType, DoubleType

    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("features", ArrayType(DoubleType())),
        ]
    )

    def _feats(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            feats = []
            for payload in pdf["payload"]:
                b = bytes(payload) if payload is not None else b""
                v = [float(x) for x in b[:N_FEATURES]]
                feats.append(v + [0.0] * (N_FEATURES - len(v)))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "features": feats})

    return multimodal.mapInPandas(_feats, schema=schema)
