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


DECODED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("first_byte", LongType()),
        StructField("fake_width", LongType()),
        StructField("fake_height", LongType()),
        StructField("mime", StringType()),
    ]
)


def _decode_image_stub(payload: bytes) -> tuple[int, int, int]:
    """STUB codec: deterministic fake (first_byte, width, height) from the
    raw bytes. A real implementation would be e.g.::

        from PIL import Image; im = Image.open(io.BytesIO(payload))
        return im.width, im.height

    (PIL is not installed here; raise if someone expects real decoding.)
    """
    first = payload[0] if payload else 0
    return first, 16 + first % 64, 16 + len(payload) % 64


def decode_payloads(multimodal: DataFrame) -> DataFrame:
    """EXT-04: Arrow-batched decode over ``mapInPandas``.

    One Python worker per input partition, batches of rows as pandas
    DataFrames — payload bytes never concatenate into one driver buffer
    (contrast the reference's single 1200 KiB subprocess pipe,
    normalize_tags.mjs:4). Output schema is fixed and narrow.
    """

    def _decode(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            firsts, widths, heights = [], [], []
            for payload in pdf["payload"]:
                b = bytes(payload) if payload is not None else b""
                f, w, h = _decode_image_stub(b)
                firsts.append(f)
                widths.append(w)
                heights.append(h)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": [m["n_bytes"] for m in pdf["meta"]],
                    "first_byte": firsts,
                    "fake_width": widths,
                    "fake_height": heights,
                    "mime": [m["mime"] for m in pdf["meta"]],
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
