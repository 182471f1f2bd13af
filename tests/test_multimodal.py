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
