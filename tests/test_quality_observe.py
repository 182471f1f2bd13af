"""Inline observation metrics: counts accumulate during the action itself
(no second scan), for both a plain write and a scrub pipeline."""

from pyspark.sql import Row
from pyspark.sql import functions as F

from mariadb_postgres_migration_spark.functions.quality import observed_quality_gate
from mariadb_postgres_migration_spark.operators.textanalysis import pii_scrub
from mariadb_postgres_migration_spark.sources.parquet import read_parquet_table


def test_default_gate_counts_rows_and_nulls(spark, sf_dir):
    docs = read_parquet_table(spark, sf_dir, "documents")
    observed, obs = observed_quality_gate(docs)
    observed.write.format("noop").mode("overwrite").save()
    got = obs.get
    assert got["rows"] == docs.count()
    assert got["null_lang"] == docs.filter(F.col("lang").isNull()).count()


def test_custom_gate_audits_scrub_during_the_write(spark):
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="a@b.co and c@d.io"),
            Row(doc_id=2, text="clean"),
        ]
    )
    scrubbed = pii_scrub(docs)
    observed, obs = observed_quality_gate(
        scrubbed,
        {
            "rows": F.count(F.lit(1)),
            "total_redactions": F.sum(
                F.col("n_email") + F.col("n_ip") + F.col("n_phone")
            ),
            "docs_touched": F.sum(
                ((F.col("n_email") + F.col("n_ip") + F.col("n_phone")) > 0).cast("int")
            ),
        },
        name="scrub_audit",
    )
    observed.write.format("noop").mode("overwrite").save()
    got = obs.get
    assert got == {"rows": 2, "total_redactions": 2, "docs_touched": 1}
