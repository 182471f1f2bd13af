"""PySpark-native analytics engine with the query/data-processing surface of
w0bm/mariadb-postgres-migration (reference at /root/reference, read-only),
re-expressed Spark-first and extended with LLM-data-pipeline operators.

Layout:
    session.py    SparkSession builder (AQE, Arrow, UTC, broadcast tuning)
    schemas.py    explicit StructTypes for fixture + migration-domain tables
    sources/      parquet + JDBC readers/writers (incl. upsert, clustered write)
    functions/    scalar/text function registry (normalize, repairs, regex)
    operators/    relational + extension operators (joins, aggs, window
                  threading, dedup, similarity, text analysis, multimodal)
    plans/        the end-to-end migration DAG (reference index.mjs analog)
    streaming/    Structured Streaming jobs (windows, watermark, dedup)

Every operator is designed for 100 TB scale: declarative DataFrame plans so
Catalyst prunes/pushes/broadcasts, no driver-side collect() in data paths,
Pandas UDFs (Arrow) only where built-ins can't express the semantics.
"""

__version__ = "0.1.0"
