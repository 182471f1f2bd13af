from .parquet import load_fixture_tables, read_parquet_table, write_clustered_parquet

__all__ = ["read_parquet_table", "load_fixture_tables", "write_clustered_parquet"]
