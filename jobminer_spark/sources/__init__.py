from jobminer_spark.sources.parquet import load_table, load_tables

__all__ = ["load_table", "load_tables"]
