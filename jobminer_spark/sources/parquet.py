"""Parquet fixture sources.

The reference's "table scan" is a paginated HTTP crawl (reference:
JobScraper/scrapers/pracuj_scraper.py:359-425); for the analytics
engine the scan is a columnar parquet read — Catalyst pushes filters
and prunes columns into it, which is the whole point of declaring
queries lazily (SURVEY.md §4).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

FIXTURE_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one fixture table. No schema inference: parquet footers carry
    the authoritative schema (FIXTURE_SCHEMAS documents it).

    events.ts is TIMESTAMP(NANOS) in the parquet footer, which Spark 4
    rejects outright; we read it as long nanos (legacy conf, set at
    runtime so it works under ANY session incl. the driver's) and
    truncate to microsecond TimestampType — exactly what DuckDB does
    when it scans the same file, so oracle comparisons line up."""
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        from pyspark.sql import functions as F

        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in (names or FIXTURE_TABLES)}
