"""Parquet fixture sources.

The reference's "table scan" is a paginated HTTP crawl (reference:
JobScraper/scrapers/pracuj_scraper.py:359-425); for the analytics
engine the scan is a columnar parquet read — Catalyst pushes filters
and prunes columns into it, which is the whole point of declaring
queries lazily (SURVEY.md §4).
"""

from __future__ import annotations

import os

import pyarrow.parquet as pq
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


_TS_NANOS_CACHE: dict[str, bool] = {}


def events_ts_is_nanos(path: str, spark: SparkSession | None = None) -> bool:
    """True when this events parquet stores ts as TIMESTAMP(NANOS)
    (the fixture's physical ts type has varied across generations).
    Footer-only probe via pyarrow — no Spark job, no session conf
    mutation — cached per path (fixture files are immutable for a
    session's lifetime). Handles both a single file and a local
    part-file directory (ParquetDataset); for layouts pyarrow cannot
    open (e.g. a remote filesystem path), falls back to a Spark batch
    probe with the legacy conf set only for the probe's duration and
    restored afterward."""
    if path not in _TS_NANOS_CACHE:
        try:
            schema = pq.read_schema(path)
        except Exception:
            try:
                schema = pq.ParquetDataset(path).schema
            except Exception:
                schema = None
        if schema is not None:
            # Proper type inspection, not stringified comparison: a
            # tz-aware nanos column renders as "timestamp[ns, tz=UTC]"
            # and a string match would misclassify it as micros, after
            # which the Spark 4 read fails outright instead of taking
            # the nanos-as-long path. A footer without a ts column is
            # simply not nanos (no KeyError).
            import pyarrow as pa

            if schema.get_field_index("ts") < 0:
                _TS_NANOS_CACHE[path] = False
            else:
                t = schema.field("ts").type
                _TS_NANOS_CACHE[path] = (
                    pa.types.is_timestamp(t) and t.unit == "ns"
                )
        else:
            if spark is None:
                raise ValueError(
                    f"cannot probe parquet footer at {path!r} with pyarrow "
                    "and no SparkSession was provided for the fallback probe"
                )
            key = "spark.sql.legacy.parquet.nanosAsLong"
            prev = spark.conf.get(key, None)
            spark.conf.set(key, "true")
            try:
                _TS_NANOS_CACHE[path] = (
                    dict(spark.read.parquet(path).dtypes).get("ts") == "bigint"
                )
            finally:
                if prev is None:
                    spark.conf.unset(key)
                else:
                    spark.conf.set(key, prev)
    return _TS_NANOS_CACHE[path]


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one fixture table. No schema inference: parquet footers carry
    the authoritative schema (FIXTURE_SCHEMAS documents it).

    When events.ts is TIMESTAMP(NANOS) in the parquet footer — which
    Spark 4 rejects outright — we read it as long nanos (legacy conf,
    set at runtime so it works under ANY session incl. the driver's)
    and truncate to microsecond TimestampType — exactly what DuckDB
    does when it scans the same file, so oracle comparisons line up.
    The conf is only touched when the footer really is nanos (pyarrow
    probe), so micros-generation fixtures leave session state alone."""
    path = os.path.join(sf_dir, f"{name}.parquet")
    ts_is_nanos = name == "events" and events_ts_is_nanos(path, spark)
    if ts_is_nanos:
        # Needed at scan time (and for the plan's lifetime): the parquet
        # reader consults the footer on execution, not just at planning.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    if ts_is_nanos:
        from pyspark.sql import functions as F

        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in (names or FIXTURE_TABLES)}
