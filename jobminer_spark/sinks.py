"""Sinks: parquet + JDBC writers mirroring the reference's load path.

The reference opens one connection and one transaction PER JOB
(database.py:108-158) — the anti-pattern the engine replaces with
partition-batched writes: idempotence comes from the anti-join upsert
(operators/dedupe.upsert_new_keys), not per-row transactions
(SURVEY.md §2 rows 7-10).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from jobminer_spark.functions.text import truncate_to_widths
from jobminer_spark.schemas import JOB_LISTING_WIDTHS

# NVARCHAR widths from the reference DDL (database.py:54-72), used for
# createTableColumnTypes so a JDBC sink reproduces the target schema.
JOB_LISTINGS_COLUMN_TYPES = (
    "job_id VARCHAR(100), source VARCHAR(50), title VARCHAR(255), "
    "company VARCHAR(255), link VARCHAR(500), salary_min INTEGER, "
    "salary_max INTEGER, location VARCHAR(255), operating_mode VARCHAR(50), "
    "work_type VARCHAR(50), experience_level VARCHAR(50), "
    "employment_type VARCHAR(50), years_of_experience INTEGER, "
    "scrape_date TIMESTAMP, listing_status VARCHAR(20)"
)


def write_parquet(df: DataFrame, path: str, mode: str = "append") -> None:
    df.write.mode(mode).parquet(path)


def write_orc(df: DataFrame, path: str, mode: str = "append") -> None:
    """ORC sink (native Spark writer) — same columnar pushdown/pruning
    behavior as parquet for consumers that standardize on ORC. Avro is
    deliberately absent: spark-avro is an external jar not available
    in this environment (documented in OPERATORS.md)."""
    df.write.mode(mode).orc(path)


def write_jdbc_jobs(
    df: DataFrame,
    url: str,
    table: str,
    batchsize: int = 10_000,
    **options: str,
) -> None:
    """JDBC append with width truncation and partition-batched inserts.

    Replaces the reference's connection-per-job pattern: each Spark
    task holds ONE connection and flushes `batchsize`-row batches
    (database.py:106-158 did one txn per row-group of size 1).
    """
    out = truncate_to_widths(df, JOB_LISTING_WIDTHS)
    (
        out.write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("batchsize", str(batchsize))
        .option("createTableColumnTypes", JOB_LISTINGS_COLUMN_TYPES)
        .options(**options)
        .mode("append")
        .save()
    )


def write_parquet_partitioned(
    df: DataFrame, path: str, partition_cols: list[str], mode: str = "append"
) -> None:
    """Hive-style partitioned layout: the coarse keys a 100 TB reader
    will filter on (date, source) become directories, so partition
    pruning skips whole subtrees before any footer is read."""
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def write_bucketed_table(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 32,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed managed table: co-locates rows by join key at WRITE
    time so later equi-joins/aggregations on `bucket_cols` between
    same-bucketed tables run with NO shuffle exchange (verified by
    tests/test_plans.py::test_bucketed_join_has_no_shuffle). This is
    the pre-shuffle-once, join-many-times pattern for fact tables that
    are joined on the same key repeatedly."""
    w = df.write.mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table)
