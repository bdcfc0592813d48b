"""Driver attestation for the Python DataSource V2 STREAMING reader
(sources/pyds.py — `streamReader`): the same paginated feed consumed
as a Structured Streaming source, with offsets = item indices and one
input partition per page per micro-batch. Completes the DSv2 story:
batch scan attested in r9 (`python_datasource_scan_audit`), this row
pins the offset-range -> partitions -> read -> commit plumbing.

Parity discipline: the drained stream is diffed ROW-for-row (full
outer on item_id, every column null-safe-compared) against the BATCH
DataSource read of the same feed, and the closed-form checksums are
restated by the oracle from ``range()`` — so a bug in either reader,
or any offset-range gap/overlap (rows lost or double-read between
micro-batches), flips the row count or the join mismatch count.

Import discipline: the streaming drain helper is imported inside the
query body (see audits.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from jobminer_spark.registry import query
from jobminer_spark.sources import load_table

_PAGE_SIZE = 100


@query(
    "python_stream_datasource_parity",
    oracle=f"""
    WITH n AS (SELECT 4 * COUNT(*) AS n_items FROM documents),
    feed AS (
      SELECT t.i AS item_id, (t.i * t.i) % 1000 AS salary_min
      FROM n, LATERAL (SELECT unnest(generate_series(0,
        CAST(n.n_items AS BIGINT) - 1)) AS i) t
    )
    SELECT
      (SELECT COUNT(*) FROM feed) AS n_rows,
      CAST(0 AS BIGINT) AS n_mismatch,
      (SELECT CAST(SUM(salary_min) AS BIGINT) FROM feed)
        AS sum_salary_min
    """,
)
def python_stream_datasource_parity(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Drains the streaming feed for real and pins it against the
    batch DataSource read of the identical feed: same row count
    (offset ranges neither drop nor duplicate items), zero
    column-level mismatches on the full-outer item join, and the
    closed-form salary checksum restated independently by the
    oracle."""
    from jobminer_spark.sources.pyds import (
        read_paginated_feed,
        read_paginated_feed_stream,
    )
    from jobminer_spark.streaming.windows import _drained_once

    n_items = 4 * load_table(spark, sf_dir, "documents").count()
    s = _drained_once(
        "pyds_feed",
        spark,
        sf_dir,
        lambda: read_paginated_feed_stream(spark, n_items, _PAGE_SIZE),
        output_mode="append",
        params=f"n_items={n_items},page_size={_PAGE_SIZE}",
    ).select(
        "item_id",
        F.col("page").alias("s_page"),
        F.col("title").alias("s_title"),
        F.col("salary_min").alias("s_min"),
        F.col("salary_max").alias("s_max"),
    )
    b = read_paginated_feed(spark, n_items, _PAGE_SIZE).select(
        "item_id",
        F.col("page").alias("b_page"),
        F.col("title").alias("b_title"),
        F.col("salary_min").alias("b_min"),
        F.col("salary_max").alias("b_max"),
    )
    j = b.join(s, "item_id", "full_outer")
    mismatch = (
        (~F.col("b_page").eqNullSafe(F.col("s_page")))
        | (~F.col("b_title").eqNullSafe(F.col("s_title")))
        | (~F.col("b_min").eqNullSafe(F.col("s_min")))
        | (~F.col("b_max").eqNullSafe(F.col("s_max")))
    )
    return j.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count(F.when(mismatch, 1)).alias("n_mismatch"),
        F.sum("s_min").alias("sum_salary_min"),
    )
