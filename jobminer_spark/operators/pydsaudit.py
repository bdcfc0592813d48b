"""Driver attestation for the Python DataSource V2 feed source
(sources/pyds.py): the feed is a closed-form function of the item
index, so DuckDB regenerates it from ``range()`` and every aggregate
— row count, page count, per-page cardinality invariant, salary
checksums — pins the partition planner and reader byte-for-byte.

The feed size scales with the fixture (n_items = 4x documents rows)
so the audit exercises multi-page planning at every SF without
hardcoding counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from jobminer_spark.registry import query
from jobminer_spark.sources import load_table

_PAGE_SIZE = 100


@query(
    "python_datasource_scan_audit",
    oracle=f"""
    WITH n AS (SELECT 4 * COUNT(*) AS n_items FROM documents),
    feed AS (
      SELECT t.i AS item_id,
             t.i // {_PAGE_SIZE} AS page,
             (t.i * t.i) % 1000 AS salary_min
      FROM n, LATERAL (SELECT unnest(generate_series(0, CAST(n.n_items AS BIGINT) - 1)) AS i) t
    ),
    pages AS (
      SELECT page, COUNT(*) AS per_page FROM feed GROUP BY page
    )
    SELECT
      (SELECT COUNT(*) FROM feed) AS n_rows,
      (SELECT COUNT(*) FROM pages) AS n_pages,
      (SELECT COUNT(*) FROM pages
        WHERE per_page NOT IN ({_PAGE_SIZE},
          (SELECT n_items % {_PAGE_SIZE} FROM n))) AS n_bad_pages,
      (SELECT CAST(SUM(salary_min) AS BIGINT) FROM feed) AS sum_salary_min,
      (SELECT CAST(SUM(salary_min + 500) AS BIGINT) FROM feed) AS sum_salary_max
    """,
)
def python_datasource_scan_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scan the paginated-feed DataSource (one Spark input partition
    per page) and pin its output against the closed-form oracle:
    exact row/page counts, every page full except possibly the last,
    and checksums over both derived columns."""
    from jobminer_spark.sources.pyds import read_paginated_feed

    n_items = 4 * load_table(spark, sf_dir, "documents").count()
    feed = read_paginated_feed(spark, n_items, _PAGE_SIZE)
    pages = feed.groupBy("page").agg(F.count(F.lit(1)).alias("per_page"))
    ok_sizes = [_PAGE_SIZE, n_items % _PAGE_SIZE]
    page_agg = pages.agg(
        F.count(F.lit(1)).alias("n_pages"),
        F.count(F.when(~F.col("per_page").isin(ok_sizes), 1)).alias(
            "n_bad_pages"
        ),
    )
    row_agg = feed.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("salary_min").alias("sum_salary_min"),
        F.sum("salary_max").alias("sum_salary_max"),
    )
    # two 1-row aggregates — a trivial broadcast cross join
    return row_agg.crossJoin(page_agg).select(
        "n_rows", "n_pages", "n_bad_pages", "sum_salary_min", "sum_salary_max"
    )
