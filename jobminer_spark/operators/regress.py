"""Group-wise ordinary-least-squares trend fitting over monthly
revenue series — the "is this segment growing?" analytic a JobMiner
operator would run over scraped postings per category (reference
analog: the per-category counting loop it runs after scraping,
pracuj_scraper.py's per-skill tallies; SURVEY.md §2 row 32's global
counters generalized to a fitted trend).

Float regression (covariance/variance) is not cross-engine
hash-stable, so the slope is published as an EXACT RATIONAL
(slope_num, slope_den): y values are quantized to integer cents
(floor(x*100) — identical IEEE double product in both engines), x is
the month index offset by a fixed epoch constant, and every moment
(Sx, Sy, Sxy, Sxx) is a BIGINT sum. slope = slope_num / slope_den =
(n*Sxy - Sx*Sy) / (n*Sxx - Sx^2); the consumer divides once.

Scale shape: one (segment, month) partial-aggregated shuffle over the
fact table (combiner-friendly: cents sums), then a per-segment
5-moment fold over the tiny month-grid relation. No windows, no
arrays, no UDFs; the per-segment moment aggregation touches
O(segments * months) rows regardless of fact cardinality, so the
plan is identical at 100 TB — the only full-data pass is the first
map-side-combined agg.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from jobminer_spark.registry import query
from jobminer_spark.sources import load_table

# fixed epoch: months since 1995-01 (fixture min). A different fixture
# range just shifts x uniformly — the slope is translation-invariant
# in exact arithmetic, so the constant never needs retuning.
_MONTH_EPOCH = 1995 * 12


@query(
    "revenue_trend_slope_per_segment",
    oracle=f"""
    WITH monthly AS (
      SELECT c.c_mktsegment AS segment,
             (CAST(year(o.o_orderdate) AS BIGINT) * 12
              + CAST(month(o.o_orderdate) AS BIGINT)) - {_MONTH_EPOCH} AS x,
             SUM(CAST(floor(o.o_totalprice * 100) AS BIGINT)) AS y
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      GROUP BY 1, 2
    ),
    moments AS (
      SELECT segment,
             COUNT(*) AS n_months,
             SUM(x) AS sx, SUM(y) AS sy,
             SUM(x * y) AS sxy, SUM(x * x) AS sxx
      FROM monthly GROUP BY segment
    )
    SELECT segment, n_months,
           CAST(n_months * sxy - sx * sy AS BIGINT) AS slope_num,
           CAST(n_months * sxx - sx * sx AS BIGINT) AS slope_den,
           CAST(sy AS BIGINT) AS total_cents
    FROM moments
    """,
)
def revenue_trend_slope_per_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-market-segment OLS slope of monthly revenue (exact
    rational): positive slope_num (slope_den is always >= 0 with >= 2
    distinct months) means the segment's monthly revenue trends up
    over the fixture's 80-month span."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate", "o_totalprice"
    )
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    monthly = (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .select(
            F.col("c_mktsegment").alias("segment"),
            (
                F.year("o_orderdate").cast("long") * 12
                + F.month("o_orderdate").cast("long")
                - _MONTH_EPOCH
            ).alias("x"),
            F.floor(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        )
        .groupBy("segment", "x")
        .agg(F.sum("cents").alias("y"))
    )
    n = F.count(F.lit(1))
    moments = monthly.groupBy("segment").agg(
        n.alias("n_months"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    return moments.select(
        "segment",
        "n_months",
        (F.col("n_months") * F.col("sxy") - F.col("sx") * F.col("sy")).alias(
            "slope_num"
        ),
        (F.col("n_months") * F.col("sxx") - F.col("sx") * F.col("sx")).alias(
            "slope_den"
        ),
        F.col("sy").alias("total_cents"),
    )
