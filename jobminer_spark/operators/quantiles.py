"""Exact distributed quantiles by value-space selection — the
complement of sketches.quantile_sketch_audit (which attests the
APPROXIMATE scale path): when the group count is small but each
group is huge, the exact median is computable WITHOUT sorting rows —
aggregate counts per distinct (quantized) value, then select the
first value whose cumulative count reaches the target rank.

Scale shape: one (event_type, vq) count aggregation (map-side
combinable, fully parallel over 100 TB of rows), then a window pass
over the DISTINCT VALUE SPACE per group — bounded by value
cardinality, not row count. A row_number-the-whole-group approach
would funnel every row of a group through one partition; this plan
never does.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from jobminer_spark.registry import query
from jobminer_spark.sources import load_table


@query(
    "exact_median_by_event_type",
    oracle="""
    WITH ev AS (
      SELECT event_type,
             CAST(FLOOR(value * 1000000.0) AS BIGINT) AS vq
      FROM events
    ),
    counts AS (
      SELECT event_type, vq, COUNT(*) AS c FROM ev GROUP BY event_type, vq
    ),
    cum AS (
      SELECT event_type, vq, c,
             SUM(c) OVER (PARTITION BY event_type ORDER BY vq
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cc,
             SUM(c) OVER (PARTITION BY event_type) AS n
      FROM counts
    )
    SELECT event_type,
           CAST(MIN(n) AS BIGINT) AS n_events,
           CAST(MIN(vq) AS BIGINT) AS median_vq
    FROM cum
    WHERE cc >= (n + 1) // 2
    GROUP BY event_type
    """,
)
def exact_median_by_event_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact lower median of the floor-quantized event value per
    event_type, computed by cumulative-count selection over the
    distinct value space (rank target (n+1) div 2 — integer-exact on
    both engines)."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.floor(F.col("value") * F.lit(1000000.0)).cast("long").alias("vq"),
    )
    counts = ev.groupBy("event_type", "vq").agg(F.count(F.lit(1)).alias("c"))
    wcum = (
        W.partitionBy("event_type")
        .orderBy("vq")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    cum = counts.select(
        "event_type",
        "vq",
        F.sum("c").over(wcum).alias("cc"),
        F.sum("c").over(W.partitionBy("event_type")).alias("n"),
    )
    hit = cum.filter(F.col("cc") >= F.expr("(n + 1) div 2"))
    return hit.groupBy("event_type").agg(
        F.min("n").alias("n_events"),
        F.min("vq").alias("median_vq"),
    )
