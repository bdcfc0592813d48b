"""Relational reshape surfaces: UNPIVOT (wide -> long melt) and
NTILE bucketing — the two §2.5 aggregation-adjacent shapes the
relational family didn't yet cover (pivot's inverse, and equal-count
banding; reference analog: the per-category tally tables the scraper
prints get re-shaped exactly like this before reporting).

Determinism notes: the melt is a fixed 3-arm expansion (schema-bound,
order-free); NTILE is deterministic ONLY under a total order, so the
window sorts on (quantized value, event_id) — the unique tiebreak
discipline every rank window in this repo follows.

Scale shape: the melt is in-row (stack emits 3 rows per input row,
no shuffle); the quartile window is one (event_type) keyed sort.
An equal-count banding at true corpus scale would use the exact
value-space selection of quantiles.py or approx percentiles — NTILE
over a keyed window is the per-group shape; its per-key sort is the
same exchange the decile/median family already pays.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from jobminer_spark.registry import query
from jobminer_spark.sources import load_table

_VQ = 1_000  # 1e-3 value quanta, shared recipe with anomaly.py


@query(
    "unpivot_segment_metrics",
    oracle="""
    WITH wide AS (
      SELECT c.c_mktsegment AS segment,
             COUNT(*) AS n_orders,
             SUM(CAST(floor(o.o_totalprice * 100) AS BIGINT)) AS total_cents,
             COUNT(DISTINCT o.o_custkey) AS n_customers
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      GROUP BY 1
    )
    SELECT segment, metric, CAST(value AS BIGINT) AS value FROM (
      SELECT segment, 'n_orders' AS metric, n_orders AS value FROM wide
      UNION ALL
      SELECT segment, 'total_cents', total_cents FROM wide
      UNION ALL
      SELECT segment, 'n_customers', n_customers FROM wide
    )
    """,
)
def unpivot_segment_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide per-segment aggregate melted to (segment, metric, value)
    long form via ``stack`` — pivot's inverse, the reporting-table
    shape. All metrics integer (cents-quantized revenue) so the melt
    is type-uniform without a cast zoo."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    wide = (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.floor(F.col("o_totalprice") * 100).cast("long")).alias(
                "total_cents"
            ),
            F.countDistinct("o_custkey").alias("n_customers"),
        )
    )
    return wide.select(
        "segment",
        F.expr(
            "stack(3, 'n_orders', n_orders, 'total_cents', total_cents,"
            " 'n_customers', n_customers) AS (metric, value)"
        ),
    )


@query(
    "ntile_value_quartiles",
    oracle=f"""
    WITH ev AS (
      SELECT event_id, event_type,
             CAST(floor(value * {_VQ}) AS BIGINT) AS vq
      FROM events
    ),
    banded AS (
      SELECT event_type, vq,
             NTILE(4) OVER (
               PARTITION BY event_type ORDER BY vq, event_id
             ) AS quartile
      FROM ev
    )
    SELECT event_type, CAST(quartile AS BIGINT) AS quartile,
           COUNT(*) AS n_events,
           MIN(vq) AS min_vq, MAX(vq) AS max_vq
    FROM banded GROUP BY 1, 2
    """,
)
def ntile_value_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equal-count quartile banding of quantized event values per
    type (NTILE under the unique (vq, event_id) total order), with
    each band's population and closed value range — the
    boundary-value report percentile sketches can't give exactly."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        F.floor(F.col("value") * _VQ).cast("long").alias("vq"),
    )
    w = W.partitionBy("event_type").orderBy("vq", "event_id")
    return (
        ev.select("event_type", "vq", F.ntile(4).over(w).alias("quartile"))
        .groupBy("event_type", "quartile")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("vq").alias("min_vq"),
            F.max("vq").alias("max_vq"),
        )
    )
