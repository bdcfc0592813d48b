"""CUSUM changepoint detection — the sequential drift detector
(Page 1954): alarm when the one-sided cumulative sum of deviations
S_i = max(0, S_{i-1} + (x_i − target − slack)) crosses a threshold.
Complements the rolling z-score (operators/anomaly.py): the z-gate
fires on single outliers, CUSUM on small persistent shifts no single
observation reveals.

The recursive max(0, ·) fold looks window-inexpressible, but the
classic identity S_i = P_i − min_{0≤j≤i} P_j (P = prefix sum of
deviations, P_0 = 0) turns it into two frames over ONE (event_type)
sort: a running sum and a running min — both exact over integer
quanta, so the alarm set hash-pins cross-engine with no recursion
machinery.

All parameters derive from the data in exact integer arithmetic:
target = per-type integer mean of the 1e-3-quantized values
(sum div count — truncating division, identical in both engines),
slack = target div 20 (5%), threshold h = target. One narrow
per-type constants frame broadcasts back onto the stream.

Scale shape: one (event_type) keyed sort shared by both window
frames + one broadcast join of the type-cardinality constants —
the anomaly.py exchange budget exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from jobminer_spark.registry import query
from jobminer_spark.sources import load_table

_VQ = 1000


@query(
    "cusum_changepoint_alarms",
    oracle=f"""
    WITH ev AS (
      SELECT event_type, event_id, epoch_us(ts) AS tus,
             CAST(FLOOR(value * {_VQ}.0) AS BIGINT) AS vq
      FROM events
    ),
    params AS (
      SELECT event_type,
             SUM(vq) // COUNT(*) AS target_q
      FROM ev GROUP BY event_type
    ),
    dev AS (
      SELECT e.event_type, e.event_id, e.tus,
             e.vq - p.target_q - (p.target_q // 20) AS d,
             p.target_q AS h
      FROM ev e JOIN params p ON p.event_type = e.event_type
    ),
    pre1 AS (
      SELECT event_type, event_id, tus, h,
             SUM(d) OVER (PARTITION BY event_type ORDER BY tus, event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS psum
      FROM dev
    ),
    pre AS (
      SELECT event_type, event_id, h, psum,
             LEAST(0, MIN(psum) OVER (
               PARTITION BY event_type ORDER BY tus, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) AS pmin
      FROM pre1
    )
    SELECT event_type, event_id,
           CAST(psum - pmin AS BIGINT) AS s_q
    FROM pre WHERE psum - pmin > h
    """,
)
def cusum_changepoint_alarms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every (event_type, event_id) where the one-sided CUSUM statistic
    exceeds its threshold, with the exact integer statistic value —
    row-for-row against the oracle's identical two-frame rewrite.
    ``LEAST(0, min)`` realizes P_0 = 0 (the virtual empty prefix), so
    the statistic can never exceed the raw prefix sum."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        "event_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("tus"),
        F.floor(F.col("value") * _VQ).cast("long").alias("vq"),
    )
    params = ev.groupBy("event_type").agg(
        F.expr("sum(vq) div count(*)").alias("target_q")
    )
    dev = ev.join(F.broadcast(params), "event_type").select(
        "event_type",
        "event_id",
        "tus",
        (
            F.col("vq") - F.col("target_q") - F.expr("target_q div 20")
        ).alias("d"),
        F.col("target_q").alias("h"),
    )
    w = (
        W.partitionBy("event_type")
        .orderBy("tus", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    pre = dev.withColumn("psum", F.sum("d").over(w)).withColumn(
        "pmin", F.least(F.lit(0), F.min(F.col("psum")).over(w))
    )
    return (
        pre.filter(F.col("psum") - F.col("pmin") > F.col("h"))
        .select(
            "event_type",
            "event_id",
            (F.col("psum") - F.col("pmin")).alias("s_q"),
        )
    )
