"""Snapshot drift detection: exact two-sample KS and total-variation
distance between the corpus's two time halves.

An ingest pipeline re-run daily (the reference's cadence,
JobScraper function.json:6) needs to know when TODAY'S distribution
stopped looking like yesterday's — value drift (a fee change moves
the price distribution) and categorical drift (a scraper bug drops an
event type). The standard monitors are the two-sample
Kolmogorov–Smirnov statistic (max ECDF gap) and total variation
distance; both are computed here EXACTLY over integer counts, no
floats: D = max |F1(v) − F2(v)| becomes
max |cum1·n2 − cum2·n1| over the common value grid, reported as
``1000·maxdiff div (n1·n2)`` permille (truncating div, probe-pinned
identical in both engines). PSI is deliberately absent: it needs
``ln`` (the no-libm rule, PAPERS/SNIPPETS determinism notes); KS+TVD
cover the same monitoring decision without a single float.

The two samples are the corpus's own time halves — the split point
``(min_us + max_us) div 2`` over ALL events, so the operator is
replay-stable with no config. The TVD monitor counts EVERY event
(an event type that never carries a value must still register as
categorical drift — review r13); only the KS value grid filters to
non-null values. A degenerate half (all events at one timestamp)
yields NULL permilles via explicit guards, never an ANSI
divide-by-zero.

Scale shape: one events scan → one (value-bucket / type) count
aggregation (map-side combine; the value grid is cents-quantized, so
its cardinality is VALUE-SPACE bounded, ~50k buckets for a bounded
price domain, independent of row count). The ECDF prefix sums use
the distributed-prefix plan (range repartition + partition-local
running sum + broadcast per-partition offsets —
rfm._distributed_prefix), so there is NO unpartitioned window
anywhere. Overflow bound: the cross products cum·n stay under int64
for n1·n2 < 9.2e18, i.e. ~3e9 rows per side; past that, sample or
widen to DECIMAL(38,0) (stated, not discovered).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from jobminer_spark.operators.rfm import _distributed_prefix
from jobminer_spark.registry import query
from jobminer_spark.sources import load_table

# DuckDB CTEs shared by both oracles: the epoch midpoint over ALL
# events, and per-event side assignment. ``sides`` carries every
# event; ``vsides`` filters to non-null values for the KS grid.
_SPLIT_CTE = """
    ev AS (
      SELECT epoch_us(ts) AS us,
             CAST(FLOOR(value * 100.0) AS BIGINT) AS vq,
             value IS NOT NULL AS has_v,
             event_type
      FROM events
    ),
    mid AS (SELECT (MIN(us) + MAX(us)) // 2 AS m FROM ev),
    sides AS (
      SELECT vq, has_v, event_type,
             CASE WHEN us < (SELECT m FROM mid) THEN 0 ELSE 1 END AS side
      FROM ev
    ),
    vsides AS (SELECT vq, side FROM sides WHERE has_v)"""


def _sides(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        F.expr("unix_micros(cast(ts as timestamp))").alias("us"),
        F.floor(F.col("value") * 100.0).cast("long").alias("vq"),
        F.col("value").isNotNull().alias("has_v"),
        "event_type",
    )
    mid = ev.agg(F.expr("(min(us) + max(us)) div 2").alias("m"))
    return ev.crossJoin(F.broadcast(mid)).select(
        "vq",
        "has_v",
        "event_type",
        F.when(F.col("us") < F.col("m"), 0).otherwise(1).alias("side"),
    )


@query(
    "ks_drift_event_values",
    oracle=f"""
    WITH {_SPLIT_CTE},
    counts AS (
      SELECT vq,
             CAST(SUM(CASE WHEN side = 0 THEN 1 ELSE 0 END) AS BIGINT) AS c1,
             CAST(SUM(CASE WHEN side = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c2
      FROM vsides GROUP BY vq
    ),
    ecdf AS (
      SELECT vq,
             CAST(SUM(c1) OVER (ORDER BY vq) AS BIGINT) AS cum1,
             CAST(SUM(c2) OVER (ORDER BY vq) AS BIGINT) AS cum2
      FROM counts
    ),
    vt AS (
      SELECT CAST(SUM(c1) AS BIGINT) AS n1, CAST(SUM(c2) AS BIGINT) AS n2
      FROM counts
    )
    SELECT (SELECT n1 FROM vt) AS n1,
           (SELECT n2 FROM vt) AS n2,
           CAST(COUNT(*) AS BIGINT) AS n_value_buckets,
           CAST(MAX(ABS(cum1 * (SELECT n2 FROM vt)
                        - cum2 * (SELECT n1 FROM vt))) AS BIGINT)
             AS max_scaled_gap,
           CAST(CASE WHEN (SELECT n1 FROM vt) = 0 OR (SELECT n2 FROM vt) = 0
                THEN NULL
                ELSE (1000 * MAX(ABS(cum1 * (SELECT n2 FROM vt)
                                     - cum2 * (SELECT n1 FROM vt))))
                     // ((SELECT n1 FROM vt) * (SELECT n2 FROM vt)) END
             AS BIGINT) AS ks_permille
    FROM ecdf
    """,
)
def ks_drift_event_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact two-sample KS between the value distributions of the
    first and second time halves: counts per cents bucket, ECDFs via
    the distributed prefix-sum plan, and the max cross-multiplied gap
    — every number a BIGINT the oracle recomputes with its own
    window."""
    sides = _sides(spark, sf_dir).filter(F.col("has_v"))
    counts = sides.groupBy("vq").agg(
        F.sum(F.when(F.col("side") == 0, 1).otherwise(0))
        .cast("long")
        .alias("c1"),
        F.sum(F.when(F.col("side") == 1, 1).otherwise(0))
        .cast("long")
        .alias("c2"),
    )
    ecdf = _distributed_prefix(
        counts, [F.col("vq").asc()], {"c1": "cum1", "c2": "cum2"}
    )
    tot = counts.agg(
        F.sum("c1").cast("long").alias("n1"),
        F.sum("c2").cast("long").alias("n2"),
    )
    gap = F.abs(F.col("cum1") * F.col("n2") - F.col("cum2") * F.col("n1"))
    return (
        ecdf.crossJoin(F.broadcast(tot))
        .agg(
            F.first("n1").alias("n1"),
            F.first("n2").alias("n2"),
            F.count(F.lit(1)).cast("long").alias("n_value_buckets"),
            F.max(gap).cast("long").alias("max_scaled_gap"),
        )
        .selectExpr(
            "n1",
            "n2",
            "n_value_buckets",
            "max_scaled_gap",
            "CAST(CASE WHEN n1 = 0 OR n2 = 0 THEN NULL"
            " ELSE (1000 * max_scaled_gap) div (n1 * n2) END AS BIGINT)"
            " AS ks_permille",
        )
    )


@query(
    "tvd_drift_event_types",
    oracle=f"""
    WITH {_SPLIT_CTE},
    counts AS (
      SELECT event_type,
             CAST(SUM(CASE WHEN side = 0 THEN 1 ELSE 0 END) AS BIGINT) AS c1,
             CAST(SUM(CASE WHEN side = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c2
      FROM sides GROUP BY event_type
    ),
    tt AS (
      SELECT CAST(SUM(c1) AS BIGINT) AS n1, CAST(SUM(c2) AS BIGINT) AS n2
      FROM counts
    )
    SELECT (SELECT n1 FROM tt) AS n1,
           (SELECT n2 FROM tt) AS n2,
           CAST(COUNT(*) AS BIGINT) AS n_types,
           CAST(SUM(ABS(c1 * (SELECT n2 FROM tt)
                        - c2 * (SELECT n1 FROM tt))) AS BIGINT)
             AS sum_scaled_gap,
           CAST(CASE WHEN (SELECT n1 FROM tt) = 0 OR (SELECT n2 FROM tt) = 0
                THEN NULL
                ELSE (500 * SUM(ABS(c1 * (SELECT n2 FROM tt)
                                    - c2 * (SELECT n1 FROM tt))))
                     // ((SELECT n1 FROM tt) * (SELECT n2 FROM tt)) END
             AS BIGINT) AS tvd_permille
    FROM counts
    """,
)
def tvd_drift_event_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact total-variation distance between the two halves'
    event_type distributions — ½·Σ|p1 − p2| as cross-multiplied
    integers over the type-cardinality-bounded count table, counting
    EVERY event (null-valued types must register as drift too)."""
    sides = _sides(spark, sf_dir)
    counts = sides.groupBy("event_type").agg(
        F.sum(F.when(F.col("side") == 0, 1).otherwise(0))
        .cast("long")
        .alias("c1"),
        F.sum(F.when(F.col("side") == 1, 1).otherwise(0))
        .cast("long")
        .alias("c2"),
    )
    tot = counts.agg(
        F.sum("c1").cast("long").alias("n1"),
        F.sum("c2").cast("long").alias("n2"),
    )
    gap = F.abs(F.col("c1") * F.col("n2") - F.col("c2") * F.col("n1"))
    return (
        counts.crossJoin(F.broadcast(tot))
        .agg(
            F.first("n1").alias("n1"),
            F.first("n2").alias("n2"),
            F.count(F.lit(1)).cast("long").alias("n_types"),
            F.sum(gap).cast("long").alias("sum_scaled_gap"),
        )
        .selectExpr(
            "n1",
            "n2",
            "n_types",
            "sum_scaled_gap",
            "CAST(CASE WHEN n1 = 0 OR n2 = 0 THEN NULL"
            " ELSE (500 * sum_scaled_gap) div (n1 * n2) END AS BIGINT)"
            " AS tvd_permille",
        )
    )
