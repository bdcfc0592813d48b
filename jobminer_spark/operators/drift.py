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
from jobminer_spark.operators.textanalysis import quality_cte, quality_scores
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
    counts = (
        sides.groupBy("vq")
        .agg(
            F.sum(F.when(F.col("side") == 0, 1).otherwise(0))
            .cast("long")
            .alias("c1"),
            F.sum(F.when(F.col("side") == 1, 1).otherwise(0))
            .cast("long")
            .alias("c2"),
        )
        # counts is evaluated THREE times downstream — the range
        # exchange's sampling pass, the real shuffle, and the totals
        # aggregate — and every evaluation re-scans events. The lazy
        # cut materializes the bucket-sized frame once inside the
        # first of those jobs (guide §5); buckets are grid-bounded at
        # any SF.
        .localCheckpoint(eager=False)
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


@query(
    "ks_quality_by_source",
    oracle=f"""
    WITH {quality_cte()},
    src AS (
      SELECT q.doc_id, d.source,
             CAST(FLOOR(q.quality_score * 10000.0) AS BIGINT) AS vq
      FROM qual q JOIN documents d ON d.doc_id = q.doc_id
    ),
    counts AS (
      SELECT source, vq, CAST(COUNT(*) AS BIGINT) AS c
      FROM src GROUP BY source, vq
    ),
    grid AS (SELECT DISTINCT vq FROM counts),
    srcs AS (
      SELECT source, CAST(SUM(c) AS BIGINT) AS n_s FROM counts GROUP BY source
    ),
    tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM counts),
    filled AS (
      SELECT s.source, g.vq, COALESCE(c.c, 0) AS c
      FROM grid g CROSS JOIN srcs s
      LEFT JOIN counts c ON c.source = s.source AND c.vq = g.vq
    ),
    ecdf AS (
      SELECT source, vq,
             CAST(SUM(c) OVER (PARTITION BY source ORDER BY vq) AS BIGINT)
               AS cum_s
      FROM filled
    ),
    tcum AS (
      SELECT vq, CAST(SUM(cum_s) AS BIGINT) AS cum_t FROM ecdf GROUP BY vq
    )
    SELECT e.source,
           s.n_s AS n_source,
           CAST(MAX(ABS(e.cum_s * ((SELECT n FROM tot) - s.n_s)
                        - (t.cum_t - e.cum_s) * s.n_s)) AS BIGINT)
             AS max_scaled_gap,
           CAST(CASE WHEN s.n_s = 0 OR s.n_s = (SELECT n FROM tot) THEN NULL
                ELSE (1000 * MAX(ABS(e.cum_s * ((SELECT n FROM tot) - s.n_s)
                                     - (t.cum_t - e.cum_s) * s.n_s)))
                     // (s.n_s * ((SELECT n FROM tot) - s.n_s)) END AS BIGINT)
             AS ks_permille
    FROM ecdf e JOIN tcum t ON t.vq = e.vq JOIN srcs s ON s.source = e.source
    GROUP BY e.source, s.n_s
    """,
)
def ks_quality_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WHICH source drifted: per-source exact KS between the source's
    quality-score distribution and the REST of the corpus — the
    curation diagnostic behind per-source calibration (a source whose
    scores are distributionally alien needs its own gate, not the
    global one; cf. calibrate.py). Σ_s cum_s(v) = cum_total(v), so
    the rest-ECDF is (cum_t − cum_s) with no second pass.

    Scale shape: ECDFs use windows PARTITIONED by source (fully
    parallel); the grid×sources fill frame is value-space ×
    |sources| — corpus-size-independent — and the rest is keyed joins
    on that bounded frame. Cross products stay under int64 for
    corpora to ~3e9 docs (the kappa/KS family bound)."""
    from pyspark.sql import Window as W

    docs = load_table(spark, sf_dir, "documents")
    src = quality_scores(docs, extra_cols=("source",)).select(
        "source",
        F.floor(F.col("quality_score") * 10000.0).cast("long").alias("vq"),
    )
    counts = src.groupBy("source", "vq").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    grid = counts.select("vq").distinct()
    srcs = counts.groupBy("source").agg(F.sum("c").cast("long").alias("n_s"))
    tot = counts.agg(F.sum("c").cast("long").alias("n"))
    filled = (
        grid.crossJoin(F.broadcast(srcs))
        .join(counts, ["source", "vq"], "left")
        .select("source", "vq", F.coalesce("c", F.lit(0)).alias("c"))
    )
    ecdf = filled.select(
        "source",
        "vq",
        F.sum("c")
        .over(
            W.partitionBy("source")
            .orderBy("vq")
            .rowsBetween(W.unboundedPreceding, 0)
        )
        .cast("long")
        .alias("cum_s"),
    )
    tcum = ecdf.groupBy("vq").agg(F.sum("cum_s").cast("long").alias("cum_t"))
    gap = F.abs(
        F.col("cum_s") * (F.col("n") - F.col("n_s"))
        - (F.col("cum_t") - F.col("cum_s")) * F.col("n_s")
    )
    return (
        ecdf.join(tcum, "vq")
        .join(F.broadcast(srcs), "source")
        .crossJoin(F.broadcast(tot))
        .groupBy("source", "n_s", "n")
        .agg(F.max(gap).cast("long").alias("max_scaled_gap"))
        .selectExpr(
            "source",
            "n_s AS n_source",
            "max_scaled_gap",
            "CAST(CASE WHEN n_s = 0 OR n_s = n THEN NULL"
            " ELSE (1000 * max_scaled_gap) div (n_s * (n - n_s)) END"
            " AS BIGINT) AS ks_permille",
        )
    )
