"""Per-source quality calibration: percentile-rank normalization
before a global quality threshold.

A raw quality score is not comparable across sources — a clean
encyclopedia source and a noisy forum source occupy different score
ranges, so one global cutoff either guts the noisy source or keeps
its junk. The standard fix (classifier-based curation practice, e.g.
the per-source thresholding discussed around CCNet/quality-classifier
pipelines — public) is to CALIBRATE within each source: replace the
raw score with its percentile rank inside the source, then threshold
the calibrated rank — by construction dropping the same fraction of
every source while keeping the raw score's ordering within a source.

Determinism: the score is the oracle-pinned text_quality_score
formula (one shared definition, textanalysis.quality_cte /
quality_scores); percent_rank over a UNIQUE ordering (score, doc_id)
is (rank-1)/(n-1), identical in both engines.

Scale shape: one (source) window pass (parallel across sources) and
one per-source aggregate — the same accepted top-k-per-group shape as
the stratified sampler.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from jobminer_spark.operators.textanalysis import quality_cte, quality_scores
from jobminer_spark.registry import query
from jobminer_spark.sources import load_table

CAL_KEEP = 0.2  # drop the bottom 20% of EVERY source


@query(
    "quality_calibrated_gate",
    oracle=f"""
    WITH {quality_cte()},
    cal AS (
      SELECT d.source, q.doc_id, q.quality_score,
             PERCENT_RANK() OVER (
               PARTITION BY d.source
               ORDER BY q.quality_score, q.doc_id
             ) AS calibrated
      FROM qual q JOIN documents d ON d.doc_id = q.doc_id
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(CASE WHEN calibrated >= {CAL_KEEP} THEN 1 END) AS BIGINT)
             AS n_kept,
           MIN(CASE WHEN calibrated >= {CAL_KEEP} THEN quality_score END)
             AS source_threshold
    FROM cal GROUP BY source
    """,
)
def quality_calibrated_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source kept counts and the EFFECTIVE raw-score threshold
    the calibration implies for each source (visibly different across
    sources — the whole point). The oracle recomputes the shared score
    formula and the identical percent ranks, so a formula drift, a
    tiebreak change, or a cross-source leak in the window partition
    turns this driver row red."""
    docs = load_table(spark, sf_dir, "documents")
    # source passes through the scoring scan — no second scan/rejoin
    q = quality_scores(docs, extra_cols=("source",))
    w = W.partitionBy("source").orderBy("quality_score", "doc_id")
    cal = q.withColumn("calibrated", F.percent_rank().over(w))
    kept = F.col("calibrated") >= CAL_KEEP
    return cal.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.count(F.when(kept, 1)).alias("n_kept"),
        F.min(F.when(kept, F.col("quality_score"))).alias("source_threshold"),
    )
