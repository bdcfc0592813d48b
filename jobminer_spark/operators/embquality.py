"""Embedding-space quality gating: norm-outlier detection.

A corrupted embedding pipeline ships recognizable damage — zero
vectors from failed encodes, huge norms from missing normalization,
truncated-precision clumps. The cheapest model-free gate is the
vector-norm z-score: flag vectors whose squared norm sits more than
Z_CUT standard deviations from the corpus mean (the embedding-side
analogue of the length/character gates in curation.py).

Determinism AND overflow headroom: the squared norm is the exact
quantized long of common.qdot (~6.4e16 for 64 unit-ish dims), then
integer-divided by MOM_DIV = 1e9 before the moment sums — the
coarser mq ≈ norm²·1e6 keeps z exact to ~1e-6 relative (identical in
both engines) while bounding mq² at ~4e15, so the decimal(38,0) /
HUGEINT second-moment sum holds ~1e22 vectors — no corpus can
overflow it. Summing raw n2q² instead (~4e33/term) would turn NULL
under non-ANSI arithmetic at a few tens of thousands of vectors and
silently report zero outliers — the exact silent-overflow trap
dedupe._label_sum guards against.

Scale shape: one map-side-combinable aggregation for the two moments
(a 2-long-row result, broadcast back), then one in-row z computation
per vector — no corpus shuffle at all beyond the moment aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from jobminer_spark.operators.common import QUANT, qdot
from jobminer_spark.registry import query
from jobminer_spark.sources import load_table

Z_CUT = 2.0
MOM_DIV = 1_000_000_000  # n2q -> mq: moment-sum headroom, see docstring


def norm_outliers(emb: DataFrame, z_cut: float = Z_CUT) -> DataFrame:
    """(vec_id, norm, z) for vectors with |z| > z_cut on the squared
    norm. ``emb`` is (vec_id, embedding)."""
    q = emb.select(
        "vec_id",
        qdot(F.col("embedding"), F.col("embedding")).alias("n2q"),
    ).withColumn("mq", F.expr(f"n2q div {MOM_DIV}"))
    mom = q.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("mq").cast("decimal(38,0)")).alias("s1"),
        F.sum(
            (F.col("mq").cast("decimal(38,0)") * F.col("mq").cast("decimal(38,0)"))
        ).alias("s2"),
    )
    scored = q.crossJoin(F.broadcast(mom)).select(
        "vec_id",
        "n2q",
        "mq",
        (F.col("s1").cast("double") / F.col("n")).alias("mean"),
        F.sqrt(
            F.col("s2").cast("double") / F.col("n")
            - (F.col("s1").cast("double") / F.col("n"))
            * (F.col("s1").cast("double") / F.col("n"))
        ).alias("std"),
    )
    z = (F.col("mq").cast("double") - F.col("mean")) / F.col("std")
    return (
        scored.select(
            "vec_id",
            F.sqrt(F.col("n2q").cast("double") / F.lit(float(QUANT))).alias("norm"),
            z.alias("z"),
        )
        .filter(F.abs(F.col("z")) > z_cut)
    )


@query(
    "embedding_norm_outliers",
    oracle=f"""
    WITH q AS MATERIALIZED (
      SELECT vec_id,
             CAST(SUM(CAST(floor(val * val * {QUANT}.0) AS BIGINT)) AS BIGINT)
               AS n2q
      FROM (
        SELECT vec_id, CAST(v AS DOUBLE) AS val FROM (
          SELECT vec_id, unnest(embedding) AS v FROM embeddings))
      GROUP BY vec_id
    ),
    qm AS (SELECT vec_id, n2q, n2q // {MOM_DIV} AS mq FROM q),
    mom AS (
      SELECT COUNT(*) AS n,
             SUM(CAST(mq AS HUGEINT)) AS s1,
             SUM(CAST(mq AS HUGEINT) * CAST(mq AS HUGEINT)) AS s2
      FROM qm
    )
    SELECT vec_id,
           sqrt(CAST(n2q AS DOUBLE) / {QUANT}.0) AS norm,
           (CAST(mq AS DOUBLE) - CAST(s1 AS DOUBLE) / n)
             / sqrt(CAST(s2 AS DOUBLE) / n
                    - (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n)) AS z
    FROM qm CROSS JOIN mom
    WHERE abs((CAST(mq AS DOUBLE) - CAST(s1 AS DOUBLE) / n)
              / sqrt(CAST(s2 AS DOUBLE) / n
                     - (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n)))
          > {Z_CUT}
    """,
)
def embedding_norm_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus norm-outlier gate at |z| > 2 — the oracle recomputes the
    exact quantized moments and the identical z decisions, so a drift
    in the accumulator types (the silent overflow trap), the moment
    math, or the threshold turns this driver row red."""
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    return norm_outliers(emb)
