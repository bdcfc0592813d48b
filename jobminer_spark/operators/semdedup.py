"""Semantic (embedding-space) deduplication, cluster-scoped.

SemDeDup (Abbas et al. 2023, "SemDeDup: Data-efficient learning at
web-scale through semantic deduplication" — public paper) removes
semantic duplicates — paraphrases, re-renders, template variants that
share no n-grams — by clustering embeddings with k-means and dropping,
WITHIN each cluster, all but one member of every high-cosine group.
The clustering is what makes the quadratic pairwise term tractable:
pairs are only scored inside a cluster, and k grows with the corpus so
the max cluster size (and Σ|cluster|² work) stays bounded.

Determinism contract (the paper's greedy epsilon-dedup depends on
iteration order, which no distributed engine should promise):
``semantic_dedup`` keeps vector v iff NO lower-id vector in v's
cluster has cosine >= t with v — a priority rule that is
order-independent, one self-join + one anti-join, and exactly
SQL-expressible. It can drop slightly more than the greedy variant
(v may be dropped by a u that was itself dropped); for dedup that
direction errs toward recall, the side 100 TB curation wants.

The fixture embeddings carry no high-cosine pairs (measured max
~0.51), so the driver query plants deterministic perturbed twins
(embedlsh.planted_twins, cosine ~0.98 to their base) to make the row
discriminating — the oracle replants them identically.

Scale shape: centroids broadcast (K rows); assignment is one in-row
quantized-distance fold per (vector, centroid), no corpus shuffle;
the pair join shuffles once on the cluster key and is Σ|cluster|²
bounded; norms are computed in-row. Exact quantized arithmetic
end-to-end (common.qdist_col / qdot), so assignment and the cosine
threshold decision are bit-identical cross-engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from jobminer_spark.operators.common import (
    KM_K,
    KM_QUANT,
    QUANT,
    VEC_NORMS_CTE,
    norm_col,
    qdist_col,
    qdot,
)
from jobminer_spark.operators.embedlsh import planted_twins, planted_twins_cte
from jobminer_spark.registry import query
from jobminer_spark.sources import load_table

SEM_T = 0.97  # same "semantic duplicate" threshold as the LSH audits


def assign_to_centroids(vectors: DataFrame, cents: DataFrame) -> DataFrame:
    """(vec_id, cluster): nearest centroid by quantized squared L2,
    deterministic (qdist, cid) tiebreak — the same assignment kernel
    as similarity.kmeans_assign_fixed_centroids, over ANY centroid
    frame (cid, cvec). Centroids broadcast; the corpus never
    shuffles for the distance computation."""
    d = vectors.crossJoin(F.broadcast(cents)).select(
        "vec_id", "cid", qdist_col(F.col("embedding"), F.col("cvec")).alias("qdist")
    )
    w = W.partitionBy("vec_id").orderBy("qdist", "cid")
    return (
        d.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", F.col("cid").alias("cluster"))
    )


def semantic_dedup(
    vectors: DataFrame, cents: DataFrame, t: float = SEM_T
) -> DataFrame:
    """(vec_id, cluster) survivors of cluster-scoped cosine dedup
    under the priority rule in the module docstring. ``vectors`` is
    (vec_id, embedding array<double>), ``cents`` is (cid, cvec)."""
    asg = assign_to_centroids(vectors, cents)
    e = vectors.join(asg, "vec_id").select(
        "vec_id", "cluster", "embedding", norm_col(F.col("embedding")).alias("nrm")
    )
    a = e.select(
        F.col("vec_id").alias("vec_a"),
        F.col("cluster").alias("cl_a"),
        F.col("embedding").alias("emb_a"),
        F.col("nrm").alias("nrm_a"),
    )
    b = e.select(
        F.col("vec_id").alias("vec_b"),
        F.col("cluster").alias("cl_b"),
        F.col("embedding").alias("emb_b"),
        F.col("nrm").alias("nrm_b"),
    )
    dropped = (
        a.join(
            b,
            (F.col("cl_a") == F.col("cl_b")) & (F.col("vec_a") < F.col("vec_b")),
        )
        .filter(
            qdot(F.col("emb_a"), F.col("emb_b")).cast("double")
            / F.lit(float(QUANT))
            / (F.col("nrm_a") * F.col("nrm_b"))
            >= t
        )
        .select(F.col("vec_b").alias("vec_id"))
        .distinct()
    )
    return asg.join(dropped, "vec_id", "left_anti")


@query(
    "semantic_dedup_survivors",
    oracle=f"""
    WITH {VEC_NORMS_CTE},
    {planted_twins_cte()},
    allel AS MATERIALIZED (
      SELECT vec_id, ord, val FROM elems
      UNION ALL
      SELECT vec_id, ord, val FROM pert
    ),
    cel AS (SELECT vec_id AS cid, ord, val AS cx FROM elems
            WHERE vec_id < {KM_K}),
    d AS (
      SELECT a.vec_id, c.cid,
             CAST(SUM(CAST(floor((a.val - c.cx) * (a.val - c.cx) * {KM_QUANT})
                           AS BIGINT)) AS BIGINT) AS qdist
      FROM allel a JOIN cel c ON c.ord = a.ord
      GROUP BY a.vec_id, c.cid
    ),
    asg AS MATERIALIZED (
      SELECT vec_id, cid AS cluster FROM (
        SELECT vec_id, cid,
               ROW_NUMBER() OVER (PARTITION BY vec_id
                                  ORDER BY qdist, cid) AS rn
        FROM d)
      WHERE rn = 1
    ),
    anorm AS MATERIALIZED (
      SELECT vec_id,
             sqrt(CAST(SUM(CAST(floor(val * val * {QUANT}.0) AS BIGINT)) AS DOUBLE)
                  / {QUANT}.0) AS nrm
      FROM allel GROUP BY vec_id
    ),
    pair_dots AS (
      SELECT x.vec_id AS va, y.vec_id AS vb,
             CAST(SUM(CAST(floor(ea.val * eb.val * {QUANT}.0) AS BIGINT)) AS DOUBLE)
               / {QUANT}.0 AS dot
      FROM asg x
      JOIN asg y ON y.cluster = x.cluster AND x.vec_id < y.vec_id
      JOIN allel ea ON ea.vec_id = x.vec_id
      JOIN allel eb ON eb.vec_id = y.vec_id AND eb.ord = ea.ord
      GROUP BY x.vec_id, y.vec_id
    ),
    dropped AS (
      SELECT DISTINCT pd.vb FROM pair_dots pd
      JOIN anorm na ON na.vec_id = pd.va
      JOIN anorm nb ON nb.vec_id = pd.vb
      WHERE pd.dot / (na.nrm * nb.nrm) >= {SEM_T}
    )
    SELECT a.vec_id, a.cluster FROM asg a
    WHERE a.vec_id NOT IN (SELECT vb FROM dropped)
    """,
)
def semantic_dedup_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-scoped semantic dedup over the fixture embeddings plus
    deterministic planted twins: the oracle replants the twins,
    recomputes the seed-centroid assignment, the within-cluster
    quantized cosines, and the priority drop rule, so any divergence
    in clustering, pairing, or the threshold decision turns this
    driver row red. The planted twins (cosine ~0.98 to their base,
    which has the lower id) are exactly the rows that must be
    dropped."""
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    twins = planted_twins(emb).select("vec_id", "embedding")
    allv = emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    ).unionByName(twins)
    cents = emb.filter(F.col("vec_id") < KM_K).select(
        F.col("vec_id").alias("cid"),
        F.col("embedding").cast("array<double>").alias("cvec"),
    )
    return semantic_dedup(allv, cents, SEM_T)
