"""Int8 scalar quantization for embeddings — the OTHER memory scale
path beside product quantization: keep every dimension but store it
in one byte (4× smaller than float32), with a per-vector scale
(symmetric max-abs quantization, the standard int8 embedding recipe).

``embedding_int8_recall_audit`` measures exactly what the compression
costs: int8 top-k neighbors (approximate cosine from integer dot
products) against full-precision brute-force top-k, per query — the
same measurement contract as the IVF/PQ recall audits, so the three
compression strategies are directly comparable on one fixture.

Determinism: the quantizer is ``floor(x / scale · 127 + 0.5)`` with
``scale = max|x|`` — one IEEE division, one multiply, one add, one
floor, identical op order on both engines; integer dot products and
squared norms accumulate exactly; the approximate cosine divides by
``sqrt`` of integer norms, and IEEE sqrt is correctly rounded (unlike
ln), so even the float ranking is bit-identical cross-engine.

Scale shape: quantization is an in-row transform (no shuffle); the
audit's pairwise scan is the measurement path only — production
serving would put the int8 codes behind the SAME IVF/LSH blocking the
other ANN operators use (sign buckets, banded hyperplanes), which is
orthogonal to the storage format.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from jobminer_spark.operators.pq import _BRUTE_TOP_CTES
from jobminer_spark.operators.similarity import ANN_N_QUERIES, ANN_TOP_K, _VEC_NORMS_CTE
from jobminer_spark.registry import query
from jobminer_spark.sources import load_table

INT8_MAX = 127


def int8_codes(emb: DataFrame) -> DataFrame:
    """(vec_id, q, qn2): symmetric max-abs int8 codes plus the integer
    squared norm — all in-row. A zero vector quantizes to all-zero
    codes (scale guard) and is excluded from cosine ranking by its
    zero norm."""
    scale = F.array_max(F.transform("embedding", lambda x: F.abs(x.cast("double"))))
    q = F.transform(
        "embedding",
        lambda x: F.when(F.col("scale") == 0.0, F.lit(0).cast("long")).otherwise(
            F.floor(
                x.cast("double") / F.col("scale") * F.lit(float(INT8_MAX)) + F.lit(0.5)
            ).cast("long")
        ),
    )
    qn2 = F.aggregate(
        "q", F.lit(0).cast("long"), lambda acc, v: acc + v * v
    )
    return (
        emb.withColumn("scale", scale)
        .withColumn("q", q)
        .withColumn("qn2", qn2)
        .select("vec_id", "q", "qn2")
    )


def int8_topk(
    emb: DataFrame, n_queries: int = ANN_N_QUERIES, k: int = ANN_TOP_K
) -> DataFrame:
    """(query_id, neighbor_id, cosine_q, rnk): top-k by int8
    approximate cosine — integer dot over the codes, sqrt of integer
    norms. The scan shuffles CODES (1 byte/dim worth of information),
    never raw floats."""
    codes = int8_codes(emb)
    qs = codes.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"),
        F.col("q").alias("qa"),
        F.col("qn2").alias("na"),
    )
    pairs = codes.filter(F.col("qn2") > 0).crossJoin(F.broadcast(qs.filter(F.col("na") > 0)))
    dot = F.aggregate(
        F.zip_with("q", "qa", lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    scored = pairs.filter(F.col("vec_id") != F.col("query_id")).select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        (
            dot.cast("double")
            / (F.sqrt(F.col("na").cast("double")) * F.sqrt(F.col("qn2").cast("double")))
        ).alias("cosine_q"),
    )
    w = W.partitionBy("query_id").orderBy(F.col("cosine_q").desc(), "neighbor_id")
    return scored.withColumn("rnk", F.row_number().over(w).cast("long")).filter(
        F.col("rnk") <= k
    )


_INT8_CTES = f"""
    scales AS (
      SELECT vec_id, MAX(abs(val)) AS scale FROM elems GROUP BY vec_id
    ),
    q8 AS MATERIALIZED (
      SELECT e.vec_id, e.ord,
             CASE WHEN s.scale = 0.0 THEN CAST(0 AS BIGINT)
                  ELSE CAST(floor(e.val / s.scale * {float(INT8_MAX)} + 0.5)
                            AS BIGINT) END AS qv
      FROM elems e JOIN scales s ON s.vec_id = e.vec_id
    ),
    qnorms AS (
      SELECT vec_id, SUM(qv * qv) AS qn2 FROM q8 GROUP BY vec_id
    ),
    q_dots AS (
      SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
             SUM(qa.qv * qb.qv) AS dotq
      FROM qnorms a
      JOIN qnorms b ON b.vec_id <> a.vec_id AND b.qn2 > 0
      JOIN q8 qa ON qa.vec_id = a.vec_id
      JOIN q8 qb ON qb.vec_id = b.vec_id AND qb.ord = qa.ord
      WHERE a.vec_id < {ANN_N_QUERIES} AND a.qn2 > 0
      GROUP BY a.vec_id, b.vec_id
    ),
    q_top AS MATERIALIZED (
      SELECT query_id, neighbor_id, cosine_q, rnk FROM (
        SELECT d.query_id, d.neighbor_id,
               CAST(d.dotq AS DOUBLE)
                 / (sqrt(CAST(na.qn2 AS DOUBLE)) * sqrt(CAST(nb.qn2 AS DOUBLE))) AS cosine_q,
               CAST(ROW_NUMBER() OVER (
                 PARTITION BY d.query_id
                 ORDER BY CAST(d.dotq AS DOUBLE)
                      / (sqrt(CAST(na.qn2 AS DOUBLE)) * sqrt(CAST(nb.qn2 AS DOUBLE))) DESC,
                      d.neighbor_id
               ) AS BIGINT) AS rnk
        FROM q_dots d
        JOIN qnorms na ON na.vec_id = d.query_id
        JOIN qnorms nb ON nb.vec_id = d.neighbor_id)
      WHERE rnk <= {ANN_TOP_K}
    )"""


@query(
    "embedding_int8_recall_audit",
    oracle=f"""
    WITH {_VEC_NORMS_CTE},
    {_INT8_CTES},
    {_BRUTE_TOP_CTES}
    SELECT b.query_id,
           CAST(COUNT(*) AS BIGINT) AS k_brute,
           CAST(COUNT(p.neighbor_id) AS BIGINT) AS k_overlap,
           CAST(COUNT(p.neighbor_id) AS DOUBLE) / COUNT(*) AS recall
    FROM btop b
    LEFT JOIN q_top p
      ON p.query_id = b.query_id AND p.neighbor_id = b.neighbor_id
    GROUP BY b.query_id
    """,
)
def embedding_int8_recall_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-query recall of int8 max-abs quantized search against
    full-precision brute force — what one byte per dimension costs,
    measured on the same contract as the IVF and PQ recall audits.
    The oracle re-quantizes, re-ranks, and re-compares everything."""
    from jobminer_spark.operators.similarity import ann_cosine_topk_bruteforce

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    brute = ann_cosine_topk_bruteforce(spark, sf_dir).alias("b")
    i8 = int8_topk(emb).alias("p")
    return (
        brute.join(
            i8,
            (F.col("b.query_id") == F.col("p.query_id"))
            & (F.col("b.neighbor_id") == F.col("p.neighbor_id")),
            "left",
        )
        .groupBy(F.col("b.query_id").alias("query_id"))
        .agg(
            F.count(F.lit(1)).alias("k_brute"),
            F.count(F.col("p.neighbor_id")).alias("k_overlap"),
            (
                F.count(F.col("p.neighbor_id")).cast("double") / F.count(F.lit(1))
            ).alias("recall"),
        )
    )
