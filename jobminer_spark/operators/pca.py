"""Dominant principal direction of the embedding corpus via POWER
ITERATION in exact integer fixed point — the fourth iterative-exact
primitive beside PageRank (graphrank.py), Lloyd (similarity.py/pq.py)
and BPE (bpe.py), and the repo's first distributed linear-algebra
operator: the corpus-level structure summary (dominant variance
direction) an embedding-quality pipeline wants next to the norm
outliers and whitening stats of embquality.py.

Numeric discipline: elements quantize to 1e-6 longs; the Gram matrix
C = Xᵀ X accumulates as exact integer sums; C renormalizes to a
fixed 1e6 scale by truncating division against its max-|entry|
(Spark ``div`` == DuckDB ``//``, both truncate toward zero); each
power round is an integer matrix-vector product followed by the same
max-|component| renormalization. Every POST-renormalization
intermediate stays under ~6.5e13 < int64 BY CONSTRUCTION (64
summands of 1e6×1e6 products), independent of corpus size. The ONE
corpus-dependent accumulation is the raw Gram sum itself (~1e12 per
unit-scale vector), which fits int64 to ~9e6 vectors; past that, the
same plan swaps the cell sum to exact decimal(38) accumulation (the
repo's dsum recipe — DuckDB already sums BIGINT into HUGEINT) before
the renormalizing division, leaving the replayable fixed point
untouched. The two rounds are bit-replayable by the oracle: no
float, no sqrt, no convergence tolerance.

Convergence semantics: two fixed rounds are the oracle-expressible
prefix (exactly like PageRank's two rounds); production loops the
same body. The Rayleigh quotient of power iterates over a PSD Gram
matrix is monotonically non-decreasing, which pytest pins with a
numpy twin (a semantic check beyond hash parity).

Scale shape: ONE corpus shuffle — the (i, j) Gram aggregation with
map-side combine onto a 64×64 = 4096-key space (outer products
expand IN-ROW via a nested transform, the cosine-fold discipline).
Everything after is dimension-sized: the 4096-row matrix and 64-row
vectors iterate via broadcast joins that never touch the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from jobminer_spark.operators.common import EMB_DIMS
from jobminer_spark.registry import query
from jobminer_spark.sources import load_table

XQ = 1_000_000  # element quanta (1e-6)
CQ = 1_000_000  # fixed matrix / vector scale after renormalization

_GRAM_CTE = f"""
    elems AS MATERIALIZED (
      SELECT vec_id, ord - 1 AS i,
             CAST(floor(CAST(v AS DOUBLE) * {XQ}) AS BIGINT) AS xq
      FROM (
        SELECT vec_id, unnest(embedding) AS v,
               generate_subscripts(embedding, 1) AS ord
        FROM embeddings
      )
    ),
    gram AS MATERIALIZED (
      SELECT a.i AS i, b.i AS j,
             CAST(SUM(a.xq * b.xq) AS BIGINT) AS c
      FROM elems a JOIN elems b ON a.vec_id = b.vec_id
      GROUP BY 1, 2
    ),
    maxc AS (SELECT MAX(abs(c)) AS m FROM gram),
    cnorm AS MATERIALIZED (
      SELECT g.i, g.j,
             g.c // GREATEST(x.m // {CQ}, 1) AS c
      FROM gram g CROSS JOIN maxc x
    ),
    r1 AS (
      SELECT i, SUM(c * {CQ}) AS raw FROM cnorm GROUP BY i
    ),
    m1 AS (SELECT MAX(abs(raw)) AS m FROM r1),
    v1 AS (
      SELECT r.i, r.raw // GREATEST(x.m // {CQ}, 1) AS v
      FROM r1 r CROSS JOIN m1 x
    ),
    r2 AS (
      SELECT c.i, CAST(SUM(c.c * v.v) AS BIGINT) AS raw
      FROM cnorm c JOIN v1 v ON c.j = v.i
      GROUP BY c.i
    ),
    m2 AS (SELECT MAX(abs(raw)) AS m FROM r2),
    v2 AS (
      SELECT r.i, r.raw // GREATEST(x.m // {CQ}, 1) AS v
      FROM r2 r CROSS JOIN m2 x
    )
"""


def gram_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(i, j, c): exact integer Gram matrix of the quantized
    embedding corpus — outer products expanded in-row, one partial-agg
    shuffle onto the dims^2 key space."""
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    # materialize the quantized array BEFORE the nested lambda:
    # referencing a transform() expression inside nested lambdas gets
    # re-inlined per (i, j) by Catalyst — the O(n^3) trap winnow.py
    # documents — while a concrete column is computed once per row.
    # repartition spreads the per-row d^2 expansion off the fixture's
    # single row group (the tokenize() argument).
    xq = (
        emb.repartition("vec_id")
        .select(
            F.transform(
                "embedding",
                lambda v: F.floor(v.cast("double") * XQ).cast("long"),
            ).alias("xq")
        )
    )
    outer = F.flatten(
        F.transform(
            "xq",
            lambda x, i: F.transform(
                "xq",
                lambda y, j: F.struct(
                    i.alias("i"), j.alias("j"), (x * y).alias("p")
                ),
            ),
        )
    )
    return (
        xq.select(F.explode(outer).alias("o"))
        .groupBy(F.col("o.i").alias("i"), F.col("o.j").alias("j"))
        .agg(F.sum("o.p").alias("c"))
    )


def _renorm(df: DataFrame, col: str, out: str) -> DataFrame:
    """Truncating-division renormalization of an integer relation to
    the fixed CQ scale against its max-|value| (broadcast scalar)."""
    m = df.agg(F.max(F.abs(F.col(col))).alias("m"))
    return df.crossJoin(F.broadcast(m)).select(
        *[c for c in df.columns if c != col],
        F.expr(f"{col} div greatest(m div {CQ}L, 1L)").alias(out),
    )


@query(
    "pca_power_iteration_audit",
    oracle=f"""
    WITH {_GRAM_CTE}
    SELECT v1.i AS i, CAST(v1.v AS BIGINT) AS v1,
           CAST(v2.v AS BIGINT) AS v2
    FROM v1 JOIN v2 ON v1.i = v2.i
    """,
)
def pca_power_iteration_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two integer power-iteration rounds on the renormalized Gram
    matrix from the all-ones start vector: EMB_DIMS rows of
    (dimension index, round-1 component, round-2 component), every
    one replayed bit-for-bit by the oracle (a fixture-dimensionality
    change shows up as a row-count mismatch)."""
    cn = _renorm(gram_matrix(spark, sf_dir), "c", "c").localCheckpoint(
        eager=False
    )
    # round 1: v0 = CQ * ones, so raw1_i = CQ * sum_j C'_ij
    r1 = cn.groupBy("i").agg(F.sum(F.col("c") * CQ).alias("raw"))
    v1 = _renorm(r1, "raw", "v")
    # round 2: full integer mat-vec against the 64-row v1 (broadcast)
    r2 = (
        cn.join(
            F.broadcast(v1.select(F.col("i").alias("j"), "v")), "j"
        )
        .groupBy("i")
        .agg(F.sum(F.col("c") * F.col("v")).alias("raw"))
    )
    v2 = _renorm(r2, "raw", "v")
    return v1.select("i", F.col("v").alias("v1")).join(
        v2.select("i", F.col("v").alias("v2")), "i"
    )
