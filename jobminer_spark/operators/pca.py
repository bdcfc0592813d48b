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

Scale shape: ZERO corpus shuffles — each scan task folds its Arrow
batches into one exact int64 d×d partial Gram matrix in numpy
(mapInArrow, guide §4.2), so the only exchange carries d² = 4096
rows PER TASK into the final (i, j) aggregation. (The r13–r19
expression plan expanded the d² outer products in-row and shuffled
the 4096-key partial aggregation over the exploded corpus — 8.2M
struct rows at sf0.1 plus a repartition; the numpy fold removes
both, bit-identically.) Everything after is dimension-sized: the
4096-row matrix and 64-row vectors iterate via broadcast joins that
never touch the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from jobminer_spark.operators.common import EMB_DIMS, spread_scan
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


def _partial_gram_batches(batches):
    """mapInArrow body: one exact int64 partial Gram matrix per task.

    Quantization replays the Spark/DuckDB recipe bit-for-bit:
    float32 → float64 widening (exact), × XQ in float64, floor, then
    int64 truncation of the already-floored integral value (exact
    below 2^53 — |xq| ≤ ~1e6 here). The matmul X^T X runs in numpy's
    integer kernel: exact int64 sums, no float accumulation. Overflow
    bound is PER-TASK rows × 1e12 ≪ 2^63 (tighter than the corpus-
    level ~9e6-vector bound the module docstring derives, since each
    task only accumulates its own partition before the exact long SUM
    downstream). Null/ragged embeddings are out of contract exactly
    as in the expression predecessor (explode of null produced no
    rows; reshape requires EMB_DIMS-length lists)."""
    import numpy as np
    import pyarrow as pa

    d = EMB_DIMS
    acc = None
    for b in batches:
        flat = b.column(0).flatten().to_numpy(zero_copy_only=False)
        x = np.floor(flat.astype(np.float64) * XQ).astype(np.int64)
        x = x.reshape(-1, d)
        g = x.T @ x
        acc = g if acc is None else acc + g
    if acc is not None:
        idx = np.arange(d, dtype=np.int32)
        yield pa.RecordBatch.from_arrays(
            [
                pa.array(np.repeat(idx, d), type=pa.int32()),
                pa.array(np.tile(idx, d), type=pa.int32()),
                pa.array(acc.ravel(), type=pa.int64()),
            ],
            names=["i", "j", "c"],
        )


def gram_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(i, j, c): exact integer Gram matrix of the quantized
    embedding corpus — per-task numpy partial Gram matrices via
    mapInArrow (guide §4.2: whole Arrow batches into a vectorized
    native kernel), then one dims²-key aggregation over d²-sized
    partials. Replaces the in-row d² outer-product explode (8.2M
    struct rows at sf0.1) and its repartition shuffle: the corpus now
    crosses the Python boundary once as (n × d) Arrow batches and the
    only shuffle carries d² rows per task. Values are bit-identical
    to the expression predecessor (see _partial_gram_batches)."""
    # spread_scan: the quantize+matmul kernel otherwise inherits the
    # fixture's single split (one task, exposed to host-CPU bursts);
    # round-robin only when splits < cores — no-op at scale, and the
    # partial-Gram fold is order-insensitive by construction.
    emb = spread_scan(
        load_table(spark, sf_dir, "embeddings").select("embedding")
    )
    return (
        emb.mapInArrow(_partial_gram_batches, "i int, j int, c long")
        .groupBy("i", "j")
        .agg(F.sum("c").alias("c"))
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
