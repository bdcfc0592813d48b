"""Product-quantization ANN (Jégou/Douze/Schmid, "Product Quantization
for Nearest Neighbor Search", TPAMI 2011 — public paper): the MEMORY
scale path for similarity search.

At 100 TB an embedding corpus cannot keep raw vectors hot: 64 float32
dims = 256 B/vector. PQ splits each vector into M subvectors, encodes
each subvector as the id of its nearest codeword (K per subspace), and
searches with an Asymmetric Distance Computation (ADC): the QUERY
precomputes its distance to every (subspace, codeword) cell — an
M×K table, here 4×16 = 64 longs — and a corpus vector's approximate
distance is just M table lookups summed. The scan touches M code
bytes per vector (64× smaller than raw), the shortlist is re-ranked
exactly, and recall is tuned by the shortlist size the way IVF tunes
nprobe.

Determinism contract: the codebook is the first PQ_K vectors'
subvectors (the same seed recipe as kmeans_assign_fixed_centroids —
codebook TRAINING is orthogonal to the PQ mechanics and the trained
path is already exercised by ann_ivf_trained_*); every distance is the
quantized integer L2 of common.qdist_col, with (qdist, cid) /
(adist, neighbor_id) / (cosine desc, neighbor_id) tiebreaks, so
encoding, ADC ranking, and the re-rank are bit-identical cross-engine.

Scale shape: the codeword frame (PQ_K rows) and the per-query ADC
tables (n_queries × M × PQ_K rows) broadcast; encoding is one narrow
argmin aggregation per vector (16 candidate rows in, M codes out);
the ADC scan never shuffles raw vectors — only (vec_id, s, code)
rows join the broadcast table. The final per-query top-R selection
uses a query-partitioned window like the brute-force re-rank: bounded
by the SAMPLED query side (at production scale, per-partition partial
top-R before the global window — same note as cosine_topk).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from jobminer_spark.operators.common import KM_QUANT, QUANT, dot_col, norm_col
from jobminer_spark.operators.similarity import (
    ANN_N_QUERIES,
    ANN_TOP_K,
    _VEC_NORMS_CTE,
)
from jobminer_spark.registry import query
from jobminer_spark.sources import load_table

PQ_M = 4          # subspaces
PQ_K = 16         # codewords per subspace (codes fit a nibble)
PQ_SHORTLIST = 4 * ANN_TOP_K  # ADC shortlist re-ranked exactly


def _sub(vec, s: int, d_sub: int):
    """Slice subspace s (d_sub dims) out of an embedding column."""
    return F.slice(vec, s * d_sub + 1, d_sub)


def _qdist_sub(a, b) -> F.Column:
    """Quantized squared L2 between two (sub)vectors — the
    common.qdist_col kernel, local copy to keep lambda types plain."""
    return F.aggregate(
        F.zip_with(
            a,
            b,
            lambda x, y: F.floor(
                (x.cast("double") - y.cast("double"))
                * (x.cast("double") - y.cast("double"))
                * F.lit(KM_QUANT)
            ).cast("long"),
        ),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def pq_codes(
    emb: DataFrame, cw: DataFrame, m: int = PQ_M, d_sub: int | None = None
) -> DataFrame:
    """(vec_id, s, code): per-subspace nearest-codeword encoding.
    ``cw`` is (cid, cvec); broadcast. One argmin aggregation per
    vector — the corpus never shuffles raw vectors past this point."""
    if d_sub is None:
        first = emb.select(F.size("embedding").alias("d")).first()
        if first is None:
            return emb.select(
                F.col("vec_id"), F.lit(0).alias("s"), F.lit(0).alias("code")
            ).limit(0)
        if first["d"] % m != 0:
            raise ValueError(f"dims {first['d']} not divisible by M={m}")
        d_sub = first["d"] // m
    pairs = emb.crossJoin(F.broadcast(cw))
    per_sub = pairs.select(
        "vec_id",
        "cid",
        *[
            _qdist_sub(
                _sub(F.col("embedding"), s, d_sub), _sub(F.col("cvec"), s, d_sub)
            ).alias(f"qd{s}")
            for s in range(m)
        ],
    )
    agg = per_sub.groupBy("vec_id").agg(
        *[
            F.min_by(
                "cid", F.struct(F.col(f"qd{s}").alias("q"), F.col("cid").alias("c"))
            ).alias(f"code{s}")
            for s in range(m)
        ]
    )
    return agg.select(
        "vec_id",
        F.posexplode(F.array(*[F.col(f"code{s}") for s in range(m)])).alias(
            "s", "code"
        ),
    )


def pq_adc_topk(
    emb: DataFrame,
    n_queries: int = ANN_N_QUERIES,
    k: int = ANN_TOP_K,
    shortlist: int = PQ_SHORTLIST,
    m: int = PQ_M,
) -> DataFrame:
    """(query_id, neighbor_id, cosine, rnk): ADC shortlist by summed
    per-subspace table lookups, exact cosine re-rank of the top
    ``shortlist``, top ``k`` emitted — the same output contract as
    the brute-force and IVF variants so recall audits compose."""
    first = emb.select(F.size("embedding").alias("d")).first()
    if first is None:  # empty corpus: empty typed result, no crash
        return emb.sparkSession.createDataFrame(
            [], "query_id long, neighbor_id long, cosine double, rnk long"
        )
    if first["d"] % m != 0:
        raise ValueError(f"dims {first['d']} not divisible by M={m}")
    d_sub = first["d"] // m
    cw = emb.filter(F.col("vec_id") < PQ_K).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("cvec")
    )
    codes = pq_codes(emb, cw, m, d_sub)
    queries = emb.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    qtab = (
        queries.crossJoin(F.broadcast(cw))
        .select(
            "query_id",
            "cid",
            *[
                _qdist_sub(
                    _sub(F.col("q_emb"), s, d_sub), _sub(F.col("cvec"), s, d_sub)
                ).alias(f"qd{s}")
                for s in range(m)
            ],
        )
        .select(
            "query_id",
            "cid",
            F.posexplode(F.array(*[F.col(f"qd{s}") for s in range(m)])).alias(
                "s", "qd"
            ),
        )
    )
    approx = (
        codes.join(
            F.broadcast(qtab),
            (codes.s == qtab.s) & (codes.code == qtab.cid),
        )
        .filter(F.col("vec_id") != F.col("query_id"))
        .groupBy("query_id", F.col("vec_id").alias("neighbor_id"))
        .agg(F.sum("qd").alias("adist"))
    )
    w = W.partitionBy("query_id").orderBy("adist", "neighbor_id")
    cand = (
        approx.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= shortlist)
        .select("query_id", "neighbor_id")
    )
    # exact re-rank of the BOUNDED shortlist only (shortlist×n_queries
    # rows rejoin their raw vectors — never a full exact corpus scan,
    # which would defeat the code-scan economics PQ exists for)
    qv = emb.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        norm_col(F.col("embedding")).alias("q_nrm"),
    )
    cv = emb.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("c_emb"),
        norm_col(F.col("embedding")).alias("c_nrm"),
    )
    scored = (
        cand.join(F.broadcast(qv), "query_id")
        .join(cv, "neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            (
                dot_col(F.col("q_emb"), F.col("c_emb"))
                / (F.col("q_nrm") * F.col("c_nrm"))
            ).alias("cosine"),
        )
    )
    w2 = W.partitionBy("query_id").orderBy(F.col("cosine").desc(), "neighbor_id")
    return scored.withColumn("rnk", F.row_number().over(w2).cast("long")).filter(
        F.col("rnk") <= k
    )


def _pq_ctes(n_queries: int, shortlist: int, d_sub: int = 16) -> str:
    """Shared oracle CTEs: codebook, per-subspace encoding, ADC table,
    approximate ranking, shortlist, exact re-rank dots — the SQL twin
    of pq_codes + pq_adc_topk (requires _VEC_NORMS_CTE in scope)."""
    return f"""
    cw AS (SELECT vec_id AS cid, ord, val FROM elems WHERE vec_id < {PQ_K}),
    vsub AS (SELECT vec_id, (ord - 1) // {d_sub} AS s, ord, val FROM elems),
    encd AS (
      SELECT v.vec_id, v.s, c.cid,
             SUM(CAST(floor((v.val - c.val) * (v.val - c.val) * {KM_QUANT})
                      AS BIGINT)) AS qd
      FROM vsub v JOIN cw c ON c.ord = v.ord
      GROUP BY v.vec_id, v.s, c.cid
    ),
    enc AS MATERIALIZED (
      SELECT vec_id, s, cid AS code FROM (
        SELECT vec_id, s, cid,
               ROW_NUMBER() OVER (PARTITION BY vec_id, s
                                  ORDER BY qd, cid) AS rn
        FROM encd)
      WHERE rn = 1
    ),
    qtab AS MATERIALIZED (
      SELECT vec_id AS query_id, s, cid, qd FROM encd
      WHERE vec_id < {n_queries}
    ),
    approx AS (
      SELECT t.query_id, e.vec_id AS neighbor_id, SUM(t.qd) AS adist
      FROM enc e JOIN qtab t ON t.s = e.s AND t.cid = e.code
      WHERE e.vec_id <> t.query_id
      GROUP BY t.query_id, e.vec_id
    ),
    short AS MATERIALIZED (
      SELECT query_id, neighbor_id FROM (
        SELECT query_id, neighbor_id,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY adist, neighbor_id) AS rn
        FROM approx)
      WHERE rn <= {shortlist}
    ),
    pq_dots AS (
      SELECT s.query_id, s.neighbor_id,
             CAST(SUM(CAST(floor(eq.val * ec.val * {QUANT}.0) AS BIGINT)) AS DOUBLE)
               / {QUANT}.0 AS dot
      FROM short s
      JOIN elems eq ON eq.vec_id = s.query_id
      JOIN elems ec ON ec.vec_id = s.neighbor_id AND ec.ord = eq.ord
      GROUP BY s.query_id, s.neighbor_id
    ),
    pqtop AS MATERIALIZED (
      SELECT query_id, neighbor_id, cosine, rnk FROM (
        SELECT d.query_id, d.neighbor_id,
               d.dot / (nq.nrm * nc.nrm) AS cosine,
               CAST(ROW_NUMBER() OVER (
                 PARTITION BY d.query_id
                 ORDER BY d.dot / (nq.nrm * nc.nrm) DESC, d.neighbor_id
               ) AS BIGINT) AS rnk
        FROM pq_dots d
        JOIN norms nq ON nq.vec_id = d.query_id
        JOIN norms nc ON nc.vec_id = d.neighbor_id)
      WHERE rnk <= {ANN_TOP_K}
    )"""


@query(
    "ann_pq_adc_topk",
    oracle=f"""
    WITH {_VEC_NORMS_CTE},
    {_pq_ctes(ANN_N_QUERIES, PQ_SHORTLIST)}
    SELECT query_id, neighbor_id, cosine, rnk FROM pqtop
    """,
)
def ann_pq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ/ADC top-k over the fixture embeddings — the oracle
    re-encodes the corpus, rebuilds the ADC tables, re-ranks the
    shortlist and the final cosine order, so any drift in subspace
    slicing, codeword assignment, table lookup, or either tiebreak
    turns this driver row red. Output contract matches the other ANN
    variants (query_id, neighbor_id, cosine, rnk)."""
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    return pq_adc_topk(emb)


@query(
    "ann_pq_recall_vs_bruteforce",
    oracle=f"""
    WITH {_VEC_NORMS_CTE},
    {_pq_ctes(ANN_N_QUERIES, PQ_SHORTLIST)},
    b_dots AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             CAST(SUM(CAST(floor(eq.val * ec.val * {QUANT}.0) AS BIGINT)) AS DOUBLE)
               / {QUANT}.0 AS dot
      FROM embeddings q
      JOIN embeddings c ON c.vec_id <> q.vec_id
      JOIN elems eq ON eq.vec_id = q.vec_id
      JOIN elems ec ON ec.vec_id = c.vec_id AND ec.ord = eq.ord
      WHERE q.vec_id < {ANN_N_QUERIES}
      GROUP BY q.vec_id, c.vec_id
    ),
    btop AS (
      SELECT query_id, neighbor_id FROM (
        SELECT query_id, neighbor_id,
               ROW_NUMBER() OVER (
                 PARTITION BY query_id
                 ORDER BY dot / (nq.nrm * nc.nrm) DESC, neighbor_id
               ) AS rnk
        FROM b_dots
        JOIN norms nq ON nq.vec_id = query_id
        JOIN norms nc ON nc.vec_id = neighbor_id)
      WHERE rnk <= {ANN_TOP_K}
    )
    SELECT b.query_id,
           CAST(COUNT(*) AS BIGINT) AS k_brute,
           CAST(COUNT(p.neighbor_id) AS BIGINT) AS k_overlap,
           CAST(COUNT(p.neighbor_id) AS DOUBLE) / COUNT(*) AS recall
    FROM btop b
    LEFT JOIN pqtop p
      ON p.query_id = b.query_id AND p.neighbor_id = b.neighbor_id
    GROUP BY b.query_id
    """,
)
def ann_pq_recall_vs_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-query recall of the PQ/ADC index against exact brute force
    — the index-drift monitor for the code-compressed path, same
    measurement contract as ann_ivf_recall_vs_bruteforce."""
    from jobminer_spark.operators.similarity import ann_cosine_topk_bruteforce

    brute = ann_cosine_topk_bruteforce(spark, sf_dir).alias("b")
    pq = ann_pq_adc_topk(spark, sf_dir).alias("p")
    return (
        brute.join(
            pq,
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
