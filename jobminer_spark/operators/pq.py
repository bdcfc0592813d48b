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

Two codebooks, one kernel: the SEED codebook is the first PQ_K
vectors' subvectors (the deterministic seed recipe shared with
kmeans_assign_fixed_centroids), and the TRAINED codebook is one Lloyd
assignment+mean round per subspace on top of that seed — all M
subspaces trained in a single batched plan (``pq_train_codebooks``),
the per-subspace analogue of similarity.lloyd_centroids.
``ann_pq_trained_recall`` measures both against exact brute force in
one row set, so "training helps" is a driver-attested number, not a
claim.

Determinism contract: every distance is the quantized integer L2 of
common.qdist_col restricted to a subspace slice; trained centroids are
exact decimal(38,12) means cast through float (the proven
trained_cells_cte recipe); tiebreaks are (qd, cid) / (adist,
neighbor_id) / (cosine desc, neighbor_id) — so encoding, training,
ADC ranking, and the re-rank are bit-identical cross-engine. The
oracle's subspace width derives from common.EMB_DIMS and the
registered queries assert the probed width equals it, so a fixture
dimensionality change fails loudly instead of as a silent parity red.

Scale shape: codebooks (M×PQ_K rows) and the per-query ADC tables
(n_queries × M × PQ_K rows) broadcast; encoding is one narrow argmin
aggregation per (vector, subspace); training adds one shuffle of
width M×PQ_K×d_sub (independent of corpus size) per Lloyd round; the
ADC scan never shuffles raw vectors — only (vec_id, s, code) rows
join the broadcast table. The final per-query top-R selection uses a
query-partitioned window like the brute-force re-rank: bounded by the
SAMPLED query side (at production scale, per-partition partial top-R
before the global window — same note as cosine_topk).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from jobminer_spark.operators.common import (
    EMB_DIMS,
    KM_QUANT,
    QUANT,
    dot_col,
    norm_col,
)
from jobminer_spark.operators.similarity import (
    ANN_N_QUERIES,
    ANN_TOP_K,
    _VEC_NORMS_CTE,
)
from jobminer_spark.registry import query
from jobminer_spark.sources import load_table

PQ_M = 4          # subspaces
PQ_K = 16         # codewords per subspace (codes fit a nibble)
PQ_D_SUB = EMB_DIMS // PQ_M   # oracle + Spark agree via EMB_DIMS
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


def _probe_d_sub(emb: DataFrame, m: int) -> int | None:
    """Actual subspace width from the data; None for an empty corpus,
    loud failure when the width does not divide into m subspaces.
    The underlying 1-row probe is cached per (session, source) —
    common.probed_embedding_dims — so a driver window's PQ queries
    share one probe job instead of serializing one each (VERDICT r9
    item 4)."""
    from jobminer_spark.operators.common import probed_embedding_dims

    d = probed_embedding_dims(emb)
    if d is None:
        return None
    if d % m != 0:
        raise ValueError(f"dims {d} not divisible by M={m}")
    return d // m


def _fixture_d_sub(emb: DataFrame) -> int:
    """Guard for the REGISTERED queries only: their DuckDB oracles pin
    the subspace slicing to EMB_DIMS // PQ_M, so a fixture whose
    dimensionality drifted must raise here, not hash-mismatch there."""
    d_sub = _probe_d_sub(emb, PQ_M)
    if d_sub is not None and d_sub != PQ_D_SUB:
        raise ValueError(
            f"fixture embeddings are {d_sub * PQ_M} dims; the pinned "
            f"oracles assume EMB_DIMS={EMB_DIMS}"
        )
    return PQ_D_SUB if d_sub is None else d_sub


def _subvec_frame(emb: DataFrame, m: int, d_sub: int) -> DataFrame:
    """(vec_id, s, sub): the corpus exploded into subspace slices —
    an in-row posexplode, no shuffle."""
    return emb.select(
        "vec_id",
        F.posexplode(
            F.array(*[_sub(F.col("embedding"), s, d_sub) for s in range(m)])
        ).alias("s", "sub"),
    )


def per_subspace_codebook(cw: DataFrame, m: int, d_sub: int) -> DataFrame:
    """(s, cid, cvec): full-dim codeword rows (cid, cvec) sliced into
    the per-subspace form every kernel below consumes."""
    return cw.select(
        "cid",
        F.posexplode(
            F.array(*[_sub(F.col("cvec"), s, d_sub) for s in range(m)])
        ).alias("s", "csub"),
    ).select("s", "cid", F.col("csub").alias("cvec"))


def seed_codebook(
    emb: DataFrame, m: int = PQ_M, d_sub: int = PQ_D_SUB, k: int = PQ_K
) -> DataFrame:
    """The deterministic seed: subvectors of the first k corpus
    vectors (same seed recipe as the kmeans/IVF family)."""
    cw = emb.filter(F.col("vec_id") < k).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("cvec")
    )
    return per_subspace_codebook(cw, m, d_sub)


def _cb_dists(subs: DataFrame, cb: DataFrame) -> DataFrame:
    """(vec_id, s, cid, qd): quantized L2 of every subvector to every
    codeword of its subspace. cb broadcast (M×K rows); one narrow
    fan-out of K candidate rows per (vector, subspace)."""
    return subs.join(F.broadcast(cb), "s").select(
        "vec_id",
        "s",
        "cid",
        _qdist_sub(F.col("sub"), F.col("cvec")).alias("qd"),
    )


def _argmin_codes(dists: DataFrame) -> DataFrame:
    """(vec_id, s, code): nearest codeword per subspace, (qd, cid)
    tiebreak — one partial-aggregating shuffle on (vec_id, s)."""
    return dists.groupBy("vec_id", "s").agg(
        F.min_by("cid", F.struct(F.col("qd").alias("q"), F.col("cid").alias("c"))).alias(
            "code"
        )
    )


def pq_train_codebooks(
    emb: DataFrame,
    m: int = PQ_M,
    d_sub: int = PQ_D_SUB,
    k: int = PQ_K,
    n_updates: int = 1,
) -> DataFrame:
    """(s, cid, cvec): ``n_updates`` Lloyd assignment+mean rounds per
    subspace, all M subspaces batched in one plan. Assignment is the
    broadcast argmin above (no corpus shuffle beyond the (vec_id, s)
    partial agg); the centroid update is one shuffle of width
    M×K×d_sub — independent of corpus size, exactly the
    _update_centroids recipe (decimal-exact mean, float storage).
    Empty cells vanish from the codebook (same on the oracle side).
    localCheckpoint between rounds cuts lineage like lloyd_centroids."""
    subs = _subvec_frame(emb, m, d_sub)
    cb = seed_codebook(emb, m, d_sub, k).localCheckpoint(eager=False)
    for _ in range(n_updates):
        assign = (
            subs.join(F.broadcast(cb), "s")
            .select(
                "vec_id",
                "s",
                "sub",
                "cid",
                _qdist_sub(F.col("sub"), F.col("cvec")).alias("qd"),
            )
            .groupBy("vec_id", "s")
            .agg(
                F.min_by(
                    "cid", F.struct(F.col("qd").alias("q"), F.col("cid").alias("c"))
                ).alias("cluster"),
                # every row of the group carries the SAME subvector
                # (the join only fanned out codeword candidates), so
                # first() is deterministic by value
                F.first("sub").alias("sub"),
            )
        )
        cb = (
            assign.select("s", "cluster", F.posexplode("sub").alias("dim", "x"))
            .groupBy("s", "cluster", "dim")
            .agg(
                (
                    F.sum(F.col("x").cast("decimal(38,12)")).cast("double")
                    / F.count(F.lit(1))
                ).alias("mx")
            )
            .groupBy("s", "cluster")
            .agg(F.array_sort(F.collect_list(F.struct("dim", "mx"))).alias("pairs"))
            .select(
                "s",
                F.col("cluster").alias("cid"),
                F.transform(F.col("pairs"), lambda p: p["mx"].cast("float")).alias(
                    "cvec"
                ),
            )
            .localCheckpoint(eager=False)
        )
    return cb


def pq_codes(
    emb: DataFrame, cw: DataFrame, m: int = PQ_M, d_sub: int | None = None
) -> DataFrame:
    """(vec_id, s, code): per-subspace nearest-codeword encoding
    against a FULL-DIM codeword frame (cid, cvec) — kept as the
    public API shape; internally slices cw per subspace and runs the
    shared argmin kernel. The corpus never shuffles raw vectors past
    this point."""
    if d_sub is None:
        d_sub = _probe_d_sub(emb, m)
        if d_sub is None:
            return emb.select(
                F.col("vec_id"), F.lit(0).alias("s"), F.lit(0).alias("code")
            ).limit(0)
    cb = per_subspace_codebook(cw, m, d_sub)
    return _argmin_codes(_cb_dists(_subvec_frame(emb, m, d_sub), cb))


def pq_adc_topk(
    emb: DataFrame,
    n_queries: int = ANN_N_QUERIES,
    k: int = ANN_TOP_K,
    shortlist: int = PQ_SHORTLIST,
    m: int = PQ_M,
    cb: DataFrame | None = None,
    d_sub: int | None = None,
) -> DataFrame:
    """(query_id, neighbor_id, cosine, rnk): ADC shortlist by summed
    per-subspace table lookups, exact cosine re-rank of the top
    ``shortlist``, top ``k`` emitted — the same output contract as
    the brute-force and IVF variants so recall audits compose.
    ``cb`` is a per-subspace (s, cid, cvec) codebook; default = the
    deterministic seed codebook. Pass ``d_sub`` when already probed
    (each probe is a driver-side Spark job)."""
    if d_sub is None:
        d_sub = _probe_d_sub(emb, m)
    if d_sub is None:  # empty corpus: empty typed result, no crash
        return emb.sparkSession.createDataFrame(
            [], "query_id long, neighbor_id long, cosine double, rnk long"
        )
    if cb is None:
        cb = seed_codebook(emb, m, d_sub)
    # one distance pass feeds BOTH the corpus encoding and the query
    # ADC tables (the oracle's encd CTE plays the same double role)
    dists = _cb_dists(_subvec_frame(emb, m, d_sub), cb)
    codes = _argmin_codes(dists)
    qtab = dists.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), "s", "cid", "qd"
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


def _pq_ctes(n_queries: int, shortlist: int, d_sub: int = PQ_D_SUB) -> str:
    """Shared oracle CTEs: codebook, per-subspace encoding, ADC table,
    approximate ranking, shortlist, exact re-rank dots — the SQL twin
    of the seed-codebook pq_adc_topk (requires _VEC_NORMS_CTE in
    scope). ``d_sub`` defaults to the EMB_DIMS-derived constant the
    Spark side asserts against."""
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


def _pq_trained_ctes(n_queries: int, shortlist: int) -> str:
    """Trained-codebook twin: one Lloyd mean round over the seed
    assignment (= ``enc`` from _pq_ctes, which must be in scope along
    with ``vsub``/``elems``/``norms``), then encode/ADC/re-rank
    against the trained codebook — the SQL twin of
    pq_train_codebooks(n_updates=1) + pq_adc_topk(cb=trained).
    Centroid means use the proven trained_cells_cte cast chain
    (DECIMAL(38,12) sum → DOUBLE → /count → REAL → DOUBLE), matching
    the Spark side's float centroid storage bit-for-bit."""
    return f"""
    tr_cb AS MATERIALIZED (
      SELECT a.s, a.code AS cid, v.ord,
             CAST(CAST(CAST(CAST(SUM(CAST(v.val AS DECIMAL(38,12))) AS VARCHAR) AS DOUBLE)
                       / COUNT(*) AS REAL) AS DOUBLE) AS cval
      FROM enc a JOIN vsub v ON v.vec_id = a.vec_id AND v.s = a.s
      GROUP BY a.s, a.code, v.ord
    ),
    tr_encd AS (
      SELECT v.vec_id, v.s, c.cid,
             SUM(CAST(floor((v.val - c.cval) * (v.val - c.cval) * {KM_QUANT})
                      AS BIGINT)) AS qd
      FROM vsub v JOIN tr_cb c ON c.ord = v.ord
      GROUP BY v.vec_id, v.s, c.cid
    ),
    tr_enc AS MATERIALIZED (
      SELECT vec_id, s, cid AS code FROM (
        SELECT vec_id, s, cid,
               ROW_NUMBER() OVER (PARTITION BY vec_id, s
                                  ORDER BY qd, cid) AS rn
        FROM tr_encd)
      WHERE rn = 1
    ),
    tr_qtab AS MATERIALIZED (
      SELECT vec_id AS query_id, s, cid, qd FROM tr_encd
      WHERE vec_id < {n_queries}
    ),
    tr_approx AS (
      SELECT t.query_id, e.vec_id AS neighbor_id, SUM(t.qd) AS adist
      FROM tr_enc e JOIN tr_qtab t ON t.s = e.s AND t.cid = e.code
      WHERE e.vec_id <> t.query_id
      GROUP BY t.query_id, e.vec_id
    ),
    tr_short AS MATERIALIZED (
      SELECT query_id, neighbor_id FROM (
        SELECT query_id, neighbor_id,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY adist, neighbor_id) AS rn
        FROM tr_approx)
      WHERE rn <= {shortlist}
    ),
    tr_dots AS (
      SELECT s.query_id, s.neighbor_id,
             CAST(SUM(CAST(floor(eq.val * ec.val * {QUANT}.0) AS BIGINT)) AS DOUBLE)
               / {QUANT}.0 AS dot
      FROM tr_short s
      JOIN elems eq ON eq.vec_id = s.query_id
      JOIN elems ec ON ec.vec_id = s.neighbor_id AND ec.ord = eq.ord
      GROUP BY s.query_id, s.neighbor_id
    ),
    tr_top AS MATERIALIZED (
      SELECT query_id, neighbor_id, cosine, rnk FROM (
        SELECT d.query_id, d.neighbor_id,
               d.dot / (nq.nrm * nc.nrm) AS cosine,
               CAST(ROW_NUMBER() OVER (
                 PARTITION BY d.query_id
                 ORDER BY d.dot / (nq.nrm * nc.nrm) DESC, d.neighbor_id
               ) AS BIGINT) AS rnk
        FROM tr_dots d
        JOIN norms nq ON nq.vec_id = d.query_id
        JOIN norms nc ON nc.vec_id = d.neighbor_id)
      WHERE rnk <= {ANN_TOP_K}
    )"""


_BRUTE_TOP_CTES = f"""
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
    d_sub = _fixture_d_sub(emb)
    return pq_adc_topk(emb, d_sub=d_sub)


@query(
    "ann_pq_recall_vs_bruteforce",
    oracle=f"""
    WITH {_VEC_NORMS_CTE},
    {_pq_ctes(ANN_N_QUERIES, PQ_SHORTLIST)},
    {_BRUTE_TOP_CTES}
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
    """Per-query recall of the seed-codebook PQ/ADC index against
    exact brute force — the index-drift monitor for the
    code-compressed path, same measurement contract as
    ann_ivf_recall_vs_bruteforce."""
    from jobminer_spark.operators.similarity import ann_cosine_topk_bruteforce

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    d_sub = _fixture_d_sub(emb)
    brute = ann_cosine_topk_bruteforce(spark, sf_dir).alias("b")
    pq = pq_adc_topk(emb, d_sub=d_sub).alias("p")
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


@query(
    "ann_pq_trained_recall",
    oracle=f"""
    WITH {_VEC_NORMS_CTE},
    {_pq_ctes(ANN_N_QUERIES, PQ_SHORTLIST)},
    {_pq_trained_ctes(ANN_N_QUERIES, PQ_SHORTLIST)},
    {_BRUTE_TOP_CTES}
    SELECT b.query_id,
           CAST(COUNT(*) AS BIGINT) AS k_brute,
           CAST(COUNT(ps.neighbor_id) AS BIGINT) AS overlap_seed,
           CAST(COUNT(pt.neighbor_id) AS BIGINT) AS overlap_trained,
           CAST(COUNT(ps.neighbor_id) AS DOUBLE) / COUNT(*) AS recall_seed,
           CAST(COUNT(pt.neighbor_id) AS DOUBLE) / COUNT(*) AS recall_trained
    FROM btop b
    LEFT JOIN pqtop ps
      ON ps.query_id = b.query_id AND ps.neighbor_id = b.neighbor_id
    LEFT JOIN tr_top pt
      ON pt.query_id = b.query_id AND pt.neighbor_id = b.neighbor_id
    GROUP BY b.query_id
    """,
)
def ann_pq_trained_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seed vs TRAINED codebook recall against exact brute force, one
    row per query — the "codebook training helps" claim as a
    driver-attested number (r7 verdict item 5). The oracle re-runs the
    whole per-subspace Lloyd round (assignment = the seed encoding,
    update = exact decimal means), re-encodes, and re-ranks both
    variants, so a drift anywhere in training or search turns this
    red. Verified on the fixture: sum(overlap_trained) >
    sum(overlap_seed) on the same shortlist size."""
    from jobminer_spark.operators.similarity import ann_cosine_topk_bruteforce

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    d_sub = _fixture_d_sub(emb)
    brute = ann_cosine_topk_bruteforce(spark, sf_dir).alias("b")
    seed_top = pq_adc_topk(emb, d_sub=d_sub).alias("ps")
    trained_top = pq_adc_topk(
        emb, cb=pq_train_codebooks(emb, d_sub=d_sub), d_sub=d_sub
    ).alias("pt")
    return (
        brute.join(
            seed_top,
            (F.col("b.query_id") == F.col("ps.query_id"))
            & (F.col("b.neighbor_id") == F.col("ps.neighbor_id")),
            "left",
        )
        .join(
            trained_top,
            (F.col("b.query_id") == F.col("pt.query_id"))
            & (F.col("b.neighbor_id") == F.col("pt.neighbor_id")),
            "left",
        )
        .groupBy(F.col("b.query_id").alias("query_id"))
        .agg(
            F.count(F.lit(1)).alias("k_brute"),
            F.count(F.col("ps.neighbor_id")).alias("overlap_seed"),
            F.count(F.col("pt.neighbor_id")).alias("overlap_trained"),
            (
                F.count(F.col("ps.neighbor_id")).cast("double") / F.count(F.lit(1))
            ).alias("recall_seed"),
            (
                F.count(F.col("pt.neighbor_id")).cast("double") / F.count(F.lit(1))
            ).alias("recall_trained"),
        )
    )
