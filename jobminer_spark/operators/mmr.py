"""Maximal-marginal-relevance (MMR) diverse top-k selection — the
standard diversify-the-retrieval re-rank (Carbonell & Goldstein '98):
after an ANN/BM25 stage produces a relevance-ranked shortlist, pick k
results greedily by ``λ·relevance − (1−λ)·max-similarity-to-already-
picked``, trading redundancy for coverage. For an LLM-data pipeline
this is the anti-near-dup sampler: the top-k most relevant AND
mutually distinct documents/embeddings.

Scale shape — the canonical two-stage re-rank: stage 1 (top-C
shortlist by cosine) is a distributed ``orderBy().limit(C)`` partial
top-k over the corpus, NO global window; stage 2 (the greedy loop)
runs entirely on the C-row shortlist and its C² pairwise-similarity
table — dimension-sized, corpus-independent, broadcast everywhere.
The iteration count K is a constant, so the whole selection is a
fixed-depth composition of bounded joins.

Determinism: relevance and pairwise similarity use the repo's proven
quantized-dot/sqrt-norm cosine recipe (identical IEEE op order to the
ann_cosine oracles); the greedy argmax tie-breaks on vec_id; the
oracle replays all K rounds as MATERIALIZED CTEs (the BPE/Lloyd
replay discipline), so every pick, including its float score, is
exact cross-engine signal.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from jobminer_spark.operators.common import VEC_NORMS_CTE, dot_col, norm_col
from jobminer_spark.registry import query
from jobminer_spark.sources import load_table

MMR_QUERY_VEC = 0   # query = embedding of vec_id 0
MMR_SHORTLIST = 24  # stage-1 candidate pool (top-C by relevance)
MMR_K = 8           # picks
_QUANT_SQL = "1000000000000000.0"



def _mmr_oracle() -> str:
    rounds = []
    for r in range(2, MMR_K + 1):
        rounds.append(f"""
    sc{r} AS MATERIALIZED (
      SELECT s.vec_id, s.rel,
             0.5 * s.rel - 0.5 * MAX(sims.sim) AS score
      FROM shortlist s
      JOIN sims ON sims.a = s.vec_id
               AND sims.b IN (SELECT vec_id FROM sel{r - 1})
      WHERE s.vec_id NOT IN (SELECT vec_id FROM sel{r - 1})
      GROUP BY s.vec_id, s.rel),
    p{r} AS MATERIALIZED (
      SELECT CAST({r} AS BIGINT) AS pick_no, vec_id, score
      FROM sc{r} ORDER BY score DESC, vec_id LIMIT 1),
    sel{r} AS (SELECT vec_id FROM sel{r - 1}
               UNION ALL SELECT vec_id FROM p{r})""")
    picks_union = "\n      UNION ALL ".join(
        f"SELECT pick_no, vec_id, score FROM p{r}"
        for r in range(1, MMR_K + 1)
    )
    return f"""
    WITH {VEC_NORMS_CTE},
    qdots AS (
      SELECT c.vec_id,
             CAST(SUM(CAST(floor(eq.val * ec.val * {_QUANT_SQL}) AS BIGINT)) AS DOUBLE)
               / {_QUANT_SQL} AS dot
      FROM embeddings c
      JOIN elems ec ON ec.vec_id = c.vec_id
      JOIN elems eq ON eq.vec_id = {MMR_QUERY_VEC} AND eq.ord = ec.ord
      WHERE c.vec_id <> {MMR_QUERY_VEC}
      GROUP BY c.vec_id
    ),
    shortlist AS MATERIALIZED (
      SELECT q.vec_id, q.dot / (n0.nrm * nc.nrm) AS rel
      FROM qdots q
      JOIN norms n0 ON n0.vec_id = {MMR_QUERY_VEC}
      JOIN norms nc ON nc.vec_id = q.vec_id
      ORDER BY q.dot / (n0.nrm * nc.nrm) DESC, q.vec_id
      LIMIT {MMR_SHORTLIST}
    ),
    sel_elems AS MATERIALIZED (
      SELECT e.vec_id, e.val, e.ord
      FROM elems e JOIN shortlist s ON s.vec_id = e.vec_id
    ),
    pair_dots AS (
      SELECT ea.vec_id AS a, eb.vec_id AS b,
             CAST(SUM(CAST(floor(ea.val * eb.val * {_QUANT_SQL}) AS BIGINT)) AS DOUBLE)
               / {_QUANT_SQL} AS dot
      FROM sel_elems ea JOIN sel_elems eb
        ON eb.ord = ea.ord AND eb.vec_id <> ea.vec_id
      GROUP BY ea.vec_id, eb.vec_id
    ),
    sims AS MATERIALIZED (
      SELECT p.a, p.b, p.dot / (na.nrm * nb.nrm) AS sim
      FROM pair_dots p
      JOIN norms na ON na.vec_id = p.a
      JOIN norms nb ON nb.vec_id = p.b
    ),
    p1 AS MATERIALIZED (
      SELECT CAST(1 AS BIGINT) AS pick_no, vec_id, rel AS score
      FROM shortlist ORDER BY rel DESC, vec_id LIMIT 1),
    sel1 AS (SELECT vec_id FROM p1),{",".join(rounds)}
    SELECT pick_no, vec_id, score FROM ({picks_union})
    """


@query("mmr_diverse_topk", oracle=_mmr_oracle())
def mmr_diverse_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K=8 MMR picks (λ=0.5) from the top-24 shortlist for the
    vec_id-0 query, each pick's float score exact cross-engine. The
    greedy loop runs on the broadcast shortlist only; the corpus is
    touched once, by the stage-1 partial top-k."""
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    q = emb.filter(F.col("vec_id") == MMR_QUERY_VEC).select(
        F.col("embedding").alias("q_emb"),
        norm_col(F.col("embedding")).alias("q_nrm"),
    )
    cand = emb.filter(F.col("vec_id") != MMR_QUERY_VEC)
    shortlist = (
        cand.crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            "embedding",
            (
                dot_col(F.col("embedding"), F.col("q_emb"))
                / (F.col("q_nrm") * norm_col(F.col("embedding")))
            ).alias("rel"),
        )
        .orderBy(F.col("rel").desc(), "vec_id")
        .limit(MMR_SHORTLIST)
        .select("vec_id", "embedding", "rel")
        # Three consumers (a, b, rel) would each re-run the corpus
        # top-k scan; the lazy cut materializes it inside the first
        # collect and the others read the C-row cached table.
        .localCheckpoint(eager=False)
    )
    # C² pairwise similarities — bounded, broadcast both sides
    a = shortlist.select(
        F.col("vec_id").alias("a"),
        F.col("embedding").alias("a_emb"),
        norm_col(F.col("embedding")).alias("a_nrm"),
    )
    b = shortlist.select(
        F.col("vec_id").alias("b"),
        F.col("embedding").alias("b_emb"),
        norm_col(F.col("embedding")).alias("b_nrm"),
    )
    sims = (
        a.crossJoin(F.broadcast(b))
        .filter(F.col("a") != F.col("b"))
        .select(
            "a",
            "b",
            (
                dot_col(F.col("a_emb"), F.col("b_emb"))
                / (F.col("a_nrm") * F.col("b_nrm"))
            ).alias("sim"),
        )
    )
    rel = shortlist.select("vec_id", "rel")
    # Stage 2 runs ON THE DRIVER over the collected C-row/C²-row
    # tables — bounded by the design constants, corpus-independent,
    # exactly where a production re-ranker runs its greedy loop. The
    # pure-DataFrame formulation was measured first: per-round
    # checkpointed limit(1) picks cost ~30 tiny shuffle stages of
    # scheduler overhead (26 s at sf0.1 vs ~3 s for the same corpus
    # work here), and an un-checkpointed composition grows the plan
    # exponentially. All FLOAT values are computed by Spark above and
    # only compared/combined below with the identical IEEE double ops
    # (0.5·rel − 0.5·max) the oracle's SQL performs, so the driver
    # loop cannot introduce cross-engine drift.
    rel_rows = {r["vec_id"]: r["rel"] for r in rel.collect()}
    sim_rows: dict[int, dict[int, float]] = {}
    for r in sims.collect():
        sim_rows.setdefault(r["a"], {})[r["b"]] = r["sim"]

    first = min(rel_rows.items(), key=lambda kv: (-kv[1], kv[0]))
    picks = [(1, first[0], first[1])]
    selected = [first[0]]
    for rnd in range(2, MMR_K + 1):
        best: tuple | None = None
        for vid, rv in rel_rows.items():
            if vid in selected:
                continue
            maxsim = max(sim_rows[vid][s] for s in selected)
            score = 0.5 * rv - 0.5 * maxsim
            key = (-score, vid)
            if best is None or key < best[0]:
                best = (key, vid, score)
        picks.append((rnd, best[1], best[2]))
        selected.append(best[1])
    # JVM-only VALUES relation (a list createDataFrame plans a
    # Python-RDD scan, so collecting the K-row result pays a Python
    # worker round-trip every run). repr(float) is the shortest
    # round-trip decimal and Double.parseDouble rounds to nearest, so
    # CAST('<repr>' AS DOUBLE) reproduces the exact IEEE bits the
    # driver loop computed.
    vals = ", ".join(
        f"({rnd}, {vid}, CAST('{score!r}' AS DOUBLE))"
        for rnd, vid, score in picks
    )
    return spark.sql(
        "SELECT CAST(pick_no AS BIGINT) AS pick_no, "
        "CAST(vec_id AS BIGINT) AS vec_id, score "
        f"FROM VALUES {vals} AS t(pick_no, vec_id, score)"
    )
