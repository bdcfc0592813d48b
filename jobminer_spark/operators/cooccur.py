"""Skill co-occurrence / market-basket association over documents —
"which skills are demanded together" is the canonical JobMiner
analytic one step past per-skill counts (reference analog: the
per-job skills_dict it builds in pracuj_scraper.py:365,415; this
module asks what those sets co-contain).

Association strength is published as an EXACT integer-scaled lift:
lift = P(a,b) / (P(a)P(b)) = n_ab * N / (c_a * c_b), emitted both as
its raw integer components and as ``lift_q`` = (n_ab * N * 10000)
div (c_a * c_b) — integer division truncates identically in Spark
(``div``) and DuckDB (``//``), so the ranking hash-pins without any
float leaving either engine.

Scale shape: per-doc skill sets come from the same broadcast
dictionary join every skills query uses (one corpus shuffle on
doc_id); pairs are generated IN-ROW from the sorted per-doc set
(shifted-slice expansion — no self-join of the hits relation, no
second corpus shuffle), and the pair aggregation's key space is
bounded by |dictionary|^2 / 2 regardless of corpus size, so the
final agg + lift join are dimension-sized at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from jobminer_spark.operators.skills_core import (
    _DICT_CTE,
    _TOKENS_CTE,
    resolved_dictionary,
    tokenize,
)
from jobminer_spark.registry import query
from jobminer_spark.sources import load_table

# minimum pair support: bounds the published pair relation and mirrors
# the df-cap discipline of the dedup family (rare pairs are noise for
# association mining anyway)
MIN_SUPPORT = 5
LIFT_SCALE = 10_000
TOPK = 20

_PAIRS_CTE = f"""
    {_DICT_CTE},
    {_TOKENS_CTE},
    hits AS (
      SELECT DISTINCT t.doc_id, t.token AS skill
      FROM tokens t JOIN resolved_dict d ON t.token = d.term
    ),
    n_total AS (SELECT COUNT(*) AS n_docs FROM documents),
    skill_df AS (
      SELECT skill, COUNT(*) AS df FROM hits GROUP BY skill
    ),
    pair_support AS (
      SELECT a.skill AS s1, b.skill AS s2, COUNT(*) AS n_ab
      FROM hits a JOIN hits b
        ON a.doc_id = b.doc_id AND a.skill < b.skill
      GROUP BY 1, 2
      HAVING COUNT(*) >= {MIN_SUPPORT}
    ),
    lifted AS (
      SELECT p.s1, p.s2, p.n_ab,
             da.df AS c_a, db.df AS c_b, t.n_docs,
             (p.n_ab * t.n_docs * {LIFT_SCALE}) // (da.df * db.df) AS lift_q
      FROM pair_support p
      JOIN skill_df da ON p.s1 = da.skill
      JOIN skill_df db ON p.s2 = db.skill
      CROSS JOIN n_total t
    )
"""


def doc_skill_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct (doc_id, skill) hits against the resolved dictionary —
    the shared input relation of both queries below."""
    docs = load_table(spark, sf_dir, "documents")
    toks = tokenize(docs)
    dim = resolved_dictionary(spark)
    return toks.join(F.broadcast(dim), toks.token == dim.term).select(
        "doc_id", F.col("token").alias("skill")
    )


def _lifted_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    hits = doc_skill_hits(spark, sf_dir)
    n_total = (
        load_table(spark, sf_dir, "documents")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )
    # in-row pair expansion from the sorted per-doc set: element i
    # pairs with the slice starting at i+2 (1-based), so every
    # unordered pair appears exactly once with s1 < s2
    sets = hits.groupBy("doc_id").agg(
        F.sort_array(F.collect_set("skill")).alias("sk")
    )
    pairs = sets.select(
        F.explode(
            F.flatten(
                F.transform(
                    "sk",
                    lambda x, i: F.transform(
                        F.slice(F.col("sk"), i + 2, F.size("sk")),
                        lambda y: F.struct(x.alias("s1"), y.alias("s2")),
                    ),
                )
            )
        ).alias("p")
    ).select("p.s1", "p.s2")
    support = (
        pairs.groupBy("s1", "s2")
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .filter(F.col("n_ab") >= MIN_SUPPORT)
    )
    df = hits.groupBy("skill").agg(F.count(F.lit(1)).alias("df"))
    da = df.select(F.col("skill").alias("s1"), F.col("df").alias("c_a"))
    db = df.select(F.col("skill").alias("s2"), F.col("df").alias("c_b"))
    return (
        support.join(F.broadcast(da), "s1")
        .join(F.broadcast(db), "s2")
        .crossJoin(F.broadcast(n_total))
        .select(
            "s1",
            "s2",
            "n_ab",
            "c_a",
            "c_b",
            "n_docs",
            F.expr(
                f"(n_ab * n_docs * {LIFT_SCALE}L) div (c_a * c_b)"
            ).alias("lift_q"),
        )
    )


@query(
    "skill_cooccurrence_pairs",
    oracle=f"""
    WITH {_PAIRS_CTE}
    SELECT s1, s2, CAST(n_ab AS BIGINT) AS n_ab,
           CAST(c_a AS BIGINT) AS c_a, CAST(c_b AS BIGINT) AS c_b,
           CAST(n_docs AS BIGINT) AS n_docs,
           CAST(lift_q AS BIGINT) AS lift_q
    FROM lifted
    """,
)
def skill_cooccurrence_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every skill pair co-occurring in >= MIN_SUPPORT documents, with
    its exact support counts and integer-scaled lift."""
    return _lifted_pairs(spark, sf_dir)


@query(
    "cooccurrence_lift_topk",
    oracle=f"""
    WITH {_PAIRS_CTE},
    ranked AS (
      SELECT s1, s2, n_ab, lift_q,
             ROW_NUMBER() OVER (ORDER BY lift_q DESC, s1, s2) AS rk
      FROM lifted
    )
    SELECT s1, s2, CAST(n_ab AS BIGINT) AS n_ab,
           CAST(lift_q AS BIGINT) AS lift_q, CAST(rk AS BIGINT) AS rk
    FROM ranked WHERE rk <= {TOPK}
    """,
)
def cooccurrence_lift_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 most-associated skill pairs by exact lift (unique
    tie-break on the pair itself). The global window runs over the
    dictionary-bounded pair relation — dimension-sized at any corpus
    scale, so the single-partition rank is not a scale trap."""
    from pyspark.sql import Window as W

    lifted = _lifted_pairs(spark, sf_dir)
    w = W.orderBy(F.desc("lift_q"), "s1", "s2")
    return (
        lifted.select(
            "s1", "s2", "n_ab", "lift_q", F.row_number().over(w).alias("rk")
        )
        .filter(F.col("rk") <= TOPK)
    )
