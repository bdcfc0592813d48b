"""Term co-occurrence / market-basket association over documents —
"which terms are demanded together" is the canonical JobMiner
analytic one step past per-term counts (reference analog: the
per-job skills_dict built in pracuj_scraper.py:365,415; the fixture
reality check: every synthetic document contains exactly ONE
dictionary skill, so the basket here is each document's TOP-K RAREST
TOKENS — which is also the honest 100 TB design: a per-doc basket
cap bounds pair fan-out at C(K,2) per document regardless of
document length or vocabulary growth, where an uncapped token basket
would expand quadratically in document size).

Association strength is published as an EXACT integer-scaled lift:
lift = P(a,b) / (P(a)P(b)) = n_ab * N / (c_a * c_b), emitted both as
its raw integer components and as ``lift_q`` = (n_ab * N * 10000)
div (c_a * c_b) — integer division truncates identically in Spark
(``div``) and DuckDB (``//``), so the ranking hash-pins without any
float leaving either engine. Marginals c_a/c_b are measured on the
SAME basket relation the pairs come from, keeping the lift coherent.

Scale shape: one (doc_id, token) distinct shuffle builds the df
table (shared shape with word_rarity/surprisal), the top-K-rarest
basket selection is one (doc_id) window over per-doc-bounded rows,
pairs are generated IN-ROW from the sorted per-doc basket
(shifted-slice expansion — no basket self-join), and the pair
aggregation's key space is bounded by the banded vocabulary, with
map-side combine. The association graph queries run over the
pair relation — dimension-sized at any corpus scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from jobminer_spark.registry import query
from jobminer_spark.sources import load_table

# per-doc basket cap: the rarest K tokens (df asc, token asc) — the
# C(K,2) pair bound per document IS the scale argument
K_BASKET = 16
# minimum pair support: bounds the published pair relation and mirrors
# the df-cap discipline of the dedup family
MIN_SUPPORT = 5
LIFT_SCALE = 10_000
TOPK = 20

_PAIRS_CTE = f"""
    toks AS (
      SELECT DISTINCT doc_id, lower(tok) AS token FROM (
        SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
      ) WHERE tok <> ''
    ),
    tdf AS (SELECT token, COUNT(*) AS df FROM toks GROUP BY token),
    basket AS (
      SELECT doc_id, token FROM (
        SELECT t.doc_id, t.token,
               ROW_NUMBER() OVER (
                 PARTITION BY t.doc_id ORDER BY d.df, t.token
               ) AS rk
        FROM toks t JOIN tdf d USING (token)
      ) WHERE rk <= {K_BASKET}
    ),
    n_total AS (SELECT COUNT(*) AS n_docs FROM documents),
    marg AS (SELECT token, COUNT(*) AS bdf FROM basket GROUP BY token),
    pair_support AS (
      SELECT a.token AS s1, b.token AS s2, COUNT(*) AS n_ab
      FROM basket a JOIN basket b
        ON a.doc_id = b.doc_id AND a.token < b.token
      GROUP BY 1, 2
      HAVING COUNT(*) >= {MIN_SUPPORT}
    ),
    lifted AS (
      SELECT p.s1, p.s2, p.n_ab,
             ma.bdf AS c_a, mb.bdf AS c_b, t.n_docs,
             (p.n_ab * t.n_docs * {LIFT_SCALE}) // (ma.bdf * mb.bdf)
               AS lift_q
      FROM pair_support p
      JOIN marg ma ON p.s1 = ma.token
      JOIN marg mb ON p.s2 = mb.token
      CROSS JOIN n_total t
    )
"""


def doc_baskets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, token): each document's K_BASKET rarest distinct
    tokens — the shared basket relation of the queries below."""
    docs = load_table(spark, sf_dir, "documents")
    toks = (
        docs.repartition("doc_id")
        .select("doc_id", F.explode(F.split(F.col("text"), " ")).alias("tok"))
        .filter(F.col("tok") != "")
        .select("doc_id", F.lower(F.col("tok")).alias("token"))
        .distinct()
    )
    tdf = toks.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    w = W.partitionBy("doc_id").orderBy("df", "token")
    return (
        toks.join(tdf, "token")  # vocab-sized: AQE broadcasts
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= K_BASKET)
        .select("doc_id", "token")
    )


def _lifted_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    basket = doc_baskets(spark, sf_dir)
    n_total = (
        load_table(spark, sf_dir, "documents")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )
    # in-row pair expansion from the sorted per-doc basket: element i
    # pairs with the slice starting at i+2 (1-based), so every
    # unordered pair appears exactly once with s1 < s2
    sets = basket.groupBy("doc_id").agg(
        F.sort_array(F.collect_set("token")).alias("sk")
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
    marg = basket.groupBy("token").agg(F.count(F.lit(1)).alias("bdf"))
    ma = marg.select(F.col("token").alias("s1"), F.col("bdf").alias("c_a"))
    mb = marg.select(F.col("token").alias("s2"), F.col("bdf").alias("c_b"))
    return (
        support.join(F.broadcast(ma), "s1")
        .join(F.broadcast(mb), "s2")
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
    "token_cooccurrence_pairs",
    oracle=f"""
    WITH {_PAIRS_CTE}
    SELECT s1, s2, CAST(n_ab AS BIGINT) AS n_ab,
           CAST(c_a AS BIGINT) AS c_a, CAST(c_b AS BIGINT) AS c_b,
           CAST(n_docs AS BIGINT) AS n_docs,
           CAST(lift_q AS BIGINT) AS lift_q
    FROM lifted
    """,
)
def token_cooccurrence_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every basket pair co-occurring in >= MIN_SUPPORT documents,
    with its exact support counts and integer-scaled lift."""
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
    """Top-20 most-associated basket pairs by exact lift (unique
    tie-break on the pair itself). The global window runs over the
    vocabulary-bounded pair relation — dimension-sized at any corpus
    scale, so the single-partition rank is not a scale trap."""
    lifted = _lifted_pairs(spark, sf_dir)
    w = W.orderBy(F.desc("lift_q"), "s1", "s2")
    return (
        lifted.select(
            "s1", "s2", "n_ab", "lift_q", F.row_number().over(w).alias("rk")
        )
        .filter(F.col("rk") <= TOPK)
    )


@query(
    "association_link_prediction",
    oracle=f"""
    WITH {_PAIRS_CTE},
    sedges AS (SELECT s1, s2 FROM lifted WHERE lift_q > {LIFT_SCALE}),
    sbidir AS (
      SELECT s1 AS src, s2 AS dst FROM sedges
      UNION SELECT s2, s1 FROM sedges
    ),
    wedges AS (
      SELECT b1.dst AS a, b2.dst AS c, COUNT(*) AS n_common
      FROM sbidir b1 JOIN sbidir b2
        ON b1.src = b2.src AND b1.dst < b2.dst
      GROUP BY 1, 2
    )
    SELECT w.a AS s1, w.c AS s2, CAST(w.n_common AS BIGINT) AS n_common
    FROM wedges w
    LEFT JOIN sedges e ON e.s1 = w.a AND e.s2 = w.c
    WHERE e.s1 IS NULL AND w.n_common >= 2
    """,
)
def association_link_prediction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Link prediction by common neighbors on the positive-lift
    association graph (edges: lift > 1 at >= MIN_SUPPORT support):
    NON-adjacent term pairs sharing >= 2 positively-associated
    partners — the associations the support/lift thresholds *just*
    missed, i.e. the recommendation candidates. Wedge enumeration
    (adjacency self-joined on the center, ordered endpoints) + an
    anti-join against existing edges; the whole graph is
    vocabulary-bounded, so every step past the shared basket build is
    dimension-sized at any corpus scale."""
    lifted = _lifted_pairs(spark, sf_dir).localCheckpoint(eager=False)
    edges = lifted.filter(F.col("lift_q") > LIFT_SCALE).select("s1", "s2")
    bidir = edges.select(F.col("s1").alias("src"), F.col("s2").alias("dst")).union(
        edges.select(F.col("s2").alias("src"), F.col("s1").alias("dst"))
    )
    b1 = bidir.select("src", F.col("dst").alias("a"))
    b2 = bidir.select("src", F.col("dst").alias("c"))
    wedges = (
        b1.join(b2, "src")
        .filter(F.col("a") < F.col("c"))
        .groupBy("a", "c")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    return (
        wedges.join(
            edges,
            (wedges.a == edges.s1) & (wedges.c == edges.s2),
            "left_anti",
        )
        .filter(F.col("n_common") >= 2)
        .select(F.col("a").alias("s1"), F.col("c").alias("s2"), "n_common")
    )
