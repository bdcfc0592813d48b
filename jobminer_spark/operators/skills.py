"""Skill-mining operators — the reference's text-classification core.

Reference semantics re-expressed set-at-a-time (SURVEY.md §2 rows
27-29, 31, 35):
  * dictionary classification (scraper.py:20-24): linear scan over 16
    categories, first match wins  →  broadcast hash join against a
    (term, category, rank) dim with min-rank resolution;
  * variant normalization (pracuj_scraper.py:199-229)  →  broadcast
    join variant→canonical with coalesce fallback;
  * 348-term containment theta-join (pracuj_scraper.py:183-197)  →
    token-explode + equi-join for single-word terms (the dominant,
    fully shuffle-parallel path) and a padded-LIKE containment join
    for multi-word terms against a broadcast dim;
  * per-key set-dedup grouping (pracuj_scraper.py:365)  →
    groupBy + collect_set.

The DuckDB oracles embed the same dictionary as VALUES rows, so the
driver's differential harness checks classification end-to-end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from jobminer_spark.data.skill_dictionary import (
    skill_dictionary_df,
    skill_variations_df,
)
from jobminer_spark.operators.skills_core import (
    _DICT_CTE,
    _TOKENS_CTE,
    _dict_values_sql,
    _variation_values_sql,
    resolved_dictionary,
    tokenize,
)
from jobminer_spark.registry import query
from jobminer_spark.sources import load_table


@query(
    "dict_first_match_resolution",
    oracle=f"""
    WITH dict(term, category, category_rank) AS (VALUES
      {_dict_values_sql()}
    )
    SELECT term, min_by(category, category_rank) AS category
    FROM dict GROUP BY term
    """,
)
def dict_first_match_resolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relational first-match resolution (min_by over the rank column) —
    proves the dedup-a-dimension operator itself; the hot path uses the
    Python-resolved equivalent (resolved_dictionary)."""
    d = skill_dictionary_df(spark)
    return d.groupBy("term").agg(
        F.min_by("category", "category_rank").alias("category")
    )


@query(
    "skill_token_classification",
    oracle=f"""
    WITH {_DICT_CTE},
    {_TOKENS_CTE}
    SELECT d.category AS category,
           COUNT(DISTINCT t.doc_id) AS n_docs,
           COUNT(*) AS n_hits
    FROM tokens t
    JOIN resolved_dict d ON t.token = d.term
    GROUP BY d.category
    """,
)
def skill_token_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-word dictionary terms via token-explode + broadcast
    equi-join — the scale path of the 348-term containment join."""
    docs = load_table(spark, sf_dir, "documents")
    toks = tokenize(docs)
    dim = resolved_dictionary(spark)
    return (
        toks.join(F.broadcast(dim), toks.token == dim.term)
        .groupBy("category")
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.count(F.lit(1)).alias("n_hits"),
        )
    )


@query(
    "multiword_containment_join",
    oracle=f"""
    WITH {_DICT_CTE},
    multiword AS (
      SELECT term, category FROM resolved_dict WHERE term LIKE '% %'
    )
    SELECT m.term AS term, m.category AS category, COUNT(*) AS n_docs
    FROM documents d
    JOIN multiword m
      ON (' ' || lower(d.text) || ' ') LIKE ('% ' || m.term || ' %')
    GROUP BY m.term, m.category
    """,
)
def multiword_containment_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-word terms ("big data", "machine learning") can't be found
    by token equality — containment theta-join against the broadcast
    dim (space-padded LIKE ≈ the reference's \\b-bounded regex search,
    pracuj_scraper.py:193, for space-tokenized text)."""
    docs = load_table(spark, sf_dir, "documents")
    dim = resolved_dictionary(spark).filter(F.col("term").contains(" "))
    padded = F.concat(F.lit(" "), F.lower(F.col("text")), F.lit(" "))
    return (
        docs.join(
            F.broadcast(dim),
            padded.contains(F.concat(F.lit(" "), F.col("term"), F.lit(" "))),
        )
        .groupBy("term", "category")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


@query(
    "variant_normalization",
    oracle=f"""
    WITH variations(variant, canonical) AS (VALUES
      {_variation_values_sql()}
    ),
    {_TOKENS_CTE}
    SELECT COALESCE(v.canonical, t.token) AS skill,
           COUNT(DISTINCT t.doc_id) AS n_docs
    FROM tokens t
    LEFT JOIN variations v ON t.token = v.variant
    GROUP BY COALESCE(v.canonical, t.token)
    """,
)
def variant_normalization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """variant→canonical normalization join with raw-value fallback
    (reference _map_to_standard_skills, pracuj_scraper.py:199-229)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = tokenize(docs)
    v = skill_variations_df(spark)
    return (
        toks.join(F.broadcast(v), toks.token == v.variant, "left")
        .select(
            "doc_id", F.coalesce(F.col("canonical"), F.col("token")).alias("skill")
        )
        .groupBy("skill")
        .agg(F.countDistinct("doc_id").alias("n_docs"))
    )


@query(
    "skills_per_doc_grouped",
    oracle=f"""
    WITH {_DICT_CTE},
    {_TOKENS_CTE},
    hits AS (
      SELECT DISTINCT t.doc_id, t.token
      FROM tokens t JOIN resolved_dict d ON t.token = d.term
    )
    SELECT doc_id, string_agg(token, ',' ORDER BY token) AS skills,
           COUNT(*) AS n_skills
    FROM hits GROUP BY doc_id
    """,
)
def skills_per_doc_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """groupBy + collect_set — the reference's per-job skill-set build
    (skills_dict, pracuj_scraper.py:365,415). Sorted and joined to a
    string so the oracle hash is order-insensitive."""
    docs = load_table(spark, sf_dir, "documents")
    toks = tokenize(docs)
    dim = resolved_dictionary(spark)
    return (
        toks.join(F.broadcast(dim), toks.token == dim.term)
        .groupBy("doc_id")
        .agg(
            F.array_join(F.sort_array(F.collect_set("token")), ",").alias("skills"),
            F.countDistinct("token").alias("n_skills"),
        )
    )


@query(
    "skill_category_share",
    oracle=f"""
    WITH {_DICT_CTE},
    {_TOKENS_CTE},
    cat_counts AS (
      SELECT d.category, COUNT(*) AS n_hits
      FROM tokens t JOIN resolved_dict d ON t.token = d.term
      GROUP BY d.category
    )
    SELECT category, n_hits,
           CAST(n_hits AS DOUBLE) / SUM(n_hits) OVER () AS share
    FROM cat_counts
    """,
)
def skill_category_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    docs = load_table(spark, sf_dir, "documents")
    toks = tokenize(docs)
    dim = resolved_dictionary(spark)
    counts = (
        toks.join(F.broadcast(dim), toks.token == dim.term)
        .groupBy("category")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    return counts.select(
        "category",
        "n_hits",
        (
            F.col("n_hits").cast("double")
            / F.sum("n_hits").over(W.partitionBy())
        ).alias("share"),
    )
