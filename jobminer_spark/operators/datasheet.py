"""Dataset-card statistics: the corpus datasheet every released
training set ships (per-source / per-language composition, volume,
and length profile — the "Datasheets for Datasets" reporting shape,
Gebru et al. 2021, public).

One GROUPING SETS pass — (source), (lang), and the grand total in a
single aggregation over a single scan, the decision-support machinery
(tpch.grouping_sets_order_matrix) applied to the curation domain.

Determinism: counts, char sums, and token counts are exact integers;
the only doubles are final single divisions — identical cross-engine.

Scale shape: one scan, one combiner-friendly aggregation per grouping
set (Spark expands grouping sets into a single shuffle); no joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from jobminer_spark.registry import query
from jobminer_spark.sources import load_table


@query(
    "corpus_datasheet",
    oracle="""
    SELECT
      CASE WHEN GROUPING(source) = 0 THEN source END AS source,
      CASE WHEN GROUPING(lang) = 0 THEN lang END AS lang,
      CAST(COUNT(*) AS BIGINT) AS n_docs,
      CAST(SUM(n_chars) AS BIGINT) AS total_chars,
      CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
      CAST(SUM(n_chars) AS DOUBLE) / COUNT(*) AS mean_chars
    FROM documents
    GROUP BY GROUPING SETS ((source), (lang), ())
    """,
)
def corpus_datasheet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source rows + per-language rows + the grand total, one
    aggregation. The oracle recomputes the identical grouping sets,
    so a lost grouping, a miscounted token sum, or a wrong rollup
    slice turns this driver row red."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.size(F.split(F.col("text"), " "))
    return (
        docs.select("source", "lang", "n_chars", toks.alias("n_toks"))
        .groupingSets(
            [["source"], ["lang"], []],
            "source",
            "lang",
        )
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.sum("n_toks").alias("total_tokens"),
            (F.sum("n_chars").cast("double") / F.count(F.lit(1))).alias(
                "mean_chars"
            ),
        )
    )


SAMPLE_K = 5  # eval-sample size per source


@query(
    "stratified_sample_per_source",
    oracle=f"""
    WITH ranked AS (
      SELECT source, doc_id,
             ROW_NUMBER() OVER (
               PARTITION BY source
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
             ) AS rk
      FROM documents
    )
    SELECT source, doc_id, CAST(rk AS BIGINT) AS rk
    FROM ranked WHERE rk <= {SAMPLE_K}
    """,
)
def stratified_sample_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-k-per-source deterministic sample (held-out eval sets,
    human-review drawers): rank within each source by the md5 of the
    key — a fixed pseudo-random order both engines reproduce — and
    keep the first k. Unlike the rate-based mixture samplers this is
    population-dependent by definition (exact-k needs the ranking),
    so it is NOT subset-stable; the rate-based md5-bucket samplers
    remain the incremental-rebuild path (trainprep docstrings).

    Scale shape: the classic top-k-per-group window — one (source)
    shuffle, parallel across sources; per-source sort cost is bounded
    by the largest source (the same accepted shape as
    topk_customers_per_nation)."""
    from pyspark.sql import Window as W

    docs = load_table(spark, sf_dir, "documents")
    w = W.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    return (
        docs.select("source", "doc_id", F.row_number().over(w).alias("rk"))
        .filter(F.col("rk") <= SAMPLE_K)
        .select("source", "doc_id", F.col("rk").cast("long").alias("rk"))
    )
