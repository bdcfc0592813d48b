"""Leakage-safe train/val/test splits: group-aware assignment.

Splitting a corpus doc-by-doc leaks evaluation data: two near-
duplicate documents land on opposite sides of the split and the
benchmark score measures memorization. The safe construction assigns
whole NEAR-DUP CLUSTERS atomically — the split key is the cluster
(connected component of the trigram-Jaccard ≥ 0.8 graph, the exact
clustering already attested by ``neardup_connected_components``), and
singleton docs are their own group. The md5 bucket of the GROUP id
decides the split (80/10/10), so membership is a pure function of
content-cluster identity: stable under reshuffles, re-ingestion
order, and corpus growth (a new near-dup of a train doc can only
join train).

Scale shape: the clustering is the df-capped inverted-index + CC
pipeline (dedupe.py — bucketed, never all-pairs); on top of it this
module adds one broadcast-size left join (cluster labels cover only
graph members, a small fraction of any deduped corpus) and a
hash-bucket projection. No new shuffles beyond one groupBy for the
census.

The audit column pair is the point: ``naive_leaky_groups`` counts
multi-doc clusters that doc-level bucketing WOULD have split across
sets (non-zero at every fixture SF — 8 at sf0.01), while
``group_aware_leaky_groups`` is computed the same way on the actual
assignment and must be zero BY CONSTRUCTION, not by pin — the oracle
recomputes both from scratch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from jobminer_spark.operators.common import bucket_sql, hash_bucket
from jobminer_spark.operators.dedupe import (
    _CC_EDGES_CTE,
    _CC_REACH_CTE,
    _neardup_edges,
    connected_components_propagation,
)
from jobminer_spark.registry import query
from jobminer_spark.sources import load_table

N_BUCKETS = 10  # md5 buckets: 0-7 train, 8 val, 9 test

_SPLIT_CASE = "CASE WHEN {b} < 8 THEN 'train' WHEN {b} < 9 THEN 'val' ELSE 'test' END"

_GROUPED_CTE = f"""
    {_CC_EDGES_CTE},
{_CC_REACH_CTE},
    comp AS (
      SELECT doc_id, MIN(m) AS component
      FROM (
        SELECT src AS doc_id, dst AS m FROM reach
        UNION ALL
        SELECT DISTINCT src, src FROM bidir
      )
      GROUP BY doc_id
    ),
    grouped AS (
      SELECT d.doc_id,
             CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_tokens,
             COALESCE(c.component, d.doc_id) AS grp,
             {_SPLIT_CASE.format(b=bucket_sql("COALESCE(c.component, d.doc_id)", N_BUCKETS))}
               AS split,
             {_SPLIT_CASE.format(b=bucket_sql("d.doc_id", N_BUCKETS))}
               AS naive_split
      FROM documents d LEFT JOIN comp c ON d.doc_id = c.doc_id
    )
"""


_GROUPED_CACHE: dict[tuple[str, str], DataFrame] = {}


def _grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Both registered queries consume the same clustering+assignment;
    # cache the checkpointed frame per (session, fixture) so the
    # iterative CC fixpoint runs once (the scenario-cache discipline
    # of audits/lakeaudit). localCheckpoint also cuts the CC loop's
    # lineage out of downstream plans.
    cache_key = (spark.sparkContext.applicationId, sf_dir)
    if cache_key in _GROUPED_CACHE:
        return _GROUPED_CACHE[cache_key]
    docs = load_table(spark, sf_dir, "documents")
    comp = connected_components_propagation(_neardup_edges(docs)).select(
        "doc_id", "component"
    )
    grp = F.coalesce(F.col("component"), F.col("doc_id"))

    def split_of(bucket_col):
        return (
            F.when(bucket_col < 8, "train")
            .when(bucket_col < 9, "val")
            .otherwise("test")
        )

    # cluster labels cover graph members only — broadcast-size after
    # dedup; the left join never shuffles the full corpus twice
    out = (
        docs.join(F.broadcast(comp), "doc_id", "left")
        .select(
            "doc_id",
            F.size(F.split(F.col("text"), " ")).cast("long").alias("n_tokens"),
            grp.alias("grp"),
            split_of(hash_bucket(grp, N_BUCKETS)).alias("split"),
            split_of(hash_bucket(F.col("doc_id"), N_BUCKETS)).alias(
                "naive_split"
            ),
        )
        .localCheckpoint(eager=True)
    )
    _GROUPED_CACHE[cache_key] = out
    return out


@query(
    "leakage_safe_split_counts",
    oracle=f"""
    WITH RECURSIVE {_GROUPED_CTE}
    SELECT split,
           COUNT(*) AS n_docs,
           CAST(COUNT(DISTINCT grp) AS BIGINT) AS n_groups,
           CAST(SUM(n_tokens) AS BIGINT) AS n_tokens
    FROM grouped GROUP BY split
    """,
)
def leakage_safe_split_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-split census of the group-aware assignment: docs, distinct
    content groups, and token mass per split."""
    return _grouped(spark, sf_dir).groupBy("split").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("grp").cast("long").alias("n_groups"),
        F.sum("n_tokens").cast("long").alias("n_tokens"),
    )


@query(
    "split_leakage_audit",
    oracle=f"""
    WITH RECURSIVE {_GROUPED_CTE},
    per_group AS (
      SELECT grp,
             COUNT(*) AS n_docs,
             COUNT(DISTINCT split) AS n_splits,
             COUNT(DISTINCT naive_split) AS n_naive_splits
      FROM grouped GROUP BY grp
    )
    SELECT
      CAST(COUNT(*) FILTER (WHERE n_docs > 1) AS BIGINT)
        AS n_multi_doc_groups,
      CAST(COUNT(*) FILTER (WHERE n_docs > 1 AND n_naive_splits > 1)
        AS BIGINT) AS naive_leaky_groups,
      CAST(COUNT(*) FILTER (WHERE n_splits > 1) AS BIGINT)
        AS group_aware_leaky_groups
    FROM per_group
    """,
)
def split_leakage_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The leakage differential: how many near-dup clusters doc-level
    bucketing would split across sets vs the group-aware assignment
    (computed, expected zero by construction — a regression in the
    grouping or bucketing flips it non-zero and the row red)."""
    per_group = _grouped(spark, sf_dir).groupBy("grp").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("split").alias("n_splits"),
        F.countDistinct("naive_split").alias("n_naive_splits"),
    )
    multi = F.col("n_docs") > 1
    return per_group.agg(
        F.count(F.when(multi, 1)).alias("n_multi_doc_groups"),
        F.count(F.when(multi & (F.col("n_naive_splits") > 1), 1)).alias(
            "naive_leaky_groups"
        ),
        F.count(F.when(F.col("n_splits") > 1, 1)).alias(
            "group_aware_leaky_groups"
        ),
    )
