"""Deterministic weighted sampling (priority sampling, Duffield-
Lund-Thorup style): each item gets priority = u / weight with u a
uniform hash of its key; the k SMALLEST priorities are the sample,
giving inclusion probability increasing in weight — the standard
one-pass weighted-sample-without-replacement shape for data
pipelines (e.g. quality- or length-weighted corpus subsampling).

The repo's determinism discipline forbids both randomness and float
division, so u is the md5-derived integer (the common.hash_bucket
recipe, 40 bits here) and the priority is the exact INTEGER division
(u * 1_000_000) div weight — identical on both engines, reproducible
across runs, retries, and cluster sizes (a property reservoir
samplers with RNG state do not have).

Scale shape: priority is an in-row expression (no shuffle); top-k is
Spark's orderBy+limit = per-partition partial top-k then a k-row
merge — never a global sort materialization. At 100 TB this is one
narrow pass over the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from jobminer_spark.registry import query
from jobminer_spark.sources import load_table

SAMPLE_K = 25
_PRIO_SCALE = 1_000_000

# 40-bit md5-derived uniform int (10 hex nibbles); * 1e6 stays far
# under the BIGINT range (2^40 * 1e6 ~ 1.1e18 < 9.2e18), and `div`
# keeps the whole priority computation in exact integer arithmetic —
# a float division of a >2^53 numerator would NOT round-trip.
# greatest(n_chars, 1) guards the degenerate zero-length document: a
# plain division would yield NULL under Spark's div but a hard
# division-by-zero error in DuckDB's // — the engines would fail
# ASYMMETRICALLY on the same input (r9 ADVICE). The guard is applied
# identically on both sides, so a zero-weight doc simply gets the
# maximum-inclusion priority instead of poisoning the query.
_PRIORITY_SQL = (
    "(CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, 10), 16, 10)"
    f" AS BIGINT) * {_PRIO_SCALE}) div greatest(n_chars, 1)"
)


@query(
    "weighted_sample_topk",
    oracle=f"""
    WITH pri AS (
      SELECT doc_id, source, n_chars,
             (CAST(concat('0x', substring(md5(CAST(doc_id AS VARCHAR)), 1, 10))
                   AS BIGINT) * {_PRIO_SCALE}) // greatest(n_chars, 1) AS priority
      FROM documents
    )
    SELECT doc_id, source, CAST(n_chars AS BIGINT) AS n_chars,
           CAST(priority AS BIGINT) AS priority
    FROM pri ORDER BY priority, doc_id LIMIT {SAMPLE_K}
    """,
)
def weighted_sample_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The k length-weighted sample of the documents corpus under
    deterministic priority sampling (weight = n_chars, k = 25). Ties
    (astronomically unlikely at 40-bit hashes) break on doc_id so the
    row set is total-ordered and hash-pinned."""
    d = load_table(spark, sf_dir, "documents")
    pri = d.selectExpr(
        "doc_id", "source", "n_chars", f"{_PRIORITY_SQL} AS priority"
    )
    return pri.orderBy("priority", "doc_id").limit(SAMPLE_K)
