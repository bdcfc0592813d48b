"""Sequence packing for pretraining batches: concat-and-chunk.

The standard pretraining data layout concatenates documents (in a
deterministic order) and slices the token stream into fixed-length
training sequences — every token is used, a document may span a
sequence boundary, and only the final sequence of each shard carries
padding. This module computes that packing declaratively: no packer
loop, just a per-shard window cumulative sum and integer division, so
the plan is one hash partition by shard + one sort — the same plan at
100 TB, where a shard is the unit of parallelism AND of reproducible
ordering (docs are md5-sharded, then ordered by doc_id within the
shard; no global sort anywhere).

Sequence arithmetic (all exact integers): with per-doc token count t,
within-shard running total ``cum`` and ``prev = cum - t``:

  start_seq     = prev div L          first sequence the doc touches
  end_seq       = (cum - 1) div L     last sequence the doc touches
  offset_in_seq = prev % L            the doc's start offset
  boundary doc  ⇔ end_seq > start_seq

Reference anchor: the reference has no packing stage (its unit is a
row, JobScraper pipeline.py); this is one of the repo's
training-data-pipeline extensions (SURVEY §6).

Relation to ``curation.sequence_packing_bins``: that operator bins
WHOLE documents (a document never crosses a bin; bins under-fill),
the document-level loader layout. This module is the token-level
twin — concat-and-chunk with boundary-crossing documents and exact
offsets — the layout GPT-style pretraining actually trains on. Both
shapes ship because real pipelines use both (doc-preserving for SFT /
long-context curricula, concat-and-chunk for pretraining).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from jobminer_spark.operators.common import bucket_sql, hash_bucket
from jobminer_spark.registry import query
from jobminer_spark.sources import load_table

SEQ_LEN = 512  # tokens per packed training sequence
N_SHARDS = 8   # md5 shards; the unit of parallel, reproducible packing

_PACK_CTE = f"""
    toks AS (
      SELECT doc_id,
             {bucket_sql("doc_id", N_SHARDS)} AS shard,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
      FROM documents
    ),
    packed AS (
      SELECT doc_id, shard, n_tokens,
             CAST(SUM(n_tokens) OVER (
               PARTITION BY shard ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS BIGINT) AS cum
      FROM toks
    ),
    placed AS (
      SELECT doc_id, shard, n_tokens,
             (cum - n_tokens) // {SEQ_LEN} AS start_seq,
             (cum - 1) // {SEQ_LEN} AS end_seq,
             (cum - n_tokens) % {SEQ_LEN} AS offset_in_seq
      FROM packed
    )
"""


def _placed(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        hash_bucket(F.col("doc_id"), N_SHARDS).alias("shard"),
        F.size(F.split(F.col("text"), " ")).cast("long").alias("n_tokens"),
    )
    cum = F.sum("n_tokens").over(
        W.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    packed = toks.select("doc_id", "shard", "n_tokens", cum.alias("cum"))
    return packed.select(
        "doc_id",
        "shard",
        "n_tokens",
        F.expr(f"(cum - n_tokens) div {SEQ_LEN}").alias("start_seq"),
        F.expr(f"(cum - 1) div {SEQ_LEN}").alias("end_seq"),
        ((F.col("cum") - F.col("n_tokens")) % SEQ_LEN).alias("offset_in_seq"),
    )


@query(
    "packed_sequence_manifest",
    oracle=f"""
    WITH {_PACK_CTE}
    SELECT doc_id, shard, n_tokens, start_seq, end_seq, offset_in_seq
    FROM placed
    """,
)
def packed_sequence_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-exact doc → packed-sequence assignment: every document's
    shard, first/last sequence index, and start offset. This IS the
    reproducibility contract — a trainer on any cluster topology can
    rebuild byte-identical batches from (shard, seq_no)."""
    return _placed(spark, sf_dir)


@query(
    "sequence_packing_stats",
    oracle=f"""
    WITH {_PACK_CTE}
    SELECT shard,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           CAST((SUM(n_tokens) + {SEQ_LEN} - 1) // {SEQ_LEN} AS BIGINT)
             AS n_sequences,
           CAST(SUM(CASE WHEN end_seq > start_seq THEN 1 ELSE 0 END)
                AS BIGINT) AS n_boundary_docs,
           CAST(((SUM(n_tokens) + {SEQ_LEN} - 1) // {SEQ_LEN}) * {SEQ_LEN}
                - SUM(n_tokens) AS BIGINT) AS tail_padding
    FROM placed
    GROUP BY shard
    """,
)
def sequence_packing_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-shard packing census: sequence count, boundary-spanning
    docs, and tail padding (the packing's total waste — concat-and-
    chunk pads ONLY the final sequence per shard, so waste is bounded
    by N_SHARDS·(L-1) tokens for the whole corpus, independent of
    corpus size)."""
    placed = _placed(spark, sf_dir)
    total = F.sum("n_tokens")
    n_seq = F.expr(f"(sum(n_tokens) + {SEQ_LEN} - 1) div {SEQ_LEN}")
    return placed.groupBy("shard").agg(
        F.count(F.lit(1)).alias("n_docs"),
        total.cast("long").alias("total_tokens"),
        n_seq.alias("n_sequences"),
        F.sum(F.when(F.col("end_seq") > F.col("start_seq"), 1).otherwise(0))
        .cast("long")
        .alias("n_boundary_docs"),
        (n_seq * SEQ_LEN - total).cast("long").alias("tail_padding"),
    )
