"""Stream-static join parity — the streaming ENRICHMENT surface
(unbounded facts joined to a batch dimension, re-resolved per
micro-batch) pinned against its batch twin. The last big Structured
Streaming join shape without a driver row: stream-stream interval
joins are attested (stream_batch_parity), keyed state is
(stream_stateful_parity / stream_funnel_parity), dedup state is
(stream_dedup_parity) — this adds the broadcast-dimension lookup
every production enrichment pipeline runs (reference analog: the
per-offer category/company lookup joins, SURVEY.md §2 rows 26-27,
run against a stream).

Parity discipline: the joined aggregation is segment-keyed (bounded
cardinality), drains in complete mode, and both sides accumulate the
value sum in exact decimal before one double cast — so the stream
row equals the batch row bit-for-bit and the audit pins zero
mismatches with the oracle recomputing the expected segment count
independently.

Import discipline: streaming imports stay inside the query body
(see audits.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from jobminer_spark.registry import query
from jobminer_spark.sources import load_table


@query(
    "stream_static_join_parity",
    oracle="""
    SELECT
      (SELECT COUNT(*) FROM (
         SELECT DISTINCT c.c_mktsegment
         FROM customer c JOIN (SELECT DISTINCT user_id FROM events) u
           ON c.c_custkey = u.user_id
      )) AS n_segments,
      CAST(0 AS BIGINT) AS n_mismatch
    """,
)
def stream_static_join_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drains the stream-static enrichment for real and full-outer
    joins it against the identical batch aggregation: every segment
    present, counts and decimal-exact value sums equal. A static-side
    re-resolution bug, join-key regression, or accumulation-order
    drift flips the driver row red."""
    from jobminer_spark.streaming.windows import (
        run_streaming_static_join_counts,
    )

    s = run_streaming_static_join_counts(spark, sf_dir).select(
        "segment",
        F.col("n_events").alias("s_n"),
        F.col("total_value").alias("s_tv"),
    )
    ev = load_table(spark, sf_dir, "events")
    dim = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    b = (
        ev.join(F.broadcast(dim), ev.user_id == dim.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("b_n"),
            F.sum(F.col("value").cast("decimal(38,6)"))
            .cast("double")
            .alias("b_tv"),
        )
        .select(F.col("c_mktsegment").alias("segment"), "b_n", "b_tv")
    )
    j = b.join(s, "segment", "full_outer")
    mismatch = (~F.col("b_n").eqNullSafe(F.col("s_n"))) | (
        ~F.col("b_tv").eqNullSafe(F.col("s_tv"))
    )
    return j.agg(
        F.count(F.lit(1)).alias("n_segments"),
        F.count(F.when(mismatch, 1)).alias("n_mismatch"),
    )
