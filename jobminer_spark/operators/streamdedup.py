"""Driver-attestable parity audit for ``dropDuplicatesWithinWatermark``
— the one streaming surface that was still pytest-only (every other
streaming operator has had an oracle row since r7/r8; VERDICT r8's
XML-source argument applies verbatim here: every surface eventually
joins the attestation regime).

Reference semantics anchor: the probe-before-insert dup-key skip
(database.py:116-123) run as a STREAM — first writer wins per natural
key, late duplicates are suppressed, and the watermark bounds how
long a key must be remembered (state tracks the late-data window,
not the full key history).

Audit discipline (the stream_session_parity lesson, VERDICT r8 item
1): the parity replay removes every environment-sensitive degree of
freedom — an effectively infinite watermark delay makes re-admission
impossible under ANY micro-batching, and only KEY-LEVEL invariants
are pinned (which physical row survives inside a batch is
plan-order-dependent and not part of the operator's contract). The
production-shaped 10-minute-delay variant keeps its state-bounding
claim under pytest (tests/test_streaming.py).

Import discipline: the streaming package is imported inside the query
body so this module's registration stays where
``registry._OPERATOR_MODULES`` puts it (see audits.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from jobminer_spark.registry import query
from jobminer_spark.sources import load_table


@query(
    "stream_dedup_parity",
    oracle="""
    WITH keys AS (SELECT DISTINCT user_id, event_type FROM events)
    SELECT
      (SELECT COUNT(*) FROM keys) AS n_keys,
      CAST(0 AS BIGINT) AS n_key_mismatch,
      CAST(1 AS BIGINT) AS max_rows_per_key,
      (SELECT COUNT(*) FROM events) - (SELECT COUNT(*) FROM keys)
        AS n_suppressed
    """,
)
def stream_dedup_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drains the infinite-delay streaming dedup for real and pins it
    key-for-key against the batch-distinct key set: every batch key
    appears exactly once in the stream output, no stream-only keys,
    and the suppressed-row count equals total minus distinct. The
    oracle states the expected values independently, so a
    state-eviction, watermark-unit, or key-column regression flips
    this driver row red."""
    from jobminer_spark.streaming.windows import run_streaming_dedup_parity

    s_keys = run_streaming_dedup_parity(spark, sf_dir).select(
        "user_id", "event_type"
    )
    b = load_table(spark, sf_dir, "events")
    b_keys = b.select("user_id", "event_type").distinct()

    per_key = s_keys.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    j = per_key.withColumn("s_seen", F.lit(1)).join(
        b_keys.withColumn("b_seen", F.lit(1)),
        ["user_id", "event_type"],
        "full_outer",
    )
    key_stats = j.agg(
        F.count(F.when(F.col("b_seen").isNotNull(), 1)).alias("n_keys"),
        F.count(
            F.when(F.col("s_seen").isNull() | F.col("b_seen").isNull(), 1)
        ).alias("n_key_mismatch"),
        F.max(F.coalesce(F.col("n"), F.lit(0))).alias("max_rows_per_key"),
    )
    suppressed = (
        b.agg(F.count(F.lit(1)).alias("n_total"))
        .crossJoin(F.broadcast(s_keys.agg(F.count(F.lit(1)).alias("n_out"))))
        .select((F.col("n_total") - F.col("n_out")).alias("n_suppressed"))
    )
    return key_stats.crossJoin(F.broadcast(suppressed))
