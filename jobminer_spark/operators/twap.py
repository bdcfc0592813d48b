"""Time-weighted averaging — the aggregate that values a measurement
by HOW LONG it held, not how often it was sampled (TWAP in finance,
time-in-state metrics in ops): each observation is weighted by the
duration until the user's next event, and the average is published as
an exact rational (numerator, denominator) pair per the repo's
no-float-division discipline (markov/regress precedent).

Scale shape: one (user) keyed sort shared by the LEAD lookup — the
same single exchange every per-user sequential operator in the repo
pays — then a narrow per-user aggregation with map-side combine.
Overflow headroom: durations are truncated to SECONDS (integer div),
so vq·dur_s ≤ ~1e6·3e7 per event and the per-user sum stays orders of
magnitude under int64 at any realistic event density.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from jobminer_spark.registry import query
from jobminer_spark.sources import load_table

_VQ = 1000  # value quantization (1e-3 quanta, exact in double)


@query(
    "time_weighted_avg_value",
    oracle=f"""
    WITH ev AS (
      SELECT user_id, event_id, epoch_us(ts) AS tus,
             CAST(FLOOR(value * {_VQ}.0) AS BIGINT) AS vq
      FROM events
    ),
    seq AS (
      SELECT user_id, vq,
             (LEAD(tus) OVER (PARTITION BY user_id
                              ORDER BY tus, event_id) - tus)
               // 1000000 AS dur_s
      FROM ev
    )
    SELECT user_id,
           CAST(SUM(vq * dur_s) AS BIGINT) AS twap_num,
           CAST(SUM(dur_s) AS BIGINT) AS twap_den,
           CAST(COUNT(dur_s) AS BIGINT) AS n_weighted
    FROM seq WHERE dur_s IS NOT NULL
    GROUP BY user_id
    """,
)
def time_weighted_avg_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user time-weighted average of the event value: weight =
    whole seconds until the user's next event (the final observation
    carries no duration and is excluded — stated, not hidden). The
    exact rational (twap_num, twap_den) hash-pins the computation; a
    consumer divides once at the edge."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("tus"),
        F.floor(F.col("value") * _VQ).cast("long").alias("vq"),
    )
    w = W.partitionBy("user_id").orderBy("tus", "event_id")
    # single window pass: LEAD on the shared (user) sort
    seq = ev.withColumn("next_tus", F.lead("tus").over(w)).withColumn(
        "dur_s", F.expr("(next_tus - tus) div 1000000")
    )
    return (
        seq.filter(F.col("dur_s").isNotNull())
        .groupBy("user_id")
        .agg(
            F.sum(F.col("vq") * F.col("dur_s")).alias("twap_num"),
            F.sum("dur_s").alias("twap_den"),
            F.count("dur_s").alias("n_weighted"),
        )
    )
