"""Decayed aggregates: exponentially-weighted moving averages over
each user's event history — the freshness/trending primitive (recent
observations dominate, old ones fade) that counters, quality scores,
and rate estimators use at scale.

The decay is PER-OBSERVATION with α = 1/2 and integer arithmetic:
``e₁ = x₁``, ``eₙ = (eₙ₋₁ + xₙ) div 2`` over values quantized to 1e-6
longs — a left fold in a fixed total order (tus, event_id), so the
result is bit-identical cross-engine (Spark ``aggregate`` vs DuckDB
``list_reduce``; both engines' integer division truncates toward
zero). A WALL-CLOCK decay factor pow(α, Δt) is deliberately out of
scope: pow is not correctly rounded, so it could never hash-pin —
the per-observation halving is the standard integer-safe variant.

Scale shape: one (user_id) partial-agg shuffle collecting each
user's (tus, event_id, x_q) triples, then the fold and the sort are
IN-ROW. Per-user state is the user's own history — bounded by
per-key volume like any sessionization; a production rolling variant
keeps only the running eₙ per key (O(1) state), which is exactly what
the fold computes incrementally.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from jobminer_spark.registry import query
from jobminer_spark.sources import load_table

_X_QUANT = 1_000_000  # event values quantized to 1e-6 longs


@query(
    "ewma_user_value",
    oracle=f"""
    WITH ev AS (
      SELECT user_id, event_id, epoch_us(ts) AS tus,
             CAST(floor(value * {float(_X_QUANT)}) AS BIGINT) AS xq
      FROM events
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(list_reduce(list(xq ORDER BY tus, event_id),
                            (a, b) -> (a + b) // 2) AS BIGINT) AS ewma_q
    FROM ev GROUP BY user_id
    """,
)
def ewma_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(user_id, n_events, ewma_q): the α=1/2 integer EWMA of each
    user's event values in event-time order — the oracle replays the
    identical quantization, ordering, and fold, so a drift in any of
    the three turns this driver row red."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("tus"),
        "event_id",
        F.floor(F.col("value") * F.lit(float(_X_QUANT))).cast("long").alias("xq"),
    )
    arrs = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.array_sort(
            F.collect_list(F.struct("tus", "event_id", "xq"))
        ).alias("hist"),
    )
    return arrs.select(
        "user_id",
        "n_events",
        F.expr(
            """
            aggregate(
              slice(transform(hist, p -> p.xq), 2,
                    greatest(size(hist) - 1, 0)),
              element_at(transform(hist, p -> p.xq), 1),
              (acc, x) -> (acc + x) div 2
            )
            """
        ).cast("long").alias("ewma_q"),
    )
