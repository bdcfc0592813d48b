"""First-order Markov transition model over within-session event
sequences — the "what happens next" surface on top of the journeys
module's path analysis (session_path_topk ranks whole paths; this
estimates the per-step transition structure those paths are drawn
from).

Probabilities are published as EXACT RATIONALS (transition count,
row total) rather than a float division, per the repo's integer-
determinism discipline — the consumer divides once; the driver row
hash-pins on integers only.

Scale shape: one (user_id) window pass for the lag (shared sort with
every other per-user sequence operator), one (from, to) aggregation
over a 25-cell key space, one broadcast-sized row-total join. No
per-user arrays, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from jobminer_spark.registry import query
from jobminer_spark.sources import load_table

# same 5-minute inactivity gap as journeys.session_path_topk / the
# session-window family, so "adjacent" means within-session adjacent
_GAP_US = 300 * 1_000_000


@query(
    "markov_transition_counts",
    oracle=f"""
    WITH ev AS (
      SELECT user_id, event_id, epoch_us(ts) AS tus, event_type FROM events
    ),
    lagged AS (
      SELECT user_id, tus, event_type AS to_type,
             LAG(event_type) OVER w AS from_type,
             LAG(tus) OVER w AS prev_tus
      FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY tus, event_id)
    ),
    trans AS (
      SELECT from_type, to_type FROM lagged
      WHERE from_type IS NOT NULL AND tus - prev_tus <= {_GAP_US}
    ),
    cells AS (
      SELECT from_type, to_type, COUNT(*) AS n_trans
      FROM trans GROUP BY from_type, to_type
    )
    SELECT from_type, to_type, CAST(n_trans AS BIGINT) AS n_trans,
           CAST(SUM(n_trans) OVER (PARTITION BY from_type) AS BIGINT)
             AS from_total
    FROM cells
    """,
)
def markov_transition_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-session adjacent-event transition matrix: count of
    from_type -> to_type steps (adjacency = consecutive events of one
    user separated by <= the 5-minute session gap), with the exact
    per-from_type row total alongside so P(to|from) = n_trans /
    from_total is reconstructible without any float leaving the
    engine."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("tus"),
        "event_type",
    )
    w = W.partitionBy("user_id").orderBy("tus", "event_id")
    lagged = ev.select(
        F.col("event_type").alias("to_type"),
        F.lag("event_type").over(w).alias("from_type"),
        (F.col("tus") - F.lag("tus").over(w)).alias("gap"),
    )
    cells = (
        lagged.filter(F.col("from_type").isNotNull() & (F.col("gap") <= _GAP_US))
        .groupBy("from_type", "to_type")
        .agg(F.count(F.lit(1)).alias("n_trans"))
    )
    # 25-cell result: the row-total window is trivially small
    return cells.select(
        "from_type",
        "to_type",
        "n_trans",
        F.sum("n_trans").over(W.partitionBy("from_type")).alias("from_total"),
    )
