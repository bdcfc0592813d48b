"""RFM segmentation: recency / frequency / monetary quintiles.

The classic customer-value matrix beside cohort retention: per user,
days since last activity (recency, against the corpus's max day so
the result is replay-stable), event count (frequency), and integer
cents of value (monetary); each dimension is cut into quintiles with
``ntile(5)`` and users roll up into the 125 R-F-M cells.

Determinism discipline: ntile over a non-unique sort key is
engine-dependent at the tie boundaries, so every ORDER BY carries the
unique ``user_id`` tiebreak — both engines then produce identical
bucket assignments (the unique-tiebreak rule every top-k in the repo
follows). All measures are exact integers; no floats anywhere.

Scale shape: one groupBy(user_id) over events (map-side partials),
then three ntile windows over the USER dimension. The windows are
global (no partition key) BY DEFINITION — quintiles are corpus-wide —
so this operator's scale bound is the user dimension, not the event
fact table; at 100 TB of events the user table is the small output
of the first aggregation (documented global-window whitelist entry in
tests/test_plans.py). For a fact-sized user dimension the standard
rewrite is approx-percentile cutpoints + a broadcast range join,
which trades exact quintile boundaries for full parallelism.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from jobminer_spark.registry import query
from jobminer_spark.sources import load_table

_DAY_US = 86_400_000_000


@query(
    "rfm_segment_census",
    oracle=f"""
    WITH per_user AS (
      SELECT user_id,
             MAX(epoch_us(ts) // {_DAY_US}) AS last_day,
             COUNT(*) AS frequency,
             CAST(SUM(CAST(FLOOR(value * 100.0) AS BIGINT)) AS BIGINT)
               AS monetary_cents
      FROM events GROUP BY user_id
    ),
    anchored AS (
      SELECT user_id,
             (SELECT MAX(last_day) FROM per_user) - last_day AS recency_days,
             frequency, monetary_cents
      FROM per_user
    ),
    scored AS (
      SELECT user_id, recency_days, frequency, monetary_cents,
             NTILE(5) OVER (ORDER BY recency_days ASC NULLS LAST, user_id)
               AS r_bucket,
             NTILE(5) OVER (ORDER BY frequency DESC NULLS LAST, user_id)
               AS f_bucket,
             NTILE(5) OVER (ORDER BY monetary_cents DESC NULLS LAST, user_id)
               AS m_bucket
      FROM anchored
    )
    SELECT r_bucket, f_bucket, m_bucket,
           COUNT(*) AS n_users,
           CAST(SUM(monetary_cents) AS BIGINT) AS segment_cents,
           CAST(SUM(frequency) AS BIGINT) AS segment_events
    FROM scored GROUP BY r_bucket, f_bucket, m_bucket
    """,
)
def rfm_segment_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Users bucketed into R×F×M quintile cells (1 = best: most
    recent, most frequent, highest value) with per-cell population
    and exact integer value/event mass."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.expr(f"unix_micros(cast(ts as timestamp)) div {_DAY_US}").alias("day"),
        F.floor(F.col("value") * 100.0).cast("long").alias("cents"),
    )
    per_user = ev.groupBy("user_id").agg(
        F.max("day").alias("last_day"),
        F.count(F.lit(1)).alias("frequency"),
        F.sum("cents").alias("monetary_cents"),
    )
    max_day = per_user.agg(F.max("last_day").alias("corpus_max_day"))
    anchored = per_user.crossJoin(F.broadcast(max_day)).select(
        "user_id",
        (F.col("corpus_max_day") - F.col("last_day")).alias("recency_days"),
        "frequency",
        "monetary_cents",
    )
    scored = anchored.select(
        "user_id",
        "recency_days",
        "frequency",
        "monetary_cents",
        # explicit NULLS LAST on every measure: Spark's ASC default is
        # NULLS FIRST while DuckDB's is NULLS LAST, so an all-NULL
        # aggregate (e.g. NULL monetary_cents) would silently shift
        # every bucket assignment — the unique user_id tiebreak does
        # not cover null PLACEMENT
        F.ntile(5)
        .over(W.orderBy(F.col("recency_days").asc_nulls_last(), "user_id"))
        .alias("r_bucket"),
        F.ntile(5)
        .over(W.orderBy(F.col("frequency").desc_nulls_last(), "user_id"))
        .alias("f_bucket"),
        F.ntile(5)
        .over(W.orderBy(F.col("monetary_cents").desc_nulls_last(), "user_id"))
        .alias("m_bucket"),
    )
    return scored.groupBy("r_bucket", "f_bucket", "m_bucket").agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum("monetary_cents").cast("long").alias("segment_cents"),
        F.sum("frequency").cast("long").alias("segment_events"),
    )
