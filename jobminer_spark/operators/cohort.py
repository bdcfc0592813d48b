"""Cohort retention: the standard product-analytics matrix.

Users are cohorted by their FIRST signup day; each later active day
increments that cohort's retention cell. The classic dashboard query
(the reference's README promises "Power BI dashboards … trends" —
SURVEY §2.5's analytics gap) expressed as two keyed aggregations and
one equi-join:

  cohorts   = per-user min signup day      (1 shuffle on user_id)
  activity  = distinct (user, day) pairs   (1 shuffle on user_id, day)
  retention = activity ⋈ cohorts on user   (co-keyed with cohorts —
              AQE picks broadcast at fixture scale, shuffle-hash at
              100 TB where the user dimension is fact-sized)

Day arithmetic is integer division on epoch microseconds (the proven
week/day recipe — no calendar functions, no timezone surface), and
the retention rate ships as exact per-mille integers (n·1000 div
cohort size), never a float.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from jobminer_spark.registry import query
from jobminer_spark.sources import load_table

_DAY_US = 86_400_000_000


@query(
    "cohort_daily_retention",
    oracle=f"""
    WITH ev AS (
      SELECT user_id, event_type,
             epoch_us(ts) // {_DAY_US} AS day
      FROM events
    ),
    cohorts AS (
      SELECT user_id, MIN(day) AS cohort_day
      FROM ev WHERE event_type = 'signup'
      GROUP BY user_id
    ),
    cohort_sizes AS (
      SELECT cohort_day, COUNT(*) AS n_cohort
      FROM cohorts GROUP BY cohort_day
    ),
    activity AS (
      SELECT DISTINCT user_id, day FROM ev
    ),
    cells AS (
      SELECT c.cohort_day,
             a.day - c.cohort_day AS day_offset,
             COUNT(*) AS n_active
      FROM activity a JOIN cohorts c ON a.user_id = c.user_id
      WHERE a.day >= c.cohort_day
      GROUP BY c.cohort_day, a.day - c.cohort_day
    )
    SELECT x.cohort_day, x.day_offset, x.n_active, s.n_cohort,
           x.n_active * 1000 // s.n_cohort AS retention_permille
    FROM cells x JOIN cohort_sizes s ON x.cohort_day = s.cohort_day
    """,
)
def cohort_daily_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row per (signup-day cohort, day offset): active users,
    cohort size, and exact per-mille retention."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.expr(f"unix_micros(cast(ts as timestamp)) div {_DAY_US}").alias("day"),
    )
    cohorts = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("day").alias("cohort_day"))
    )
    cohort_sizes = cohorts.groupBy("cohort_day").agg(
        F.count(F.lit(1)).alias("n_cohort")
    )
    activity = ev.select("user_id", "day").distinct()
    cells = (
        activity.join(cohorts, "user_id")
        .filter(F.col("day") >= F.col("cohort_day"))
        .groupBy("cohort_day", (F.col("day") - F.col("cohort_day")).alias("day_offset"))
        .agg(F.count(F.lit(1)).alias("n_active"))
    )
    return cells.join(cohort_sizes, "cohort_day").select(
        "cohort_day",
        "day_offset",
        "n_active",
        "n_cohort",
        F.expr("n_active * 1000 div n_cohort").alias("retention_permille"),
    )
