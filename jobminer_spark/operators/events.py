"""Stream-shaped operators over the events table (batch semantics).

The reference's streaming surface is a daily idempotent micro-batch
(SURVEY.md §2.7); the engine exposes the full windowing family the
north star requires — tumbling, sliding, session — with semantics
identical to Structured Streaming's (the streaming/ package runs the
same windows under readStream+watermark; these batch versions are the
oracle-checkable contract).

Window-start values are emitted as formatted strings so the hash is
engine-neutral; aggregates follow the decimal-accumulation discipline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from jobminer_spark.operators.common import dsum, ts_str
from jobminer_spark.registry import query
from jobminer_spark.sources import load_table


@query(
    "tumbling_window_hourly",
    oracle="""
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type,
           COUNT(*) AS n_events,
           CAST(CAST(SUM(CAST(value AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) AS total_value
    FROM events
    GROUP BY date_trunc('hour', ts), event_type
    """,
)
def tumbling_window_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour windows — F.window, the Structured Streaming
    primitive (runs unchanged under readStream with a watermark)."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum(F.col("value")).alias("total_value"),
        )
        .select(
            ts_str(F.col("window.start")).alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


@query(
    "sliding_window_1h_30m",
    oracle="""
    WITH assigned AS (
      SELECT make_timestamp(CAST(floor(epoch(ts) / 1800) * 1800 * 1000000 AS BIGINT))
               AS w_start, value
      FROM events
      UNION ALL
      SELECT make_timestamp(CAST((floor(epoch(ts) / 1800) - 1) * 1800 * 1000000 AS BIGINT))
               AS w_start, value
      FROM events
    )
    SELECT strftime(w_start, '%Y-%m-%d %H:%M:%S') AS window_start,
           COUNT(*) AS n_events,
           CAST(CAST(SUM(CAST(value AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) AS total_value
    FROM assigned
    GROUP BY w_start
    """,
)
def sliding_window_1h_30m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding windows (1 h length, 30 min slide): every event lands in
    exactly two windows. The oracle assigns both window starts
    arithmetically (epoch-aligned, as Spark does)."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour", "30 minutes"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum(F.col("value")).alias("total_value"),
        )
        .select(
            ts_str(F.col("window.start")).alias("window_start"),
            "n_events",
            "total_value",
        )
    )


@query(
    "session_window_5m_gap",
    oracle="""
    WITH ordered AS (
      SELECT user_id, ts, value, event_id,
             CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       >= INTERVAL 5 MINUTE
                  OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS is_new
      FROM events
    ),
    sessions AS (
      SELECT user_id, ts, value, event_id,
             SUM(is_new) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS session_no
      FROM ordered
    )
    SELECT user_id,
           strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           COUNT(*) AS n_events,
           CAST(CAST(SUM(CAST(value AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) AS total_value
    FROM sessions
    GROUP BY user_id, session_no
    """,
)
def session_window_5m_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows (5-minute inactivity gap) per user —
    F.session_window; the oracle is the classic gaps-and-islands
    rewrite. Spark sessions are half-open [first, last+gap): an event
    exactly `gap` after its predecessor starts a NEW session, hence
    `>= INTERVAL 5 MINUTE` in the oracle."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy("user_id", F.session_window("ts", "5 minutes"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum(F.col("value")).alias("total_value"),
        )
        .select(
            "user_id",
            ts_str(F.col("session_window.start")).alias("session_start"),
            "n_events",
            "total_value",
        )
    )


@query(
    "json_props_extraction",
    oracle="""
    SELECT json_extract_string(props, '$.k')::BIGINT % 10 AS k_bucket,
           COUNT(*) AS n_events,
           CAST(CAST(SUM(CAST(value AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) AS total_value
    FROM events
    GROUP BY json_extract_string(props, '$.k')::BIGINT % 10
    """,
)
def json_props_extraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured projection: JSON payload column → typed value
    (FIXTURES.md flags props for from_json exercises)."""
    e = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return (
        e.groupBy((k % 10).alias("k_bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum(F.col("value")).alias("total_value"),
        )
    )


@query(
    "event_type_stats",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n_events,
           COUNT(DISTINCT user_id) AS n_users,
           CAST(CAST(SUM(CAST(value AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) AS total_value,
           CAST(CAST(SUM(CAST(value AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) / COUNT(*) AS avg_value
    FROM events
    GROUP BY event_type
    """,
)
def event_type_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
        dsum(F.col("value")).alias("total_value"),
        (dsum(F.col("value")) / F.count(F.lit(1))).alias("avg_value"),
    )


@query(
    "first_write_wins_dedup",
    oracle="""
    SELECT user_id, event_type,
           strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS first_ts,
           min_by(event_id, ts) AS first_event_id,
           COUNT(*) AS n_total
    FROM events
    GROUP BY user_id, event_type
    """,
)
def first_write_wins_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-write-wins per key — the reference's late/updated-data
    policy (SURVEY.md §2 row 40: first insert wins, later identical
    keys are skipped), as a deterministic min-by aggregation."""
    e = load_table(spark, sf_dir, "events")
    return e.groupBy("user_id", "event_type").agg(
        ts_str(F.min("ts")).alias("first_ts"),
        F.min_by("event_id", "ts").alias("first_event_id"),
        F.count(F.lit(1)).alias("n_total"),
    )
