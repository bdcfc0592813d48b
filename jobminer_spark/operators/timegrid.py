"""Time-grid operators over the events stream: gap-filling
resampling and trailing time-range windows — the two time-series
primitives every metrics/feature pipeline needs that the tumbling/
sliding/session window family can't express (a window aggregates
events that EXIST; resampling materializes the grid points that
DON'T, and a trailing range window is per-event, not per-bucket).

Scale shape: both operators are one keyed shuffle on user_id. The
grid explode is per-user in-row (``sequence``), bounded by the user's
own activity span — never a global calendar cross join — and the
trailing window shares the (user_id, tus) sort with any other
per-user window pass. At 100 TB the plan is unchanged: narrow
per-user state, no driver-side loops, no UDFs.

Determinism: timestamps are epoch-microsecond longs (unix_micros /
epoch_us under UTC, the journeys.py recipe); hour buckets are integer
division; all checksums are floor-quantized-integer sums, so every
row hash-pins across engines.

Reference anchor: the daily idempotent micro-batch re-aggregation
(JobScraper function.json:6) is a 1-day tumbling grid; this module
generalizes it to arbitrary grids with carry-forward semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from jobminer_spark.registry import query
from jobminer_spark.sources import load_table

HOUR_US = 3600 * 1_000_000


def _events_tus(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "event_type",
        "value",
        # ts loads as TIMESTAMP_NTZ; cast lands in the UTC session
        # zone so unix_micros == DuckDB epoch_us on the naive value
        F.unix_micros(F.col("ts").cast("timestamp")).alias("tus"),
    )


@query(
    "resample_hourly_forward_fill",
    oracle=f"""
    WITH ev AS (
      SELECT user_id, event_id, epoch_us(ts) AS tus, value FROM events
    ),
    obs AS (
      SELECT user_id, tus // {HOUR_US} AS hr,
             (MAX({{'tus': tus, 'eid': event_id, 'val': value}})).val
               AS obs_value
      FROM ev GROUP BY user_id, tus // {HOUR_US}
    ),
    spans AS (
      SELECT user_id, MIN(hr) AS h0, MAX(hr) AS h1 FROM obs GROUP BY user_id
    ),
    grid AS (
      SELECT user_id, unnest(generate_series(h0, h1)) AS hr FROM spans
    ),
    filled AS (
      SELECT g.user_id, g.hr, o.obs_value,
             last_value(o.obs_value IGNORE NULLS) OVER (
               PARTITION BY g.user_id ORDER BY g.hr
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS fv
      FROM grid g LEFT JOIN obs o
        ON o.user_id = g.user_id AND o.hr = g.hr
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_hours,
           CAST(COUNT(obs_value) AS BIGINT) AS n_obs_hours,
           CAST(SUM(CAST(FLOOR(fv * 1000000.0) AS BIGINT)) AS BIGINT)
             AS fill_checksum
    FROM filled GROUP BY user_id
    """,
)
def resample_hourly_forward_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user hourly resampling with forward fill: materialize every
    hour in the user's activity span (including hours with NO events)
    and carry the last observed value forward into the gaps. The
    hourly observation is the value of the user's latest event in
    that hour, tie-broken by event_id via lexicographic struct MAX on
    (tus, event_id, value) — identical ordering on both engines, so
    the pin no longer rests on the fixture having no (user, tus)
    duplicates (r9 ADVICE).

    Output is the per-user summary (grid size, observed-hour count,
    quantized checksum of every filled grid value), so the fill
    semantics — not just the grid shape — are hash-pinned."""
    ev = _events_tus(spark, sf_dir)
    hr = F.expr(f"tus div {HOUR_US}")  # integer division, no float detour
    obs = (
        ev.groupBy("user_id", hr.alias("hr"))
        .agg(
            F.max(F.struct("tus", "event_id", "value"))["value"].alias(
                "obs_value"
            )
        )
    )
    grid = (
        obs.groupBy("user_id")
        .agg(F.min("hr").alias("h0"), F.max("hr").alias("h1"))
        .select(
            "user_id",
            F.explode(F.sequence(F.col("h0"), F.col("h1"))).alias("hr"),
        )
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("hr")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    filled = grid.join(obs, ["user_id", "hr"], "left").withColumn(
        "fv", F.last("obs_value", ignorenulls=True).over(w)
    )
    return filled.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_hours"),
        F.count("obs_value").alias("n_obs_hours"),
        F.sum(F.floor(F.col("fv") * F.lit(1000000.0)).cast("long")).alias(
            "fill_checksum"
        ),
    )


@query(
    "trailing_1h_range_totals",
    oracle=f"""
    WITH ev AS (
      SELECT user_id, event_type, epoch_us(ts) AS tus,
             CAST(FLOOR(value * 1000000.0) AS BIGINT) AS vq
      FROM events
    ),
    t AS (
      SELECT event_type,
             SUM(vq) OVER (
               PARTITION BY user_id ORDER BY tus
               RANGE BETWEEN {HOUR_US - 1} PRECEDING AND CURRENT ROW
             ) AS trail_sum,
             COUNT(*) OVER (
               PARTITION BY user_id ORDER BY tus
               RANGE BETWEEN {HOUR_US - 1} PRECEDING AND CURRENT ROW
             ) AS trail_n
      FROM ev
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(trail_sum) AS BIGINT) AS sum_trailing,
           CAST(MAX(trail_n) AS BIGINT) AS max_trailing_n
    FROM t GROUP BY event_type
    """,
)
def trailing_1h_range_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event trailing one-hour totals via a RANGE window frame on
    epoch-microsecond longs — the per-row rolling aggregate (rate
    limiting, burst detection, feature windows) that bucketed windows
    approximate but never equal. Values are floor-quantized to
    integer BEFORE summing, so the window sums are exact on both
    engines; the frame is (tus - 1h, tus], i.e. {HOUR_US - 1}
    microseconds preceding through current, with RANGE-peer semantics
    identical across engines."""
    ev = _events_tus(spark, sf_dir).select(
        "user_id",
        "event_type",
        "tus",
        F.floor(F.col("value") * F.lit(1000000.0)).cast("long").alias("vq"),
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("tus")
        .rangeBetween(-(HOUR_US - 1), W.currentRow)
    )
    t = ev.select(
        "event_type",
        F.sum("vq").over(w).alias("trail_sum"),
        F.count(F.lit(1)).over(w).alias("trail_n"),
    )
    return t.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("trail_sum").alias("sum_trailing"),
        F.max("trail_n").alias("max_trailing_n"),
    )
