"""User-journey analytics over the events stream: ordered-sequence
funnels and cohort retention — the two queries every event pipeline
answers at scale (the MATCH_RECOGNIZE / product-analytics surface,
expressed as plain keyed aggregates).

``funnel_view_click_purchase`` is strict-order sequence matching:
first view, first click AFTER that view, first purchase AFTER that
click — three cascading per-user min aggregates (the standard
distributed funnel plan: each step is one (user) partial agg + one
keyed join; no per-user event arrays are ever collected, so a user
with millions of events costs the same as one with three).
``cohort_weekly_retention`` buckets activity into integer epoch-weeks
(floor(epoch_us / 7d) — pure integer division, engine-neutral; no
calendar week-start semantics to disagree on), assigns each user to
their first-week cohort, and counts surviving users per (cohort,
weeks-since) cell.

Timestamps are compared as epoch MICROSECOND longs on both engines
(unix_micros / epoch_us under the UTC session), so every comparison,
difference, and bucket is integer-exact and the rows hash-pin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from jobminer_spark.registry import query
from jobminer_spark.sources import load_table

FUNNEL_SPAN_US = 6 * 3600 * 1_000_000  # full journey within 6 hours
_WEEK_US = 7 * 86400 * 1_000_000


def _events_us(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        # ts loads as TIMESTAMP_NTZ; the cast lands in the UTC session
        # zone, so unix_micros == DuckDB's epoch_us on the naive value
        F.unix_micros(F.col("ts").cast("timestamp")).alias("tus"),
    )


@query(
    "funnel_view_click_purchase",
    oracle=f"""
    WITH ev AS (SELECT user_id, event_type, epoch_us(ts) AS tus FROM events),
    v AS (
      SELECT user_id, MIN(tus) AS t1 FROM ev
      WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
      SELECT e.user_id, MIN(e.tus) AS t2, MIN(v.t1) AS t1
      FROM ev e JOIN v ON v.user_id = e.user_id
      WHERE e.event_type = 'click' AND e.tus > v.t1
      GROUP BY e.user_id
    ),
    p AS (
      SELECT e.user_id, MIN(e.tus) AS t3, MIN(c.t1) AS t1
      FROM ev e JOIN c ON c.user_id = e.user_id
      WHERE e.event_type = 'purchase' AND e.tus > c.t2
      GROUP BY e.user_id
    )
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM v) AS n_view,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM c) AS n_click,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM p) AS n_purchase,
           (SELECT CAST(COUNT(CASE WHEN t3 - t1 <= {FUNNEL_SPAN_US} THEN 1 END)
                   AS BIGINT) FROM p) AS n_purchase_within_6h
    """,
)
def funnel_view_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strict-order funnel counts: users whose events contain
    view → (later) click → (later) purchase, plus how many completed
    the whole journey within 6 hours of the first view. Each stage's
    anchor is the EARLIEST qualifying event, the standard funnel
    convention."""
    return funnel_counts(_events_us(spark, sf_dir))


def funnel_stages(ev: DataFrame) -> DataFrame:
    """(user_id, t1, t2, t3): per-user stage anchors over a
    (user_id, event_type, tus) frame — strictly-after chaining (equal
    timestamps do NOT advance a stage), earliest-qualifying anchors;
    t2/t3 NULL for users whose journey stops earlier. Anchored on
    users with at least one view."""
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("tus").alias("t1"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("tus") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("tus").alias("t2"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("tus") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("tus").alias("t3"))
    )
    return v.join(c, "user_id", "left").join(p, "user_id", "left")


def funnel_counts(ev: DataFrame, span_us: int = FUNNEL_SPAN_US) -> DataFrame:
    """Stage counts + span-gated completions from the stage frame."""
    return funnel_stages(ev).agg(
        F.count(F.lit(1)).alias("n_view"),
        F.count("t2").alias("n_click"),
        F.count("t3").alias("n_purchase"),
        F.count(
            F.when(F.col("t3") - F.col("t1") <= span_us, 1)
        ).alias("n_purchase_within_6h"),
    )


@query(
    "cohort_weekly_retention",
    oracle=f"""
    WITH act AS (
      SELECT DISTINCT user_id, epoch_us(ts) // {_WEEK_US} AS w FROM events
    ),
    first AS (SELECT user_id, MIN(w) AS c FROM act GROUP BY user_id)
    SELECT f.c AS cohort_week, a.w - f.c AS k,
           CAST(COUNT(*) AS BIGINT) AS n_users
    FROM act a JOIN first f ON f.user_id = a.user_id
    GROUP BY f.c, a.w - f.c
    """,
)
def cohort_weekly_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retention triangle: users grouped by their first active
    epoch-week (cohort), counted in each later week they reappear —
    (cohort_week, k weeks since, n_users). The (user, week) activity
    set is deduped first, so the count is users, not events; two
    narrow (user) shuffles end to end."""
    ev = _events_us(spark, sf_dir)
    act = ev.select(
        "user_id", F.expr(f"tus div {_WEEK_US}").alias("w")
    ).distinct()
    first = act.groupBy("user_id").agg(F.min("w").alias("c"))
    return (
        act.join(first, "user_id")
        .groupBy(
            F.col("c").alias("cohort_week"),
            (F.col("w") - F.col("c")).alias("k"),
        )
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


_PATH_GAP_US = 300 * 1_000_000  # 5-minute inactivity gap, same as the
                                # session-window family


@query(
    "session_path_topk",
    oracle=f"""
    WITH ev AS (
      SELECT user_id, event_id, epoch_us(ts) AS tus, event_type FROM events
    ),
    flg AS (
      SELECT user_id, event_id, tus, event_type,
             CASE WHEN LAG(tus) OVER w IS NULL
                    OR tus - LAG(tus) OVER w > {_PATH_GAP_US}
                  THEN 1 ELSE 0 END AS ns
      FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY tus, event_id)
    ),
    sess AS (
      SELECT user_id, event_id, tus, event_type,
             SUM(ns) OVER (PARTITION BY user_id ORDER BY tus, event_id
                           ROWS UNBOUNDED PRECEDING) AS sid
      FROM flg
    ),
    paths AS (
      SELECT user_id, sid,
             string_agg(event_type, '>' ORDER BY tus, event_id) AS path
      FROM sess GROUP BY user_id, sid
    )
    SELECT path, CAST(COUNT(*) AS BIGINT) AS n_sessions
    FROM paths GROUP BY path
    ORDER BY COUNT(*) DESC, path LIMIT 20
    """,
)
def session_path_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Path analysis: the 20 most common within-session event-type
    sequences (sessions split on a 5-minute inactivity gap via
    lag + running-sum — the batch twin of the session-window family).
    The ordered path string is built from an in-row sort of the
    session's (tus, event_id, type) triples, so the sequence — and
    therefore the hash — is total-ordered and parallelism-proof.
    Scale shape: one (user_id) window pass (lag and the running sum
    share the sort), one (user, session) aggregation, one bounded
    top-20."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("tus"),
        "event_type",
    )
    w = W.partitionBy("user_id").orderBy("tus", "event_id")
    flagged = ev.withColumn(
        "ns",
        F.when(
            F.lag("tus").over(w).isNull()
            | (F.col("tus") - F.lag("tus").over(w) > _PATH_GAP_US),
            1,
        ).otherwise(0),
    )
    sess = flagged.withColumn(
        "sid",
        F.sum("ns").over(w.rowsBetween(W.unboundedPreceding, W.currentRow)),
    )
    paths = sess.groupBy("user_id", "sid").agg(
        F.concat_ws(
            ">",
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct("tus", "event_id", F.col("event_type").alias("t"))
                    )
                ),
                lambda p: p["t"],
            ),
        ).alias("path")
    )
    return (
        paths.groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_sessions"))
        .orderBy(F.col("n_sessions").desc(), "path")
        .limit(20)
    )
