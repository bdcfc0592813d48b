"""Dynamic-gap sessionization — ``session_window`` with a PER-EVENT
gap expression (Spark 3.2+ API surface the fixed-gap family doesn't
touch): a purchase keeps the session alive for 30 minutes, any other
event for 10 — the "checkout grace period" semantics real funnels
use (reference analog: SURVEY §2 row 42's session windows, gap
generalized from a constant to an event-type function).

Semantics pinned by the oracle as the union-of-ranges definition
with CLOSED ranges: each event spans [t, t + gap(event)] — an event
at EXACTLY the previous end still merges (verified against Spark's
native behavior by the adversarial boundary test in
test_properties.py; the half-open reading would break there) — and
a session breaks exactly when the next event's start lies strictly
past the RUNNING MAX of all previous events' ends (running max, not
lag — a long-gap event can outlast several short-gap successors).
The SQL twin computes that break column with one cumulative-max
window over epoch-microsecond longs, so hash parity proves Spark's
native session merge implements the same definition.

Scale shape: one (user_id) keyed sort shared by the break detection
(native side: Spark's session_window aggregation, same exchange);
the per-session aggregation is a narrow second pass. Identical to
the fixed-gap family's budget.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from jobminer_spark.registry import query
from jobminer_spark.sources import load_table

_GAP_DEFAULT_US = 10 * 60 * 1_000_000
_GAP_PURCHASE_US = 30 * 60 * 1_000_000


@query(
    "dynamic_gap_sessions",
    oracle=f"""
    WITH ev AS (
      SELECT user_id, event_id, epoch_us(ts) AS tus,
             CASE WHEN event_type = 'purchase'
                  THEN {_GAP_PURCHASE_US} ELSE {_GAP_DEFAULT_US}
             END AS gap_us
      FROM events
    ),
    marked AS (
      SELECT user_id, event_id, tus,
             CASE WHEN MAX(tus + gap_us) OVER w IS NULL THEN 1
                  WHEN tus > MAX(tus + gap_us) OVER w THEN 1
                  ELSE 0 END AS brk
      FROM ev
      WINDOW w AS (
        PARTITION BY user_id ORDER BY tus, event_id
        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
      )
    ),
    sess AS (
      -- the running sum MUST keep the (tus, event_id) total order:
      -- on a (user, tus) tie the break row's frame position would
      -- otherwise be engine-dependent (unique-tiebreak discipline)
      SELECT user_id, tus,
             SUM(brk) OVER (
               PARTITION BY user_id ORDER BY tus, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS sid
      FROM marked
    )
    SELECT user_id, MIN(tus) AS session_start_us,
           COUNT(*) AS n_events
    FROM sess GROUP BY user_id, sid
    """,
)
def dynamic_gap_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user sessions under the event-type-dependent gap, computed
    with Spark's NATIVE dynamic session_window (the gap argument is a
    column expression) and emitted as epoch-long session starts +
    event counts — the oracle re-derives the same sessions from the
    union-of-ranges definition, so the native merge logic itself is
    what the hash pins."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.col("ts").cast("timestamp").alias("ts"),
        "event_type",
    )
    gap = F.when(
        F.col("event_type") == "purchase", F.lit("30 minutes")
    ).otherwise(F.lit("10 minutes"))
    return (
        ev.groupBy("user_id", F.session_window("ts", gap))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.unix_micros(F.col("session_window.start")).alias(
                "session_start_us"
            ),
            "n_events",
        )
    )


@query(
    "stream_dyngap_session_parity",
    oracle="""
    SELECT
      (SELECT COUNT(*) FROM (
        SELECT DISTINCT user_id FROM events)) AS n_users,
      CAST(0 AS BIGINT) AS n_mismatch
    """,
)
def stream_dyngap_session_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dynamic-gap sessions drained through Structured Streaming
    (state-store session merge) full-outer-joined against the batch
    computation of the SAME definition: every (user, session_start)
    present on both sides with equal event counts, summarized per
    user so the audit row count is user-bounded. Zero mismatches
    oracle-expected; the infinite-watermark replay discipline makes
    the result batching-independent (VERDICT r8 item 1).

    Import discipline: the streaming drain is imported inside the
    body (see audits.py)."""
    from jobminer_spark.streaming.windows import (
        run_streaming_dynamic_gap_sessions,
    )

    s = run_streaming_dynamic_gap_sessions(spark, sf_dir).select(
        "user_id",
        "session_start_us",
        F.col("n_events").alias("s_n"),
    )
    b = dynamic_gap_sessions(spark, sf_dir).select(
        "user_id",
        "session_start_us",
        F.col("n_events").alias("b_n"),
    )
    j = b.join(s, ["user_id", "session_start_us"], "full_outer")
    per_user = j.groupBy("user_id").agg(
        F.count(
            F.when(~F.col("b_n").eqNullSafe(F.col("s_n")), 1)
        ).alias("n_bad")
    )
    return per_user.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum(F.when(F.col("n_bad") > 0, 1).otherwise(0))
        .cast("long")
        .alias("n_mismatch"),
    )
