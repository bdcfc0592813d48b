"""Slowly-changing-dimension (SCD Type 2) history building from a
change stream — the warehouse-side operator every event pipeline
eventually needs: turn "user's attribute was set to X at time T"
events into versioned validity intervals.

``scd2_user_attribute_history`` treats each event's ``props.k`` as
the user's current attribute value and emits one row per VALUE RUN:
consecutive events carrying the same value collapse (SCD2 records
changes, not observations), ``valid_from`` is the first event of the
run, ``valid_to`` is the start of the next run (NULL while current).
A missing attribute is a VALUE (a NULL run): change detection is
null-safe on both engines (``IS DISTINCT FROM`` / ``eqNullSafe``)
with an explicit first-row flag, so transitions to/from/within
missing values segment exactly like any other — a plain ``<>``
comparison would silently drop transitions to NULL and duplicate
every run after one.

Scale shape: two window passes over the SAME (user_id, ts, event_id)
partitioning-and-order — Catalyst reuses one sort/exchange for both
lag() (change detection) and lead() (interval close), so the whole
operator is ONE shuffle on user_id. Timestamps are compared and
emitted as epoch-microsecond longs (engine-neutral integers); the
(ts, event_id) tiebreak makes the run segmentation total-ordered and
therefore deterministic under any parallelism.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from jobminer_spark.registry import query
from jobminer_spark.sources import load_table


def scd2_history(ev: DataFrame, keep_event_id: bool = False) -> DataFrame:
    """The SCD2 kernel over a (user_id, event_id, tus, k) change
    frame: null-safe run segmentation + interval stitching. With
    ``keep_event_id`` the run-opening event's id rides along as
    ``first_event_id`` — the provenance column the INCREMENTAL
    maintenance path needs to replay stored runs as pseudo-events
    with an exact (tus, event_id) tiebreak."""
    w = W.partitionBy("user_id").orderBy("tus", "event_id")
    runs = ev.withColumn(
        "is_change",
        F.when(
            (F.row_number().over(w) == 1)
            | ~F.lag("k").over(w).eqNullSafe(F.col("k")),
            1,
        ).otherwise(0),
    ).filter(F.col("is_change") == 1)
    w2 = W.partitionBy("user_id").orderBy("tus", "event_id")
    extra = [F.col("event_id").alias("first_event_id")] if keep_event_id else []
    return runs.select(
        "user_id",
        F.col("k").alias("attr_value"),
        F.col("tus").alias("valid_from"),
        F.lead("tus").over(w2).alias("valid_to"),
        F.when(F.lead("tus").over(w2).isNull(), 1)
        .otherwise(0)
        .cast("long")
        .alias("is_current"),
        *extra,
    )


def _events_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("tus"),
        F.get_json_object("props", "$.k").cast("long").alias("k"),
    )


@query(
    "scd2_user_attribute_history",
    oracle="""
    WITH ev AS (
      SELECT user_id, event_id, epoch_us(ts) AS tus,
             CAST(json_extract(props, '$.k') AS BIGINT) AS k
      FROM events
    ),
    flagged AS (
      SELECT user_id, event_id, tus, k,
             CASE WHEN ROW_NUMBER() OVER w = 1
                    OR (LAG(k) OVER w IS DISTINCT FROM k)
                  THEN 1 ELSE 0 END AS is_change
      FROM ev
      WINDOW w AS (PARTITION BY user_id ORDER BY tus, event_id)
    ),
    runs AS (SELECT user_id, event_id, tus, k FROM flagged WHERE is_change = 1)
    SELECT user_id, k AS attr_value, tus AS valid_from,
           LEAD(tus) OVER (PARTITION BY user_id ORDER BY tus, event_id)
             AS valid_to,
           CAST(CASE WHEN LEAD(tus) OVER (PARTITION BY user_id
                                          ORDER BY tus, event_id) IS NULL
                     THEN 1 ELSE 0 END AS BIGINT) AS is_current
    FROM runs
    """,
)
def scd2_user_attribute_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Versioned (user_id, attr_value, valid_from, valid_to,
    is_current) intervals from the events change stream — the oracle
    recomputes run segmentation and interval stitching with the same
    total order and null-safe comparison, so a drift in either window
    pass turns this red."""
    return scd2_history(_events_frame(spark, sf_dir))


# Incremental-maintenance batch boundary: 2024-01-25T00:00:00Z. Every
# fixture SF spans 2024-01-01..-30, so ~5/6 of events form the stored
# base and the rest arrive as "today's" batch at any scale factor.
SCD_CUTOFF_US = 1_706_140_800_000_000


def scd2_incremental(stored: DataFrame, batch: DataFrame) -> DataFrame:
    """Apply a batch of new change events to a stored SCD2 run table
    (with first_event_id provenance) WITHOUT touching untouched
    users' history: stored runs of touched users replay as
    pseudo-events and re-segment together with the batch. Assumes
    batch events are not earlier than the stored history they extend
    (event-time batches)."""
    touched = batch.select("user_id").distinct()
    untouched = stored.join(touched, "user_id", "left_anti")
    pseudo = stored.join(touched, "user_id").select(
        "user_id",
        F.col("first_event_id").alias("event_id"),
        F.col("valid_from").alias("tus"),
        F.col("attr_value").alias("k"),
    )
    merged = pseudo.unionByName(
        batch.select("user_id", "event_id", "tus", "k")
    )
    return untouched.unionByName(scd2_history(merged, keep_event_id=True))


@query(
    "scd2_incremental_update_audit",
    oracle=f"""
    WITH ev AS (
      SELECT user_id, event_id, epoch_us(ts) AS tus,
             CAST(json_extract(props, '$.k') AS BIGINT) AS k
      FROM events
    ),
    flagged AS (
      SELECT user_id,
             CASE WHEN ROW_NUMBER() OVER w = 1
                    OR (LAG(k) OVER w IS DISTINCT FROM k)
                  THEN 1 ELSE 0 END AS is_change
      FROM ev
      WINDOW w AS (PARTITION BY user_id ORDER BY tus, event_id)
    )
    SELECT
      (SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) FROM ev
       WHERE tus >= {SCD_CUTOFF_US}) AS n_touched_users,
      (SELECT CAST(COUNT(*) AS BIGINT) FROM flagged WHERE is_change = 1)
        AS n_runs_full,
      CAST(0 AS BIGINT) AS n_mismatch
    """,
)
def scd2_incremental_update_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental SCD2 maintenance == full rebuild, made a driver
    row (the warehouse analogue of incremental_index_update_audit):
    events before the cutoff form the STORED run table; the batch's
    touched users are recomputed from (stored runs replayed as
    pseudo-events via first_event_id provenance) + their new events
    ONLY — consecutive survivors always differ, so replaying
    survivors reproduces the original segmentation, and a batch value
    equal to a user's last stored value collapses into the stored run
    exactly as the full rebuild does. Untouched users' rows pass
    through untouched. The audit full-outer-joins the incremental
    result against the full rebuild on (user_id, valid_from) and
    null-safely compares every column; the oracle independently
    counts touched users and total runs and expects ZERO mismatches.

    Scale shape: the incremental path's window passes run over
    touched users' runs + the batch (O(batch + touched runs)), never
    the full history; the full rebuild exists only because this is an
    audit."""
    ev = _events_frame(spark, sf_dir)
    base = ev.filter(F.col("tus") < SCD_CUTOFF_US)
    batch = ev.filter(F.col("tus") >= SCD_CUTOFF_US)
    stored = scd2_history(base, keep_event_id=True).localCheckpoint(eager=True)
    incremental = scd2_incremental(stored, batch)
    # materialized once: both the comparison join and the n_runs_full
    # aggregate read it (crossJoined aggregates are independent
    # subtrees — without the cut the full-history window pass would
    # run twice)
    full = scd2_history(ev, keep_event_id=True).localCheckpoint(eager=True)
    i, f = incremental.alias("i"), full.alias("f")
    j = i.join(
        f,
        (F.col("i.user_id") == F.col("f.user_id"))
        & (F.col("i.valid_from") == F.col("f.valid_from")),
        "full_outer",
    )
    mismatch = ~(
        F.col("i.attr_value").eqNullSafe(F.col("f.attr_value"))
        & F.col("i.valid_to").eqNullSafe(F.col("f.valid_to"))
        & F.col("i.is_current").eqNullSafe(F.col("f.is_current"))
        & F.col("i.first_event_id").eqNullSafe(F.col("f.first_event_id"))
    )
    return (
        batch.select("user_id")
        .distinct()
        .agg(F.count(F.lit(1)).alias("n_touched_users"))
        .crossJoin(F.broadcast(full.agg(F.count(F.lit(1)).alias("n_runs_full"))))
        .crossJoin(
            F.broadcast(
                j.agg(F.count(F.when(mismatch, 1)).alias("n_mismatch"))
            )
        )
    )
