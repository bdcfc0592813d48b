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


def scd2_history(ev: DataFrame) -> DataFrame:
    """The SCD2 kernel over a (user_id, event_id, tus, k) change
    frame: null-safe run segmentation + interval stitching."""
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
    return runs.select(
        "user_id",
        F.col("k").alias("attr_value"),
        F.col("tus").alias("valid_from"),
        F.lead("tus").over(w2).alias("valid_to"),
        F.when(F.lead("tus").over(w2).isNull(), 1)
        .otherwise(0)
        .cast("long")
        .alias("is_current"),
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
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("tus"),
        F.get_json_object("props", "$.k").cast("long").alias("k"),
    )
    return scd2_history(ev)
