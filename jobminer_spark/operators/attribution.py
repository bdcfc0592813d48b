"""Touch attribution — credit each conversion (purchase) to the
engagement events that preceded it: LAST-touch (the event nearest the
purchase) and FIRST-touch (the opening of the attribution window),
the two canonical single-touch models every marketing/product
pipeline reports. Distinct from the funnel family (journeys.py
counts users completing stage sequences; attribution labels each
individual conversion with its credited touch) and from the as-of
join (temporal.py carries the latest value forward; attribution needs
BOTH ends of the lookback window and an eligibility filter).

Model: for each purchase, eligible touches are the same user's click
and view events in the 24 h before (exclusive of) the purchase; the
last touch is the max (tus, event_id) eligible pair, the first touch
the min. Purchases with no eligible touch report NULLs (organic
conversions — stated, not dropped).

Scale shape: ONE inequality join bounded by the 24 h band (the
interval-join shape temporal.py already pins: per-user hash join plus
a time-band predicate, never a cartesian), then one per-purchase
min/max struct aggregation — no windows over the full stream, no
collected per-user histories.

Determinism: epoch-microsecond longs, (tus, event_id) lexicographic
struct extremes on both engines (the timegrid r9-ADVICE tie-break
recipe), event-type strings compared exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from jobminer_spark.registry import query
from jobminer_spark.sources import load_table

_WINDOW_US = 24 * 3600 * 1_000_000  # 24 h lookback


@query(
    "purchase_touch_attribution",
    oracle=f"""
    WITH ev AS (
      SELECT user_id, event_id, event_type, epoch_us(ts) AS tus
      FROM events
    ),
    purchases AS (
      SELECT user_id, event_id AS purchase_id, tus AS ptus
      FROM ev WHERE event_type = 'purchase'
    ),
    touches AS (
      SELECT user_id, event_id, event_type, tus
      FROM ev WHERE event_type IN ('click', 'view')
    ),
    joined AS (
      SELECT p.purchase_id, p.user_id,
             t.event_id, t.event_type, t.tus
      FROM purchases p
      JOIN touches t
        ON t.user_id = p.user_id
       AND t.tus < p.ptus
       AND t.tus >= p.ptus - {_WINDOW_US}
    ),
    agg AS (
      SELECT purchase_id, user_id,
             MAX({{'tus': tus, 'eid': event_id, 'et': event_type}}) AS lt,
             MIN({{'tus': tus, 'eid': event_id, 'et': event_type}}) AS ft,
             COUNT(*) AS n_touches
      FROM joined GROUP BY purchase_id, user_id
    )
    SELECT p.purchase_id, p.user_id,
           a.lt.eid AS last_touch_id, a.lt.et AS last_touch_type,
           a.ft.eid AS first_touch_id, a.ft.et AS first_touch_type,
           COALESCE(a.n_touches, 0) AS n_touches
    FROM purchases p LEFT JOIN agg a ON a.purchase_id = p.purchase_id
    """,
)
def purchase_touch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every purchase labeled with its first- and last-touch event
    (id + type) inside the 24 h lookback, plus the eligible touch
    count; organic conversions keep NULL touches. Row-exact against
    the oracle's identical band join + struct-extreme rewrite."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "event_type",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("tus"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        F.col("tus").alias("ptus"),
    )
    touches = ev.filter(F.col("event_type").isin("click", "view")).select(
        F.col("user_id").alias("t_user"),
        F.col("event_id").alias("t_eid"),
        F.col("event_type").alias("t_type"),
        F.col("tus").alias("t_tus"),
    )
    joined = purchases.join(
        touches,
        (F.col("t_user") == F.col("user_id"))
        & (F.col("t_tus") < F.col("ptus"))
        & (F.col("t_tus") >= F.col("ptus") - _WINDOW_US),
    )
    agg = joined.groupBy("purchase_id").agg(
        F.max(F.struct(F.col("t_tus"), F.col("t_eid"), F.col("t_type"))).alias(
            "lt"
        ),
        F.min(F.struct(F.col("t_tus"), F.col("t_eid"), F.col("t_type"))).alias(
            "ft"
        ),
        F.count(F.lit(1)).alias("n_touches"),
    )
    return purchases.join(agg, "purchase_id", "left").select(
        "purchase_id",
        "user_id",
        F.col("lt.t_eid").alias("last_touch_id"),
        F.col("lt.t_type").alias("last_touch_type"),
        F.col("ft.t_eid").alias("first_touch_id"),
        F.col("ft.t_type").alias("first_touch_type"),
        F.coalesce(F.col("n_touches"), F.lit(0)).cast("long").alias("n_touches"),
    )
