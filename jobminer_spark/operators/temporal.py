"""Temporal join operators the reference lacks but a time-series /
event pipeline needs: as-of join and range-band join over `events`.

SURVEY.md §2.4 records that the reference has only equi and
containment joins (`/root/reference/JobScraper/scraper.py:20-24`,
`pracuj_scraper.py:183-197`); as-of and range joins are engine
extensions, implemented Spark-first:

- **as-of join**: NOT a per-row subquery and NOT a range cross join.
  Union the two event streams, tag each side, then one window pass
  per user (`last(..., ignorenulls)` over rows-preceding) carries the
  latest left-side row forward onto every right-side row. One shuffle
  on user_id, linear in events — the 100 TB shape (a sort-merge range
  join would shuffle the same data but O(n·m) per key on hot users).
- **range-band join**: fact × tiny band dimension on a non-equi
  predicate → broadcast nested-loop join, the right physical plan for
  a bounded dimension; at 100 TB the fact side never shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from jobminer_spark.data.skill_dictionary import values_df
from jobminer_spark.operators.common import dsum
from jobminer_spark.registry import query
from jobminer_spark.sources import load_table


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts: str = "ts",
    value_cols: list[str] | None = None,
) -> DataFrame:
    """Generic as-of join: every `left` row gets the latest `right`
    row with `right.ts <= left.ts` for the same `on` key (NULL-padded
    when none exists). Union + tag + one carry-forward window pass —
    one shuffle on the key, linear in rows, no range cross join.

    `value_cols` are the right-side columns to carry (default: all
    except the key and timestamp); they land prefixed `asof_`.

    All value columns are carried as ONE struct through a single
    `last(..., ignorenulls=True)`: the struct wrapping a right row is
    never NULL even when individual fields are, so the output always
    reflects exactly one right-side row — per-column carries would let
    a NULL field fall through to an *older* right row, stitching
    columns from different matches.
    """
    value_cols = value_cols or [c for c in right.columns if c not in (on, ts)]
    asof_type = StructType([right.schema[c] for c in value_cols])
    r = right.select(
        F.col(on),
        F.col(ts),
        F.lit(0).alias("_side"),
        F.struct(*[F.col(c) for c in value_cols]).alias("_asof"),
        *[
            F.lit(None).cast(dict(left.dtypes)[c]).alias(c)
            for c in left.columns
            if c not in (on, ts)
        ],
    )
    l = left.select(
        F.col(on),
        F.col(ts),
        F.lit(1).alias("_side"),
        F.lit(None).cast(asof_type).alias("_asof"),
        *[F.col(c) for c in left.columns if c not in (on, ts)],
    )
    w = (
        W.partitionBy(on)
        .orderBy(ts, "_side")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    carried = r.unionByName(l).withColumn(
        "_carry", F.last("_asof", ignorenulls=True).over(w)
    )
    return carried.filter(F.col("_side") == 1).select(
        on,
        ts,
        *[F.col(c) for c in left.columns if c not in (on, ts)],
        *[F.col(f"_carry.{c}").alias(f"asof_{c}") for c in value_cols],
    )


@query(
    "asof_join_last_click_before_purchase",
    oracle="""
    SELECT p.event_id,
           p.user_id,
           CAST(p.ts AS VARCHAR) AS purchase_ts,
           COALESCE(c.event_id, -1) AS click_event_id,
           COALESCE(CAST(c.ts AS VARCHAR), '') AS click_ts
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
)
def asof_join_last_click_before_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For every purchase, the latest click at-or-before it for the
    same user (attribution's canonical as-of join). Left join
    semantics: purchases with no prior click survive, with sentinel
    -1/'' instead of NULL (NULL-vs-NaN round-trips differ across the
    oracle's pandas boundary; sentinels hash identically).

    Implementation: union-and-carry-forward. Clicks sort before
    purchases at equal ts (side=0 < 1) so ts-equality matches, like
    the oracle's `>=`. The fixture has no duplicate (user_id, ts)
    pairs, so `last()` is deterministic.
    """
    e = load_table(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id",
        "ts",
        F.col("event_id").alias("click_event_id"),
        F.col("ts").alias("click_ts"),
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id"
    )
    joined = asof_join(purchases, clicks, on="user_id")
    return joined.select(
        "event_id",
        "user_id",
        F.col("ts").cast("string").alias("purchase_ts"),
        F.coalesce(F.col("asof_click_event_id"), F.lit(-1)).alias("click_event_id"),
        F.coalesce(F.col("asof_click_ts").cast("string"), F.lit("")).alias("click_ts"),
    )


_BANDS = [
    ("p0000_0050", 0.0, 50.0),
    ("p0050_0100", 50.0, 100.0),
    ("p0100_0200", 100.0, 200.0),
    ("p0200_0350", 200.0, 350.0),
    ("p0350_0500", 350.0, 500.0),
]


@query(
    "range_band_join_event_values",
    oracle="""
    WITH bands(band, lo, hi) AS (VALUES
      ('p0000_0050', 0.0, 50.0),
      ('p0050_0100', 50.0, 100.0),
      ('p0100_0200', 100.0, 200.0),
      ('p0200_0350', 200.0, 350.0),
      ('p0350_0500', 350.0, 500.0))
    SELECT band,
           COUNT(*) AS n_events,
           CAST(CAST(SUM(CAST(value AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) AS total_value
    FROM events JOIN bands ON value >= lo AND value < hi
    GROUP BY band
    """,
)
def range_band_join_event_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-equi range join of the event stream against a broadcast
    band dimension (inner: out-of-range values drop, as in the
    oracle). The bands are a VALUES LocalRelation — JVM-only,
    broadcastable, no Python-RDD scan."""
    e = load_table(spark, sf_dir, "events")
    bands = values_df(spark, _BANDS, ["band", "lo", "hi"])
    return (
        e.join(
            F.broadcast(bands),
            (F.col("value") >= F.col("lo")) & (F.col("value") < F.col("hi")),
        )
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum(F.col("value")).alias("total_value"),
        )
    )


@query(
    "interval_join_clicks_before_purchase",
    oracle="""
    SELECT p.event_id AS purchase_id,
           c.event_id AS click_id,
           p.user_id,
           CAST(p.ts AS VARCHAR) AS purchase_ts,
           CAST(c.ts AS VARCHAR) AS click_ts
    FROM events p JOIN events c
      ON p.user_id = c.user_id
     AND p.event_type = 'purchase' AND c.event_type = 'click'
     AND c.ts >= p.ts - INTERVAL 60 MINUTE AND c.ts <= p.ts
    """,
)
def interval_join_clicks_before_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ALL clicks in the hour before each purchase (vs the as-of
    join's latest-only): an equi key (user_id) plus a bounded time
    range. The equi component keeps this a hash/sort-merge join on
    user_id with the range as a post-join residual — never a
    cross join — and the bounded interval is what makes the
    STREAMING twin's state finite (streaming/windows.py
    interval_join_stream, watermark + time-bound state cleanup)."""
    e = load_table(spark, sf_dir, "events")
    p = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("p_ts"),
    )
    c = e.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
    )
    return (
        p.join(
            c,
            (F.col("user_id") == F.col("c_user"))
            & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 60 MINUTES"))
            & (F.col("c_ts") <= F.col("p_ts")),
        )
        .select(
            "purchase_id",
            "click_id",
            "user_id",
            F.col("p_ts").cast("string").alias("purchase_ts"),
            F.col("c_ts").cast("string").alias("click_ts"),
        )
    )
