"""Data profiling — the ANALYZE side of the engine: the reports an
operator (or an optimizer) reads before picking a physical strategy.
Two primitives:

* **Equi-width value histograms** per group — the distribution report
  dashboards and optimizers want next to the equi-depth NTILE bands
  (reshape.py) and the approximate quantile sketch (trainprep.py).
  Bin edges derive from per-group integer min/max, bin assignment is
  pure integer arithmetic, so every count hash-pins.
* **Hot-key skew detection** — the DETECTION complement of skew.py's
  mitigation (salting, AQE): the top-N hottest join keys with their
  fan-out, plus the skew ratio max·keys / rows as an exact rational.
  This is the number that tells you whether the salted path is needed
  BEFORE the job stalls on one straggler partition.

Scale shape: histograms are two passes over one (group) partial-agg
shuffle (min/max, then binned counts with the per-group edges
broadcast back); the hot-key report is one keyed count agg + a
distributed ``orderBy().limit(N)`` partial top-k (NO global rank
window) + a broadcast 1-row summary join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from jobminer_spark.registry import query
from jobminer_spark.sources import load_table

_VQ = 1000
_N_BINS = 10
_TOP_KEYS = 10


@query(
    "value_histogram_equi_width",
    oracle=f"""
    WITH ev AS (
      SELECT event_type, CAST(FLOOR(value * {_VQ}.0) AS BIGINT) AS vq
      FROM events
    ),
    edges AS (
      SELECT event_type, MIN(vq) AS lo, MAX(vq) AS hi
      FROM ev GROUP BY event_type
    )
    SELECT e.event_type,
           ((e.vq - d.lo) * {_N_BINS}) // (d.hi - d.lo + 1) AS bin,
           CAST(COUNT(*) AS BIGINT) AS n,
           d.lo AS range_lo, d.hi AS range_hi
    FROM ev e JOIN edges d ON d.event_type = e.event_type
    GROUP BY e.event_type, ((e.vq - d.lo) * {_N_BINS}) // (d.hi - d.lo + 1),
             d.lo, d.hi
    """,
)
def value_histogram_equi_width(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10-bin equi-width histogram of the quantized event value per
    event type, with the integer bin edges carried on every row. Bin
    assignment ((vq−lo)·B) div (hi−lo+1) keeps the top value inside
    the last bin with no float boundary anywhere."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.floor(F.col("value") * _VQ).cast("long").alias("vq")
    )
    edges = ev.groupBy("event_type").agg(
        F.min("vq").alias("range_lo"), F.max("vq").alias("range_hi")
    )
    binned = ev.join(F.broadcast(edges), "event_type").select(
        "event_type",
        F.expr(
            f"((vq - range_lo) * {_N_BINS}) div (range_hi - range_lo + 1)"
        ).alias("bin"),
        "range_lo",
        "range_hi",
    )
    return binned.groupBy("event_type", "bin", "range_lo", "range_hi").agg(
        F.count(F.lit(1)).alias("n")
    ).select("event_type", "bin", "n", "range_lo", "range_hi")


@query(
    "hot_key_skew_report",
    oracle=f"""
    WITH counts AS (
      SELECT o_custkey, COUNT(*) AS freq FROM orders GROUP BY o_custkey
    ),
    summary AS (
      SELECT COUNT(*) AS n_keys,
             CAST(SUM(freq) AS BIGINT) AS n_rows,
             MAX(freq) AS max_freq
      FROM counts
    )
    SELECT c.o_custkey, CAST(c.freq AS BIGINT) AS freq,
           s.n_keys, s.n_rows, CAST(s.max_freq AS BIGINT) AS max_freq,
           CAST(s.max_freq * s.n_keys AS BIGINT) AS skew_num,
           s.n_rows AS skew_den
    FROM (SELECT * FROM counts
          ORDER BY freq DESC, o_custkey LIMIT {_TOP_KEYS}) c
    CROSS JOIN summary s
    """,
)
def hot_key_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The N hottest o_custkey join keys with their fan-out, each row
    carrying the global key census and the skew ratio max·keys/rows
    as an exact rational (1 = perfectly uniform; ≫1 = salt or AQE-skew
    territory). Top-N is a distributed orderBy/limit partial top-k
    with the (freq DESC, key) tie-break; the 1-row summary broadcasts.
    """
    counts = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    summary = counts.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("freq").alias("n_rows"),
        F.max("freq").alias("max_freq"),
    )
    top = counts.orderBy(F.col("freq").desc(), "o_custkey").limit(_TOP_KEYS)
    return top.crossJoin(F.broadcast(summary)).select(
        "o_custkey",
        "freq",
        "n_keys",
        "n_rows",
        "max_freq",
        (F.col("max_freq") * F.col("n_keys")).alias("skew_num"),
        F.col("n_rows").alias("skew_den"),
    )
