"""Rolling z-score anomaly detection over the event stream — the
"this value is wildly off its recent baseline" monitor every
ingestion pipeline wants on its metrics (SURVEY.md §2 row 32's
counters turned into a self-calibrating gate; complements the
corpus-global z-gate of embquality.embedding_norm_outliers, which
normalizes against ALL history rather than a trailing baseline).

The whole detector is EXACT INTEGER arithmetic — no mean, no stddev,
no sqrt ever materializes. With x the 1e-3-quantized value and
(n, S, SS) the trailing count/sum/sum-of-squares, the z-test
|x - mu| > z*sigma cross-multiplies into

    (n*x - S)^2  >  z^2 * (n*SS - S^2)

(both sides BIGINT; den = n^2*var >= 0 by Cauchy-Schwarz; a nonzero
deviation from a zero-variance baseline is +infinite z and correctly
fires). Magnitudes: x <= ~5.6e5 quanta, n <= 100, so each side is
<= ~4e15 — safely inside int64 at any corpus scale because n is a
DESIGN constant, not a data size.

Scale shape: one (event_type) keyed sort shared by the trailing
window; the ROWS frame carries O(window) state per key. Rows-based
framing (not time-RANGE) keeps the baseline sample size fixed under
bursty traffic — the statistical contract is "vs the last 100
observations", not "vs the last hour" (timegrid's RANGE windows
cover the time-framed variant).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from jobminer_spark.registry import query
from jobminer_spark.sources import load_table

VAL_QUANT = 1_000  # 1e-3 value quanta: exact in double, overflow-safe
BASELINE_ROWS = 100  # trailing observations per baseline
MIN_BASELINE = 30  # below this the z-test is too noisy to score
Z_THRESHOLD = 3  # fire at |z| > 3


@query(
    "trailing_zscore_outliers",
    oracle=f"""
    WITH ev AS (
      SELECT event_id, event_type,
             epoch_us(ts) AS tus,
             CAST(floor(value * {VAL_QUANT}) AS BIGINT) AS xq
      FROM events
    ),
    stats AS (
      SELECT event_id, event_type, xq,
             COUNT(*) OVER w AS n,
             SUM(xq) OVER w AS s,
             SUM(xq * xq) OVER w AS ss
      FROM ev
      WINDOW w AS (
        PARTITION BY event_type ORDER BY tus, event_id
        ROWS BETWEEN {BASELINE_ROWS} PRECEDING AND 1 PRECEDING
      )
    )
    SELECT event_id, event_type, xq,
           CAST(n AS BIGINT) AS n_baseline
    FROM stats
    WHERE n >= {MIN_BASELINE}
      AND (n * xq - s) * (n * xq - s)
          > {Z_THRESHOLD * Z_THRESHOLD} * (n * ss - s * s)
    """,
)
def trailing_zscore_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events whose quantized value deviates more than 3 trailing
    standard deviations from the previous <= 100 same-type
    observations (self excluded from its own baseline). Emitted as
    the outlier rows themselves — a bounded, hash-pinnable set."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("tus"),
        F.floor(F.col("value") * VAL_QUANT).cast("long").alias("xq"),
    )
    w = (
        W.partitionBy("event_type")
        .orderBy("tus", "event_id")
        .rowsBetween(-BASELINE_ROWS, -1)
    )
    stats = ev.select(
        "event_id",
        "event_type",
        "xq",
        F.count(F.lit(1)).over(w).alias("n"),
        F.sum("xq").over(w).alias("s"),
        F.sum(F.col("xq") * F.col("xq")).over(w).alias("ss"),
    )
    num = F.col("n") * F.col("xq") - F.col("s")
    den = F.col("n") * F.col("ss") - F.col("s") * F.col("s")
    return stats.filter(
        (F.col("n") >= MIN_BASELINE)
        & (num * num > Z_THRESHOLD * Z_THRESHOLD * den)
    ).select("event_id", "event_type", "xq", F.col("n").alias("n_baseline"))
