"""RFM segmentation: recency / frequency / monetary quintiles.

The classic customer-value matrix beside cohort retention: per user,
days since last activity (recency, against the corpus's max day so
the result is replay-stable), event count (frequency), and integer
cents of value (monetary); each dimension is cut into quintiles with
``ntile(5)`` and users roll up into the 125 R-F-M cells.

Determinism discipline: ntile over a non-unique sort key is
engine-dependent at the tie boundaries, so every ORDER BY carries the
unique ``user_id`` tiebreak — both engines then produce identical
bucket assignments (the unique-tiebreak rule every top-k in the repo
follows). All measures are exact integers; no floats anywhere.

Scale shape: one groupBy(user_id) over events (map-side partials),
then three ntile windows over the USER dimension. The windows are
global (no partition key) BY DEFINITION — quintiles are corpus-wide —
so this operator's scale bound is the user dimension, not the event
fact table; at 100 TB of events the user table is the small output
of the first aggregation (documented global-window whitelist entry in
tests/test_plans.py). For a fact-sized user dimension the standard
rewrite is approx-percentile cutpoints + a broadcast range join,
which trades exact quintile boundaries for full parallelism.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from jobminer_spark.registry import query
from jobminer_spark.sources import load_table

_DAY_US = 86_400_000_000

_CENSUS_ORACLE = f"""
    WITH per_user AS (
      SELECT user_id,
             MAX(epoch_us(ts) // {_DAY_US}) AS last_day,
             COUNT(*) AS frequency,
             CAST(SUM(CAST(FLOOR(value * 100.0) AS BIGINT)) AS BIGINT)
               AS monetary_cents
      FROM events GROUP BY user_id
    ),
    anchored AS (
      SELECT user_id,
             (SELECT MAX(last_day) FROM per_user) - last_day AS recency_days,
             frequency, monetary_cents
      FROM per_user
    ),
    scored AS (
      SELECT user_id, recency_days, frequency, monetary_cents,
             NTILE(5) OVER (ORDER BY recency_days ASC NULLS LAST, user_id)
               AS r_bucket,
             NTILE(5) OVER (ORDER BY frequency DESC NULLS LAST, user_id)
               AS f_bucket,
             NTILE(5) OVER (ORDER BY monetary_cents DESC NULLS LAST, user_id)
               AS m_bucket
      FROM anchored
    )
    SELECT r_bucket, f_bucket, m_bucket,
           COUNT(*) AS n_users,
           CAST(SUM(monetary_cents) AS BIGINT) AS segment_cents,
           CAST(SUM(frequency) AS BIGINT) AS segment_events
    FROM scored GROUP BY r_bucket, f_bucket, m_bucket
    """


def _per_user_rfm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared first stage: per-user (recency_days, frequency,
    monetary_cents) anchored at the corpus max day."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.expr(f"unix_micros(cast(ts as timestamp)) div {_DAY_US}").alias("day"),
        F.floor(F.col("value") * 100.0).cast("long").alias("cents"),
    )
    per_user = ev.groupBy("user_id").agg(
        F.max("day").alias("last_day"),
        F.count(F.lit(1)).alias("frequency"),
        F.sum("cents").alias("monetary_cents"),
    )
    max_day = per_user.agg(F.max("last_day").alias("corpus_max_day"))
    return per_user.crossJoin(F.broadcast(max_day)).select(
        "user_id",
        (F.col("corpus_max_day") - F.col("last_day")).alias("recency_days"),
        "frequency",
        "monetary_cents",
    )


@query("rfm_segment_census", oracle=_CENSUS_ORACLE)
def rfm_segment_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Users bucketed into R×F×M quintile cells (1 = best: most
    recent, most frequent, highest value) with per-cell population
    and exact integer value/event mass."""
    anchored = _per_user_rfm(spark, sf_dir)
    scored = anchored.select(
        "user_id",
        "recency_days",
        "frequency",
        "monetary_cents",
        # explicit NULLS LAST on every measure: Spark's ASC default is
        # NULLS FIRST while DuckDB's is NULLS LAST, so an all-NULL
        # aggregate (e.g. NULL monetary_cents) would silently shift
        # every bucket assignment — the unique user_id tiebreak does
        # not cover null PLACEMENT
        F.ntile(5)
        .over(W.orderBy(F.col("recency_days").asc_nulls_last(), "user_id"))
        .alias("r_bucket"),
        F.ntile(5)
        .over(W.orderBy(F.col("frequency").desc_nulls_last(), "user_id"))
        .alias("f_bucket"),
        F.ntile(5)
        .over(W.orderBy(F.col("monetary_cents").desc_nulls_last(), "user_id"))
        .alias("m_bucket"),
    )
    return scored.groupBy("r_bucket", "f_bucket", "m_bucket").agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum("monetary_cents").cast("long").alias("segment_cents"),
        F.sum("frequency").cast("long").alias("segment_events"),
    )


def _distributed_prefix(
    df: DataFrame, order_cols: list[Column], sums: dict[str, str]
) -> DataFrame:
    """Exact INCLUSIVE global running sums under ``order_cols``
    WITHOUT a single-reducer window — the generalized scale plan
    behind _distributed_ranks, reused by the drift module's ECDFs.

    ``sums`` maps source column → output running-sum column. Plan:
    ``repartitionByRange`` on the sort key gives partitions whose key
    ranges are disjoint and ordered by partition id, so a global
    running sum is the PARTITION-LOCAL running sum (a window
    partitioned by pid — fully parallel) plus each earlier
    partition's total. The offsets are computed with a triangular
    self-join over the per-partition totals (≤ partitions² pairs,
    trivially small) instead of a global window, so this plan
    contains NO unpartitioned Window at all; they broadcast back.
    Range-partitioner sampling only moves the BOUNDARIES between
    partitions, never the relative order, so the result is exact and
    deterministic whenever the sort key orders rows uniquely (or the
    summed quantity is insensitive to intra-tie order, as a prefix
    sum evaluated at tie boundaries is).

    The tagged frame is localCheckpointed before the two consuming
    branches below: both the partition-local window and the
    per-partition totals must see IDENTICAL range boundaries, and
    range-partitioner boundaries are sampled from an upstream whose
    intra-partition order need not be deterministic. Without the
    checkpoint that identity holds only while Spark happens to reuse
    the exchange; a future replan (AQE) could evaluate the branches
    under independently-sampled boundaries and silently skew the
    offsets (ADVICE r13). LAZY since r20 (the loop-fold discipline):
    the cut still pins both branches to ONE shared RDD whose
    partitions materialize exactly once — concurrent first readers
    serialize on the block-manager's per-block get-or-compute lock —
    so the boundary-identity guarantee is unchanged while the
    stand-alone materialization job (one per _distributed_ranks call;
    rfm_segment_census_scaled makes three) folds into the first
    consuming action."""
    part = df.repartitionByRange(*order_cols)
    tagged = part.withColumn("_pid", F.spark_partition_id()).localCheckpoint(
        eager=False
    )
    w_local = (
        W.partitionBy("_pid")
        .orderBy(*order_cols)
        .rowsBetween(W.unboundedPreceding, 0)
    )
    local = tagged.select(
        "*", *[F.sum(src).over(w_local).alias(out) for src, out in sums.items()]
    )
    totals = tagged.groupBy("_pid").agg(
        *[F.sum(src).alias(f"_t_{src}") for src in sums]
    )
    earlier = totals.select(
        F.col("_pid").alias("_bpid"),
        *[F.col(f"_t_{src}").alias(f"_bt_{src}") for src in sums],
    )
    offs = (
        totals.join(earlier, F.col("_bpid") < F.col("_pid"), "left")
        .groupBy("_pid")
        .agg(
            *[
                F.coalesce(F.sum(f"_bt_{src}"), F.lit(0)).alias(f"_off_{src}")
                for src in sums
            ]
        )
    )
    out_df = local.join(F.broadcast(offs), "_pid")
    for src, out in sums.items():
        out_df = out_df.withColumn(out, F.col(out) + F.col(f"_off_{src}"))
    return out_df.drop("_pid", *[f"_off_{src}" for src in sums])


def _distributed_ranks(df: DataFrame, order_cols: list[Column], out: str) -> DataFrame:
    """Exact global row_number under ``order_cols`` WITHOUT a
    single-reducer window — the scale path for rank-based operators
    over fact-sized inputs (VERDICT r12 item 5): a distributed prefix
    sum of ones. Exact whenever the sort key is unique (the running
    COUNT at each row then has a single possible value)."""
    return _distributed_prefix(
        df.withColumn("_one", F.lit(1)), order_cols, {"_one": out}
    ).drop("_one")


def _ntile_from_rank(rank: Column, n: Column, k: int) -> Column:
    """ntile(k) bucket from an exact 1-based global rank over n rows:
    the first ``n % k`` buckets get ``n div k + 1`` rows, the rest
    ``n div k`` — Spark's and DuckDB's shared NTILE contract. The
    ELSE divisor is clamped with greatest(_,1): when n < k the THEN
    branch covers every row, but ANSI mode must never see a reachable
    div-by-zero in the expression."""
    size = n - (n % k)  # k * (n div k), avoids a second div
    small = (size / k).cast("long")
    rem = n % k
    cut = rem * (small + 1)
    return (
        F.when(rank <= cut, ((rank - 1) / (small + 1)).cast("long") + 1)
        .otherwise(
            rem + ((rank - cut - 1) / F.greatest(small, F.lit(1))).cast("long") + 1
        )
        .cast("int")
    )


@query("rfm_segment_census_scaled", oracle=_CENSUS_ORACLE)
def rfm_segment_census_scaled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The documented fact-sized-user-dimension rewrite of
    rfm_segment_census, registered as an executable twin (VERDICT r12
    item 5): identical oracle, identical bucket assignments, but ZERO
    global windows of any kind — each dimension's quintile comes from
    the distributed-rank plan (range repartition + partition-local
    row_number + broadcast triangular-join offsets) and the shared
    ntile arithmetic. Hash-equality with the ntile oracle proves the
    rewrite changes the plan, not the answer — the
    salted_*_equivalence discipline."""
    anchored = _per_user_rfm(spark, sf_dir)
    n = anchored.agg(F.count(F.lit(1)).cast("long").alias("_n"))
    ranked = _distributed_ranks(
        anchored, [F.col("recency_days").asc_nulls_last(), F.col("user_id").asc()], "_rn_r"
    )
    ranked = _distributed_ranks(
        ranked, [F.col("frequency").desc_nulls_last(), F.col("user_id").asc()], "_rn_f"
    )
    ranked = _distributed_ranks(
        ranked, [F.col("monetary_cents").desc_nulls_last(), F.col("user_id").asc()], "_rn_m"
    )
    scored = ranked.crossJoin(F.broadcast(n)).select(
        "monetary_cents",
        "frequency",
        _ntile_from_rank(F.col("_rn_r"), F.col("_n"), 5).alias("r_bucket"),
        _ntile_from_rank(F.col("_rn_f"), F.col("_n"), 5).alias("f_bucket"),
        _ntile_from_rank(F.col("_rn_m"), F.col("_n"), 5).alias("m_bucket"),
    )
    return scored.groupBy("r_bucket", "f_bucket", "m_bucket").agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum("monetary_cents").cast("long").alias("segment_cents"),
        F.sum("frequency").cast("long").alias("segment_events"),
    )
