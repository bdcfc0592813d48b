"""Incremental materialized-rollup maintenance, update ≡ rebuild
attested — the batch-pipeline pattern behind every daily metrics
table at 100 TB: you do NOT re-aggregate the full history each day;
you merge yesterday's stored per-partition aggregates with today's
delta, and the ONLY acceptable semantics is bit-equality with a full
rebuild.

This is the aggregate-level sibling of scd.scd2_incremental_update_
audit (row-level state) and increment.incremental_index_update_audit
(index state): base state = the rollup over the base slice, delta =
the rest, maintained = an aggregate MERGE (full-outer on the day key,
component-wise sum — counts and exact decimal-quantized price sums
are both associative, which is WHY the merge is lawful), rebuild =
one aggregation over everything. The driver row pins mismatches to
zero and the totals to independently recomputed constants.

Scale: the maintained path touches O(delta) rows plus O(days) stored
aggregate rows — never the history; the base/delta split here uses a
deterministic key predicate (o_orderkey % 10 = 7 as "today's batch")
so both engines agree on the slices. One shuffle per aggregation on
the day key; the merge join is day-cardinality (broadcastable).

Reference anchor: the daily idempotent re-run (function.json:6) whose
effects must be indistinguishable from a from-scratch rebuild
(database.py:116-123's dedup-on-insert gives the same guarantee at
row level).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from jobminer_spark.registry import query
from jobminer_spark.sources import load_table

_DAY_US = 86400 * 1_000_000


def _day_rollup(orders: DataFrame) -> DataFrame:
    """Per-day (n_orders, exact cent-quantized price sum) — the
    stored aggregate state. Price is floor-quantized to integer
    BEFORE summing so partial sums merge exactly."""
    return (
        orders.select(
            F.expr(f"unix_micros(CAST(o_orderdate AS TIMESTAMP)) div {_DAY_US}")
            .alias("day"),
            F.floor(F.col("o_totalprice") * F.lit(100.0)).cast("long").alias(
                "cents"
            ),
        )
        .groupBy("day")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("cents").alias("sum_cents"),
        )
    )


def merge_day_rollups(state: DataFrame, delta: DataFrame) -> DataFrame:
    """The maintenance operator: component-wise sum on the day key.
    Works for any associative aggregate state (counts, sums, sketch
    registers); day-cardinality inputs make the join broadcastable."""
    s = state.select(
        "day",
        F.col("n_orders").alias("s_n"),
        F.col("sum_cents").alias("s_c"),
    )
    d = delta.select(
        "day",
        F.col("n_orders").alias("d_n"),
        F.col("sum_cents").alias("d_c"),
    )
    return s.join(d, "day", "full_outer").select(
        "day",
        (F.coalesce("s_n", F.lit(0)) + F.coalesce("d_n", F.lit(0))).alias(
            "n_orders"
        ),
        (F.coalesce("s_c", F.lit(0)) + F.coalesce("d_c", F.lit(0))).alias(
            "sum_cents"
        ),
    )


@query(
    "incremental_rollup_audit",
    oracle=f"""
    WITH full_rollup AS (
      SELECT epoch_us(CAST(o_orderdate AS TIMESTAMP)) // {_DAY_US} AS day,
             COUNT(*) AS n_orders,
             SUM(CAST(FLOOR(o_totalprice * 100.0) AS BIGINT)) AS sum_cents
      FROM orders GROUP BY 1
    )
    SELECT
      (SELECT COUNT(*) FROM full_rollup) AS n_days,
      CAST(0 AS BIGINT) AS n_mismatch,
      (SELECT CAST(SUM(n_orders) AS BIGINT) FROM full_rollup) AS n_orders,
      (SELECT CAST(SUM(sum_cents) AS BIGINT) FROM full_rollup) AS total_cents
    """,
)
def incremental_rollup_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """update ≡ rebuild for the daily order rollup: maintain the
    stored per-day aggregates with the delta batch, rebuild from
    scratch, full-outer diff on (day), pin mismatches to zero and the
    global totals to oracle-recomputed constants."""
    o = load_table(spark, sf_dir, "orders")
    is_delta = F.col("o_orderkey") % 10 == 7
    maintained = merge_day_rollups(
        _day_rollup(o.filter(~is_delta)), _day_rollup(o.filter(is_delta))
    )
    rebuilt = _day_rollup(o)
    m = maintained.select(
        "day", F.col("n_orders").alias("m_n"), F.col("sum_cents").alias("m_c")
    )
    r = rebuilt.select(
        "day", F.col("n_orders").alias("r_n"), F.col("sum_cents").alias("r_c")
    )
    j = m.join(r, "day", "full_outer")
    mismatch = (
        ~F.col("m_n").eqNullSafe(F.col("r_n"))
        | ~F.col("m_c").eqNullSafe(F.col("r_c"))
    )
    return j.agg(
        F.count(F.lit(1)).alias("n_days"),
        F.count(F.when(mismatch, 1)).alias("n_mismatch"),
        F.sum("r_n").alias("n_orders"),
        F.sum("r_c").alias("total_cents"),
    )
