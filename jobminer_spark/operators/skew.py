"""Skew handling: salted two-stage aggregation.

At 100 TB a hot grouping key (one employer posting half the jobs, one
language dominating a corpus) turns a groupBy into a single straggler
task. The standard fix: spread each key across ``n_salts`` partial
groups (stage 1, map-side parallel), then merge partials by the real
key (stage 2, tiny). AQE's skew-join handling covers JOINS
automatically; aggregation salting is the explicit counterpart, and
the oracle proves the rewrite is semantics-preserving (same result as
the plain GROUP BY).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from jobminer_spark.registry import query
from jobminer_spark.sources import load_table


def salted_sum_count(
    df: DataFrame,
    keys: list[str],
    value: Column,
    n_salts: int = 16,
) -> DataFrame:
    """Two-stage skew-resistant aggregate: returns keys + sum_value +
    n_rows. Decimal accumulation keeps the two-stage sum bit-equal to
    a one-stage sum regardless of how rows land in salt buckets.

    The salt seeds `monotonically_increasing_id()`, which is NOT stable
    under task retry — a re-executed task may land rows in different
    salt buckets. Safe here because every salt bucket feeds the same
    algebraic (sum/count) merge: bucket assignment changes the plan's
    intermediate partials, never the final answer. Do NOT reuse this
    salt for non-algebraic aggregates (e.g. first/collect_list) where
    bucket placement would leak into results."""
    salt = (F.xxhash64(*[F.col(k) for k in keys], F.monotonically_increasing_id()) % n_salts).alias("_salt")
    partial = (
        df.select(*keys, value.cast("decimal(38,6)").alias("_v"), salt)
        .groupBy(*keys, "_salt")
        .agg(F.sum("_v").alias("_pv"), F.count(F.lit(1)).alias("_pc"))
    )
    return (
        partial.groupBy(*keys)
        .agg(
            F.sum("_pv").cast("double").alias("sum_value"),
            F.sum("_pc").alias("n_rows"),
        )
    )


@query(
    "salted_aggregation_equivalence",
    oracle="""
    SELECT l_returnflag,
           CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) AS sum_value,
           COUNT(*) AS n_rows
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def salted_aggregation_equivalence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The salted two-stage aggregate vs the oracle's plain GROUP BY —
    hash-equal results prove the skew rewrite changes the plan, not
    the answer (l_returnflag has 3 values over 600k rows at sf0.1:
    exactly the hot-key shape salting exists for)."""
    l = load_table(spark, sf_dir, "lineitem")
    return salted_sum_count(l, ["l_returnflag"], F.col("l_extendedprice"))


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    n_salts: int = 16,
) -> DataFrame:
    """Hot-key join salting: replicate each dim row across ``n_salts``
    salt values and spread fact rows uniformly over them, so one hot
    join key fans across n_salts tasks instead of one straggler.

    This is the LAST-resort shape: a genuinely small dim should
    broadcast (no shuffle at all), and AQE's skew-join splits oversized
    partitions at runtime; explicit salting is for a large-large join
    with a known hot key where neither applies. The fact-side salt
    seeds ``monotonically_increasing_id()`` (not retry-stable) — safe
    for equi-join replication because every salt copy of a dim row is
    identical, so bucket placement never leaks into results."""
    salt = (
        F.pmod(F.xxhash64(F.col(key), F.monotonically_increasing_id()), F.lit(n_salts))
    ).alias("_salt")
    f = fact.withColumn("_salt", salt)
    d = dim.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)).cast("array<long>"))
    )
    return f.join(d.hint("merge"), [key, "_salt"]).drop("_salt")


@query(
    "salted_join_equivalence",
    oracle="""
    WITH dim AS (
      SELECT l_returnflag,
             CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) / COUNT(*)
               AS avg_price
      FROM lineitem GROUP BY l_returnflag)
    SELECT l.l_returnflag,
           COUNT(*) AS n_rows,
           COUNT(CASE WHEN l.l_extendedprice > d.avg_price THEN 1 END)
             AS n_above_avg
    FROM lineitem l JOIN dim d ON l.l_returnflag = d.l_returnflag
    GROUP BY l.l_returnflag
    """,
)
def salted_join_equivalence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The salted join vs the oracle's plain join — hash-equal results
    prove the rewrite changes the plan, not the answer. l_returnflag
    (3 values over the whole fact table) is exactly the hot-key shape;
    the dim side carries each flag's average price and the merge hint
    forces the shuffle join that salting exists to fix (in production
    a 3-row dim would broadcast — see the docstring's hierarchy:
    broadcast first, AQE skew-join second, explicit salt last)."""
    l = load_table(spark, sf_dir, "lineitem")
    dim = l.groupBy("l_returnflag").agg(
        (
            F.sum(F.col("l_extendedprice").cast("decimal(38,6)")).cast("double")
            / F.count(F.lit(1))
        ).alias("avg_price")
    )
    joined = salted_join(
        l.select("l_returnflag", "l_extendedprice"), dim, "l_returnflag"
    )
    return joined.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count(
            F.when(F.col("l_extendedprice") > F.col("avg_price"), 1)
        ).alias("n_above_avg"),
    )
