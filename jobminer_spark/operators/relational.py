"""Relational operator surface: scan → filter → join → agg → window →
set-ops → top-k, verified against the DuckDB oracle.

The reference's relational semantics are embedded in its pipeline
(SURVEY.md §2.3-§2.5): equi-joins on natural keys, semi/anti existence
probes (database.py:116-123), per-key grouping (pracuj_scraper.py:365),
surrogate keys (database.py:143-150). Here each becomes a named,
composable DataFrame query over the TPC-H-ish fixtures, plus the
group-by/window/top-k breadth the reference's README promises but never
implements ("Power BI dashboards ... trends").

Cross-engine determinism discipline (applies to every oracle pair):
  * Sums of doubles are order-dependent; we aggregate in
    DECIMAL(38,6) (exact, associative) and cast the result to double.
  * Averages = exact decimal sum cast to double, divided by count —
    one IEEE division, identical in both engines.
  * Every top-k / window ordering carries a unique tiebreak key.
  * Timestamps in outputs are formatted to strings (engine-neutral).
  * Spark's double->int cast truncates toward zero (like Python int());
    DuckDB's rounds — oracles use trunc() explicitly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from jobminer_spark.registry import query
from jobminer_spark.sources import load_table


# Shared helpers live in operators/common.py (registration-free);
# re-exported here for backward compatibility.
from jobminer_spark.operators.common import (  # noqa: E402,F401
    davg,
    dec12_to_double,
    dec12_to_double_sql,
    dsum,
    spread_scan,
    ts_str,
)


# ---------------------------------------------------------------------------
# q1: pricing summary — groupBy aggregate breadth (sum/avg/count)
# ---------------------------------------------------------------------------


@query(
    "q1_pricing_summary",
    oracle="""
    SELECT
      l_returnflag,
      l_linestatus,
      CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) AS sum_qty,
      CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) AS sum_base_price,
      CAST(CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) AS sum_disc_price,
      CAST(CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) AS sum_charge,
      CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) / COUNT(*) AS avg_qty,
      CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) / COUNT(*) AS avg_price,
      CAST(CAST(SUM(CAST(l_discount AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) / COUNT(*) AS avg_disc,
      COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        # spread_scan: the 4-group decimal aggregation is the whole
        # query; on the fixture's 3-split file it ran 3-wide (the
        # exchange is a no-op at scale — guide §2.2). Safe here: every
        # aggregate is exact decimal (order-insensitive).
        spread_scan(
            l.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        )
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum(F.col("l_quantity")).alias("sum_qty"),
            dsum(F.col("l_extendedprice")).alias("sum_base_price"),
            dsum(disc_price).alias("sum_disc_price"),
            dsum(charge).alias("sum_charge"),
            davg(F.col("l_quantity")).alias("avg_qty"),
            davg(F.col("l_extendedprice")).alias("avg_price"),
            davg(F.col("l_discount")).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# ---------------------------------------------------------------------------
# q3: shipping-priority top-k — 3-way join + agg + deterministic top-10
# ---------------------------------------------------------------------------


@query(
    "q3_top_revenue_orders",
    oracle="""
    SELECT
      l_orderkey,
      CAST(CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) AS revenue,
      strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS orderdate,
      o_orderpriority
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15'
      AND l_shipdate > TIMESTAMP '1995-03-15'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) DESC,
             l_orderkey
    LIMIT 10
    """,
)
def q3_top_revenue_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    )
    l = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1995-03-15").cast("timestamp")
    )
    revenue_dec = F.sum(
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(38,6)")
    )
    # customer is the small side — broadcast it so the big fact join
    # never shuffles the customer relation at scale.
    joined = l.join(
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey),
        F.col("l_orderkey") == F.col("o_orderkey"),
    )
    return (
        joined.groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(revenue_dec.alias("revenue_dec"))
        # order on the EXACT decimal so the top-10 set matches the oracle
        .orderBy(F.col("revenue_dec").desc(), F.col("l_orderkey"))
        .limit(10)
        .select(
            "l_orderkey",
            F.col("revenue_dec").cast("double").alias("revenue"),
            ts_str(F.col("o_orderdate")).alias("orderdate"),
            "o_orderpriority",
        )
    )


# ---------------------------------------------------------------------------
# q5: region revenue — 6-way join through the star schema
# ---------------------------------------------------------------------------


@query(
    "q5_region_nation_revenue",
    oracle="""
    SELECT
      n_name,
      CAST(CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) AS revenue
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'EUROPE'
      AND o_orderdate >= TIMESTAMP '1995-01-01'
      AND o_orderdate < TIMESTAMP '1997-01-01'
    GROUP BY n_name
    """,
)
def q5_region_nation_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = {n: load_table(spark, sf_dir, n) for n in
         ("customer", "orders", "lineitem", "supplier", "nation", "region")}
    o = t["orders"].filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    # dims are tiny: broadcast region->nation->supplier chain so the only
    # shuffle is the orders⋈lineitem fact join + the final agg.
    r = t["region"].filter(F.col("r_name") == "EUROPE")
    n = t["nation"].join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
    s = t["supplier"].join(
        F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey")
    )
    joined = (
        t["lineitem"]
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(
            F.broadcast(s),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
    )
    return joined.groupBy("n_name").agg(
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue")
    )


# ---------------------------------------------------------------------------
# q6: forecast revenue — pushed-down filter + scalar aggregate
# ---------------------------------------------------------------------------


@query(
    "q6_forecast_revenue",
    oracle="""
    SELECT
      CAST(CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) AS revenue,
      COUNT(*) AS n_rows
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            dsum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


# ---------------------------------------------------------------------------
# Existence probes: semi / anti joins (reference rows 23, 25)
# ---------------------------------------------------------------------------


@query(
    "semi_join_customers_with_open_orders",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    WHERE EXISTS (
      SELECT 1 FROM orders
      WHERE o_custkey = c_custkey AND o_orderstatus = 'O'
    )
    """,
)
def semi_join_customers_with_open_orders(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """LEFT SEMI — the reference's pre-insert existence probe
    (database.py:116-123) as a set-at-a-time operator."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "O")
    return c.join(
        o, c.c_custkey == o.o_custkey, "left_semi"
    ).select("c_custkey", "c_name")


@query(
    "anti_join_customers_without_orders",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
)
def anti_join_customers_without_orders(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """LEFT ANTI — the insert-only-misses half of the reference's
    dedup'd keyed insert (database.py:136-148)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


# ---------------------------------------------------------------------------
# Window functions: per-group top-k, running totals, surrogate keys
# ---------------------------------------------------------------------------


@query(
    "topk_customers_per_nation",
    oracle="""
    SELECT n_name, c_custkey, c_name, c_acctbal, rnk
    FROM (
      SELECT n_name, c_custkey, c_name, c_acctbal,
             ROW_NUMBER() OVER (
               PARTITION BY n_name ORDER BY c_acctbal DESC, c_custkey
             ) AS rnk
      FROM customer JOIN nation ON c_nationkey = n_nationkey
    )
    WHERE rnk <= 3
    """,
)
def topk_customers_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    w = W.partitionBy("n_name").orderBy(F.col("c_acctbal").desc(), F.col("c_custkey"))
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= 3)
        .select("n_name", "c_custkey", "c_name", "c_acctbal", "rnk")
    )


@query(
    "running_revenue_per_customer",
    oracle="""
    SELECT
      o_custkey,
      o_orderkey,
      CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) OVER (
        PARTITION BY o_custkey
        ORDER BY o_orderdate, o_orderkey
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
      ) AS VARCHAR) AS DOUBLE) AS running_total
    FROM orders
    WHERE o_custkey <= 20
    """,
)
def running_revenue_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") <= 20)
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.sum(F.col("o_totalprice").cast("decimal(38,6)"))
        .over(w)
        .cast("double")
        .alias("running_total"),
    )


@query(
    "surrogate_key_assignment",
    oracle="""
    SELECT
      ROW_NUMBER() OVER (ORDER BY c_custkey) AS short_id,
      c_custkey,
      c_name
    FROM customer
    """,
)
def surrogate_key_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic surrogate keys — the distributed replacement for the
    reference's IDENTITY(1,1) (database.py:55,81; SURVEY.md §2 row 24).

    NOTE ON SCALE: a global row_number() is a single-partition sort —
    fine for dimension-sized inputs like this one. For fact-scale data
    use ``zip_with_index_keys`` below (per-partition offsets, no global
    sort), which trades contiguity for full parallelism.
    """
    c = load_table(spark, sf_dir, "customer")
    w = W.orderBy("c_custkey")
    return c.select(
        F.row_number().over(w).cast("long").alias("short_id"), "c_custkey", "c_name"
    )


def zip_with_index_keys(df: DataFrame, key_name: str = "surrogate_id") -> DataFrame:
    """Scale path for surrogate keys: non-contiguous but unique and
    stable within a run — monotonically_increasing_id() encodes
    (partition_id, per-partition counter) with zero shuffle."""
    return df.withColumn(key_name, F.monotonically_increasing_id())


# ---------------------------------------------------------------------------
# Grouping extensions: rollup / cube / grouping sets / pivot
# ---------------------------------------------------------------------------


@query(
    "rollup_orders_status_priority",
    oracle="""
    SELECT
      o_orderstatus,
      o_orderpriority,
      COUNT(*) AS n_orders,
      CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) AS total_price
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
)
def rollup_orders_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.rollup("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        dsum(F.col("o_totalprice")).alias("total_price"),
    )


@query(
    "cube_lineitem_flags",
    oracle="""
    SELECT
      l_returnflag,
      l_linestatus,
      COUNT(*) AS n_rows,
      CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) AS sum_qty
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def cube_lineitem_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    return l.cube("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n_rows"),
        dsum(F.col("l_quantity")).alias("sum_qty"),
    )


@query(
    "pivot_quantity_by_linestatus",
    oracle="""
    SELECT
      l_returnflag,
      CAST(CAST(SUM(CAST(CASE WHEN l_linestatus = 'O' THEN l_quantity END AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) AS "O",
      CAST(CAST(SUM(CAST(CASE WHEN l_linestatus = 'F' THEN l_quantity END AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) AS "F"
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def pivot_quantity_by_linestatus(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(dsum(F.col("l_quantity")))
    )


# ---------------------------------------------------------------------------
# Set operations (reference §2.8: multi-source union discriminated by
# the Source column; intersect/except round out the surface)
# ---------------------------------------------------------------------------


@query(
    "union_multi_source",
    oracle="""
    SELECT c_custkey AS custkey, 'segment_a' AS source
    FROM customer WHERE c_mktsegment = 'BUILDING'
    UNION ALL
    SELECT c_custkey AS custkey, 'segment_b' AS source
    FROM customer WHERE c_acctbal > 5000
    """,
)
def union_multi_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """unionByName with a source discriminator — the Spark shape of the
    reference's two-scraper union (SURVEY.md §2.8, models.py:9)."""
    c = load_table(spark, sf_dir, "customer")
    a = c.filter(F.col("c_mktsegment") == "BUILDING").select(
        F.col("c_custkey").alias("custkey"), F.lit("segment_a").alias("source")
    )
    b = c.filter(F.col("c_acctbal") > 5000).select(
        F.col("c_custkey").alias("custkey"), F.lit("segment_b").alias("source")
    )
    return a.unionByName(b)


@query(
    "intersect_repeat_customers",
    oracle="""
    SELECT o_custkey AS custkey FROM orders
    WHERE o_orderdate >= TIMESTAMP '1995-01-01' AND o_orderdate < TIMESTAMP '1996-01-01'
    INTERSECT
    SELECT o_custkey AS custkey FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
    """,
)
def intersect_repeat_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    y95 = o.filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-01-01").cast("timestamp"))
    ).select(F.col("o_custkey").alias("custkey"))
    y96 = o.filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    ).select(F.col("o_custkey").alias("custkey"))
    return y95.intersect(y96)


@query(
    "except_lapsed_customers",
    oracle="""
    SELECT o_custkey AS custkey FROM orders
    WHERE o_orderdate < TIMESTAMP '1996-01-01'
    EXCEPT
    SELECT o_custkey AS custkey FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
    """,
)
def except_lapsed_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    before = o.filter(
        F.col("o_orderdate") < F.lit("1996-01-01").cast("timestamp")
    ).select(F.col("o_custkey").alias("custkey"))
    after = o.filter(
        F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp")
    ).select(F.col("o_custkey").alias("custkey"))
    return before.subtract(after)


# ---------------------------------------------------------------------------
# Distinct aggregation
# ---------------------------------------------------------------------------


@query(
    "distinct_counts_per_status",
    oracle="""
    SELECT
      o_orderstatus,
      COUNT(DISTINCT o_custkey) AS n_customers,
      COUNT(DISTINCT o_orderpriority) AS n_priorities,
      COUNT(*) AS n_orders
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def distinct_counts_per_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.countDistinct("o_custkey").alias("n_customers"),
        F.countDistinct("o_orderpriority").alias("n_priorities"),
        F.count(F.lit(1)).alias("n_orders"),
    )


@query(
    "variance_stats_by_event_type",
    # the ..._sql chain replaces the bare CAST(sxx AS DOUBLE): DuckDB's
    # direct DECIMAL(38,s)→DOUBLE cast misrounds by 1 ulp on this very
    # fixture (the first strict-comparator catch, r11) — see
    # common.dec12_to_double
    oracle=f"""
    WITH s AS (
      SELECT event_type,
             COUNT(*) AS n,
             CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DECIMAL(38,12)) AS sx,
             CAST(SUM(CAST(value AS DECIMAL(38,6)) * CAST(value AS DECIMAL(38,6)))
                  AS DECIMAL(38,12)) AS sxx
      FROM events GROUP BY event_type
    ),
    d AS (
      SELECT event_type, n,
             {{sx_d}} AS sx_d,
             {{sxx_d}} AS sxx_d
      FROM s
    )
    SELECT event_type, n,
           sx_d / n AS mean_value,
           (sxx_d - sx_d * sx_d / n) / (n - 1) AS var_value
    FROM d
    """.format(
        sx_d=dec12_to_double_sql("sx"), sxx_d=dec12_to_double_sql("sxx")
    ),
)
def variance_stats_by_event_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean/variance per group WITHOUT the engines' stddev builtins:
    both accumulate order-dependent floating sums, so two engines (or
    two partitionings of the same engine) disagree in the last ulps.
    Instead: exact decimal SUM(x) and SUM(x*x) — order-independent,
    map-side combinable — then one identical double-arithmetic
    finish. This is also the 100 TB-correct shape: a re-partitioning
    or AQE re-plan can never change the answer."""
    e = load_table(spark, sf_dir, "events")
    xd = F.col("value").cast("decimal(38,6)")
    s = e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(xd).cast("decimal(38,12)").alias("sx"),
        F.sum(xd * xd).cast("decimal(38,12)").alias("sxx"),
    )
    d = s.select(
        "event_type",
        "n",
        dec12_to_double(F.col("sx")).alias("sx_d"),
        dec12_to_double(F.col("sxx")).alias("sxx_d"),
    )
    sx, sxx, n = F.col("sx_d"), F.col("sxx_d"), F.col("n")
    return d.select(
        "event_type",
        "n",
        (sx / n).alias("mean_value"),
        ((sxx - sx * sx / n) / (n - F.lit(1))).alias("var_value"),
    )
