"""Declarative data-quality constraint validation — the Deequ-style
check suite a production ingestion pipeline runs before publishing a
table (reference analog: the ad-hoc guards scattered through the
scraper — dup-key probe database.py:116-123, truncation-to-width,
NOT-NULL column DDL database.py:37-104 — consolidated into one
auditable constraint pass; SURVEY.md §2 rows 7/17/23 generalized).

Every check is expressed as a COUNT of violating rows, so the whole
suite is one narrow aggregation pass per table plus one referential
anti-join — no row ever leaves the engine, and the result is a
bounded (check_name, n_checked, n_violations) relation the driver
hash-pins. Checks covered:

* primary-key uniqueness (orders.o_orderkey)
* referential integrity (orders.o_custkey -> customer.c_custkey)
* completeness / NOT NULL (o_orderdate)
* non-negativity (o_totalprice)
* domain / enum membership (o_orderstatus in its contract set)
* closed-range containment (o_orderdate within the corpus epoch)

Scale shape: the per-column checks share ONE combiner-friendly
aggregation over the fact scan (each check is a conditional count —
map-side partial, 1-row output each); the FK check is a broadcast
anti-join against the dimension key set; uniqueness is a keyed count
filtered to duplicates, bounded by the duplicate count (zero on a
healthy table). Nothing here scales worse than a full scan, which a
validation pass cannot avoid by definition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from jobminer_spark.registry import query
from jobminer_spark.sources import load_table

_STATUS_DOMAIN = ("F", "O", "P")
# closed corpus epoch: the generator's documented order-date range
_DATE_LO = "1990-01-01"
_DATE_HI = "2005-12-31"


@query(
    "dq_constraint_audit",
    oracle=f"""
    WITH n AS (SELECT COUNT(*) AS n_rows FROM orders),
    checks AS (
      SELECT 'pk_unique_orderkey' AS check_name,
             (SELECT n_rows FROM n) AS n_checked,
             (SELECT COALESCE(SUM(cnt), 0) FROM (
                SELECT COUNT(*) AS cnt FROM orders GROUP BY o_orderkey
                HAVING COUNT(*) > 1)) AS n_violations
      UNION ALL
      SELECT 'fk_custkey_exists',
             (SELECT n_rows FROM n),
             (SELECT COUNT(*) FROM orders o
              WHERE o.o_custkey IS NULL OR NOT EXISTS (
                SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey))
      UNION ALL
      SELECT 'not_null_orderdate',
             (SELECT n_rows FROM n),
             (SELECT COUNT(*) FROM orders WHERE o_orderdate IS NULL)
      UNION ALL
      SELECT 'nonnegative_totalprice',
             (SELECT n_rows FROM n),
             (SELECT COUNT(*) FROM orders WHERE o_totalprice < 0)
      UNION ALL
      SELECT 'status_in_domain',
             (SELECT n_rows FROM n),
             (SELECT COUNT(*) FROM orders
              WHERE o_orderstatus NOT IN ('F', 'O', 'P')
                 OR o_orderstatus IS NULL)
      UNION ALL
      SELECT 'orderdate_in_epoch',
             (SELECT n_rows FROM n),
             (SELECT COUNT(*) FROM orders
              WHERE o_orderdate < TIMESTAMP '{_DATE_LO} 00:00:00'
                 OR o_orderdate > TIMESTAMP '{_DATE_HI} 23:59:59')
    )
    SELECT check_name, CAST(n_checked AS BIGINT) AS n_checked,
           CAST(n_violations AS BIGINT) AS n_violations
    FROM checks
    """,
)
def dq_constraint_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The six-check suite as one hash-pinned relation. On the healthy
    fixture every n_violations is 0 — and that zero is the point: the
    oracle recomputes each count independently, so a loader
    regression that introduces orphans, dup keys, nulls, or domain
    escapes flips the driver row red before any downstream query
    consumes the table."""
    orders = load_table(spark, sf_dir, "orders")
    cust_keys = load_table(spark, sf_dir, "customer").select("c_custkey")

    n_rows = orders.agg(F.count(F.lit(1)).alias("n_checked"))

    def check(name: str, violations: DataFrame) -> DataFrame:
        return (
            violations.crossJoin(F.broadcast(n_rows))
            .select(
                F.lit(name).alias("check_name"),
                "n_checked",
                F.col("n_violations").cast("long"),
            )
        )

    nviol = F.count(F.lit(1)).alias("n_violations")
    dup_pk = check(
        "pk_unique_orderkey",
        orders.groupBy("o_orderkey")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") > 1)
        .agg(F.coalesce(F.sum("cnt"), F.lit(0)).alias("n_violations")),
    )
    orphan_fk = check(
        "fk_custkey_exists",
        orders.join(
            F.broadcast(cust_keys),
            orders.o_custkey == cust_keys.c_custkey,
            "left_anti",
        ).agg(nviol),
    )
    null_date = check(
        "not_null_orderdate",
        orders.filter(F.col("o_orderdate").isNull()).agg(nviol),
    )
    neg_price = check(
        "nonnegative_totalprice",
        orders.filter(F.col("o_totalprice") < 0).agg(nviol),
    )
    bad_status = check(
        "status_in_domain",
        orders.filter(
            ~F.col("o_orderstatus").isin(*_STATUS_DOMAIN)
            | F.col("o_orderstatus").isNull()
        ).agg(nviol),
    )
    out_of_epoch = check(
        "orderdate_in_epoch",
        orders.filter(
            (F.col("o_orderdate") < F.lit(f"{_DATE_LO} 00:00:00").cast("timestamp"))
            | (F.col("o_orderdate") > F.lit(f"{_DATE_HI} 23:59:59").cast("timestamp"))
        ).agg(nviol),
    )
    return (
        dup_pk.union(orphan_fk)
        .union(null_date)
        .union(neg_price)
        .union(bad_status)
        .union(out_of_epoch)
    )


@query(
    "dq_violation_injection_audit",
    oracle="""
    WITH tainted AS (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 100 = 7 THEN NULL ELSE o_custkey END
               AS o_custkey,
             CASE WHEN o_orderkey % 100 = 13 THEN -o_totalprice
                  ELSE o_totalprice END AS o_totalprice,
             CASE WHEN o_orderkey % 100 = 21 THEN 'X'
                  ELSE o_orderstatus END AS o_orderstatus
      FROM orders
    )
    SELECT
      (SELECT COUNT(*) FROM tainted WHERE o_custkey IS NULL)
        AS n_null_fk,
      (SELECT COUNT(*) FROM tainted t
        WHERE t.o_custkey IS NULL OR NOT EXISTS (
          SELECT 1 FROM customer c WHERE c.c_custkey = t.o_custkey))
        AS n_fk_violations,
      (SELECT COUNT(*) FROM tainted WHERE o_totalprice < 0)
        AS n_negative,
      (SELECT COUNT(*) FROM tainted
        WHERE o_orderstatus NOT IN ('F', 'O', 'P')) AS n_bad_status
    """,
)
def dq_violation_injection_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The detector proven ALIVE: deterministic fault injection (keyed
    on o_orderkey residues — nulled FKs, negated prices, out-of-domain
    statuses) run through the same violation predicates, with the
    oracle recomputing the injected counts. A suite that only ever
    reports zero on healthy data could be dead code; this row pins
    that each predicate actually fires (the streaming-parity
    philosophy applied to data quality)."""
    orders = load_table(spark, sf_dir, "orders")
    cust_keys = load_table(spark, sf_dir, "customer").select("c_custkey")
    tainted = orders.select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 100 == 7, F.lit(None))
        .otherwise(F.col("o_custkey"))
        .alias("o_custkey"),
        F.when(F.col("o_orderkey") % 100 == 13, -F.col("o_totalprice"))
        .otherwise(F.col("o_totalprice"))
        .alias("o_totalprice"),
        F.when(F.col("o_orderkey") % 100 == 21, F.lit("X"))
        .otherwise(F.col("o_orderstatus"))
        .alias("o_orderstatus"),
    )
    n = F.count(F.lit(1))
    null_fk = tainted.filter(F.col("o_custkey").isNull()).agg(
        n.alias("n_null_fk")
    )
    fk_viol = (
        tainted.join(
            F.broadcast(cust_keys),
            tainted.o_custkey == cust_keys.c_custkey,
            "left_anti",
        ).agg(n.alias("n_fk_violations"))
    )
    negative = tainted.filter(F.col("o_totalprice") < 0).agg(
        n.alias("n_negative")
    )
    bad_status = tainted.filter(
        ~F.col("o_orderstatus").isin(*_STATUS_DOMAIN)
    ).agg(n.alias("n_bad_status"))
    return (
        null_fk.crossJoin(F.broadcast(fk_viol))
        .crossJoin(F.broadcast(negative))
        .crossJoin(F.broadcast(bad_status))
    )
