"""The SQL-text API surface: the engine's tables exposed as views and
queried with ``spark.sql(...)`` strings — the interface half of
"DataFrame/SQL" that everything else in the repo expresses through the
DataFrame DSL. A user of the reference who writes SQL (the reference's
own persistence layer is hand-written T-SQL, database.py:106-158)
gets the same Catalyst plans from text; these queries attest that
path end-to-end against the same DuckDB oracles.

The Spark SQL text and the DuckDB oracle SQL are DELIBERATELY not the
same string: each is written in its engine's native dialect (Spark's
``div``/backtick-free identifiers vs DuckDB's ``//``), so the parity
pin covers dialect-correct translation, not string echo.

Scale shape: identical to the DataFrame twins — SQL text resolves to
the same logical plans (scan pushdown, broadcast dimension joins,
partial aggregation), which the plan tests on the DataFrame side
already assert.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F  # noqa: F401 (API parity)

from jobminer_spark.registry import query
from jobminer_spark.sources import load_table

_SQL_TABLES = ("lineitem", "orders", "customer", "events")


def _register_views(spark: SparkSession, sf_dir: str) -> str:
    """Register per-sf temp views (suffixed, so two fixture scales in
    one session never alias) and return the suffix."""
    tag = sf_dir.rstrip("/").rsplit("sf", 1)[-1].replace(".", "_")
    for t in _SQL_TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(f"{t}_v{tag}")
    return tag


@query(
    "sql_text_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
           CAST(SUM(CAST(FLOOR(l_extendedprice * 100.0) AS BIGINT)) AS BIGINT)
             AS sum_base_cents,
           CAST(COUNT(*) AS BIGINT) AS count_order
    FROM lineitem
    WHERE l_shipdate <= DATE '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def sql_text_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q1's shape submitted as LITERAL SQL text over a
    registered view — scan pushdown, integer-cents aggregation, and
    grouping all through the ``spark.sql`` entry point."""
    tag = _register_views(spark, sf_dir)
    return spark.sql(f"""
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
               SUM(CAST(FLOOR(l_extendedprice * 100.0) AS BIGINT))
                 AS sum_base_cents,
               COUNT(*) AS count_order
        FROM lineitem_v{tag}
        WHERE l_shipdate <= DATE '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
    """)


@query(
    "sql_text_window_running_revenue",
    oracle="""
    WITH o AS (
      SELECT o_custkey, o_orderkey,
             CAST(FLOOR(o_totalprice * 100.0) AS BIGINT) AS cents
      FROM orders
    )
    SELECT o_custkey, o_orderkey,
           CAST(SUM(cents) OVER (
             PARTITION BY o_custkey ORDER BY o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS running_cents
    FROM o
    """,
)
def sql_text_window_running_revenue(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Window functions through SQL text: per-customer running revenue
    in integer cents under the unique (o_orderkey) order — the
    windowed-aggregation surface via ``spark.sql``."""
    tag = _register_views(spark, sf_dir)
    return spark.sql(f"""
        SELECT o_custkey, o_orderkey,
               SUM(cents) OVER (
                 PARTITION BY o_custkey ORDER BY o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS running_cents
        FROM (
          SELECT o_custkey, o_orderkey,
                 CAST(FLOOR(o_totalprice * 100.0) AS BIGINT) AS cents
          FROM orders_v{tag}
        )
    """)


@query(
    "sql_text_join_agg_subquery",
    oracle="""
    SELECT c.c_mktsegment AS segment,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(FLOOR(o.o_totalprice * 100.0) AS BIGINT)) AS BIGINT)
             AS revenue_cents
    FROM orders o
    JOIN customer c ON c.c_custkey = o.o_custkey
    WHERE CAST(FLOOR(o.o_totalprice * 100.0) AS BIGINT)
            * (SELECT COUNT(*) FROM orders)
          > (SELECT SUM(CAST(FLOOR(o_totalprice * 100.0) AS BIGINT))
             FROM orders)
    GROUP BY c.c_mktsegment
    """,
)
def sql_text_join_agg_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join + scalar subqueries + aggregation through SQL text:
    orders above the global average price — the threshold compared as
    the exact cross-multiplied integer rational (cents·N > Σcents),
    never a float AVG whose summation order is engine-dependent —
    grouped by customer segment; the dimension join broadcasts exactly
    as the DataFrame twins do (same Catalyst planning from either
    front end)."""
    tag = _register_views(spark, sf_dir)
    return spark.sql(f"""
        SELECT c.c_mktsegment AS segment,
               COUNT(*) AS n_orders,
               SUM(CAST(FLOOR(o.o_totalprice * 100.0) AS BIGINT))
                 AS revenue_cents
        FROM orders_v{tag} o
        JOIN customer_v{tag} c ON c.c_custkey = o.o_custkey
        WHERE CAST(FLOOR(o.o_totalprice * 100.0) AS BIGINT)
                * (SELECT COUNT(*) FROM orders_v{tag})
              > (SELECT SUM(CAST(FLOOR(o_totalprice * 100.0) AS BIGINT))
                 FROM orders_v{tag})
        GROUP BY c.c_mktsegment
    """)
