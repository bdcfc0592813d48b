"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All queries live in the jobminer_spark package; each operator module
registers its Spark implementation and DuckDB oracle SQL side by side
(jobminer_spark/registry.py).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from jobminer_spark import ORACLES, QUERIES, load_all_operators

load_all_operators()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Full JobMiner-equivalent DAG (jobminer_spark/pipeline.py): parse →
    skill mining via broadcast dictionary join → explode → dedup →
    top-10 demanded skill categories.
    """
    from jobminer_spark.pipeline import flagship_query

    return flagship_query(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query; keys missing here (vs queries())
    are genuinely non-SQL-expressible ops → rows-only check."""
    return dict(ORACLES)
