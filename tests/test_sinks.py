"""Sink behavior: partitioned parquet round-trip, width truncation at
the sink boundary, DDL-on-start via managed tables."""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import functions as F

from jobminer_spark.functions.text import truncate_to_widths
from jobminer_spark.schemas import JOB_LISTING_WIDTHS
from jobminer_spark.sources import load_table
from tests.conftest import SF_DIR


def test_partitioned_parquet_roundtrip(spark):
    tmp = tempfile.mkdtemp(prefix="pq_")
    try:
        o = load_table(spark, SF_DIR, "orders")
        o.write.mode("overwrite").partitionBy("o_orderstatus").parquet(f"{tmp}/orders")
        back = spark.read.parquet(f"{tmp}/orders")
        assert back.count() == o.count()
        # partition pruning: the status filter becomes a partition filter
        one = back.filter(F.col("o_orderstatus") == "O")
        assert one.count() == o.filter(F.col("o_orderstatus") == "O").count()
        from jobminer_spark.plans import physical_plan

        assert "PartitionFilters" in physical_plan(one)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_orc_roundtrip_with_predicate_pushdown(spark):
    """ORC sink/source round-trip: values survive bit-exactly and a
    filter over the read-back table reaches the ORC scan as a pushed
    filter (same columnar contract as parquet)."""
    tmp = tempfile.mkdtemp(prefix="orc_")
    try:
        from jobminer_spark.plans import physical_plan
        from jobminer_spark.sinks import write_orc

        o = load_table(spark, SF_DIR, "orders").select(
            "o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus"
        )
        write_orc(o, f"{tmp}/orders", mode="overwrite")
        back = spark.read.orc(f"{tmp}/orders")
        assert sorted(map(tuple, back.collect())) == sorted(map(tuple, o.collect()))
        filtered = back.filter(F.col("o_orderkey") == 7)
        plan = physical_plan(filtered)
        pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
        assert pushed and "o_orderkey" in pushed[0]
        assert filtered.count() == o.filter(F.col("o_orderkey") == 7).count()
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_sink_projection_truncates_to_ddl_widths(spark):
    df = spark.range(1).select(
        F.lit("j" * 300).alias("job_id"),
        F.lit("s" * 80).alias("source"),
        F.lit("t" * 300).alias("title"),
    )
    out = truncate_to_widths(df, JOB_LISTING_WIDTHS).collect()[0]
    assert len(out.job_id) == 100 and len(out.source) == 50 and len(out.title) == 255


def test_ddl_on_start_managed_table(spark):
    """CREATE TABLE IF NOT EXISTS — the reference's startup DDL
    (database.py:39-104) as a catalog operation; re-running is a
    no-op, append accumulates."""
    spark.sql("DROP TABLE IF EXISTS job_listings_t")
    ddl = """
      CREATE TABLE IF NOT EXISTS job_listings_t (
        job_id STRING, source STRING, title STRING, salary_min INT
      ) USING parquet
    """
    spark.sql(ddl)
    spark.sql(ddl)  # idempotent
    spark.sql("INSERT INTO job_listings_t VALUES ('1', 'pracuj.pl', 't', 100)")
    assert spark.table("job_listings_t").count() == 1
    spark.sql("DROP TABLE job_listings_t")
