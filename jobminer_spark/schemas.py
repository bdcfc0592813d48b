"""Explicit StructType schemas for every table the engine touches.

Fixed/static schemas mirror the reference's DDL-at-startup stance
(reference: JobScraper/database.py:39-104 declares both tables up
front; no inference, no evolution). The engine never uses
``inferSchema`` — fixture parquet carries its own footer schema, and
the reference-shaped tables are declared here.
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Driver fixture tables (/root/testdata/sf*/..., FIXTURES.md §A)
# ---------------------------------------------------------------------------

REGION = T.StructType([
    T.StructField("r_regionkey", T.IntegerType()),
    T.StructField("r_name", T.StringType()),
])

NATION = T.StructType([
    T.StructField("n_nationkey", T.IntegerType()),
    T.StructField("n_name", T.StringType()),
    T.StructField("n_regionkey", T.IntegerType()),
])

CUSTOMER = T.StructType([
    T.StructField("c_custkey", T.LongType()),
    T.StructField("c_name", T.StringType()),
    T.StructField("c_nationkey", T.IntegerType()),
    T.StructField("c_acctbal", T.DoubleType()),
    T.StructField("c_mktsegment", T.StringType()),
])

SUPPLIER = T.StructType([
    T.StructField("s_suppkey", T.LongType()),
    T.StructField("s_name", T.StringType()),
    T.StructField("s_nationkey", T.IntegerType()),
    T.StructField("s_acctbal", T.DoubleType()),
])

PART = T.StructType([
    T.StructField("p_partkey", T.LongType()),
    T.StructField("p_name", T.StringType()),
    T.StructField("p_brand", T.StringType()),
    T.StructField("p_type", T.StringType()),
    T.StructField("p_size", T.IntegerType()),
    T.StructField("p_retailprice", T.DoubleType()),
])

ORDERS = T.StructType([
    T.StructField("o_orderkey", T.LongType()),
    T.StructField("o_custkey", T.LongType()),
    T.StructField("o_orderstatus", T.StringType()),
    T.StructField("o_totalprice", T.DoubleType()),
    T.StructField("o_orderdate", T.TimestampType()),
    T.StructField("o_orderpriority", T.StringType()),
])

LINEITEM = T.StructType([
    T.StructField("l_orderkey", T.LongType()),
    T.StructField("l_partkey", T.LongType()),
    T.StructField("l_suppkey", T.LongType()),
    T.StructField("l_linenumber", T.IntegerType()),
    T.StructField("l_quantity", T.DoubleType()),
    T.StructField("l_extendedprice", T.DoubleType()),
    T.StructField("l_discount", T.DoubleType()),
    T.StructField("l_tax", T.DoubleType()),
    T.StructField("l_returnflag", T.StringType()),
    T.StructField("l_linestatus", T.StringType()),
    T.StructField("l_shipdate", T.TimestampType()),
])

EVENTS = T.StructType([
    T.StructField("event_id", T.LongType()),
    T.StructField("ts", T.TimestampType()),
    T.StructField("user_id", T.LongType()),
    T.StructField("event_type", T.StringType()),
    T.StructField("value", T.DoubleType()),
    T.StructField("props", T.StringType()),
])

DOCUMENTS = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("text", T.StringType()),
    T.StructField("lang", T.StringType()),
    T.StructField("source", T.StringType()),
    T.StructField("n_chars", T.LongType()),
])

EMBEDDINGS = T.StructType([
    T.StructField("vec_id", T.LongType()),
    T.StructField("embedding", T.ArrayType(T.FloatType())),
    T.StructField("label", T.IntegerType()),
])

FIXTURE_SCHEMAS: dict[str, T.StructType] = {
    "region": REGION,
    "nation": NATION,
    "customer": CUSTOMER,
    "supplier": SUPPLIER,
    "part": PART,
    "orders": ORDERS,
    "lineitem": LINEITEM,
    "events": EVENTS,
    "documents": DOCUMENTS,
    "embeddings": EMBEDDINGS,
}

# ---------------------------------------------------------------------------
# Reference-shaped tables (reference: JobScraper/models.py:5-32 and
# JobScraper/database.py:54-88 — NVARCHAR widths documented in
# functions/text.py truncation helpers)
# ---------------------------------------------------------------------------

JOB_LISTINGS = T.StructType([
    T.StructField("job_id", T.StringType(), False),       # natural key part
    T.StructField("source", T.StringType(), False),       # union discriminator
    T.StructField("title", T.StringType()),
    T.StructField("company", T.StringType()),
    T.StructField("link", T.StringType()),
    T.StructField("salary_min", T.IntegerType()),
    T.StructField("salary_max", T.IntegerType()),
    T.StructField("salary_text", T.StringType()),
    T.StructField("location", T.StringType()),
    T.StructField("operating_mode", T.StringType()),
    T.StructField("work_type", T.StringType()),
    T.StructField("experience_level", T.StringType()),
    T.StructField("employment_type", T.StringType()),
    T.StructField("years_of_experience", T.IntegerType()),
    T.StructField("description_text", T.StringType()),
    T.StructField("scrape_date", T.TimestampType()),
    T.StructField("listing_status", T.StringType()),
])

SKILLS = T.StructType([
    T.StructField("job_id", T.StringType(), False),
    T.StructField("short_id", T.IntegerType()),
    T.StructField("source", T.StringType(), False),
    T.StructField("skill_name", T.StringType(), False),
    T.StructField("skill_category", T.StringType()),
])

# Column width caps from the reference DDL (database.py:54-88), applied
# by the sink-prep projection (reference _truncate, database.py:11-15).
JOB_LISTING_WIDTHS: dict[str, int] = {
    "job_id": 100,
    "source": 50,
    "title": 255,
    "company": 255,
    "link": 500,
    "location": 255,
    "operating_mode": 50,
    "work_type": 50,
    "experience_level": 50,
    "employment_type": 50,
    "listing_status": 20,
}

SKILL_WIDTHS: dict[str, int] = {
    "job_id": 100,
    "source": 50,
    "skill_name": 100,
    "skill_category": 50,
}
