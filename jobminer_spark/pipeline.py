"""The composed JobMiner-equivalent DAG (SURVEY.md §3 entry point 1).

The reference materializes three times (scrape-all → classify-per-job →
insert-per-row); here the whole pipeline is ONE lazy DAG from scan to
sink: parse/project → skill mining (broadcast dictionary joins) →
explode to the child table → anti-join upsert → sink projection.
Shuffles only where semantics require: the per-doc grouping and the
upsert anti-join.

Fixture documents stand in for scraped job postings (the driver ships
no job_listings table): description_text := text, plus synthesized
salary/url columns — exactly the transform surface of the reference's
_parse_job_detail (pracuj_scraper.py:316-356).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from jobminer_spark.functions.text import (
    extract_job_id,
    extract_years_of_experience,
    salary_max_col,
    salary_min_col,
    truncate_to_widths,
)
from jobminer_spark.operators.dedupe import upsert_new_keys
from jobminer_spark.operators.skills import resolved_dictionary, tokenize
from jobminer_spark.schemas import JOB_LISTING_WIDTHS, SKILL_WIDTHS
from jobminer_spark.sources import load_table


def documents_as_job_postings(docs: DataFrame) -> DataFrame:
    """documents fixture → job-posting-shaped frame (deterministic)."""
    base = F.floor(F.col("n_chars") * 37 % 20000 + 4000).cast("bigint")
    return docs.select(
        F.col("doc_id"),
        F.concat(F.lit("https://www.pracuj.pl/praca/x,oferta,"), F.col("doc_id")).alias("link"),
        F.col("text").alias("description_text"),
        F.col("source"),
        F.format_string("%d – %d zł", base, base + 3000).alias("salary_text"),
        F.concat(F.lit("requires "), (F.col("doc_id") % 7).cast("string"), F.lit(" years")).alias("requirements_text"),
    )


def parse_listings(postings: DataFrame) -> DataFrame:
    """The projection layer of the reference's parse step: id from URL,
    salary range, years of experience, status stamping."""
    return postings.select(
        extract_job_id(F.col("link")).alias("job_id"),
        "source",
        "link",
        salary_min_col(F.col("salary_text")).alias("salary_min"),
        salary_max_col(F.col("salary_text")).alias("salary_max"),
        extract_years_of_experience(F.col("requirements_text")).alias(
            "years_of_experience"
        ),
        "description_text",
        F.current_timestamp().alias("scrape_date"),
        F.lit("Active").alias("listing_status"),
    )


def mine_skills(listings: DataFrame, spark: SparkSession) -> DataFrame:
    """Token-explode + broadcast dictionary join → per-job skill rows
    (job_id, source, skill_name, skill_category) — the reference's
    classify-and-flatten (scraper.py:14-34) as one shuffle."""
    dim = resolved_dictionary(spark)
    toks = tokenize(
        listings.select(
            F.col("job_id").alias("doc_id"), F.col("description_text").alias("text")
        )
    )
    hits = toks.join(F.broadcast(dim), toks.token == dim.term).select(
        F.col("doc_id").alias("job_id"),
        F.col("token").alias("skill_name"),
        F.col("category").alias("skill_category"),
    )
    keyed = listings.select("job_id", "source").join(hits, "job_id")
    return keyed.dropDuplicates(["job_id", "source", "skill_name"])


def run_pipeline(
    spark: SparkSession,
    sf_dir: str,
    existing_jobs: DataFrame | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Full DAG: returns (job_listings, skills) ready for a sink.
    Pass `existing_jobs` to get idempotent re-run semantics (the
    reference's "checkpoint": dedup-on-insert, README.md:12)."""
    docs = load_table(spark, sf_dir, "documents")
    listings = parse_listings(documents_as_job_postings(docs))
    if existing_jobs is not None:
        listings = upsert_new_keys(listings, existing_jobs, ["job_id", "source"])
    else:
        listings = listings.dropDuplicates(["job_id", "source"])
    skills = mine_skills(listings, spark)
    return (
        truncate_to_widths(listings, JOB_LISTING_WIDTHS),
        truncate_to_widths(skills, SKILL_WIDTHS),
    )


def flagship_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 most-demanded skill categories — the §7 step-1 flagship:
    filter → explode → broadcast-classify → group → rank → limit."""
    _, skills = run_pipeline(spark, sf_dir)
    return (
        skills.groupBy("skill_category")
        .agg(
            F.countDistinct("job_id").alias("n_jobs"),
            F.count(F.lit(1)).alias("n_mentions"),
        )
        .orderBy(F.col("n_mentions").desc(), F.col("skill_category"))
        .limit(10)
    )
