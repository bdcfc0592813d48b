"""XML feed ingestion as a driver-attestable query (VERDICT r8 item 4
— sources/xml.py was the one r8 surface outside the attestation
regime).

The reference consumes job listings as markup (pracuj_scraper.py
parses the human HTML form with bs4; models.py:9's source
discriminator implies multiple feed shapes, SURVEY §2.8). This module
round-trips that contract end-to-end: a deterministic XML feed is
DERIVED from the documents fixture in-plan (format_string — pure
JVM), parsed back through the Spark-4-native ``from_xml`` path in
sources/xml.py with its good/quarantine split, and aggregated. The
DuckDB oracle never parses XML — it recomputes every aggregate
directly from the same documents rows, so the encode→parse→extract
round trip must be lossless (including a quoted entity: ``&amp;``
must decode to ``&``) for the hash to match.

Scale: the feed derivation, parse, and split are all per-row
narrow work; the audit ends in one global aggregate. At 100 TB the
same plan applies per-file with no shuffle before the final combine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from jobminer_spark.registry import query
from jobminer_spark.sources import load_table
from jobminer_spark.sources.xml import (
    bad_xml_rows,
    good_xml_rows,
    parse_xml_column,
)


def documents_as_xml_feed(docs: DataFrame) -> DataFrame:
    """Encode each document as a feed item ``<job id=..>`` payload.

    Deterministic per-row derivation covering every schema surface of
    sources/xml.py: attributes (id, salary min/max), nested elements,
    a repeated element with VARYING cardinality (1 skill when
    doc_id%4==0, else 2 — exercises single-occurrence-to-array), an
    XML entity in the title for doc_id%10==7, and two malformed
    shapes — a truncated fragment missing the required id
    (doc_id%10==3) and a non-XML payload (doc_id%10==6) — that must
    land in quarantine."""
    d = F.col("doc_id")
    mn = F.col("n_chars") % 100
    title = (
        F.when(d % 10 == 7, F.format_string("t&amp;%d", d))
        .otherwise(F.format_string("t%d", d))
    )
    skills = (
        F.when(d % 4 == 0, F.format_string("<skill>s%d</skill>", d % 7))
        .otherwise(
            F.format_string(
                "<skill>s%d</skill><skill>s%d</skill>", d % 7, (d * 3 + 1) % 7
            )
        )
    )
    # XML-escape the interpolated source value (& first, then < >):
    # from_xml entity-decodes on parse, so the oracle still sees the
    # raw source — but WITHOUT this, a fixture regeneration emitting
    # a metacharacter would silently push 'good' rows into quarantine
    # and break parity. Escaping is injective, so COUNT(DISTINCT)
    # over the decoded company is unaffected.
    company = F.replace(
        F.replace(
            F.replace(F.col("source"), F.lit("&"), F.lit("&amp;")),
            F.lit("<"),
            F.lit("&lt;"),
        ),
        F.lit(">"),
        F.lit("&gt;"),
    )
    well_formed = F.format_string(
        '<job id="%d"><title>%s</title><company>%s</company>'
        '<salary min="%d" max="%d"/><skills>%s</skills></job>',
        d,
        title,
        company,
        mn,
        mn + 50,
        skills,
    )
    payload = (
        F.when(d % 10 == 3, F.lit("<job><title>broken"))
        .when(d % 10 == 6, F.format_string("not xml %d", d))
        .otherwise(well_formed)
    )
    return docs.select("doc_id", payload.alias("xml"))


@query(
    "xml_feed_parse_audit",
    oracle="""
    WITH good AS (
      SELECT doc_id, source, n_chars % 100 AS mn
      FROM documents WHERE doc_id % 10 NOT IN (3, 6)
    )
    SELECT
      (SELECT COUNT(*) FROM good) AS n_good,
      (SELECT COUNT(*) FROM documents
        WHERE doc_id % 10 IN (3, 6)) AS n_quarantined,
      (SELECT CAST(SUM(mn) AS BIGINT) FROM good) AS sum_salary_min,
      (SELECT CAST(SUM(mn + 50) AS BIGINT) FROM good) AS sum_salary_max,
      (SELECT CAST(SUM(CASE WHEN doc_id % 4 = 0 THEN 1 ELSE 2 END)
                   AS BIGINT) FROM good) AS n_skills_total,
      (SELECT COUNT(*) FROM good WHERE doc_id % 10 = 7) AS n_entity_titles,
      (SELECT COUNT(DISTINCT source) FROM good) AS n_companies
    """,
)
def xml_feed_parse_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feed round-trip audit: documents → XML payloads → from_xml →
    good/quarantine split → aggregates. The oracle recomputes the
    expected aggregates straight from documents (no XML involved), so
    a parse regression anywhere — attribute extraction, repeated-
    element arrays, entity decoding, quarantine routing — flips this
    row red."""
    feed = documents_as_xml_feed(load_table(spark, sf_dir, "documents"))
    parsed = parse_xml_column(feed, "xml")
    good = good_xml_rows(parsed)
    good_agg = good.agg(
        F.count(F.lit(1)).alias("n_good"),
        F.sum("salary_min").alias("sum_salary_min"),
        F.sum("salary_max").alias("sum_salary_max"),
        F.sum(F.size("skills")).cast("long").alias("n_skills_total"),
        F.count(F.when(F.col("title").contains("&"), 1)).alias(
            "n_entity_titles"
        ),
        F.count_distinct("company").alias("n_companies"),
    )
    bad_agg = bad_xml_rows(parsed).agg(
        F.count(F.lit(1)).alias("n_quarantined")
    )
    # two 1-row aggregates — a trivial broadcast cross join
    return good_agg.crossJoin(bad_agg).select(
        "n_good",
        "n_quarantined",
        "sum_salary_min",
        "sum_salary_max",
        "n_skills_total",
        "n_entity_titles",
        "n_companies",
    )
