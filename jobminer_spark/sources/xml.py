"""XML source surface (Spark 4 native ``from_xml`` — JVM-side, no
Python UDF): typed extraction of XML feed payloads, the structured-
markup counterpart of the HTML badge parser (the reference's listing
pages ARE markup; a job-feed XML export is the same data in its
machine-readable form — reference pracuj_scraper.py parses the human
form with bs4, this module parses the feed form declaratively).

Contract mirrors ``sources/files.py``: declared schema, PERMISSIVE
parsing, and a good/quarantine split — a row whose XML fails the
declared structure lands in the dead-letter stream with its raw text
instead of poisoning the batch. ``from_xml`` yields a NULL struct for
malformed payloads (it has no corrupt-record column), so the split keys off
the REQUIRED ``id`` attribute with the raw column carried alongside.

No DuckDB oracle exists for XML (tests-only surface, like the HTTP
fetch machinery); semantics are pinned by tests/test_file_sources.py
round-trips including malformed, truncated, and entity-bearing
payloads.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# The feed-item shape for a job-listing XML export:
#   <job id="123"><title>...</title><company>...</company>
#   <salary min="10" max="20"/><skills><skill>a</skill>...</skills></job>
JOB_XML_SCHEMA = T.StructType(
    [
        T.StructField("_id", T.LongType()),
        T.StructField("title", T.StringType()),
        T.StructField("company", T.StringType()),
        T.StructField(
            "salary",
            T.StructType(
                [
                    T.StructField("_min", T.LongType()),
                    T.StructField("_max", T.LongType()),
                ]
            ),
        ),
        T.StructField(
            "skills",
            T.StructType(
                [T.StructField("skill", T.ArrayType(T.StringType()))]
            ),
        ),
    ]
)


def parse_xml_column(
    df: DataFrame, col: str, schema: T.StructType = JOB_XML_SCHEMA
) -> DataFrame:
    """Typed extraction of an XML string column against a declared
    schema — ``from_xml`` stays JVM-side (attributes surface with the
    ``_`` prefix, repeated elements as arrays). The raw column is
    preserved for the quarantine split."""
    return df.withColumn("parsed", F.from_xml(F.col(col), schema))


def _is_bad(parsed: Column) -> Column:
    """Malformed XML parses to an all-NULL struct under PERMISSIVE
    from_xml (there is no corrupt-record column), so 'unparseable' is
    detected through the REQUIRED id attribute: a feed item without
    an id is invalid by the feed contract, and a payload that is not
    XML at all can never produce one."""
    return parsed.isNull() | parsed["_id"].isNull()


def good_xml_rows(df: DataFrame) -> DataFrame:
    """Rows whose payload parsed: the typed struct fields flattened,
    raw text dropped. (Takes no raw-column name on purpose — the good
    split never touches the raw column; ``bad_xml_rows`` does.)"""
    return (
        df.filter(~_is_bad(F.col("parsed")))
        .select(
            F.col("parsed._id").alias("job_id"),
            F.col("parsed.title").alias("title"),
            F.col("parsed.company").alias("company"),
            F.col("parsed.salary._min").alias("salary_min"),
            F.col("parsed.salary._max").alias("salary_max"),
            F.coalesce(
                F.col("parsed.skills.skill"),
                F.array().cast("array<string>"),
            ).alias("skills"),
        )
    )


def bad_xml_rows(df: DataFrame, col: str = "xml") -> DataFrame:
    """The quarantine stream: raw text of every payload that failed
    the declared structure, for a dead-letter sink."""
    return df.filter(_is_bad(F.col("parsed"))).select(F.col(col).alias("raw"))
