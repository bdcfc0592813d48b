"""Skill-dictionary helpers shared by operator modules (NO @query
registrations here — see operators/common.py for why helper modules
must stay registration-free: registration order must follow
``registry._OPERATOR_MODULES`` exactly so the driver's 50-entry
CORRECTNESS window lands where intended).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from jobminer_spark.data.skill_dictionary import (
    dictionary_rows,
    values_df,
    variation_rows,
)


def _sql_quote(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def _dict_values_sql() -> str:
    return ",\n      ".join(
        f"({_sql_quote(t)}, {_sql_quote(c)}, {r})" for t, c, r in dictionary_rows()
    )


def _variation_values_sql() -> str:
    return ",\n      ".join(
        f"({_sql_quote(v)}, {_sql_quote(c)})" for v, c in variation_rows()
    )


_DICT_CTE = f"""
    dict(term, category, category_rank) AS (VALUES
      {_dict_values_sql()}
    ),
    resolved_dict AS (
      SELECT term, min_by(category, category_rank) AS category
      FROM dict GROUP BY term
    )
"""

_TOKENS_CTE = """
    tokens AS (
      SELECT DISTINCT doc_id, lower(tok) AS token FROM (
        SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
      ) WHERE tok <> ''
    )
"""


def tokenize(docs: DataFrame) -> DataFrame:
    """documents(text) -> distinct (doc_id, token); the explode/UNNEST
    shape of the reference's word iteration (SURVEY.md §2 row 35).

    The fixture parquet is a single row-group, which would serialize
    the explode onto one task — repartition by doc_id first so token
    generation parallelizes (cheap: pre-explode rows are narrow)."""
    return (
        docs.repartition("doc_id")
        .select(
            "doc_id",
            F.explode(F.split(F.col("text"), " ")).alias("tok"),
        )
        .filter(F.col("tok") != "")
        .select("doc_id", F.lower(F.col("tok")).alias("token"))
        .distinct()
    )


def resolved_dictionary(spark: SparkSession) -> DataFrame:
    """term -> single category, first-match-wins (deterministic
    replacement for the reference's dict-order scan, scraper.py:20-24).

    The dictionary is static data, so the resolution runs in plain
    Python at DataFrame-build time — the dim arrives as a local
    relation ready to broadcast, no shuffle, no per-query agg. The
    equivalent relational resolution (min_by over category_rank) is
    exercised by the dict_first_match_resolution oracle query."""
    first: dict[str, str] = {}
    for term, category, _rank in dictionary_rows():
        first.setdefault(term, category)
    return values_df(spark, sorted(first.items()), ["term", "category"])
