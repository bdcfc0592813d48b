"""jobminer_spark — a PySpark-native analytics engine.

Re-expresses the query / data-processing capabilities of the reference
ETL pipeline (Steamahead/JobMiner, surveyed in SURVEY.md) as idiomatic
Spark DataFrame operators, and extends the same surface with the
operators a large-scale training-data pipeline needs (dedup, similarity
search, text analysis, multimodal plumbing).

Design stance (SURVEY.md §7):
  * DataFrame/SQL first — Catalyst sees through every operator.
  * UDFs only where built-ins genuinely can't express the semantics
    (HTML parse, multimodal decode) and then only Arrow-vectorized.
  * Every operator registered in the query registry ships with a DuckDB
    oracle SQL string so the driver's differential harness can verify it.
"""

from jobminer_spark.registry import QUERIES, ORACLES, load_all_operators

__all__ = ["QUERIES", "ORACLES", "load_all_operators"]
