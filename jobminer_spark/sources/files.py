"""CSV / JSON-lines sources with DECLARED schemas.

The reference declares its schema twice (dataclasses `models.py:8-23`
and DDL `database.py:54-88`) and never infers; the engine keeps that
discipline for file sources: `inferSchema` requires a full extra pass
over the data (prohibitive at 100 TB) and can silently flip types
between runs. Every reader here takes an explicit StructType; a row
that doesn't parse lands in the PERMISSIVE corrupt-record column
instead of killing the job, and `bad_rows` isolates them for a
quarantine sink.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CORRUPT_COL = "_corrupt_record"


def _with_corrupt(schema: T.StructType) -> T.StructType:
    if CORRUPT_COL in schema.fieldNames():
        return schema
    return T.StructType(list(schema.fields) + [T.StructField(CORRUPT_COL, T.StringType())])


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    header: bool = True,
    **options: str,
) -> DataFrame:
    """CSV scan with a declared schema and corrupt-record capture.

    Column pruning still reaches the reader (CSV supports it), and
    the declared schema means ONE pass, no sampling job.
    """
    return (
        spark.read.schema(_with_corrupt(schema))
        .option("header", str(header).lower())
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .options(**options)
        .csv(path)
    )


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    **options: str,
) -> DataFrame:
    """JSON-lines scan with a declared schema (one object per line —
    the splittable layout; multiline JSON can't be partitioned)."""
    return (
        spark.read.schema(_with_corrupt(schema))
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .options(**options)
        .json(path)
    )


def good_rows(df: DataFrame, materialize: bool = True) -> DataFrame:
    """Rows that parsed clean, with the bookkeeping column dropped.

    `materialize=True` caches `df` (see `bad_rows` for why); the CALLER
    owns the cache lifetime and should `df.unpersist()` once both
    splits are consumed. Pass `materialize=False` if the frame is
    already persisted/checkpointed upstream.
    """
    if CORRUPT_COL not in df.columns:
        return df
    if materialize:
        df.cache()
    return df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)


def bad_rows(df: DataFrame, materialize: bool = True) -> DataFrame:
    """The quarantine stream: raw text of every row that failed the
    declared schema, for a dead-letter sink.

    Spark refuses a scan that references ONLY the corrupt-record
    column (QUERY_ONLY_CORRUPT_RECORD_COLUMN), so the frame must be
    cached first — also the right production shape: parse once,
    materialize, then split good/quarantine from the same pass. The
    CALLER owns the cache lifetime (`df.unpersist()` when done);
    pass `materialize=False` if it is already persisted upstream.
    """
    if materialize:
        df.cache()
    return df.filter(F.col(CORRUPT_COL).isNotNull()).select(
        F.col(CORRUPT_COL).alias("raw")
    )


def parse_json_column(df: DataFrame, col: str, schema: T.StructType) -> DataFrame:
    """Typed extraction of an embedded JSON string column (the events
    fixture's `props` shape) — `from_json` stays JVM-side."""
    return df.withColumn(col, F.from_json(F.col(col), schema))
