"""Avro + Iceberg format audits: the pure-Python codecs
(sources/avro.py, sources/iceberg.py) exercised end-to-end through
Spark and pinned against oracles that recompute everything from the
raw events the fixtures derive from.

Together with deltaaudit.py these close VERDICT r14's two remaining
format gaps as far as an offline sandbox allows: the Avro SOURCE
(missing item 5 — "spark-avro jar absent") now reads/writes real
container files with a distributed one-task-per-file decode, and the
Iceberg half of item 1 walks the spec's full metadata chain
(version-hint → metadata JSON → snapshot → manifest-list Avro →
manifest Avro → parquet) with snapshot time travel. The writers are
fixture-grade (module docstrings state the subsets); the READERS are
the deliverable — they consume the open formats' layouts directly.

Scenario (one build per session+sf): an events-derived frame
(event_id, user_id, event_type, val_q) written as a 4-file Avro
dataset with a null-able value column, and an Iceberg table built as
two snapshots (event_id%3∈{0,1} then %3==2) so time travel has a
past to read.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from jobminer_spark.operators.common import scenario_workdir, source_fingerprint
from jobminer_spark.registry import query
from jobminer_spark.sources import load_table
from jobminer_spark.sources.avro import read_avro, write_avro_dataset
from jobminer_spark.sources.iceberg import (
    iceberg_snapshots,
    read_iceberg,
    write_iceberg,
)

_SCENARIO_CACHE: dict[tuple[str, str, str], dict] = {}

_ROWS_CTE = """
    rows AS (
      SELECT event_id, user_id, event_type,
             CAST(FLOOR(value * 100.0) AS BIGINT) AS val_q
      FROM events
    )"""


def _rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "event_type",
        F.floor(F.col("value") * 100.0).cast("long").alias("val_q"),
    )


def _scenario(spark: SparkSession, sf_dir: str) -> dict:
    # fingerprint-keyed (ADVICE r14's stale-cache rule): a rewritten
    # dataset under the same path gets a fresh root and fresh results
    fp = source_fingerprint(sf_dir, "events")
    cache_key = (spark.sparkContext.applicationId, sf_dir, fp)
    if cache_key in _SCENARIO_CACHE:
        return _SCENARIO_CACHE[cache_key]
    work = scenario_workdir(spark, sf_dir, "jm_fmt_", fp)
    rows = _rows(spark, sf_dir)

    avro_dir = os.path.join(work, "avro_ds")
    n_files = write_avro_dataset(spark, rows.repartition(4), avro_dir)

    ice = os.path.join(work, "ice")
    s1 = write_iceberg(spark, ice, rows.filter(F.col("event_id") % 3 < 2))
    s2 = write_iceberg(spark, ice, rows.filter(F.col("event_id") % 3 == 2))

    result = {
        "avro_dir": avro_dir,
        "n_avro_files": n_files,
        "ice": ice,
        "s1": s1,
        "s2": s2,
    }
    _SCENARIO_CACHE[cache_key] = result
    return result


@query(
    "avro_roundtrip_audit",
    oracle=f"""
    WITH {_ROWS_CTE}
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(val_q) AS BIGINT) AS ck,
           CAST(COUNT(*) - COUNT(val_q) AS BIGINT) AS n_null_vals,
           CAST(4 AS BIGINT) AS n_files
    FROM rows GROUP BY event_type
    """,
)
def avro_roundtrip_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events → a 4-file Avro dataset (executor-side spec encoding,
    deflate blocks, null-union for the nullable value column) → the
    distributed one-task-per-file decode → per-type counts, integer
    checksums, and the NULL population — all recomputed by the oracle
    from the raw table, so a codec that drops nulls, misreads zigzag
    longs, or loses a block goes red; the file count pins the
    per-partition writer."""
    s = _scenario(spark, sf_dir)
    return (
        read_avro(spark, s["avro_dir"])
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("val_q").cast("long").alias("ck"),
            (F.count(F.lit(1)) - F.count("val_q"))
            .cast("long")
            .alias("n_null_vals"),
        )
        .selectExpr(
            "event_type",
            "n",
            "ck",
            "n_null_vals",
            f"CAST({s['n_avro_files']} AS BIGINT) AS n_files",
        )
    )


@query(
    "iceberg_metadata_read_audit",
    oracle=f"""
    WITH {_ROWS_CTE}
    SELECT CAST(2 AS BIGINT) AS n_snapshots,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM rows) AS n_current,
           (SELECT CAST(SUM(val_q) AS BIGINT) FROM rows) AS ck_current,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM rows
             WHERE event_id % 3 < 2) AS n_snap1,
           (SELECT CAST(SUM(val_q) AS BIGINT) FROM rows
             WHERE event_id % 3 < 2) AS ck_snap1
    """,
)
def iceberg_metadata_read_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Two Iceberg snapshots read back through the FULL metadata chain
    — version hint → metadata JSON → manifest-list Avro → manifest
    Avro → parquet: the current snapshot must see both commits and
    snapshot-1 time travel only the first, with counts and checksums
    recomputed from raw events. A reader that mis-walks the chain,
    misparses the Avro manifests, or resolves the wrong snapshot goes
    red."""
    s = _scenario(spark, sf_dir)
    n_snapshots = len(iceberg_snapshots(s["ice"]))
    cur = read_iceberg(spark, s["ice"]).agg(
        F.count(F.lit(1)).cast("long").alias("n_current"),
        F.sum("val_q").cast("long").alias("ck_current"),
    )
    old = read_iceberg(spark, s["ice"], snapshot_id=s["s1"]).agg(
        F.count(F.lit(1)).cast("long").alias("n_snap1"),
        F.sum("val_q").cast("long").alias("ck_snap1"),
    )
    return (
        cur.crossJoin(F.broadcast(old))
        .selectExpr(
            f"CAST({n_snapshots} AS BIGINT) AS n_snapshots",
            "n_current",
            "ck_current",
            "n_snap1",
            "ck_snap1",
        )
    )
