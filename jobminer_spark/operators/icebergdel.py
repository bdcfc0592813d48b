"""Iceberg format-v2 row-level-delete (position + equality) and
snapshot-expiration audits: deletes and metadata maintenance through
the chain, oracle-pinned.

Completes the r16 row-level-delete pair: Delta's deletion vectors
(operators/deltadv.py) and Iceberg's position deletes share the same
Spark execution shape — an anti-join of (file, row-position) pairs
against the scan's generated `_metadata.row_index` — but arrive
through entirely different metadata: Delta inlines a roaring bitmap
per add action; Iceberg commits separate PARQUET delete files
inventoried by content=1 delete manifests under the spec's
sequence-number rule (sources/iceberg.py:_snapshot_files).

The audit builds a real two-append Iceberg table from the events
rows, commits a position-delete snapshot via write_iceberg_deletes
(positions resolved distributedly from `_metadata`, deletes written
range-partitioned and spec-sorted), then appends MORE rows after the
delete — so the read must apply the delete to the first two
snapshots' files and leave the post-delete append untouched, which is
exactly the sequence rule. The oracle recomputes survivors from the
raw events by the same predicates.

Scale shape: delete application is a broadcast anti-join under the
2M-record cap (shuffled past it, moving only (path, pos) pairs);
the delete COMMIT's one shuffle is the spec-mandated sort. Metadata
stays O(manifests) driver-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from jobminer_spark.operators.common import (
    scenario_workdir,
    source_fingerprint,
)
from jobminer_spark.registry import query
from jobminer_spark.sources import load_table
from jobminer_spark.sources.iceberg import (
    iceberg_live_files,
    read_iceberg,
    write_iceberg,
    write_iceberg_deletes,
)

_SCENARIO_CACHE: dict[tuple[str, str, str], dict] = {}

_ROWS_CTE = """
    rows AS (
      SELECT event_id,
             CAST(FLOOR(value * 100.0) AS BIGINT) AS val_q
      FROM events
    )"""


def _rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "events").select(
        "event_id",
        F.floor(F.col("value") * 100.0).cast("long").alias("val_q"),
    )


def _scenario(spark: SparkSession, sf_dir: str) -> dict:
    import os

    fp = source_fingerprint(sf_dir, "events")
    cache_key = (spark.sparkContext.applicationId, sf_dir, fp)
    if cache_key in _SCENARIO_CACHE:
        return _SCENARIO_CACHE[cache_key]
    work = scenario_workdir(spark, sf_dir, "jm_icedel_", fp)
    rows = _rows(spark, sf_dir)
    table = os.path.join(work, "ice")
    # two appends cover multi-manifest state; the third lands AFTER
    # the delete snapshot to exercise the sequence rule
    write_iceberg(spark, table, rows.filter(F.col("event_id") % 3 == 0))
    write_iceberg(spark, table, rows.filter(F.col("event_id") % 3 == 1))
    # positions of the doomed rows, resolved from the live files'
    # own row order — a distributed metadata-column scan, no collect
    scan = spark.read.parquet(*iceberg_live_files(table)).select(
        F.regexp_replace(
            F.col("_metadata.file_path"), "^file:/+", "/"
        ).alias("file_path"),
        F.col("_metadata.row_index").alias("pos"),
        "event_id",
    )
    write_iceberg_deletes(
        spark,
        table,
        scan.filter(F.col("event_id") % 11 == 0).select("file_path", "pos"),
    )
    write_iceberg(spark, table, rows.filter(F.col("event_id") % 3 == 2))

    # expiration table: three snapshots, keep only the newest — the
    # current snapshot's inventory is complete (append model), so
    # every data file survives; only old manifest lists/manifests die
    from jobminer_spark.sources.iceberg import expire_iceberg_snapshots

    exp_table = os.path.join(work, "expire")
    first = write_iceberg(
        spark, exp_table,
        rows.filter(F.col("event_id") % 4 == 0).select("event_id", "val_q"),
    )
    for b in (1, 2, 3):
        write_iceberg(
            spark, exp_table,
            rows.filter(F.col("event_id") % 4 == b).select(
                "event_id", "val_q"
            ),
        )
    dead, n_expired = expire_iceberg_snapshots(exp_table, keep_last=1)
    first_gone = 0
    try:
        read_iceberg(spark, exp_table, snapshot_id=first).count()
    except ValueError:
        first_gone = 1

    # equality-delete table: two appends, an equality delete on a
    # derived bucket column, then a post-delete append (strict rule)
    from jobminer_spark.sources.iceberg import (
        write_iceberg_equality_deletes,
    )

    eq_table = os.path.join(work, "eqdel")
    rows3 = rows.withColumn("bucket", F.col("event_id") % 7)
    write_iceberg(spark, eq_table, rows3.filter(F.col("event_id") % 3 == 0))
    write_iceberg(spark, eq_table, rows3.filter(F.col("event_id") % 3 == 1))
    write_iceberg_equality_deletes(
        spark,
        eq_table,
        spark.createDataFrame([(2,), (5,)], "bucket long"),
    )
    write_iceberg(spark, eq_table, rows3.filter(F.col("event_id") % 3 == 2))

    _SCENARIO_CACHE[cache_key] = {
        "table": table,
        "eqdel": eq_table,
        "expire": exp_table,
        "n_expired": n_expired,
        "dead_all_gone": int(
            bool(dead) and not any(os.path.exists(p) for p in dead)
        ),
        "first_gone": first_gone,
    }
    return _SCENARIO_CACHE[cache_key]


@query(
    "iceberg_position_delete_audit",
    oracle=f"""
    WITH {_ROWS_CTE}
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM rows
             WHERE event_id % 3 = 2
                OR event_id % 11 <> 0) AS n_rows,
           (SELECT CAST(SUM(val_q) AS BIGINT) FROM rows
             WHERE event_id % 3 = 2
                OR event_id % 11 <> 0) AS ck,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM rows
             WHERE event_id % 3 < 2
               AND event_id % 11 = 0) AS n_deleted
    """,
)
def iceberg_position_delete_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Two appends, a position-delete snapshot marking event_id%11==0
    rows, then a THIRD append: the read must drop the marked rows from
    the pre-delete files only — the post-delete append survives intact
    under the sequence rule even where its rows match the predicate.
    Counts/checksums recomputed by the oracle from raw events; the
    deleted count is cross-derived so an ignored-deletes reader
    (inflated n_rows) or an over-applied one (rows from the third
    append missing) both go red."""
    s = _scenario(spark, sf_dir)
    surv = read_iceberg(spark, s["table"]).agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum("val_q").cast("long").alias("ck"),
    )
    total = _rows(spark, sf_dir).count()
    n_deleted = total - read_iceberg(spark, s["table"]).count()
    return surv.selectExpr(
        "n_rows", "ck", f"CAST({n_deleted} AS BIGINT) AS n_deleted"
    )


@query(
    "iceberg_expire_snapshots_audit",
    oracle=f"""
    WITH {_ROWS_CTE}
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM rows) AS n_rows,
           (SELECT CAST(SUM(val_q) AS BIGINT) FROM rows) AS ck,
           CAST(3 AS BIGINT) AS n_expired,
           CAST(1 AS BIGINT) AS dead_files_gone,
           CAST(1 AS BIGINT) AS expired_id_unknown
    """,
)
def iceberg_expire_snapshots_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Snapshot expiration on a four-append table, keep_last=1: the
    three older snapshots leave the chain (their ids become unknown to
    time travel — pinned), every file only they referenced is
    physically gone (pinned), and the CURRENT snapshot still reads the
    complete corpus — count and checksum recomputed by the oracle from
    raw events. An expiration that dropped a shared manifest or data
    file would break the current read; one that deleted nothing would
    flip dead_files_gone."""
    s = _scenario(spark, sf_dir)
    agg = read_iceberg(spark, s["expire"]).agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum("val_q").cast("long").alias("ck"),
    )
    return agg.selectExpr(
        "n_rows",
        "ck",
        f"CAST({s['n_expired']} AS BIGINT) AS n_expired",
        f"CAST({s['dead_all_gone']} AS BIGINT) AS dead_files_gone",
        f"CAST({s['first_gone']} AS BIGINT) AS expired_id_unknown",
    )


@query(
    "iceberg_equality_delete_audit",
    oracle=f"""
    WITH {_ROWS_CTE}
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM rows
             WHERE event_id % 3 = 2
                OR event_id % 7 NOT IN (2, 5)) AS n_rows,
           (SELECT CAST(SUM(val_q) AS BIGINT) FROM rows
             WHERE event_id % 3 = 2
                OR event_id % 7 NOT IN (2, 5)) AS ck,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM rows
             WHERE event_id % 3 < 2
               AND event_id % 7 IN (2, 5)) AS n_deleted
    """,
)
def iceberg_equality_delete_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Equality deletes end-to-end: two appends, an equality-delete
    snapshot on bucket∈{2,5}, then a THIRD append — the read must drop
    matching rows from the pre-delete snapshots ONLY (the strict
    sequence rule: post-delete rows survive even where they match),
    with counts/checksums recomputed by the oracle under the same
    predicates and the deleted count cross-derived (an
    ignored-equality-deletes reader inflates n_rows; an over-applied
    one deletes from the third append too)."""
    s = _scenario(spark, sf_dir)
    surv = read_iceberg(spark, s["eqdel"]).agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum("val_q").cast("long").alias("ck"),
    )
    total = _rows(spark, sf_dir).count()
    n_deleted = total - read_iceberg(spark, s["eqdel"]).count()
    return surv.selectExpr(
        "n_rows", "ck", f"CAST({n_deleted} AS BIGINT) AS n_deleted"
    )
