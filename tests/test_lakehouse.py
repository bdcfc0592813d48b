"""Unit tests for the transactional lakehouse core (lakehouse.py):
manifest commits, MERGE semantics, copy-on-write pruning, snapshot
isolation / time travel, and the optimistic-concurrency rebase loop —
on small synthetic tables so every branch is driven directly (the
registered lakehouse_* audits pin the fixture-scale scenario against
DuckDB)."""

from __future__ import annotations

import os
import tempfile
from unittest import mock

import pytest
from pyspark.sql import functions as F

from jobminer_spark import lakehouse as lh


@pytest.fixture()
def table_dir():
    d = tempfile.mkdtemp(prefix="jm_lake_test_")
    yield os.path.join(d, "t")
    import shutil

    shutil.rmtree(d, ignore_errors=True)


def _df(spark, n=20000, status="O"):
    return spark.range(n).select(
        F.col("id").alias("k"),
        F.lit(status).alias("status"),
        (F.col("id") * 10).alias("v"),
    )


def test_create_and_read_roundtrip(spark, table_dir):
    lh.create_table(spark, table_dir, _df(spark), "k")
    snap = lh.read_snapshot(spark, table_dir)
    assert snap.count() == 20000
    assert set(snap.columns) == {"k", "status", "v"}
    assert lh.latest_version(table_dir) == 1


def test_merge_matched_condition_and_inserts(spark, table_dir):
    lh.create_table(spark, table_dir, _df(spark), "k")
    upd = spark.range(100).select(
        F.col("id").alias("k"),
        F.lit("X").alias("status"),
        F.lit(-1).cast("long").alias("v"),
    ).unionByName(
        spark.range(5).select(
            (F.col("id") + 1_000_000).alias("k"),
            F.lit("N").alias("status"),
            F.lit(7).cast("long").alias("v"),
        )
    )
    stats = lh.merge_into(
        spark, table_dir, upd, lambda j: j["status"] == "O"
    )
    assert stats["version"] == 2
    assert stats["n_updates_applied"] == 100
    assert stats["n_inserts"] == 5
    snap = lh.read_snapshot(spark, table_dir)
    assert snap.count() == 20005
    assert snap.filter(F.col("status") == "X").count() == 100
    assert snap.filter(F.col("status") == "N").count() == 5
    # matched rows took the update's value; unmatched kept theirs
    assert snap.filter((F.col("k") < 100) & (F.col("v") != -1)).count() == 0
    assert (
        snap.filter((F.col("k") >= 100) & (F.col("k") < 20000))
        .filter(F.col("v") != F.col("k") * 10)
        .count()
        == 0
    )


def test_matched_condition_false_keeps_old_row(spark, table_dir):
    lh.create_table(spark, table_dir, _df(spark, n=1000, status="F"), "k")
    upd = spark.range(50).select(
        F.col("id").alias("k"), F.lit("X").alias("status"), F.lit(0).cast("long").alias("v")
    )
    stats = lh.merge_into(spark, table_dir, upd, lambda j: j["status"] == "O")
    # every key matched but the condition held for none: no updates,
    # no inserts, still a new (noop-rewrite) version
    assert stats["n_updates_applied"] == 0
    assert stats["n_inserts"] == 0
    snap = lh.read_snapshot(spark, table_dir)
    assert snap.filter(F.col("status") == "X").count() == 0
    assert snap.count() == 1000


def test_file_pruning_rewrites_only_intersecting_buckets(spark, table_dir):
    # 20000 keys / 4096 per bucket = 5 files
    lh.create_table(spark, table_dir, _df(spark), "k")
    import json

    with open(os.path.join(table_dir, "_manifests", "v1.json")) as f:
        assert len(json.load(f)["files"]) == 5
    # updates confined to bucket 0, inserts far away: exactly one
    # rewrite despite the batch's [min, max] interval spanning the
    # whole table — the bucket-set pruning, not the interval, decides
    upd = spark.range(10).select(
        F.col("id").alias("k"), F.lit("X").alias("status"), F.lit(0).cast("long").alias("v")
    ).unionByName(
        spark.range(3).select(
            (F.col("id") + 5_000_000).alias("k"),
            F.lit("N").alias("status"),
            F.lit(0).cast("long").alias("v"),
        )
    )
    stats = lh.merge_into(spark, table_dir, upd, lambda j: F.lit(True))
    assert stats["n_files_rewritten"] == 1
    assert stats["n_files_carried"] == 4
    assert stats["n_insert_files"] == 1
    assert lh.read_snapshot(spark, table_dir).count() == 20003


def test_time_travel_snapshot_isolation(spark, table_dir):
    lh.create_table(spark, table_dir, _df(spark, n=1000), "k")
    before = lh.read_snapshot(spark, table_dir, 1)
    upd = spark.range(1000).select(
        F.col("id").alias("k"), F.lit("X").alias("status"), (F.col("id") + 1).alias("v")
    )
    lh.merge_into(spark, table_dir, upd, lambda j: F.lit(True))
    # the v1 frame resolved BEFORE the merge and a fresh v1 read AFTER
    # it agree bit-for-bit: data files are immutable, the manifest is
    # the only mutable pointer
    after_v1 = lh.read_snapshot(spark, table_dir, 1)
    assert after_v1.filter(F.col("status") == "X").count() == 0
    assert before.agg(F.sum("v")).first()[0] == after_v1.agg(F.sum("v")).first()[0]
    assert lh.read_snapshot(spark, table_dir, 2).filter(
        F.col("status") == "X"
    ).count() == 1000


def test_commit_conflict_is_raised(spark, table_dir):
    lh.create_table(spark, table_dir, _df(spark, n=100), "k")
    with pytest.raises(lh.CommitConflict):
        lh._commit(
            table_dir,
            {"version": 1, "parent": None, "key_col": "k", "files": []},
        )


def test_losing_writer_rebases_and_reapplies(spark, table_dir):
    """Force the merge_into-internal rebase: the first attempt
    prepares against a stale version (mocked latest_version), loses
    the exclusive create, and must re-read the REAL latest snapshot —
    including the competing commit's rows — before re-applying."""
    lh.create_table(spark, table_dir, _df(spark, n=1000), "k")
    # competing writer wins version 2 first: bumps v for keys < 10
    comp = spark.range(10).select(
        F.col("id").alias("k"), F.lit("O").alias("status"), F.lit(111).cast("long").alias("v")
    )
    lh.merge_into(spark, table_dir, comp, lambda j: F.lit(True))
    assert lh.latest_version(table_dir) == 2

    upd = spark.range(5).select(
        (F.col("id") + 100).alias("k"), F.lit("X").alias("status"), F.lit(0).cast("long").alias("v")
    )
    real_latest = lh.latest_version
    with mock.patch.object(
        lh,
        "latest_version",
        side_effect=lambda t: 1
        if lh.latest_version.call_count == 1  # type: ignore[attr-defined]
        else real_latest(t),
    ):
        stats = lh.merge_into(spark, table_dir, upd, lambda j: F.lit(True))
    assert stats["version"] == 3  # rebased onto the real v2
    snap = lh.read_snapshot(spark, table_dir)
    # BOTH writers' effects present — the rebase re-applied on top of
    # the competing commit instead of clobbering it
    assert snap.filter(F.col("v") == 111).count() == 10
    assert snap.filter(F.col("status") == "X").count() == 5
