"""Minimal Delta-format reader/writer (sources/delta.py): log replay,
time travel, overwrite remove-actions, partition restoration from the
log, checkpoint short-circuit, commit-race retry, and the protocol's
mandated loud failure on unsupported reader versions."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from jobminer_spark.sources.delta import (
    _checkpoint_file,
    _commit_file,
    delta_latest_version,
    read_delta,
    write_delta,
)


def _df(spark, lo, hi, tag="a"):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"),
        (F.col("id") * 10).alias("v"),
        F.lit(tag).alias("tag"),
    )


def test_roundtrip_and_time_travel(spark, tmp_path):
    t = str(tmp_path / "t1")
    assert write_delta(spark, t, _df(spark, 0, 5)) == 0
    assert write_delta(spark, t, _df(spark, 5, 9)) == 1
    assert delta_latest_version(t) == 1
    assert read_delta(spark, t).count() == 9
    assert read_delta(spark, t, version=0).count() == 5
    got = sorted(r["k"] for r in read_delta(spark, t).collect())
    assert got == list(range(9))


def test_overwrite_removes_every_prior_file(spark, tmp_path):
    t = str(tmp_path / "t2")
    write_delta(spark, t, _df(spark, 0, 5))
    write_delta(spark, t, _df(spark, 5, 9))
    write_delta(spark, t, _df(spark, 100, 103), mode="overwrite")
    assert read_delta(spark, t).count() == 3
    assert sorted(r["k"] for r in read_delta(spark, t).collect()) == [
        100, 101, 102,
    ]
    # time travel still sees the pre-overwrite state
    assert read_delta(spark, t, version=1).count() == 9
    # the overwrite commit carries explicit remove actions
    with open(_commit_file(t, 2)) as f:
        actions = [json.loads(line) for line in f if line.strip()]
    assert sum(1 for a in actions if "remove" in a) >= 2


def test_partition_column_restored_from_log(spark, tmp_path):
    """The data files must NOT contain the partition column; reading
    restores it from partitionValues with the declared type."""
    import pyarrow.parquet as papq

    t = str(tmp_path / "t3")
    df = spark.range(0, 20).select(
        F.col("id").alias("k"),
        (F.col("id") % 3).alias("bucket"),
    )
    write_delta(spark, t, df, partition_by=["bucket"])
    back = read_delta(spark, t)
    assert dict(back.groupBy("bucket").count().collect()[0].asDict()) is not None
    counts = {r["bucket"]: r["count"] for r in back.groupBy("bucket").count().collect()}
    assert counts == {0: 7, 1: 7, 2: 6}
    assert back.schema["bucket"].dataType.simpleString() == "bigint"
    # pick any data file: no 'bucket' column inside
    data_file = next(
        os.path.join(root, f)
        for root, _d, files in os.walk(t)
        for f in files
        if f.endswith(".parquet") and "_delta_log" not in root
    )
    cols = papq.ParquetFile(data_file).schema_arrow.names
    assert "bucket" not in cols


def test_checkpoint_written_and_used(spark, tmp_path, monkeypatch):
    t = str(tmp_path / "t4")
    for i in range(11):
        write_delta(spark, t, _df(spark, i * 2, i * 2 + 2))
    assert os.path.exists(_checkpoint_file(t, 10))
    with open(os.path.join(t, "_delta_log", "_last_checkpoint")) as f:
        assert json.load(f)["version"] == 10
    assert read_delta(spark, t).count() == 22
    # prove the checkpoint path is the one taken for the latest read:
    # corrupt every commit BEFORE the checkpoint — replay must not
    # touch them when starting from the checkpoint
    for v in range(10):
        os.rename(_commit_file(t, v), _commit_file(t, v) + ".bak")
    try:
        assert read_delta(spark, t).count() == 22
    finally:
        for v in range(10):
            os.rename(_commit_file(t, v) + ".bak", _commit_file(t, v))
    # a pre-checkpoint version read needs those commits again
    assert read_delta(spark, t, version=9).count() == 20


def test_commit_race_retries_and_unstages(spark, tmp_path):
    """If another writer wins the version, the loser must retry at the
    next version and its first attempt's staged files must not leak
    into the table's active set."""
    t = str(tmp_path / "t5")
    write_delta(spark, t, _df(spark, 0, 3))
    # simulate a racing winner: pre-create version 1's commit file
    with open(_commit_file(t, 1), "w") as f:
        f.write(json.dumps({"commitInfo": {"operation": "NOOP"}}) + "\n")
    v = write_delta(spark, t, _df(spark, 3, 6))
    assert v == 2
    assert read_delta(spark, t).count() == 6


def test_unsupported_reader_version_fails_loudly(spark, tmp_path):
    t = str(tmp_path / "t6")
    write_delta(spark, t, _df(spark, 0, 3))
    # bump the protocol in a new commit
    with open(_commit_file(t, 1), "w") as f:
        f.write(
            json.dumps(
                {"protocol": {"minReaderVersion": 3, "minWriterVersion": 7}}
            )
            + "\n"
        )
    with pytest.raises(ValueError, match="minReaderVersion"):
        read_delta(spark, t)


def test_read_rejects_out_of_range_and_missing(spark, tmp_path):
    t = str(tmp_path / "t7")
    with pytest.raises(FileNotFoundError):
        read_delta(spark, t)
    write_delta(spark, t, _df(spark, 0, 2))
    with pytest.raises(ValueError, match="out of range"):
        read_delta(spark, t, version=5)


def test_checkpoint_with_partitions_roundtrips_partition_values(
    spark, tmp_path
):
    """partitionValues must survive the checkpoint round trip (they are
    a MAP column in the checkpoint parquet — the reader converts the
    tuple-list form back to dicts)."""
    t = str(tmp_path / "t8")
    for i in range(11):
        df = spark.range(i * 2, i * 2 + 2).select(
            F.col("id").alias("k"), (F.col("id") % 2).alias("p")
        )
        write_delta(spark, t, df, partition_by=["p"])
    assert os.path.exists(_checkpoint_file(t, 10))
    back = read_delta(spark, t)
    counts = {r["p"]: r["count"] for r in back.groupBy("p").count().collect()}
    assert counts == {0: 11, 1: 11}


def test_partition_filters_prune_at_log_level(spark, tmp_path):
    """Equality partition filters must drop non-matching files BEFORE
    the plan is built — the pruned partitions' file paths never appear
    in the physical plan."""
    t = str(tmp_path / "t9")
    df = spark.range(0, 30).select(
        F.col("id").alias("k"), (F.col("id") % 3).alias("bucket")
    )
    write_delta(spark, t, df, partition_by=["bucket"])
    pruned = read_delta(spark, t, partition_filters={"bucket": "1"})
    assert pruned.count() == 10
    assert {r["bucket"] for r in pruned.collect()} == {1}
    scanned = pruned.inputFiles()
    assert scanned and all("bucket=1" in f for f in scanned)
    # empty result for a value no partition holds
    assert read_delta(spark, t, partition_filters={"bucket": "9"}).count() == 0
    with pytest.raises(ValueError, match="not partition columns"):
        read_delta(spark, t, partition_filters={"k": "1"})


def test_txn_watermark_and_checkpoint_survival(spark, tmp_path):
    """txn (appId, version) watermarks: latest-wins per app, readable
    via last_txn_version, and REQUIRED to survive log compaction —
    after a checkpoint, the watermark must come from the checkpoint
    parquet even with the pre-checkpoint commits gone."""
    from jobminer_spark.sources.delta import last_txn_version

    t = str(tmp_path / "txn1")
    assert last_txn_version(t, "app") is None
    for i in range(11):  # checkpoint lands at version 10
        write_delta(spark, t, _df(spark, i, i + 1), txn=("app", i))
    assert last_txn_version(t, "app") == 10
    assert last_txn_version(t, "other") is None
    assert os.path.exists(_checkpoint_file(t, 10))
    # drop every pre-checkpoint commit: the watermark must persist
    for v in range(10):
        os.rename(_commit_file(t, v), _commit_file(t, v) + ".bak")
    try:
        assert last_txn_version(t, "app") == 10
    finally:
        for v in range(10):
            os.rename(_commit_file(t, v) + ".bak", _commit_file(t, v))


def test_txn_skip_gives_exactly_once_effect(spark, tmp_path):
    """The sink pattern: a writer that consults its watermark before
    committing writes each batch exactly once under re-delivery."""
    from jobminer_spark.sources.delta import last_txn_version

    t = str(tmp_path / "txn2")
    app = "writer-1"

    def deliver(bid: int) -> bool:
        last = last_txn_version(t, app)
        if last is not None and bid <= last:
            return False
        write_delta(spark, t, _df(spark, bid * 10, bid * 10 + 5), txn=(app, bid))
        return True

    assert [deliver(b) for b in (0, 1, 2)] == [True, True, True]
    # full re-delivery: every batch skipped, table unchanged
    assert [deliver(b) for b in (0, 1, 2)] == [False, False, False]
    assert delta_latest_version(t) == 2
    assert read_delta(spark, t).count() == 15


def test_optimize_compacts_without_changing_rows(spark, tmp_path):
    """OPTIMIZE: many small files → target_files larger ones in one
    dataChange=false commit; rows identical, time travel still sees
    the pre-compaction layout, and a no-op table is left alone."""
    from jobminer_spark.sources.delta import optimize_delta

    t = str(tmp_path / "opt1")
    for i in range(6):
        write_delta(spark, t, _df(spark, i * 4, i * 4 + 4))
    before = read_delta(spark, t)
    n_before_files = len(before.inputFiles())
    assert n_before_files >= 6
    rows_before = sorted(r["k"] for r in before.collect())

    v, nb, na = optimize_delta(spark, t, target_files=2)
    assert (nb, na) == (n_before_files, 2)
    after = read_delta(spark, t)
    assert len(after.inputFiles()) == 2
    assert sorted(r["k"] for r in after.collect()) == rows_before
    # the commit is pure rearrangement: every action dataChange=false
    with open(_commit_file(t, v)) as f:
        actions = [json.loads(line) for line in f if line.strip()]
    assert actions and all(
        not a.get("add", a.get("remove"))["dataChange"] for a in actions
    )
    # time travel to pre-OPTIMIZE resolves the old layout
    assert len(read_delta(spark, t, version=v - 1).inputFiles()) == n_before_files
    # idempotent: already at/below target -> no new version
    v2, nb2, na2 = optimize_delta(spark, t, target_files=2)
    assert v2 == v and nb2 == na2 == 2


def test_append_schema_or_partition_mismatch_fails_loudly(spark, tmp_path):
    """A mismatched append would land files the reader misreads
    (all-NULL columns / NULL partition values) — both are rejected
    before any file is staged."""
    t = str(tmp_path / "val1")
    write_delta(spark, t, _df(spark, 0, 3))
    bad = spark.range(3, 6).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("w")
    )
    with pytest.raises(ValueError, match="schema differs"):
        write_delta(spark, t, bad)
    p = str(tmp_path / "val2")
    write_delta(
        spark,
        p,
        spark.range(0, 4).select(
            F.col("id").alias("k"), (F.col("id") % 2).alias("b")
        ),
        partition_by=["b"],
    )
    with pytest.raises(ValueError, match="partitioning"):
        write_delta(
            spark,
            p,
            spark.range(4, 6).select(
                F.col("id").alias("k"), (F.col("id") % 2).alias("b")
            ),
        )


def test_overwrite_publishes_the_new_schema(spark, tmp_path):
    """OVERWRITE replaces the table: its metaData must carry the NEW
    schemaString even when partitioning is unchanged — a stale schema
    would project the new files' columns as NULL."""
    t = str(tmp_path / "evo")
    write_delta(spark, t, _df(spark, 0, 3))
    new = spark.range(0, 4).select(
        F.col("id").alias("k"), (F.col("id") * 7).alias("w")
    )
    write_delta(spark, t, new, mode="overwrite")
    back = read_delta(spark, t)
    assert set(back.columns) == {"k", "w"}
    assert sorted(r["w"] for r in back.collect()) == [0, 7, 14, 21]
