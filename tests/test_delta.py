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
    # bump the protocol past the supported range in a new commit
    with open(_commit_file(t, 1), "w") as f:
        f.write(
            json.dumps(
                {"protocol": {"minReaderVersion": 4, "minWriterVersion": 9}}
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


# ---------------------------------------------------------------------------
# r16: null partition values, checkpoint tombstones, staging locality
# (ADVICE r15), the loud-rejection matrix, and adversarial
# foreign-shaped fixtures (VERDICT r15 items 2 and 4)
# ---------------------------------------------------------------------------


def test_null_partition_value_protocol_roundtrip(spark, tmp_path):
    """A null partition value must be published as the protocol's JSON
    null (NOT Spark's __HIVE_DEFAULT_PARTITION__ staging sentinel),
    read back as NULL, be selectable via a None filter, and never
    TypeError while grouping against non-null values."""
    t = str(tmp_path / "nullpart")
    df = spark.range(0, 6).select(
        F.col("id").alias("k"),
        F.when(F.col("id") < 2, F.lit(None)).otherwise(
            F.concat(F.lit("s"), (F.col("id") % 2).cast("string"))
        ).alias("p"),
    )
    write_delta(spark, t, df, partition_by=["p"])
    with open(_commit_file(t, 0)) as f:
        actions = [json.loads(line) for line in f if line.strip()]
    pvals = [a["add"]["partitionValues"] for a in actions if "add" in a]
    assert any(pv["p"] is None for pv in pvals), pvals
    assert not any(pv["p"] == "__HIVE_DEFAULT_PARTITION__" for pv in pvals)
    back = read_delta(spark, t)  # mixed None/str groups: sort is safe
    assert back.count() == 6
    assert back.filter(F.col("p").isNull()).count() == 2
    nulls_only = read_delta(spark, t, partition_filters={"p": None})
    assert sorted(r["k"] for r in nulls_only.collect()) == [0, 1]


def test_partition_value_special_chars_decoded(spark, tmp_path):
    """Spark %-escapes special chars in hive dir names; the log must
    carry the ACTUAL value."""
    t = str(tmp_path / "escpart")
    df = spark.createDataFrame([(1, "a b:c%d")], "k int, p string")
    write_delta(spark, t, df, partition_by=["p"])
    with open(_commit_file(t, 0)) as f:
        actions = [json.loads(line) for line in f if line.strip()]
    pvals = [a["add"]["partitionValues"] for a in actions if "add" in a]
    assert pvals and pvals[0]["p"] == "a b:c%d"
    got = read_delta(spark, t).collect()
    assert [r["p"] for r in got] == ["a b:c%d"]
    assert read_delta(spark, t, partition_filters={"p": "a b:c%d"}).count() == 1


def test_checkpoint_carries_recent_remove_tombstones(spark, tmp_path):
    """The protocol keeps remove tombstones in checkpoints until their
    retention lapses — an external reader's vacuum/CDC bookkeeping
    depends on them. Expired tombstones must drop."""
    import time as _time

    import pyarrow.parquet as papq

    from jobminer_spark.sources.delta import _publish_commit, _write_checkpoint

    t = str(tmp_path / "tomb")
    for i in range(9):
        write_delta(spark, t, _df(spark, i, i + 1))  # versions 0..8
    write_delta(spark, t, _df(spark, 100, 102), mode="overwrite")  # v9
    # hand-publish v10: one EXPIRED tombstone (beyond 7-day retention)
    _publish_commit(t, 10, [{
        "remove": {
            "path": "data-dead/beef.parquet",
            "deletionTimestamp": int(_time.time() * 1000)
            - 8 * 24 * 3600 * 1000,
            "dataChange": True,
        }
    }])
    _write_checkpoint(t, 10)
    with open(_commit_file(t, 9)) as f:
        v9 = [json.loads(line) for line in f if line.strip()]
    overwritten = {a["remove"]["path"] for a in v9 if "remove" in a}
    assert overwritten  # the overwrite tombstoned every prior file
    rows = papq.read_table(_checkpoint_file(t, 10)).to_pylist()
    removed_paths = {r["remove"]["path"] for r in rows if r.get("remove")}
    # the overwrite's tombstones are recent -> all retained
    assert removed_paths == overwritten
    assert "data-dead/beef.parquet" not in removed_paths
    for r in rows:
        if r.get("remove"):
            assert r["remove"]["deletionTimestamp"] > 0
    # tombstones must NOT leak into the active set on replay
    assert read_delta(spark, t).count() == 2
    # and a re-add after a remove cancels the tombstone
    write_delta(spark, t, _df(spark, 200, 201))  # v11
    _write_checkpoint(t, 11)
    rows11 = papq.read_table(_checkpoint_file(t, 11)).to_pylist()
    adds11 = {r["add"]["path"] for r in rows11 if r.get("add")}
    rems11 = {r["remove"]["path"] for r in rows11 if r.get("remove")}
    assert not (adds11 & rems11)


def test_staging_stays_inside_table_dir(spark, tmp_path):
    """Staging must live on the TABLE's filesystem (dot-prefixed, so
    hidden from readers) and leave no scratch behind — /tmp staging
    broke os.replace across devices (EXDEV)."""
    import tempfile as _tempfile

    t = str(tmp_path / "stage")
    write_delta(spark, t, _df(spark, 0, 4))
    write_delta(spark, t, _df(spark, 4, 6), mode="overwrite")
    leftovers = [d for d in os.listdir(t) if d.startswith(".stage_")]
    assert leftovers == []
    tmp_strays = [
        d
        for d in os.listdir(_tempfile.gettempdir())
        if d.startswith("jm_delta_stage_")
    ]
    assert tmp_strays == []
    assert read_delta(spark, t).count() == 2


def _craft_log(table: str, lines_by_version: dict[int, list[dict]]) -> None:
    os.makedirs(os.path.join(table, "_delta_log"), exist_ok=True)
    for v, actions in lines_by_version.items():
        with open(_commit_file(table, v), "w") as f:
            for a in actions:
                f.write(json.dumps(a) + "\n")


_META = {
    "id": "fix-ture",
    "format": {"provider": "parquet", "options": {}},
    "schemaString": json.dumps(
        {
            "type": "struct",
            "fields": [
                {"name": "k", "type": "long", "nullable": True,
                 "metadata": {}},
            ],
        }
    ),
    "partitionColumns": [],
    "configuration": {},
    "createdTime": 0,
}


def test_rejection_matrix_unknown_reader_features(spark, tmp_path):
    """Reader v3 gates per feature: anything outside the implemented
    set must fail loudly BY NAME — collations-preview here, which
    this reader has no code to consume (variantType graduated to the
    supported set in r18)."""
    t = str(tmp_path / "unkfeat")
    _craft_log(t, {0: [
        {"protocol": {"minReaderVersion": 3, "minWriterVersion": 7,
                      "readerFeatures": ["collations-preview"],
                      "writerFeatures": ["collations-preview"]}},
        {"metaData": _META},
    ]})
    with pytest.raises(ValueError, match="collations-preview"):
        read_delta(spark, t)


def _id_mode_schema():
    return {"type": "struct", "fields": [
        {"name": "k", "type": "long", "nullable": True,
         "metadata": {"delta.columnMapping.id": 1,
                      "delta.columnMapping.physicalName": "col-a"}},
        {"name": "v", "type": "long", "nullable": True,
         "metadata": {"delta.columnMapping.id": 2,
                      "delta.columnMapping.physicalName": "col-b"}},
    ]}


def _write_field_id_parquet(path, named_arrays):
    """(name, field_id, values) triples → a parquet file carrying
    parquet field ids, the shape foreign id-mode writers produce."""
    import pyarrow as pa
    import pyarrow.parquet as papq

    fields = [
        pa.field(n, pa.int64(), metadata={b"PARQUET:field_id": str(i).encode()})
        for n, i, _ in named_arrays
    ]
    papq.write_table(
        pa.table(
            {n: pa.array(vals, pa.int64()) for n, _, vals in named_arrays},
            schema=pa.schema(fields),
        ),
        path,
    )


def test_column_mapping_id_mode_reads(spark, tmp_path):
    """``id`` mode (reader v2, previously a stated non-goal): file
    columns resolve BY PARQUET FIELD ID via Spark's native
    fieldId.read matching. The fixture is adversarial — the parquet
    column NAMES are swapped relative to the physical names — so a
    (wrong) name-based resolution would silently return transposed
    data, while field ids pick the right columns."""
    t = str(tmp_path / "cmap_id_pos")
    os.makedirs(t, exist_ok=True)
    # field id 1 lives on the file column NAMED like v's physical name
    _write_field_id_parquet(
        os.path.join(t, "d1.parquet"),
        [("col-b", 1, [1, 2, 3]), ("col-a", 2, [10, 20, 30])],
    )
    _craft_log(t, {0: [
        {"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}},
        {"metaData": {**_META,
                      "schemaString": json.dumps(_id_mode_schema()),
                      "configuration": {
                          "delta.columnMapping.mode": "id",
                          "delta.columnMapping.maxColumnId": "2"}}},
        {"add": {"path": "d1.parquet", "partitionValues": {}, "size": 1,
                 "modificationTime": 0, "dataChange": True}},
    ]})
    df = read_delta(spark, t)
    assert df.columns == ["k", "v"]
    assert sorted((r.k, r.v) for r in df.collect()) == [
        (1, 10), (2, 20), (3, 30),
    ]


def test_column_mapping_id_mode_partitioned(spark, tmp_path):
    """id-mode partitioned table: partitionValues stay keyed by
    PHYSICAL name (the protocol rule shared with name mode) while the
    data columns resolve by field id."""
    t = str(tmp_path / "cmap_id_part")
    os.makedirs(t, exist_ok=True)
    schema = _id_mode_schema()
    schema["fields"].append(
        {"name": "p", "type": "long", "nullable": True,
         "metadata": {"delta.columnMapping.id": 3,
                      "delta.columnMapping.physicalName": "col-p"}}
    )
    for i, part in enumerate((7, 8)):
        _write_field_id_parquet(
            os.path.join(t, f"d{i}.parquet"),
            [("x", 1, [part * 100]), ("y", 2, [part * 1000])],
        )
    _craft_log(t, {0: [
        {"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}},
        {"metaData": {**_META, "schemaString": json.dumps(schema),
                      "partitionColumns": ["p"],
                      "configuration": {
                          "delta.columnMapping.mode": "id",
                          "delta.columnMapping.maxColumnId": "3"}}},
        {"add": {"path": "d0.parquet",
                 "partitionValues": {"col-p": "7"}, "size": 1,
                 "modificationTime": 0, "dataChange": True}},
        {"add": {"path": "d1.parquet",
                 "partitionValues": {"col-p": "8"}, "size": 1,
                 "modificationTime": 0, "dataChange": True}},
    ]})
    got = sorted(
        (r.k, r.v, r.p) for r in read_delta(spark, t).collect()
    )
    assert got == [(700, 7000, 7), (800, 8000, 8)]


def test_column_mapping_id_mode_missing_id_rejected(spark, tmp_path):
    """A field without delta.columnMapping.id in id mode is a
    protocol violation — loud failure, never a guess."""
    t = str(tmp_path / "cmap_id_bad")
    os.makedirs(t, exist_ok=True)
    _write_field_id_parquet(
        os.path.join(t, "d1.parquet"), [("col-a", 1, [1])]
    )
    schema = {"type": "struct", "fields": [
        {"name": "k", "type": "long", "nullable": True,
         "metadata": {"delta.columnMapping.physicalName": "col-a"}},
    ]}
    _craft_log(t, {0: [
        {"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}},
        {"metaData": {**_META, "schemaString": json.dumps(schema),
                      "configuration": {
                          "delta.columnMapping.mode": "id"}}},
        {"add": {"path": "d1.parquet", "partitionValues": {}, "size": 1,
                 "modificationTime": 0, "dataChange": True}},
    ]})
    with pytest.raises(ValueError, match="delta.columnMapping.id"):
        read_delta(spark, t).collect()


def test_id_mode_missing_file_ids_fail_despite_iceberg_conf(
    spark, tmp_path
):
    """ADVICE r17: read_iceberg(resolve="field-id") pins
    spark.sql.parquet.fieldId.read.ignoreMissing=true session-wide
    (Iceberg ADD-column semantics need it). A Delta id-mode read in
    the SAME session must still fail loudly on a data file missing
    parquet field ids (the Delta protocol's rule) — the Delta scan
    pins ignoreMissing=false itself rather than trusting the session
    default, so the leaked conf can't silently turn the protocol
    violation into all-NULL columns."""
    import pyarrow as pa
    import pyarrow.parquet as papq

    t = str(tmp_path / "cmap_id_noids")
    os.makedirs(t, exist_ok=True)
    # a data file with NO parquet field ids at all
    papq.write_table(
        pa.table({"col-a": pa.array([1, 2], pa.int64()),
                  "col-b": pa.array([10, 20], pa.int64())}),
        os.path.join(t, "d1.parquet"),
    )
    _craft_log(t, {0: [
        {"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}},
        {"metaData": {**_META,
                      "schemaString": json.dumps(_id_mode_schema()),
                      "configuration": {
                          "delta.columnMapping.mode": "id",
                          "delta.columnMapping.maxColumnId": "2"}}},
        {"add": {"path": "d1.parquet", "partitionValues": {}, "size": 1,
                 "modificationTime": 0, "dataChange": True}},
    ]})
    # simulate the leak an earlier field-id Iceberg read leaves behind
    spark.conf.set(
        "spark.sql.parquet.fieldId.read.ignoreMissing", "true"
    )
    try:
        with pytest.raises(Exception, match="field"):
            read_delta(spark, t).collect()
    finally:
        spark.conf.unset("spark.sql.parquet.fieldId.read.ignoreMissing")


def _craft_mapped_table(spark, t):
    """A reader-v2 column-mapped (name mode) table with one physical
    parquet file whose column name differs from the logical schema."""
    import pyarrow as pa
    import pyarrow.parquet as papq

    os.makedirs(t, exist_ok=True)
    papq.write_table(
        pa.table({"col-9f2": [1, 2, 3]}), os.path.join(t, "d1.parquet")
    )
    schema = {"type": "struct", "fields": [
        {"name": "k", "type": "long", "nullable": True,
         "metadata": {"delta.columnMapping.id": 1,
                      "delta.columnMapping.physicalName": "col-9f2"}},
    ]}
    _craft_log(t, {0: [
        {"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}},
        {"metaData": {**_META,
                      "schemaString": json.dumps(schema),
                      "configuration": {
                          "delta.columnMapping.mode": "name",
                          "delta.columnMapping.maxColumnId": "1"}}},
        {"add": {"path": "d1.parquet", "partitionValues": {}, "size": 1,
                 "modificationTime": 0, "dataChange": True}},
    ]})


def test_column_mapping_name_mode_reads(spark, tmp_path):
    """Name-mode column mapping (reader v2): the parquet file's
    physical column resolves through the schema-string metadata and
    surfaces under its LOGICAL name."""
    t = str(tmp_path / "cmap")
    _craft_mapped_table(spark, t)
    df = read_delta(spark, t)
    assert df.columns == ["k"]
    assert sorted(r.k for r in df.collect()) == [1, 2, 3]


def test_column_mapping_writes(spark, tmp_path):
    """r17: mapped tables accept APPEND (staged under physical names,
    logical-shape schema check) and merge-on-read DELETE; r18 adds
    data-only OVERWRITE (schema and physical naming preserved) while
    a schema-evolving overwrite stays refused."""
    import pyarrow.parquet as pq

    from jobminer_spark.sources.delta import delete_delta

    t = str(tmp_path / "cmap_w")
    _craft_mapped_table(spark, t)
    # schema-EVOLVING overwrite: still loud (would re-assign mapping)
    with pytest.raises(ValueError, match="column-mapped"):
        write_delta(spark, t, _df(spark, 0, 2), mode="overwrite")
    # logical-shape mismatch: loud
    with pytest.raises(ValueError, match="logical schema"):
        write_delta(spark, t, _df(spark, 0, 2))
    write_delta(
        spark, t, spark.range(9, 11).select(F.col("id").alias("k"))
    )
    df = read_delta(spark, t)
    assert sorted(r.k for r in df.collect()) == [1, 2, 3, 9, 10]
    # the appended files carry the PHYSICAL column name
    new_files = [
        f for f in df.inputFiles() if "/data-" in f or "data-" in f
    ]
    assert new_files
    for f in new_files:
        assert pq.read_schema(f.replace("file:", "")).names == [
            "col-9f2"
        ]
    # merge-on-read delete speaks logical names too
    v, n = delete_delta(spark, t, "k IN (2, 9)")
    assert n == 2
    assert sorted(r.k for r in read_delta(spark, t).collect()) == [
        1, 3, 10,
    ]


def test_column_mapping_append_enforces_nullability(spark, tmp_path):
    """ADVICE r17: the mapped-branch append check must carry the same
    nullability rule as the unmapped branch — a NULLABLE batch column
    against a NON-nullable table column is rejected (it could append
    NULLs engines trusting the declared schema would miscompile),
    while a stricter (non-nullable) batch into a nullable column is
    fine."""
    import pyarrow as pa
    import pyarrow.parquet as papq

    t = str(tmp_path / "cmap_nn")
    os.makedirs(t, exist_ok=True)
    papq.write_table(
        pa.table({"col-9f2": pa.array([1, 2, 3], pa.int64())}),
        os.path.join(t, "d1.parquet"),
    )
    schema = {"type": "struct", "fields": [
        {"name": "k", "type": "long", "nullable": False,
         "metadata": {"delta.columnMapping.id": 1,
                      "delta.columnMapping.physicalName": "col-9f2"}},
    ]}
    _craft_log(t, {0: [
        {"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}},
        {"metaData": {**_META,
                      "schemaString": json.dumps(schema),
                      "configuration": {
                          "delta.columnMapping.mode": "name",
                          "delta.columnMapping.maxColumnId": "1"}}},
        {"add": {"path": "d1.parquet", "partitionValues": {}, "size": 1,
                 "modificationTime": 0, "dataChange": True}},
    ]})
    # nullable batch (max() over a group is nullable) → loud
    nullable_batch = (
        spark.range(9, 11)
        .groupBy()
        .agg(F.max("id").alias("k"))
    )
    assert nullable_batch.schema["k"].nullable
    with pytest.raises(ValueError, match="logical schema"):
        write_delta(spark, t, nullable_batch)
    # stricter batch (range is non-nullable) into the same column: ok
    write_delta(
        spark, t, spark.range(9, 10).select(F.col("id").alias("k"))
    )
    assert sorted(r.k for r in read_delta(spark, t).collect()) == [
        1, 2, 3, 9,
    ]


def test_column_mapping_missing_physical_name_rejected(spark, tmp_path):
    """mode=name with a field missing physicalName is a protocol
    violation — resolving by logical name could silently read the
    wrong column, so it must raise."""
    t = str(tmp_path / "cmap_broken")
    _craft_log(t, {0: [
        {"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}},
        {"metaData": {**_META, "configuration": {
            "delta.columnMapping.mode": "name"}}},
        {"add": {"path": "d1.parquet", "partitionValues": {}, "size": 1,
                 "modificationTime": 0, "dataChange": True}},
    ]})
    with pytest.raises(ValueError, match="physicalName"):
        read_delta(spark, t)


def test_deletion_vectors_read_foreign_and_writer_interop(spark, tmp_path):
    """Reader v3 + deletionVectors on a FOREIGN-shaped table: rows a
    DV marks deleted vanish from the scan (file-based "u" DV with CRC,
    and inline "i"), appends leave the DVs applied, and OPTIMIZE
    materializes them into clean files instead of resurrecting
    rows."""
    import pyarrow as pa
    import pyarrow.parquet as papq
    import uuid as _uuid

    from jobminer_spark.sources.delta import optimize_delta
    from jobminer_spark.sources.roaring import (
        serialize_rba,
        write_dv_file,
        z85_encode,
    )

    t = str(tmp_path / "dv")
    os.makedirs(t)
    papq.write_table(
        pa.table({"k": list(range(10))}), os.path.join(t, "f1.parquet")
    )
    papq.write_table(
        pa.table({"k": list(range(10, 20))}), os.path.join(t, "f2.parquet")
    )
    u = _uuid.uuid4()
    off, size = write_dv_file(
        os.path.join(t, f"deletion_vector_{u}.bin"), [0, 3, 7]
    )
    inline_payload = serialize_rba([2, 5])
    _craft_log(t, {0: [
        {"protocol": {"minReaderVersion": 3, "minWriterVersion": 7,
                      "readerFeatures": ["deletionVectors"],
                      "writerFeatures": ["deletionVectors"]}},
        {"metaData": {**_META, "configuration": {
            "delta.enableDeletionVectors": "true"}}},
        {"add": {"path": "f1.parquet", "partitionValues": {}, "size": 1,
                 "modificationTime": 0, "dataChange": True,
                 "deletionVector": {
                     "storageType": "u",
                     "pathOrInlineDv": z85_encode(u.bytes),
                     "offset": off, "sizeInBytes": size,
                     "cardinality": 3}}},
        {"add": {"path": "f2.parquet", "partitionValues": {}, "size": 1,
                 "modificationTime": 0, "dataChange": True,
                 "deletionVector": {
                     "storageType": "i",
                     "pathOrInlineDv": z85_encode(inline_payload),
                     "sizeInBytes": len(inline_payload),
                     "cardinality": 2}}},
    ]})
    survivors = sorted(set(range(20)) - {0, 3, 7, 12, 15})
    got = sorted(r.k for r in read_delta(spark, t).collect())
    assert got == survivors
    # append on a DV table: new rows land, old deletes stay applied
    write_delta(
        spark,
        t,
        spark.createDataFrame([(100,), (101,), (102,)], "k long"),
    )
    got = sorted(r.k for r in read_delta(spark, t).collect())
    assert got == survivors + [100, 101, 102]
    # OPTIMIZE materializes the DVs: same logical rows, no descriptors
    optimize_delta(spark, t, target_files=1)
    from jobminer_spark.sources.delta import (
        _replay_full,
        delta_latest_version,
    )

    adds, _rm, _m, _tx, _p = _replay_full(t, delta_latest_version(t))
    assert not any(a.get("deletionVector") for a in adds.values())
    got = sorted(r.k for r in read_delta(spark, t).collect())
    assert got == survivors + [100, 101, 102]


def test_delete_delta_merge_on_read_lifecycle(spark, tmp_path):
    """delete_delta writes DVs instead of rewriting files: matched
    rows vanish, repeated deletes COMPOSE (bitmap union), a no-match
    delete commits nothing, the protocol upgrades to reader 3/writer 7
    with the feature listed, time travel still sees pre-delete rows,
    and the checkpoint carries the descriptors."""
    from jobminer_spark.sources.delta import (
        _replay_full,
        _write_checkpoint,
        delete_delta,
        delta_latest_version,
    )

    t = str(tmp_path / "mord")
    write_delta(spark, t, _df(spark, 0, 40))
    write_delta(spark, t, _df(spark, 40, 80))
    n_files = len(read_delta(spark, t).inputFiles())

    v, n = delete_delta(spark, t, "k % 4 = 0")
    assert n == 20 and v == 2
    assert len(read_delta(spark, t).inputFiles()) == n_files  # no rewrite
    v2, n2 = delete_delta(spark, t, F.col("k") % 4 == 1)
    assert n2 == 20
    assert sorted(r.k for r in read_delta(spark, t).collect()) == [
        k for k in range(80) if k % 4 >= 2
    ]
    # no-match: no commit
    assert delete_delta(spark, t, "k > 999") == (v2, 0)
    # time travel sees the pre-delete snapshot
    assert read_delta(spark, t, version=1).count() == 80
    # protocol + config upgraded
    _adds, _rm, meta, _tx, proto = _replay_full(t, delta_latest_version(t))
    assert proto["minReaderVersion"] == 3
    assert "deletionVectors" in proto["readerFeatures"]
    assert meta["configuration"]["delta.enableDeletionVectors"] == "true"
    # checkpoint replay keeps the deletes (descriptors ride through)
    cv = delta_latest_version(t)
    _write_checkpoint(t, cv)
    for vv in range(cv):
        os.unlink(_commit_file(t, vv))
    assert read_delta(spark, t).count() == 40


def test_vacuum_retains_tombstoned_dv_until_retention(spark, tmp_path):
    """After OPTIMIZE materializes a delete, the old DV .bin is only
    TOMBSTONE-referenced — vacuum must keep it while the tombstone
    stands and collect it after retention."""
    import glob

    from jobminer_spark.sources.delta import (
        delete_delta,
        optimize_delta,
        vacuum_delta,
    )

    t = str(tmp_path / "dvret")
    write_delta(spark, t, _df(spark, 0, 30))
    delete_delta(spark, t, "k < 5")
    optimize_delta(spark, t, target_files=1)
    dv_bins = glob.glob(os.path.join(t, "deletion_vector_*.bin"))
    assert dv_bins  # one per touched data file
    # inside retention: everything kept
    deleted, kept = vacuum_delta(t, retention_ms=10**12)
    assert deleted == [] and all(os.path.exists(p) for p in dv_bins)
    # past retention: the orphaned DVs and old data files go
    deleted, _kept = vacuum_delta(t, retention_ms=0)
    deleted_names = {os.path.basename(p) for p in deleted}
    assert {os.path.basename(p) for p in dv_bins} <= deleted_names
    assert read_delta(spark, t).count() == 25


def test_vacuum_keeps_live_deletion_vector_files(spark, tmp_path):
    """VACUUM must treat a DV ``.bin`` referenced by an active add as
    live — deleting it would make the table unreadable."""
    import pyarrow as pa
    import pyarrow.parquet as papq
    import uuid as _uuid

    from jobminer_spark.sources.delta import vacuum_delta
    from jobminer_spark.sources.roaring import write_dv_file, z85_encode

    t = str(tmp_path / "dvvac")
    os.makedirs(t)
    papq.write_table(
        pa.table({"k": [1, 2, 3]}), os.path.join(t, "f1.parquet")
    )
    # an orphan file that SHOULD be vacuumed, aged past retention
    orphan = os.path.join(t, "orphan.parquet")
    papq.write_table(pa.table({"k": [9]}), orphan)
    old = 1_000_000_000
    os.utime(orphan, (old, old))
    u = _uuid.uuid4()
    dv_path = os.path.join(t, f"deletion_vector_{u}.bin")
    off, size = write_dv_file(dv_path, [1])
    os.utime(dv_path, (old, old))  # aged too — liveness must save it
    _craft_log(t, {0: [
        {"protocol": {"minReaderVersion": 3, "minWriterVersion": 7,
                      "readerFeatures": ["deletionVectors"],
                      "writerFeatures": ["deletionVectors"]}},
        {"metaData": _META},
        {"add": {"path": "f1.parquet", "partitionValues": {}, "size": 1,
                 "modificationTime": 0, "dataChange": True,
                 "deletionVector": {
                     "storageType": "u",
                     "pathOrInlineDv": z85_encode(u.bytes),
                     "offset": off, "sizeInBytes": size,
                     "cardinality": 1}}},
    ]})
    deleted, _kept = vacuum_delta(t, retention_ms=0)
    assert deleted == ["orphan.parquet"]
    assert os.path.exists(dv_path)
    assert sorted(r.k for r in read_delta(spark, t).collect()) == [1, 3]


def test_multipart_checkpoint_replays_or_fails_loudly(spark, tmp_path):
    """parts>1 in _last_checkpoint: the reader must IGNORE the
    checkpoint and replay commits (correct), and if the commit tail
    was cleaned it must fail with a message naming the cause — never
    read half a checkpoint."""
    t = str(tmp_path / "multipart")
    write_delta(spark, t, _df(spark, 0, 3))
    write_delta(spark, t, _df(spark, 3, 5))
    log = os.path.join(t, "_delta_log")
    with open(os.path.join(log, "_last_checkpoint"), "w") as f:
        json.dump({"version": 1, "size": 10, "parts": 2}, f)
    # fake multi-part files (never readable by this reader)
    for part in (1, 2):
        open(os.path.join(
            log, f"{1:020d}.checkpoint.{part:010d}.{2:010d}.parquet"
        ), "wb").close()
    assert read_delta(spark, t).count() == 5  # full replay, correct
    os.rename(_commit_file(t, 0), _commit_file(t, 0) + ".gone")
    with pytest.raises(ValueError, match="multi-part"):
        read_delta(spark, t)
    os.rename(_commit_file(t, 0) + ".gone", _commit_file(t, 0))


def test_multipart_checkpoint_reads_when_complete(spark, tmp_path):
    """A COMPLETE multi-part checkpoint set is consumed as the replay
    base: split our own checkpoint rows across two part files, delete
    the pre-checkpoint commits, and the snapshot must still resolve —
    proof the parts (not a full replay) produced it."""
    import pyarrow.parquet as papq

    from jobminer_spark.sources.delta import _write_checkpoint

    t = str(tmp_path / "multipart_ok")
    write_delta(spark, t, _df(spark, 0, 3))
    write_delta(spark, t, _df(spark, 3, 7))
    _write_checkpoint(t, 1)
    tbl = papq.read_table(_checkpoint_file(t, 1))
    log = os.path.join(t, "_delta_log")
    half = max(tbl.num_rows // 2, 1)
    papq.write_table(
        tbl.slice(0, half),
        os.path.join(log, f"{1:020d}.checkpoint.{1:010d}.{2:010d}.parquet"),
    )
    papq.write_table(
        tbl.slice(half),
        os.path.join(log, f"{1:020d}.checkpoint.{2:010d}.{2:010d}.parquet"),
    )
    os.unlink(_checkpoint_file(t, 1))
    with open(os.path.join(log, "_last_checkpoint"), "w") as f:
        json.dump({"version": 1, "size": tbl.num_rows, "parts": 2}, f)
    os.rename(_commit_file(t, 0), _commit_file(t, 0) + ".gone")
    os.rename(_commit_file(t, 1), _commit_file(t, 1) + ".gone")
    assert read_delta(spark, t).count() == 7
    assert read_delta(spark, t).agg(F.sum("k")).first()[0] == sum(range(7))


def test_delta_changes_rejects_dv_adds(spark, tmp_path):
    """The incremental changes reader must refuse a range containing a
    DV-carrying add — an in-place delete it would otherwise paper
    over as an append."""
    from jobminer_spark.sources.delta import delta_changes_adds

    t = str(tmp_path / "dvchanges")
    write_delta(spark, t, _df(spark, 0, 3))
    with open(_commit_file(t, 1), "w") as f:
        f.write(json.dumps({"add": {
            "path": "x.parquet", "partitionValues": {}, "size": 1,
            "modificationTime": 0, "dataChange": True,
            "deletionVector": {"storageType": "i", "pathOrInlineDv": "",
                               "sizeInBytes": 0, "cardinality": 2},
        }}) + "\n")
    with pytest.raises(ValueError, match="deletion-vector"):
        delta_changes_adds(t, -1)


def test_foreign_commit_unknown_actions_ignored(spark, tmp_path):
    """External writers emit commitInfo/domainMetadata/cdc lines; the
    protocol says readers IGNORE unknown actions. Also: removes with
    extendedFileMetadata keys must replay and checkpoint cleanly."""
    import pyarrow.parquet as papq

    from jobminer_spark.sources.delta import _write_checkpoint

    import time as _time

    t = str(tmp_path / "foreign")
    write_delta(spark, t, _df(spark, 0, 4))  # v0
    with open(_commit_file(t, 0)) as f:
        v0 = [json.loads(line) for line in f if line.strip()]
    real_adds = [a["add"] for a in v0 if "add" in a]
    now_ms = int(_time.time() * 1000)
    _craft_log(t, {1: [
        {"commitInfo": {"operation": "WRITE", "engineInfo": "ext/9.9"}},
        {"domainMetadata": {"domain": "x", "configuration": "{}",
                            "removed": False}},
        *(
            {"remove": {"path": a["path"], "deletionTimestamp": now_ms,
                        "dataChange": True, "extendedFileMetadata": True,
                        "partitionValues": {}, "size": a["size"]}}
            for a in real_adds
        ),
    ]})
    assert read_delta(spark, t).count() == 0  # removes applied
    assert read_delta(spark, t, version=0).count() == 4
    _write_checkpoint(t, 1)  # extended remove keys projected, no crash
    rows = papq.read_table(_checkpoint_file(t, 1)).to_pylist()
    assert {r["remove"]["path"] for r in rows if r.get("remove")} == {
        a["path"] for a in real_adds
    }


def test_foreign_checkpoint_with_tombstones_and_extra_columns(
    spark, tmp_path
):
    """A foreign checkpoint may carry remove tombstone rows and extra
    columns (stats, tags); replay must take the adds, not resurrect
    the removes, and ignore what it doesn't know."""
    import pyarrow as pa
    import pyarrow.parquet as papq

    t = str(tmp_path / "fckpt")
    write_delta(spark, t, _df(spark, 0, 4))  # v0: files + metaData
    write_delta(spark, t, _df(spark, 4, 6))  # v1
    with open(_commit_file(t, 0)) as f:
        v0 = [json.loads(line) for line in f if line.strip()]
    with open(_commit_file(t, 1)) as f:
        v1 = [json.loads(line) for line in f if line.strip()]
    meta = next(a["metaData"] for a in v0 if "metaData" in a)
    adds0 = [a["add"] for a in v0 if "add" in a]
    adds1 = [a["add"] for a in v1 if "add" in a]
    # foreign checkpoint at v1: v1 adds active, v0 files tombstoned,
    # plus a "stats" column ours doesn't model
    rows = [{
        "protocol": {"minReaderVersion": 1, "minWriterVersion": 2},
        "metaData": {
            "id": meta["id"], "format": meta["format"],
            "schemaString": meta["schemaString"],
            "partitionColumns": [], "configuration": {},
            "createdTime": 0,
        },
        "add": None, "remove": None, "stats": None,
    }]
    rows += [{"protocol": None, "metaData": None, "add": {
        "path": a["path"], "partitionValues": [],
        "size": a["size"], "modificationTime": 0, "dataChange": True,
    }, "remove": None, "stats": '{"numRecords": 1}'} for a in adds1]
    rows += [{"protocol": None, "metaData": None, "add": None,
              "remove": {"path": a["path"], "deletionTimestamp": 123,
                         "dataChange": True},
              "stats": None} for a in adds0]
    str_map = pa.map_(pa.string(), pa.string())
    schema = pa.schema([
        pa.field("protocol", pa.struct([
            pa.field("minReaderVersion", pa.int32()),
            pa.field("minWriterVersion", pa.int32())])),
        pa.field("metaData", pa.struct([
            pa.field("id", pa.string()),
            pa.field("format", pa.struct([
                pa.field("provider", pa.string()),
                pa.field("options", str_map)])),
            pa.field("schemaString", pa.string()),
            pa.field("partitionColumns", pa.list_(pa.string())),
            pa.field("configuration", str_map),
            pa.field("createdTime", pa.int64())])),
        pa.field("add", pa.struct([
            pa.field("path", pa.string()),
            pa.field("partitionValues", str_map),
            pa.field("size", pa.int64()),
            pa.field("modificationTime", pa.int64()),
            pa.field("dataChange", pa.bool_())])),
        pa.field("remove", pa.struct([
            pa.field("path", pa.string()),
            pa.field("deletionTimestamp", pa.int64()),
            pa.field("dataChange", pa.bool_())])),
        pa.field("stats", pa.string()),
    ])
    papq.write_table(
        pa.Table.from_pylist(rows, schema=schema), _checkpoint_file(t, 1)
    )
    log = os.path.join(t, "_delta_log")
    with open(os.path.join(log, "_last_checkpoint"), "w") as f:
        json.dump({"version": 1, "size": len(rows)}, f)
    # a later commit survives log cleanup (the usual foreign shape);
    # its only action is one this reader must ignore
    _craft_log(t, {2: [
        {"commitInfo": {"operation": "OPTIMIZE", "engineInfo": "ext"}},
    ]})
    # hide the commits the checkpoint replaces: replay MUST come from
    # the foreign checkpoint alone
    os.rename(_commit_file(t, 0), _commit_file(t, 0) + ".bak")
    os.rename(_commit_file(t, 1), _commit_file(t, 1) + ".bak")
    try:
        got = read_delta(spark, t)
        assert sorted(r["k"] for r in got.collect()) == [4, 5]
    finally:
        os.rename(_commit_file(t, 0) + ".bak", _commit_file(t, 0))
        os.rename(_commit_file(t, 1) + ".bak", _commit_file(t, 1))


def test_foreign_null_partition_values_read(spark, tmp_path):
    """An external table storing protocol-correct JSON null partition
    values must read (None used to TypeError in the group sort)."""
    t = str(tmp_path / "fnull")
    df = spark.range(0, 4).select(
        F.col("id").alias("k"),
        F.when(F.col("id") < 2, F.lit("x")).alias("p"),
    )
    write_delta(spark, t, df, partition_by=["p"])
    # assert the fixture actually contains a JSON-null partition value
    with open(_commit_file(t, 0)) as f:
        blob = f.read()
    assert '"p": null' in blob or '"p":null' in blob.replace(" ", "")
    back = read_delta(spark, t)
    assert back.filter(F.col("p").isNull()).count() == 2
    assert back.filter(F.col("p") == "x").count() == 2


def test_optimize_partitioned_compacts_within_partitions(spark, tmp_path):
    """Partitioned OPTIMIZE: each partitionValues group compacts to at
    most target_files; groups already small stay byte-identical; the
    null partition compacts too; partition values survive."""
    from jobminer_spark.sources.delta import optimize_delta

    t = str(tmp_path / "optpart")
    for i in range(5):
        df = spark.range(i * 8, i * 8 + 8).select(
            F.col("id").alias("k"),
            F.when(F.col("id") % 3 == 0, F.lit(None))
            .otherwise((F.col("id") % 3).cast("string"))
            .alias("p"),
        )
        write_delta(spark, t, df, partition_by=["p"])
    before = read_delta(spark, t)
    rows_before = sorted(r["k"] for r in before.collect())
    nulls_before = before.filter(F.col("p").isNull()).count()
    n_files_before = len(before.inputFiles())
    assert n_files_before > 3 * 2  # each partition has >2 files

    v, nb, na = optimize_delta(spark, t, target_files=2)
    assert nb == n_files_before and na <= 3 * 2
    after = read_delta(spark, t)
    assert len(after.inputFiles()) == na
    assert sorted(r["k"] for r in after.collect()) == rows_before
    assert after.filter(F.col("p").isNull()).count() == nulls_before
    # adds carry the GROUP's partitionValues (incl. JSON null)
    with open(_commit_file(t, v)) as f:
        actions = [json.loads(line) for line in f if line.strip()]
    pvs = [a["add"]["partitionValues"]["p"] for a in actions if "add" in a]
    assert None in pvs and {x for x in pvs if x is not None} <= {"1", "2"}
    assert all(
        not a.get("add", a.get("remove"))["dataChange"] for a in actions
    )
    # per-partition pruned read still correct post-compaction
    assert read_delta(spark, t, partition_filters={"p": None}).count() == (
        nulls_before
    )


def test_vacuum_deletes_expired_unreferenced_files_only(spark, tmp_path):
    """VACUUM: files tombstoned past retention go; live files and
    recent tombstones stay; time travel to a vacuumed version fails at
    scan, the current snapshot is untouched."""
    from jobminer_spark.sources.delta import optimize_delta, vacuum_delta

    t = str(tmp_path / "vac")
    for i in range(6):
        write_delta(spark, t, _df(spark, i * 2, i * 2 + 2))
    v, nb, na = optimize_delta(spark, t, target_files=1)
    rows = sorted(r["k"] for r in read_delta(spark, t).collect())

    # recent tombstones: default retention keeps everything
    deleted, kept = vacuum_delta(t)
    assert deleted == [] and kept == nb
    # dry run with zero retention names them but deletes nothing
    dry, _ = vacuum_delta(t, retention_ms=-60_000, dry_run=True)
    assert len(dry) == nb
    assert read_delta(spark, t, version=v - 1).count() == 12
    # real vacuum past retention
    deleted, kept = vacuum_delta(t, retention_ms=-60_000)
    assert sorted(deleted) == sorted(dry) and kept == 0
    assert sorted(r["k"] for r in read_delta(spark, t).collect()) == rows
    # the vacuumed pre-OPTIMIZE layout is gone: the travel read fails
    # loudly (Spark resolves the listed paths at plan build)
    with pytest.raises(Exception, match="PATH_NOT_FOUND|does not exist"):
        read_delta(spark, t, version=v - 1).count()
    # idempotent: nothing left to delete
    assert vacuum_delta(t, retention_ms=-60_000) == ([], 0)


def test_foreign_checkpoint_metadata_configuration_map(spark, tmp_path):
    """pyarrow returns checkpoint MAP columns as (k, v) tuple lists; a
    foreign checkpoint whose metaData carries table properties (every
    delta-spark table does) must normalize to dicts — not crash the
    metadata gate — and a column-mapping property arriving THROUGH the
    checkpoint must still reject by name."""
    import pyarrow as pa
    import pyarrow.parquet as papq

    def _ckpt(t, conf_pairs):
        write_delta(spark, t, _df(spark, 0, 3))
        with open(_commit_file(t, 0)) as f:
            v0 = [json.loads(line) for line in f if line.strip()]
        meta = next(a["metaData"] for a in v0 if "metaData" in a)
        adds = [a["add"] for a in v0 if "add" in a]
        str_map = pa.map_(pa.string(), pa.string())
        schema = pa.schema([
            pa.field("protocol", pa.struct([
                pa.field("minReaderVersion", pa.int32()),
                pa.field("minWriterVersion", pa.int32())])),
            pa.field("metaData", pa.struct([
                pa.field("id", pa.string()),
                pa.field("format", pa.struct([
                    pa.field("provider", pa.string()),
                    pa.field("options", str_map)])),
                pa.field("schemaString", pa.string()),
                pa.field("partitionColumns", pa.list_(pa.string())),
                pa.field("configuration", str_map),
                pa.field("createdTime", pa.int64())])),
            pa.field("add", pa.struct([
                pa.field("path", pa.string()),
                pa.field("partitionValues", str_map),
                pa.field("size", pa.int64()),
                pa.field("modificationTime", pa.int64()),
                pa.field("dataChange", pa.bool_())])),
        ])
        rows = [{
            "protocol": {"minReaderVersion": 1, "minWriterVersion": 2},
            "metaData": {
                "id": meta["id"], "format": meta["format"],
                "schemaString": meta["schemaString"],
                "partitionColumns": [],
                "configuration": conf_pairs, "createdTime": 0,
            },
            "add": None,
        }]
        rows += [{"protocol": None, "metaData": None, "add": {
            "path": a["path"], "partitionValues": [], "size": a["size"],
            "modificationTime": 0, "dataChange": True}} for a in adds]
        papq.write_table(
            pa.Table.from_pylist(rows, schema=schema), _checkpoint_file(t, 0)
        )
        with open(os.path.join(t, "_delta_log", "_last_checkpoint"), "w") as f:
            json.dump({"version": 0, "size": len(rows)}, f)

    t1 = str(tmp_path / "conf_ok")
    _ckpt(t1, [("delta.appendOnly", "false")])
    assert read_delta(spark, t1).count() == 3  # benign property: reads
    t2 = str(tmp_path / "conf_cmap")
    _ckpt(t2, [("delta.columnMapping.mode", "name")])
    with pytest.raises(ValueError, match="columnMapping"):
        read_delta(spark, t2)


def test_null_deletion_timestamp_tombstone_handled(spark, tmp_path):
    """The protocol marks remove.deletionTimestamp optional; a foreign
    null must act as 'expired' (checkpointed out, vacuumable), never
    TypeError."""
    from jobminer_spark.sources.delta import (
        _write_checkpoint,
        vacuum_delta,
        write_delta as _wd,
    )

    t = str(tmp_path / "nullts")
    _wd(spark, t, _df(spark, 0, 3))
    with open(_commit_file(t, 0)) as f:
        v0 = [json.loads(line) for line in f if line.strip()]
    victim = next(a["add"] for a in v0 if "add" in a)
    with open(_commit_file(t, 1), "w") as f:
        f.write(json.dumps({"remove": {
            "path": victim["path"], "deletionTimestamp": None,
            "dataChange": True,
        }}) + "\n")
    _write_checkpoint(t, 1)  # no TypeError; null ts -> expired, dropped
    import pyarrow.parquet as papq

    rows = papq.read_table(_checkpoint_file(t, 1)).to_pylist()
    assert not any(r.get("remove") for r in rows)
    deleted, kept = vacuum_delta(t, retention_ms=-60_000)
    assert victim["path"] in deleted


def test_optimize_checkpoints_on_interval_multiple(spark, tmp_path):
    """A maintenance commit landing on a checkpoint_interval multiple
    must write the checkpoint too — log compaction is per-version, not
    per-writer."""
    from jobminer_spark.sources.delta import optimize_delta

    t = str(tmp_path / "optckpt")
    for i in range(10):  # versions 0..9
        write_delta(spark, t, _df(spark, i, i + 1))
    v, _nb, _na = optimize_delta(spark, t, target_files=1)
    assert v == 10
    assert os.path.exists(_checkpoint_file(t, 10))
    with open(os.path.join(t, "_delta_log", "_last_checkpoint")) as f:
        assert json.load(f)["version"] == 10


def test_stats_written_and_data_skipping_prunes_files(spark, tmp_path):
    """Adds carry delta-spark's stats JSON for integer AND string
    columns (r19: strings are safe as pruning BOUNDS — the parquet
    truncation rule keeps a truncated min a prefix and increments a
    truncated max, both still conservative); a stats_filters range
    read plans ONLY the files whose [min,max] can intersect — and
    stats survive checkpoint compaction."""
    from jobminer_spark.sources.delta import _write_checkpoint

    t = str(tmp_path / "skip")
    for i in range(4):  # file i holds k in [i*10, i*10+10)
        write_delta(
            spark, t, _df(spark, i * 10, i * 10 + 10).repartition(1)
        )
    with open(_commit_file(t, 0)) as f:
        v0 = [json.loads(line) for line in f if line.strip()]
    st = json.loads(next(a["add"]["stats"] for a in v0 if "add" in a))
    assert st["numRecords"] == 10
    assert st["minValues"]["k"] == 0 and st["maxValues"]["k"] == 9
    # string stats are written and usable as bounds
    assert st["minValues"]["tag"] == "a" and st["maxValues"]["tag"] == "a"
    assert len(
        read_delta(spark, t, stats_filters={"tag": ("b", None)})
        .inputFiles()
    ) == 0
    pruned = read_delta(spark, t, stats_filters={"k": (12, 17)})
    assert len(pruned.inputFiles()) == 1
    assert sorted(
        r["k"] for r in pruned.filter(F.col("k").between(12, 17)).collect()
    ) == list(range(12, 18))
    # open ends and multi-file ranges
    assert len(read_delta(spark, t, stats_filters={"k": (25, None)})
               .inputFiles()) == 2
    assert len(read_delta(spark, t, stats_filters={"k": (None, 9)})
               .inputFiles()) == 1
    # conservative: unknown column never prunes
    assert len(read_delta(spark, t, stats_filters={"zz": (0, 1)})
               .inputFiles()) == 4
    # stats survive the checkpoint
    _write_checkpoint(t, 3)
    for v in range(4):
        os.rename(_commit_file(t, v), _commit_file(t, v) + ".bak")
    with open(_commit_file(t, 4), "w") as f:
        f.write(json.dumps({"commitInfo": {"operation": "NOOP"}}) + "\n")
    try:
        assert len(read_delta(spark, t, stats_filters={"k": (12, 17)})
                   .inputFiles()) == 1
    finally:
        os.unlink(_commit_file(t, 4))
        for v in range(4):
            os.rename(_commit_file(t, v) + ".bak", _commit_file(t, v))


def test_delta_changes_incremental_read(spark, tmp_path):
    """delta_changes delivers exactly the rows appended in a version
    range, skips dataChange=false rearrangements, and REFUSES a range
    containing a real delete/overwrite."""
    from jobminer_spark.sources.delta import (
        delta_changes,
        delta_changes_adds,
        optimize_delta,
    )

    t = str(tmp_path / "chg")
    for i in range(4):  # v0..v3
        write_delta(spark, t, _df(spark, i * 5, i * 5 + 5))
    v, _nb, na = optimize_delta(spark, t, target_files=1)  # v4, no data chg
    write_delta(spark, t, _df(spark, 100, 103))  # v5
    # full incremental == full snapshot
    inc = delta_changes(spark, t, -1)
    assert sorted(r["k"] for r in inc.collect()) == sorted(
        r["k"] for r in read_delta(spark, t).collect()
    )
    _, n_skipped = delta_changes_adds(t, -1)
    assert n_skipped == na  # the OPTIMIZE outputs were skipped
    # single-version batches
    assert sorted(r["k"] for r in delta_changes(spark, t, 4, 5).collect()) \
        == [100, 101, 102]
    assert delta_changes(spark, t, 3, 4).count() == 0  # OPTIMIZE only
    # an overwrite in range must refuse
    write_delta(spark, t, _df(spark, 0, 2), mode="overwrite")  # v6
    with pytest.raises(ValueError, match="removes data"):
        delta_changes(spark, t, 5)
    # ...but a range ending before it still reads
    assert delta_changes(spark, t, 4, 5).count() == 3


def test_update_delta_merge_on_read(spark, tmp_path):
    """update_delta masks old row versions with DVs and re-inserts the
    transformed rows in the SAME commit — including rows that MOVE
    partitions when an assignment touches the partition column."""
    from jobminer_spark.sources.delta import update_delta

    t = str(tmp_path / "upd")
    write_delta(spark, t, _df(spark, 0, 30))
    n_files = len(read_delta(spark, t).inputFiles())
    v, n = update_delta(spark, t, "k < 5", {"v": "v + 1000"})
    assert n == 5
    rows = {r.k: r.v for r in read_delta(spark, t).collect()}
    assert len(rows) == 30
    assert all(rows[k] == 10 * k + 1000 for k in range(5))
    assert all(rows[k] == 10 * k for k in range(5, 30))
    # old files untouched; only the delta of changed rows was written
    assert len(read_delta(spark, t).inputFiles()) > n_files - 1
    # time travel sees the pre-update values
    old = {r.k: r.v for r in read_delta(spark, t, version=v - 1).collect()}
    assert old[0] == 0
    # bad assignment target fails loudly
    with pytest.raises(ValueError, match="not a table column"):
        update_delta(spark, t, "k = 1", {"nope": "1"})


def test_update_delta_moves_rows_across_partitions(spark, tmp_path):
    from jobminer_spark.sources.delta import update_delta

    t = str(tmp_path / "updpart")
    df = spark.range(0, 20).select(
        F.col("id").alias("k"),
        F.when(F.col("id") % 2 == 0, "even").otherwise("odd").alias("par"),
    )
    write_delta(spark, t, df, partition_by=["par"])
    _v, n = update_delta(spark, t, "k = 4", {"par": "'odd'"})
    assert n == 1
    moved = read_delta(spark, t, partition_filters={"par": "odd"})
    assert 4 in {r.k for r in moved.collect()}
    assert read_delta(spark, t).count() == 20


def test_restore_delta_roundtrip_and_history(spark, tmp_path):
    """RESTORE makes the latest snapshot equal the target version in
    one metadata commit, keeps history (time travel to the pre-restore
    state still works), restores DV descriptors with their files, and
    refuses a target whose bytes were vacuumed."""
    from jobminer_spark.sources.delta import (
        delete_delta,
        restore_delta,
        vacuum_delta,
    )

    t = str(tmp_path / "restore")
    write_delta(spark, t, _df(spark, 0, 10))         # v0
    write_delta(spark, t, _df(spark, 10, 20))        # v1
    delete_delta(spark, t, "k < 3")                  # v2 (DV)
    write_delta(spark, t, _df(spark, 100, 103), mode="overwrite")  # v3

    # restore to the DV state: deletes must come back WITH the table
    v, readded, removed = restore_delta(spark, t, 2)
    assert v == 4 and readded > 0 and removed > 0
    assert sorted(r.k for r in read_delta(spark, t).collect()) == list(
        range(3, 20)
    )
    # history preserved: the overwrite state is still reachable
    assert sorted(
        r.k for r in read_delta(spark, t, version=3).collect()
    ) == [100, 101, 102]
    # idempotent: restoring to the now-current state is a no-op
    assert restore_delta(spark, t, 4) == (4, 0, 0)
    # restore to v1: pre-delete rows return
    restore_delta(spark, t, 1)
    assert read_delta(spark, t).count() == 20
    # vacuum away the overwrite's file, then restoring to it must fail
    deleted, _k = vacuum_delta(t, retention_ms=0)
    assert deleted
    with pytest.raises(ValueError, match="vacuumed"):
        restore_delta(spark, t, 3)


def test_change_data_feed_cdc_and_derived(spark, tmp_path):
    """CDF: delete/update commits on an enabled table write
    `_change_data` files the feed reads exclusively; plain commits
    derive inserts from adds and full-file deletes from removes; the
    guarded impossible cases fail loudly."""
    from jobminer_spark.sources.delta import (
        delete_delta,
        delta_change_feed,
        update_delta,
    )

    t = str(tmp_path / "cdf")
    write_delta(
        spark,
        t,
        _df(spark, 0, 20),
        configuration={"delta.enableChangeDataFeed": "true"},
    )
    delete_delta(spark, t, "k < 3")
    update_delta(spark, t, "k >= 18", {"v": "v + 7"})
    feed = delta_change_feed(spark, t, -1)
    by = {}
    for r in feed.collect():
        by.setdefault((r._commit_version, r._change_type), []).append(
            (r.k, r.v)
        )
    assert sorted(k for k, _ in by[(0, "insert")]) == list(range(20))
    assert sorted(k for k, _ in by[(1, "delete")]) == [0, 1, 2]
    assert sorted(by[(2, "update_preimage")]) == [(18, 180), (19, 190)]
    assert sorted(by[(2, "update_postimage")]) == [(18, 187), (19, 197)]
    # cdc files live under _change_data and are NOT in the active set
    assert os.path.isdir(os.path.join(t, "_change_data"))
    assert read_delta(spark, t).count() == 17

    # derived deletes for a PARTITIONED table must refuse
    t2 = str(tmp_path / "cdfpart")
    df = spark.range(0, 10).select(
        F.col("id").alias("k"), (F.col("id") % 2).alias("p")
    )
    write_delta(spark, t2, df, partition_by=["p"])
    write_delta(
        spark, t2, df.filter("k < 2"), mode="overwrite",
        partition_by=["p"],
    )
    with pytest.raises(ValueError, match="PARTITIONED"):
        delta_change_feed(spark, t2, -1).collect()

    # vacuumed remove target must refuse
    from jobminer_spark.sources.delta import vacuum_delta

    t3 = str(tmp_path / "cdfvac")
    write_delta(spark, t3, _df(spark, 0, 5))
    write_delta(spark, t3, _df(spark, 5, 8), mode="overwrite")
    vacuum_delta(t3, retention_ms=0)
    with pytest.raises(ValueError, match="vacuumed"):
        delta_change_feed(spark, t3, -1).collect()


def test_change_feed_reads_legacy_inline_partition_cdc(
    spark, tmp_path
):
    """ADVICE r17: cdc files written by this engine before r17 stored
    partition columns INLINE with empty partitionValues. The feed
    must return the real partition values from the file — and fail
    loudly when neither partitionValues nor inline columns exist —
    never silently emit NULLs."""
    import pyarrow as pa
    import pyarrow.parquet as papq

    from jobminer_spark.sources.delta import delta_change_feed

    t = str(tmp_path / "cdflegacy")
    df = spark.range(0, 4).select(
        F.col("id").alias("k"), (F.col("id") % 2).alias("p")
    )
    write_delta(
        spark, t, df, partition_by=["p"],
        configuration={"delta.enableChangeDataFeed": "true"},
    )
    os.makedirs(os.path.join(t, "_change_data"), exist_ok=True)
    papq.write_table(
        pa.table({
            "k": pa.array([0, 2], pa.int64()),
            "p": pa.array([0, 0], pa.int64()),
            "_change_type": pa.array(["delete", "delete"]),
        }),
        os.path.join(t, "_change_data", "legacy.parquet"),
    )
    with open(_commit_file(t, 1), "w") as f:
        f.write(json.dumps({"cdc": {
            "path": "_change_data/legacy.parquet",
            "partitionValues": {}, "size": 1, "dataChange": False,
        }}) + "\n")
    rows = [
        (r.k, r.p, r._change_type)
        for r in delta_change_feed(spark, t, -1).collect()
        if r._commit_version == 1
    ]
    assert sorted(rows) == [(0, 0, "delete"), (2, 0, "delete")]

    # neither partitionValues nor inline partition column: loud
    papq.write_table(
        pa.table({
            "k": pa.array([1], pa.int64()),
            "_change_type": pa.array(["delete"]),
        }),
        os.path.join(t, "_change_data", "broken.parquet"),
    )
    with open(_commit_file(t, 2), "w") as f:
        f.write(json.dumps({"cdc": {
            "path": "_change_data/broken.parquet",
            "partitionValues": {}, "size": 1, "dataChange": False,
        }}) + "\n")
    with pytest.raises(ValueError, match="reconstruct"):
        delta_change_feed(spark, t, -1).collect()


def test_change_feed_skips_predeleted_rows_in_derived_removes(
    spark, tmp_path
):
    """A dataChange remove of a file that already carried a DV (e.g.
    an overwrite after a delete on a NON-CDF table) must not re-report
    the DV-deleted rows as deletes."""
    from jobminer_spark.sources.delta import (
        delete_delta,
        delta_change_feed,
    )

    t = str(tmp_path / "cdfdv")
    write_delta(spark, t, _df(spark, 0, 10))
    delete_delta(spark, t, "k < 4")  # v1: DV delete, no CDF config
    write_delta(spark, t, _df(spark, 50, 52), mode="overwrite")  # v2
    # v1 has no cdc files and re-publishes a DV add -> the feed cannot
    # represent it; reading across v1 must fail loudly... unless the
    # range starts after it. v2's removes carry the v1 DV, so the six
    # SURVIVING rows are the deletes, not all ten.
    feed = delta_change_feed(spark, t, 1, 2)
    by = {}
    for r in feed.collect():
        by.setdefault(r._change_type, []).append(r.k)
    assert sorted(by["delete"]) == list(range(4, 10))
    assert sorted(by["insert"]) == [50, 51]


def test_writer_feature_gate(spark, tmp_path):
    """The protocol's writer rule: refuse tables demanding writer
    features this writer does not implement, enforce appendOnly, and
    refuse tables that actually USE invariants/constraints/generated
    columns rather than silently corrupt them."""
    from jobminer_spark.sources.delta import delete_delta

    # unknown writer feature
    t = str(tmp_path / "wfeat")
    write_delta(spark, t, _df(spark, 0, 3))
    with open(_commit_file(t, 1), "w") as f:
        f.write(json.dumps({"protocol": {
            "minReaderVersion": 3, "minWriterVersion": 7,
            "readerFeatures": ["deletionVectors"],
            "writerFeatures": ["deletionVectors", "icebergCompatV2"],
        }}) + "\n")
    assert read_delta(spark, t).count() == 3  # reads stay fine
    with pytest.raises(ValueError, match="icebergCompatV2"):
        write_delta(spark, t, _df(spark, 3, 4))
    with pytest.raises(ValueError, match="icebergCompatV2"):
        delete_delta(spark, t, "k = 0")

    # appendOnly: appends fine, deletes/overwrites refused
    t2 = str(tmp_path / "aponly")
    write_delta(
        spark, t2, _df(spark, 0, 3),
        configuration={"delta.appendOnly": "true"},
    )
    write_delta(spark, t2, _df(spark, 3, 5))
    with pytest.raises(ValueError, match="appendOnly"):
        write_delta(spark, t2, _df(spark, 0, 1), mode="overwrite")
    with pytest.raises(ValueError, match="appendOnly"):
        delete_delta(spark, t2, "k = 0")

    # a CHECK constraint in configuration is ENFORCED (r17): a
    # satisfying batch commits, a violating one is rejected by name
    t3 = str(tmp_path / "constr")
    write_delta(spark, t3, _df(spark, 1, 3))
    with open(_commit_file(t3, 1), "w") as f:
        f.write(json.dumps({"metaData": {
            "id": "x", "format": {"provider": "parquet", "options": {}},
            "schemaString": json.dumps({"type": "struct", "fields": [
                {"name": "k", "type": "long", "nullable": False,
                 "metadata": {}},
                {"name": "v", "type": "long", "nullable": False,
                 "metadata": {}},
                {"name": "tag", "type": "string", "nullable": False,
                 "metadata": {}},
            ]}),
            "partitionColumns": [], "createdTime": 0,
            "configuration": {"delta.constraints.positive": "k > 0"},
        }}) + "\n")
    write_delta(spark, t3, _df(spark, 3, 4))  # k=3 satisfies k > 0
    with pytest.raises(
        ValueError, match=r"CHECK constraint violated.*positive"
    ):
        write_delta(spark, t3, _df(spark, 0, 2))  # k=0 violates
    assert sorted(r.k for r in read_delta(spark, t3).collect()) == [
        1, 2, 3,
    ]


def test_dv_delete_on_path_with_space(spark, tmp_path):
    """URI-encoding regression guard: _metadata.file_path percent-
    encodes a table dir with a space; the DV anti-join keys must still
    match (review r16 — a raw-path key silently resurrected every
    DV-deleted row)."""
    from jobminer_spark.sources.delta import delete_delta

    t = str(tmp_path / "has space" / "t")
    os.makedirs(os.path.dirname(t), exist_ok=True)
    write_delta(spark, t, _df(spark, 0, 12))
    v, n = delete_delta(spark, t, "k < 4")
    assert n == 4
    assert sorted(r.k for r in read_delta(spark, t).collect()) == list(
        range(4, 12)
    )


def test_dv_delete_on_path_with_plus(spark, tmp_path):
    """try_url_decode is form-urlencoded decoding: a literal '+' in
    the table path must NOT become a space on the Spark side of the
    DV anti-join (ADVICE r16 — it silently resurrected every
    DV-deleted row and broke delete_delta's rel_by_uri lookup)."""
    from jobminer_spark.sources.delta import delete_delta

    t = str(tmp_path / "a+b" / "t")
    os.makedirs(os.path.dirname(t), exist_ok=True)
    write_delta(spark, t, _df(spark, 0, 12))
    v, n = delete_delta(spark, t, "k < 4")
    assert n == 4
    assert sorted(r.k for r in read_delta(spark, t).collect()) == list(
        range(4, 12)
    )
    # second delete exercises rel_by_uri + old-DV composition on the
    # same '+' path
    v2, n2 = delete_delta(spark, t, "k = 11")
    assert n2 == 1
    assert sorted(r.k for r in read_delta(spark, t).collect()) == list(
        range(4, 11)
    )


def test_dv_decode_runs_in_executors_past_threshold(
    spark, tmp_path, monkeypatch
):
    """Scale contract (VERDICT r16 item 2): past _DV_DRIVER_DECODE_MAX
    the DV bitmaps are decoded in EXECUTORS. Forcing the threshold to
    -1 and poisoning the driver-side _dv_indices proves the driver
    never materializes a positions list — the snapshot read, the
    repeated-delete composition read, and the CDF merge-on-read diff
    all stay correct through the mapInPandas path."""
    from jobminer_spark.sources import delta as D

    t = str(tmp_path / "dvexec")
    write_delta(spark, t, _df(spark, 0, 40))
    D.delete_delta(spark, t, "k % 4 = 0")
    D.delete_delta(spark, t, "k % 4 = 1")

    monkeypatch.setattr(D, "_DV_DRIVER_DECODE_MAX", -1)

    def _boom(*_a, **_k):  # executors re-import the real module
        raise AssertionError("DV bitmap decoded on the driver")

    monkeypatch.setattr(D, "_dv_indices", _boom)
    assert sorted(r.k for r in D.read_delta(spark, t).collect()) == [
        k for k in range(40) if k % 4 >= 2
    ]
    # CDF derived branch rides the same executor path (diff decode)
    feed = D.delta_change_feed(spark, t, 0, 2).collect()
    assert sorted(r.k for r in feed if r._change_type == "delete") == [
        k for k in range(40) if k % 4 <= 1
    ]


def test_upgrade_carries_legacy_writer_features(spark, tmp_path):
    """The table-features upgrade rule (ADVICE r16): promoting a
    legacy table to writer 7 must list EVERY feature the prior legacy
    version implied — a CDF table at minWriterVersion=4 keeps
    changeDataFeed (and checkConstraints/generatedColumns) listed, so
    conforming engines still honor delta.enableChangeDataFeed."""
    from jobminer_spark.sources.delta import (
        _replay_full,
        delete_delta,
        delta_latest_version,
    )

    t = str(tmp_path / "cdf4")
    write_delta(
        spark, t, _df(spark, 0, 10),
        configuration={"delta.enableChangeDataFeed": "true"},
    )
    with open(_commit_file(t, 0)) as f:
        proto0 = next(
            json.loads(line)["protocol"]
            for line in f
            if "protocol" in line
        )
    assert proto0["minWriterVersion"] == 4
    delete_delta(spark, t, "k < 3")
    _a, _r, _m, _t, proto = _replay_full(t, delta_latest_version(t))
    assert proto["minWriterVersion"] == 7
    assert {
        "appendOnly", "invariants", "checkConstraints",
        "changeDataFeed", "generatedColumns", "deletionVectors",
    } <= set(proto["writerFeatures"])
    # a feature the prior version did NOT imply stays unlisted
    assert "identityColumns" not in proto["writerFeatures"]


def test_upgrade_carries_reader2_column_mapping(spark, tmp_path):
    """Legacy minReaderVersion=2 implies columnMapping; the reader-3
    promotion must carry it into readerFeatures."""
    from jobminer_spark.sources.delta import (
        _replay_full,
        delete_delta,
        delta_latest_version,
    )

    t = str(tmp_path / "rv2")
    write_delta(spark, t, _df(spark, 0, 6))
    # splice a legacy reader-2 protocol (mode stays none, so the
    # mutation gate passes)
    with open(os.path.join(t, "_delta_log", f"{1:020d}.json"), "w") as f:
        f.write(json.dumps({"protocol": {
            "minReaderVersion": 2, "minWriterVersion": 5,
        }}) + "\n")
    delete_delta(spark, t, "k = 0")
    _a, _r, _m, _t, proto = _replay_full(t, delta_latest_version(t))
    assert "columnMapping" in proto["readerFeatures"]
    assert "columnMapping" in proto["writerFeatures"]


def test_dv_offset_zero_rejected(tmp_path):
    """An on-disk descriptor with an EXPLICIT offset of 0 is
    corruption (byte 0 is the format-version byte) and must be
    rejected, not silently coerced to 1 (ADVICE r16)."""
    from jobminer_spark.sources.delta import _dv_indices

    with pytest.raises(ValueError, match="offset=0"):
        _dv_indices(
            str(tmp_path),
            {
                "storageType": "p",
                "pathOrInlineDv": "x.bin",
                "offset": 0,
                "sizeInBytes": 8,
                "cardinality": 1,
            },
        )


def test_cdc_files_partitioned_layout(spark, tmp_path):
    """CDC files follow the data-file layout rule (ADVICE r16):
    partition columns are dropped from the parquet and carried in the
    cdc action's real partitionValues, so a conforming foreign CDF
    reader reconstructs them instead of seeing NULLs."""
    import pyarrow.parquet as pq

    from jobminer_spark.sources.delta import (
        _read_commit,
        delete_delta,
        delta_change_feed,
    )

    t = str(tmp_path / "cdcpart")
    write_delta(
        spark, t, _df(spark, 0, 12),
        partition_by=["tag"],
        configuration={"delta.enableChangeDataFeed": "true"},
    )
    write_delta(
        spark, t, _df(spark, 12, 20, tag="b"), partition_by=["tag"]
    )
    v, n = delete_delta(spark, t, "k % 2 = 0")
    assert n == 10
    cdcs = [a["cdc"] for a in _read_commit(t, v) if "cdc" in a]
    assert cdcs and all(c["partitionValues"].get("tag") for c in cdcs)
    assert {c["partitionValues"]["tag"] for c in cdcs} == {"a", "b"}
    for c in cdcs:
        cols = pq.read_schema(os.path.join(t, *c["path"].split("/")))
        assert "tag" not in cols.names  # dropped like data files
        assert "_change_type" in cols.names
    feed = delta_change_feed(spark, t, v - 1, v).collect()
    assert sorted((r.k, r.tag) for r in feed) == [
        (k, "a" if k < 12 else "b") for k in range(0, 20, 2)
    ]


def _v2_checkpointify(spark, t, *, json_inline=False, drop_sidecar=False,
                      bad_version=False):
    """Convert a table's latest state into a FOREIGN v2 checkpoint:
    a UUID-named JSON checkpoint file carrying protocol/metaData/
    checkpointMetadata (+ sidecar actions referencing parquet sidecars
    under _delta_log/_sidecars/ unless json_inline), then delete every
    commit JSON — the snapshot must resolve from the v2 checkpoint
    alone."""
    import uuid as _uuid

    import pyarrow.parquet as papq

    from jobminer_spark.sources.delta import (
        _write_checkpoint,
        delta_latest_version,
    )

    v = delta_latest_version(t)
    _write_checkpoint(t, v)
    log = os.path.join(t, "_delta_log")
    classic = os.path.join(log, f"{v:020d}.checkpoint.parquet")
    tbl = papq.read_table(classic)
    rows = tbl.to_pylist()

    def _clean(d):
        if isinstance(d, dict):
            return {
                k: _clean(x)
                for k, x in d.items()
                if x is not None and _clean(x) is not None
            }
        if isinstance(d, list):
            return [_clean(x) for x in d]
        return d

    proto = next(r["protocol"] for r in rows if r.get("protocol"))
    md = next(r["metaData"] for r in rows if r.get("metaData"))
    md = dict(md)
    for key in ("configuration",):
        if isinstance(md.get(key), list):
            md[key] = dict(md[key])
    if isinstance(md.get("format"), dict) and isinstance(
        md["format"].get("options"), list
    ):
        md["format"] = {**md["format"], "options": dict(md["format"]["options"])}
    adds = [r["add"] for r in rows if r.get("add")]
    removes = [r["remove"] for r in rows if r.get("remove")]
    lines = [
        {"checkpointMetadata": {"version": v + (1 if bad_version else 0)}},
        {"protocol": _clean(proto)},
        {"metaData": _clean(md)},
    ]
    if json_inline:
        for a in adds:
            aa = dict(a)
            if isinstance(aa.get("partitionValues"), list):
                aa["partitionValues"] = dict(aa["partitionValues"])
            lines.append({"add": _clean(aa) | (
                {"partitionValues": dict(a["partitionValues"])}
                if isinstance(a.get("partitionValues"), list)
                else {"partitionValues": a.get("partitionValues") or {}}
            )})
        for r in removes:
            lines.append({"remove": _clean(dict(r))})
    else:
        sdir = os.path.join(log, "_sidecars")
        os.makedirs(sdir, exist_ok=True)
        ar = tbl.select(["add", "remove"])
        half = max(1, len(rows) // 2)
        for i, sl in enumerate((ar.slice(0, half), ar.slice(half))):
            name = f"sc-{i}.parquet"
            papq.write_table(sl, os.path.join(sdir, name))
            lines.append({"sidecar": {
                "path": name,
                "sizeInBytes": os.path.getsize(os.path.join(sdir, name)),
            }})
        if drop_sidecar:
            os.unlink(os.path.join(sdir, "sc-1.parquet"))
    u = _uuid.uuid4().hex
    with open(os.path.join(log, f"{v:020d}.checkpoint.{u}.json"), "w") as f:
        for line in lines:
            f.write(json.dumps(line) + "\n")
    os.unlink(classic)
    for vv in range(v + 1):
        p = os.path.join(log, f"{vv:020d}.json")
        if os.path.exists(p):
            os.unlink(p)
    with open(os.path.join(log, "_last_checkpoint"), "w") as f:
        json.dump({"version": v}, f)
    return v


def test_v2_checkpoint_with_sidecars_reads(spark, tmp_path):
    """v2Checkpoint (UUID-named + sidecars): the snapshot resolves
    from the checkpoint file's metadata actions plus the parquet
    sidecars carrying the adds — with every commit JSON deleted."""
    t = str(tmp_path / "v2side")
    write_delta(spark, t, _df(spark, 0, 20))
    write_delta(spark, t, _df(spark, 20, 35))
    _v2_checkpointify(spark, t)
    got = read_delta(spark, t)
    assert sorted(r.k for r in got.collect()) == list(range(35))


def test_v2_checkpoint_json_inline_reads(spark, tmp_path):
    """A JSON v2 checkpoint with adds INLINE (no sidecars) resolves
    the same snapshot, including partitioned tables (partitionValues
    restored from the checkpoint rows)."""
    t = str(tmp_path / "v2json")
    write_delta(spark, t, _df(spark, 0, 10), partition_by=["tag"])
    write_delta(
        spark, t, _df(spark, 10, 16, tag="b"), partition_by=["tag"]
    )
    _v2_checkpointify(spark, t, json_inline=True)
    got = read_delta(spark, t)
    assert sorted((r.k, r.tag) for r in got.collect()) == [
        (k, "a" if k < 10 else "b") for k in range(16)
    ]


def test_v2_checkpoint_missing_sidecar_fails_loudly(spark, tmp_path):
    t = str(tmp_path / "v2miss")
    write_delta(spark, t, _df(spark, 0, 8))
    _v2_checkpointify(spark, t, drop_sidecar=True)
    with pytest.raises(ValueError, match="sidecar"):
        read_delta(spark, t)


def test_v2_checkpoint_version_mismatch_fails_loudly(spark, tmp_path):
    t = str(tmp_path / "v2bad")
    write_delta(spark, t, _df(spark, 0, 8))
    _v2_checkpointify(spark, t, bad_version=True)
    with pytest.raises(ValueError, match="torn checkpoint"):
        read_delta(spark, t)


def test_write_checkpoint_v2_roundtrip(spark, tmp_path):
    """Our own v2 checkpoint writer: UUID-named main parquet +
    parquet sidecars; the snapshot resolves from them alone (every
    commit JSON deleted), tombstones/DV descriptors ride through, and
    a table without the feature refuses the layout."""
    from jobminer_spark.sources.delta import (
        delete_delta,
        delta_latest_version,
        write_checkpoint_v2,
    )

    t = str(tmp_path / "wv2")
    write_delta(spark, t, _df(spark, 0, 30))
    write_delta(spark, t, _df(spark, 30, 45))
    # no v2Checkpoint feature yet: loud refusal
    with pytest.raises(ValueError, match="v2Checkpoint"):
        write_checkpoint_v2(t, delta_latest_version(t))
    # delete_delta upgrades to reader 3; splice the feature in
    delete_delta(spark, t, "k % 5 = 0")
    v = delta_latest_version(t)
    with open(_commit_file(t, v + 1), "w") as f:
        f.write(json.dumps({"protocol": {
            "minReaderVersion": 3, "minWriterVersion": 7,
            "readerFeatures": ["deletionVectors", "v2Checkpoint"],
            "writerFeatures": ["deletionVectors", "v2Checkpoint"],
        }}) + "\n")
    v = delta_latest_version(t)
    path = write_checkpoint_v2(t, v, actions_per_sidecar=2)
    assert os.path.basename(path).split(".")[1] == "checkpoint"
    assert os.path.isdir(os.path.join(t, "_delta_log", "_sidecars"))
    for vv in range(v + 1):
        os.unlink(_commit_file(t, vv))
    got = read_delta(spark, t)
    assert sorted(r.k for r in got.collect()) == [
        k for k in range(45) if k % 5 != 0
    ]


def test_column_mapping_id_mode_append(spark, tmp_path):
    """id-mode appends stage files with PARQUET FIELD IDS so they
    resolve like their (misleadingly-named) siblings."""
    import pyarrow.parquet as pq

    t = str(tmp_path / "cmap_id_append")
    os.makedirs(t, exist_ok=True)
    _write_field_id_parquet(
        os.path.join(t, "d1.parquet"),
        [("col-b", 1, [1, 2, 3]), ("col-a", 2, [10, 20, 30])],
    )
    _craft_log(t, {0: [
        {"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}},
        {"metaData": {**_META,
                      "schemaString": json.dumps(_id_mode_schema()),
                      "configuration": {
                          "delta.columnMapping.mode": "id",
                          "delta.columnMapping.maxColumnId": "2"}}},
        {"add": {"path": "d1.parquet", "partitionValues": {}, "size": 1,
                 "modificationTime": 0, "dataChange": True}},
    ]})
    write_delta(
        spark, t,
        spark.range(4, 6).select(
            F.col("id").alias("k"), (F.col("id") * 10).alias("v")
        ),
    )
    got = sorted((r.k, r.v) for r in read_delta(spark, t).collect())
    assert got == [(1, 10), (2, 20), (3, 30), (4, 40), (5, 50)]
    # the staged file carries ids on its (physical-named) columns
    new = [
        f.replace("file:", "")
        for f in read_delta(spark, t).inputFiles()
        if "data-" in f
    ]
    assert new
    sch = pq.read_schema(new[0])
    ids = {
        n: sch.field(n).metadata.get(b"PARQUET:field_id")
        for n in sch.names
    }
    assert ids == {"col-a": b"1", "col-b": b"2"}


def test_column_mapping_update_with_change_feed(spark, tmp_path):
    """update_delta on a CDF-enabled mapped table: CDC files stage
    under physical names with physically-keyed partitionValues, and
    the feed reader surfaces LOGICAL columns."""
    from jobminer_spark.sources.delta import (
        delta_change_feed,
        delta_latest_version,
        update_delta,
    )

    t = str(tmp_path / "cmap_cdf")
    _craft_mapped_table(spark, t)
    # flip CDF on via a metaData re-publish (the foreign admin shape)
    meta_line = {
        "metaData": {
            **_META,
            "schemaString": json.dumps({"type": "struct", "fields": [
                {"name": "k", "type": "long", "nullable": True,
                 "metadata": {"delta.columnMapping.id": 1,
                              "delta.columnMapping.physicalName":
                                  "col-9f2"}},
            ]}),
            "configuration": {
                "delta.columnMapping.mode": "name",
                "delta.columnMapping.maxColumnId": "1",
                "delta.enableChangeDataFeed": "true",
            },
        }
    }
    with open(_commit_file(t, 1), "w") as f:
        f.write(json.dumps(meta_line) + "\n")
    v, n = update_delta(spark, t, "k = 2", {"k": F.lit(99)})
    assert n == 1
    assert sorted(r.k for r in read_delta(spark, t).collect()) == [
        1, 3, 99,
    ]
    feed = delta_change_feed(spark, t, v - 1, v).collect()
    changes = sorted((r._change_type, r.k) for r in feed)
    assert changes == [
        ("update_postimage", 99), ("update_preimage", 2),
    ]
    assert delta_latest_version(t) == v


def test_interval_checkpoint_is_v2_when_feature_on(spark, tmp_path):
    """Once a table's protocol lists v2Checkpoint, interval
    checkpoints must use the v2 layout — a classic checkpoint would
    surprise conforming engines that enabled the feature."""
    import glob

    t = str(tmp_path / "autov2")
    write_delta(spark, t, _df(spark, 0, 6), checkpoint_interval=0)
    with open(_commit_file(t, 1), "w") as f:
        f.write(json.dumps({"protocol": {
            "minReaderVersion": 3, "minWriterVersion": 7,
            "readerFeatures": ["v2Checkpoint"],
            "writerFeatures": ["v2Checkpoint", "appendOnly",
                               "invariants"],
        }}) + "\n")
    write_delta(spark, t, _df(spark, 6, 9), checkpoint_interval=2)
    log = os.path.join(t, "_delta_log")
    assert not glob.glob(os.path.join(log, "*.checkpoint.parquet"))
    v2 = glob.glob(os.path.join(log, "*.checkpoint.*.parquet"))
    assert len(v2) == 1 and os.path.isdir(os.path.join(log, "_sidecars"))
    for vv in range(3):
        os.unlink(_commit_file(t, vv))
    assert read_delta(spark, t).count() == 9


def test_check_constraints_enforced_across_write_paths(spark, tmp_path):
    """r17 CHECK-constraint enforcement everywhere rows enter the
    table: creation-time configuration, append, overwrite (staged
    files unstaged on violation), update_delta replacements, and the
    legacy per-column invariant metadata; NULL passes per SQL CHECK
    semantics."""
    import glob

    from jobminer_spark.sources.delta import update_delta

    t = str(tmp_path / "cenf")
    with pytest.raises(ValueError, match="positive"):
        write_delta(
            spark, t, _df(spark, 0, 3),
            configuration={"delta.constraints.positive": "k > 0"},
        )
    write_delta(
        spark, t, _df(spark, 1, 4),
        configuration={"delta.constraints.positive": "k > 0"},
    )
    with pytest.raises(ValueError, match="positive"):
        write_delta(spark, t, _df(spark, 0, 1))
    # overwrite violation unstages — no orphan parquet outside the log
    n_files_before = len(glob.glob(os.path.join(t, "data-*", "*")))
    with pytest.raises(ValueError, match="positive"):
        write_delta(spark, t, _df(spark, 0, 2), mode="overwrite")
    assert len(glob.glob(os.path.join(t, "data-*", "*"))) == (
        n_files_before
    )
    # update replacement must satisfy the constraint too
    with pytest.raises(ValueError, match="positive"):
        update_delta(spark, t, "k = 2", {"k": F.lit(-5)})
    v, n = update_delta(spark, t, "k = 2", {"k": F.lit(20)})
    assert n == 1
    assert sorted(r.k for r in read_delta(spark, t).collect()) == [
        1, 3, 20,
    ]
    # NULL passes (SQL CHECK) — own table so nullability matches
    t3 = str(tmp_path / "cnull")
    write_delta(
        spark, t3,
        spark.createDataFrame(
            [(1, 5, "a")], "k long, v long, tag string"
        ),
        configuration={"delta.constraints.positive": "k > 0"},
    )
    write_delta(
        spark, t3,
        spark.createDataFrame(
            [(None, 6, "b")], "k long, v long, tag string"
        ),
    )
    assert read_delta(spark, t3).count() == 2

    t2 = str(tmp_path / "inv")
    write_delta(spark, t2, _df(spark, 1, 3))
    inv = json.dumps(
        {"expression": {"expression": "v < 100"}}
    )
    with open(_commit_file(t2, 1), "w") as f:
        f.write(json.dumps({"metaData": {
            "id": "x", "format": {"provider": "parquet", "options": {}},
            "schemaString": json.dumps({"type": "struct", "fields": [
                {"name": "k", "type": "long", "nullable": False,
                 "metadata": {}},
                {"name": "v", "type": "long", "nullable": False,
                 "metadata": {"delta.invariants": inv}},
                {"name": "tag", "type": "string", "nullable": False,
                 "metadata": {}},
            ]}),
            "partitionColumns": [], "createdTime": 0,
            "configuration": {},
        }}) + "\n")
    write_delta(spark, t2, _df(spark, 3, 5))  # v = 30,40 < 100: fine
    with pytest.raises(ValueError, match="invariant:v"):
        write_delta(spark, t2, _df(spark, 20, 21))  # v = 200


def test_generated_columns_populated_and_validated(spark, tmp_path):
    """r17: a column carrying delta.generationExpression is COMPUTED
    when the append omits it and VALIDATED null-safely when provided
    — a batch contradicting the expression is rejected by name, and
    update_delta replacements revalidate too."""
    from jobminer_spark.sources.delta import update_delta

    t = str(tmp_path / "gencol")
    write_delta(spark, t, _df(spark, 1, 4))
    gexpr = "k * 2"
    with open(_commit_file(t, 1), "w") as f:
        f.write(json.dumps({"metaData": {
            "id": "x", "format": {"provider": "parquet", "options": {}},
            "schemaString": json.dumps({"type": "struct", "fields": [
                {"name": "k", "type": "long", "nullable": False,
                 "metadata": {}},
                {"name": "v", "type": "long", "nullable": False,
                 "metadata": {"delta.generationExpression": gexpr}},
                {"name": "tag", "type": "string", "nullable": False,
                 "metadata": {}},
            ]}),
            "partitionColumns": [], "createdTime": 0,
            "configuration": {},
        }}) + "\n")
    # omitted: computed (k*2 instead of _df's k*10)
    write_delta(
        spark, t,
        spark.range(10, 12).select(
            F.col("id").alias("k"), F.lit("g").alias("tag")
        ),
    )
    got = {r.k: r.v for r in read_delta(spark, t).collect()}
    assert got[10] == 20 and got[11] == 22
    # provided and consistent: accepted
    write_delta(
        spark, t,
        spark.range(20, 21).select(
            F.col("id").alias("k"),
            (F.col("id") * 2).alias("v"),
            F.lit("p").alias("tag"),
        ),
    )
    # provided and contradicting: rejected by name
    with pytest.raises(ValueError, match="generated:v"):
        write_delta(
            spark, t,
            spark.range(30, 31).select(
                F.col("id").alias("k"),
                F.lit(7).cast("long").alias("v"),
                F.lit("bad").alias("tag"),
            ),
        )
    # update replacements revalidate: changing k without v breaks k*2
    with pytest.raises(ValueError, match="generated:v"):
        update_delta(spark, t, "k = 20", {"k": F.lit(21)})
    v, n = update_delta(
        spark, t, "k = 20", {"k": F.lit(21), "v": F.lit(42)}
    )
    assert n == 1
    got = {r.k: r.v for r in read_delta(spark, t).collect()}
    assert got[21] == 42


def _identity_meta(wm=None, allow=False, start=100, step=10):
    md = {
        "delta.identity.start": start,
        "delta.identity.step": step,
        "delta.identity.allowExplicitInsert":
            "true" if allow else "false",
    }
    if wm is not None:
        md["delta.identity.highWaterMark"] = wm
    return {
        "id": "x", "format": {"provider": "parquet", "options": {}},
        "schemaString": json.dumps({"type": "struct", "fields": [
            {"name": "rid", "type": "long", "nullable": True,
             "metadata": md},
            {"name": "k", "type": "long", "nullable": False,
             "metadata": {}},
            {"name": "v", "type": "long", "nullable": False,
             "metadata": {}},
            {"name": "tag", "type": "string", "nullable": False,
             "metadata": {}},
        ]}),
        "partitionColumns": [], "createdTime": 0, "configuration": {},
    }


def test_identity_columns_assigned_with_watermark(spark, tmp_path):
    """r17: an omitted identity column is assigned start/step values
    distributed (no global window, no data collect), the high
    watermark republishes in the SAME commit, the next append
    continues past it, GENERATED ALWAYS rejects explicit values (in
    appends and UPDATE SET), and allowExplicitInsert advances the
    watermark past explicit maxima."""
    from jobminer_spark.sources.delta import (
        _replay,
        delta_latest_version,
        update_delta,
    )

    t = str(tmp_path / "ident")
    write_delta(spark, t, _df(spark, 0, 1).select(
        F.lit(1).cast("long").alias("rid"), "k", "v", "tag"
    ))
    with open(_commit_file(t, 1), "w") as f:
        f.write(json.dumps({"metaData": _identity_meta()}) + "\n")
    # omitted: values 100, 110, ... assigned; watermark advances
    write_delta(spark, t, _df(spark, 1, 5))
    rids = sorted(
        r.rid for r in read_delta(spark, t).collect() if r.k >= 1
    )
    assert rids == [100, 110, 120, 130]
    _a, meta, _t = _replay(t, delta_latest_version(t))
    md = next(
        f["metadata"]
        for f in json.loads(meta["schemaString"])["fields"]
        if f["name"] == "rid"
    )
    assert int(md["delta.identity.highWaterMark"]) == 130
    # the next append continues past the committed watermark
    write_delta(spark, t, _df(spark, 5, 7))
    rids = sorted(
        r.rid for r in read_delta(spark, t).collect() if r.k >= 1
    )
    assert rids == [100, 110, 120, 130, 140, 150]
    # GENERATED ALWAYS: explicit values rejected in append and UPDATE
    with pytest.raises(ValueError, match="GENERATED ALWAYS"):
        write_delta(spark, t, _df(spark, 7, 8).select(
            F.lit(999).cast("long").alias("rid"), "k", "v", "tag"
        ))
    with pytest.raises(ValueError, match="GENERATED ALWAYS"):
        update_delta(spark, t, "k = 1", {"rid": F.lit(7)})

    # allowExplicitInsert: accepted, watermark jumps past the max
    t2 = str(tmp_path / "ident2")
    write_delta(spark, t2, _df(spark, 0, 1).select(
        F.lit(1).cast("long").alias("rid"), "k", "v", "tag"
    ))
    with open(_commit_file(t2, 1), "w") as f:
        f.write(json.dumps(
            {"metaData": _identity_meta(allow=True)}
        ) + "\n")
    write_delta(spark, t2, _df(spark, 1, 2).select(
        F.lit(500).cast("long").alias("rid"), "k", "v", "tag"
    ))
    write_delta(spark, t2, _df(spark, 2, 3))  # omitted: from 510
    got = {r.k: r.rid for r in read_delta(spark, t2).collect()}
    assert got[1] == 500 and got[2] == 510


def test_identity_overwrite_keeps_watermark_monotone(spark, tmp_path):
    """r18 (VERDICT r17 item 4): OVERWRITE of an identity table is
    permitted with delta-spark's semantics — the high watermark stays
    MONOTONE across overwrites (an omitted identity column continues
    enumerating past the committed watermark, never resetting to
    start), the identity field metadata survives the commit, and a
    schema-changing overwrite is refused loudly."""
    from jobminer_spark.sources.delta import (
        _replay,
        delta_latest_version,
    )

    def _wm(t):
        _a, meta, _t = _replay(t, delta_latest_version(t))
        md = next(
            f["metadata"]
            for f in json.loads(meta["schemaString"])["fields"]
            if f["name"] == "rid"
        )
        return int(md["delta.identity.highWaterMark"]), meta

    t = str(tmp_path / "ident_ow")
    write_delta(spark, t, _df(spark, 0, 1).select(
        F.lit(1).cast("long").alias("rid"), "k", "v", "tag"
    ))
    with open(_commit_file(t, 1), "w") as f:
        f.write(json.dumps({"metaData": _identity_meta()}) + "\n")
    write_delta(spark, t, _df(spark, 1, 5))  # rids 100..130
    assert _wm(t)[0] == 130
    # overwrite with an omitted identity column: enumeration
    # CONTINUES past the committed watermark — never back to start
    write_delta(spark, t, _df(spark, 10, 13), mode="overwrite")
    rows = read_delta(spark, t).collect()
    assert sorted(r.rid for r in rows) == [140, 150, 160]
    wm, meta = _wm(t)
    assert wm == 160
    # identity metadata survived the overwrite's metaData republish
    assert any(
        _k.startswith("delta.identity.")
        for f in json.loads(meta["schemaString"])["fields"]
        for _k in (f.get("metadata") or {})
    )
    # a second overwrite keeps climbing
    write_delta(spark, t, _df(spark, 20, 22), mode="overwrite")
    assert sorted(
        r.rid for r in read_delta(spark, t).collect()
    ) == [170, 180]
    assert _wm(t)[0] == 180
    # GENERATED ALWAYS still rejects explicit values on overwrite
    with pytest.raises(ValueError, match="GENERATED ALWAYS"):
        write_delta(spark, t, _df(spark, 30, 31).select(
            F.lit(999).cast("long").alias("rid"), "k", "v", "tag"
        ), mode="overwrite")
    # schema-changing overwrite would drop the bookkeeping: loud
    with pytest.raises(ValueError, match="identity"):
        write_delta(
            spark, t,
            _df(spark, 30, 31).select("k", "v"),
            mode="overwrite",
        )


def test_identity_assignment_pins_partitioning(spark, tmp_path):
    """ADVICE r17: identity assignment runs a count pass and a stamp
    pass over the same plan; with a non-deterministically-recomputable
    upstream (round-robin repartition over a shuffle) the two passes
    could disagree on per-partition counts, minting duplicates or
    values past the published watermark. The __jm_pid frame is
    persist()ed so both passes observe ONE materialization — the
    assigned ids must be exactly the contiguous start/step sequence,
    unique, with max == the committed high watermark."""
    from jobminer_spark.sources.delta import (
        _replay,
        delta_latest_version,
    )

    t = str(tmp_path / "ident_det")
    # other suites may legitimately hold caches in the shared
    # session — assert NET-zero growth, not an empty registry
    cached_before = (
        spark.sparkContext._jsc.sc().getPersistentRDDs().size()
    )
    write_delta(spark, t, _df(spark, 0, 1).select(
        F.lit(1).cast("long").alias("rid"), "k", "v", "tag"
    ))
    with open(_commit_file(t, 1), "w") as f:
        f.write(json.dumps({"metaData": _identity_meta()}) + "\n")
    # adversarial upstream: round-robin repartition — the classic
    # not-deterministically-recomputable shape ADVICE r17 names
    batch = _df(spark, 1, 65).repartition(7).select("k", "v", "tag")
    write_delta(spark, t, batch)
    rows = [r for r in read_delta(spark, t).collect() if r.k >= 1]
    rids = sorted(r.rid for r in rows)
    assert rids == [100 + 10 * i for i in range(64)]  # unique, gapless
    _a, meta, _t = _replay(t, delta_latest_version(t))
    md = next(
        f["metadata"]
        for f in json.loads(meta["schemaString"])["fields"]
        if f["name"] == "rid"
    )
    assert int(md["delta.identity.highWaterMark"]) == max(rids)
    # the identity pass left nothing NEW cached once the commit
    # returned
    assert (
        spark.sparkContext._jsc.sc().getPersistentRDDs().size()
        == cached_before
    )


def test_type_widening_reads_narrow_files(spark, tmp_path):
    """typeWidening (r17): files written before a type change carry
    the NARROW physical types; the read under the declared wide
    schema must return exact widened values — int32 under long,
    float32 under double, decimal(5,2) under decimal(10,4)."""
    import decimal as _dec

    import pyarrow as pa
    import pyarrow.parquet as papq

    t = str(tmp_path / "widen")
    os.makedirs(t, exist_ok=True)
    papq.write_table(
        pa.table({
            "k": pa.array([1, 2], pa.int32()),
            "x": pa.array([1.5, 2.5], pa.float32()),
            "m": pa.array(
                [_dec.Decimal("12.34"), _dec.Decimal("56.78")],
                pa.decimal128(5, 2),
            ),
        }),
        os.path.join(t, "d1.parquet"),
    )
    schema = {"type": "struct", "fields": [
        {"name": "k", "type": "long", "nullable": True,
         "metadata": {}},
        {"name": "x", "type": "double", "nullable": True,
         "metadata": {}},
        {"name": "m", "type": "decimal(10,4)", "nullable": True,
         "metadata": {}},
    ]}
    _craft_log(t, {0: [
        {"protocol": {"minReaderVersion": 3, "minWriterVersion": 7,
                      "readerFeatures": ["typeWidening"],
                      "writerFeatures": ["typeWidening"]}},
        {"metaData": {**_META, "schemaString": json.dumps(schema)}},
        {"add": {"path": "d1.parquet", "partitionValues": {}, "size": 1,
                 "modificationTime": 0, "dataChange": True}},
    ]})
    got = sorted(
        (r.k, r.x, str(r.m)) for r in read_delta(spark, t).collect()
    )
    assert got == [(1, 1.5, "12.3400"), (2, 2.5, "56.7800")]


def test_column_mapping_overwrite_data_only(spark, tmp_path):
    """r18: data-only OVERWRITE of a column-mapped table — the batch
    matches the declared logical shape, the data is replaced, the
    mapped schemaString (physical names, ids) survives UNTOUCHED in
    the log, and the new files carry physical column names. A
    layout-changing overwrite refuses."""
    import pyarrow.parquet as pq

    from jobminer_spark.sources.delta import (
        _replay,
        delta_latest_version,
    )

    t = str(tmp_path / "cmap_ow")
    _craft_mapped_table(spark, t)
    before = _replay(t, delta_latest_version(t))[1]["schemaString"]
    write_delta(
        spark, t,
        spark.range(9, 12).select(F.col("id").alias("k")),
        mode="overwrite",
    )
    df = read_delta(spark, t)
    assert sorted(r.k for r in df.collect()) == [9, 10, 11]
    # the mapped schema (with physical names/ids) is preserved
    after = _replay(t, delta_latest_version(t))[1]["schemaString"]
    assert json.loads(after) == json.loads(before)
    # the replacement files carry the PHYSICAL column name
    for f in df.inputFiles():
        assert pq.read_schema(f.replace("file:", "")).names == [
            "col-9f2"
        ]
    # and the table remains appendable/readable afterwards
    write_delta(
        spark, t, spark.range(20, 22).select(F.col("id").alias("k"))
    )
    assert sorted(r.k for r in read_delta(spark, t).collect()) == [
        9, 10, 11, 20, 21,
    ]
    # layout change refuses
    with pytest.raises(ValueError, match="partitioning"):
        write_delta(
            spark, t,
            spark.range(0, 2).select(F.col("id").alias("k")),
            mode="overwrite",
            partition_by=["k"],
        )


def test_delta_variant_column_roundtrip(spark, tmp_path):
    """r18: the variantType feature graduates from the rejection
    matrix — a table CREATED with a Spark VariantType column publishes
    reader 3/writer 7 with variantType listed, appends stage the
    binary encoding natively, reads resolve typed paths, and a
    FOREIGN-crafted variantType table (feature splice) reads instead
    of refusing."""
    from jobminer_spark.sources.delta import (
        _replay_full,
        delta_latest_version,
    )

    t = str(tmp_path / "variant")
    doc = F.parse_json(F.concat(
        F.lit('{"a": '), F.col("id").cast("string"),
        F.lit(', "m": {"b": '), (F.col("id") * 2).cast("string"),
        F.lit("}}"),
    ))
    write_delta(
        spark, t,
        spark.range(0, 10).select(F.col("id").alias("k"), doc.alias("v")),
    )
    _a, _r, meta, _t2, proto = _replay_full(t, delta_latest_version(t))
    assert proto["minReaderVersion"] == 3
    assert proto["minWriterVersion"] == 7
    assert "variantType" in proto["readerFeatures"]
    assert "variantType" in proto["writerFeatures"]
    assert any(
        f["type"] == "variant"
        for f in json.loads(meta["schemaString"])["fields"]
    )
    # append composes; typed extraction reads the binary encoding
    write_delta(
        spark, t,
        spark.range(10, 15).select(F.col("id").alias("k"), doc.alias("v")),
    )
    got = read_delta(spark, t).select(
        "k",
        F.try_variant_get(F.col("v"), "$.a", "long").alias("a"),
        F.try_variant_get(F.col("v"), "$.m.b", "long").alias("b"),
    )
    assert sorted((r.k, r.a, r.b) for r in got.collect()) == [
        (i, i, 2 * i) for i in range(15)
    ]
    # overwrite keeps working on the feature-bearing table
    write_delta(
        spark, t,
        spark.range(0, 3).select(F.col("id").alias("k"), doc.alias("v")),
        mode="overwrite",
    )
    assert read_delta(spark, t).count() == 3


def test_delta_variant_protocol_upgrade_on_overwrite(spark, tmp_path):
    """ADVICE r18: overwriting an existing reader-1 table with a batch
    containing a variant column must upgrade the protocol to reader 3/
    writer 7 with variantType IN THE SAME COMMIT (plus every feature
    the prior legacy versions implied) — republishing a variant
    schemaString under reader 1 leaves foreign readers ungated."""
    from jobminer_spark.sources.delta import (
        _replay_full,
        delta_latest_version,
    )

    t = str(tmp_path / "vup")
    write_delta(
        spark, t,
        spark.range(0, 5).select(
            F.col("id").alias("k"), F.lit("x").alias("v")
        ),
    )
    _a, _r, _m, _t2, proto = _replay_full(t, delta_latest_version(t))
    assert proto["minReaderVersion"] == 1
    doc = F.parse_json(
        F.concat(F.lit('{"a": '), F.col("id").cast("string"), F.lit("}"))
    )
    write_delta(
        spark, t,
        spark.range(0, 4).select(F.col("id").alias("k"), doc.alias("v")),
        mode="overwrite",
    )
    _a, _r, meta, _t2, proto = _replay_full(t, delta_latest_version(t))
    assert proto["minReaderVersion"] == 3
    assert proto["minWriterVersion"] == 7
    assert "variantType" in proto["readerFeatures"]
    # legacy writer 2's implied features stay explicit post-upgrade
    assert {"appendOnly", "invariants", "variantType"} <= set(
        proto["writerFeatures"]
    )
    assert any(
        f["type"] == "variant"
        for f in json.loads(meta["schemaString"])["fields"]
    )
    got = read_delta(spark, t).select(
        "k", F.try_variant_get(F.col("v"), "$.a", "long").alias("a")
    )
    assert sorted((r.k, r.a) for r in got.collect()) == [
        (i, i) for i in range(4)
    ]
    # idempotent: a second variant overwrite emits NO new protocol
    write_delta(
        spark, t,
        spark.range(0, 2).select(F.col("id").alias("k"), doc.alias("v")),
        mode="overwrite",
    )
    v = delta_latest_version(t)
    with open(os.path.join(t, "_delta_log", f"{v:020d}.json")) as fh:
        acts = [json.loads(line) for line in fh if line.strip()]
    assert not any("protocol" in a for a in acts)


def test_delta_nested_variant_creation_gates_protocol(spark, tmp_path):
    """ADVICE r18: a creation whose variant sits NESTED (array element
    / struct field) must gate the protocol exactly like a top-level
    one — the type-tree walk, not a top-level scan."""
    from jobminer_spark.sources.delta import (
        _replay_full,
        delta_latest_version,
    )

    doc = F.parse_json(
        F.concat(F.lit('{"a": '), F.col("id").cast("string"), F.lit("}"))
    )
    for name, col in [
        ("arr", F.array(doc)),
        ("strct", F.struct(doc.alias("inner"))),
    ]:
        t = str(tmp_path / f"nested_{name}")
        write_delta(
            spark, t,
            spark.range(0, 3).select(
                F.col("id").alias("k"), col.alias("v")
            ),
        )
        _a, _r, _m, _t2, proto = _replay_full(t, delta_latest_version(t))
        assert proto["minReaderVersion"] == 3, name
        assert "variantType" in proto["readerFeatures"], name
        assert read_delta(spark, t).count() == 3


def test_optimize_zorder_clusters_and_guards(spark, tmp_path):
    """r18 OPTIMIZE Z-ORDER: interleaved files re-cluster so a 2-D
    stats prune plans a small subset, the logical row set is
    unchanged (dataChange=false semantics), time travel still sees
    the pre-OPTIMIZE layout, and non-numeric/unknown zorder columns
    refuse loudly."""
    from jobminer_spark.sources.delta import (
        delta_latest_version,
        optimize_delta,
    )

    t = str(tmp_path / "zopt")
    df = spark.range(0, 4096).select(
        (F.col("id") % 16).alias("a"),
        ((F.col("id") / 16).cast("long") % 16).alias("b"),
        F.col("id").alias("payload"),
        F.concat(F.lit("s"), F.col("id").cast("string")).alias("s"),
    )
    for i in range(4):
        write_delta(
            spark, t,
            df.filter(F.col("id") % 4 == i).repartition(1),
        )
    pre_version = delta_latest_version(t)
    flt = {"a": (0, 3), "b": (0, 3)}
    assert len(read_delta(spark, t, stats_filters=flt).inputFiles()) == 4
    v, nb, na = optimize_delta(spark, t, target_files=16,
                               zorder_by=["a", "b"])
    assert (nb, na) == (4, 16)
    post = read_delta(spark, t)
    assert post.count() == 4096
    assert post.agg(F.sum("payload")).collect()[0][0] == sum(range(4096))
    pruned = read_delta(spark, t, stats_filters=flt)
    assert len(pruned.inputFiles()) <= 4  # 1/16 of space, 16 files
    assert sorted(
        r.payload
        for r in pruned.where(
            F.col("a").between(0, 3) & F.col("b").between(0, 3)
        ).collect()
    ) == [i for i in range(4096) if i % 16 < 4 and (i // 16) % 16 < 4]
    # time travel to the pre-OPTIMIZE version sees the old layout
    assert read_delta(spark, t, version=pre_version).count() == 4096
    with pytest.raises(ValueError, match="not a data column"):
        optimize_delta(spark, t, zorder_by=["nope"])


def test_optimize_zorder_mixed_types(spark, tmp_path):
    """r19 (VERDICT r18 item 2): Z-ORDER past numeric-only — a
    (date, string) zorder fixture prunes MULTIPLICATIVELY on both
    dimensions (each alone prunes ~1/4, together ~1/16), the string
    leg via equi-depth sampled boundaries and the date leg via the
    unix_date proxy; truly un-orderable types still refuse."""
    from jobminer_spark.sources.delta import optimize_delta

    t = str(tmp_path / "zmix")
    # 16 dates × 16 key prefixes, interleaved so pre-OPTIMIZE files
    # have wide min/max on both dims
    df = spark.range(0, 4096).select(
        F.date_add(
            F.to_date(F.lit("2024-01-01")), (F.col("id") % 16).cast("int")
        ).alias("d"),
        F.concat(
            F.format_string("k%02d", (F.col("id") / 16).cast("int") % 16),
            F.lit("-"),
            F.col("id").cast("string"),
        ).alias("s"),
        F.col("id").alias("payload"),
    )
    for i in range(4):
        write_delta(
            spark, t, df.filter(F.col("id") % 4 == i).repartition(1)
        )
    v, nb, na = optimize_delta(
        spark, t, target_files=16, zorder_by=["d", "s"]
    )
    assert (nb, na) == (4, 16)
    post = read_delta(spark, t)
    assert post.count() == 4096
    assert post.agg(F.sum("payload")).collect()[0][0] == sum(range(4096))
    full = len(post.inputFiles())
    d_flt = {"d": ("2024-01-01", "2024-01-04")}
    s_flt = {"s": ("k00", "k03z")}
    n_d = len(read_delta(spark, t, stats_filters=d_flt).inputFiles())
    n_s = len(read_delta(spark, t, stats_filters=s_flt).inputFiles())
    n_both = len(
        read_delta(spark, t, stats_filters={**d_flt, **s_flt}).inputFiles()
    )
    # each single-dim prune keeps a strict subset; the 2-D prune is
    # multiplicative (≤ 1/4 of either single-dim plan on this grid)
    assert n_d < full and n_s < full
    assert n_both <= max(1, min(n_d, n_s) // 2)
    # values correct under the pruned plan
    got = sorted(
        r.payload
        for r in read_delta(spark, t, stats_filters={**d_flt, **s_flt})
        .where(
            F.col("d").between("2024-01-01", "2024-01-04")
            & (F.substring("s", 1, 3) <= "k03")
        )
        .collect()
    )
    assert got == [
        i for i in range(4096) if i % 16 < 4 and (i // 16) % 16 < 4
    ]
    # un-orderable types still refuse loudly
    t2 = str(tmp_path / "zarr")
    write_delta(
        spark, t2,
        spark.range(8).select(
            F.array(F.col("id")).alias("arr"), F.col("id").alias("k")
        ),
    )
    with pytest.raises(ValueError, match="supports numeric"):
        optimize_delta(spark, t2, zorder_by=["arr"])


def test_optimize_zorder_partitioned_per_group(spark, tmp_path):
    """Z-ORDER on a PARTITIONED table clusters WITHIN each partition
    (partition columns stay the layout; z applies to data columns
    inside each directory) and partition pruning composes with the
    2-D stats prune."""
    from jobminer_spark.sources.delta import optimize_delta

    t = str(tmp_path / "zpart")
    df = spark.range(0, 2048).select(
        (F.col("id") % 2).alias("p"),
        (F.col("id") % 16).alias("a"),
        ((F.col("id") / 16).cast("long") % 16).alias("b"),
        F.col("id").alias("payload"),
    )
    for i in range(4):
        write_delta(
            spark, t,
            df.filter(F.col("id") % 4 == i).repartition(1),
            partition_by=["p"],
        )
    v, nb, na = optimize_delta(
        spark, t, target_files=4, zorder_by=["a", "b"]
    )
    assert na == 8  # 4 z-files per partition value
    post = read_delta(spark, t)
    assert post.count() == 2048
    assert post.agg(F.sum("payload")).collect()[0][0] == sum(range(2048))
    flt = {"a": (0, 3), "b": (0, 3)}
    pruned = read_delta(spark, t, stats_filters=flt)
    assert len(pruned.inputFiles()) < 8
    rows = pruned.where(
        F.col("a").between(0, 3) & F.col("b").between(0, 3)
    )
    assert sorted(r.payload for r in rows.collect()) == [
        i for i in range(2048) if i % 16 < 4 and (i // 16) % 16 < 4
    ]


def test_identity_overwrite_computes_generated_columns(
    spark, tmp_path
):
    """r18 review: when an overwrite PRESERVES the schema (identity
    table), its generation expressions survive too — an omitted
    generated column is computed, a contradicting one rejected, like
    any append."""
    t = str(tmp_path / "ident_gen_ow")
    write_delta(spark, t, _df(spark, 0, 1).select(
        F.lit(1).cast("long").alias("rid"), "k", "v", "tag"
    ))
    md_id = {
        "delta.identity.start": 100,
        "delta.identity.step": 10,
        "delta.identity.allowExplicitInsert": "false",
    }
    with open(_commit_file(t, 1), "w") as f:
        f.write(json.dumps({"metaData": {
            "id": "x", "format": {"provider": "parquet", "options": {}},
            "schemaString": json.dumps({"type": "struct", "fields": [
                {"name": "rid", "type": "long", "nullable": True,
                 "metadata": md_id},
                {"name": "k", "type": "long", "nullable": False,
                 "metadata": {}},
                {"name": "v", "type": "long", "nullable": False,
                 "metadata": {"delta.generationExpression": "k * 2"}},
                {"name": "tag", "type": "string", "nullable": False,
                 "metadata": {}},
            ]}),
            "partitionColumns": [], "createdTime": 0,
            "configuration": {},
        }}) + "\n")
    # overwrite omitting BOTH rid (identity) and v (generated)
    write_delta(
        spark, t,
        spark.range(5, 8).select(
            F.col("id").alias("k"), F.lit("ow").alias("tag")
        ),
        mode="overwrite",
    )
    rows = {r.k: (r.rid, r.v) for r in read_delta(spark, t).collect()}
    assert sorted(rows) == [5, 6, 7]
    assert sorted(rid for rid, _v in rows.values()) == [100, 110, 120]
    assert all(v == k * 2 for k, (_r, v) in rows.items())
    # a contradicting generated value still refuses on overwrite
    with pytest.raises(ValueError, match="generated:v"):
        write_delta(
            spark, t,
            spark.range(9, 10).select(
                F.col("id").alias("k"),
                F.lit(1).cast("long").alias("v"),
                F.lit("bad").alias("tag"),
            ),
            mode="overwrite",
        )


def test_in_commit_timestamps_write_and_time_travel(spark, tmp_path):
    """r19 inCommitTimestamp (VERDICT r18 item 3): a table created
    with delta.enableInCommitTimestamps=true publishes writer 7 with
    the feature listed (reader stays 1 — writer-only feature), every
    commit prepends commitInfo with a MONOTONE inCommitTimestamp, and
    timestampAsOf resolves by those in-log values."""
    from jobminer_spark.sources.delta import (
        _replay_full,
        delta_commit_timestamps,
        delta_version_at_timestamp,
    )

    t = str(tmp_path / "ict")
    for lo, hi in [(0, 4), (4, 7), (7, 9)]:
        write_delta(
            spark, t, _df(spark, lo, hi),
            configuration={"delta.enableInCommitTimestamps": "true"},
        )
    _a, _r, meta, _t2, proto = _replay_full(t, delta_latest_version(t))
    assert proto["minReaderVersion"] == 1
    assert proto["minWriterVersion"] == 7
    assert "inCommitTimestamp" in proto["writerFeatures"]
    # commitInfo is the FIRST action of every commit, ICT monotone
    icts = []
    for v in range(3):
        with open(_commit_file(t, v)) as f:
            acts = [json.loads(line) for line in f if line.strip()]
        assert "commitInfo" in acts[0]
        icts.append(acts[0]["commitInfo"]["inCommitTimestamp"])
    assert icts == sorted(icts) and len(set(icts)) == 3
    assert [v for v, _ts in delta_commit_timestamps(t)] == [0, 1, 2]
    # timestampAsOf: exact hit, between-commits floor, errors outside
    assert delta_version_at_timestamp(t, icts[1]) == 1
    assert read_delta(spark, t, timestamp=icts[1]).count() == 7
    if icts[2] - icts[1] > 1:
        assert delta_version_at_timestamp(t, icts[2] - 1) == 1
    with pytest.raises(ValueError, match="before the earliest"):
        delta_version_at_timestamp(t, icts[0] - 1)
    with pytest.raises(ValueError, match="after the latest"):
        delta_version_at_timestamp(t, icts[2] + 10_000)
    with pytest.raises(ValueError, match="mutually exclusive"):
        read_delta(spark, t, version=1, timestamp=icts[1])


def test_in_commit_timestamps_foreign_table_and_mtime_fallback(
    spark, tmp_path
):
    """A FOREIGN-shaped ICT table (in-log timestamps far from file
    mtimes) must time-travel by the in-log values — mtime lies after
    a log copy — and appends to it are accepted now that the writer
    feature is supported, continuing the monotone sequence. A plain
    table without the feature still resolves by (adjusted) mtime."""
    import time as _time

    from jobminer_spark.sources.delta import delta_version_at_timestamp

    t = str(tmp_path / "fict")
    write_delta(spark, t, _df(spark, 0, 4))  # v0, plain
    with open(_commit_file(t, 0)) as f:
        v0 = [json.loads(line) for line in f if line.strip()]
    os.unlink(_commit_file(t, 0))
    # re-craft v0/v1 as a foreign ICT table: timestamps 1000 and 2000
    # (decades from the files' real mtimes)
    meta = next(a["metaData"] for a in v0 if "metaData" in a)
    meta = {
        **meta,
        "configuration": {"delta.enableInCommitTimestamps": "true"},
    }
    adds = [a for a in v0 if "add" in a]
    _craft_log(t, {
        0: [
            {"commitInfo": {"inCommitTimestamp": 1000,
                            "timestamp": 1000}},
            {"protocol": {"minReaderVersion": 1, "minWriterVersion": 7,
                          "writerFeatures": ["inCommitTimestamp"]}},
            {"metaData": meta},
            *adds,
        ],
        1: [
            {"commitInfo": {"inCommitTimestamp": 2000,
                            "timestamp": 2000}},
        ],
    })
    assert read_delta(spark, t, timestamp=1500).count() == 4
    assert delta_version_at_timestamp(t, 2000) == 1
    # append accepted; its ICT continues past the foreign values
    write_delta(spark, t, _df(spark, 4, 6))
    with open(_commit_file(t, 2)) as f:
        acts = [json.loads(line) for line in f if line.strip()]
    assert "commitInfo" in acts[0]
    assert acts[0]["commitInfo"]["inCommitTimestamp"] > 2000
    assert read_delta(spark, t).count() == 6
    # mtime fallback on a plain table: now resolves to the latest
    t2 = str(tmp_path / "plain")
    write_delta(spark, t2, _df(spark, 0, 3))
    _time.sleep(0.05)
    write_delta(spark, t2, _df(spark, 3, 5))
    now_ms = int(_time.time() * 1000) + 1000
    # a timestamp after the last mtime errors (delta-spark semantics)
    with pytest.raises(ValueError, match="after the latest"):
        delta_version_at_timestamp(t2, now_ms)
    v0_ts = os.path.getmtime(_commit_file(t2, 0)) * 1000
    assert delta_version_at_timestamp(t2, int(v0_ts) + 1) in (0, 1)


def test_domain_metadata_set_replay_and_checkpoint(spark, tmp_path):
    """r19 domainMetadata (VERDICT r18 item 3): set/overwrite/remove
    a domain, latest-per-domain replay, writer-only protocol upgrade
    (reader version untouched), and checkpoint persistence — live
    domains survive log compaction, removed tombstones drop."""
    from jobminer_spark.sources.delta import (
        _replay_full,
        _write_checkpoint,
        delta_domain_metadata,
        set_delta_domain_metadata,
    )

    t = str(tmp_path / "dom")
    write_delta(spark, t, _df(spark, 0, 4))  # v0: plain writer-2 table
    v = set_delta_domain_metadata(t, "ownership", '{"team": "data"}')
    assert v == 1
    _a, _r, _m, _t2, proto = _replay_full(t, delta_latest_version(t))
    assert proto["minWriterVersion"] == 7
    assert proto["minReaderVersion"] == 1  # writer-only upgrade
    assert "domainMetadata" in proto["writerFeatures"]
    # legacy writer-2 implied features stay listed post-upgrade
    assert {"appendOnly", "invariants"} <= set(proto["writerFeatures"])
    assert delta_domain_metadata(t) == {
        "ownership": '{"team": "data"}'
    }
    # latest-per-domain; a second domain coexists
    set_delta_domain_metadata(t, "ownership", '{"team": "ml"}')
    set_delta_domain_metadata(t, "retention", '{"days": 30}')
    assert delta_domain_metadata(t) == {
        "ownership": '{"team": "ml"}',
        "retention": '{"days": 30}',
    }
    # time travel sees the old domain state
    assert delta_domain_metadata(t, version=1) == {
        "ownership": '{"team": "data"}'
    }
    # removal tombstones suppress the domain
    set_delta_domain_metadata(t, "retention", removed=True)
    assert delta_domain_metadata(t) == {"ownership": '{"team": "ml"}'}
    # appends pass domains through untouched
    write_delta(spark, t, _df(spark, 4, 6))
    assert delta_domain_metadata(t) == {"ownership": '{"team": "ml"}'}
    # checkpoint: live domains survive log compaction, tombstone drops
    latest = delta_latest_version(t)
    _write_checkpoint(t, latest)
    for vv in range(latest + 1):
        os.rename(_commit_file(t, vv), _commit_file(t, vv) + ".bak")
    with open(_commit_file(t, latest + 1), "w") as f:
        f.write(json.dumps({"commitInfo": {"operation": "NOOP"}}) + "\n")
    try:
        assert delta_domain_metadata(t) == {
            "ownership": '{"team": "ml"}'
        }
        snap = _replay_full(t, latest + 1)
        assert "retention" not in snap.domains  # tombstone dropped
        assert read_delta(spark, t).count() == 6
    finally:
        os.unlink(_commit_file(t, latest + 1))
        for vv in range(latest + 1):
            os.rename(_commit_file(t, vv) + ".bak", _commit_file(t, vv))


def test_liquid_clustering_create_and_optimize(spark, tmp_path):
    """r19 liquid clustering interop: CREATE ... CLUSTER BY lands the
    column registry in the delta.clustering domain with the
    clustering+domainMetadata writer features (reader stays 1);
    appends stay unclustered (clustering is EVENTUAL); a plain
    optimize_delta — no zorder_by — picks the domain's columns up and
    the 2-D stats prune goes multiplicative; guards hold."""
    from jobminer_spark.sources.delta import (
        _replay_full,
        delta_domain_metadata,
        optimize_delta,
    )

    t = str(tmp_path / "liquid")
    df = spark.range(0, 4096).select(
        (F.col("id") % 16).alias("a"),
        ((F.col("id") / 16).cast("long") % 16).alias("b"),
        F.col("id").alias("payload"),
    )
    for i in range(4):
        write_delta(
            spark, t,
            df.filter(F.col("id") % 4 == i).repartition(1),
            cluster_by=["a", "b"] if i == 0 else None,
        )
    _a, _r, _m, _t2, proto = _replay_full(t, delta_latest_version(t))
    assert proto["minReaderVersion"] == 1
    assert proto["minWriterVersion"] == 7
    assert {"clustering", "domainMetadata"} <= set(
        proto["writerFeatures"]
    )
    assert json.loads(
        delta_domain_metadata(t)["delta.clustering"]
    ) == {"clusteringColumns": [["a"], ["b"]]}
    flt = {"a": (0, 3), "b": (0, 3)}
    assert len(read_delta(spark, t, stats_filters=flt).inputFiles()) == 4
    v, nb, na = optimize_delta(spark, t, target_files=16)
    assert (nb, na) == (4, 16)
    post = read_delta(spark, t)
    assert post.count() == 4096
    assert post.agg(F.sum("payload")).collect()[0][0] == sum(range(4096))
    pruned = read_delta(spark, t, stats_filters=flt)
    assert len(pruned.inputFiles()) <= 4
    assert sorted(
        r.payload
        for r in pruned.where(
            F.col("a").between(0, 3) & F.col("b").between(0, 3)
        ).collect()
    ) == [i for i in range(4096) if i % 16 < 4 and (i // 16) % 16 < 4]
    # guards: cluster_by is creation-only and excludes partition_by
    with pytest.raises(ValueError, match="CREATION only"):
        write_delta(spark, t, df.limit(1), cluster_by=["a"])
    with pytest.raises(ValueError, match="mutually exclusive"):
        write_delta(
            spark, str(tmp_path / "x"), df.limit(1),
            cluster_by=["a"], partition_by=["b"],
        )
    with pytest.raises(ValueError, match="not in the"):
        write_delta(
            spark, str(tmp_path / "y"), df.limit(1), cluster_by=["zz"]
        )


def test_liquid_clustering_foreign_table_writable(spark, tmp_path):
    """A FOREIGN clustered table (writer 7 with clustering +
    domainMetadata, the delta.clustering domain in its log) accepts
    appends now — clustering is advisory for writers — and its
    nested-path registry refuses OPTIMIZE loudly instead of
    clustering the wrong column."""
    from jobminer_spark.sources.delta import optimize_delta

    t = str(tmp_path / "fliquid")
    write_delta(spark, t, _df(spark, 0, 4))
    with open(_commit_file(t, 0)) as f:
        v0 = [json.loads(line) for line in f if line.strip()]
    os.unlink(_commit_file(t, 0))
    meta = next(a["metaData"] for a in v0 if "metaData" in a)
    adds = [a for a in v0 if "add" in a]
    _craft_log(t, {0: [
        {"protocol": {"minReaderVersion": 1, "minWriterVersion": 7,
                      "writerFeatures": ["clustering",
                                         "domainMetadata"]}},
        {"metaData": meta},
        {"domainMetadata": {"domain": "delta.clustering",
                            "configuration": json.dumps(
                                {"clusteringColumns": [["k"]]}
                            ),
                            "removed": False}},
        *adds,
    ]})
    write_delta(spark, t, _df(spark, 4, 6))  # accepted
    assert read_delta(spark, t).count() == 6
    # plain OPTIMIZE clusters by the domain's column k
    optimize_delta(spark, t, target_files=2)
    assert read_delta(spark, t).count() == 6
    pruned = read_delta(spark, t, stats_filters={"k": (0, 1)})
    assert len(pruned.inputFiles()) < len(
        read_delta(spark, t).inputFiles()
    ) or len(read_delta(spark, t).inputFiles()) == 1
    # nested clustering path refuses rather than mis-clustering
    with open(_commit_file(t, delta_latest_version(t) + 1), "w") as f:
        f.write(json.dumps({"domainMetadata": {
            "domain": "delta.clustering",
            "configuration": json.dumps(
                {"clusteringColumns": [["s", "inner"]]}
            ),
            "removed": False,
        }}) + "\n")
    with pytest.raises(ValueError, match="nested"):
        optimize_delta(spark, t, target_files=2)


def test_row_tracking_assignment_and_read(spark, tmp_path):
    """r19 rowTracking: a table created with
    delta.enableRowTracking=true lists rowTracking+domainMetadata
    (writer 7, reader 1), every add reserves a contiguous baseRowId
    range, the delta.rowTracking high watermark advances per commit,
    read_delta_row_ids derives unique stable ids, checkpoints carry
    the assignment, and rewriting ops refuse (enforce-or-refuse)."""
    from jobminer_spark.sources.delta import (
        _replay_full,
        _write_checkpoint,
        delta_domain_metadata,
        optimize_delta,
        read_delta_row_ids,
    )

    t = str(tmp_path / "rt")
    for lo, hi in [(0, 4), (4, 10), (10, 13)]:
        write_delta(
            spark, t, _df(spark, lo, hi),
            configuration={"delta.enableRowTracking": "true"},
        )
    _a, _r, _m, _t2, proto = _replay_full(t, delta_latest_version(t))
    assert proto["minReaderVersion"] == 1
    assert {"rowTracking", "domainMetadata"} <= set(
        proto["writerFeatures"]
    )
    assert json.loads(
        delta_domain_metadata(t)["delta.rowTracking"]
    ) == {"rowIdHighWaterMark": 12}
    got = read_delta_row_ids(spark, t)
    rows = got.select("k", "_row_id", "_row_commit_version").collect()
    ids = sorted(r._row_id for r in rows)
    assert ids == list(range(13))  # unique, contiguous from 0
    # per-commit provenance: the v1 rows carry commit version 1
    assert {r._row_commit_version for r in rows if 4 <= r.k < 10} == {1}
    # checkpoint: the assignment survives log compaction
    _write_checkpoint(t, delta_latest_version(t))
    for vv in range(3):
        os.rename(_commit_file(t, vv), _commit_file(t, vv) + ".bak")
    with open(_commit_file(t, 3), "w") as f:
        f.write(json.dumps({"commitInfo": {"operation": "NOOP"}}) + "\n")
    try:
        assert sorted(
            r._row_id for r in read_delta_row_ids(spark, t).collect()
        ) == list(range(13))
    finally:
        os.unlink(_commit_file(t, 3))
        for vv in range(3):
            os.rename(_commit_file(t, vv) + ".bak", _commit_file(t, vv))
    # rewriting ops refuse while the property is on
    with pytest.raises(ValueError, match="row ids"):
        optimize_delta(spark, t, target_files=1)
    # overwrite assigns FRESH ids past the watermark
    write_delta(spark, t, _df(spark, 0, 2), mode="overwrite")
    got2 = read_delta_row_ids(spark, t)
    assert sorted(r._row_id for r in got2.collect()) == [13, 14]
    # a plain table (no row tracking) refuses the row-id read
    t2 = str(tmp_path / "plain")
    write_delta(spark, t2, _df(spark, 0, 2))
    with pytest.raises(ValueError, match="row tracking not assigned"):
        read_delta_row_ids(spark, t2)


def test_create_column_mapped_table(spark, tmp_path):
    """r19: CREATE with delta.columnMapping.mode (previously only
    foreign-created mapped tables were writable) — fields get stable
    ids + col-<uuid> physical names, maxColumnId lands in the config,
    the protocol gates readers (legacy reader 2/writer 5), data files
    carry ONLY physical names, and the whole existing mapped-table
    surface (append, partition pruning, OPTIMIZE, delete) works on
    the self-created table."""
    import pyarrow.parquet as papq

    from jobminer_spark.sources.delta import (
        _replay_full,
        delete_delta,
        optimize_delta,
    )

    for mode in ("name", "id"):
        t = str(tmp_path / f"cmap_{mode}")
        write_delta(
            spark, t, _df(spark, 0, 6),
            partition_by=["tag"],
            configuration={"delta.columnMapping.mode": mode},
        )
        adds, _r, meta, _t2, proto = _replay_full(
            t, delta_latest_version(t)
        )
        assert (proto["minReaderVersion"], proto["minWriterVersion"]) \
            == (2, 5)
        conf = meta["configuration"]
        assert conf["delta.columnMapping.mode"] == mode
        assert conf["delta.columnMapping.maxColumnId"] == "3"
        fields = json.loads(meta["schemaString"])["fields"]
        phys = {
            f["name"]: f["metadata"]["delta.columnMapping.physicalName"]
            for f in fields
        }
        assert all(p.startswith("col-") for p in phys.values())
        assert [
            f["metadata"]["delta.columnMapping.id"] for f in fields
        ] == [1, 2, 3]
        # data files hold ONLY physical names; partitionValues keyed
        # physically
        some = next(iter(adds.values()))
        assert set(some["partitionValues"]) == {phys["tag"]}
        fpath = os.path.join(t, some["path"])
        names = set(papq.read_schema(fpath).names)
        assert names == {phys["k"], phys["v"]}
        # logical read, append, prune, OPTIMIZE, MoR delete all work
        assert sorted(r.k for r in read_delta(spark, t).collect()) \
            == list(range(6))
        write_delta(spark, t, _df(spark, 6, 9), partition_by=["tag"])
        assert read_delta(spark, t).count() == 9
        assert read_delta(
            spark, t, partition_filters={"tag": "a"}
        ).count() == 9
        optimize_delta(spark, t, target_files=1)
        delete_delta(spark, t, F.col("k") == 0)
        assert sorted(r.k for r in read_delta(spark, t).collect()) \
            == list(range(1, 9))


def test_merge_schema_append_evolution(spark, tmp_path):
    """r19 mergeSchema: an append carrying a NEW column widens the
    schema in the same commit (nullable; old files read NULL for it),
    works on column-mapped tables (fresh id + physical name,
    maxColumnId advanced), keeps the stricter-nullability rule on
    existing columns, and refuses a batch that DROPS a column."""
    from jobminer_spark.sources.delta import _replay_full

    t = str(tmp_path / "msch")
    write_delta(spark, t, _df(spark, 0, 4))
    write_delta(
        spark, t,
        _df(spark, 4, 7).withColumn("extra", F.col("k") * 100),
        merge_schema=True,
    )
    _a, _r, meta, _t2, _p = _replay_full(t, delta_latest_version(t))
    fields = json.loads(meta["schemaString"])["fields"]
    assert [f["name"] for f in fields] == ["k", "v", "tag", "extra"]
    assert fields[-1]["nullable"] is True
    got = {r.k: r.extra for r in read_delta(spark, t).collect()}
    assert got == {**{i: None for i in range(4)},
                   **{i: i * 100 for i in range(4, 7)}}
    # a further plain append must now carry the evolved schema
    with pytest.raises(ValueError, match="append schema differs"):
        write_delta(spark, t, _df(spark, 7, 8))
    # dropping a column refuses even with merge_schema
    with pytest.raises(ValueError, match="missing"):
        write_delta(
            spark, t,
            spark.range(1).select(F.col("id").alias("k")),
            merge_schema=True,
        )
    # column-mapped evolution: fresh id + physical name
    t2 = str(tmp_path / "msch_map")
    write_delta(
        spark, t2, _df(spark, 0, 3),
        configuration={"delta.columnMapping.mode": "name"},
    )
    write_delta(
        spark, t2,
        _df(spark, 3, 5).withColumn("score", F.col("k") + 1),
        merge_schema=True,
    )
    _a, _r, meta2, _t3, _p2 = _replay_full(t2, delta_latest_version(t2))
    assert meta2["configuration"]["delta.columnMapping.maxColumnId"] \
        == "4"
    f_new = json.loads(meta2["schemaString"])["fields"][-1]
    assert f_new["name"] == "score"
    assert f_new["metadata"]["delta.columnMapping.id"] == 4
    assert f_new["metadata"][
        "delta.columnMapping.physicalName"
    ].startswith("col-")
    got2 = {r.k: r.score for r in read_delta(spark, t2).collect()}
    assert got2 == {0: None, 1: None, 2: None, 3: 4, 4: 5}


def test_uniform_iceberg_export(spark, tmp_path):
    """r19 Delta UniForm: Iceberg metadata published over the Delta
    table's own parquet files — read_iceberg serves the same rows as
    read_delta with zero data movement; a partitioned table exports
    an identity spec whose partition columns (absent from the data
    files, as in Delta) are restored from manifest tuples; re-export
    after a Delta commit refreshes the view; DV-carrying and
    column-mapped tables refuse."""
    from jobminer_spark.sources.delta import delete_delta
    from jobminer_spark.sources.iceberg import (
        iceberg_metadata,
        read_iceberg,
    )
    from jobminer_spark.sources.uniform import (
        write_uniform_iceberg_metadata,
    )

    t = str(tmp_path / "uni")
    write_delta(spark, t, _df(spark, 0, 6), partition_by=["tag"])
    write_delta(
        spark, t, _df(spark, 6, 9, tag="b"), partition_by=["tag"]
    )
    write_uniform_iceberg_metadata(t)
    meta = iceberg_metadata(t)
    assert meta["properties"]["delta.universalFormat.source"] == "delta"
    got_i = sorted(
        (r.k, r.v, r.tag) for r in read_iceberg(spark, t).collect()
    )
    got_d = sorted(
        (r.k, r.v, r.tag) for r in read_delta(spark, t).collect()
    )
    assert got_i == got_d and len(got_i) == 9
    # identity-spec partition pruning works on the exported view
    pruned = read_iceberg(spark, t, partition_filters={"tag": "b"})
    assert sorted(r.k for r in pruned.collect()) == [6, 7, 8]
    # refresh after a Delta append picks the new state up
    write_delta(
        spark, t, _df(spark, 9, 11, tag="c"), partition_by=["tag"]
    )
    write_uniform_iceberg_metadata(t)
    assert read_iceberg(spark, t).count() == 11
    assert iceberg_metadata(t)["properties"][
        "delta.universalFormat.deltaVersion"
    ] == "2"
    # DV refusal: a merge-on-read delete leaves a DV the Iceberg
    # reader cannot apply
    delete_delta(spark, t, F.col("k") == 0)
    with pytest.raises(ValueError, match="deletion vectors"):
        write_uniform_iceberg_metadata(t)
    # column-mapped refusal
    t2 = str(tmp_path / "unimap")
    write_delta(
        spark, t2, _df(spark, 0, 3),
        configuration={"delta.columnMapping.mode": "name"},
    )
    with pytest.raises(ValueError, match="column-mapped"):
        write_uniform_iceberg_metadata(t2)


def test_generate_symlink_manifest(spark, tmp_path):
    """r19 GENERATE symlink_format_manifest: per-partition manifest
    text files listing absolute file: URIs of exactly the live data
    files — the Presto/Trino external-table layout; regeneration
    reflects overwrites; DV-carrying and mapped tables refuse."""
    from jobminer_spark.sources.delta import (
        _replay_full,
        delete_delta,
        generate_symlink_manifest,
    )

    t = str(tmp_path / "symlink")
    write_delta(spark, t, _df(spark, 0, 4), partition_by=["tag"])
    write_delta(
        spark, t, _df(spark, 4, 7, tag="b"), partition_by=["tag"]
    )
    paths = generate_symlink_manifest(t)
    assert all(p.endswith("/manifest") for p in paths)
    dirs = {os.path.basename(os.path.dirname(p)) for p in paths}
    assert dirs == {"tag=a", "tag=b"}
    adds, _r, _m, _t2, _p = _replay_full(t, delta_latest_version(t))
    listed = set()
    for p in paths:
        with open(p) as f:
            for line in f:
                assert line.startswith("file:///")
                listed.add(line.strip().replace("file://", ""))
    assert listed == {
        os.path.abspath(os.path.join(t, rel)) for rel in adds
    }
    # the listed files ARE readable parquet holding every row
    # (partition column comes from the directory, hive-style)
    n = spark.read.parquet(*sorted(listed)).count()
    assert n == 7
    # regeneration after an overwrite replaces the manifests
    write_delta(
        spark, t, _df(spark, 0, 2), mode="overwrite",
        partition_by=["tag"],
    )
    paths2 = generate_symlink_manifest(t)
    assert {os.path.basename(os.path.dirname(p)) for p in paths2} == {
        "tag=a"
    }
    with open(paths2[0]) as f:
        assert len([x for x in f if x.strip()]) == len(
            _replay_full(t, delta_latest_version(t))[0]
        )
    # refusals: DVs and column mapping
    delete_delta(spark, t, F.col("k") == 0)
    with pytest.raises(ValueError, match="deletion vectors"):
        generate_symlink_manifest(t)
    t2 = str(tmp_path / "symmap")
    write_delta(
        spark, t2, _df(spark, 0, 3),
        configuration={"delta.columnMapping.mode": "name"},
    )
    with pytest.raises(ValueError, match="column-mapped"):
        generate_symlink_manifest(t2)


def test_export_iceberg_to_delta(spark, tmp_path):
    """r19 reverse export: a Delta log published over an Iceberg
    table's files — same rows through read_delta with zero copy;
    refresh after an Iceberg append; refusal on live delete files
    until compaction."""
    from jobminer_spark.sources.iceberg import (
        iceberg_live_files,
        rewrite_iceberg_deletes,
        write_iceberg,
        write_iceberg_deletes,
    )
    from jobminer_spark.sources.uniform import export_iceberg_to_delta

    ice = str(tmp_path / "ice")
    dl = str(tmp_path / "dl")
    write_iceberg(
        spark, ice,
        spark.range(0, 6).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("v")
        ),
    )
    assert export_iceberg_to_delta(ice, dl) == 0
    got = sorted((r.k, r.v) for r in read_delta(spark, dl).collect())
    assert got == [(i, 2 * i) for i in range(6)]
    # refresh after an append: the next Delta version replaces
    write_iceberg(
        spark, ice,
        spark.range(6, 9).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("v")
        ),
    )
    assert export_iceberg_to_delta(ice, dl) == 1
    assert read_delta(spark, dl).count() == 9
    assert read_delta(spark, dl, version=0).count() == 6
    # live deletes refuse; compaction clears the way
    scan = spark.read.parquet(*iceberg_live_files(ice)).withColumns({
        "fp": F.regexp_replace(
            F.col("_metadata.file_path"), "^file:/+", "/"
        ),
        "pos": F.col("_metadata.row_index"),
    })
    write_iceberg_deletes(
        spark, ice,
        scan.where(F.col("k") == 0).select(
            F.col("fp").alias("file_path"), "pos"
        ),
    )
    with pytest.raises(ValueError, match="delete file"):
        export_iceberg_to_delta(ice, dl)
    rewrite_iceberg_deletes(spark, ice)
    assert export_iceberg_to_delta(ice, dl) == 2
    assert sorted(r.k for r in read_delta(spark, dl).collect()) == list(
        range(1, 9)
    )


# ---------------------------------------------------------------- clone


def test_clone_shallow_zero_copy_parity(spark, tmp_path):
    """SHALLOW CLONE: commit 0 references the source's files by
    absolute file: URI — parity without a single copied byte."""
    from jobminer_spark.sources.delta import clone_delta

    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    write_delta(
        spark, src,
        _df(spark, 0, 40).withColumn("p", (F.col("k") % 3).cast("string")),
        partition_by=["p"],
    )
    write_delta(
        spark, src,
        _df(spark, 40, 60).withColumn("p", F.lit("9")),
        partition_by=["p"],
    )
    n, total = clone_delta(src, dst)
    assert n > 0 and total > 0
    a = {(r["k"], r["v"], r["p"]) for r in read_delta(spark, src).collect()}
    b = {(r["k"], r["v"], r["p"]) for r in read_delta(spark, dst).collect()}
    assert a == b and len(a) == 60
    # zero copy: no data files under the clone
    copied = [
        f
        for root, _d, fs in os.walk(dst)
        for f in fs
        if f.endswith(".parquet") and "_delta_log" not in root
    ]
    assert copied == []
    # every add in commit 0 is an absolute percent-encoded file: URI
    with open(_commit_file(dst, 0)) as f:
        adds = [
            json.loads(x)["add"] for x in f if x.strip() and "add" in x
        ]
    assert adds and all(a_["path"].startswith("file:///") for a_ in adds)


def test_clone_independence_both_directions(spark, tmp_path):
    from jobminer_spark.sources.delta import clone_delta

    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    write_delta(spark, src, _df(spark, 0, 10))
    clone_delta(src, dst)
    write_delta(spark, dst, _df(spark, 100, 105))  # clone-only append
    write_delta(spark, src, _df(spark, 200, 220))  # source-only append
    assert read_delta(spark, dst).count() == 15
    assert read_delta(spark, src).count() == 30
    # clone v0 is the cloned snapshot forever
    assert read_delta(spark, dst, version=0).count() == 10


def test_clone_delete_writes_dvs_in_clone_dir(spark, tmp_path):
    """delete_delta on a clone masks SOURCE files with DVs stored in
    the CLONE's directory — the source never changes."""
    from jobminer_spark.sources.delta import clone_delta, delete_delta

    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    write_delta(spark, src, _df(spark, 0, 30))
    clone_delta(src, dst)
    ver, n_del = delete_delta(spark, dst, "k < 10")
    assert (ver, n_del) == (1, 10)
    assert read_delta(spark, dst).count() == 20
    assert read_delta(spark, src).count() == 30
    bins = [
        f
        for root, _d, fs in os.walk(dst)
        for f in fs
        if f.endswith(".bin")
    ]
    assert bins, "the DV payload must live under the clone"
    src_bins = [
        f
        for root, _d, fs in os.walk(src)
        for f in fs
        if f.endswith(".bin")
    ]
    assert src_bins == []


def test_clone_of_dv_carrying_source(spark, tmp_path):
    """A source whose snapshot carries deletion vectors clones with
    the descriptors re-anchored as absolute 'p' paths into the
    source — the deleted rows stay deleted in the clone."""
    from jobminer_spark.sources.delta import clone_delta, delete_delta

    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    write_delta(spark, src, _df(spark, 0, 30))
    delete_delta(spark, src, "k >= 25")
    clone_delta(src, dst)
    assert sorted(r["k"] for r in read_delta(spark, dst).collect()) == list(
        range(25)
    )
    with open(_commit_file(dst, 0)) as f:
        dvs = [
            json.loads(x)["add"].get("deletionVector")
            for x in f
            if x.strip() and '"add"' in x
        ]
    carried = [d for d in dvs if d]
    assert carried and all(
        d["storageType"] == "p" and os.path.isabs(d["pathOrInlineDv"])
        for d in carried
    )


def test_clone_vacuum_never_reaches_source(spark, tmp_path):
    from jobminer_spark.sources.delta import (
        clone_delta,
        optimize_delta,
        vacuum_delta,
    )

    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    for lo in range(0, 40, 10):
        write_delta(spark, src, _df(spark, lo, lo + 10))
    clone_delta(src, dst)
    deleted, kept = vacuum_delta(dst, retention_ms=0)
    assert deleted == [] and kept == 0
    # OPTIMIZE materializes the external files into local ones, the
    # removes tombstone the absolute URIs — vacuum still cannot touch
    # the source's bytes (they are outside the clone's directory walk)
    optimize_delta(spark, dst)
    vacuum_delta(dst, retention_ms=0)
    assert read_delta(spark, src).count() == 40
    assert read_delta(spark, dst).count() == 40


def test_clone_version_as_of_and_refusals(spark, tmp_path):
    from jobminer_spark.sources.delta import clone_delta

    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    write_delta(spark, src, _df(spark, 0, 10))
    write_delta(spark, src, _df(spark, 10, 30))
    clone_delta(src, dst, version=0)
    assert read_delta(spark, dst).count() == 10
    with pytest.raises(FileExistsError):
        clone_delta(src, dst)
    with pytest.raises(ValueError, match="out of range"):
        clone_delta(src, str(tmp_path / "d2"), version=7)
    with pytest.raises(FileNotFoundError):
        clone_delta(str(tmp_path / "nope"), str(tmp_path / "d3"))


def test_clone_ict_source_gets_fresh_monotone_ict(spark, tmp_path):
    from jobminer_spark.sources.delta import clone_delta

    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    write_delta(
        spark, src, _df(spark, 0, 10),
        configuration={"delta.enableInCommitTimestamps": "true"},
    )
    clone_delta(src, dst)
    with open(_commit_file(dst, 0)) as f:
        infos = [
            json.loads(x)["commitInfo"]
            for x in f
            if x.strip() and x.startswith('{"commitInfo"')
        ]
    assert infos and infos[0].get("inCommitTimestamp") is not None


def test_clone_row_tracking_ids_preserved(spark, tmp_path):
    """baseRowId assignments and the rowTracking watermark domain ride
    the clone — stable row ids agree across the two tables."""
    from jobminer_spark.sources.delta import clone_delta, read_delta_row_ids

    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    write_delta(
        spark, src, _df(spark, 0, 20),
        configuration={"delta.enableRowTracking": "true"},
    )
    write_delta(spark, src, _df(spark, 20, 35))
    clone_delta(src, dst)
    a = {(r["k"], r["_row_id"]) for r in read_delta_row_ids(spark, src).collect()}
    b = {(r["k"], r["_row_id"]) for r in read_delta_row_ids(spark, dst).collect()}
    assert a == b and len(a) == 35
    # the watermark domain carried over: a fresh append to the clone
    # continues numbering past the source's high watermark
    write_delta(spark, dst, _df(spark, 100, 110))
    ids = {
        r["_row_id"] for r in read_delta_row_ids(spark, dst).collect()
    }
    assert len(ids) == 45  # no collisions


def test_clone_column_mapped_source(spark, tmp_path):
    from jobminer_spark.sources.delta import clone_delta

    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    write_delta(
        spark, src, _df(spark, 0, 25),
        configuration={"delta.columnMapping.mode": "name"},
    )
    clone_delta(src, dst)
    got = sorted(r["k"] for r in read_delta(spark, dst).collect())
    assert got == list(range(25))


def test_clone_breaks_loudly_after_source_vacuum(spark, tmp_path):
    """The shallow-clone trade, stated: vacuuming the SOURCE deletes
    bytes the clone still references — its scans fail afterwards."""
    from jobminer_spark.sources.delta import clone_delta, vacuum_delta

    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    write_delta(spark, src, _df(spark, 0, 10))
    clone_delta(src, dst)
    write_delta(spark, src, _df(spark, 50, 55), mode="overwrite")
    vacuum_delta(src, retention_ms=0)
    with pytest.raises(Exception):
        read_delta(spark, dst).count()


# -------------------------------------------------- convert to delta


def test_convert_plain_parquet_dir(spark, tmp_path):
    from jobminer_spark.sources.delta import convert_to_delta

    p = str(tmp_path / "plain")
    _df(spark, 0, 60).write.parquet(p)
    n, total = convert_to_delta(spark, p)
    assert n > 0 and total > 0
    assert delta_latest_version(p) == 0
    assert sorted(r["k"] for r in read_delta(spark, p).collect()) == list(
        range(60)
    )
    # commit 0 carries real sizes + footer stats
    with open(_commit_file(p, 0)) as f:
        adds = [
            json.loads(x)["add"] for x in f if x.strip() and '"add"' in x
        ]
    assert all(a["size"] > 0 for a in adds)
    assert any("stats" in a for a in adds)


def test_convert_hive_partitioned_dir(spark, tmp_path):
    from jobminer_spark.sources.delta import convert_to_delta

    p = str(tmp_path / "hive")
    df = _df(spark, 0, 80).withColumn(
        "part", (F.col("k") % 4).cast("string")
    )
    df.write.partitionBy("part").parquet(p)
    convert_to_delta(spark, p, partition_schema="part string")
    got = (
        read_delta(spark, p)
        .groupBy("part")
        .count()
        .orderBy("part")
        .collect()
    )
    assert [(r["part"], r["count"]) for r in got] == [
        ("0", 20), ("1", 20), ("2", 20), ("3", 20),
    ]


def test_convert_then_full_surface(spark, tmp_path):
    """After conversion the directory IS a Delta table: DV deletes,
    appends of table-shaped frames, time travel."""
    from jobminer_spark.sources.delta import (
        convert_to_delta,
        delete_delta,
    )

    p = str(tmp_path / "surf")
    df = _df(spark, 0, 50).withColumn(
        "part", (F.col("k") % 2).cast("string")
    )
    df.write.partitionBy("part").parquet(p)
    convert_to_delta(spark, p, partition_schema="part string")
    delete_delta(spark, p, "part = '0'")
    assert read_delta(spark, p).count() == 25
    readd = read_delta(spark, p).filter(F.col("k") < 10)
    write_delta(spark, p, readd, partition_by=["part"])
    assert read_delta(spark, p).count() == 30
    assert read_delta(spark, p, version=0).count() == 50


def test_convert_refusals(spark, tmp_path):
    from jobminer_spark.sources.delta import convert_to_delta

    # partitioned layout without partition_schema: loud refusal
    p = str(tmp_path / "h2")
    _df(spark, 0, 20).withColumn(
        "part", (F.col("k") % 2).cast("string")
    ).write.partitionBy("part").parquet(p)
    with pytest.raises(ValueError, match="no partition_schema"):
        convert_to_delta(spark, p)
    # double conversion
    q = str(tmp_path / "p2")
    _df(spark, 0, 10).write.parquet(q)
    convert_to_delta(spark, q)
    with pytest.raises(FileExistsError):
        convert_to_delta(spark, q)
    # empty directory
    empty = str(tmp_path / "empty")
    os.makedirs(empty)
    with pytest.raises(FileNotFoundError):
        convert_to_delta(spark, empty)
    # schema naming a partition column the files also carry
    r = str(tmp_path / "clash")
    _df(spark, 0, 10).write.parquet(r + "/tag=x")
    with pytest.raises(ValueError, match="INSIDE the data files"):
        convert_to_delta(spark, r, partition_schema="tag string")


def test_convert_null_partition_sentinel(spark, tmp_path):
    from jobminer_spark.sources.delta import convert_to_delta

    p = str(tmp_path / "nulls")
    df = _df(spark, 0, 30).withColumn(
        "part",
        F.when(F.col("k") % 3 == 0, None).otherwise(
            (F.col("k") % 3).cast("string")
        ),
    )
    df.write.partitionBy("part").parquet(p)
    convert_to_delta(spark, p, partition_schema="part string")
    got = read_delta(spark, p)
    assert got.count() == 30
    assert got.filter(F.col("part").isNull()).count() == 10


def test_vacuum_spares_uniform_iceberg_metadata(spark, tmp_path):
    """ADVICE r19 (medium): vacuum on a UniForm table (Iceberg
    metadata/ published inside the Delta table dir) must not delete
    the Iceberg manifests / metadata JSONs / version-hint — no Delta
    snapshot references them, but they ARE the Iceberg view of the
    shared table."""
    from jobminer_spark.sources.delta import vacuum_delta
    from jobminer_spark.sources.iceberg import read_iceberg
    from jobminer_spark.sources.uniform import (
        write_uniform_iceberg_metadata,
    )

    t = str(tmp_path / "univac")
    write_delta(spark, t, _df(spark, 0, 6))
    # an overwrite leaves aged tombstoned files for vacuum to reclaim
    write_delta(spark, t, _df(spark, 0, 8), mode="overwrite")
    write_uniform_iceberg_metadata(t)
    md = os.path.join(t, "metadata")
    md_before = sorted(os.listdir(md))
    deleted, _ = vacuum_delta(t, retention_ms=0)
    # the overwrite's tombstoned files went; the Iceberg dir did not
    assert deleted, "vacuum should reclaim the overwritten files"
    assert not any(d.startswith("metadata/") for d in deleted)
    assert sorted(os.listdir(md)) == md_before
    assert read_iceberg(spark, t).count() == 8
    assert read_delta(spark, t).count() == 8


def test_export_iceberg_to_delta_percent_path(spark, tmp_path):
    """ADVICE r19 (low): the reverse export emits QUOTED file: URIs
    (like clone_delta) so a table path containing a literal % — which
    the reader's _add_abs_path percent-decodes in bare absolute
    paths — still resolves to the right files at scan time."""
    from jobminer_spark.sources.iceberg import write_iceberg
    from jobminer_spark.sources.uniform import export_iceberg_to_delta

    ice = str(tmp_path / "ice %20dir")
    dl = str(tmp_path / "dl")
    write_iceberg(
        spark, ice,
        spark.range(0, 5).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("v")
        ),
    )
    assert export_iceberg_to_delta(ice, dl) == 0
    got = sorted((r.k, r.v) for r in read_delta(spark, dl).collect())
    assert got == [(i, 2 * i) for i in range(5)]


def test_cluster_by_invalid_column_leaves_no_files(spark, tmp_path):
    """ADVICE r19 (low): an invalid cluster_by column refuses BEFORE
    any staging — previously the check ran post-staging and leaked
    orphaned data files into the new table dir."""
    t = str(tmp_path / "clbad")
    with pytest.raises(ValueError, match="cluster_by columns"):
        write_delta(spark, t, _df(spark, 0, 5), cluster_by=["nope"])
    leaked = [
        os.path.join(r, f)
        for r, _d, fs in os.walk(t)
        for f in fs
        if f.endswith(".parquet")
    ]
    assert leaked == []
