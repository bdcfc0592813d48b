"""Pure-Python Avro codec + Iceberg metadata chain (sources/avro.py,
sources/iceberg.py): spec encoding round trips, foreign-writer block
shapes, loud failures, distributed read/write, and snapshot travel."""

from __future__ import annotations

import io
import json
import os

import pytest
from pyspark.sql import functions as F

from jobminer_spark.sources.avro import (
    _write_bytes,
    _write_long,
    read_avro,
    read_avro_records,
    write_avro_dataset,
    write_avro_file,
)
from jobminer_spark.sources.iceberg import (
    iceberg_snapshots,
    read_iceberg,
    write_iceberg,
)

_SCHEMA = {
    "type": "record",
    "name": "r",
    "fields": [
        {"name": "k", "type": "long"},
        {"name": "s", "type": ["null", "string"]},
        {"name": "d", "type": "double"},
        {"name": "b", "type": "boolean"},
        {"name": "tags", "type": {"type": "array", "items": "string"}},
        {"name": "props", "type": {"type": "map", "values": "long"}},
        {
            "name": "e",
            "type": {
                "type": "enum",
                "name": "col",
                "symbols": ["RED", "BLUE"],
            },
        },
        {"name": "raw", "type": "bytes"},
    ],
}

_RECORDS = [
    {
        "k": -(12_345_678_901_234),
        "s": None,
        "d": 3.5,
        "b": True,
        "tags": ["a", "b"],
        "props": {"x": 1, "y": -2},
        "e": "BLUE",
        "raw": b"\x00\xff",
    },
    {
        "k": 7,
        "s": "héllo",
        "d": -0.25,
        "b": False,
        "tags": [],
        "props": {},
        "e": "RED",
        "raw": b"",
    },
]


@pytest.mark.parametrize("codec", ["null", "deflate"])
def test_container_roundtrip_all_types(tmp_path, codec):
    p = str(tmp_path / "t.avro")
    recs = _RECORDS * 2500  # multiple blocks at block_records=4096
    write_avro_file(p, _SCHEMA, recs, codec=codec)
    schema, back = read_avro_records(p)
    assert schema == _SCHEMA
    assert back == recs


def test_negative_block_counts_from_foreign_writers(tmp_path):
    """Some writers emit array/map blocks with NEGATIVE counts (the
    spec's skippable form: -count then byte size). Hand-craft one."""
    schema = {
        "type": "record",
        "name": "r",
        "fields": [
            {"name": "tags", "type": {"type": "array", "items": "long"}}
        ],
    }
    body = io.BytesIO()
    # array block: count = -2 (negative form), then byte size, items
    items = io.BytesIO()
    _write_long(items, 10)
    _write_long(items, 20)
    _write_long(body, -2)
    _write_long(body, len(items.getvalue()))
    body.write(items.getvalue())
    _write_long(body, 0)  # terminator

    out = io.BytesIO()
    out.write(b"Obj\x01")
    meta = {"avro.schema": json.dumps(schema).encode(), "avro.codec": b"null"}
    _write_long(out, len(meta))
    for k, v in meta.items():
        _write_bytes(out, k.encode())
        _write_bytes(out, v)
    _write_long(out, 0)
    sync = bytes(range(16))
    out.write(sync)
    payload = body.getvalue()
    _write_long(out, 1)
    _write_long(out, len(payload))
    out.write(payload)
    out.write(sync)
    p = str(tmp_path / "neg.avro")
    with open(p, "wb") as f:
        f.write(out.getvalue())
    _, recs = read_avro_records(p)
    assert recs == [{"tags": [10, 20]}]


def test_unsupported_codec_fails_loudly(tmp_path):
    p = str(tmp_path / "t.avro")
    write_avro_file(p, _SCHEMA, _RECORDS[:1])
    data = open(p, "rb").read().replace(b"deflate", b"zstandd")
    with open(p, "wb") as f:
        f.write(data)
    with pytest.raises(ValueError, match="codec"):
        read_avro_records(p)


def test_distributed_roundtrip_with_nulls(spark, tmp_path):
    d = str(tmp_path / "ds")
    df = spark.range(0, 500).select(
        F.col("id").alias("k"),
        F.when(F.col("id") % 7 == 0, None)
        .otherwise(F.col("id") * 2)
        .alias("v"),
        F.concat(F.lit("s"), F.col("id").cast("string")).alias("s"),
        (F.col("id") % 2 == 0).alias("flag"),
        (F.col("id") / 4.0).alias("d"),
    )
    n_files = write_avro_dataset(spark, df.repartition(4), d)
    assert n_files == 4
    back = read_avro(spark, d)
    got = back.agg(
        F.count("*"),
        F.sum("k"),
        F.sum("v"),
        F.count(F.when(F.col("v").isNull(), 1)),
        F.sum("d"),
    ).first()
    exp = df.agg(
        F.count("*"),
        F.sum("k"),
        F.sum("v"),
        F.count(F.when(F.col("v").isNull(), 1)),
        F.sum("d"),
    ).first()
    assert tuple(got) == tuple(exp)


def test_schema_mismatch_across_files_fails(spark, tmp_path):
    d = tmp_path / "mix"
    d.mkdir()
    write_avro_file(
        str(d / "a.avro"),
        {"type": "record", "name": "r",
         "fields": [{"name": "k", "type": "long"}]},
        [{"k": 1}],
    )
    write_avro_file(
        str(d / "b.avro"),
        {"type": "record", "name": "r",
         "fields": [{"name": "k", "type": "string"}]},
        [{"k": "x"}],
    )
    with pytest.raises(Exception, match="schema mismatch"):
        read_avro(spark, str(d)).collect()


def _kv(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("v")
    )


def test_iceberg_snapshots_and_time_travel(spark, tmp_path):
    t = str(tmp_path / "ice")
    s1 = write_iceberg(spark, t, _kv(spark, 0, 50))
    s2 = write_iceberg(spark, t, _kv(spark, 50, 80))
    assert [s["snapshot-id"] for s in iceberg_snapshots(t)] == [s1, s2]
    assert read_iceberg(spark, t).count() == 80
    assert read_iceberg(spark, t, snapshot_id=s1).count() == 50
    assert (
        read_iceberg(spark, t).agg(F.sum("k")).first()[0]
        == sum(range(80))
    )


def test_iceberg_version_hint_fallback(spark, tmp_path):
    t = str(tmp_path / "ice2")
    write_iceberg(spark, t, _kv(spark, 0, 10))
    write_iceberg(spark, t, _kv(spark, 10, 25))
    os.unlink(os.path.join(t, "metadata", "version-hint.text"))
    assert read_iceberg(spark, t).count() == 25  # max-vN fallback


def test_iceberg_unknown_snapshot_raises(spark, tmp_path):
    t = str(tmp_path / "ice3")
    write_iceberg(spark, t, _kv(spark, 0, 5))
    with pytest.raises(ValueError, match="unknown snapshot"):
        read_iceberg(spark, t, snapshot_id=999).collect()


def test_distributed_roundtrip_exact_large_longs_and_nan(spark, tmp_path):
    """The review-r15 precision trap: a nullable long column holding a
    value >= 2^53 next to a NULL must round-trip EXACTLY (the old
    pandas path coerced to float64 and silently rounded it), and a
    genuine NaN double must stay NaN — distinct from NULL."""
    d = str(tmp_path / "big")
    big = 9_007_199_254_740_993  # 2^53 + 1: not float64-representable
    df = spark.createDataFrame(
        [(1, big, 1.5), (2, None, float("nan")), (3, 7, None)],
        "k long, v long, d double",
    )
    write_avro_dataset(spark, df.repartition(2), d)
    back = read_avro(spark, d)
    rows = {r["k"]: r for r in back.collect()}
    assert rows[1]["v"] == big  # exact, not 9007199254740992
    assert rows[2]["v"] is None and rows[3]["v"] == 7
    assert rows[1]["d"] == 1.5
    d2 = rows[2]["d"]
    assert d2 is not None and d2 != d2  # NaN survived as NaN
    assert rows[3]["d"] is None  # NULL stayed NULL


# ---------------------------------------------------------------------------
# r16: adversarial foreign-shaped fixtures (VERDICT r15 item 2) and
# the promoted v2 writer's invariants (item 5)
# ---------------------------------------------------------------------------


def test_record_bytes_colliding_with_sync_marker(tmp_path):
    """OCF readers must never SCAN for the sync marker — blocks are
    length-prefixed. A record whose bytes embed the exact marker is
    the classic foreign-writer trap."""
    from jobminer_spark.sources.avro import SYNC

    schema = {
        "type": "record",
        "name": "r",
        "fields": [{"name": "raw", "type": "bytes"}],
    }
    recs = [
        {"raw": SYNC},                     # the marker itself
        {"raw": SYNC * 3},                 # repeated
        {"raw": b"\x01" + SYNC + b"\x02"}, # embedded mid-record
    ]
    p = str(tmp_path / "sync.avro")
    # null codec so the marker bytes hit the stream VERBATIM
    write_avro_file(p, schema, recs, codec="null", block_records=1)
    _, got = read_avro_records(p)
    assert [r["raw"] for r in got] == [r["raw"] for r in recs]


def test_block_boundary_edge_cases(tmp_path):
    """Foreign writers emit odd block shapes: 1-record blocks, a big
    final block, empty-bytes records at block edges."""
    schema = {
        "type": "record",
        "name": "r",
        "fields": [
            {"name": "k", "type": "long"},
            {"name": "raw", "type": "bytes"},
        ],
    }
    recs = [{"k": i, "raw": b"" if i % 7 == 0 else bytes([i % 256]) * i}
            for i in range(257)]
    for block in (1, 2, 255, 256, 10_000):
        p = str(tmp_path / f"b{block}.avro")
        write_avro_file(p, schema, recs, codec="deflate",
                        block_records=block)
        _, got = read_avro_records(p)
        assert got == recs, f"block_records={block}"


def test_corrupt_sync_marker_fails_loudly(tmp_path):
    """A flipped byte in an inter-block sync marker must be a loud
    error, not silent truncation."""
    schema = {
        "type": "record",
        "name": "r",
        "fields": [{"name": "k", "type": "long"}],
    }
    p = str(tmp_path / "corrupt.avro")
    write_avro_file(p, schema, [{"k": i} for i in range(10)],
                    codec="null", block_records=5)
    blob = bytearray(open(p, "rb").read())
    blob[-1] ^= 0xFF  # last byte of the final sync marker
    open(p, "wb").write(bytes(blob))
    with pytest.raises(ValueError, match="sync marker"):
        read_avro_records(p)


def test_header_metadata_larger_than_1mib(spark, tmp_path):
    """File-metadata maps can exceed 1 MiB (fat schemas, writer
    stats); the header must be parsed incrementally off the handle,
    not from a capped head slice (ADVICE r15)."""
    from jobminer_spark.sources.avro import MAGIC, SYNC, _encode

    schema = {
        "type": "record",
        "name": "r",
        "fields": [{"name": "k", "type": "long"}],
    }
    out = io.BytesIO()
    out.write(MAGIC)
    meta = {
        "avro.schema": json.dumps(schema).encode(),
        "avro.codec": b"null",
        "big.blob": b"Z" * (2 << 20),  # 2 MiB of foreign metadata
    }
    _write_long(out, len(meta))
    for k, v in meta.items():
        _write_bytes(out, k.encode())
        _write_bytes(out, v)
    _write_long(out, 0)
    out.write(SYNC)
    body = io.BytesIO()
    for i in range(4):
        _encode(schema, {"k": i}, body)
    _write_long(out, 4)
    _write_long(out, len(body.getvalue()))
    out.write(body.getvalue())
    out.write(SYNC)
    p = str(tmp_path / "fatheader.avro")
    open(p, "wb").write(out.getvalue())
    _, got = read_avro_records(p)
    assert [r["k"] for r in got] == [0, 1, 2, 3]
    # the distributed path probes the same header driver-side
    df = read_avro(spark, p)
    assert sorted(r["k"] for r in df.collect()) == [0, 1, 2, 3]


def test_iceberg_manifest_list_with_multiple_manifests(spark, tmp_path):
    """A snapshot whose manifest list carries SEVERAL manifests (plus
    unknown extra fields) must union all their live files and skip
    DELETED entries in any of them."""
    import pyarrow.parquet as papq

    from jobminer_spark.sources.avro import write_avro_file as _waf

    t = str(tmp_path / "multimanifest")
    md = os.path.join(t, "metadata")
    data = os.path.join(t, "data")
    os.makedirs(md)
    os.makedirs(data)
    import pyarrow as pa

    for i, ks in enumerate(([1, 2], [3], [4, 5])):
        papq.write_table(
            pa.table({"k": pa.array(ks, pa.int64())}),
            os.path.join(data, f"f{i}.parquet"),
        )
    entry_schema = {
        "type": "record",
        "name": "manifest_entry",
        "fields": [
            {"name": "status", "type": "int"},
            {"name": "snapshot_id", "type": ["null", "long"]},
            {"name": "data_file", "type": {
                "type": "record", "name": "data_file",
                "fields": [
                    {"name": "file_path", "type": "string"},
                    {"name": "file_format", "type": "string"},
                    {"name": "record_count", "type": "long"},
                    {"name": "file_size_in_bytes", "type": "long"},
                    # foreign extra field: must pass through unused
                    {"name": "sort_order_id", "type": ["null", "int"]},
                ],
            }},
        ],
    }

    def _entry(path, n, status=1):
        return {
            "status": status,
            "snapshot_id": 7,
            "data_file": {
                "file_path": path,
                "file_format": "PARQUET",
                "record_count": n,
                "file_size_in_bytes": os.path.getsize(path),
                "sort_order_id": None,
            },
        }

    m1 = os.path.join(md, "m1.avro")
    m2 = os.path.join(md, "m2.avro")
    _waf(m1, entry_schema, [
        _entry(os.path.join(data, "f0.parquet"), 2),
        _entry(os.path.join(data, "f1.parquet"), 1, status=2),  # DELETED
    ])
    _waf(m2, entry_schema, [_entry(os.path.join(data, "f2.parquet"), 2)])
    list_schema = {
        "type": "record",
        "name": "manifest_file",
        "fields": [
            {"name": "manifest_path", "type": "string"},
            {"name": "manifest_length", "type": "long"},
            {"name": "partition_spec_id", "type": "int"},
            {"name": "added_snapshot_id", "type": ["null", "long"]},
            # foreign extra field
            {"name": "key_metadata", "type": ["null", "bytes"]},
        ],
    }
    snap_list = os.path.join(md, "snap-7.avro")
    _waf(snap_list, list_schema, [
        {"manifest_path": m, "manifest_length": os.path.getsize(m),
         "partition_spec_id": 0, "added_snapshot_id": 7,
         "key_metadata": None}
        for m in (m1, m2)
    ])
    meta = {
        "format-version": 2,
        "table-uuid": "0000",
        "location": t,
        "last-sequence-number": 1,
        "last-updated-ms": 0,
        "last-column-id": 1,
        "schemas": [{"type": "struct", "schema-id": 0, "fields": [
            {"id": 1, "name": "k", "required": False, "type": "long"},
        ]}],
        "current-schema-id": 0,
        "current-snapshot-id": 7,
        "snapshots": [{"snapshot-id": 7, "sequence-number": 1,
                       "timestamp-ms": 0, "manifest-list": snap_list,
                       "summary": {"operation": "append"}}],
    }
    with open(os.path.join(md, "v1.metadata.json"), "w") as f:
        json.dump(meta, f)
    with open(os.path.join(md, "version-hint.text"), "w") as f:
        f.write("1")
    got = read_iceberg(spark, t)
    # f1 is DELETED: only f0 + f2 rows survive
    assert sorted(r["k"] for r in got.collect()) == [1, 2, 4, 5]


def test_iceberg_v2_writer_sequence_and_stats_invariants(spark, tmp_path):
    """The promoted append path must emit spec-v2 bookkeeping: monotone
    snapshot sequence numbers mirrored in last-sequence-number, and
    manifest-list stats that match the files/rows actually written."""
    from jobminer_spark.sources.avro import read_avro_records as _rar
    from jobminer_spark.sources.iceberg import iceberg_metadata

    t = str(tmp_path / "v2inv")
    df1 = spark.range(0, 7).select(F.col("id").alias("k"))
    df2 = spark.range(7, 10).select(F.col("id").alias("k"))
    s1 = write_iceberg(spark, t, df1)
    s2 = write_iceberg(spark, t, df2)
    meta = iceberg_metadata(t)
    assert meta["format-version"] == 2
    snaps = {s["snapshot-id"]: s for s in meta["snapshots"]}
    assert snaps[s1]["sequence-number"] < snaps[s2]["sequence-number"]
    assert meta["last-sequence-number"] == snaps[s2]["sequence-number"]
    # current list: one manifest per commit, stats match reality
    cur = snaps[meta["current-snapshot-id"]]
    _, manifests = _rar(cur["manifest-list"])
    assert len(manifests) == 2
    by_snap = {m["added_snapshot_id"]: m for m in manifests}
    assert by_snap[s1]["added_rows_count"] == 7
    assert by_snap[s2]["added_rows_count"] == 3
    for m in manifests:
        assert m["content"] == 0
        assert m["min_sequence_number"] <= m["sequence_number"]
        assert m["deleted_files_count"] == 0
        _, entries = _rar(m["manifest_path"])
        assert m["added_files_count"] == len(entries)
        assert m["added_rows_count"] == sum(
            e["data_file"]["record_count"] for e in entries
        )
        for e in entries:
            # null sequence numbers: inherited from the snapshot
            assert e["sequence_number"] is None
            assert e["data_file"]["content"] == 0
    # schemas-list metadata (v2): the reader resolves it
    assert sorted(r["k"] for r in read_iceberg(spark, t).collect()) == list(
        range(10)
    )
    assert read_iceberg(spark, t, snapshot_id=s1).count() == 7


def test_iceberg_v1_table_upgrades_on_append(spark, tmp_path):
    """Appending to a table created by the earlier v1 writer must
    upgrade its metadata legally (schemas list + sequence numbers) and
    keep every snapshot readable."""
    import shutil

    t = str(tmp_path / "v1up")
    df1 = spark.range(0, 4).select(F.col("id").alias("k"))
    s1 = write_iceberg(spark, t, df1)
    # rewrite current metadata into the OLD v1 shape
    from jobminer_spark.sources.iceberg import (
        _current_metadata_path,
        iceberg_metadata,
    )

    meta = iceberg_metadata(t)
    sid = meta["current-schema-id"]
    schema = next(
        s for s in meta["schemas"] if s["schema-id"] == sid
    )
    v1_meta = {
        "format-version": 1,
        "table-uuid": meta["table-uuid"],
        "location": meta["location"],
        "last-updated-ms": 0,
        "last-column-id": meta["last-column-id"],
        "schema": {
            "type": "struct",
            "fields": schema["fields"],
        },
        "partition-spec": [],
        "properties": {},
        "current-snapshot-id": meta["current-snapshot-id"],
        "snapshots": [
            {k: v for k, v in s.items() if k != "sequence-number"}
            for s in meta["snapshots"]
        ],
    }
    with open(_current_metadata_path(t), "w") as f:
        json.dump(v1_meta, f)
    # ...and its manifest LIST back to the v1 writer's schema (no
    # content/sequence/stats fields), so the upgrade's defaulting
    # path is actually exercised
    from jobminer_spark.sources.avro import read_avro_records as _rar0

    cur1 = next(
        s for s in v1_meta["snapshots"]
        if s["snapshot-id"] == v1_meta["current-snapshot-id"]
    )
    _, v2_mans = _rar0(cur1["manifest-list"])
    v1_list_schema = {
        "type": "record",
        "name": "manifest_file",
        "fields": [
            {"name": "manifest_path", "type": "string"},
            {"name": "manifest_length", "type": "long"},
            {"name": "partition_spec_id", "type": "int"},
            {"name": "added_snapshot_id", "type": ["null", "long"]},
        ],
    }
    write_avro_file(cur1["manifest-list"], v1_list_schema, [
        {"manifest_path": m["manifest_path"],
         "manifest_length": m["manifest_length"],
         "partition_spec_id": 0,
         "added_snapshot_id": m["added_snapshot_id"]}
        for m in v2_mans
    ])
    df2 = spark.range(4, 6).select(F.col("id").alias("k"))
    s2 = write_iceberg(spark, t, df2)
    meta2 = iceberg_metadata(t)
    assert meta2["format-version"] == 2
    assert "schemas" in meta2 and "schema" not in meta2
    # the upgrade must emit the FULL v2 required set and retire the
    # v1-only partition-spec key (review r16)
    assert "partition-spec" not in meta2
    assert meta2["partition-specs"] == [{"spec-id": 0, "fields": []}]
    assert meta2["default-spec-id"] == 0
    assert meta2["sort-orders"] == [{"order-id": 0, "fields": []}]
    assert meta2["default-sort-order-id"] == 0
    assert "last-partition-id" in meta2
    # pre-upgrade snapshots get sequence number 0 (the spec's
    # assignment for pre-v2 history); the new snapshot gets the live one
    seqs = {s["snapshot-id"]: s["sequence-number"] for s in meta2["snapshots"]}
    assert seqs[s1] == 0 and seqs[s2] > 0
    # re-referenced pre-upgrade manifests carry data sequence number 0
    from jobminer_spark.sources.avro import read_avro_records as _rar2

    cur2 = next(
        s for s in meta2["snapshots"]
        if s["snapshot-id"] == meta2["current-snapshot-id"]
    )
    _, mans = _rar2(cur2["manifest-list"])
    man_seqs = {m["added_snapshot_id"]: m["sequence_number"] for m in mans}
    assert man_seqs.get(s1, 0) == 0 and man_seqs[s2] > 0
    assert meta2["last-sequence-number"] == next(
        s["sequence-number"]
        for s in meta2["snapshots"]
        if s["snapshot-id"] == s2
    )
    assert sorted(r["k"] for r in read_iceberg(spark, t).collect()) == list(
        range(6)
    )
    assert read_iceberg(spark, t, snapshot_id=s1).count() == 4


def test_iceberg_position_deletes_roundtrip(spark, tmp_path):
    """Format-v2 position deletes: commit a delete snapshot via
    write_iceberg_deletes and the read must drop exactly the marked
    (file, pos) rows — while time travel to the pre-delete snapshot
    still sees everything (delete files are snapshot-scoped, not
    destructive)."""
    from jobminer_spark.sources.iceberg import (
        iceberg_live_files,
        write_iceberg_deletes,
    )

    t = str(tmp_path / "posdel")
    write_iceberg(
        spark, t, spark.range(0, 50).select(F.col("id").alias("k"))
    )
    s2 = write_iceberg(
        spark, t, spark.range(50, 80).select(F.col("id").alias("k"))
    )
    scan = spark.read.parquet(*iceberg_live_files(t)).select(
        F.regexp_replace(
            F.col("_metadata.file_path"), "^file:/+", "/"
        ).alias("file_path"),
        F.col("_metadata.row_index").alias("pos"),
        "k",
    )
    write_iceberg_deletes(
        spark, t, scan.filter(F.col("k") % 7 == 0).select("file_path", "pos")
    )
    expect = [k for k in range(80) if k % 7 != 0]
    assert sorted(r["k"] for r in read_iceberg(spark, t).collect()) == expect
    assert read_iceberg(spark, t, snapshot_id=s2).count() == 80


def test_iceberg_position_delete_sequence_rule(spark, tmp_path):
    """A position delete applies only to data files at or before its
    sequence number: rows appended AFTER the delete snapshot must
    survive even if a stale delete names their (future) file path —
    here the post-delete append reuses no path, so the direct check is
    that new rows are untouched by the earlier delete."""
    from jobminer_spark.sources.iceberg import (
        iceberg_live_files,
        write_iceberg_deletes,
    )

    t = str(tmp_path / "seqrule")
    write_iceberg(
        spark, t, spark.range(0, 10).select(F.col("id").alias("k"))
    )
    scan = spark.read.parquet(*iceberg_live_files(t)).select(
        F.regexp_replace(
            F.col("_metadata.file_path"), "^file:/+", "/"
        ).alias("file_path"),
        F.col("_metadata.row_index").alias("pos"),
        "k",
    )
    write_iceberg_deletes(
        spark, t, scan.filter(F.col("k") < 3).select("file_path", "pos")
    )
    write_iceberg(
        spark, t, spark.range(10, 15).select(F.col("id").alias("k"))
    )
    assert sorted(r["k"] for r in read_iceberg(spark, t).collect()) == list(
        range(3, 15)
    )


def test_iceberg_equality_delete_without_ids_rejected(spark, tmp_path):
    """A content=2 entry MISSING its equality_ids cannot be applied —
    the read must fail loudly, never return resurrected rows."""
    import pytest as _pytest

    from jobminer_spark.sources.avro import (
        read_avro_records as _rar,
        write_avro_file as _waf,
    )
    from jobminer_spark.sources.iceberg import (
        _MANIFEST_LIST_SCHEMA,
        _MANIFEST_SCHEMA,
        iceberg_metadata,
    )

    t = str(tmp_path / "eqdel")
    write_iceberg(
        spark, t, spark.range(0, 5).select(F.col("id").alias("k"))
    )
    md = os.path.join(t, "metadata")
    # craft an equality-delete manifest and splice it into a new list
    eq_manifest = os.path.join(md, "manifest-eqdel.avro")
    _waf(eq_manifest, _MANIFEST_SCHEMA, [{
        "status": 1, "snapshot_id": None, "sequence_number": None,
        "file_sequence_number": None,
        "data_file": {"content": 2, "file_path": "/nope.parquet",
                      "file_format": "PARQUET", "record_count": 1,
                      "file_size_in_bytes": 1},
    }])
    meta = iceberg_metadata(t)
    cur = next(s for s in meta["snapshots"]
               if s["snapshot-id"] == meta["current-snapshot-id"])
    _, records = _rar(cur["manifest-list"])
    records.append({
        "manifest_path": eq_manifest,
        "manifest_length": os.path.getsize(eq_manifest),
        "partition_spec_id": 0, "content": 1, "sequence_number": 2,
        "min_sequence_number": 2, "added_snapshot_id": 2,
        "added_files_count": 1, "existing_files_count": 0,
        "deleted_files_count": 0, "added_rows_count": 1,
        "existing_rows_count": 0, "deleted_rows_count": 0,
    })
    new_list = os.path.join(md, "snap-2-eqdel.avro")
    _waf(new_list, _MANIFEST_LIST_SCHEMA, records)
    meta["snapshots"].append({
        "snapshot-id": 2, "sequence-number": 2, "timestamp-ms": 0,
        "manifest-list": new_list, "summary": {"operation": "delete"},
    })
    meta["current-snapshot-id"] = 2
    with open(os.path.join(md, "v9.metadata.json"), "w") as f:
        json.dump(meta, f)
    with open(os.path.join(md, "version-hint.text"), "w") as f:
        f.write("9")
    with _pytest.raises(ValueError, match="equality_ids"):
        read_iceberg(spark, t).collect()


def test_iceberg_expire_snapshots(spark, tmp_path):
    """Expiration keeps the last-N snapshots, physically deletes files
    only the expired ones referenced, keeps every byte the retained
    snapshots need, and makes expired ids unknown to time travel."""
    from jobminer_spark.sources.iceberg import expire_iceberg_snapshots

    t = str(tmp_path / "expire")
    s1 = write_iceberg(spark, t, spark.range(0, 5).select(F.col("id").alias("k")))
    s2 = write_iceberg(spark, t, spark.range(5, 9).select(F.col("id").alias("k")))
    s3 = write_iceberg(spark, t, spark.range(9, 12).select(F.col("id").alias("k")))
    # dry run deletes nothing
    dead_preview, n = expire_iceberg_snapshots(t, keep_last=1, dry_run=True)
    assert n == 2 and all(os.path.exists(p) for p in dead_preview)
    dead, n = expire_iceberg_snapshots(t, keep_last=1)
    assert n == 2 and dead == dead_preview
    assert all(not os.path.exists(p) for p in dead)
    # the retained (current) snapshot still reads completely: every
    # data file is shared forward, so counts are intact
    assert read_iceberg(spark, t).count() == 12
    # expired ids are gone from the chain
    with pytest.raises(ValueError, match="unknown snapshot-id"):
        read_iceberg(spark, t, snapshot_id=s1).collect()
    # no-op below the threshold
    assert expire_iceberg_snapshots(t, keep_last=5) == ([], 0)
    # refusing to expire the current snapshot is impossible by
    # construction (keep_last >= 1 retains the newest)
    with pytest.raises(ValueError, match="keep_last"):
        expire_iceberg_snapshots(t, keep_last=0)


def test_iceberg_equality_deletes_roundtrip(spark, tmp_path):
    """Equality deletes: rows matching the delete relation's equality
    columns vanish from EARLIER snapshots (strict sequence rule — a
    post-delete append survives even where it matches), nulls match
    null-safely, and they compose with position deletes."""
    from jobminer_spark.sources.iceberg import (
        write_iceberg_equality_deletes,
    )

    t = str(tmp_path / "eqdel2")
    df = spark.createDataFrame(
        [(0, "a"), (1, "b"), (2, None), (3, "a"), (4, "c")],
        "k long, g string",
    )
    write_iceberg(spark, t, df)
    # delete g='a' and g IS NULL from existing data
    dels = spark.createDataFrame([("a",), (None,)], "g string")
    write_iceberg_equality_deletes(spark, t, dels)
    assert sorted(r.k for r in read_iceberg(spark, t).collect()) == [1, 4]
    # strict rule: a NEW row with g='a' survives the OLD delete
    write_iceberg(
        spark, t, spark.createDataFrame([(9, "a")], "k long, g string")
    )
    assert sorted(r.k for r in read_iceberg(spark, t).collect()) == [
        1, 4, 9,
    ]
    # unknown equality column refused
    import pytest as _pytest

    with _pytest.raises(ValueError, match="not table columns"):
        write_iceberg_equality_deletes(
            spark, t, spark.createDataFrame([(1,)], "zzz long")
        )


def test_iceberg_empty_table_reads_empty(spark, tmp_path):
    """A foreign table with metadata but NO snapshots yet (CREATE
    TABLE before first insert) must read as an empty DataFrame, not
    crash (review r16 — the 3-way _snapshot_files split missed the
    early return)."""
    t = str(tmp_path / "empty")
    md = os.path.join(t, "metadata")
    os.makedirs(md)
    meta = {
        "format-version": 2, "table-uuid": "u", "location": t,
        "last-updated-ms": 0, "last-column-id": 1,
        "schemas": [{"type": "struct", "schema-id": 0, "fields": [
            {"id": 1, "name": "k", "required": False, "type": "long"}]}],
        "current-schema-id": 0,
        "partition-specs": [{"spec-id": 0, "fields": []}],
        "default-spec-id": 0, "last-partition-id": 999,
        "sort-orders": [{"order-id": 0, "fields": []}],
        "default-sort-order-id": 0, "properties": {}, "snapshots": [],
    }
    with open(os.path.join(md, "v1.metadata.json"), "w") as f:
        json.dump(meta, f)
    with open(os.path.join(md, "version-hint.text"), "w") as f:
        f.write("1")
    df = read_iceberg(spark, t)
    assert df.columns == ["k"] and df.count() == 0

    pos_t = str(tmp_path / "space dir" / "ice")
    os.makedirs(os.path.dirname(pos_t), exist_ok=True)
    from jobminer_spark.sources.iceberg import (
        iceberg_live_files,
        write_iceberg_deletes,
    )

    write_iceberg(
        spark, pos_t, spark.range(0, 8).select(F.col("id").alias("k"))
    )
    scan = spark.read.parquet(*iceberg_live_files(pos_t)).select(
        F.expr(
            "coalesce(try_url_decode(regexp_replace("
            "_metadata.file_path, '^file:/+', '/')), "
            "regexp_replace(_metadata.file_path, '^file:/+', '/'))"
        ).alias("file_path"),
        F.col("_metadata.row_index").alias("pos"),
        "k",
    )
    write_iceberg_deletes(
        spark, pos_t, scan.filter("k < 3").select("file_path", "pos")
    )
    assert sorted(r.k for r in read_iceberg(spark, pos_t).collect()) == [
        3, 4, 5, 6, 7,
    ]


def test_iceberg_position_delete_on_plus_path(spark, tmp_path):
    """try_url_decode is form-urlencoded decoding: a literal '+' in
    the table path must NOT become a space on the Spark side of the
    delete anti-join (ADVICE r16 — it silently skipped every
    position/equality delete on such tables)."""
    from jobminer_spark.sources.iceberg import (
        iceberg_live_files,
        write_iceberg_deletes,
    )

    t = str(tmp_path / "p+q" / "t")
    os.makedirs(os.path.dirname(t), exist_ok=True)
    write_iceberg(
        spark, t, spark.range(0, 30).select(F.col("id").alias("k"))
    )
    scan = spark.read.parquet(*iceberg_live_files(t)).select(
        F.regexp_replace(
            F.col("_metadata.file_path"), "^file:/+", "/"
        ).alias("file_path"),
        F.col("_metadata.row_index").alias("pos"),
        "k",
    )
    write_iceberg_deletes(
        spark, t,
        scan.filter(F.col("k") % 3 == 0).select("file_path", "pos"),
    )
    assert sorted(r.k for r in read_iceberg(spark, t).collect()) == [
        k for k in range(30) if k % 3 != 0
    ]


def test_iceberg_null_content_classified_by_manifest(spark, tmp_path):
    """Many writers' manifest schemas make data_file.content a
    nullable union; an explicit Avro null must fall back to the
    manifest-LIST record's content — a null inside a content=1
    manifest is a DELETE file, not data (ADVICE r16: coercing it to 0
    resurrected the deleted rows AND scanned the delete rows as
    data)."""
    import copy

    from jobminer_spark.sources.avro import (
        read_avro_records as _rar,
        write_avro_file as _waf,
    )
    from jobminer_spark.sources.iceberg import (
        _MANIFEST_LIST_SCHEMA,
        _MANIFEST_SCHEMA,
        iceberg_live_files,
        iceberg_metadata,
        write_iceberg_deletes,
    )

    t = str(tmp_path / "nullcontent")
    write_iceberg(
        spark, t, spark.range(0, 20).select(F.col("id").alias("k"))
    )
    scan = spark.read.parquet(*iceberg_live_files(t)).select(
        F.regexp_replace(
            F.col("_metadata.file_path"), "^file:/+", "/"
        ).alias("file_path"),
        F.col("_metadata.row_index").alias("pos"),
        "k",
    )
    write_iceberg_deletes(
        spark, t, scan.filter(F.col("k") < 5).select("file_path", "pos")
    )
    assert read_iceberg(spark, t).count() == 15
    # rewrite the delete manifest foreign-shaped: content is a
    # nullable union carrying an explicit null
    meta = iceberg_metadata(t)
    cur = next(
        s for s in meta["snapshots"]
        if s["snapshot-id"] == meta["current-snapshot-id"]
    )
    _, mlist = _rar(cur["manifest-list"])
    dm = next(m for m in mlist if m["content"] == 1)
    _, entries = _rar(dm["manifest_path"])
    nullable = copy.deepcopy(_MANIFEST_SCHEMA)
    df_field = next(
        f for f in nullable["fields"] if f["name"] == "data_file"
    )
    cfield = next(
        f for f in df_field["type"]["fields"] if f["name"] == "content"
    )
    cfield["type"] = ["null", "int"]
    for e in entries:
        e["data_file"]["content"] = None
    _waf(dm["manifest_path"], nullable, entries)
    dm["manifest_length"] = os.path.getsize(dm["manifest_path"])
    _waf(cur["manifest-list"], _MANIFEST_LIST_SCHEMA, mlist)
    assert sorted(r.k for r in read_iceberg(spark, t).collect()) == list(
        range(5, 20)
    )


def _ib_meta_v2(t, schema_fields, spec_fields, snap_list, last_col):
    return {
        "format-version": 2,
        "table-uuid": "0000",
        "location": t,
        "last-sequence-number": 1,
        "last-updated-ms": 0,
        "last-column-id": last_col,
        "schemas": [{"type": "struct", "schema-id": 0,
                     "fields": schema_fields}],
        "current-schema-id": 0,
        "partition-specs": [{"spec-id": 0, "fields": spec_fields}],
        "default-spec-id": 0,
        "last-partition-id": 1001,
        "current-snapshot-id": 7,
        "snapshots": [{"snapshot-id": 7, "sequence-number": 1,
                       "timestamp-ms": 0, "manifest-list": snap_list,
                       "summary": {"operation": "append"}}],
    }


def _ib_partitioned_entry_schema(part_fields):
    return {
        "type": "record", "name": "manifest_entry",
        "fields": [
            {"name": "status", "type": "int"},
            {"name": "snapshot_id", "type": ["null", "long"]},
            {"name": "data_file", "type": {
                "type": "record", "name": "data_file",
                "fields": [
                    {"name": "file_path", "type": "string"},
                    {"name": "file_format", "type": "string"},
                    {"name": "record_count", "type": "long"},
                    {"name": "file_size_in_bytes", "type": "long"},
                    {"name": "partition", "type": {
                        "type": "record", "name": "r102",
                        "fields": part_fields,
                    }},
                ],
            }},
        ],
    }


_IB_LIST_SCHEMA_MIN = {
    "type": "record", "name": "manifest_file",
    "fields": [
        {"name": "manifest_path", "type": "string"},
        {"name": "manifest_length", "type": "long"},
        {"name": "partition_spec_id", "type": "int"},
        {"name": "added_snapshot_id", "type": ["null", "long"]},
    ],
}


def test_iceberg_partition_transform_pruning(spark, tmp_path):
    """A foreign day(ts)+bucket[4](k) partitioned table: equality
    partition_filters project through the transforms (spec equality
    projection) and prune at the MANIFEST level — non-matching files
    never enter the plan (inputFiles pinned) — while the unfiltered
    read still returns every row."""
    import pyarrow as pa
    import pyarrow.parquet as papq

    from jobminer_spark.sources.avro import write_avro_file as _waf
    from jobminer_spark.sources.iceberg import (
        transform_partition_value as tpv,
    )

    # projection pinned against the spec's published murmur3 vector
    # (hash(34) = 2017239379 -> bucket[4] = 3), so fixture and filter
    # sharing tpv cannot both be wrong the same way
    assert tpv("bucket[4]", "long", 34) == 3

    t = str(tmp_path / "transforms")
    md, data = os.path.join(t, "metadata"), os.path.join(t, "data")
    os.makedirs(md)
    os.makedirs(data)
    us_day = 86_400_000_000
    rows = []
    for day in (19000, 19001):
        for k in range(8):
            rows.append((k, day * us_day + k * 3_600_000_000,
                         k * 100 + (day - 19000)))
    groups = {}
    for k, ts, v in rows:
        key = (tpv("day", "timestamp", ts), tpv("bucket[4]", "long", k))
        groups.setdefault(key, []).append((k, ts, v))
    entries = []
    for i, ((dday, bkt), grp) in enumerate(sorted(groups.items())):
        p = os.path.join(data, f"f{i}.parquet")
        papq.write_table(
            pa.table({
                "k": pa.array([g[0] for g in grp], pa.int64()),
                "ts": pa.array([g[1] for g in grp],
                               pa.timestamp("us")),
                "v": pa.array([g[2] for g in grp], pa.int64()),
            }),
            p,
        )
        entries.append({
            "status": 1, "snapshot_id": 7,
            "data_file": {
                "file_path": p, "file_format": "PARQUET",
                "record_count": len(grp),
                "file_size_in_bytes": os.path.getsize(p),
                "partition": {"ts_day": dday, "k_bucket": bkt},
            },
        })
    m1 = os.path.join(md, "m1.avro")
    _waf(m1, _ib_partitioned_entry_schema([
        {"name": "ts_day", "type": "int"},
        {"name": "k_bucket", "type": "int"},
    ]), entries)
    snap_list = os.path.join(md, "snap-7.avro")
    _waf(snap_list, _IB_LIST_SCHEMA_MIN, [
        {"manifest_path": m1, "manifest_length": os.path.getsize(m1),
         "partition_spec_id": 0, "added_snapshot_id": 7},
    ])
    meta = _ib_meta_v2(
        t,
        [{"id": 1, "name": "k", "required": False, "type": "long"},
         {"id": 2, "name": "ts", "required": False, "type": "timestamp"},
         {"id": 3, "name": "v", "required": False, "type": "long"}],
        [{"name": "ts_day", "transform": "day", "source-id": 2,
          "field-id": 1000},
         {"name": "k_bucket", "transform": "bucket[4]", "source-id": 1,
          "field-id": 1001}],
        snap_list, 3,
    )
    with open(os.path.join(md, "v1.metadata.json"), "w") as f:
        json.dump(meta, f)
    with open(os.path.join(md, "version-hint.text"), "w") as f:
        f.write("1")

    full = read_iceberg(spark, t)
    assert full.count() == len(rows)
    # filter: day of a mid-day-19001 timestamp + k=5
    want_key = (19001, tpv("bucket[4]", "long", 5))
    pruned = read_iceberg(
        spark, t,
        partition_filters={"ts": 19001 * us_day + 7_200_000_000, "k": 5},
    )
    assert len(pruned.inputFiles()) == 1  # one matching (day, bucket)
    got = pruned.collect()
    expect_ks = [
        k for k, ts, _ in rows
        if (tpv("day", "timestamp", ts),
            tpv("bucket[4]", "long", k)) == want_key
    ]
    assert sorted(r.k for r in got) == sorted(expect_ks)
    assert 5 in expect_ks  # the filtered row's file is the one kept
    # filter on day alone prunes to that day's bucket files
    day_only = read_iceberg(
        spark, t, partition_filters={"ts": "2022-01-09T12:00:00+00:00"}
    )
    n_day_files = sum(1 for (d, _b) in groups if d == 19001)
    assert len(day_only.inputFiles()) == n_day_files
    assert day_only.count() == 8
    with pytest.raises(ValueError, match="not partition"):
        read_iceberg(spark, t, partition_filters={"v": 1})
    with pytest.raises(ValueError, match="unknown column"):
        read_iceberg(spark, t, partition_filters={"nope": 1})


def test_iceberg_identity_restore_from_partition_tuple(spark, tmp_path):
    """v1 Hive-migrated shape: data files OMIT the identity partition
    column; the read restores it from the manifest's partition tuple
    (typed literal per file group), and files that DO carry the
    column keep their own values."""
    import pyarrow as pa
    import pyarrow.parquet as papq

    from jobminer_spark.sources.avro import write_avro_file as _waf

    t = str(tmp_path / "identrestore")
    md, data = os.path.join(t, "metadata"), os.path.join(t, "data")
    os.makedirs(md)
    os.makedirs(data)
    # f0/f1: migrated files WITHOUT the src column; f2 carries it
    papq.write_table(
        pa.table({"k": pa.array([1, 2], pa.int64())}),
        os.path.join(data, "f0.parquet"),
    )
    papq.write_table(
        pa.table({"k": pa.array([3], pa.int64())}),
        os.path.join(data, "f1.parquet"),
    )
    papq.write_table(
        pa.table({"k": pa.array([4], pa.int64()),
                  "src": pa.array(["z"], pa.string())}),
        os.path.join(data, "f2.parquet"),
    )
    entries = []
    for fname, n, srcval in (("f0", 2, "x"), ("f1", 1, "y"),
                             ("f2", 1, "z")):
        p = os.path.join(data, f"{fname}.parquet")
        entries.append({
            "status": 1, "snapshot_id": 7,
            "data_file": {
                "file_path": p, "file_format": "PARQUET",
                "record_count": n,
                "file_size_in_bytes": os.path.getsize(p),
                "partition": {"src": srcval},
            },
        })
    m1 = os.path.join(md, "m1.avro")
    _waf(m1, _ib_partitioned_entry_schema(
        [{"name": "src", "type": "string"}]), entries)
    snap_list = os.path.join(md, "snap-7.avro")
    _waf(snap_list, _IB_LIST_SCHEMA_MIN, [
        {"manifest_path": m1, "manifest_length": os.path.getsize(m1),
         "partition_spec_id": 0, "added_snapshot_id": 7},
    ])
    meta = _ib_meta_v2(
        t,
        [{"id": 1, "name": "k", "required": False, "type": "long"},
         {"id": 2, "name": "src", "required": False, "type": "string"}],
        [{"name": "src", "transform": "identity", "source-id": 2,
          "field-id": 1000}],
        snap_list, 2,
    )
    with open(os.path.join(md, "v1.metadata.json"), "w") as f:
        json.dump(meta, f)
    with open(os.path.join(md, "version-hint.text"), "w") as f:
        f.write("1")
    got = sorted((r.k, r.src) for r in read_iceberg(spark, t).collect())
    assert got == [(1, "x"), (2, "x"), (3, "y"), (4, "z")]
    # identity filters prune to the named partition
    pruned = read_iceberg(spark, t, partition_filters={"src": "x"})
    assert len(pruned.inputFiles()) == 1
    assert sorted(r.k for r in pruned.collect()) == [1, 2]


def test_iceberg_multi_spec_equality_deletes_one_snapshot(
    spark, tmp_path
):
    """TWO equality-column sets plus a NULL-valued delete row in ONE
    snapshot: delete files group per set, the null row matches null
    data null-safely, and the strict sequence rule still protects the
    post-delete append."""
    from jobminer_spark.sources.iceberg import (
        iceberg_snapshots,
        write_iceberg_equality_deletes,
    )

    t = str(tmp_path / "multispec")
    df = spark.range(0, 30).select(
        F.col("id").alias("k"),
        F.when(F.col("id") % 5 == 0, F.lit(None).cast("long"))
        .otherwise(F.col("id") % 7)
        .alias("b"),
    )
    write_iceberg(spark, t, df.filter(F.col("k") < 20))
    write_iceberg_equality_deletes(
        spark, t,
        [
            spark.createDataFrame([(3,), (None,)], "b long"),
            spark.createDataFrame([(7,), (8,)], "k long"),
        ],
    )
    write_iceberg(spark, t, df.filter(F.col("k") >= 20))  # post-delete
    assert len(iceberg_snapshots(t)) == 3  # both sets in ONE snapshot
    survivors = sorted(r.k for r in read_iceberg(spark, t).collect())
    expect = [
        k for k in range(30)
        if k >= 20
        or not (k % 5 == 0 or k % 7 == 3 or k in (7, 8))
    ]
    assert survivors == expect
    # null-matched rows really died (k%5==0 below 20 gone)
    assert 0 not in survivors and 10 not in survivors and 20 in survivors


def test_iceberg_write_partition_transforms_roundtrip(spark, tmp_path):
    """r17 write half: create a day(ts)+bucket[4](k) table through
    write_iceberg's partition_spec, append a second snapshot that
    INHERITS the spec, and verify (a) every table column stays in the
    data files (the spec's model — partition values are metadata),
    (b) manifest partition tuples drive read-side pruning, (c) a
    conflicting spec on append fails loudly."""
    import datetime as _dt

    import pyarrow.parquet as papq

    from jobminer_spark.sources.iceberg import (
        iceberg_live_files,
        transform_partition_value as tpv,
    )

    t = str(tmp_path / "wtransform")
    spec = [("ts_day", "day", "ts"), ("k_bucket", "bucket[4]", "k")]
    base = _dt.datetime(2023, 3, 1, 0, 0, 0)

    def _df(lo, hi):
        rows = [
            (k, base + _dt.timedelta(days=k % 3, hours=k % 5), k * 10)
            for k in range(lo, hi)
        ]
        return spark.createDataFrame(
            rows, "k long, ts timestamp_ntz, v long"
        )

    write_iceberg(spark, t, _df(0, 40), partition_spec=spec)
    write_iceberg(spark, t, _df(40, 60))  # inherits the table spec
    full = read_iceberg(spark, t)
    assert full.count() == 60
    # every data file keeps all three columns
    for p in iceberg_live_files(t):
        assert papq.read_schema(p).names == ["k", "ts", "v"]
    # pruning through BOTH transforms on our own layout
    d0 = (_dt.date(2023, 3, 1) - _dt.date(1970, 1, 1)).days
    day1 = read_iceberg(
        spark, t, partition_filters={"ts": "2023-03-02T00:00:00"}
    )
    expect_day1 = [k for k in range(60) if k % 3 == 1]
    assert sorted(r.k for r in day1.collect()) == expect_day1
    n_day1_buckets = len(
        {tpv("bucket[4]", "long", k) for k in expect_day1}
    )
    # two snapshots → up to 2 files per (day, bucket)
    assert len(day1.inputFiles()) <= 2 * n_day1_buckets
    assert len(day1.inputFiles()) < len(full.inputFiles())
    kdf = read_iceberg(
        spark, t,
        partition_filters={"ts": "2023-03-02T00:00:00", "k": 7},
    )
    assert 7 in [r.k for r in kdf.collect()]
    assert len(kdf.inputFiles()) <= 2
    # conflicting spec on append: loud
    with pytest.raises(ValueError, match="default spec"):
        write_iceberg(
            spark, t, _df(0, 1),
            partition_spec=[("ts_day", "day", "ts")],
        )


def test_iceberg_write_identity_partition_keeps_column(spark, tmp_path):
    """Identity partition writes keep the source column IN the data
    files (helper-column staging) while manifests carry the tuple for
    pruning — including a NULL partition value."""
    import pyarrow.parquet as papq

    from jobminer_spark.sources.iceberg import iceberg_live_files

    t = str(tmp_path / "wident")
    df = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "b"), (4, None)],
        "k long, src string",
    )
    write_iceberg(
        spark, t, df, partition_spec=[("src", "identity", "src")]
    )
    for p in iceberg_live_files(t):
        assert papq.read_schema(p).names == ["k", "src"]
    got = sorted(
        (r.k, r.src) for r in read_iceberg(spark, t).collect()
    )
    assert got == [(1, "a"), (2, "a"), (3, "b"), (4, None)]
    pruned = read_iceberg(spark, t, partition_filters={"src": "a"})
    assert len(pruned.inputFiles()) == 1
    assert sorted(r.k for r in pruned.collect()) == [1, 2]


def test_iceberg_write_identity_partition_float_source(
    spark, tmp_path
):
    """ADVICE r17: identity partitioning on a FLOAT source maps to
    Avro type "float"; the hive-directory value must parse back to a
    Python float (not fall through to a str, which corrupts the
    manifest's ["null","float"] union) — round-trip and prune."""
    t = str(tmp_path / "wident_float")
    df = spark.createDataFrame(
        [(1, 1.5), (2, 1.5), (3, 2.5)], "k long, fx float"
    )
    write_iceberg(
        spark, t, df, partition_spec=[("fx", "identity", "fx")]
    )
    got = sorted(
        (r.k, float(r.fx)) for r in read_iceberg(spark, t).collect()
    )
    assert got == [(1, 1.5), (2, 1.5), (3, 2.5)]
    pruned = read_iceberg(spark, t, partition_filters={"fx": 1.5})
    assert sorted(r.k for r in pruned.collect()) == [1, 2]


def test_iceberg_stats_skipping_bounds(spark, tmp_path):
    """r17 data skipping: write_iceberg stamps per-file lower/upper
    bounds (spec single-value binary serialization, numeric/temporal
    columns only) into the manifests, and stats_filters prune files
    at the manifest level — conservative for bounds-less files."""
    import datetime as _dt

    from jobminer_spark.sources.avro import read_avro_records as _rar
    from jobminer_spark.sources.iceberg import (
        _decode_bound,
        iceberg_metadata,
    )

    t = str(tmp_path / "statskip")
    base = _dt.datetime(2024, 5, 1)
    for lo in (0, 100, 200):
        rows = [
            (k, base + _dt.timedelta(hours=k), float(k) / 7.0)
            for k in range(lo, lo + 100)
        ]
        write_iceberg(
            spark,
            t,
            spark.createDataFrame(
                rows, "k long, ts timestamp_ntz, x double"
            ).coalesce(1),
        )
    full = read_iceberg(spark, t)
    assert full.count() == 300 and len(full.inputFiles()) == 3
    # manifest really carries decodable bounds
    meta = iceberg_metadata(t)
    cur = next(
        s for s in meta["snapshots"]
        if s["snapshot-id"] == meta["current-snapshot-id"]
    )
    _, mlist = _rar(cur["manifest-list"])
    found = []
    for m in mlist:
        _, entries = _rar(m["manifest_path"])
        for e in entries:
            lb = e["data_file"].get("lower_bounds")
            if lb:
                found.append(
                    {b["key"]: b["value"] for b in lb}
                )
    assert len(found) == 3
    ks = sorted(_decode_bound(f[1], "long") for f in found)
    assert ks == [0, 100, 200]
    # long-range filter prunes to one file
    pruned = read_iceberg(spark, t, stats_filters={"k": (150, 180)})
    assert len(pruned.inputFiles()) == 1
    assert pruned.where("k BETWEEN 150 AND 180").count() == 31
    # timestamp filter (string source-space value) prunes too
    tp = read_iceberg(
        spark, t,
        stats_filters={"ts": ("2024-05-01T00:00:00", "2024-05-02T00:00:00")},
    )
    assert len(tp.inputFiles()) == 1
    # double filter
    dp = read_iceberg(spark, t, stats_filters={"x": (None, 5.0)})
    assert len(dp.inputFiles()) == 1
    # open range keeps everything; unknown column is loud
    assert len(
        read_iceberg(
            spark, t, stats_filters={"k": (None, None)}
        ).inputFiles()
    ) == 3
    with pytest.raises(ValueError, match="unknown column"):
        read_iceberg(spark, t, stats_filters={"nope": (1, 2)})
    # deletes still apply on the pruned scan
    from jobminer_spark.sources.iceberg import (
        iceberg_live_files,
        write_iceberg_deletes,
    )

    scan = spark.read.parquet(*iceberg_live_files(t)).select(
        F.regexp_replace(
            F.col("_metadata.file_path"), "^file:/+", "/"
        ).alias("file_path"),
        F.col("_metadata.row_index").alias("pos"),
        "k",
    )
    write_iceberg_deletes(
        spark, t, scan.filter(F.col("k") == 160).select("file_path", "pos")
    )
    pruned2 = read_iceberg(spark, t, stats_filters={"k": (150, 180)})
    assert pruned2.where("k BETWEEN 150 AND 180").count() == 30


def test_iceberg_field_id_resolution_survives_rename(spark, tmp_path):
    """Schema evolution (r17): our writer stamps parquet field ids;
    after a metadata-level column RENAME (same field id), a
    resolve="field-id" read returns the old files' data under the new
    name — the spec's resolution rule — while a name-based read of
    the renamed column can only see nulls for pre-rename files."""
    import pyarrow.parquet as papq

    from jobminer_spark.sources.iceberg import (
        _current_metadata_path,
        iceberg_live_files,
    )

    t = str(tmp_path / "rename")
    write_iceberg(
        spark, t,
        spark.range(0, 10).select(
            F.col("id").alias("k"), (F.col("id") * 10).alias("v")
        ),
    )
    # files really carry ids
    sch = papq.read_schema(iceberg_live_files(t)[0])
    assert sch.field("k").metadata[b"PARQUET:field_id"] == b"1"
    # rename v -> val in the metadata (field id 2 unchanged)
    mp = _current_metadata_path(t)
    meta = json.load(open(mp))
    for f in meta["schemas"][0]["fields"]:
        if f["id"] == 2:
            f["name"] = "val"
    with open(mp, "w") as fh:
        json.dump(meta, fh)
    got = read_iceberg(spark, t, resolve="field-id")
    assert got.columns == ["k", "val"]
    assert sorted((r.k, r.val) for r in got.collect()) == [
        (i, i * 10) for i in range(10)
    ]
    # name-based read documents WHY the mode exists: pre-rename files
    # have no column named "val"
    by_name = read_iceberg(spark, t)
    assert all(r.val is None for r in by_name.collect())
    # post-rename appends coexist: new files carry id 2 under "val"
    write_iceberg(
        spark, t,
        spark.range(10, 12).select(
            F.col("id").alias("k"), (F.col("id") * 10).alias("val")
        ),
    )
    got2 = read_iceberg(spark, t, resolve="field-id")
    assert sorted((r.k, r.val) for r in got2.collect()) == [
        (i, i * 10) for i in range(12)
    ]


def test_iceberg_manifest_level_partition_summary_prune(
    spark, tmp_path
):
    """r17 manifest-level pruning: write_iceberg emits per-field
    partition summaries in the manifest-list records, and a filtered
    read skips non-matching DATA manifests without opening them — the
    skipped manifest is DELETED from disk here, so any attempt to
    open it would raise. Summaries survive re-referencing by later
    snapshots."""
    import datetime as _dt

    from jobminer_spark.sources.avro import read_avro_records as _rar
    from jobminer_spark.sources.iceberg import iceberg_metadata

    t = str(tmp_path / "msummary")
    spec = [("ts_day", "day", "ts")]

    def _day_df(day, lo, hi):
        base = _dt.datetime(2024, 7, day, 1, 0, 0)
        return spark.createDataFrame(
            [(k, base, k * 10) for k in range(lo, hi)],
            "k long, ts timestamp_ntz, v long",
        )

    write_iceberg(spark, t, _day_df(1, 0, 5), partition_spec=spec)
    write_iceberg(spark, t, _day_df(9, 5, 9))  # re-references m1
    meta = iceberg_metadata(t)
    cur = next(
        s for s in meta["snapshots"]
        if s["snapshot-id"] == meta["current-snapshot-id"]
    )
    _, mlist = _rar(cur["manifest-list"])
    assert all(m.get("partitions") for m in mlist)  # summaries present
    # delete the day-1 manifest: only a pruned read can succeed now
    day1 = (_dt.date(2024, 7, 1) - _dt.date(1970, 1, 1)).days
    from jobminer_spark.sources.iceberg import _decode_bound

    doomed = next(
        m for m in mlist
        if _decode_bound(m["partitions"][0]["lower_bound"], "int")
        == day1
    )
    os.unlink(doomed["manifest_path"])
    got = read_iceberg(
        spark, t, partition_filters={"ts": "2024-07-09T12:00:00"}
    )
    assert sorted(r.k for r in got.collect()) == [5, 6, 7, 8]
    with pytest.raises(FileNotFoundError):
        read_iceberg(spark, t).collect()


def test_iceberg_field_id_add_column_evolution(spark, tmp_path):
    """ADD-column evolution under field-id resolution: files written
    before the column existed read as NULL for it (ignoreMissing),
    never error — alongside the rename case."""
    from jobminer_spark.sources.iceberg import _current_metadata_path

    t = str(tmp_path / "addcol")
    write_iceberg(
        spark, t, spark.range(0, 5).select(F.col("id").alias("k"))
    )
    mp = _current_metadata_path(t)
    meta = json.load(open(mp))
    meta["schemas"][0]["fields"].append(
        {"id": 2, "name": "extra", "required": False, "type": "long"}
    )
    meta["last-column-id"] = 2
    with open(mp, "w") as fh:
        json.dump(meta, fh)
    got = read_iceberg(spark, t, resolve="field-id")
    assert got.columns == ["k", "extra"]
    assert all(r.extra is None for r in got.collect())
    # new appends carry the column; both generations coexist
    write_iceberg(
        spark, t,
        spark.range(5, 7).select(
            F.col("id").alias("k"), (F.col("id") + 100).alias("extra")
        ),
    )
    rows = {r.k: r.extra for r in
            read_iceberg(spark, t, resolve="field-id").collect()}
    assert rows[0] is None and rows[5] == 105 and rows[6] == 106


def test_rewrite_deletes_compacts_partitioned_table(spark, tmp_path):
    """r18 delete-file compaction on a PARTITIONED table: rewritten
    files land under the table's default spec with partition tuples
    in the new manifest (pruning still works), untouched files ride
    EXISTING entries with their original sequence numbers, every
    delete manifest is gone, and the old snapshot time-travels."""
    from jobminer_spark.sources.iceberg import (
        _snapshot_files,
        iceberg_metadata,
        rewrite_iceberg_deletes,
        write_iceberg_deletes,
    )

    t = str(tmp_path / "rwpart")
    df = spark.range(0, 40).select(
        F.col("id").alias("k"),
        (F.col("id") % 4).alias("p"),
        (F.col("id") * 10).alias("v"),
    )
    write_iceberg(
        spark, t, df, partition_spec=[("p", "identity", "p")]
    )
    files = sorted(
        f.replace("file:", "")
        for f in read_iceberg(spark, t).inputFiles()
    )
    scan = spark.read.parquet(*files).withColumns({
        "fp": F.regexp_replace(
            F.col("_metadata.file_path"), "^file:/+", "/"
        ),
        "pos": F.col("_metadata.row_index"),
    })
    write_iceberg_deletes(
        spark, t,
        scan.where(F.col("k") % 5 == 0).select(
            F.col("fp").alias("file_path"), "pos"
        ),
    )
    pre = sorted(
        (r.k, r.p, r.v) for r in read_iceberg(spark, t).collect()
    )
    snap_pre = iceberg_metadata(t)["current-snapshot-id"]
    sid, n = rewrite_iceberg_deletes(spark, t)
    assert n > 0
    post = sorted(
        (r.k, r.p, r.v) for r in read_iceberg(spark, t).collect()
    )
    assert post == pre
    assert all(k % 5 != 0 for k, _p, _v in post)
    _d, pos_after, eq_after = _snapshot_files(t)
    assert pos_after == [] and eq_after == []
    # partition pruning still plans only the p=2 file(s)
    pruned = read_iceberg(spark, t, partition_filters={"p": 2})
    assert sorted(r.k for r in pruned.collect()) == [
        k for k in range(40) if k % 4 == 2 and k % 5 != 0
    ]
    # the pre-compaction snapshot still reads identically
    old = sorted(
        (r.k, r.p, r.v)
        for r in read_iceberg(spark, t, snapshot_id=snap_pre).collect()
    )
    assert old == pre
    assert sid != snap_pre


def test_rewrite_deletes_keeps_untouched_files_existing(
    spark, tmp_path
):
    """Compaction must not rewrite files the deletes cannot touch: a
    post-delete append's files keep their ORIGINAL paths (EXISTING
    re-reference, no churn), and only pre-delete files are replaced."""
    from jobminer_spark.sources.avro import read_avro_records
    from jobminer_spark.sources.iceberg import (
        iceberg_live_files,
        rewrite_iceberg_deletes,
        write_iceberg_deletes,
    )

    t = str(tmp_path / "rwkeep")
    write_iceberg(
        spark, t,
        spark.range(0, 10).select(F.col("id").alias("k")).coalesce(1),
    )
    files_v1 = set(iceberg_live_files(t))
    scan = spark.read.parquet(*files_v1).withColumns({
        "fp": F.regexp_replace(
            F.col("_metadata.file_path"), "^file:/+", "/"
        ),
        "pos": F.col("_metadata.row_index"),
    })
    write_iceberg_deletes(
        spark, t,
        scan.where(F.col("k") < 3).select(
            F.col("fp").alias("file_path"), "pos"
        ),
    )
    write_iceberg(
        spark, t,
        spark.range(10, 20).select(F.col("id").alias("k")).coalesce(1),
    )
    files_v3 = set(iceberg_live_files(t))
    untouched = files_v3 - files_v1
    _sid, n = rewrite_iceberg_deletes(spark, t)
    assert n == len(files_v1)
    files_after = set(iceberg_live_files(t))
    # the post-delete append's files survive at their original paths
    assert untouched <= files_after
    # every pre-delete (position-targeted) file is replaced
    assert not (files_v1 & files_after)
    assert sorted(
        r.k for r in read_iceberg(spark, t).collect()
    ) == list(range(3, 20))


def test_iceberg_sort_order_write_and_inherit(spark, tmp_path):
    """r18 write-side sort orders: CREATE with sort_order records
    order-id 1 (identity transform, spec default null ordering) as the
    table default, every staged file is internally sorted (checked
    row-by-row per file), manifest entries stamp sort_order_id=1, and
    a plain append INHERITS the order while a conflicting explicit
    one refuses."""
    import pyarrow.parquet as papq

    from jobminer_spark.sources.avro import read_avro_records
    from jobminer_spark.sources.iceberg import (
        iceberg_live_files,
        iceberg_metadata,
    )

    t = str(tmp_path / "sorted")
    df = spark.range(0, 64).select(
        (F.col("id") * 37 % 64).alias("k"),
        (F.col("id") % 4).alias("p"),
        F.col("id").alias("v"),
    ).repartition(5)
    write_iceberg(
        spark, t, df,
        partition_spec=[("p", "identity", "p")],
        sort_order=[("k", "asc")],
    )
    meta = iceberg_metadata(t)
    assert meta["default-sort-order-id"] == 1
    (order,) = [
        o for o in meta["sort-orders"] if o["order-id"] == 1
    ]
    assert order["fields"] == [{
        "transform": "identity", "source-id": 1,
        "direction": "asc", "null-order": "nulls-first",
    }]
    # a second append inherits the order without restating it
    write_iceberg(
        spark, t,
        spark.range(64, 96).select(
            (F.col("id") * 37 % 64).alias("k"),
            (F.col("id") % 4).alias("p"),
            F.col("id").alias("v"),
        ),
    )
    # conflicting explicit order: loud
    with pytest.raises(ValueError, match="sort order"):
        write_iceberg(
            spark, t,
            df.limit(1),
            sort_order=[("v", "desc")],
        )
    # every data file is internally sorted on k
    for p in iceberg_live_files(t):
        ks = papq.read_table(p, columns=["k"])["k"].to_pylist()
        assert ks == sorted(ks), p
    # manifest entries carry sort_order_id = 1
    snap = meta_now = iceberg_metadata(t)
    snap_rec = next(
        s for s in meta_now["snapshots"]
        if s["snapshot-id"] == meta_now["current-snapshot-id"]
    )
    _, manifests = read_avro_records(snap_rec["manifest-list"])
    seen = []
    for m in manifests:
        _, entries = read_avro_records(m["manifest_path"])
        seen.extend(
            e["data_file"].get("sort_order_id") for e in entries
        )
    assert seen and all(s == 1 for s in seen)
    # the read round-trips the full corpus
    assert read_iceberg(spark, t).count() == 96


def test_rewrite_deletes_restores_sort_clustering(spark, tmp_path):
    """Compaction on a sorted table re-sorts the rewritten files and
    stamps their entries with the table's sort order id."""
    from jobminer_spark.sources.iceberg import (
        iceberg_live_files,
        rewrite_iceberg_deletes,
        write_iceberg_deletes,
    )
    import pyarrow.parquet as papq

    t = str(tmp_path / "sortedrw")
    write_iceberg(
        spark, t,
        spark.range(0, 50).select(
            (F.col("id") * 29 % 50).alias("k"), F.col("id").alias("v")
        ).coalesce(1),
        sort_order=[("k", "asc")],
    )
    files = iceberg_live_files(t)
    scan = spark.read.parquet(*files).withColumns({
        "fp": F.regexp_replace(
            F.col("_metadata.file_path"), "^file:/+", "/"
        ),
        "pos": F.col("_metadata.row_index"),
    })
    write_iceberg_deletes(
        spark, t,
        scan.where(F.col("k") % 7 == 0).select(
            F.col("fp").alias("file_path"), "pos"
        ),
    )
    _sid, n = rewrite_iceberg_deletes(spark, t)
    assert n == len(files)
    for p in iceberg_live_files(t):
        ks = papq.read_table(p, columns=["k"])["k"].to_pylist()
        assert ks == sorted(ks), p
    assert sorted(r.k for r in read_iceberg(spark, t).collect()) == [
        k for k in range(50) if k % 7 != 0
    ]


def test_iceberg_unsupported_sort_transform_falls_back_unsorted(
    spark, tmp_path
):
    """ADVICE r18: sort order is ADVISORY per the spec — a foreign
    table whose default sort order uses bucket/truncate must still
    accept appends (and compactions), writing unsorted files with
    sort_order_id omitted, instead of refusing the whole write."""
    import warnings

    from jobminer_spark.sources.avro import read_avro_records
    from jobminer_spark.sources.iceberg import iceberg_metadata

    t = str(tmp_path / "foreignsort")
    write_iceberg(
        spark, t, spark.range(0, 5).select(F.col("id").alias("k"))
    )
    # splice a bucket-transform default sort order, as a foreign
    # engine would publish it
    md = os.path.join(t, "metadata")
    with open(os.path.join(md, "version-hint.text")) as f:
        v = int(f.read().strip())
    with open(os.path.join(md, f"v{v}.metadata.json")) as f:
        meta = json.load(f)
    meta["sort-orders"] = meta.get("sort-orders", []) + [{
        "order-id": 7,
        "fields": [{
            "transform": "bucket[4]", "source-id": 1,
            "direction": "asc", "null-order": "nulls-first",
        }],
    }]
    meta["default-sort-order-id"] = 7
    with open(os.path.join(md, f"v{v}.metadata.json"), "w") as f:
        json.dump(meta, f)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        write_iceberg(
            spark, t, spark.range(5, 9).select(F.col("id").alias("k"))
        )
    assert any("advisory" in str(x.message) for x in w)
    assert sorted(r.k for r in read_iceberg(spark, t).collect()) == list(
        range(9)
    )
    # the appended entries stamp NO sort_order_id (legal unclustered
    # write), and the advisory order id survives in table metadata
    meta2 = iceberg_metadata(t)
    assert meta2["default-sort-order-id"] == 7
    snap = [
        s for s in meta2["snapshots"]
        if s["snapshot-id"] == meta2["current-snapshot-id"]
    ][0]
    _, lists = read_avro_records(snap["manifest-list"])
    new_entries = []
    for m in lists:
        _, entries = read_avro_records(m["manifest_path"])
        for e in entries:
            if e["status"] == 1:  # ADDED in this snapshot's manifests
                new_entries.append(e)
    assert new_entries
    assert all(
        e["data_file"].get("sort_order_id") is None for e in new_entries
    )


def _v3_dv_schema():
    """Foreign-shaped manifest-entry schema carrying the v3 DV fields
    (referenced_data_file, content_offset, content_size_in_bytes)."""
    return {
        "type": "record", "name": "manifest_entry",
        "fields": [
            {"name": "status", "type": "int"},
            {"name": "snapshot_id", "type": ["null", "long"]},
            {"name": "sequence_number", "type": ["null", "long"]},
            {"name": "file_sequence_number", "type": ["null", "long"]},
            {"name": "data_file", "type": {
                "type": "record", "name": "data_file",
                "fields": [
                    {"name": "content", "type": "int"},
                    {"name": "file_path", "type": "string"},
                    {"name": "file_format", "type": "string"},
                    {"name": "record_count", "type": "long"},
                    {"name": "file_size_in_bytes", "type": "long"},
                    {"name": "referenced_data_file",
                     "type": ["null", "string"]},
                    {"name": "content_offset",
                     "type": ["null", "long"]},
                    {"name": "content_size_in_bytes",
                     "type": ["null", "long"]},
                ],
            }},
        ],
    }


def _splice_v3_dv(spark, t, fmt_version=3, with_parquet_deletes=True):
    """Upgrade a two-file table to format v3 and splice a delete
    snapshot carrying a Puffin DV for file 1 (positions {0, 2}) plus,
    optionally, a parquet position-delete file naming BOTH files (the
    file-1 row must be superseded by the DV)."""
    from jobminer_spark.sources.avro import (
        read_avro_records as _rar,
        write_avro_file as _waf,
    )
    from jobminer_spark.sources.iceberg import (
        _MANIFEST_LIST_SCHEMA,
        iceberg_live_files,
        iceberg_metadata,
    )
    from jobminer_spark.sources.puffin import (
        serialize_dv_blob,
        write_puffin,
    )

    import pyarrow.parquet as _papq3

    md = os.path.join(t, "metadata")
    # path sort order is random (commit hex): pin f1 = the file that
    # holds k=0
    files = iceberg_live_files(t)
    f1 = next(
        p
        for p in files
        if 0 in _papq3.read_table(p, columns=["k"])["k"].to_pylist()
    )
    (f2,) = [p for p in files if p != f1]
    blob = serialize_dv_blob([0, 2])
    puffin_path = os.path.join(t, "data", "dv-0001.puffin")
    (rec,) = write_puffin(puffin_path, [{
        "type": "deletion-vector-v1", "payload": blob,
        "snapshot_id": 3, "sequence_number": 3,
        "properties": {"referenced-data-file": f1, "cardinality": "2"},
    }])
    entries = [{
        "status": 1, "snapshot_id": None, "sequence_number": None,
        "file_sequence_number": None,
        "data_file": {
            "content": 1, "file_path": os.path.abspath(puffin_path),
            "file_format": "PUFFIN", "record_count": 2,
            "file_size_in_bytes": os.path.getsize(puffin_path),
            "referenced_data_file": f1,
            "content_offset": rec["offset"],
            "content_size_in_bytes": rec["length"],
        },
    }]
    if with_parquet_deletes:
        import pyarrow as pa
        import pyarrow.parquet as papq

        pd_path = os.path.join(t, "data", "posdel-0001.parquet")
        papq.write_table(
            pa.table({
                "file_path": pa.array([f1, f2]),
                "pos": pa.array([1, 1], pa.int64()),
            }),
            pd_path,
        )
        entries.append({
            "status": 1, "snapshot_id": None, "sequence_number": None,
            "file_sequence_number": None,
            "data_file": {
                "content": 1, "file_path": os.path.abspath(pd_path),
                "file_format": "PARQUET", "record_count": 2,
                "file_size_in_bytes": os.path.getsize(pd_path),
                "referenced_data_file": None,
                "content_offset": None,
                "content_size_in_bytes": None,
            },
        })
    dm = os.path.join(md, "manifest-v3dv.avro")
    _waf(dm, _v3_dv_schema(), entries)
    meta = iceberg_metadata(t)
    cur = next(s for s in meta["snapshots"]
               if s["snapshot-id"] == meta["current-snapshot-id"])
    _, records = _rar(cur["manifest-list"])
    records.append({
        "manifest_path": os.path.abspath(dm),
        "manifest_length": os.path.getsize(dm),
        "partition_spec_id": 0, "content": 1, "sequence_number": 3,
        "min_sequence_number": 3, "added_snapshot_id": 3,
        "added_files_count": len(entries), "existing_files_count": 0,
        "deleted_files_count": 0, "added_rows_count": 4,
        "existing_rows_count": 0, "deleted_rows_count": 0,
    })
    new_list = os.path.join(md, "snap-3-v3dv.avro")
    _waf(new_list, _MANIFEST_LIST_SCHEMA, records)
    meta["format-version"] = fmt_version
    meta["next-row-id"] = 100  # v3 row-lineage bookkeeping (ignored)
    meta["last-sequence-number"] = 3
    meta["snapshots"].append({
        "snapshot-id": 3, "sequence-number": 3, "timestamp-ms": 0,
        "manifest-list": os.path.abspath(new_list),
        "summary": {"operation": "delete"},
    })
    meta["current-snapshot-id"] = 3
    with open(os.path.join(md, "v9.metadata.json"), "w") as f:
        json.dump(meta, f)
    with open(os.path.join(md, "version-hint.text"), "w") as f:
        f.write("9")
    return f1, f2


def test_iceberg_v3_deletion_vector_read(spark, tmp_path):
    """Format v3 (r18): a foreign-shaped table carrying a Puffin
    deletion vector reads correctly — the DV's roaring positions
    vanish from its referenced file, a position-delete PARQUET row
    naming the SAME file is superseded (the spec's rule: a DV
    replaces prior position deletes for its file) while its row for
    the OTHER file still applies, and v3 metadata fields
    (next-row-id) pass through harmlessly."""
    t = str(tmp_path / "v3dv")
    write_iceberg(
        spark, t,
        spark.range(0, 5).select(F.col("id").alias("k")).coalesce(1),
    )
    write_iceberg(
        spark, t,
        spark.range(5, 10).select(F.col("id").alias("k")).coalesce(1),
    )
    f1, f2 = _splice_v3_dv(spark, t)
    got = sorted(r.k for r in read_iceberg(spark, t).collect())
    # f1 rows 0,2 dead via DV (its pos-1 parquet row superseded);
    # f2 row 1 (k=6) dead via the parquet position delete
    assert got == [1, 3, 4, 5, 7, 8, 9]


def test_iceberg_v3_dv_compaction_and_version_gates(spark, tmp_path):
    """rewrite_iceberg_deletes applies v3 DVs (the affected file
    comes straight from the manifest entry, no scan), drops the
    Puffin + parquet delete files from the new snapshot, and KEEPS
    format-version 3; a DV in a v2 table and format-version 4 both
    refuse loudly."""
    from jobminer_spark.sources.iceberg import (
        _snapshot_files,
        iceberg_metadata,
        rewrite_iceberg_deletes,
    )

    t = str(tmp_path / "v3rw")
    write_iceberg(
        spark, t,
        spark.range(0, 5).select(F.col("id").alias("k")).coalesce(1),
    )
    write_iceberg(
        spark, t,
        spark.range(5, 10).select(F.col("id").alias("k")).coalesce(1),
    )
    _splice_v3_dv(spark, t)
    pre = sorted(r.k for r in read_iceberg(spark, t).collect())
    _sid, n = rewrite_iceberg_deletes(spark, t)
    assert n == 2  # both files affected (DV + parquet delete)
    assert sorted(r.k for r in read_iceberg(spark, t).collect()) == pre
    _d, dl, eq = _snapshot_files(t)
    assert dl == [] and eq == []
    assert iceberg_metadata(t)["format-version"] == 3

    # DV in a v2 table: spec violation, loud
    t2 = str(tmp_path / "v2dv")
    write_iceberg(
        spark, t2,
        spark.range(0, 5).select(F.col("id").alias("k")).coalesce(1),
    )
    write_iceberg(
        spark, t2,
        spark.range(5, 10).select(F.col("id").alias("k")).coalesce(1),
    )
    _splice_v3_dv(spark, t2, fmt_version=2, with_parquet_deletes=False)
    with pytest.raises(ValueError, match="format-version 2"):
        read_iceberg(spark, t2).collect()

    # format-version 4: unknown, loud
    t3 = str(tmp_path / "v4")
    write_iceberg(
        spark, t3,
        spark.range(0, 3).select(F.col("id").alias("k")),
    )
    md3 = os.path.join(t3, "metadata")
    meta3 = json.load(open(os.path.join(md3, "v1.metadata.json")))
    meta3["format-version"] = 4
    with open(os.path.join(md3, "v2.metadata.json"), "w") as f:
        json.dump(meta3, f)
    with open(os.path.join(md3, "version-hint.text"), "w") as f:
        f.write("2")
    with pytest.raises(ValueError, match="format-version 4"):
        read_iceberg(spark, t3).collect()


def test_write_iceberg_dvs_union_and_single_dv_invariant(
    spark, tmp_path
):
    """r18 v3 DV WRITER: the first DV commit upgrades the table to
    format-version 3 and deletes its positions; a second DV commit on
    the same file UNIONS the prior DV (nothing resurrects) and the
    snapshot inventory keeps AT MOST ONE DV per data file (the
    superseded entry leaves via manifest rewrite). Compaction then
    applies and drops everything, keeping v3."""
    from jobminer_spark.sources.iceberg import (
        _snapshot_files,
        iceberg_live_files,
        iceberg_metadata,
        rewrite_iceberg_deletes,
        write_iceberg_dvs,
    )

    t = str(tmp_path / "dvw")
    write_iceberg(
        spark, t,
        spark.range(0, 10).select(F.col("id").alias("k")).coalesce(1),
    )
    write_iceberg(
        spark, t,
        spark.range(10, 20).select(F.col("id").alias("k")).coalesce(1),
    )

    def _scan():
        return spark.read.parquet(*iceberg_live_files(t)).select(
            F.col("_metadata.file_path").alias("file_path"),
            F.col("_metadata.row_index").alias("pos"),
            "k",
        )

    write_iceberg_dvs(
        spark, t,
        _scan().where(F.col("k").isin(0, 3, 12)).select(
            "file_path", "pos"
        ),
    )
    assert iceberg_metadata(t)["format-version"] == 3
    assert sorted(r.k for r in read_iceberg(spark, t).collect()) == [
        k for k in range(20) if k not in (0, 3, 12)
    ]
    # second commit: union on file 1, at most one DV per file
    write_iceberg_dvs(
        spark, t,
        _scan().where(F.col("k").isin(5, 15)).select(
            "file_path", "pos"
        ),
    )
    assert sorted(r.k for r in read_iceberg(spark, t).collect()) == [
        k for k in range(20) if k not in (0, 3, 5, 12, 15)
    ]
    _d, dels, _eq = _snapshot_files(t)
    dv_recs = [r for r in dels if r.get("puffin")]
    refs = [r["referenced_file"] for r in dv_recs]
    assert len(refs) == len(set(refs)) == 2  # one DV per data file
    # the DVs carry the UNIONED cardinalities
    assert sorted(r["record_count"] for r in dv_recs) == [2, 3]
    # compaction applies + drops them, keeping v3
    pre = sorted(r.k for r in read_iceberg(spark, t).collect())
    _sid, n = rewrite_iceberg_deletes(spark, t)
    assert n == 2
    assert sorted(r.k for r in read_iceberg(spark, t).collect()) == pre
    _d2, dels2, _eq2 = _snapshot_files(t)
    assert dels2 == []
    assert iceberg_metadata(t)["format-version"] == 3


def test_write_iceberg_dvs_folds_prior_parquet_deletes(
    spark, tmp_path
):
    """A DV must carry EVERY delete for its file: prior parquet
    position-delete rows targeting the touched file fold into the new
    blob (the read-side supersede rule then ignores the parquet rows
    for that file — without the fold, their deletes would
    resurrect)."""
    from jobminer_spark.sources.iceberg import (
        iceberg_live_files,
        write_iceberg_deletes,
        write_iceberg_dvs,
    )

    t = str(tmp_path / "dvfold")
    write_iceberg(
        spark, t,
        spark.range(0, 10).select(F.col("id").alias("k")).coalesce(1),
    )

    def _scan():
        return spark.read.parquet(*iceberg_live_files(t)).select(
            F.regexp_replace(
                F.col("_metadata.file_path"), "^file:/+", "/"
            ).alias("file_path"),
            F.col("_metadata.row_index").alias("pos"),
            "k",
        )

    write_iceberg_deletes(
        spark, t,
        _scan().where(F.col("k") == 1).select("file_path", "pos"),
    )
    write_iceberg_dvs(
        spark, t,
        _scan().where(F.col("k") == 2).select("file_path", "pos"),
    )
    assert sorted(r.k for r in read_iceberg(spark, t).collect()) == [
        0, 3, 4, 5, 6, 7, 8, 9,
    ]


def test_merge_iceberg_upsert_semantics(spark, tmp_path):
    """merge_iceberg: matched rows replaced, unmatched source rows
    inserted, untouched target rows survive; the delete half cannot
    touch the append half (sequence rule); repeated MERGE of the same
    source is idempotent; bad keys/schema refuse."""
    from jobminer_spark.sources.iceberg import merge_iceberg

    t = str(tmp_path / "merge")
    write_iceberg(
        spark, t,
        spark.range(0, 8).select(
            F.col("id").alias("k"), (F.col("id") * 10).alias("v")
        ),
    )
    src = spark.createDataFrame(
        [(2, 999), (5, 555), (11, 111)], "k long, v long"
    )
    merge_iceberg(spark, t, src, ["k"])
    expect = {
        **{k: k * 10 for k in range(8)},
        2: 999, 5: 555, 11: 111,
    }
    got = {r.k: r.v for r in read_iceberg(spark, t).collect()}
    assert got == expect
    # idempotent re-merge
    merge_iceberg(spark, t, src, ["k"])
    got = {r.k: r.v for r in read_iceberg(spark, t).collect()}
    assert got == expect
    with pytest.raises(ValueError, match="not table columns"):
        merge_iceberg(spark, t, src, ["nope"])
    with pytest.raises(ValueError, match="source schema"):
        merge_iceberg(
            spark, t,
            spark.range(1).select(F.col("id").alias("k")),
            ["k"],
        )
    # ADVICE r18: a dup-key source refuses loudly (engine MERGE
    # errors on multiple matches; silently both rows would append
    # after the single equality delete → duplicate table rows) and
    # leaves the table untouched (no partial commit)
    before = {r.k: r.v for r in read_iceberg(spark, t).collect()}
    with pytest.raises(ValueError, match="not key-unique"):
        merge_iceberg(
            spark, t,
            spark.createDataFrame(
                [(3, 1), (3, 2), (7, 7)], "k long, v long"
            ),
            ["k"],
        )
    assert {r.k: r.v for r in read_iceberg(spark, t).collect()} == before


def test_rewrite_deletes_on_transform_partitioned_table(
    spark, tmp_path
):
    """Compaction re-stages under the table's TRANSFORM spec (bucket
    here): rewritten files land with recomputed partition tuples and
    pruning still works afterwards."""
    from jobminer_spark.sources.iceberg import (
        _snapshot_files,
        iceberg_live_files,
        rewrite_iceberg_deletes,
        write_iceberg_deletes,
    )

    t = str(tmp_path / "rwbucket")
    df = spark.range(0, 40).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("v")
    )
    write_iceberg(
        spark, t, df, partition_spec=[("kb", "bucket[4]", "k")]
    )
    files = iceberg_live_files(t)
    scan = spark.read.parquet(*files).withColumns({
        "fp": F.regexp_replace(
            F.col("_metadata.file_path"), "^file:/+", "/"
        ),
        "pos": F.col("_metadata.row_index"),
    })
    write_iceberg_deletes(
        spark, t,
        scan.where(F.col("k") % 10 == 0).select(
            F.col("fp").alias("file_path"), "pos"
        ),
    )
    pre = sorted((r.k, r.v) for r in read_iceberg(spark, t).collect())
    _sid, n = rewrite_iceberg_deletes(spark, t)
    assert n > 0
    assert sorted(
        (r.k, r.v) for r in read_iceberg(spark, t).collect()
    ) == pre
    assert all(k % 10 != 0 for k, _v in pre)
    _d, dl, eq = _snapshot_files(t)
    assert dl == [] and eq == []
    # bucket pruning still plans a strict subset post-compaction
    pruned = read_iceberg(spark, t, partition_filters={"k": 7})
    assert 0 < len(pruned.inputFiles()) < len(
        read_iceberg(spark, t).inputFiles()
    )
    assert sorted(r.k for r in pruned.where("k = 7").collect()) == [7]


def test_merge_then_compact_roundtrip(spark, tmp_path):
    """The documented pairing: MERGE accumulates equality-delete
    files, compaction folds them away — post-compaction scan
    identical, zero delete files, still mergeable."""
    from jobminer_spark.sources.iceberg import (
        _snapshot_files,
        merge_iceberg,
        rewrite_iceberg_deletes,
    )

    t = str(tmp_path / "mergecompact")
    write_iceberg(
        spark, t,
        spark.range(0, 12).select(
            F.col("id").alias("k"), F.col("id").alias("v")
        ),
    )
    merge_iceberg(
        spark, t,
        spark.createDataFrame([(3, 33), (20, 200)], "k long, v long"),
        ["k"],
    )
    pre = sorted((r.k, r.v) for r in read_iceberg(spark, t).collect())
    _sid, n = rewrite_iceberg_deletes(spark, t)
    assert n > 0
    assert sorted(
        (r.k, r.v) for r in read_iceberg(spark, t).collect()
    ) == pre
    _d, dl, eq = _snapshot_files(t)
    assert dl == [] and eq == []
    # the compacted table keeps accepting MERGEs
    merge_iceberg(
        spark, t,
        spark.createDataFrame([(0, -1)], "k long, v long"),
        ["k"],
    )
    got = {r.k: r.v for r in read_iceberg(spark, t).collect()}
    assert got[0] == -1 and got[3] == 33 and got[20] == 200


def test_rewrite_data_files_binpack(spark, tmp_path):
    """Small-file compaction (r18): an 8-small-file group binpacks to
    2 while an at-target partition is untouched (no churn); pending
    deletes APPLY to the rewritten files and KEEP gating the
    untouched ones; old snapshots time-travel."""
    from jobminer_spark.sources.iceberg import (
        _snapshot_files,
        iceberg_live_files,
        iceberg_metadata,
        rewrite_iceberg_data_files,
        write_iceberg_deletes,
    )

    t = str(tmp_path / "binpack")
    # partition p=0 gets 8 tiny files, p=1 exactly 2
    for i in range(8):
        write_iceberg(
            spark, t,
            spark.range(i * 10, i * 10 + 10).select(
                F.lit(0).alias("p"), F.col("id").alias("k")
            ).coalesce(1),
            partition_spec=[("p", "identity", "p")] if i == 0 else None,
        )
    for i in range(2):
        write_iceberg(
            spark, t,
            spark.range(100 + i * 5, 105 + i * 5).select(
                F.lit(1).alias("p"), F.col("id").alias("k")
            ).coalesce(1),
        )
    files_p1 = {
        f for f in iceberg_live_files(t) if "/p=1/" in f or True
    }
    # a position delete spanning BOTH partitions
    scan = spark.read.parquet(*iceberg_live_files(t)).withColumns({
        "fp": F.regexp_replace(
            F.col("_metadata.file_path"), "^file:/+", "/"
        ),
        "pos": F.col("_metadata.row_index"),
    })
    write_iceberg_deletes(
        spark, t,
        scan.where(F.col("k").isin(0, 101)).select(
            F.col("fp").alias("file_path"), "pos"
        ),
    )
    pre = sorted((r.p, r.k) for r in read_iceberg(spark, t).collect())
    snap_pre = iceberg_metadata(t)["current-snapshot-id"]
    before = iceberg_live_files(t)
    sid, n = rewrite_iceberg_data_files(spark, t, target_files=2)
    assert n == 8  # only the oversized p=0 group rewrites
    after = iceberg_live_files(t)
    assert sorted(
        (r.p, r.k) for r in read_iceberg(spark, t).collect()
    ) == pre
    # p=0: 8 -> at most 2 files; p=1 untouched (same paths)
    p1_before = {f for f in before if _p_of(spark, f) == 1}
    p1_after = {f for f in after if _p_of(spark, f) == 1}
    assert p1_before == p1_after
    assert len(after) <= len(p1_after) + 2
    # delete files survive (they still gate p=1's untouched files)
    _d, dl, _eq = _snapshot_files(t)
    assert dl  # the delete manifest is KEPT
    # the deleted rows stay deleted on both rewritten and kept files
    ks = {r.k for r in read_iceberg(spark, t).collect()}
    assert 0 not in ks and 101 not in ks
    # time travel intact
    assert sorted(
        (r.p, r.k)
        for r in read_iceberg(spark, t, snapshot_id=snap_pre).collect()
    ) == pre
    # no-op on an already-packed table: no new snapshot
    sid2, n2 = rewrite_iceberg_data_files(spark, t, target_files=2)
    assert (sid2, n2) == (sid, 0)


def _p_of(spark, path):
    import pyarrow.parquet as papq

    vals = papq.read_table(
        path.replace("file:", ""), columns=["p"]
    )["p"].to_pylist()
    return vals[0]


def _binpack_fixture(spark, t):
    """p=0 gets 8 tiny files (oversized → rewrites at target 2),
    p=1 exactly 2 (untouched)."""
    for i in range(8):
        write_iceberg(
            spark, t,
            spark.range(i * 10, i * 10 + 10).select(
                F.lit(0).alias("p"), F.col("id").alias("k")
            ).coalesce(1),
            partition_spec=[("p", "identity", "p")] if i == 0 else None,
        )
    for i in range(2):
        write_iceberg(
            spark, t,
            spark.range(100 + i * 5, 105 + i * 5).select(
                F.lit(1).alias("p"), F.col("id").alias("k")
            ).coalesce(1),
        )


def _pos_delete_for(spark, t, ks):
    from jobminer_spark.sources.iceberg import (
        iceberg_live_files,
        write_iceberg_deletes,
    )

    scan = spark.read.parquet(*iceberg_live_files(t)).withColumns({
        "fp": F.regexp_replace(
            F.col("_metadata.file_path"), "^file:/+", "/"
        ),
        "pos": F.col("_metadata.row_index"),
    })
    write_iceberg_deletes(
        spark, t,
        scan.where(F.col("k").isin(*ks)).select(
            F.col("fp").alias("file_path"), "pos"
        ),
    )


def test_rewrite_data_files_prunes_dangling_deletes(spark, tmp_path):
    """ADVICE r18: binpack retires delete entries whose EVERY target
    was just replaced (position-delete parquet aimed only at rewritten
    p=0 files) while keeping ones that still gate untouched files
    (p=1's). Dangling entries are read-harmless but accumulate across
    compactions, inflating $files and later manifest surgery."""
    from jobminer_spark.sources.iceberg import (
        _snapshot_files,
        rewrite_iceberg_data_files,
    )

    t = str(tmp_path / "binpackprune")
    _binpack_fixture(spark, t)
    _pos_delete_for(spark, t, [5])    # targets a p=0 file only
    _pos_delete_for(spark, t, [101])  # targets a p=1 file only
    _d, dl, _eq = _snapshot_files(t)
    assert len(dl) == 2
    sid, n = rewrite_iceberg_data_files(spark, t, target_files=2)
    assert n == 8
    _d, dl, _eq = _snapshot_files(t)
    # the p=0-only delete dangles (its target was rewritten with the
    # delete applied) and retires; the p=1 one survives and gates
    assert len(dl) == 1
    import pyarrow.parquet as papq

    targets = set(
        papq.read_table(dl[0]["path"], columns=["file_path"])[
            "file_path"
        ].to_pylist()
    )
    # the survivor targets p=1 data (the untouched group) only
    assert targets and all(_p_of(spark, x) == 1 for x in targets)
    ks = {r.k for r in read_iceberg(spark, t).collect()}
    assert 5 not in ks and 101 not in ks
    assert ks == (set(range(80)) | set(range(100, 110))) - {5, 101}


def test_rewrite_data_files_prunes_dangling_dvs(spark, tmp_path):
    """ADVICE r18, DV leg: a format-v3 deletion vector whose
    referenced_data_file was just replaced retires during binpack —
    mirroring write_iceberg_dvs's superseded-DV surgery."""
    from jobminer_spark.sources.iceberg import (
        _snapshot_files,
        iceberg_live_files,
        rewrite_iceberg_data_files,
        write_iceberg_dvs,
    )

    t = str(tmp_path / "binpackdv")
    _binpack_fixture(spark, t)
    scan = spark.read.parquet(*iceberg_live_files(t)).withColumns({
        "fp": F.regexp_replace(
            F.col("_metadata.file_path"), "^file:/+", "/"
        ),
        "pos": F.col("_metadata.row_index"),
    })
    write_iceberg_dvs(
        spark, t,
        scan.where(F.col("k") == 7).select(
            F.col("fp").alias("file_path"), "pos"
        ),
    )
    _d, dl, _eq = _snapshot_files(t)
    assert len(dl) == 1 and dl[0].get("puffin")
    sid, n = rewrite_iceberg_data_files(spark, t, target_files=2)
    assert n == 8
    _d, dl, _eq = _snapshot_files(t)
    assert dl == []  # the DV's referenced file was replaced → retired
    ks = {r.k for r in read_iceberg(spark, t).collect()}
    assert 7 not in ks and len(ks) == 89


def test_iceberg_add_column_with_default(spark, tmp_path):
    """r19 (VERDICT r18 item 5): v3 default column values — ADD
    COLUMN with a default is a metadata-only commit (new schema id,
    format v3); files PREDATING the column read the initial-default,
    appends omitting it fill the write-default at write time, files
    carrying genuine NULLs keep them (no blanket coalesce), and the
    field-id resolution path scans the same result."""
    from jobminer_spark.sources.iceberg import (
        add_iceberg_column,
        iceberg_metadata,
    )

    t = str(tmp_path / "adddef")
    write_iceberg(
        spark, t, spark.range(0, 5).select(F.col("id").alias("k"))
    )
    add_iceberg_column(t, "score", "long", default=7)
    add_iceberg_column(t, "tag", "string", default="x")
    add_iceberg_column(t, "d", "date", default="2024-01-01")
    meta = iceberg_metadata(t)
    assert meta["format-version"] == 3
    cur = next(
        s for s in meta["schemas"]
        if s["schema-id"] == meta["current-schema-id"]
    )
    fld = next(f for f in cur["fields"] if f["name"] == "score")
    assert fld["initial-default"] == 7 and fld["write-default"] == 7
    # pre-existing files read the initial-defaults
    got = {
        (r.k, r.score, r.tag, str(r.d))
        for r in read_iceberg(spark, t).collect()
    }
    assert got == {(i, 7, "x", "2024-01-01") for i in range(5)}
    # an append WITH values keeps them; one with explicit NULL keeps
    # NULL (initial-default must not rewrite genuine nulls)
    write_iceberg(
        spark, t,
        spark.createDataFrame(
            [(10, 99, "y", None), (11, None, None, None)],
            "k long, score long, tag string, d date",
        ),
    )
    # an append OMITTING the columns gets the write-defaults
    write_iceberg(
        spark, t, spark.range(20, 22).select(F.col("id").alias("k"))
    )
    expect = (
        {(i, 7, "x", "2024-01-01") for i in range(5)}
        | {(10, 99, "y", "None"), (11, None, None, "None")}
        | {(i, 7, "x", "2024-01-01") for i in (20, 21)}
    )
    got = {
        (r.k, r.score, r.tag, str(r.d))
        for r in read_iceberg(spark, t).collect()
    }
    assert got == expect
    # field-id resolution sees the identical table
    got_fid = {
        (r.k, r.score, r.tag, str(r.d))
        for r in read_iceberg(spark, t, resolve="field-id").collect()
    }
    assert got_fid == expect
    # guards
    with pytest.raises(ValueError, match="already exists"):
        add_iceberg_column(t, "score", "long")
    with pytest.raises(ValueError, match="unsupported Iceberg"):
        add_iceberg_column(t, "zz", "wibble")


def test_iceberg_v3_row_lineage(spark, tmp_path):
    """r19 v3 ROW LINEAGE: a table created with row_lineage=True
    starts at format v3 with next-row-id bookkeeping; every data file
    reserves a contiguous first_row_id range; snapshots stamp
    first-row-id; read_iceberg_row_ids derives unique contiguous ids
    and per-file _last_updated_sequence_number; deletes shrink the
    id set without re-keying survivors; compaction re-keys with
    FRESH ranges past the watermark (documented — no materialized
    lineage columns); plain v2 tables refuse the row-id read."""
    from jobminer_spark.sources.iceberg import (
        iceberg_live_files,
        iceberg_metadata,
        read_iceberg_row_ids,
        rewrite_iceberg_data_files,
        write_iceberg_deletes,
    )

    t = str(tmp_path / "lineage")
    write_iceberg(
        spark, t,
        spark.range(0, 6).select(F.col("id").alias("k")).coalesce(1),
        row_lineage=True,
    )
    write_iceberg(
        spark, t,
        spark.range(6, 10).select(F.col("id").alias("k")).coalesce(1),
    )
    meta = iceberg_metadata(t)
    assert meta["format-version"] == 3
    assert meta["next-row-id"] == 10
    snaps = sorted(meta["snapshots"], key=lambda s: s["sequence-number"])
    assert [s["first-row-id"] for s in snaps] == [0, 6]
    got = read_iceberg_row_ids(spark, t)
    rows = got.collect()
    assert sorted(r._row_id for r in rows) == list(range(10))
    # the second snapshot's rows carry its sequence number
    assert {
        r._last_updated_sequence_number for r in rows if r.k >= 6
    } == {2}
    # a position delete removes ids without re-keying survivors
    scan = spark.read.parquet(*iceberg_live_files(t)).withColumns({
        "fp": F.regexp_replace(
            F.col("_metadata.file_path"), "^file:/+", "/"
        ),
        "pos": F.col("_metadata.row_index"),
    })
    write_iceberg_deletes(
        spark, t,
        scan.where(F.col("k") == 3).select(
            F.col("fp").alias("file_path"), "pos"
        ),
    )
    survivors = {
        r.k: r._row_id for r in read_iceberg_row_ids(spark, t).collect()
    }
    assert 3 not in survivors and len(survivors) == 9
    assert survivors[0] == 0 and survivors[9] == 9
    # compaction assigns FRESH ranges past the watermark
    for lo in (10, 12, 14):  # oversize the group so binpack fires
        write_iceberg(
            spark, t,
            spark.range(lo, lo + 2).select(
                F.col("id").alias("k")
            ).coalesce(1),
        )
    _sid, n = rewrite_iceberg_data_files(spark, t, target_files=2)
    assert n > 0
    meta2 = iceberg_metadata(t)
    got2 = read_iceberg_row_ids(spark, t)
    ids2 = [r._row_id for r in got2.collect()]
    assert len(ids2) == len(set(ids2)) == 15
    assert min(ids2) >= 16  # fresh post-compaction ranges
    assert meta2["next-row-id"] == 16 + 15
    # a plain v2 table refuses the row-id read
    t2 = str(tmp_path / "plain2")
    write_iceberg(
        spark, t2, spark.range(0, 3).select(F.col("id").alias("k"))
    )
    with pytest.raises(ValueError, match="row lineage not assigned"):
        read_iceberg_row_ids(spark, t2)


def test_iceberg_rename_and_drop_column(spark, tmp_path):
    """r19 schema evolution: RENAME keeps the field id (field-id
    reads resolve pre-rename files; name reads NULL them — the spec's
    reason ids exist), DROP stops projecting the column without
    touching data files, and dropping a partition-spec / sort-order
    source refuses."""
    from jobminer_spark.sources.iceberg import (
        drop_iceberg_column,
        iceberg_metadata,
        rename_iceberg_column,
    )

    t = str(tmp_path / "evolve")
    write_iceberg(
        spark, t,
        spark.range(0, 4).select(
            F.col("id").alias("k"),
            (F.col("id") * 10).alias("v"),
            F.lit("x").alias("junk"),
        ),
    )
    rename_iceberg_column(t, "v", "val")
    meta = iceberg_metadata(t)
    cur = next(
        s for s in meta["schemas"]
        if s["schema-id"] == meta["current-schema-id"]
    )
    f_val = next(f for f in cur["fields"] if f["name"] == "val")
    assert f_val["id"] == 2  # id preserved through the rename
    # field-id reads resolve the pre-rename files exactly
    got = {
        (r.k, r.val)
        for r in read_iceberg(spark, t, resolve="field-id").collect()
    }
    assert got == {(i, i * 10) for i in range(4)}
    # an append under the new name composes
    write_iceberg(
        spark, t,
        spark.range(4, 6).select(
            F.col("id").alias("k"),
            (F.col("id") * 10).alias("val"),
            F.lit("y").alias("junk"),
        ),
    )
    got = {
        (r.k, r.val)
        for r in read_iceberg(spark, t, resolve="field-id").collect()
    }
    assert got == {(i, i * 10) for i in range(6)}
    # drop: the column disappears from projection; data intact
    drop_iceberg_column(t, "junk")
    df = read_iceberg(spark, t, resolve="field-id")
    assert df.columns == ["k", "val"]
    assert df.count() == 6
    # guards
    with pytest.raises(ValueError, match="already exists"):
        rename_iceberg_column(t, "k", "val")
    with pytest.raises(ValueError, match="no column"):
        drop_iceberg_column(t, "nope")
    t2 = str(tmp_path / "evolvepart")
    write_iceberg(
        spark, t2,
        spark.range(0, 4).select(
            (F.col("id") % 2).alias("p"), F.col("id").alias("k")
        ),
        partition_spec=[("p", "identity", "p")],
    )
    with pytest.raises(ValueError, match="sources partition spec"):
        drop_iceberg_column(t2, "p")
    t3 = str(tmp_path / "evolvesort")
    write_iceberg(
        spark, t3,
        spark.range(0, 4).select(
            F.col("id").alias("k"), F.col("id").alias("s")
        ),
        sort_order=[("s", "asc")],
    )
    with pytest.raises(ValueError, match="sources sort order"):
        drop_iceberg_column(t3, "s")


def test_iceberg_partition_spec_evolution(spark, tmp_path):
    """r19 partition-spec evolution: a table starts unpartitioned,
    evolves to bucket[4](k) — old files keep spec 0, new appends lay
    out under spec 1, a spanning read serves every row, and pruning
    under the NEW spec plans a strict subset that still includes the
    old (unprunable) files; guards refuse unknown columns/transforms."""
    from jobminer_spark.sources.iceberg import (
        evolve_iceberg_partition_spec,
        iceberg_metadata,
        read_iceberg,
    )

    t = str(tmp_path / "specevo")
    write_iceberg(
        spark, t,
        spark.range(0, 20).select(
            F.col("id").alias("k"), (F.col("id") * 3).alias("v")
        ),
    )
    evolve_iceberg_partition_spec(t, [("kb", "bucket[4]", "k")])
    meta = iceberg_metadata(t)
    assert meta["default-spec-id"] == 1
    assert [s["spec-id"] for s in meta["partition-specs"]] == [0, 1]
    assert meta["partition-specs"][1]["fields"][0]["field-id"] == 1000
    # appends lay out under the evolved spec
    write_iceberg(
        spark, t,
        spark.range(20, 40).select(
            F.col("id").alias("k"), (F.col("id") * 3).alias("v")
        ),
        partition_spec=[("kb", "bucket[4]", "k")],
    )
    got = sorted(r.k for r in read_iceberg(spark, t).collect())
    assert got == list(range(40))
    # pruning: old spec-0 files are unprunable (always kept), new
    # ones prune by bucket — a filtered read is a strict subset that
    # still returns exact rows
    full = read_iceberg(spark, t)
    pruned = read_iceberg(spark, t, partition_filters={"k": 25})
    assert len(pruned.inputFiles()) < len(full.inputFiles())
    assert sorted(
        r.k for r in pruned.where(F.col("k") == 25).collect()
    ) == [25]
    # old rows remain reachable through the filtered plan's kept files
    assert pruned.where(F.col("k") == 5).count() == 1
    with pytest.raises(ValueError, match="not a table column"):
        evolve_iceberg_partition_spec(t, [("x", "identity", "zz")])
    with pytest.raises(ValueError, match="unsupported partition"):
        evolve_iceberg_partition_spec(t, [("x", "wibble", "k")])


def test_iceberg_refs_tags_and_branches(spark, tmp_path):
    """r19 refs: main follows the current snapshot on every commit, a
    tag pins an old snapshot — surviving expire_iceberg_snapshots
    regardless of recency and readable via read_iceberg(ref=...) —
    and ref management guards hold (main is writer-managed, unknown
    snapshot/ref refuse, dropped tags become expirable)."""
    from jobminer_spark.sources.iceberg import (
        drop_iceberg_ref,
        expire_iceberg_snapshots,
        iceberg_metadata,
        resolve_iceberg_ref,
        set_iceberg_ref,
    )

    t = str(tmp_path / "refs")
    write_iceberg(
        spark, t, spark.range(0, 4).select(F.col("id").alias("k"))
    )
    s1 = iceberg_metadata(t)["current-snapshot-id"]
    set_iceberg_ref(t, "v1.0")  # tag the current snapshot
    for lo in (4, 8):
        write_iceberg(
            spark, t,
            spark.range(lo, lo + 4).select(F.col("id").alias("k")),
        )
    meta = iceberg_metadata(t)
    assert meta["refs"]["main"] == {
        "snapshot-id": meta["current-snapshot-id"], "type": "branch",
    }
    assert resolve_iceberg_ref(t, "v1.0") == s1
    assert sorted(
        r.k for r in read_iceberg(spark, t, ref="v1.0").collect()
    ) == list(range(4))
    # expiration keeps the tagged snapshot alive
    _dead, n_exp = expire_iceberg_snapshots(t, keep_last=1)
    assert n_exp == 1  # only the UNtagged middle snapshot expired
    assert sorted(
        r.k for r in read_iceberg(spark, t, ref="v1.0").collect()
    ) == list(range(4))
    assert read_iceberg(spark, t).count() == 12
    # guards
    with pytest.raises(ValueError, match="writer-managed"):
        set_iceberg_ref(t, "main")
    with pytest.raises(ValueError, match="unknown snapshot"):
        set_iceberg_ref(t, "x", snapshot_id=999999)
    with pytest.raises(ValueError, match="no ref"):
        resolve_iceberg_ref(t, "nope")
    with pytest.raises(ValueError, match="mutually exclusive"):
        read_iceberg(spark, t, snapshot_id=s1, ref="v1.0")
    with pytest.raises(ValueError, match="cannot drop the main"):
        drop_iceberg_ref(t, "main")
    # dropping the tag makes its snapshot expirable again
    drop_iceberg_ref(t, "v1.0")
    _dead, n_exp = expire_iceberg_snapshots(t, keep_last=1)
    assert n_exp == 1
    with pytest.raises(ValueError, match="no ref"):
        resolve_iceberg_ref(t, "v1.0")


# ------------------------------------------- rollback + orphan files


def test_rollback_moves_pointer_keeps_history(spark, tmp_path):
    from jobminer_spark.sources.iceberg import (
        iceberg_metadata,
        rollback_iceberg,
    )

    t = str(tmp_path / "rb")
    s1 = write_iceberg(spark, t, _kv(spark, 0, 50))
    s2 = write_iceberg(spark, t, _kv(spark, 50, 80))
    rollback_iceberg(t, s1)
    meta = iceberg_metadata(t)
    assert meta["current-snapshot-id"] == s1
    assert meta["refs"]["main"]["snapshot-id"] == s1
    assert read_iceberg(spark, t).count() == 50
    # history preserved: the rolled-past head is still time-travelable
    assert read_iceberg(spark, t, snapshot_id=s2).count() == 80
    # rolling forward again is the same call with the later id
    rollback_iceberg(t, s2)
    assert read_iceberg(spark, t).count() == 80


def test_rollback_branch_append_and_monotone_sequences(spark, tmp_path):
    from jobminer_spark.sources.iceberg import (
        iceberg_snapshots,
        rollback_iceberg,
    )

    t = str(tmp_path / "rb2")
    s1 = write_iceberg(spark, t, _kv(spark, 0, 50))
    write_iceberg(spark, t, _kv(spark, 50, 80))
    rollback_iceberg(t, s1)
    write_iceberg(spark, t, _kv(spark, 100, 110))
    assert read_iceberg(spark, t).count() == 60
    seqs = [s["sequence-number"] for s in iceberg_snapshots(t)]
    # table-level sequence numbers never rewind through a rollback
    assert seqs == sorted(seqs) and len(set(seqs)) == len(seqs)


def test_rollback_unknown_snapshot_raises(spark, tmp_path):
    from jobminer_spark.sources.iceberg import rollback_iceberg

    t = str(tmp_path / "rb3")
    write_iceberg(spark, t, _kv(spark, 0, 10))
    with pytest.raises(ValueError, match="unknown snapshot-id"):
        rollback_iceberg(t, 999999)


def test_orphan_removal_exact_and_age_gated(spark, tmp_path):
    from jobminer_spark.sources.iceberg import (
        remove_iceberg_orphan_files,
    )

    t = str(tmp_path / "orph")
    write_iceberg(spark, t, _kv(spark, 0, 50))
    write_iceberg(spark, t, _kv(spark, 50, 80))
    planted = [
        os.path.join(t, "data", "zz-crashed-writer.parquet"),
        os.path.join(t, "metadata", "manifest-zz-crashed.avro"),
    ]
    for p in planted:
        with open(p, "wb") as f:
            f.write(b"junk")
    # default 3-day retention protects the fresh plants
    deleted, kept = remove_iceberg_orphan_files(t)
    assert deleted == [] and kept == 2
    # dry run reports without deleting
    deleted, _ = remove_iceberg_orphan_files(t, older_than_ms=0, dry_run=True)
    assert sorted(deleted) == sorted(
        os.path.relpath(p, t) for p in planted
    )
    assert all(os.path.exists(p) for p in planted)
    # the real sweep removes EXACTLY the plants
    deleted, _ = remove_iceberg_orphan_files(t, older_than_ms=0)
    assert sorted(deleted) == sorted(
        os.path.relpath(p, t) for p in planted
    )
    assert not any(os.path.exists(p) for p in planted)
    assert read_iceberg(spark, t).count() == 80


def test_orphan_removal_spares_rolled_past_snapshot_files(
    spark, tmp_path
):
    """Rollback leaves the later snapshot in the list — its files are
    reachable, NOT orphans; a sweep keyed on the current snapshot
    alone would break time travel."""
    from jobminer_spark.sources.iceberg import (
        remove_iceberg_orphan_files,
        rollback_iceberg,
    )

    t = str(tmp_path / "orph2")
    s1 = write_iceberg(spark, t, _kv(spark, 0, 50))
    s2 = write_iceberg(spark, t, _kv(spark, 50, 80))
    rollback_iceberg(t, s1)
    deleted, _ = remove_iceberg_orphan_files(t, older_than_ms=0)
    assert deleted == []
    assert read_iceberg(spark, t, snapshot_id=s2).count() == 80


def test_orphan_removal_never_touches_metadata_versions(spark, tmp_path):
    from jobminer_spark.sources.iceberg import (
        remove_iceberg_orphan_files,
    )

    t = str(tmp_path / "orph3")
    write_iceberg(spark, t, _kv(spark, 0, 20))
    write_iceberg(spark, t, _kv(spark, 20, 40))
    md = os.path.join(t, "metadata")
    before = {f for f in os.listdir(md) if f.endswith(".metadata.json")}
    assert len(before) >= 2  # historical versions present
    remove_iceberg_orphan_files(t, older_than_ms=0)
    after = {f for f in os.listdir(md) if f.endswith(".metadata.json")}
    assert after == before
    assert os.path.exists(os.path.join(md, "version-hint.text"))


def test_orphan_removal_spares_uniform_delta_log(spark, tmp_path):
    """ADVICE r19 (high): on a UniForm table — Iceberg metadata/
    published INSIDE a Delta table dir — the orphan sweep must never
    treat `_delta_log/` commit JSONs (or `_symlink_format_manifest/`)
    as orphan candidates: no Iceberg snapshot references them, but
    deleting them destroys the Delta transaction log of the SHARED
    table. Underscore-prefixed directories are excluded from the
    walk, mirroring vacuum_delta."""
    from jobminer_spark.sources.delta import (
        generate_symlink_manifest,
        read_delta,
        write_delta,
    )
    from jobminer_spark.sources.iceberg import (
        remove_iceberg_orphan_files,
    )
    from jobminer_spark.sources.uniform import (
        write_uniform_iceberg_metadata,
    )

    t = str(tmp_path / "uniorph")
    write_delta(spark, t, _kv(spark, 0, 20))
    write_delta(spark, t, _kv(spark, 20, 30))
    write_uniform_iceberg_metadata(t)
    generate_symlink_manifest(t)
    log_before = sorted(os.listdir(os.path.join(t, "_delta_log")))
    sym_before = os.path.exists(
        os.path.join(t, "_symlink_format_manifest")
    )
    assert log_before and sym_before
    # the aggressive sweep the audit itself uses — nothing Delta-side
    # may be touched
    deleted, _ = remove_iceberg_orphan_files(t, older_than_ms=0)
    assert not any(d.startswith("_") for d in deleted)
    assert sorted(os.listdir(os.path.join(t, "_delta_log"))) == log_before
    assert os.path.exists(os.path.join(t, "_symlink_format_manifest"))
    assert read_delta(spark, t).count() == 30
    assert read_iceberg(spark, t).count() == 30


def test_row_lineage_upgrade_existing_pre_v3_table(spark, tmp_path):
    """ADVICE r19 (low): row_lineage=True on an EXISTING pre-v3 table
    must not be silently ignored — the append performs the v3 upgrade
    in the same commit (format-version 3 + next-row-id, the first-DV
    commit's shape) and the appended files get lineage ranges."""
    from jobminer_spark.sources.iceberg import iceberg_metadata

    t = str(tmp_path / "rlup")
    write_iceberg(spark, t, _kv(spark, 0, 10))
    meta = iceberg_metadata(t)
    assert meta.get("format-version", 1) < 3
    write_iceberg(spark, t, _kv(spark, 10, 25), row_lineage=True)
    meta = iceberg_metadata(t)
    assert meta["format-version"] == 3
    # the 15 appended rows reserved [0, 15) of the row-id space
    assert int(meta["next-row-id"]) == 15
    snaps = meta["snapshots"]
    assert snaps[-1].get("first-row-id") == 0
    # pre-upgrade snapshot carries no lineage, per the spec's upgrade
    assert "first-row-id" not in snaps[0]
    assert read_iceberg(spark, t).count() == 25


def test_branch_write_and_fast_forward_wap(spark, tmp_path):
    """r20 branch writes (VERDICT r19 item 6): the write-audit-
    publish loop — a commit onto a named branch builds on the BRANCH
    head and advances only that ref (main and plain reads see
    nothing), the branch read serves the staged rows, and
    fast_forward_iceberg publishes by moving main (and
    current-snapshot-id) to the branch head."""
    from jobminer_spark.sources.iceberg import (
        fast_forward_iceberg,
        iceberg_metadata,
        resolve_iceberg_ref,
        set_iceberg_ref,
    )

    t = str(tmp_path / "wap")
    write_iceberg(spark, t, _kv(spark, 0, 10))
    main_before = iceberg_metadata(t)["current-snapshot-id"]
    set_iceberg_ref(t, "audit", ref_type="branch")
    # two staged commits on the branch — the second builds on the
    # first (branch head base), not on main
    write_iceberg(spark, t, _kv(spark, 10, 15), branch="audit")
    write_iceberg(spark, t, _kv(spark, 15, 20), branch="audit")
    meta = iceberg_metadata(t)
    assert meta["current-snapshot-id"] == main_before
    assert resolve_iceberg_ref(t, "main") == main_before
    assert read_iceberg(spark, t).count() == 10  # plain read: main
    assert sorted(
        r.k for r in read_iceberg(spark, t, ref="audit").collect()
    ) == list(range(20))
    # publish: fast-forward main to the audited branch head
    head = resolve_iceberg_ref(t, "audit")
    assert fast_forward_iceberg(t, "main", "audit") == head
    meta = iceberg_metadata(t)
    assert meta["current-snapshot-id"] == head
    assert sorted(r.k for r in read_iceberg(spark, t).collect()) == (
        list(range(20))
    )
    # parentage was recorded along the branch
    parents = {
        s["snapshot-id"]: s.get("parent-snapshot-id")
        for s in meta["snapshots"]
    }
    assert parents[head] is not None


def test_branch_write_guards_and_divergence_refusal(spark, tmp_path):
    """Branch-write guards: unknown branch refuses (refs are created
    explicitly), a tag is not a writable branch, and fast-forward
    refuses a DIVERGED target (main advanced past the branch point)
    instead of silently discarding its commits."""
    from jobminer_spark.sources.iceberg import (
        fast_forward_iceberg,
        set_iceberg_ref,
    )

    t = str(tmp_path / "wapg")
    write_iceberg(spark, t, _kv(spark, 0, 5))
    with pytest.raises(ValueError, match="no branch"):
        write_iceberg(spark, t, _kv(spark, 5, 6), branch="nope")
    set_iceberg_ref(t, "pin", ref_type="tag")
    with pytest.raises(ValueError, match="no branch"):
        write_iceberg(spark, t, _kv(spark, 5, 6), branch="pin")
    # diverge: branch from here, then commit to BOTH main and branch
    set_iceberg_ref(t, "side", ref_type="branch")
    write_iceberg(spark, t, _kv(spark, 5, 8), branch="side")
    write_iceberg(spark, t, _kv(spark, 8, 10))  # main moves too
    with pytest.raises(ValueError, match="not a fast-forward"):
        fast_forward_iceberg(t, "main", "side")
    # the other direction IS a fast-forward... no: side lacks main's
    # new commit, so it diverged symmetrically
    with pytest.raises(ValueError, match="not a fast-forward"):
        fast_forward_iceberg(t, "side", "main")
    # a branch that only trails main fast-forwards cleanly
    set_iceberg_ref(t, "trail", ref_type="branch")
    write_iceberg(spark, t, _kv(spark, 10, 12))
    # main holds 0-5 and 8-12 (the 5-8 commit lives only on "side")
    assert read_iceberg(spark, t, ref="trail").count() == 7
    fast_forward_iceberg(t, "trail", "main")
    assert read_iceberg(spark, t, ref="trail").count() == 9


def test_branch_write_composes_with_stream_commit(spark, tmp_path):
    """The exactly-once sink can target a WAP branch: stream_commit
    and branch are independent write_iceberg parameters — staged
    micro-batches advance only the branch while their (app, batch)
    watermarks are still visible to last_iceberg_stream_batch
    (snapshot summaries are table-global), so a restarted sink skips
    re-delivered batches BEFORE publish; fast-forward then exposes
    the rows to plain readers."""
    from jobminer_spark.sources.iceberg import (
        fast_forward_iceberg,
        iceberg_metadata,
        last_iceberg_stream_batch,
        set_iceberg_ref,
    )

    t = str(tmp_path / "wapstream")
    write_iceberg(spark, t, _kv(spark, 0, 5))
    main_before = iceberg_metadata(t)["current-snapshot-id"]
    set_iceberg_ref(t, "staging", ref_type="branch")
    app = "sink-app"
    write_iceberg(
        spark, t, _kv(spark, 5, 8),
        branch="staging", stream_commit=(app, 0),
    )
    write_iceberg(
        spark, t, _kv(spark, 8, 10),
        branch="staging", stream_commit=(app, 1),
    )
    # watermark visible pre-publish; main untouched
    assert last_iceberg_stream_batch(t, app) == 1
    assert iceberg_metadata(t)["current-snapshot-id"] == main_before
    assert read_iceberg(spark, t).count() == 5
    fast_forward_iceberg(t, "main", "staging")
    assert read_iceberg(spark, t).count() == 10
    assert last_iceberg_stream_batch(t, app) == 1


def test_orphan_removal_spares_stale_uniform_delta_adds(
    spark, tmp_path
):
    """r20 follow-through on the UniForm guard: when the Delta side
    of a dual-format table has committed PAST the last Iceberg export
    (stale Iceberg view), the newer Delta data files are live data
    the Iceberg metadata simply hasn't published yet — an aggressive
    orphan sweep must fold the Delta current snapshot into the
    reachable set, not delete the other format's live files."""
    from jobminer_spark.sources.delta import read_delta, write_delta
    from jobminer_spark.sources.iceberg import (
        remove_iceberg_orphan_files,
    )
    from jobminer_spark.sources.uniform import (
        write_uniform_iceberg_metadata,
    )

    t = str(tmp_path / "unistale")
    write_delta(spark, t, _kv(spark, 0, 10))
    write_uniform_iceberg_metadata(t)
    # Delta commits past the export — the Iceberg view is now stale
    write_delta(spark, t, _kv(spark, 10, 25))
    deleted, _ = remove_iceberg_orphan_files(t, older_than_ms=0)
    assert deleted == []
    assert read_delta(spark, t).count() == 25
    # the stale Iceberg view still serves its snapshot
    assert read_iceberg(spark, t).count() == 10
    # refresh and re-sweep: only the SUPERSEDED export's manifests
    # are collectable (each export replaces the snapshot view) —
    # never data files
    write_uniform_iceberg_metadata(t)
    deleted, _ = remove_iceberg_orphan_files(t, older_than_ms=0)
    assert all(
        d.startswith("metadata/") and d.endswith(".avro")
        for d in deleted
    )
    assert read_iceberg(spark, t).count() == 25
    assert read_delta(spark, t).count() == 25
