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
