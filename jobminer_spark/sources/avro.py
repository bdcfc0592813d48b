"""Avro source/sink without the spark-avro JAR: a pure-Python Object
Container File codec (the PUBLIC Avro 1.x spec) plus a distributed
Spark decode path.

VERDICT r14 lists the Avro source among the environment-blocked gaps
("spark-avro jar absent"). The jar is absent, but the FORMAT is an
open spec (https://avro.apache.org/docs/current/specification/): a
container file is

    magic "Obj\\x01" | file-metadata map (avro.schema JSON,
    avro.codec) | 16-byte sync marker | data blocks
    (record-count LONG, byte-size LONG, codec-compressed datum bytes,
    sync marker) ...

and datum encoding is schema-driven: zigzag-varint ints/longs,
little-endian float/double, length-prefixed bytes/strings, index-
prefixed unions, block-encoded arrays/maps, fields-in-order records.
This module implements that spec for the types a tabular engine
needs — null, boolean, int, long, float, double, bytes, string,
fixed, enum, record, array, map, and 2-branch null unions — with
``null`` and ``deflate`` codecs (deflate is raw RFC-1951, wbits=-15).

Spark integration:
* ``read_avro(spark, path)`` — DISTRIBUTED decode: list the .avro
  files, parallelize one task per file, decode executor-side in the
  Python worker, return a typed DataFrame (Avro schema mapped to
  Spark types; nullable via ["null", T] unions). File-per-task is the
  same parallelism unit spark-avro uses for un-splittable codecs; the
  pure-Python decoder is the slow path relative to the JVM reader,
  stated plainly — it exists because the jar cannot (offline), and
  the decode is embarrassingly parallel so throughput scales with
  executors.
* ``write_avro_dataset(spark, df, path)`` — one container file per
  partition, encoded executor-side (local-mode writes land on the
  shared filesystem; a cluster deployment points this at DFS).
* driver-side ``read_avro_records`` / ``write_avro_file`` for bounded
  metadata files — the entry point the Iceberg manifest reader uses.
"""

from __future__ import annotations

import io
import json
import os
import struct
import zlib

MAGIC = b"Obj\x01"
SYNC = bytes(range(16))  # deterministic sync marker for written files


# ---------------------------------------------------------------------------
# binary primitives
# ---------------------------------------------------------------------------


def _read_long(buf: io.BytesIO) -> int:
    """Zigzag varint (Avro int and long share the encoding)."""
    shift = 0
    acc = 0
    while True:
        b = buf.read(1)
        if not b:
            raise EOFError("truncated varint")
        byte = b[0]
        acc |= (byte & 0x7F) << shift
        if not byte & 0x80:
            break
        shift += 7
    return (acc >> 1) ^ -(acc & 1)


def _write_long(out: io.BytesIO, n: int) -> None:
    n = (n << 1) ^ (n >> 63) if n < 0 else n << 1
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.write(bytes([b | 0x80]))
        else:
            out.write(bytes([b]))
            break


def _read_bytes(buf: io.BytesIO) -> bytes:
    n = _read_long(buf)
    data = buf.read(n)
    if len(data) != n:
        raise EOFError("truncated bytes")
    return data


def _write_bytes(out: io.BytesIO, data: bytes) -> None:
    _write_long(out, len(data))
    out.write(data)


# ---------------------------------------------------------------------------
# schema-driven datum codec
# ---------------------------------------------------------------------------


def _decode(schema, buf: io.BytesIO):
    if isinstance(schema, str):
        t = schema
    elif isinstance(schema, list):  # union: long index, then datum
        idx = _read_long(buf)
        return _decode(schema[idx], buf)
    else:
        t = schema["type"]
    if t == "null":
        return None
    if t == "boolean":
        return buf.read(1) == b"\x01"
    if t in ("int", "long"):
        return _read_long(buf)
    if t == "float":
        return struct.unpack("<f", buf.read(4))[0]
    if t == "double":
        return struct.unpack("<d", buf.read(8))[0]
    if t == "bytes":
        return _read_bytes(buf)
    if t == "string":
        return _read_bytes(buf).decode("utf-8")
    if t == "fixed":
        return buf.read(schema["size"])
    if t == "enum":
        return schema["symbols"][_read_long(buf)]
    if t == "record":
        return {
            f["name"]: _decode(f["type"], buf) for f in schema["fields"]
        }
    if t == "array":
        out = []
        while True:
            n = _read_long(buf)
            if n == 0:
                return out
            if n < 0:  # negative count: byte size follows (skippable)
                _read_long(buf)
                n = -n
            for _ in range(n):
                out.append(_decode(schema["items"], buf))
    if t == "map":
        out = {}
        while True:
            n = _read_long(buf)
            if n == 0:
                return out
            if n < 0:
                _read_long(buf)
                n = -n
            for _ in range(n):
                k = _read_bytes(buf).decode("utf-8")
                out[k] = _decode(schema["values"], buf)
    if isinstance(schema, dict) and isinstance(schema["type"], (dict, list)):
        return _decode(schema["type"], buf)  # nested named/union wrapper
    raise ValueError(f"unsupported Avro type: {t!r}")


def _encode(schema, value, out: io.BytesIO) -> None:
    if isinstance(schema, str):
        t = schema
    elif isinstance(schema, list):  # union: pick the branch
        for i, branch in enumerate(schema):
            bt = branch if isinstance(branch, str) else branch["type"]
            if (value is None) == (bt == "null"):
                _write_long(out, i)
                _encode(branch, value, out)
                return
        raise ValueError(f"no union branch for {value!r} in {schema!r}")
    else:
        t = schema["type"]
    if t == "null":
        return
    if t == "boolean":
        out.write(b"\x01" if value else b"\x00")
    elif t in ("int", "long"):
        _write_long(out, int(value))
    elif t == "float":
        out.write(struct.pack("<f", value))
    elif t == "double":
        out.write(struct.pack("<d", value))
    elif t == "bytes":
        _write_bytes(out, bytes(value))
    elif t == "string":
        _write_bytes(out, value.encode("utf-8"))
    elif t == "fixed":
        out.write(bytes(value))
    elif t == "enum":
        _write_long(out, schema["symbols"].index(value))
    elif t == "record":
        for f in schema["fields"]:
            _encode(f["type"], value.get(f["name"]), out)
    elif t == "array":
        if value:
            _write_long(out, len(value))
            for v in value:
                _encode(schema["items"], v, out)
        _write_long(out, 0)
    elif t == "map":
        if value:
            _write_long(out, len(value))
            for k, v in value.items():
                _write_bytes(out, k.encode("utf-8"))
                _encode(schema["values"], v, out)
        _write_long(out, 0)
    else:
        raise ValueError(f"unsupported Avro type: {t!r}")


# ---------------------------------------------------------------------------
# container files
# ---------------------------------------------------------------------------


def _read_meta_map(buf: io.BytesIO) -> dict[str, bytes]:
    meta: dict[str, bytes] = {}
    while True:
        n = _read_long(buf)
        if n == 0:
            return meta
        if n < 0:
            _read_long(buf)
            n = -n
        for _ in range(n):
            k = _read_bytes(buf).decode("utf-8")
            meta[k] = _read_bytes(buf)


def read_avro_records(path: str) -> tuple[dict, list[dict]]:
    """Decode a whole container file driver-side: (schema, records).
    For bounded files (Iceberg manifests, small feeds); big datasets
    go through read_avro's one-task-per-file distributed path."""
    with open(path, "rb") as f:
        data = f.read()
    buf = io.BytesIO(data)
    if buf.read(4) != MAGIC:
        raise ValueError(f"not an Avro container file: {path}")
    meta = _read_meta_map(buf)
    schema = json.loads(meta["avro.schema"])
    codec = meta.get("avro.codec", b"null").decode()
    if codec not in ("null", "deflate"):
        raise ValueError(f"unsupported Avro codec: {codec}")
    sync = buf.read(16)
    records: list[dict] = []
    while buf.tell() < len(data):
        n = _read_long(buf)
        size = _read_long(buf)
        block = buf.read(size)
        if codec == "deflate":
            block = zlib.decompress(block, wbits=-15)
        bbuf = io.BytesIO(block)
        for _ in range(n):
            records.append(_decode(schema, bbuf))
        if buf.read(16) != sync:
            raise ValueError(f"sync marker mismatch in {path}")
    return schema, records


def write_avro_file(
    path: str,
    schema: dict,
    records: list[dict],
    codec: str = "deflate",
    block_records: int = 4096,
) -> None:
    """Encode records into a spec-compliant container file."""
    if codec not in ("null", "deflate"):
        raise ValueError(f"unsupported Avro codec: {codec}")
    out = io.BytesIO()
    out.write(MAGIC)
    meta = {
        "avro.schema": json.dumps(schema).encode(),
        "avro.codec": codec.encode(),
    }
    _write_long(out, len(meta))
    for k, v in meta.items():
        _write_bytes(out, k.encode())
        _write_bytes(out, v)
    _write_long(out, 0)
    out.write(SYNC)
    for i in range(0, max(len(records), 1), block_records):
        chunk = records[i : i + block_records]
        if not chunk:
            break
        body = io.BytesIO()
        for r in chunk:
            _encode(schema, r, body)
        payload = body.getvalue()
        if codec == "deflate":
            co = zlib.compressobj(wbits=-15)
            payload = co.compress(payload) + co.flush()
        _write_long(out, len(chunk))
        _write_long(out, len(payload))
        out.write(payload)
        out.write(SYNC)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "wb") as f:
        f.write(out.getvalue())


# ---------------------------------------------------------------------------
# Spark integration
# ---------------------------------------------------------------------------

_AVRO_TO_SPARK = {
    "boolean": "boolean",
    "int": "int",
    "long": "long",
    "float": "float",
    "double": "double",
    "bytes": "binary",
    "string": "string",
}


def _field_spark_type(ftype) -> str:
    """Spark SQL type for a top-level Avro field (primitives and
    ["null", primitive] unions — the tabular subset)."""
    if isinstance(ftype, list):
        non_null = [b for b in ftype if b != "null"]
        if len(non_null) != 1:
            raise ValueError(f"unsupported union for a column: {ftype!r}")
        return _field_spark_type(non_null[0])
    if isinstance(ftype, dict):
        if ftype["type"] == "array":
            return f"array<{_field_spark_type(ftype['items'])}>"
        if ftype["type"] == "enum":
            return "string"
        return _field_spark_type(ftype["type"])
    if ftype in _AVRO_TO_SPARK:
        return _AVRO_TO_SPARK[ftype]
    raise ValueError(f"unsupported Avro column type: {ftype!r}")


def _arrow_type(ftype):
    """pyarrow type for a top-level Avro field — mirrors
    _field_spark_type so the Arrow batches match the declared Spark
    schema exactly."""
    import pyarrow as pa

    prim = {
        "boolean": pa.bool_(),
        "int": pa.int32(),
        "long": pa.int64(),
        "float": pa.float32(),
        "double": pa.float64(),
        "bytes": pa.binary(),
        "string": pa.string(),
    }
    if isinstance(ftype, list):
        non_null = [b for b in ftype if b != "null"]
        if len(non_null) != 1:
            raise ValueError(f"unsupported union for a column: {ftype!r}")
        return _arrow_type(non_null[0])
    if isinstance(ftype, dict):
        if ftype["type"] == "array":
            return pa.list_(_arrow_type(ftype["items"]))
        if ftype["type"] == "enum":
            return pa.string()
        return _arrow_type(ftype["type"])
    if ftype in prim:
        return prim[ftype]
    raise ValueError(f"unsupported Avro column type: {ftype!r}")


def _arrow_schema(schema: dict):
    import pyarrow as pa

    return pa.schema(
        [
            pa.field(f["name"], _arrow_type(f["type"]))
            for f in schema["fields"]
        ]
    )


def avro_spark_schema(schema: dict) -> str:
    """DDL string for a flat-record Avro schema."""
    return ", ".join(
        f"{f['name']} {_field_spark_type(f['type'])}"
        for f in schema["fields"]
    )


def read_avro(spark, path: str):
    """Distributed Avro read: one decode task per container file. The
    schema comes from the first file's header (driver-side footer-
    style probe); every file must share it (enforced per task)."""
    if os.path.isdir(path):
        files = sorted(
            os.path.join(path, f)
            for f in os.listdir(path)
            if f.endswith(".avro")
        )
    else:
        files = [path]
    if not files:
        raise FileNotFoundError(f"no .avro files under {path}")
    # Parse the header straight off the open handle (the varint
    # decoder consumes any binary stream) — a fixed-size head slice
    # would turn a >1 MiB file-metadata map into a misleading
    # EOFError('truncated varint') (review r15)
    with open(files[0], "rb") as f:
        if f.read(4) != MAGIC:
            raise ValueError(f"not an Avro container file: {files[0]}")
        schema = json.loads(_read_meta_map(f)["avro.schema"])
    ddl = avro_spark_schema(schema)
    arrow_schema = _arrow_schema(schema)
    field_names = [f["name"] for f in schema["fields"]]
    expected = json.dumps(schema, sort_keys=True)

    # Arrow batches end-to-end (mapInArrow, not mapInPandas): pandas
    # would coerce a nullable int64 column to float64, silently
    # rounding longs >= 2^53 and conflating NaN with NULL (review
    # r15) — Arrow carries exact int64-with-validity and keeps NaN
    # and NULL distinct.
    def _decode_files(iterator):
        import pyarrow as pa

        for batch in iterator:
            for fpath in batch.column("path").to_pylist():
                fschema, records = read_avro_records(fpath)
                if json.dumps(fschema, sort_keys=True) != expected:
                    raise ValueError(
                        f"schema mismatch across files: {fpath}"
                    )
                yield pa.RecordBatch.from_pylist(
                    [
                        {name: r.get(name) for name in field_names}
                        for r in records
                    ],
                    schema=arrow_schema,
                )

    paths_df = spark.createDataFrame(
        [(p,) for p in files], "path string"
    ).repartition(len(files), "path")
    return paths_df.mapInArrow(_decode_files, ddl)


def write_avro_dataset(spark, df, path: str, codec: str = "deflate") -> int:
    """One container file per partition, encoded executor-side;
    returns the number of files written. The Avro schema is derived
    from the DataFrame schema (nullable columns become ["null", T]
    unions)."""
    spark_to_avro = {
        "boolean": "boolean",
        "int": "int",
        "bigint": "long",
        "float": "float",
        "double": "double",
        "binary": "bytes",
        "string": "string",
    }
    fields = []
    for f in df.schema.fields:
        t = f.dataType.simpleString()
        at = spark_to_avro.get(t)
        if at is None:
            raise ValueError(f"unsupported column type for Avro: {t}")
        fields.append(
            {"name": f.name, "type": ["null", at] if f.nullable else at}
        )
    schema = {"type": "record", "name": "row", "fields": fields}
    os.makedirs(path, exist_ok=True)

    # Arrow batches (mapInArrow): to_pylist() yields exact Python
    # values — int64 stays int (no float64 coercion of nullable
    # columns), NULL is None, and a genuine NaN double stays NaN and
    # round-trips through the double encoding (review r15).
    def _write_part(iterator):
        import uuid as _uuid

        import pyarrow as pa

        records: list[dict] = []
        for batch in iterator:
            records.extend(batch.to_pylist())
        n_schema = pa.schema([pa.field("n", pa.int64())])
        if records:
            fname = os.path.join(path, f"part-{_uuid.uuid4().hex}.avro")
            write_avro_file(fname, schema, records, codec=codec)
            yield pa.RecordBatch.from_pylist([{"n": len(records)}], n_schema)
        else:
            yield pa.RecordBatch.from_pylist([], n_schema)

    counts = df.mapInArrow(_write_part, "n long").collect()
    return len([c for c in counts if c["n"] is not None])
