"""Puffin file format (Apache Iceberg's stats/blob sidecar) — the
pure-Python subset Iceberg format v3 deletion vectors need: the
container layout (magic, blobs, JSON footer) and the
``deletion-vector-v1`` blob codec.

Public layout, from the Iceberg Puffin spec:

* file:   Magic | blob bytes... | footer
* footer: Magic | FooterPayload (UTF-8 JSON, optionally compressed) |
          FooterPayloadSize (int32 LE) | Flags (4 bytes) | Magic
* magic:  the 4 bytes 'P' 'F' 'A' '1'

FooterPayload JSON: {"blobs": [{type, fields, snapshot-id,
sequence-number, offset, length, compression-codec?, properties}, ...],
"properties": {...}}. Flags bit 0 of byte 0 = footer compressed (LZ4)
— this writer never sets it and the reader rejects it loudly rather
than mis-parse.

``deletion-vector-v1`` blob (format v3 spec):

* combined length of the vector + magic, as 4 bytes BIG-endian
* the 4 magic bytes D1 D3 39 64
* the vector: a Roaring64NavigableMap "portable" serialization —
  int64 LE bitmap count, then per 32-bit bitmap its KEY (int32 LE,
  the high word) followed by a standard 32-bit Roaring bitmap. (This
  differs from Delta's RoaringBitmapArray, which stores a DENSE
  keyless bitmap array behind its own magic — the 32-bit container
  codecs in sources/roaring.py are shared, the 64-bit framing is
  not.)
* CRC-32 of magic + vector, 4 bytes BIG-endian

Reference: the Apache Iceberg spec (Puffin file format + v3
deletion vectors) — public documents; no Iceberg library code is
used or consulted.
"""

from __future__ import annotations

import json
import struct
import zlib

from jobminer_spark.sources.roaring import (
    _deserialize_rb32,
    _serialize_rb32,
)

MAGIC = b"PFA1"
_DV_MAGIC = bytes((0xD1, 0xD3, 0x39, 0x64))


def _serialize_roaring64_portable(positions: list[int]) -> bytes:
    """Roaring64NavigableMap portable bytes for sorted-or-not 64-bit
    positions: int64 LE count, then (key int32 LE, 32-bit roaring
    bitmap) per non-empty high word, keys ascending unsigned."""
    values = sorted(set(positions))
    if values and values[0] < 0:
        raise ValueError("row positions must be non-negative")
    by_high: dict[int, list[int]] = {}
    for v in values:
        by_high.setdefault(v >> 32, []).append(v & 0xFFFFFFFF)
    out = bytearray(struct.pack("<q", len(by_high)))
    for high in sorted(by_high):
        out += struct.pack("<i", high)
        out += _serialize_rb32(by_high[high])
    return bytes(out)


def _deserialize_roaring64_portable(data: bytes) -> list[int]:
    if len(data) < 8:
        raise ValueError("roaring64 payload too short")
    (n,) = struct.unpack_from("<q", data, 0)
    pos = 8
    out: list[int] = []
    for _ in range(n):
        (high,) = struct.unpack_from("<i", data, pos)
        pos += 4
        values, pos = _deserialize_rb32(data, pos)
        out.extend((high << 32) | v for v in values)
    return out


def serialize_dv_blob(positions: list[int]) -> bytes:
    """deletion-vector-v1 blob bytes (length + magic + vector + CRC)."""
    vector = _serialize_roaring64_portable(positions)
    body = _DV_MAGIC + vector
    return (
        struct.pack(">i", len(body))
        + body
        + struct.pack(">I", zlib.crc32(body) & 0xFFFFFFFF)
    )


def deserialize_dv_blob(data: bytes) -> list[int]:
    """Decode a deletion-vector-v1 blob, verifying framing + CRC."""
    if len(data) < 12:
        raise ValueError("deletion-vector blob too short")
    (body_len,) = struct.unpack_from(">i", data, 0)
    if body_len + 8 != len(data):
        raise ValueError(
            f"deletion-vector blob length mismatch: header says "
            f"{body_len} + 8 framing, got {len(data)} bytes"
        )
    body = data[4 : 4 + body_len]
    if body[:4] != _DV_MAGIC:
        raise ValueError(
            f"bad deletion-vector magic {body[:4].hex()} "
            f"(expected {_DV_MAGIC.hex()})"
        )
    (crc,) = struct.unpack_from(">I", data, 4 + body_len)
    if crc != (zlib.crc32(body) & 0xFFFFFFFF):
        raise ValueError("deletion-vector blob CRC mismatch")
    return _deserialize_roaring64_portable(body[4:])


def write_puffin(path: str, blobs: list[dict]) -> list[dict]:
    """Write a Puffin file. Each blob dict: {"type": str, "payload":
    bytes, and optional "fields" (list[int]), "snapshot_id",
    "sequence_number", "properties" (dict)}. Returns the footer blob
    records (with offset/length filled in) so the caller can build
    manifest entries pointing into the file."""
    records: list[dict] = []
    with open(path, "wb") as f:
        f.write(MAGIC)
        for b in blobs:
            offset = f.tell()
            payload = b["payload"]
            f.write(payload)
            records.append(
                {
                    "type": b["type"],
                    "fields": list(b.get("fields") or []),
                    "snapshot-id": int(b.get("snapshot_id") or 0),
                    "sequence-number": int(
                        b.get("sequence_number") or 0
                    ),
                    "offset": offset,
                    "length": len(payload),
                    "properties": dict(b.get("properties") or {}),
                }
            )
        footer = json.dumps(
            {"blobs": records, "properties": {}}
        ).encode()
        f.write(MAGIC)
        f.write(footer)
        f.write(struct.pack("<i", len(footer)))
        f.write(b"\x00\x00\x00\x00")  # flags: footer uncompressed
        f.write(MAGIC)
    return records


def read_puffin_footer(path: str) -> dict:
    """Parse a Puffin file's JSON footer (refusing compressed footers
    and bad magic loudly)."""
    with open(path, "rb") as f:
        head = f.read(4)
        if head != MAGIC:
            raise ValueError(f"not a Puffin file (magic {head!r})")
        f.seek(-12, 2)
        size_b = f.read(4)
        flags = f.read(4)
        tail = f.read(4)
        if tail != MAGIC:
            raise ValueError("Puffin trailing magic missing")
        if flags[0] & 0x01:
            raise ValueError(
                "compressed Puffin footer not supported — refusing "
                "rather than mis-parse"
            )
        (size,) = struct.unpack("<i", size_b)
        f.seek(-(12 + size + 4), 2)
        lead = f.read(4)
        if lead != MAGIC:
            raise ValueError("Puffin footer lead magic missing")
        return json.loads(f.read(size).decode())


def read_puffin_blob(path: str, offset: int, length: int) -> bytes:
    with open(path, "rb") as f:
        f.seek(offset)
        data = f.read(length)
    if len(data) != length:
        raise ValueError(
            f"truncated Puffin blob: wanted {length} bytes at "
            f"{offset}, got {len(data)}"
        )
    return data
