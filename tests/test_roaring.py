"""Deletion-vector bitmap codec (sources/roaring.py): Z85 against the
RFC 32 test vector, RoaringBitmapArray round trips across all three
container kinds, foreign run-container parsing, and the DV file
layout's size/CRC enforcement."""

from __future__ import annotations

import os
import struct

import pytest

from jobminer_spark.sources.roaring import (
    _MAGIC,
    deserialize_rba,
    read_dv_file,
    serialize_rba,
    write_dv_file,
    z85_decode,
    z85_encode,
)


def test_z85_rfc32_vector():
    # the ZeroMQ RFC 32 reference vector
    raw = bytes([0x86, 0x4F, 0xD2, 0x6F, 0xB5, 0x59, 0xF7, 0x5B])
    assert z85_encode(raw) == "HelloWorld"
    assert z85_decode("HelloWorld") == raw


def test_z85_roundtrip_and_errors():
    for n in (0, 4, 16, 40):
        b = os.urandom(n)
        assert z85_decode(z85_encode(b)) == b
    with pytest.raises(ValueError, match="multiple of 4"):
        z85_encode(b"abc")
    with pytest.raises(ValueError, match="multiple of 5"):
        z85_decode("abcd")
    with pytest.raises(ValueError, match="invalid Z85"):
        z85_decode("abc,e")


def test_rba_roundtrip_array_bitmap_and_high_words():
    import random

    rng = random.Random(7)
    vals = (
        rng.sample(range(0, 60_000), 5000)  # bitmap container territory
        + [1, 2, 65_537]  # small array containers
        + [(1 << 32) + 5, (3 << 32) + 7]  # higher 32-bit bitmaps
    )
    assert deserialize_rba(serialize_rba(vals)) == sorted(set(vals))
    assert deserialize_rba(serialize_rba([])) == []
    dense = list(range(5000))  # one >4096-cardinality key -> bitmap
    assert deserialize_rba(serialize_rba(dense)) == dense


def test_rba_parses_foreign_run_containers():
    # cookie 12347 with the container count packed in the high bits
    # and a run bitset — the shape delta-spark writes for contiguous
    # deletes; our serializer never emits it, the parser must accept it
    header = struct.pack("<iq", _MAGIC, 1)
    cookie = 12347 | (0 << 16)  # one container
    rb = (
        struct.pack("<i", cookie)
        + bytes([0b1])  # container 0 is a run container
        + struct.pack("<HH", 0, 10)  # key 0, cardinality 11
        + struct.pack("<H", 1)  # one run
        + struct.pack("<HH", 10, 10)  # [10, 20]
    )
    assert deserialize_rba(header + rb) == list(range(10, 21))


def test_rba_rejects_bad_magic():
    with pytest.raises(ValueError, match="magic"):
        deserialize_rba(struct.pack("<iq", 123, 0))


def test_dv_file_roundtrip_and_corruption(tmp_path):
    p = str(tmp_path / "dv.bin")
    off, size = write_dv_file(p, [3, 5, 9])
    assert read_dv_file(p, off, size) == [3, 5, 9]
    with pytest.raises(ValueError, match="size mismatch"):
        read_dv_file(p, off, size + 4)
    # flip a payload byte: CRC must catch it
    with open(p, "r+b") as f:
        f.seek(off + 4 + 2)
        b = f.read(1)
        f.seek(off + 4 + 2)
        f.write(bytes([b[0] ^ 0xFF]))
    with pytest.raises(ValueError, match="checksum"):
        read_dv_file(p, off, size)
