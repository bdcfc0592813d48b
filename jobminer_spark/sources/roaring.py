"""Delta deletion-vector bitmap codec — Z85 text encoding plus the
64-bit RoaringBitmapArray "portable" serialization, pure Python.

The Delta protocol (PROTOCOL.md, "Deletion Vectors") stores the set of
deleted row indices of a data file as a RoaringBitmapArray: a
little-endian stream of

  int32  magic = 1681511377
  int64  number of 32-bit roaring bitmaps N
  N x    standard 32-bit RoaringBitmap portable serializations

where bitmap ``i`` holds the low 32 bits of every deleted index whose
high 32 bits equal ``i`` (indexes are dense from 0, so N is tiny for
any real file). The inner 32-bit format is the public cross-language
RoaringFormatSpec (https://github.com/RoaringBitmap/RoaringFormatSpec):
a cookie (12346 = no run containers + int32 container count, or 12347
with the count packed in the cookie's high 16 bits + a run-container
bitset), per-container descriptive headers (uint16 key, uint16
cardinality-1), an optional offsets section, then the containers —
array (uint16 values), bitmap (8 KiB fixed), or run (uint16 pairs).

Descriptors reference DV payloads either inline ("i") or in ``.bin``
files ("u"/"p"); both the inline text and the "u" path UUID use Z85
(ZeroMQ RFC 32: 4 bytes -> 5 chars over an 85-char alphabet), which
the stdlib lacks, so it is implemented here from the RFC.

The SERIALIZER always emits the no-run-container layout (cookie 12346,
offsets present, array containers up to the spec's 4096-cardinality
limit, bitmap containers above) — spec-valid output any external
roaring reader accepts. The PARSER additionally accepts run containers
and the packed cookie, so foreign-written DVs (delta-spark writes runs
for contiguous deletes) decode correctly.
"""

from __future__ import annotations

import struct
import zlib

_Z85_ALPHABET = (
    "0123456789abcdefghijklmnopqrstuvwxyz"
    "ABCDEFGHIJKLMNOPQRSTUVWXYZ.-:+=^!/*?&<>()[]{}@%$#"
)
_Z85_DECODE = {c: i for i, c in enumerate(_Z85_ALPHABET)}

_MAGIC = 1681511377
_SERIAL_COOKIE_NO_RUN = 12346
_SERIAL_COOKIE_RUN = 12347
_ARRAY_MAX_CARD = 4096
_NO_OFFSET_THRESHOLD = 4


def z85_encode(data: bytes) -> str:
    """ZeroMQ Z85: each big-endian 4-byte block -> 5 base-85 chars.
    Input length must be a multiple of 4 (the RFC's precondition)."""
    if len(data) % 4:
        raise ValueError(f"Z85 input length {len(data)} not a multiple of 4")
    out = []
    for i in range(0, len(data), 4):
        (block,) = struct.unpack(">I", data[i : i + 4])
        chars = []
        for _ in range(5):
            block, rem = divmod(block, 85)
            chars.append(_Z85_ALPHABET[rem])
        out.extend(reversed(chars))
    return "".join(out)


def z85_decode(text: str) -> bytes:
    if len(text) % 5:
        raise ValueError(f"Z85 text length {len(text)} not a multiple of 5")
    out = bytearray()
    for i in range(0, len(text), 5):
        block = 0
        for c in text[i : i + 5]:
            try:
                block = block * 85 + _Z85_DECODE[c]
            except KeyError:
                raise ValueError(f"invalid Z85 character {c!r}") from None
        if block > 0xFFFFFFFF:
            raise ValueError("Z85 block overflows 32 bits")
        out += struct.pack(">I", block)
    return bytes(out)


def serialize_rba(indices: list[int]) -> bytes:
    """Serialize sorted-or-not 64-bit row indices as a portable
    RoaringBitmapArray (the byte payload a DV descriptor points at)."""
    values = sorted(set(indices))
    if values and values[0] < 0:
        raise ValueError("row indices must be non-negative")
    # split into 32-bit bitmaps by high word; keys must be dense per
    # the delta implementation (bitmap i = high word i), so emit every
    # bitmap up to the max high word even if empty
    by_high: dict[int, list[int]] = {}
    for v in values:
        by_high.setdefault(v >> 32, []).append(v & 0xFFFFFFFF)
    n_bitmaps = (max(by_high) + 1) if by_high else 0
    out = bytearray(struct.pack("<iq", _MAGIC, n_bitmaps))
    for i in range(n_bitmaps):
        out += _serialize_rb32(by_high.get(i, []))
    return bytes(out)


def _serialize_rb32(values: list[int]) -> bytes:
    by_key: dict[int, list[int]] = {}
    for v in values:
        by_key.setdefault(v >> 16, []).append(v & 0xFFFF)
    keys = sorted(by_key)
    n = len(keys)
    head = bytearray(struct.pack("<ii", _SERIAL_COOKIE_NO_RUN, n))
    for k in keys:
        head += struct.pack("<HH", k, len(by_key[k]) - 1)
    bodies = []
    for k in keys:
        vals = by_key[k]
        if len(vals) <= _ARRAY_MAX_CARD:
            bodies.append(struct.pack(f"<{len(vals)}H", *vals))
        else:
            bits = bytearray(8192)
            for v in vals:
                bits[v >> 3] |= 1 << (v & 7)
            bodies.append(bytes(bits))
    # offsets section (always present in the no-run layout): byte
    # position of each container from the start of this bitmap
    pos = len(head) + 4 * n
    offsets = bytearray()
    for b in bodies:
        offsets += struct.pack("<I", pos)
        pos += len(b)
    return bytes(head) + bytes(offsets) + b"".join(bodies)


def deserialize_rba(data: bytes) -> list[int]:
    """Parse a portable RoaringBitmapArray back to sorted 64-bit row
    indices. Accepts run containers and both cookie layouts."""
    if len(data) < 12:
        raise ValueError("RoaringBitmapArray payload too short")
    magic, n_bitmaps = struct.unpack_from("<iq", data, 0)
    if magic != _MAGIC:
        raise ValueError(
            f"bad RoaringBitmapArray magic {magic} (expected {_MAGIC})"
        )
    pos = 12
    out: list[int] = []
    for i in range(n_bitmaps):
        high = i << 32
        values, pos = _deserialize_rb32(data, pos)
        out.extend(high | v for v in values)
    return out


def _deserialize_rb32(data: bytes, pos: int) -> tuple[list[int], int]:
    # unsigned: a packed run-format cookie stores container-count-1 in
    # the high 16 bits, which a signed read turns negative past 32767
    (cookie,) = struct.unpack_from("<I", data, pos)
    if cookie == _SERIAL_COOKIE_NO_RUN:
        (n,) = struct.unpack_from("<i", data, pos + 4)
        run_bitset = b""
        pos += 8
        has_offsets = True
    elif (cookie & 0xFFFF) == _SERIAL_COOKIE_RUN:
        n = (cookie >> 16) + 1
        pos += 4
        n_bitset = (n + 7) // 8
        run_bitset = data[pos : pos + n_bitset]
        pos += n_bitset
        has_offsets = n >= _NO_OFFSET_THRESHOLD
    else:
        raise ValueError(f"bad roaring cookie {cookie}")
    headers = []
    for j in range(n):
        key, card_m1 = struct.unpack_from("<HH", data, pos)
        pos += 4
        headers.append((key, card_m1 + 1))
    if has_offsets:
        pos += 4 * n  # containers follow in order; offsets redundant
    values: list[int] = []
    for j, (key, card) in enumerate(headers):
        base = key << 16
        is_run = bool(run_bitset) and bool(run_bitset[j >> 3] & (1 << (j & 7)))
        if is_run:
            (n_runs,) = struct.unpack_from("<H", data, pos)
            pos += 2
            for _ in range(n_runs):
                start, length = struct.unpack_from("<HH", data, pos)
                pos += 4
                values.extend(base | v for v in range(start, start + length + 1))
        elif card <= _ARRAY_MAX_CARD:
            vals = struct.unpack_from(f"<{card}H", data, pos)
            pos += 2 * card
            values.extend(base | v for v in vals)
        else:
            bits = data[pos : pos + 8192]
            pos += 8192
            for byte_i, byte in enumerate(bits):
                if byte:
                    for bit in range(8):
                        if byte & (1 << bit):
                            values.append(base | (byte_i << 3) | bit)
    return values, pos


def write_dv_file(path: str, indices: list[int]) -> tuple[int, int]:
    """Write a deletion-vector ``.bin`` FILE holding one DV, returning
    (offset, sizeInBytes) for the descriptor. File layout per the
    protocol: 1-byte format version (1), then at ``offset`` an int32
    big-endian payload size, the serialized bitmap, and an int32
    big-endian CRC-32 of the payload."""
    payload = serialize_rba(indices)
    with open(path, "wb") as f:
        f.write(b"\x01")
        offset = f.tell()
        f.write(struct.pack(">i", len(payload)))
        f.write(payload)
        f.write(struct.pack(">I", zlib.crc32(payload) & 0xFFFFFFFF))
    return offset, len(payload)


def read_dv_file(path: str, offset: int, size: int) -> list[int]:
    """Read one DV back from a ``.bin`` file, verifying the size and
    CRC the descriptor/file pin down."""
    with open(path, "rb") as f:
        version = f.read(1)
        if version != b"\x01":
            raise ValueError(
                f"unsupported deletion-vector file version {version!r}"
            )
        f.seek(offset)
        (stored_size,) = struct.unpack(">i", f.read(4))
        if stored_size != size:
            raise ValueError(
                f"deletion-vector size mismatch: descriptor says {size}, "
                f"file says {stored_size}"
            )
        payload = f.read(stored_size)
        if len(payload) != stored_size:
            raise ValueError("truncated deletion-vector payload")
        (crc,) = struct.unpack(">I", f.read(4))
        if crc != (zlib.crc32(payload) & 0xFFFFFFFF):
            raise ValueError("deletion-vector checksum mismatch")
    return deserialize_rba(payload)
