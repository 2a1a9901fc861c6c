"""Delta Lake deletion-vector decoding, pure Python.

Implements the public Delta protocol's Deletion Vectors spec
(delta-io PROTOCOL.md, "Deletion Vector Descriptor Schema" /
"Deletion Vector Format") so the jar-less log replay in
``sources/delta.py`` can read DV-bearing tables instead of refusing
them (the reference reads them through delta-rs,
extensions/deltalake.rs:34-51). Three layers, all byte-level specs
published in the protocol / RoaringFormatSpec / ZeroMQ RFC 32:

1. **Z85** (ZeroMQ base85): descriptors embed either a UUID
   (storageType ``u``) or the whole bitmap (``i``) in Z85.
2. **On-disk DV file** (storageType ``u``/``p``): 1-byte format
   version (1), then per stored DV at ``offset``: int32 BE data size,
   the data bytes, int32 BE CRC-32 of the data.
3. **RoaringBitmapArray "portable" format** (the data bytes): int32 LE
   magic 1681511377, int64 LE number of 32-bit buckets, then per
   bucket an int32 LE high key + a standard-RoaringFormatSpec bitmap
   of the low 32 bits (array / bitmap / run containers). A set bit at
   64-bit position ``(high<<32)|(key16<<16)|low16`` marks that row
   index as DELETED in its parquet file.
"""

from __future__ import annotations

import os
import struct
import zlib

import numpy as np

_Z85_CHARS = (
    "0123456789abcdefghijklmnopqrstuvwxyz"
    "ABCDEFGHIJKLMNOPQRSTUVWXYZ.-:+=^!/*?&<>()[]{}@%$#"
)
_Z85_DECODE = {c: i for i, c in enumerate(_Z85_CHARS)}

MAGIC_RBM_ARRAY = 1681511377  # Delta portable RoaringBitmapArray
_SERIAL_COOKIE = 12347  # RoaringFormatSpec: with run containers
_SERIAL_COOKIE_NO_RUN = 12346
_NO_OFFSET_THRESHOLD = 4


def z85_decode(s: str) -> bytes:
    """ZeroMQ Z85: 5 chars -> uint32 big-endian -> 4 bytes."""
    if len(s) % 5:
        raise ValueError(f"Z85 length must be a multiple of 5, got {len(s)}")
    out = bytearray()
    for i in range(0, len(s), 5):
        acc = 0
        for c in s[i : i + 5]:
            try:
                acc = acc * 85 + _Z85_DECODE[c]
            except KeyError:
                raise ValueError(f"invalid Z85 character {c!r}") from None
        out += acc.to_bytes(4, "big")
    return bytes(out)


def z85_encode(data: bytes) -> str:
    """Inverse of :func:`z85_decode` (fixture building + tests)."""
    if len(data) % 4:
        raise ValueError(f"Z85 input must be a multiple of 4 bytes, got {len(data)}")
    out = []
    for i in range(0, len(data), 4):
        acc = int.from_bytes(data[i : i + 4], "big")
        chunk = []
        for _ in range(5):
            acc, rem = divmod(acc, 85)
            chunk.append(_Z85_CHARS[rem])
        out += reversed(chunk)
    return "".join(out)


def _read_roaring32(buf: bytes, pos: int) -> tuple[np.ndarray, int]:
    """One standard RoaringFormatSpec bitmap -> sorted uint32 values."""
    (cookie32,) = struct.unpack_from("<i", buf, pos)
    cookie = cookie32 & 0xFFFF
    if cookie == _SERIAL_COOKIE:
        n_containers = (cookie32 >> 16) + 1
        pos += 4
        run_flags = buf[pos : pos + (n_containers + 7) // 8]
        pos += (n_containers + 7) // 8
        has_offsets = n_containers >= _NO_OFFSET_THRESHOLD
    elif cookie == _SERIAL_COOKIE_NO_RUN:
        (n_containers,) = struct.unpack_from("<i", buf, pos + 4)
        pos += 8
        run_flags = b""
        has_offsets = True
    else:
        raise ValueError(f"not a RoaringFormatSpec bitmap (cookie={cookie})")
    keys = np.zeros(n_containers, dtype=np.uint32)
    cards = np.zeros(n_containers, dtype=np.int64)
    for i in range(n_containers):
        k, c = struct.unpack_from("<HH", buf, pos)
        keys[i], cards[i] = k, c + 1
        pos += 4
    if has_offsets:
        pos += 4 * n_containers  # parse sequentially; offsets redundant
    chunks: list[np.ndarray] = []
    for i in range(n_containers):
        is_run = bool(run_flags) and bool(run_flags[i // 8] & (1 << (i % 8)))
        base = np.uint32(keys[i]) << np.uint32(16)
        if is_run:
            (n_runs,) = struct.unpack_from("<H", buf, pos)
            pos += 2
            runs = np.frombuffer(buf, "<u2", count=2 * n_runs, offset=pos).reshape(
                n_runs, 2
            )
            pos += 4 * n_runs
            vals = np.concatenate(
                [np.arange(s, s + ln + 1, dtype=np.uint32) for s, ln in runs]
            ) if n_runs else np.empty(0, np.uint32)
        elif cards[i] > 4096:
            words = np.frombuffer(buf, "<u8", count=1024, offset=pos)
            pos += 8192
            bits = np.unpackbits(words.view(np.uint8), bitorder="little")
            vals = np.nonzero(bits)[0].astype(np.uint32)
        else:
            vals = np.frombuffer(buf, "<u2", count=int(cards[i]), offset=pos).astype(
                np.uint32
            )
            pos += 2 * int(cards[i])
        chunks.append(base | vals)
    values = np.concatenate(chunks) if chunks else np.empty(0, np.uint32)
    return values, pos


def deserialize_roaring_bitmap_array(data: bytes) -> np.ndarray:
    """Delta portable RoaringBitmapArray -> sorted int64 row indexes."""
    if len(data) < 12:
        raise ValueError(f"DV bitmap too short ({len(data)} bytes)")
    magic, n_bitmaps = struct.unpack_from("<iq", data, 0)
    if magic != MAGIC_RBM_ARRAY:
        raise ValueError(
            f"bad RoaringBitmapArray magic {magic} (expected {MAGIC_RBM_ARRAY})"
        )
    pos = 12
    parts: list[np.ndarray] = []
    for _ in range(n_bitmaps):
        (high,) = struct.unpack_from("<i", data, pos)
        pos += 4
        lows, pos = _read_roaring32(data, pos)
        parts.append((np.int64(high) << np.int64(32)) | lows.astype(np.int64))
    return np.concatenate(parts) if parts else np.empty(0, np.int64)


def _dv_file_path(table_path: str, path_or_inline: str) -> str:
    """storageType 'u': ``<optional random prefix><z85 uuid (20 chars)>``
    -> ``<table>/<prefix>/deletion_vector_<uuid>.bin``."""
    import uuid as _uuid

    prefix, encoded = path_or_inline[:-20], path_or_inline[-20:]
    u = _uuid.UUID(bytes=z85_decode(encoded))
    name = f"deletion_vector_{u}.bin"
    return os.path.join(table_path, prefix, name) if prefix else os.path.join(
        table_path, name
    )


def decode_deletion_vector(table_path: str, dv: dict) -> np.ndarray:
    """DV descriptor (an ``add.deletionVector`` dict) -> deleted row
    indexes (sorted int64). CRC and size are verified for on-disk DVs."""
    storage = dv["storageType"]
    size = int(dv["sizeInBytes"])
    if storage == "i":
        data = z85_decode(dv["pathOrInlineDv"])[:size]
    elif storage in ("u", "p"):
        fp = (
            _dv_file_path(table_path, dv["pathOrInlineDv"])
            if storage == "u"
            else dv["pathOrInlineDv"]
        )
        with open(fp, "rb") as f:
            blob = f.read()
        offset = int(dv.get("offset") or 1)
        (stored_size,) = struct.unpack_from(">i", blob, offset)
        if stored_size != size:
            raise ValueError(
                f"DV size mismatch in {fp}: descriptor says {size}, "
                f"file says {stored_size}"
            )
        data = blob[offset + 4 : offset + 4 + size]
        (crc,) = struct.unpack_from(">I", blob, offset + 4 + size)
        if zlib.crc32(data) & 0xFFFFFFFF != crc:
            raise ValueError(f"DV checksum mismatch in {fp} at offset {offset}")
    else:
        raise ValueError(f"unknown DV storageType {storage!r}")
    indexes = deserialize_roaring_bitmap_array(data)
    card = int(dv.get("cardinality") or 0)
    if card and card != len(indexes):
        raise ValueError(
            f"DV cardinality mismatch: descriptor says {card}, bitmap has "
            f"{len(indexes)}"
        )
    return indexes


# ---------------------------------------------------------------------------
# Serialization (fixtures + tests only — the engine never writes DVs)


def _serialize_roaring32(values: np.ndarray) -> bytes:
    """Standard RoaringFormatSpec bytes for sorted uint32 values, using
    array containers (<=4096) and bitmap containers (no run containers
    — the no-run cookie path; run decoding is golden-byte tested)."""
    values = np.asarray(values, dtype=np.uint32)
    out = bytearray()
    keys = np.unique(values >> np.uint32(16))
    out += struct.pack("<ii", _SERIAL_COOKIE_NO_RUN, len(keys))
    groups = [(int(k), (values[(values >> np.uint32(16)) == k] & np.uint32(0xFFFF)))
              for k in keys]
    for k, lows in groups:
        out += struct.pack("<HH", k, len(lows) - 1)
    # offset header (always present with the no-run cookie)
    pos = len(out) + 4 * len(groups)
    for _, lows in groups:
        out += struct.pack("<i", pos)
        pos += 8192 if len(lows) > 4096 else 2 * len(lows)
    for _, lows in groups:
        if len(lows) > 4096:
            bits = np.zeros(65536, dtype=np.uint8)
            bits[lows] = 1
            out += np.packbits(bits, bitorder="little").tobytes()
        else:
            out += lows.astype("<u2").tobytes()
    return bytes(out)


def serialize_roaring_bitmap_array(indexes) -> bytes:
    """Delta portable RoaringBitmapArray bytes for int64 row indexes."""
    idx = np.asarray(sorted(indexes), dtype=np.int64)
    highs = np.unique(idx >> np.int64(32))
    out = bytearray(struct.pack("<iq", MAGIC_RBM_ARRAY, len(highs)))
    for h in highs:
        lows = (idx[(idx >> np.int64(32)) == h] & np.int64(0xFFFFFFFF)).astype(
            np.uint32
        )
        out += struct.pack("<i", int(h))
        out += _serialize_roaring32(lows)
    return bytes(out)
