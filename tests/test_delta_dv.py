"""Delta deletion-vector reads in the pure-Python log replay.

Fixtures hand-write the exact on-disk artifacts the Delta protocol
specifies (delta-io PROTOCOL.md "Deletion Vectors"): parquet data
files, ``_delta_log`` JSON with protocol 3 + deletionVectors, and DV
payloads in all three storage modes — inline Z85 (``i``), UUID-named
``.bin`` files (``u``, with and without a random prefix), and absolute
paths (``p``). The reference reads such tables via delta-rs
(extensions/deltalake.rs:34-51); here ``sources/delta_dv.py`` decodes
the descriptors and ``sources/delta.py`` drops deleted rows through a
``_metadata.row_index`` anti-join.

Codec trust chain: the Z85 decoder is checked against the ZeroMQ RFC
32 test vector, the roaring decoder against hand-assembled golden
bytes (array + bitmap + run containers) — so the serializer used to
BUILD fixtures is itself validated against independent bytes, not just
round-tripped.
"""

from __future__ import annotations

import json
import os
import struct
import uuid
import zlib

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from datafusion_dft_spark.sources.delta import DeltaNotAvailable, read_delta
from datafusion_dft_spark.sources.delta_dv import (
    MAGIC_RBM_ARRAY,
    decode_deletion_vector,
    deserialize_roaring_bitmap_array,
    serialize_roaring_bitmap_array,
    z85_decode,
    z85_encode,
)

SCHEMA_JSON = json.dumps(
    {
        "type": "struct",
        "fields": [
            {"name": "id", "type": "long", "nullable": True, "metadata": {}},
            {"name": "val", "type": "string", "nullable": True, "metadata": {}},
        ],
    }
)


# ---------------------------------------------------------------- codecs


def test_z85_rfc32_vector():
    """The ZeroMQ RFC 32 reference vector: 'HelloWorld' <-> 8 bytes."""
    raw = bytes([0x86, 0x4F, 0xD2, 0x6F, 0xB5, 0x59, 0xF7, 0x5B])
    assert z85_decode("HelloWorld") == raw
    assert z85_encode(raw) == "HelloWorld"
    with pytest.raises(ValueError, match="multiple of 5"):
        z85_decode("abc")
    with pytest.raises(ValueError, match="invalid Z85"):
        z85_decode("abcdé")


def test_roaring_array_container_golden():
    """Hand-assembled bytes: one 32-bit bucket (high=0), one array
    container (key=0) holding {3, 9}."""
    golden = (
        struct.pack("<iq", MAGIC_RBM_ARRAY, 1)
        + struct.pack("<i", 0)  # high 32 bits
        + struct.pack("<ii", 12346, 1)  # no-run cookie, 1 container
        + struct.pack("<HH", 0, 1)  # key=0, cardinality-1=1
        + struct.pack("<i", 20)  # offset header (ignored by reader)
        + struct.pack("<HH", 3, 9)
    )
    assert list(deserialize_roaring_bitmap_array(golden)) == [3, 9]


def test_roaring_run_container_golden():
    """Run-container path (cookie 12347): high=2, run [10, 14]."""
    run_bitmap = (
        struct.pack("<i", 12347)  # 1 container -> (n-1)<<16 == 0
        + bytes([1])  # run flag bitset: container 0 is a run
        + struct.pack("<HH", 0, 4)  # key=0, cardinality-1=4
        + struct.pack("<H", 1)  # one run
        + struct.pack("<HH", 10, 4)  # start=10, length=4 -> 10..14
    )
    golden = (
        struct.pack("<iq", MAGIC_RBM_ARRAY, 1) + struct.pack("<i", 2) + run_bitmap
    )
    expect = [(2 << 32) | v for v in range(10, 15)]
    assert list(deserialize_roaring_bitmap_array(golden)) == expect


def test_roaring_bitmap_container_roundtrip():
    """>4096 values in one 64k chunk forces a bitmap container."""
    idx = list(range(0, 12000, 2))
    back = deserialize_roaring_bitmap_array(serialize_roaring_bitmap_array(idx))
    assert list(back) == idx


def test_roaring_multi_bucket_roundtrip():
    idx = [0, 1, 65536 + 5, (1 << 32) + 3, (5 << 32) + 99]
    back = deserialize_roaring_bitmap_array(serialize_roaring_bitmap_array(idx))
    assert list(back) == idx


def test_bad_magic_refused():
    with pytest.raises(ValueError, match="magic"):
        deserialize_roaring_bitmap_array(struct.pack("<iq", 123, 0))


# ----------------------------------------------------- fixture plumbing


def _pad_z85(data: bytes) -> tuple[str, int]:
    """Z85 needs 4-byte alignment; Delta inline DVs are padded — the
    descriptor's sizeInBytes says how much is real."""
    size = len(data)
    if size % 4:
        data = data + b"\x00" * (4 - size % 4)
    return z85_encode(data), size


def _dv_file(root: str, indexes, prefix: str = "") -> dict:
    """Write a storageType='u' DV .bin file; return the descriptor."""
    data = serialize_roaring_bitmap_array(indexes)
    u = uuid.uuid4()
    d = os.path.join(root, prefix) if prefix else root
    os.makedirs(d, exist_ok=True)
    offset = 1  # right after the 1-byte format version
    with open(os.path.join(d, f"deletion_vector_{u}.bin"), "wb") as f:
        f.write(b"\x01")
        f.write(struct.pack(">i", len(data)))
        f.write(data)
        f.write(struct.pack(">I", zlib.crc32(data) & 0xFFFFFFFF))
    return {
        "storageType": "u",
        "pathOrInlineDv": prefix + z85_encode(u.bytes),
        "offset": offset,
        "sizeInBytes": len(data),
        "cardinality": len(list(indexes)),
    }


def _dv_inline(indexes) -> dict:
    data = serialize_roaring_bitmap_array(indexes)
    encoded, size = _pad_z85(data)
    return {
        "storageType": "i",
        "pathOrInlineDv": encoded,
        "sizeInBytes": size,
        "cardinality": len(list(indexes)),
    }


def _write_commit(log_dir: str, version: int, actions: list[dict]) -> None:
    with open(os.path.join(log_dir, f"{version:020d}.json"), "w") as f:
        for a in actions:
            f.write(json.dumps(a) + "\n")


def _protocol_dv() -> dict:
    return {
        "protocol": {
            "minReaderVersion": 3,
            "minWriterVersion": 7,
            "readerFeatures": ["deletionVectors"],
            "writerFeatures": ["deletionVectors"],
        }
    }


def _metadata(schema_json: str = SCHEMA_JSON, partition_cols=()) -> dict:
    return {
        "metaData": {
            "id": "00000000-0000-0000-0000-00000000000d",
            "format": {"provider": "parquet", "options": {}},
            "schemaString": schema_json,
            "partitionColumns": list(partition_cols),
            "configuration": {},
        }
    }


def _write_data(root: str, rel: str, ids: list[int]) -> dict:
    dest = os.path.join(root, rel)
    os.makedirs(os.path.dirname(dest) or root, exist_ok=True)
    pq.write_table(
        pa.table(
            {
                "id": pa.array(ids, pa.int64()),
                "val": pa.array([f"v{i}" for i in ids], pa.string()),
            }
        ),
        dest,
    )
    return {
        "add": {
            "path": rel,
            "partitionValues": {},
            "size": os.path.getsize(dest),
            "dataChange": True,
        }
    }


# ------------------------------------------------------------ e2e reads


def test_dv_file_and_inline_reads(spark, tmp_path):
    """Two files: a.parquet loses rows 1 and 3 via an on-disk DV (with
    random prefix), b.parquet loses row 0 via an inline DV."""
    root = str(tmp_path / "dv_tbl")
    log = os.path.join(root, "_delta_log")
    os.makedirs(log)
    add_a = _write_data(root, "a.parquet", [10, 11, 12, 13, 14])
    add_b = _write_data(root, "b.parquet", [20, 21, 22])
    add_a["add"]["deletionVector"] = _dv_file(root, [1, 3], prefix="ab")
    add_b["add"]["deletionVector"] = _dv_inline([0])
    _write_commit(log, 0, [_protocol_dv(), _metadata(), add_a, add_b])
    got = sorted(r.id for r in read_delta(spark, root).collect())
    assert got == [10, 12, 14, 21, 22]


def test_dv_grows_across_versions_and_time_travel(spark, tmp_path):
    """v0: no DV. v1 re-adds the same file with a DV deleting row 1.
    v2 re-adds with a grown DV (rows 1 and 4). Latest add wins; time
    travel sees each stage."""
    root = str(tmp_path / "dv_grow")
    log = os.path.join(root, "_delta_log")
    os.makedirs(log)
    add0 = _write_data(root, "f.parquet", [1, 2, 3, 4, 5])
    _write_commit(log, 0, [_protocol_dv(), _metadata(), add0])
    add1 = json.loads(json.dumps(add0))
    add1["add"]["deletionVector"] = _dv_inline([1])
    _write_commit(log, 1, [add1])
    add2 = json.loads(json.dumps(add0))
    add2["add"]["deletionVector"] = _dv_file(root, [1, 4])
    _write_commit(log, 2, [add2])
    ids = lambda v: sorted(r.id for r in read_delta(spark, root, version=v).collect())
    assert ids(0) == [1, 2, 3, 4, 5]
    assert ids(1) == [1, 3, 4, 5]
    assert ids(2) == [1, 3, 4]
    assert ids(None) == [1, 3, 4]


def test_dv_on_partitioned_table(spark, tmp_path):
    part_schema = json.dumps(
        {
            "type": "struct",
            "fields": [
                {"name": "id", "type": "long", "nullable": True, "metadata": {}},
                {"name": "val", "type": "string", "nullable": True, "metadata": {}},
                {"name": "part", "type": "string", "nullable": True, "metadata": {}},
            ],
        }
    )
    root = str(tmp_path / "dv_part")
    log = os.path.join(root, "_delta_log")
    os.makedirs(log)
    add_x = _write_data(root, "part=x/f1.parquet", [1, 2, 3])
    add_y = _write_data(root, "part=y/f2.parquet", [4, 5, 6])
    add_x["add"]["partitionValues"] = {"part": "x"}
    add_y["add"]["partitionValues"] = {"part": "y"}
    add_y["add"]["deletionVector"] = _dv_inline([2])  # drops id=6
    _write_commit(
        log, 0, [_protocol_dv(), _metadata(part_schema, ["part"]), add_x, add_y]
    )
    rows = {(r.id, r.part) for r in read_delta(spark, root).collect()}
    assert rows == {(1, "x"), (2, "x"), (3, "x"), (4, "y"), (5, "y")}


def test_dv_with_column_mapping_name_mode(spark, tmp_path):
    """DVs compose with column mapping: physical parquet names resolve
    AND deleted rows drop in the same read."""
    cm_schema = json.dumps(
        {
            "type": "struct",
            "fields": [
                {
                    "name": "id",
                    "type": "long",
                    "nullable": True,
                    "metadata": {
                        "delta.columnMapping.id": 1,
                        "delta.columnMapping.physicalName": "col-p1",
                    },
                },
                {
                    "name": "val",
                    "type": "string",
                    "nullable": True,
                    "metadata": {
                        "delta.columnMapping.id": 2,
                        "delta.columnMapping.physicalName": "col-p2",
                    },
                },
            ],
        }
    )
    root = str(tmp_path / "dv_cm")
    log = os.path.join(root, "_delta_log")
    os.makedirs(log)
    dest = os.path.join(root, "f.parquet")
    pq.write_table(
        pa.table(
            {
                "col-p1": pa.array([1, 2, 3, 4], pa.int64()),
                "col-p2": pa.array(["a", "b", "c", "d"], pa.string()),
            }
        ),
        dest,
    )
    meta = _metadata(cm_schema)
    meta["metaData"]["configuration"] = {
        "delta.columnMapping.mode": "name",
        "delta.columnMapping.maxColumnId": "2",
    }
    proto = _protocol_dv()
    proto["protocol"]["readerFeatures"].append("columnMapping")
    add = {
        "add": {
            "path": "f.parquet",
            "partitionValues": {},
            "size": os.path.getsize(dest),
            "dataChange": True,
            "deletionVector": _dv_inline([0, 2]),
        }
    }
    _write_commit(log, 0, [proto, meta, add])
    rows = sorted((r.id, r.val) for r in read_delta(spark, root).collect())
    assert rows == [(2, "b"), (4, "d")]


def test_dv_crc_mismatch_refused(spark, tmp_path):
    root = str(tmp_path / "dv_crc")
    log = os.path.join(root, "_delta_log")
    os.makedirs(log)
    add = _write_data(root, "f.parquet", [1, 2, 3])
    dv = _dv_file(root, [0])
    # corrupt one data byte inside the stored DV
    bin_path = next(
        os.path.join(root, f) for f in os.listdir(root) if f.endswith(".bin")
    )
    blob = bytearray(open(bin_path, "rb").read())
    blob[7] ^= 0xFF
    open(bin_path, "wb").write(bytes(blob))
    add["add"]["deletionVector"] = dv
    _write_commit(log, 0, [_protocol_dv(), _metadata(), add])
    with pytest.raises(Exception, match="checksum|magic"):
        read_delta(spark, root).collect()


def test_dv_descriptor_decode_p_storage(tmp_path):
    """storageType 'p': absolute path, same framing."""
    data = serialize_roaring_bitmap_array([5, 7])
    p = str(tmp_path / "abs_dv.bin")
    with open(p, "wb") as f:
        f.write(b"\x01" + struct.pack(">i", len(data)) + data)
        f.write(struct.pack(">I", zlib.crc32(data) & 0xFFFFFFFF))
    dv = {
        "storageType": "p",
        "pathOrInlineDv": p,
        "offset": 1,
        "sizeInBytes": len(data),
        "cardinality": 2,
    }
    assert list(decode_deletion_vector(str(tmp_path), dv)) == [5, 7]


def test_dv_feature_without_any_dvs_reads(spark, tmp_path):
    """Protocol 3 + deletionVectors on a table whose adds carry no DVs
    (common: feature enabled, nothing deleted yet) — reads normally
    instead of refusing (pre-r9 behavior)."""
    root = str(tmp_path / "dv_none")
    log = os.path.join(root, "_delta_log")
    os.makedirs(log)
    add = _write_data(root, "f.parquet", [7, 8])
    _write_commit(log, 0, [_protocol_dv(), _metadata(), add])
    assert sorted(r.id for r in read_delta(spark, root).collect()) == [7, 8]


def test_dv_empty_bitmap_keeps_all_rows(spark, tmp_path):
    root = str(tmp_path / "dv_empty")
    log = os.path.join(root, "_delta_log")
    os.makedirs(log)
    add = _write_data(root, "f.parquet", [1, 2])
    add["add"]["deletionVector"] = _dv_inline([])
    _write_commit(log, 0, [_protocol_dv(), _metadata(), add])
    assert sorted(r.id for r in read_delta(spark, root).collect()) == [1, 2]


def test_dv_from_checkpoint_parquet(spark, tmp_path):
    """DV descriptors survive the checkpoint path too: the add action
    (with its deletionVector struct) arrives from checkpoint PARQUET
    rather than a JSON commit."""
    root = str(tmp_path / "dv_ckpt")
    log = os.path.join(root, "_delta_log")
    os.makedirs(log)
    add = _write_data(root, "f.parquet", [1, 2, 3, 4])
    dv = _dv_inline([1, 2])  # drops ids 2 and 3
    proto = _protocol_dv()["protocol"]
    meta = _metadata()["metaData"]
    dv_type = pa.struct(
        [
            ("storageType", pa.string()),
            ("pathOrInlineDv", pa.string()),
            ("offset", pa.int32()),
            ("sizeInBytes", pa.int32()),
            ("cardinality", pa.int64()),
        ]
    )
    add_type = pa.struct(
        [
            ("path", pa.string()),
            ("partitionValues", pa.map_(pa.string(), pa.string())),
            ("size", pa.int64()),
            ("dataChange", pa.bool_()),
            ("deletionVector", dv_type),
        ]
    )
    meta_type = pa.struct(
        [
            ("id", pa.string()),
            ("schemaString", pa.string()),
            ("partitionColumns", pa.list_(pa.string())),
            ("configuration", pa.map_(pa.string(), pa.string())),
        ]
    )
    proto_type = pa.struct(
        [
            ("minReaderVersion", pa.int32()),
            ("minWriterVersion", pa.int32()),
            ("readerFeatures", pa.list_(pa.string())),
            ("writerFeatures", pa.list_(pa.string())),
        ]
    )
    add_rec = dict(add["add"])
    add_rec["partitionValues"] = []
    add_rec["deletionVector"] = {
        k: dv[k]
        for k in ("storageType", "pathOrInlineDv", "sizeInBytes", "cardinality")
    }
    meta_rec = {
        "id": meta["id"],
        "schemaString": meta["schemaString"],
        "partitionColumns": [],
        "configuration": [],
    }
    table = pa.table(
        {
            "protocol": pa.array([proto, None, None], proto_type),
            "metaData": pa.array([None, meta_rec, None], meta_type),
            "add": pa.array([None, None, add_rec], add_type),
        }
    )
    pq.write_table(table, os.path.join(log, f"{0:020d}.checkpoint.parquet"))
    with open(os.path.join(log, "_last_checkpoint"), "w") as f:
        json.dump({"version": 0, "size": 3}, f)
    got = sorted(r.id for r in read_delta(spark, root).collect())
    assert got == [1, 4]


def test_dv_large_bitmap_container(spark, tmp_path):
    """A DV that deletes >4096 rows exercises the bitmap-container
    decode inside a real read."""
    n = 10000
    root = str(tmp_path / "dv_big")
    log = os.path.join(root, "_delta_log")
    os.makedirs(log)
    add = _write_data(root, "f.parquet", list(range(n)))
    deleted = list(range(0, n, 2))
    add["add"]["deletionVector"] = _dv_file(root, deleted)
    _write_commit(log, 0, [_protocol_dv(), _metadata(), add])
    got = sorted(r.id for r in read_delta(spark, root).collect())
    assert got == list(range(1, n, 2))
    assert len(got) == n // 2
