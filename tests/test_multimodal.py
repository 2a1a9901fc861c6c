"""Multimodal plumbing: Arrow-batched decode/resize/frame-sample shapes.

The codecs are deliberately absent (no PIL/ffmpeg in this container);
what's under test is the Spark-side contract — schemas, mapInPandas
batch shape, exact byte math — that a real decoder drops into.
"""

from __future__ import annotations

import pytest

from datafusion_dft_spark.catalog import load_tables
from datafusion_dft_spark.operators import multimodal as mm


@pytest.fixture(scope="module")
def binary_docs(spark, sf_dir):
    docs = load_tables(spark, sf_dir)["documents"]
    return mm.to_binary_table(docs.limit(50), "doc_id", "text")


def test_decode_stubs_raise(binary_docs):
    with pytest.raises(NotImplementedError):
        mm.decode_image(b"\x89PNG")
    with pytest.raises(NotImplementedError):
        mm.decode_audio(b"RIFF")


def test_resize_media_exact_bytes(spark, binary_docs):
    out = mm.resize_media(binary_docs, scale=4)
    rows = out.select("doc_id", "content", "resized", "scale").collect()
    assert rows
    for r in rows:
        assert bytes(r.resized) == bytes(r.content)[::4]
        assert r.scale == 4
    # original columns survive (multi-resolution rides one row)
    assert {"doc_id", "content", "meta", "resized", "scale"} == set(out.columns)


def test_resize_rejects_bad_scale(binary_docs):
    with pytest.raises(ValueError):
        mm.resize_media(binary_docs, scale=0)


def test_frame_sample_reassembles(spark, binary_docs):
    """Chunks concatenated in frame_idx order must equal the payload —
    the lossless-partitioning property the video pipeline relies on."""
    frames = mm.sample_frames(binary_docs, frame_bytes=64)
    got = {}
    for r in frames.orderBy("doc_id", "frame_idx").collect():
        got.setdefault(r.doc_id, bytearray()).extend(bytes(r.frame))
    want = {r.doc_id: bytes(r.content) for r in binary_docs.collect()}
    assert {k: bytes(v) for k, v in got.items()} == want


def test_arrow_native_features_match_pandas_path(spark, binary_docs):
    """The mapInArrow formulation (skips pandas conversion both ways)
    must reproduce the mapInPandas reference byte-for-byte — including
    empty payloads and multi-frame documents."""
    from pyspark.sql import functions as F

    # add edge payloads: empty and >256-byte (multi-frame)
    extra = spark.createDataFrame(
        [(900001, ""), (900002, "x" * 700)], "doc_id long, text string"
    )
    b = binary_docs.unionByName(
        mm.to_binary_table(extra, "doc_id", "text")
    )
    via_arrow = {tuple(r) for r in mm.extract_features(b).collect()}
    via_pandas = {tuple(r) for r in mm.extract_features_pandas(b).collect()}
    assert via_arrow == via_pandas and len(via_arrow) == 52
