"""Multimodal column plumbing: binary payloads + typed metadata.

Design (the 100 TB pattern): media lives as an opaque ``binary``
column next to a typed metadata struct; decode / feature-extraction /
frame-sampling run as Arrow-batched pandas functions over
``mapInPandas`` so each task processes whole record batches without
per-row Python overhead, and the binary bytes never round-trip through
the driver.

The actual media codecs (PIL/ffmpeg/soundfile) are NOT in this
container, so ``decode_image``/``decode_audio`` raise
NotImplementedError by design; ``extract_features`` is a deterministic
byte-level stand-in that keeps the Spark-side contract — schema,
batching, partitioning — real and testable. Swap ``_fake_features``
for a real decoder without touching any plan.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_SCHEMA = "doc_id long, byte_len long, checksum8 long, n_frames long"


def to_binary_table(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Stand-in media table: utf-8 payload bytes + typed metadata struct.

    With real media this is `spark.read.format("binaryFile")` plus a
    metadata join; the downstream plumbing is identical.
    """
    return df.select(
        F.col(id_col),
        F.encode(F.col(text_col), "utf-8").alias("content"),
        F.struct(
            F.lit("text/plain").alias("mime"),
            F.length(F.col(text_col)).alias("n_chars"),
        ).alias("meta"),
    )


def decode_image(content: bytes):
    """Real image decode requires PIL/opencv — not in this container."""
    raise NotImplementedError(
        "image decode needs PIL/opencv; wire it into _fake_features' slot"
    )


def decode_audio(content: bytes):
    raise NotImplementedError("audio decode needs soundfile/ffmpeg")


def _fake_features(pdf: pd.DataFrame) -> pd.DataFrame:
    """Deterministic byte-level 'decode': length, 8-byte checksum, frame count.

    Stands in for a real feature extractor; byte math is exact so the
    whole mapInPandas path can be oracle-checked end-to-end.
    """
    content = pdf["content"]
    return pd.DataFrame(
        {
            "doc_id": pdf["doc_id"],
            "byte_len": content.map(len),
            "checksum8": content.map(lambda b: int(sum(b[:8]))),
            "n_frames": content.map(lambda b: (len(b) + 255) // 256),
        }
    )


def _byte_sums(arr) -> "object":
    """Per-row sum of bytes for a (small-width) pyarrow binary array.

    Offsets + one cumulative sum over the compact data buffer — no
    per-row Python. Handles sliced arrays (non-zero ``arr.offset``) and
    empty rows; the cumsum is O(data bytes), which for the 8-byte head
    slices is ~8N.
    """
    import numpy as np
    import pyarrow as pa

    # binary carries int32 offsets, large_binary int64 — misreading one
    # as the other silently produces garbage sums, so branch explicitly
    # and refuse anything else (e.g. fixed_size_binary has no offsets).
    if pa.types.is_binary(arr.type) or pa.types.is_string(arr.type):
        off_dtype = np.int32
    elif pa.types.is_large_binary(arr.type) or pa.types.is_large_string(arr.type):
        off_dtype = np.int64
    else:
        raise TypeError(f"_byte_sums expects a (large_)binary array, got {arr.type}")
    offsets = np.frombuffer(arr.buffers()[1], dtype=off_dtype)[
        arr.offset : arr.offset + len(arr) + 1
    ]
    buf = arr.buffers()[2]
    data = (
        np.frombuffer(buf, dtype=np.uint8) if buf is not None else np.empty(0, np.uint8)
    )
    csum = np.concatenate(([0], np.cumsum(data, dtype=np.int64)))
    return csum[offsets[1:]] - csum[offsets[:-1]]


def extract_features(binary_df: DataFrame) -> DataFrame:
    """Arrow-native feature extraction over the binary column.

    ``mapInArrow``, not ``mapInPandas``: the stand-in features are pure
    byte math, so each batch computes entirely in pyarrow/numpy kernels
    (binary_length, binary_slice, an offsets+cumsum byte checksum) and
    the pandas conversion each way — the dominant cost of this
    operator's r6 DuckDB-proxy gap — is skipped. A real media decoder
    slots into the same per-batch function unchanged (decoders consume
    ``bytes``; Arrow hands them out zero-copy per row)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def run(batches: Iterator["pa.RecordBatch"]) -> Iterator["pa.RecordBatch"]:
        for batch in batches:
            content = batch.column(batch.schema.get_field_index("content"))
            blen = pc.cast(pc.binary_length(content), pa.int64())
            checksum = pa.array(_byte_sums(pc.binary_slice(content, 0, 8)), pa.int64())
            # (len + 255) // 256 — arrow integer divide truncates, and
            # len >= 0, so it matches Python's floor division here
            n_frames = pc.cast(pc.divide(pc.add(blen, 255), 256), pa.int64())
            yield pa.RecordBatch.from_arrays(
                [
                    batch.column(batch.schema.get_field_index("doc_id")),
                    blen,
                    checksum,
                    n_frames,
                ],
                names=["doc_id", "byte_len", "checksum8", "n_frames"],
            )

    return binary_df.mapInArrow(run, schema=FEATURE_SCHEMA)


def extract_features_pandas(binary_df: DataFrame) -> DataFrame:
    """mapInPandas formulation, kept as the differential reference for
    the Arrow-native path (and the slot a pandas-based extractor would
    use)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield _fake_features(pdf)

    return binary_df.mapInPandas(run, schema=FEATURE_SCHEMA)


def sample_frames(binary_df: DataFrame, id_col: str = "doc_id", frame_bytes: int = 256) -> DataFrame:
    """Frame sampling shape: explode each payload into fixed-size chunks.

    (id, frame_idx, frame: binary) — the video-pipeline partitioning
    pattern (one row per sampled frame, downstream feature UDFs fan out
    per frame). Pure built-ins: substring on binary slices chunks.
    """
    n = F.ceil(F.length("content") / frame_bytes).cast("int")
    idx = F.sequence(F.lit(0), F.greatest(n - 1, F.lit(0)))
    return binary_df.select(
        F.col(id_col),
        F.explode(idx).alias("frame_idx"),
        F.expr(f"substring(content, frame_idx * {frame_bytes} + 1, {frame_bytes})").alias(
            "frame"
        ),
    )


RESIZED_SCHEMA = "doc_id long, content binary, meta struct<mime:string,n_chars:long>, resized binary, scale long"


def resize_media(binary_df: DataFrame, scale: int = 4) -> DataFrame:
    """Resize plumbing: per-payload downsample as an Arrow-batched map.

    Real image resize (PIL.Image.resize / cv2.resize) slots into the
    per-batch function; the deterministic stand-in keeps every
    ``scale``-th byte (an exact byte-level "nearest-neighbor downsample")
    so schema, batch shape, and partitioning are testable end-to-end.
    Output keeps the original columns and appends (resized, scale) —
    the production pattern where multiple resolutions ride one row.
    """
    if scale < 1:
        raise ValueError(f"scale must be >= 1, got {scale}")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf.copy()
            out["resized"] = pdf["content"].map(lambda b: bytes(b[::scale]))
            out["scale"] = scale
            yield out

    return binary_df.mapInPandas(run, schema=RESIZED_SCHEMA)
