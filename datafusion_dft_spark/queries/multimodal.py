"""Multimodal pipeline queries: binary columns through Arrow-batched UDFs.

``multimodal_features`` runs the full pipeline — text → binary payload
→ mapInPandas feature extraction — and is oracle-checked because the
stand-in features are exact byte math DuckDB can reproduce from the
source text (ASCII corpus: octet length == char length, checksum8 =
sum of the first 8 code points).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_tables
from ..operators import multimodal as mm
from ..registry import query


@query(
    "multimodal_features",
    oracle="""
        SELECT doc_id,
               strlen(text) AS byte_len,
               CAST(list_sum([ascii(substr(text, i, 1))
                              for i in range(1, least(strlen(text), 8) + 1)]) AS BIGINT) AS checksum8,
               CAST(ceil(strlen(text) / 256.0) AS BIGINT) AS n_frames
        FROM documents
    """,
    tags=("multimodal", "pandas-udf"),
    doc="Binary-column pipeline: encode payload -> mapInPandas (Arrow batches) "
    "feature extraction; deterministic byte features keep it oracle-checkable.",
)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir)["documents"]
    binary = mm.to_binary_table(docs, "doc_id", "text")
    return mm.extract_features(binary)


@query(
    "multimodal_frame_stats",
    oracle="""
        SELECT CAST(ceil(strlen(text) / 256.0) AS BIGINT) AS n_frames,
               count(*) AS n_docs
        FROM documents
        GROUP BY 1
    """,
    tags=("multimodal",),
    doc="Frame-sampling shape: explode payloads into 256-byte frames, histogram "
    "of frames-per-document (validates the chunking arithmetic).",
)
def multimodal_frame_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir)["documents"]
    binary = mm.to_binary_table(docs, "doc_id", "text")
    frames = mm.sample_frames(binary)
    per_doc = frames.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_frames"))
    return per_doc.groupBy("n_frames").agg(F.count(F.lit(1)).alias("n_docs"))
