"""``parquet_metadata('file.parquet')`` table function.

Reference: crates/datafusion-functions-parquet/src/lib.rs:143-291 — a
UDTF exposing one row per (row_group, column chunk) with stats. Spark
has no built-in equivalent; pyarrow reads the footer (driver-side —
footers are KBs, not data) and the result becomes a DataFrame.
Column set mirrors lib.rs:160-185 (all 24 columns incl. logical_type).
"""

from __future__ import annotations

import pyarrow.parquet as pq
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

SCHEMA = T.StructType(
    [
        T.StructField("filename", T.StringType()),
        T.StructField("row_group_id", T.LongType()),
        T.StructField("row_group_num_rows", T.LongType()),
        T.StructField("row_group_num_columns", T.LongType()),
        T.StructField("row_group_bytes", T.LongType()),
        T.StructField("column_id", T.LongType()),
        T.StructField("file_offset", T.LongType()),
        T.StructField("num_values", T.LongType()),
        T.StructField("path_in_schema", T.StringType()),
        T.StructField("type", T.StringType()),
        T.StructField("logical_type", T.StringType()),
        T.StructField("stats_min", T.StringType()),
        T.StructField("stats_max", T.StringType()),
        T.StructField("stats_null_count", T.LongType()),
        T.StructField("stats_distinct_count", T.LongType()),
        T.StructField("stats_min_value", T.StringType()),
        T.StructField("stats_max_value", T.StringType()),
        T.StructField("compression", T.StringType()),
        T.StructField("encodings", T.StringType()),
        T.StructField("index_page_offset", T.LongType()),
        T.StructField("dictionary_page_offset", T.LongType()),
        T.StructField("data_page_offset", T.LongType()),
        T.StructField("total_compressed_size", T.LongType()),
        T.StructField("total_uncompressed_size", T.LongType()),
    ]
)


def parquet_metadata_rows(path: str) -> list[tuple]:
    pf = pq.ParquetFile(path)
    md = pf.metadata
    schema = pf.schema
    rows: list[tuple] = []
    for rg_id in range(md.num_row_groups):
        rg = md.row_group(rg_id)
        for col_id in range(rg.num_columns):
            c = rg.column(col_id)
            st = c.statistics
            rows.append(
                (
                    path,
                    rg_id,
                    rg.num_rows,
                    rg.num_columns,
                    rg.total_byte_size,
                    col_id,
                    c.file_offset,
                    c.num_values,
                    c.path_in_schema,
                    str(c.physical_type),
                    str(schema.column(col_id).logical_type),
                    str(st.min) if st and st.has_min_max else None,
                    str(st.max) if st and st.has_min_max else None,
                    st.null_count if st and st.has_null_count else None,
                    st.distinct_count if st and st.has_distinct_count else None,
                    str(st.min) if st and st.has_min_max else None,
                    str(st.max) if st and st.has_min_max else None,
                    str(c.compression),
                    ",".join(map(str, c.encodings)),
                    None,
                    c.dictionary_page_offset,
                    c.data_page_offset,
                    c.total_compressed_size,
                    c.total_uncompressed_size,
                )
            )
    return rows


def parquet_metadata_df(spark: SparkSession, path: str) -> DataFrame:
    return spark.createDataFrame(parquet_metadata_rows(path), SCHEMA)
