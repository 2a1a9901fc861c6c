"""Physical data layout for scale: bucketing and partitioned writes.

These are the 100 TB levers the queries in this repo assume:

- **Bucketing** pre-shuffles a table ONCE at write time. Two tables
  bucketed on the same key with the same bucket count join with *zero*
  exchanges — the recurring fact-fact join (orders x lineitem) stops
  paying its shuffle on every query. ``tests/test_layout.py`` asserts
  the exchange-free plan.
- **Partitioned writes** (e.g. by date) let the reader prune whole
  directories: a day-filtered scan touches 1/Nth of the data before a
  single row is read. Asserted via PartitionFilters in the scan node.

Both compose with the generator (tools/tpch_gen.py) to produce
benchmark corpora in either layout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 8,
    sort_col: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (and optionally sorted) table.

    Joins/aggregations on ``bucket_col`` against tables bucketed the
    same way run without a shuffle exchange.
    """
    writer = df.write.mode(mode).bucketBy(n_buckets, bucket_col)
    if sort_col:
        writer = writer.sortBy(sort_col)
    writer.saveAsTable(table)


def write_partitioned(
    df: DataFrame, path: str, partition_cols: list[str], mode: str = "overwrite"
) -> None:
    """Hive-style partitioned parquet layout (directory per value)."""
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def read_partitioned(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)
