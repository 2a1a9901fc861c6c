"""Readers and writers with format inference.

Reference analogs:
- reading: format sniffed from file extension when registering tables
  (src/db.rs:37-52) — parquet / csv / ndjson (+ arrow);
- writing: the CLI's ``-o out.{csv,json,parquet}`` suffix-inferred
  ``AnyWriter`` (src/cli/mod.rs:780-806) and SQL ``COPY (query) TO
  'file'`` (tests/cli_cases/basic.rs:350-365).

Scale note: writers go through ``df.write`` (distributed, one file per
partition). ``single_file=True`` coalesces to one partition for
CLI-sized exports — correct for tool output, wrong for bulk data, so
it is opt-in.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

READ_FORMATS = {
    ".parquet": "parquet",
    ".csv": "csv",
    ".json": "json",
    ".ndjson": "json",
    ".jsonl": "json",
    ".arrow": "arrow",
}


def infer_format(path: str) -> str:
    ext = os.path.splitext(path)[1].lower()
    fmt = READ_FORMATS.get(ext)
    if fmt is None:
        raise ValueError(f"cannot infer storage format from suffix: {path!r}")
    return fmt


def read_any(spark: SparkSession, path: str, fmt: str | None = None) -> DataFrame:
    fmt = fmt or infer_format(path)
    reader = spark.read
    if fmt == "csv":
        reader = reader.option("header", "true").option("inferSchema", "true")
    if fmt == "arrow":
        # No bundled Arrow-IPC reader in this build: read via pyarrow into
        # a DataFrame (driver-side; fine for the CLI use the reference has).
        import pyarrow.ipc as ipc

        with open(path, "rb") as f:
            table = ipc.open_file(f).read_all()
        return spark.createDataFrame(table.to_pandas())
    return reader.format(fmt).load(path)


def write_any(
    df: DataFrame,
    path: str,
    fmt: str | None = None,
    mode: str = "overwrite",
    single_file: bool = False,
) -> str:
    """Write ``df`` to ``path`` in the suffix-inferred format."""
    fmt = fmt or infer_format(path)
    out = df.coalesce(1) if single_file else df
    writer = out.write.mode(mode)
    if fmt == "csv":
        writer = writer.option("header", "true")
    if fmt == "arrow":
        import pyarrow as pa
        import pyarrow.ipc as ipc

        table = pa.Table.from_pandas(df.toPandas())
        with ipc.new_file(path, table.schema) as w:
            w.write_table(table)
        return path
    writer.format(fmt).save(path)
    return path


def copy_to(spark: SparkSession, query: str, path: str, fmt: str | None = None) -> int:
    """SQL-level export: ``COPY (query) TO 'file'`` equivalent.

    Returns the number of rows exported.
    """
    df = spark.sql(query)
    n = df.count()
    write_any(df, path, fmt=fmt, single_file=True)
    return n
