"""Delta Lake connector (gated — jars not bundled in this environment).

Reference: ``CREATE EXTERNAL TABLE d STORED AS DELTATABLE LOCATION ...``
via DeltaTableFactory (extensions/deltalake.rs:34-51, test
tests/extension_cases/deltalake.rs:23-45). The Spark-native equivalent
is ``spark.read.format("delta")`` with the delta-spark package on the
classpath; this container doesn't ship it, so the reader probes for it
and fails with an actionable error instead of a ClassNotFound stack.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


class DeltaNotAvailable(RuntimeError):
    pass


def delta_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.java.lang.Class.forName("org.apache.spark.sql.delta.DeltaLog")
        return True
    except Exception:
        return False


def read_delta(spark: SparkSession, path: str, version: int | None = None) -> DataFrame:
    """Read a Delta table (time travel via ``version``) when available."""
    if not delta_available(spark):
        raise DeltaNotAvailable(
            "Delta Lake support needs the delta-spark package on the Spark "
            "classpath (spark.jars.packages=io.delta:delta-spark_2.13:<ver> "
            "+ DeltaSparkSessionExtension); not bundled in this environment."
        )
    reader = spark.read.format("delta")
    if version is not None:
        reader = reader.option("versionAsOf", version)
    return reader.load(path)
