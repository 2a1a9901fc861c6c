"""Delta Lake connector.

Reference: ``CREATE EXTERNAL TABLE d STORED AS DELTATABLE LOCATION ...``
via DeltaTableFactory (extensions/deltalake.rs:34-51, test
tests/extension_cases/deltalake.rs:23-45). Two paths:

- **delta-spark jars present**: ``spark.read.format("delta")`` — the
  full-fidelity path (checkpoints, DVs, column mapping); preferred
  automatically.
- **pure-Python transaction-log replay** (this environment — the
  container ships no delta jars): the Delta protocol's commit log is
  just newline-delimited JSON actions under ``_delta_log/``; replaying
  ``add``/``remove`` actions yields the active file set for any
  version, and ``metaData.schemaString`` is literally a Spark schema
  JSON. The data files are plain parquet, so the result is an ordinary
  pruned/pushed-down parquet scan — the log parse touches only
  metadata on the driver, exactly like Delta's own snapshot
  reconstruction. Supports time travel (``version=``) and partitioned
  tables (``partitionValues`` rehydrated as literal columns, cast
  through the declared schema). JSON-commit replay only: compacted
  checkpoint parquet is not parsed, so tables whose early JSON commits
  were vacuumed raise (the jar path handles those).
"""

from __future__ import annotations

import glob
import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


class DeltaNotAvailable(RuntimeError):
    pass


def delta_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.java.lang.Class.forName("org.apache.spark.sql.delta.DeltaLog")
        return True
    except Exception:
        return False


def _replay_log(path: str, version: int | None) -> tuple[T.StructType, list[str], list[dict]]:
    """Replay JSON commits 0..version -> (schema, partition_cols, active adds)."""
    log_dir = os.path.join(path, "_delta_log")
    commit_files = sorted(glob.glob(os.path.join(log_dir, "*.json")))
    commits = {int(os.path.basename(p).split(".")[0]): p for p in commit_files}
    if not commits:
        raise DeltaNotAvailable(f"no Delta commit log under {log_dir}")
    last = max(commits) if version is None else version
    required = range(0, last + 1)
    missing = [v for v in required if v not in commits]
    if missing:
        raise DeltaNotAvailable(
            f"Delta JSON commits {missing} absent under {log_dir} (vacuumed "
            "into a checkpoint?) — the pure-Python reader replays JSON "
            "commits only; install delta-spark jars for checkpointed tables"
        )
    schema_json: str | None = None
    partition_cols: list[str] = []
    active: dict[str, dict] = {}
    for v in required:
        with open(commits[v]) as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                action = json.loads(line)
                if "metaData" in action:
                    schema_json = action["metaData"]["schemaString"]
                    partition_cols = list(action["metaData"].get("partitionColumns", []))
                elif "add" in action:
                    active[action["add"]["path"]] = action["add"]
                elif "remove" in action:
                    active.pop(action["remove"]["path"], None)
    if schema_json is None:
        raise DeltaNotAvailable(f"no metaData action in {log_dir}")
    schema = T.StructType.fromJson(json.loads(schema_json))
    return schema, partition_cols, list(active.values())


def _read_delta_python(spark: SparkSession, path: str, version: int | None) -> DataFrame:
    schema, partition_cols, adds = _replay_log(path, version)
    data_fields = [f for f in schema.fields if f.name not in partition_cols]
    data_schema = T.StructType(data_fields)
    if not adds:
        return spark.createDataFrame([], schema)
    # Group files by partition tuple; each group is one parquet scan with
    # the partition values attached as literals (cast through the declared
    # types) — Spark sees ordinary parquet relations, so pruning/pushdown
    # apply per group.
    by_part: dict[tuple, list[str]] = {}
    for add in adds:
        pv = add.get("partitionValues", {}) or {}
        key = tuple(pv.get(c) for c in partition_cols)
        by_part.setdefault(key, []).append(os.path.join(path, add["path"]))
    parts: list[DataFrame] = []
    for key, files in sorted(by_part.items()):
        df = spark.read.schema(data_schema).parquet(*files)
        for c, raw in zip(partition_cols, key):
            typ = schema[c].dataType
            df = df.withColumn(c, F.lit(raw).cast(typ))
        parts.append(df.select(*[f.name for f in schema.fields]))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def read_delta(spark: SparkSession, path: str, version: int | None = None) -> DataFrame:
    """Read a Delta table (time travel via ``version``).

    Prefers the delta-spark jar path when present; otherwise replays the
    transaction log in pure Python (JSON commits only).
    """
    if delta_available(spark):
        reader = spark.read.format("delta")
        if version is not None:
            reader = reader.option("versionAsOf", version)
        return reader.load(path)
    return _read_delta_python(spark, path, version)
