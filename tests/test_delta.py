"""Delta Lake read path on a hand-written protocol fixture.

Mirrors tests/extension_cases/deltalake.rs:23-45 (the reference reads a
committed ``simple_table`` dataset) without needing delta-spark jars:
the fixture is two JSON commits + plain parquet files written by
pyarrow, i.e. exactly what the Delta protocol puts on disk.
"""

from __future__ import annotations

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from datafusion_dft_spark.sources.delta import DeltaNotAvailable, read_delta
from datafusion_dft_spark.sql import prepare_statement

SCHEMA_JSON = json.dumps(
    {
        "type": "struct",
        "fields": [
            {"name": "id", "type": "long", "nullable": True, "metadata": {}},
            {"name": "val", "type": "string", "nullable": True, "metadata": {}},
            {"name": "part", "type": "string", "nullable": True, "metadata": {}},
        ],
    }
)


def _write_commit(log_dir: str, version: int, actions: list[dict]) -> None:
    with open(os.path.join(log_dir, f"{version:020d}.json"), "w") as f:
        for a in actions:
            f.write(json.dumps(a) + "\n")


def _add(path: str, part: str, size: int) -> dict:
    return {
        "add": {
            "path": path,
            "partitionValues": {"part": part},
            "size": size,
            "modificationTime": 1700000000000,
            "dataChange": True,
        }
    }


@pytest.fixture(scope="module")
def delta_table(tmp_path_factory) -> str:
    """Two-commit partitioned table: v0 = file a (3 rows, part=x);
    v1 removes a, adds b (2 rows, part=x) and c (2 rows, part=y)."""
    root = tmp_path_factory.mktemp("delta") / "simple_table"
    log_dir = root / "_delta_log"
    log_dir.mkdir(parents=True)

    def write_file(rel: str, ids: list[int]) -> int:
        dest = root / rel
        dest.parent.mkdir(parents=True, exist_ok=True)
        pq.write_table(
            pa.table({"id": pa.array(ids, pa.int64()),
                      "val": pa.array([f"v{i}" for i in ids], pa.string())}),
            dest,
        )
        return os.path.getsize(dest)

    sz_a = write_file("part=x/a.parquet", [1, 2, 3])
    sz_b = write_file("part=x/b.parquet", [10, 11])
    sz_c = write_file("part=y/c.parquet", [20, 21])
    _write_commit(
        str(log_dir),
        0,
        [
            {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
            {
                "metaData": {
                    "id": "00000000-0000-0000-0000-000000000001",
                    "format": {"provider": "parquet", "options": {}},
                    "schemaString": SCHEMA_JSON,
                    "partitionColumns": ["part"],
                    "configuration": {},
                    "createdTime": 1700000000000,
                }
            },
            _add("part=x/a.parquet", "x", sz_a),
        ],
    )
    _write_commit(
        str(log_dir),
        1,
        [
            {"remove": {"path": "part=x/a.parquet", "deletionTimestamp": 1700000001000, "dataChange": True}},
            _add("part=x/b.parquet", "x", sz_b),
            _add("part=y/c.parquet", "y", sz_c),
        ],
    )
    return str(root)


def test_read_latest_version(spark, delta_table):
    rows = {(r.id, r.val, r.part) for r in read_delta(spark, delta_table).collect()}
    assert rows == {(10, "v10", "x"), (11, "v11", "x"), (20, "v20", "y"), (21, "v21", "y")}


def test_time_travel_v0(spark, delta_table):
    rows = {(r.id, r.val, r.part) for r in read_delta(spark, delta_table, version=0).collect()}
    assert rows == {(1, "v1", "x"), (2, "v2", "x"), (3, "v3", "x")}


def test_schema_matches_metadata(spark, delta_table):
    df = read_delta(spark, delta_table)
    assert [f.name for f in df.schema.fields] == ["id", "val", "part"]
    assert df.schema["id"].dataType.simpleString() == "bigint"
    assert df.schema["part"].dataType.simpleString() == "string"


def test_ddl_registers_delta_view(spark, delta_table):
    """CREATE EXTERNAL TABLE ... STORED AS DELTATABLE over the fixture."""
    spark.sql(prepare_statement(
        spark, f"CREATE EXTERNAL TABLE dt STORED AS DELTATABLE LOCATION '{delta_table}'"
    ))
    assert spark.table("dt").count() == 4
    spark.catalog.dropTempView("dt")


def test_missing_commit_raises(spark, delta_table, tmp_path):
    """A gap in the JSON history (vacuumed into a checkpoint) must raise
    the actionable error, not silently return a partial snapshot."""
    import shutil

    broken = tmp_path / "broken"
    shutil.copytree(delta_table, broken)
    os.remove(broken / "_delta_log" / f"{0:020d}.json")
    with pytest.raises(DeltaNotAvailable, match="absent"):
        read_delta(spark, str(broken))
