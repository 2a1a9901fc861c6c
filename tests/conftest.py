"""Shared fixtures: one SparkSession + one DuckDB oracle per test session."""

from __future__ import annotations

import os

import duckdb
import pytest

from datafusion_dft_spark.catalog import TABLES, table_path
from datafusion_dft_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR


@pytest.fixture(scope="session")
def spark():
    spark = get_spark(
        master=f"local[{os.environ.get('SPARK_GRAFT_TEST_CPUS', '4')}]",
        app_name="datafusion-dft-spark-tests",
        conf={"spark.sql.shuffle.partitions": "4", "spark.driver.memory": "4g"},
    )
    yield spark


@pytest.fixture(scope="session")
def duckcon():
    con = duckdb.connect()
    for t in TABLES:
        p = table_path(SF_DIR, t)
        if os.path.exists(p):
            con.sql(f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{p}'")
    yield con
    con.close()
