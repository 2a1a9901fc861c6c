"""The reference's OWN documented SQL examples run unchanged here.

Each statement below is copied verbatim from /root/reference/docs
(features.md, cli.md) — the exact strings a dft user has in their
muscle memory — and executed through this engine's SQL frontend
(prepare_statement rewrites + Spark 4's native `::` casts). This is
the switching-user contract made executable.
"""

from __future__ import annotations

import pytest

from datafusion_dft_spark.catalog import table_path
from datafusion_dft_spark.sql import execute_sql


def test_cli_smoke_example(spark):
    # cli.md:12 — dft -c "SELECT 1+2"
    assert execute_sql(spark, "SELECT 1+2")[0].collect()[0][0] == 3


def test_parquet_metadata_example(spark, sf_dir):
    # features.md:12 — SELECT * FROM parquet_metadata('my_parquet_file.parquet')
    path = table_path(sf_dir, "lineitem")
    rows = execute_sql(spark, f"SELECT * FROM parquet_metadata('{path}')")[0].collect()
    assert rows and rows[0].path_in_schema


def test_json_get_cast_example(spark):
    # features.md:116 — select * from foo where
    #   json_get(attributes, 'bar')::string='ham'
    spark.sql(
        "SELECT * FROM VALUES (1, '{\"bar\": \"ham\"}'), (2, '{\"bar\": \"x\"}') "
        "AS t(id, attributes)"
    ).createOrReplaceTempView("foo")
    rows = execute_sql(
        spark, "select * from foo where json_get(attributes, 'bar')::string='ham'"
    )[-1].collect()
    assert [r.id for r in rows] == [1]


def test_create_external_table_example(spark, sf_dir):
    # features.md:87 — CREATE EXTERNAL TABLE my_table STORED AS PARQUET
    #   LOCATION '...' (local path stands in for the s3 bucket)
    loc = table_path(sf_dir, "region")
    execute_sql(
        spark,
        f"CREATE EXTERNAL TABLE doc_example_table STORED AS PARQUET LOCATION '{loc}'",
    )
    assert spark.table("doc_example_table").count() == 5
    spark.catalog.dropTempView("doc_example_table")


def test_deltatable_example_fails_actionably(spark, tmp_path):
    # features.md:108 — CREATE EXTERNAL TABLE ... STORED AS DELTATABLE:
    # with no _delta_log at the location the error must name the problem
    from datafusion_dft_spark.sources.delta import DeltaNotAvailable, delta_available

    if delta_available(spark):
        pytest.skip("delta-spark on classpath")
    with pytest.raises(DeltaNotAvailable, match="commit log"):
        execute_sql(
            spark,
            f"CREATE EXTERNAL TABLE t STORED AS DELTATABLE LOCATION '{tmp_path}'",
        )
