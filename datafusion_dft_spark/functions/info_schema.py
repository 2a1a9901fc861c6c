"""information_schema emulation over spark.catalog.

Reference: dft enables DataFusion's information_schema
(extensions/builder.rs:82,100-102) and asserts tables/views/columns/
schemata contents (src/db.rs:186-198). Spark exposes the same facts
through ``spark.catalog``; the SQL layer rewrites
``information_schema.X`` to these ``__info_X`` temp views, refreshed
at query time.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import types as T

_TABLES_SCHEMA = T.StructType(
    [
        T.StructField("table_catalog", T.StringType()),
        T.StructField("table_schema", T.StringType()),
        T.StructField("table_name", T.StringType()),
        T.StructField("table_type", T.StringType()),
    ]
)

_COLUMNS_SCHEMA = T.StructType(
    [
        T.StructField("table_catalog", T.StringType()),
        T.StructField("table_schema", T.StringType()),
        T.StructField("table_name", T.StringType()),
        T.StructField("column_name", T.StringType()),
        T.StructField("ordinal_position", T.LongType()),
        T.StructField("data_type", T.StringType()),
        T.StructField("is_nullable", T.StringType()),
    ]
)

_SCHEMATA_SCHEMA = T.StructType(
    [
        T.StructField("catalog_name", T.StringType()),
        T.StructField("schema_name", T.StringType()),
    ]
)


def refresh_information_schema(spark: SparkSession) -> None:
    catalog = spark.catalog.currentCatalog()
    tables = []
    columns = []
    for db in spark.catalog.listDatabases():
        tables_in_db = spark.catalog.listTables(db.name)
        for t in tables_in_db:
            if t.tableType == "TEMPORARY" and not t.namespace:
                # listTables(db) repeats session temp views under EVERY
                # database; they are catalogued once below instead.
                continue
            ttype = "VIEW" if t.tableType in ("TEMPORARY", "VIEW") else "BASE TABLE"
            schema = t.namespace[0] if t.namespace else db.name
            tables.append((t.catalog or catalog, schema, t.name, ttype))
            try:
                for i, c in enumerate(spark.catalog.listColumns(t.name, t.namespace[0] if t.namespace else None)):
                    columns.append(
                        (
                            t.catalog or catalog,
                            schema,
                            t.name,
                            c.name,
                            i + 1,
                            c.dataType,
                            "YES" if c.nullable else "NO",
                        )
                    )
            except Exception:
                pass
    # Session temp views live outside databases — catalogued exactly once
    # under the "session" schema (with their columns), regardless of how
    # many databases exist or whether a db table shares the name.
    for t in spark.catalog.listTables():
        if t.tableType == "TEMPORARY" and not t.namespace:
            tables.append((catalog, "session", t.name, "VIEW"))
            try:
                for i, c in enumerate(spark.catalog.listColumns(t.name)):
                    columns.append(
                        (catalog, "session", t.name, c.name, i + 1, c.dataType, "YES" if c.nullable else "NO")
                    )
            except Exception:
                pass
    schemata = [(catalog, db.name) for db in spark.catalog.listDatabases()]

    spark.createDataFrame(tables, _TABLES_SCHEMA).createOrReplaceTempView("__info_tables")
    spark.createDataFrame(columns, _COLUMNS_SCHEMA).createOrReplaceTempView("__info_columns")
    spark.createDataFrame(
        [t for t in tables if t[3] == "VIEW"], _TABLES_SCHEMA
    ).createOrReplaceTempView("__info_views")
    spark.createDataFrame(schemata, _SCHEMATA_SCHEMA).createOrReplaceTempView(
        "__info_schemata"
    )
