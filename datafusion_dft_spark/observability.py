"""In-engine observability: the ``requests`` table.

Reference: crates/datafusion-app/src/observability/mod.rs:144-157 — a
per-request log queryable as a table. Schema mirrored exactly (unsigned
columns widened per SURVEY.md §7: rows u64→long, status u16→int).
Rows accumulate in memory and re-register as the ``requests`` temp view
on each insert — the same rebuild-on-read approach the reference's
MapTable takes (tables/map_table.rs:101-120).
"""

from __future__ import annotations

import datetime as dt
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

SCHEMA = T.StructType(
    [
        T.StructField("request_id", T.StringType(), True),
        T.StructField("path", T.StringType(), False),
        T.StructField("sql", T.StringType(), True),
        T.StructField("timestamp", T.TimestampType(), False),
        T.StructField("duration_ms", T.LongType(), False),
        T.StructField("rows", T.LongType(), True),
        T.StructField("status", T.IntegerType(), False),
    ]
)


class Observability:
    def __init__(self, spark: SparkSession, view_name: str = "requests"):
        self._spark = spark
        self._view = view_name
        self._rows: list[tuple] = []
        self.refresh()

    def record(
        self,
        path: str,
        sql: str | None,
        duration_ms: int,
        rows: int | None,
        status: int,
        request_id: str | None = None,
    ) -> str:
        rid = request_id or str(uuid.uuid4())
        self._rows.append(
            (
                rid,
                path,
                sql,
                dt.datetime.now(dt.timezone.utc).replace(tzinfo=None),
                int(duration_ms),
                None if rows is None else int(rows),
                int(status),
            )
        )
        self.refresh()
        return rid

    def refresh(self) -> DataFrame:
        df = self._spark.createDataFrame(self._rows, SCHEMA)
        df.createOrReplaceTempView(self._view)
        return df

    def df(self) -> DataFrame:
        return self._spark.table(self._view)
