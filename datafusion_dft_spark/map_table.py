"""MapTable: a PK-keyed, upserting in-memory table.

Reference: crates/datafusion-app/src/tables/map_table.rs —

- rows live in an insertion-ordered map keyed by the primary-key value
  (``IndexMap<ScalarValue, HashMap<col, val>>``, map_table.rs:46-52):
  re-inserting a key replaces the row in place, preserving the
  original position — upsert semantics;
- scans materialize the map into record batches against the declared
  schema, rejecting columns outside it (map_table.rs:101-137);
- the table backs the observability schema and is serialized on app
  shutdown (map_table.rs:69-71).

Spark analog: the driver-side map re-registers as a temp view after
each mutation (the same rebuild-on-read the reference performs per
scan), so SQL sees a plain relation and Catalyst handles projection /
filters. Serialization round-trips through parquet. This table is an
app-state structure (requests log, counters) — thousands of rows on
the driver, never a data-plane table, so a driver-side dict is the
right scale answer; corpus-scale upserts belong to Delta/merge, not
here.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


class MapTable:
    def __init__(
        self,
        spark: SparkSession,
        name: str,
        schema: T.StructType,
        primary_key: str | tuple[str, ...],
        register: bool = True,
    ):
        pk = (primary_key,) if isinstance(primary_key, str) else tuple(primary_key)
        missing = [c for c in pk if c not in schema.fieldNames()]
        if missing:
            raise ValueError(f"primary key {missing} not in schema")
        self._spark = spark
        self.name = name
        self.schema = schema
        self.primary_key = pk
        self._fields = set(schema.fieldNames())
        self._rows: dict[object, dict] = {}  # insertion-ordered (py3.7+ dict)
        self._register = register
        if register:
            self.refresh()

    # ------------------------------------------------------------- mutation

    def upsert(self, *rows: dict) -> int:
        """Insert or replace rows by primary key.

        Same-key rows keep their original position (IndexMap
        ``insert``); unknown columns error like map_table.rs:119-127.
        """
        for row in rows:
            extra = set(row) - self._fields
            if extra:
                raise ValueError(
                    f"columns {sorted(extra)} for table {self.name} are not in the provided schema"
                )
            key = self._key_of(row)
            # REPLACE the whole row (IndexMap insert semantics,
            # map_table.rs:101-120): re-inserting a narrower row must not
            # keep stale column values from the old row. Python dict
            # assignment keeps an existing key's position, matching
            # IndexMap insert.
            self._rows[key] = dict(row)
        if self._register:
            self.refresh()
        return len(rows)

    def delete(self, *keys) -> int:
        n = 0
        for k in keys:
            if self._rows.pop(k, None) is not None:
                n += 1
        if n and self._register:
            self.refresh()
        return n

    def _key_of(self, row: dict):
        vals = tuple(row.get(c) for c in self.primary_key)
        if any(v is None for v in vals):
            raise ValueError(f"row is missing primary key {self.primary_key!r}")
        return vals[0] if len(vals) == 1 else vals

    def get(self, key) -> dict | None:
        """O(1) primary-key lookup (the map's reason to exist)."""
        row = self._rows.get(key)
        return dict(row) if row is not None else None

    def __len__(self) -> int:
        return len(self._rows)

    # ---------------------------------------------------------------- scan

    def df(self) -> DataFrame:
        """Materialize the map against the declared schema (one batch)."""
        data = [
            tuple(row.get(f) for f in self.schema.fieldNames())
            for row in self._rows.values()
        ]
        return self._spark.createDataFrame(data, self.schema)

    def refresh(self) -> DataFrame:
        out = self.df()
        out.createOrReplaceTempView(self.name)
        return out

    # ------------------------------------------------------- serialization

    def save(self, path: str) -> None:
        """Shutdown serialization (map_table.rs:69-71) as parquet."""
        self.df().coalesce(1).write.mode("overwrite").parquet(path)

    def load(self, path: str) -> int:
        """Restore rows from a prior ``save``; returns rows loaded."""
        if not os.path.exists(path):
            return 0
        n = 0
        for r in self._spark.read.schema(self.schema).parquet(path).collect():
            d = r.asDict()
            self._rows[self._key_of(d)] = d
            n += 1
        if self._register:
            self.refresh()
        return n
