"""MapTable golden-batch tests mirroring tables/map_table.rs and the
observability round-trip (observability/mod.rs:164-232)."""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from datafusion_dft_spark.map_table import MapTable
from datafusion_dft_spark.observability import Observability

SCHEMA = T.StructType(
    [
        T.StructField("id", T.IntegerType(), False),
        T.StructField("val", T.StringType(), True),
    ]
)


def test_scan_golden_batch(spark):
    """map_table.rs:400-420 — seed rows, scan, assert batch contents."""
    t = MapTable(spark, "map_golden", SCHEMA, primary_key="id")
    t.upsert({"id": 1, "val": "a"}, {"id": 2, "val": "b"}, {"id": 3, "val": "c"})
    rows = [(r.id, r.val) for r in spark.table("map_golden").collect()]
    assert rows == [(1, "a"), (2, "b"), (3, "c")]


def test_upsert_replaces_in_place(spark):
    """IndexMap semantics: same key replaces, keeps insertion position."""
    t = MapTable(spark, "map_upsert", SCHEMA, primary_key="id")
    t.upsert({"id": 1, "val": "a"}, {"id": 2, "val": "b"})
    t.upsert({"id": 1, "val": "A2"})
    rows = [(r.id, r.val) for r in spark.table("map_upsert").collect()]
    assert rows == [(1, "A2"), (2, "b")]
    assert len(t) == 2
    assert t.get(1) == {"id": 1, "val": "A2"}


def test_narrower_upsert_replaces_whole_row(spark):
    """IndexMap insert REPLACES the stored row (map_table.rs:101-120):
    re-inserting a narrower row must not keep stale column values."""
    t = MapTable(spark, "map_partial", SCHEMA, primary_key="id", register=False)
    t.upsert({"id": 7, "val": "x"})
    t.upsert({"id": 7})  # no val: the old 'x' must NOT survive
    assert t.get(7) == {"id": 7}
    assert [tuple(r) for r in t.df().collect()] == [(7, None)]


def test_unknown_column_rejected(spark):
    """map_table.rs:119-127 — columns outside the schema error."""
    t = MapTable(spark, "map_badcol", SCHEMA, primary_key="id", register=False)
    with pytest.raises(ValueError, match="not in the provided schema"):
        t.upsert({"id": 1, "nope": 9})
    with pytest.raises(ValueError, match="missing primary key"):
        t.upsert({"val": "v"})


def test_delete_and_len(spark):
    t = MapTable(spark, "map_del", SCHEMA, primary_key="id", register=False)
    t.upsert({"id": 1, "val": "a"}, {"id": 2, "val": "b"})
    assert t.delete(1, 99) == 1
    assert len(t) == 1 and t.get(1) is None


def test_sql_projection_and_filter(spark):
    """The view is a plain relation: Catalyst projects/filters it."""
    t = MapTable(spark, "map_sql", SCHEMA, primary_key="id")
    t.upsert(*[{"id": i, "val": f"v{i}"} for i in range(10)])
    out = spark.sql("SELECT val FROM map_sql WHERE id >= 8 ORDER BY id").collect()
    assert [r.val for r in out] == ["v8", "v9"]


def test_save_load_round_trip(spark, tmp_path):
    """Shutdown serialization (map_table.rs:69-71) round-trips."""
    p = str(tmp_path / "map_table_state")
    t = MapTable(spark, "map_save", SCHEMA, primary_key="id", register=False)
    t.upsert({"id": 1, "val": "a"}, {"id": 2, "val": None})
    t.save(p)
    t2 = MapTable(spark, "map_load", SCHEMA, primary_key="id", register=False)
    assert t2.load(p) == 2
    assert t2.get(2) == {"id": 2, "val": None}
    assert {r.id for r in t2.df().collect()} == {1, 2}


def test_composite_primary_key(spark):
    schema = T.StructType(
        [
            T.StructField("rid", T.StringType(), False),
            T.StructField("path", T.StringType(), False),
            T.StructField("n", T.IntegerType(), True),
        ]
    )
    t = MapTable(spark, "map_composite", schema, primary_key=("rid", "path"), register=False)
    t.upsert({"rid": "a", "path": "/x", "n": 1}, {"rid": "a", "path": "/y", "n": 2})
    t.upsert({"rid": "a", "path": "/x", "n": 3})  # same composite key: replaces
    assert len(t) == 2
    assert t.get(("a", "/x"))["n"] == 3
    with pytest.raises(ValueError, match="missing primary key"):
        t.upsert({"rid": "a", "n": 4})


def test_observability_persistence_round_trip(spark, tmp_path):
    """[db] path — the requests log survives a server restart
    (map_table.rs:69-71 shutdown serialization)."""
    p = str(tmp_path / "dbdir")
    a = Observability(spark, view_name="req_persist_a", persist_path=p)
    a.record("/sql", "SELECT 1", 10, 1, 200, request_id="r1")
    a.save()
    # "restart": a fresh instance with a different view name, same path
    # layout — copy the file to the new view's location to simulate
    # a same-name reload without clashing temp views in the shared session
    import shutil

    shutil.copytree(
        f"{p}/observability/req_persist_a", f"{p}/observability/req_persist_b"
    )
    b = Observability(spark, view_name="req_persist_b", persist_path=p)
    rows = spark.table("req_persist_b").collect()
    assert len(rows) == 1 and rows[0].request_id == "r1" and rows[0].path == "/sql"


def test_observability_on_map_table(spark):
    """observability/mod.rs:185-231 — record one request, read it back
    through SQL with the exact reference schema."""
    obs = Observability(spark, view_name="requests_mt")
    obs.record("/sql", "SELECT 1", 200, 1, 200, request_id="fixed-id")
    row = spark.sql(
        "SELECT request_id, path, sql, duration_ms, rows, status FROM requests_mt"
    ).collect()[0]
    assert row.asDict() == {
        "request_id": "fixed-id",
        "path": "/sql",
        "sql": "SELECT 1",
        "duration_ms": 200,
        "rows": 1,
        "status": 200,
    }
    # upsert by request_id: re-recording the same id replaces, not appends
    obs.record("/sql", "SELECT 1", 350, 1, 200, request_id="fixed-id")
    rows = spark.table("requests_mt").collect()
    assert len(rows) == 1 and rows[0].duration_ms == 350
