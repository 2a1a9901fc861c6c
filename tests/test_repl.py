"""Interactive-shell tests, mirroring the reference's TUI e2e strategy.

The reference drives its ratatui app with simulated keystrokes and
asserts app state (``tests/tui_cases/{sql_execution,ddl,pagination}.rs``
+ ``src/tui/pagination.rs:73-100`` unit tests). The REPL core here is
I/O-injected, so the same behaviors are driven through ``feed()``.
"""

from __future__ import annotations

import pyarrow as pa

from datafusion_dft_spark.repl import (
    PAGE_SIZE,
    Repl,
    extract_page,
    has_sufficient_rows,
    page_row_range,
)


def test_page_row_range():
    # pagination.rs:78-82 goldens
    assert page_row_range(0, 100) == (0, 100)
    assert page_row_range(1, 100) == (100, 200)
    assert page_row_range(2, 50) == (100, 150)


def test_has_sufficient_rows():
    # pagination.rs:85-91 goldens
    assert has_sufficient_rows(100, 0, 100)
    assert has_sufficient_rows(150, 0, 100)
    assert not has_sufficient_rows(50, 0, 100)
    assert not has_sufficient_rows(150, 1, 100)


def test_extract_page_across_batch_boundaries():
    batches = [
        pa.RecordBatch.from_pylist([{"x": i} for i in range(60)]),
        pa.RecordBatch.from_pylist([{"x": i} for i in range(60, 130)]),
    ]
    p0 = extract_page(batches, 0)
    assert p0.num_rows == PAGE_SIZE and p0.column("x").to_pylist()[:3] == [0, 1, 2]
    p1 = extract_page(batches, 1)
    assert p1.column("x").to_pylist() == list(range(100, 130))
    # beyond data -> empty with the result schema (pagination.rs:40-44)
    beyond = extract_page(batches, 5)
    assert beyond.num_rows == 0 and beyond.schema == batches[0].schema
    # no batches -> empty schema (pagination.rs:30-34)
    assert extract_page([], 0).schema == pa.schema([])


def _repl(spark):
    lines: list[str] = []
    return Repl(spark, echo=lines.append), lines


def test_sql_execution_and_timing(spark):
    # tui_cases/sql_execution.rs shape: type a query, see rows + elapsed.
    repl, out = _repl(spark)
    assert repl.feed("\\timing")
    assert repl.feed("SELECT 1 AS one;")
    assert any("one" in x for x in out) and any("elapsed:" in x for x in out)


def test_ddl_visible_across_statements(spark):
    # tui_cases/ddl.rs: DDL in one statement, queried by the next.
    repl, out = _repl(spark)
    repl.feed("CREATE OR REPLACE TEMPORARY VIEW repl_v AS")
    repl.feed("SELECT * FROM VALUES (1), (2), (3) AS t(v);")
    repl.feed("SELECT sum(v) AS s FROM repl_v;")
    assert any("6" in x for x in out)


def test_pagination_n_and_p(spark):
    repl, out = _repl(spark)
    repl.feed("SELECT id FROM range(250) ORDER BY id;")
    assert any(f"rows 0-{PAGE_SIZE} of 250" in x for x in out)
    repl.feed("n")
    assert any("rows 100-200 of 250" in x for x in out)
    repl.feed("n")
    assert any("rows 200-250 of 250" in x for x in out)
    repl.feed("p")
    assert sum("rows 100-200 of 250" in x for x in out) == 2


def test_meta_commands(spark):
    repl, out = _repl(spark)
    repl.feed("CREATE OR REPLACE TEMPORARY VIEW repl_meta_v AS SELECT 1 AS x;")
    repl.feed("\\d")
    assert any("repl_meta_v" in x for x in out)
    assert repl.feed("\\nope")  # unknown meta stays alive
    assert not repl.feed("\\q")


def test_errors_do_not_kill_the_session(spark):
    repl, out = _repl(spark)
    assert repl.feed("SELECT definitely_not_a_column FROM range(1);")
    assert any(x.startswith("error:") for x in out)
    assert repl.feed("SELECT 2 AS two;")
    assert any("two" in x for x in out)


def test_history_and_rerun(spark):
    """History tab engine contract (src/tui/state/tabs/history.rs:39-70):
    every executed statement records sql + elapsed + rows (or the
    error), and entries re-run by number."""
    out = []
    r = Repl(spark, echo=out.append)
    r.feed("SELECT 1 AS a;")
    r.feed("SELECT bogus_fn();")  # error entry
    out.clear()
    r.feed("\\history")
    listing = "\n".join(out)
    assert "[1]" in listing and "1 row(s)" in listing and "SELECT 1 AS a" in listing
    assert "[2]" in listing and "ERROR" in listing
    out.clear()
    r.feed("\\rerun 1")
    assert any("| 1" in line or "a" in line for line in out)
    out.clear()
    r.feed("\\history")
    assert "[3]" in "\n".join(out)  # the rerun itself is recorded
    out.clear()
    r.feed("\\rerun 99")
    assert "no history entry" in out[0]
    r.feed("\\rerun nope")
    assert "usage" in out[-1]


def test_ddl_show_and_run(spark, tmp_path):
    """DDL pane engine behaviors: \\ddl shows the configured file,
    \\ddl run executes it, and statements are visible afterwards."""
    ddl = tmp_path / "ddl.sql"
    ddl.write_text("CREATE OR REPLACE TEMP VIEW repl_ddl_v AS SELECT 7 AS seven;")
    out = []
    r = Repl(spark, echo=out.append, ddl_path=str(ddl))
    r.feed("\\ddl")
    assert "repl_ddl_v" in "\n".join(out)
    out.clear()
    r.feed("\\ddl run")
    assert "ran 1 DDL statement(s)" in out[0]
    out.clear()
    r.feed("SELECT seven FROM repl_ddl_v;")
    assert any("7" in line for line in out)
    # unconfigured path fails soft
    out2 = []
    r2 = Repl(spark, echo=out2.append)
    r2.feed("\\ddl run")
    assert "no DDL file configured" in out2[0]


def test_flightsql_mode_executes_and_paginates(spark):
    """FlightSQL tab engine contract (tui_cases/flightsql_execution.rs,
    flightsql_pagination.rs): \\flightsql URL routes statements to the
    server with the same pagination; contexts stay separate and history
    tags entries Local vs FlightSQL (history.rs:21-37)."""
    from datafusion_dft_spark.server.flight import DftFlightServer

    server = DftFlightServer(spark, "grpc://127.0.0.1:0")
    try:
        out = []
        r = Repl(spark, echo=out.append)
        r.feed("CREATE OR REPLACE TEMP VIEW fs_repl_v AS SELECT id FROM range(250);")
        out.clear()
        r.feed(f"\\flightsql grpc://127.0.0.1:{server.port}")
        assert "flightsql on" in out[0]
        out.clear()
        # executes on the server (shared spark session ⇒ view visible)
        r.feed("SELECT id FROM fs_repl_v ORDER BY id;")
        assert any("250 rows" in line or "rows 0-100 of 250" in line for line in out)
        # identical pagination math over flight-returned batches
        out.clear()
        r.feed("n")
        assert any("rows 100-200 of 250" in line for line in out)
        out.clear()
        r.feed("\\flightsql off")
        assert "flightsql off" in out[0]
        out.clear()
        r.feed("SELECT 5 AS five;")
        r.feed("\\history")
        listing = "\n".join(out)
        assert "FlightSQL" in listing and "Local" in listing
    finally:
        server.shutdown()
