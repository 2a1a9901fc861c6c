"""The reference's EMBEDDED TPC-H texts run verbatim, hash-checked vs DuckDB.

The reference ships Q1-Q22 as string constants (src/server/http/tpch.rs)
written against its three-level ``dft.tpch.*`` namespace and executes
them over a ``generate-tpch`` database. This test reproduces that whole
loop end-to-end with ZERO edits to the query text, for EVERY constant
Q1-Q22:

1. generate an sf0.01 database in the reference's directory layout
   (``{db}/tables/dft/tpch/{table}/``) with our Spark-native generator,
2. ``register_db`` it (which records the (dft, tpch) catalog pair),
3. read the query constants straight OUT OF the reference source file
   at test time (byte-verbatim — nothing transcribed by hand),
4. run them through ``execute_sql`` (prepare_statement dialect shim,
   which strips the registered ``dft.`` catalog prefix),
5. run the SAME verbatim text in DuckDB against an attached in-memory
   database literally named ``dft`` with schema ``tpch`` over the same
   parquet files, and compare row count + sorted column names +
   order-insensitive values (floats at rel 1e-6).

Q15 exercises the multi-statement path (CREATE VIEW with a column
alias list → SELECT → DROP VIEW) with the session's current schema set
to the tpch database on both engines, mirroring the reference session
whose default namespace is dft.tpch.

The partsupp-centric queries (Q2/Q11/Q16/Q20) exercise the spec
domains (Brand#MN, %BRASS types, forest% colors, GERMANY/CANADA
nations, Customer...Complaints markers) and the (ps_partkey,
ps_suppkey) primary key; Q4/Q12-shape/Q21 need the commit/receipt date
relationships; Q13/Q22 need the comment/phone domains.
"""

from __future__ import annotations

import math
import re
from pathlib import Path

import duckdb
import pytest

from datafusion_dft_spark.sql import execute_sql, split_statements

REF_TPCH = Path("/root/reference/src/server/http/tpch.rs")

pytestmark = pytest.mark.skipif(
    not REF_TPCH.exists(), reason="reference source tree not present"
)


def _ref_query(n: int) -> str:
    src = REF_TPCH.read_text()
    m = re.search(
        rf'pub const QUERY_{n}: &str = r#"(.*?)"#;', src, flags=re.DOTALL
    )
    assert m, f"QUERY_{n} not found in reference source"
    return m.group(1).strip()


@pytest.fixture(scope="module")
def tpch_db(spark, tmp_path_factory):
    """sf0.01 directory database in the reference layout + DuckDB twin.

    Current schema is set to the tpch database on BOTH engines for the
    fixture's lifetime (the reference session's default namespace is
    dft.tpch — Q15 creates/drops its revenue0 view unqualified there).
    """
    from datafusion_dft_spark.catalog import register_db
    from datafusion_dft_spark.tools.tpch_gen import generate

    root = str(tmp_path_factory.mktemp("tpchdb") / "db")
    # money="decimal": the spec's DECIMAL(12,2) — required for Q15,
    # whose `total_revenue = (select max(total_revenue) ...)` demands
    # the view's SUM agree exactly across two recomputations inside one
    # query; double sums drift at the ULP with Spark's shuffle-merge
    # order (an order-dependent test flake), decimal sums are exact.
    generate(spark, root, scale_factor=0.01, layout="db", money="decimal")
    names = register_db(spark, f"{root}/tables")
    assert any("lineitem" in n for n in names)

    con = duckdb.connect()
    con.sql("ATTACH ':memory:' AS dft")
    con.sql("CREATE SCHEMA dft.tpch")
    for tdir in sorted(Path(f"{root}/tables/dft/tpch").iterdir()):
        con.sql(
            f"CREATE VIEW dft.tpch.{tdir.name} AS "
            f"SELECT * FROM parquet_scan('{tdir}/*.parquet')"
        )
    con.sql("USE dft.tpch")
    prev_db = spark.catalog.currentDatabase()
    spark.catalog.setCurrentDatabase("tpch")
    yield spark, con
    spark.catalog.setCurrentDatabase(prev_db)
    con.close()


def _canon(v):
    import datetime as dt
    import decimal

    if isinstance(v, float):
        return "NaN" if math.isnan(v) else v
    if isinstance(v, dt.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, decimal.Decimal):
        return float(v)
    return v


def _eq(a, b) -> bool:
    if isinstance(a, float) and isinstance(b, float):
        # abs_tol=1e-6 floors the check for sub-1 magnitudes: Spark's
        # avg(DECIMAL(12,2)) quantizes to scale 6 while DuckDB promotes
        # to double, so e.g. avg_disc ~0.0494810 carries up to 5e-7 of
        # pure representation rounding (relative ~1e-5).
        return math.isclose(a, b, rel_tol=1e-6, abs_tol=1e-6)
    return a == b


def _is_result_stmt(stmt: str) -> bool:
    return re.match(r"(?is)^\s*(select|with|values)\b", stmt) is not None


def _run_duck(con, text: str):
    """Execute every statement in order; return (cols, rows) of the last
    SELECT-shaped one (Q15's payload is the middle SELECT — DuckDB DDL
    statements emit a 'Success' pseudo-result that must not win)."""
    cols = rows = None
    for stmt in split_statements(text):
        cur = con.execute(stmt)
        if _is_result_stmt(stmt) and cur.description:
            cols = [d[0] for d in cur.description]
            rows = cur.fetchall()
    return cols, rows


def _run_spark(spark, text: str):
    stmts = split_statements(text)
    dfs = execute_sql(spark, text)
    best = None
    for stmt, df in zip(stmts, dfs):
        if _is_result_stmt(stmt) and df.columns:
            best = df
    return best


def _compare(spark_df, dcols, drows):
    scols = list(spark_df.columns)
    assert sorted(c.lower() for c in scols) == sorted(c.lower() for c in dcols), (
        scols, dcols,
    )
    sorder = sorted(range(len(scols)), key=lambda i: scols[i].lower())
    dorder = sorted(range(len(dcols)), key=lambda i: dcols[i].lower())
    srows = [tuple(_canon(r[i]) for i in sorder) for r in spark_df.collect()]
    drows = [tuple(_canon(r[i]) for i in dorder) for r in drows]
    assert len(srows) == len(drows), f"rows: spark={len(srows)} duck={len(drows)}"
    key = lambda row: tuple("\x00" if c is None else str(c) for c in row)
    srows.sort(key=key)
    drows.sort(key=key)
    for sr, dr in zip(srows, drows):
        assert len(sr) == len(dr) and all(
            _eq(a, b) for a, b in zip(sr, dr)
        ), f"value mismatch: {sr} vs {dr}"
    return len(srows)


@pytest.mark.parametrize("qnum", list(range(1, 23)))
def test_reference_tpch_text_verbatim(tpch_db, qnum):
    """Every embedded text Q1-Q22, byte-verbatim, hash-compared, and
    non-vacuous (a generator-domain regression that empties one fails
    loudly)."""
    spark, con = tpch_db
    text = _ref_query(qnum)
    assert text, f"QUERY_{qnum} unexpectedly empty in the reference"
    sdf = _run_spark(spark, text)
    dcols, drows = _run_duck(con, text)
    n = _compare(sdf, dcols, drows)
    assert n > 0, f"Q{qnum} returned no rows — generator domains too narrow"
