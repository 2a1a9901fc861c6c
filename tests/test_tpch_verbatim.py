"""The reference's EMBEDDED TPC-H texts run verbatim, hash-checked vs DuckDB.

The reference ships Q1-Q22 as string constants (src/server/http/tpch.rs)
written against its three-level ``dft.tpch.*`` namespace and executes
them over a ``generate-tpch`` database. This test reproduces that whole
loop end-to-end with ZERO edits to the query text:

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

The four partsupp-centric queries (Q2/Q11/Q16/Q20) are the point: they
exercise the spec domains (Brand#MN, %BRASS types, forest% colors,
GERMANY/CANADA nations, Customer...Complaints markers) and the
(ps_partkey, ps_suppkey) primary key the generator must honor.
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
    text = m.group(1).strip()
    assert text, f"QUERY_{n} is empty in the reference"
    return text


@pytest.fixture(scope="module")
def tpch_db(spark, tmp_path_factory):
    """sf0.01 directory database in the reference layout + DuckDB twin."""
    from datafusion_dft_spark.catalog import register_db
    from datafusion_dft_spark.tools.tpch_gen import generate

    root = str(tmp_path_factory.mktemp("tpchdb") / "db")
    generate(spark, root, scale_factor=0.01, layout="db")
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
    yield spark, con
    con.close()


def _canon(v):
    import datetime as dt

    if isinstance(v, float):
        return "NaN" if math.isnan(v) else v
    if isinstance(v, dt.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, dt.date):
        return v.isoformat()
    try:
        import decimal

        if isinstance(v, decimal.Decimal):
            return float(v)
    except ImportError:  # pragma: no cover
        pass
    return v


def _eq(a, b) -> bool:
    if isinstance(a, float) and isinstance(b, float):
        return math.isclose(a, b, rel_tol=1e-6, abs_tol=1e-9)
    return a == b


def _compare(spark_df, duck_rel):
    scols = list(spark_df.columns)
    dcols = [d[0] for d in duck_rel.description]
    assert sorted(c.lower() for c in scols) == sorted(c.lower() for c in dcols)
    sorder = sorted(range(len(scols)), key=lambda i: scols[i].lower())
    dorder = sorted(range(len(dcols)), key=lambda i: dcols[i].lower())
    srows = [
        tuple(_canon(r[i]) for i in sorder) for r in spark_df.collect()
    ]
    drows = [tuple(_canon(r[i]) for i in dorder) for r in duck_rel.fetchall()]
    assert len(srows) == len(drows), f"rows: spark={len(srows)} duck={len(drows)}"
    key = lambda row: tuple("\x00" if c is None else str(c) for c in row)
    srows.sort(key=key)
    drows.sort(key=key)
    for sr, dr in zip(srows, drows):
        assert len(sr) == len(dr) and all(
            _eq(a, b) for a, b in zip(sr, dr)
        ), f"value mismatch: {sr} vs {dr}"
    return len(srows)


@pytest.mark.parametrize("qnum", [2, 11, 16, 20])
def test_partsupp_queries_verbatim(tpch_db, qnum):
    spark, con = tpch_db
    text = _ref_query(qnum)
    assert "dft.tpch.partsupp" in text  # these four are the partsupp suite
    dfs = execute_sql(spark, text)
    n = _compare(dfs[-1], con.sql(split_statements(text)[-1]))
    # non-vacuous: the spec domains must select real rows at sf0.01
    assert n > 0, f"Q{qnum} returned no rows — generator domains too narrow"


@pytest.mark.parametrize("qnum", [1, 5, 6])
def test_core_queries_verbatim(tpch_db, qnum):
    """Spot-check non-partsupp texts through the same verbatim loop.

    Q1/Q5/Q6 are the reference texts whose column footprint the
    generator's driver-superset schema fully covers (Q3/Q10 et al.
    touch o_shippriority / c_address, which the driver corpus lacks).
    """
    spark, con = tpch_db
    text = _ref_query(qnum)
    dfs = execute_sql(spark, text)
    n = _compare(dfs[-1], con.sql(split_statements(text)[-1]))
    assert n > 0
