"""Property-based differential fuzzing: random SQL vs the DuckDB oracle.

Generates small random-but-valid SQL (filters, group-bys, aggregates,
sorts with deterministic tiebreaks) over ``lineitem``/``orders`` and
requires Spark and DuckDB to agree exactly. This is the layer the
reference outsources to DataFusion's upstream suite (SURVEY §5 "not
present: property-based testing") — here it guards our own engine
assembly (session conf, timezone pinning, rewrite layer).

Floats: aggregate sums are rounded in-query (same convention as the
registry); comparisons allow 1e-9 relative slack on top.
"""

from __future__ import annotations

import math

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

NUMERIC_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
GROUP_COLS = ["l_returnflag", "l_linestatus", "l_suppkey % 10"]
ORDER_COLS = ["o_orderstatus", "o_orderpriority"]


@st.composite
def lineitem_query(draw):
    group = draw(st.sampled_from(GROUP_COLS))
    metric = draw(st.sampled_from(NUMERIC_COLS))
    agg = draw(st.sampled_from(["sum", "min", "max", "count", "avg"]))
    lo = draw(st.integers(min_value=1, max_value=40))
    hi = lo + draw(st.integers(min_value=1, max_value=15))
    date_lo = draw(st.integers(min_value=1995, max_value=2000))
    cmp_op = draw(st.sampled_from(["<", ">=", "<="]))
    if agg == "count":
        sel = "count(*) AS m"
    elif agg in ("sum",):
        sel = f"round(sum({metric}), 2) AS m"
    elif agg == "avg":
        sel = f"round(avg({metric}) + 1e-9, 4) AS m"
    else:
        sel = f"{agg}({metric}) AS m"
    return (
        f"SELECT {group} AS g, {sel} FROM lineitem "
        f"WHERE l_quantity BETWEEN {lo} AND {hi} "
        f"AND l_shipdate {cmp_op} TIMESTAMP '{date_lo}-06-15' "
        f"GROUP BY {group}"
    )


@st.composite
def orders_query(draw):
    col = draw(st.sampled_from(ORDER_COLS))
    frac = draw(st.integers(min_value=1, max_value=9))
    how = draw(st.sampled_from(["IN", "NOT IN"]))
    statuses = draw(
        st.lists(st.sampled_from(["'O'", "'F'", "'P'"]), min_size=1, max_size=2, unique=True)
    )
    return (
        f"SELECT {col} AS g, count(*) AS m, round(sum(o_totalprice), 2) AS s "
        f"FROM orders WHERE o_orderstatus {how} ({', '.join(statuses)}) "
        f"AND o_totalprice < {frac * 50000} GROUP BY {col}"
    )


@st.composite
def join_query(draw):
    how = draw(st.sampled_from(["JOIN", "LEFT JOIN"]))
    seg = draw(st.sampled_from(["BUILDING", "MACHINERY", "AUTOMOBILE"]))
    status = draw(st.sampled_from(["'O'", "'F'", "('O','F')"]))
    op = "IN" if status.startswith("(") else "="
    agg = draw(st.sampled_from(["count(o_orderkey)", "count(*)"]))
    return (
        f"SELECT c_nationkey AS g, {agg} AS m "
        f"FROM customer {how} orders ON c_custkey = o_custkey "
        f"AND o_orderstatus {op} {status} "
        f"WHERE c_mktsegment = '{seg}' GROUP BY c_nationkey"
    )


@st.composite
def window_query(draw):
    fn = draw(st.sampled_from(["row_number()", "rank()", "dense_rank()"]))
    k = draw(st.integers(min_value=1, max_value=4))
    direction = draw(st.sampled_from(["ASC", "DESC"]))
    return (
        f"SELECT g, cust, rn FROM ("
        f"  SELECT c_nationkey AS g, c_custkey AS cust, "
        f"         {fn} OVER (PARTITION BY c_nationkey "
        f"                    ORDER BY round(c_acctbal) {direction}, c_custkey) AS rn "
        f"  FROM customer) r WHERE rn <= {k}"
    )


@st.composite
def string_fn_query(draw):
    """§2.8 scalar string functions with cross-engine-identical semantics."""
    col = draw(st.sampled_from(["p_name", "p_brand", "p_type"]))
    fn = draw(
        st.sampled_from(
            [
                "upper({c})",
                "lower({c})",
                "length({c})",
                "substr({c}, 1, 3)",
                "substr({c}, 3)",
                "trim({c})",
                "replace({c}, 'a', '_')",
                "concat({c}, '-', p_brand)",
                "reverse({c})",
                "lpad({c}, 12, 'x')",
            ]
        )
    ).format(c=col)
    pred_frac = draw(st.integers(min_value=1, max_value=9))
    return (
        f"SELECT {fn} AS g, count(*) AS m, min(p_partkey) AS mn "
        f"FROM part WHERE p_size <= {pred_frac * 5} "
        f"GROUP BY {fn}"
    )


@st.composite
def conditional_date_query(draw):
    """CASE / coalesce / nullif + EXTRACT over lineitem dates."""
    part = draw(st.sampled_from(["year", "month", "day"]))
    thresh = draw(st.integers(min_value=10, max_value=45))
    branch = draw(
        st.sampled_from(
            [
                "CASE WHEN l_quantity > {t} THEN 'big' ELSE 'small' END",
                "CASE WHEN l_discount > 0.05 THEN 'hi' WHEN l_discount > 0.02 THEN 'mid' ELSE 'lo' END",
                "coalesce(nullif(l_returnflag, 'N'), 'none')",
                "CASE WHEN l_tax = 0.0 THEN NULL ELSE l_returnflag END",
            ]
        )
    ).format(t=thresh)
    return (
        f"SELECT extract({part} FROM l_shipdate) AS p, {branch} AS g, "
        f"count(*) AS m, round(sum(l_extendedprice), 2) AS s "
        f"FROM lineitem WHERE l_quantity <= {thresh} "
        f"GROUP BY extract({part} FROM l_shipdate), {branch}"
    )


def _rows(res) -> list[tuple]:
    out = []
    for r in res:
        row = []
        for v in r:
            if isinstance(v, float):
                row.append(round(v, 6))
            else:
                row.append(v)
        out.append(tuple(row))
    return sorted(out, key=lambda t: tuple(str(x) for x in t))


def _compare(spark, duckcon, sql: str) -> None:
    s_rows = _rows([tuple(r) for r in spark.sql(sql).collect()])
    o_rows = _rows([tuple(r) for r in duckcon.sql(sql).fetchall()])
    assert len(s_rows) == len(o_rows), f"row count differs for:\n{sql}\n{s_rows}\n{o_rows}"
    for a, b in zip(s_rows, o_rows):
        for x, y in zip(a, b):
            if isinstance(x, float) and isinstance(y, float):
                assert math.isclose(x, y, rel_tol=1e-9, abs_tol=1e-6), (sql, a, b)
            else:
                assert x == y, (sql, a, b)


@settings(max_examples=25, deadline=None, suppress_health_check=list(HealthCheck))
@given(sql=lineitem_query())
def test_fuzz_lineitem_aggregates(spark, duckcon, views, sql):
    _compare(spark, duckcon, sql)


@settings(max_examples=25, deadline=None, suppress_health_check=list(HealthCheck))
@given(sql=orders_query())
def test_fuzz_orders_predicates(spark, duckcon, views, sql):
    _compare(spark, duckcon, sql)


@settings(max_examples=25, deadline=None, suppress_health_check=list(HealthCheck))
@given(sql=string_fn_query())
def test_fuzz_string_functions(spark, duckcon, views, sql):
    _compare(spark, duckcon, sql)


@settings(max_examples=25, deadline=None, suppress_health_check=list(HealthCheck))
@given(sql=conditional_date_query())
def test_fuzz_conditionals_and_extract(spark, duckcon, views, sql):
    _compare(spark, duckcon, sql)


@st.composite
def setop_query(draw):
    op = draw(st.sampled_from(["UNION", "UNION ALL", "INTERSECT", "EXCEPT"]))
    lo = draw(st.integers(min_value=0, max_value=12))
    hi = draw(st.integers(min_value=13, max_value=24))
    return (
        f"SELECT g, count(*) AS m FROM ("
        f"  SELECT c_nationkey AS g FROM customer WHERE c_nationkey <= {hi} "
        f"  {op} "
        f"  SELECT s_nationkey FROM supplier WHERE s_nationkey >= {lo}"
        f") u GROUP BY g"
    )


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(sql=setop_query())
def test_fuzz_setops(spark, duckcon, views, sql):
    _compare(spark, duckcon, sql)


@settings(max_examples=20, deadline=None, suppress_health_check=list(HealthCheck))
@given(sql=join_query())
def test_fuzz_joins(spark, duckcon, views, sql):
    _compare(spark, duckcon, sql)


@settings(max_examples=20, deadline=None, suppress_health_check=list(HealthCheck))
@given(sql=window_query())
def test_fuzz_windows(spark, duckcon, views, sql):
    _compare(spark, duckcon, sql)


@pytest.fixture(scope="module")
def views(spark, sf_dir):
    from datafusion_dft_spark.catalog import register_views

    register_views(spark, sf_dir)
    return True


@st.composite
def numeric_fn_query(draw):
    """§2.8 math functions with exact cross-engine integer/decimal semantics."""
    expr = draw(
        st.sampled_from(
            [
                "abs(l_suppkey - 50)",
                "ceil(l_quantity / 7.0)",
                "floor(l_extendedprice / 1000.0)",
                "mod(l_suppkey, {k})",
                "sign(l_discount - 0.05)",
                "greatest(l_suppkey % 13, l_partkey % 7)",
                "least(l_linenumber, {k})",
                "round(l_tax * 100)",
            ]
        )
    ).format(k=draw(st.integers(min_value=2, max_value=9)))
    qty = draw(st.integers(min_value=5, max_value=45))
    return (
        f"SELECT CAST({expr} AS BIGINT) AS g, count(*) AS m, "
        f"min(l_orderkey) AS mn FROM lineitem "
        f"WHERE l_quantity <= {qty} GROUP BY CAST({expr} AS BIGINT)"
    )


@settings(max_examples=25, deadline=None, suppress_health_check=list(HealthCheck))
@given(sql=numeric_fn_query())
def test_fuzz_numeric_functions(spark, duckcon, views, sql):
    _compare(spark, duckcon, sql)


@st.composite
def date_fn_query(draw):
    """§2.8 date/time functions whose semantics match across engines.

    date_trunc (incl. ISO-Monday weeks), last_day, and quarter/week
    extraction; dow/doy are EXCLUDED (Spark counts Sunday=1, DuckDB
    Sunday=0 — a real dialect difference, not a bug)."""
    unit = draw(st.sampled_from(["year", "quarter", "month", "week", "day"]))
    expr = draw(
        st.sampled_from(
            [
                # CAST to DATE: Spark's date_trunc yields timestamp,
                # DuckDB's yields date — same instant, different type.
                "CAST(date_trunc('{u}', l_shipdate) AS DATE)",
                "last_day(l_shipdate)",
                "extract(quarter FROM l_shipdate)",
                "extract(week FROM l_shipdate)",
            ]
        )
    ).format(u=unit)
    qty = draw(st.integers(min_value=5, max_value=45))
    return (
        f"SELECT {expr} AS g, count(*) AS m, round(sum(l_discount), 4) AS s "
        f"FROM lineitem WHERE l_quantity <= {qty} GROUP BY {expr}"
    )


@settings(max_examples=25, deadline=None, suppress_health_check=list(HealthCheck))
@given(sql=date_fn_query())
def test_fuzz_date_functions(spark, duckcon, views, sql):
    _compare(spark, duckcon, sql)


@st.composite
def regexp_query(draw):
    """§2.8 regex functions over the RE2∩Java-portable pattern subset
    (the PII-module convention: no \\d classes, no lookaround — both
    engines compile these identically). regexp_extract group indices
    are explicit in every call: Spark defaults to group 1, DuckDB to
    group 0, so a bare two-arg call is a real dialect difference."""
    col = draw(st.sampled_from(["p_name", "p_type", "p_brand"]))
    pat, grp = draw(
        st.sampled_from(
            [
                ("([a-z]+)", 1),
                ("([A-Z]+)#?([0-9]+)", 2),
                ("^([A-Za-z]+)", 0),
                ("([aeiou][a-z])", 1),
                ("([0-9]+)$", 1),
            ]
        )
    )
    pred = draw(st.integers(min_value=1, max_value=9))
    return (
        f"SELECT regexp_extract({col}, '{pat}', {grp}) AS g, count(*) AS m, "
        f"min(p_partkey) AS mn FROM part WHERE p_size <= {pred * 5} "
        f"GROUP BY regexp_extract({col}, '{pat}', {grp})"
    )


@settings(max_examples=25, deadline=None, suppress_health_check=list(HealthCheck))
@given(sql=regexp_query())
def test_fuzz_regexp_functions(spark, duckcon, views, sql):
    _compare(spark, duckcon, sql)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    target=st.sampled_from(["[0-9]", "[A-Z]", "a", "[aeiou]"]),
    repl=st.sampled_from(["_", "", "<>"]),
)
def test_fuzz_regexp_replace_global(spark, duckcon, views, target, repl):
    """regexp_replace replaces ALL matches in Spark (and DataFusion,
    whose default flags are global) but only the FIRST in DuckDB — the
    oracle needs the explicit 'g' flag. Paired SQL, same semantics."""
    base = (
        "SELECT regexp_replace(p_name, '{p}', '{r}'{flag}) AS g, count(*) AS m "
        "FROM part WHERE p_size <= 20 GROUP BY 1"
    )
    s_rows = _rows(
        [tuple(r) for r in spark.sql(base.format(p=target, r=repl, flag="")).collect()]
    )
    o_rows = _rows(
        [tuple(r) for r in duckcon.sql(base.format(p=target, r=repl, flag=", 'g'")).fetchall()]
    )
    assert s_rows == o_rows


@st.composite
def array_fn_query(draw):
    """§2.8 array functions, written in DATAFUSION spellings and routed
    through prepare_statement so the compat rename layer is itself
    under differential test (DuckDB happens to accept the same names:
    array_to_string / array_contains / array_distinct)."""
    delim = draw(st.sampled_from([" ", "a", "e"]))
    probe = draw(st.sampled_from(["STEEL", "BRASS", "PLATED", "x"]))
    expr = draw(
        st.sampled_from(
            [
                "array_to_string(split(p_type, '{d}'), '|')",
                "array_contains(split(p_type, '{d}'), '{w}')",
                "array_contains(array_distinct(split(p_type, '{d}')), '{w}')",
            ]
        )
    ).format(d=delim, w=probe)
    pred = draw(st.integers(min_value=1, max_value=9))
    return (
        f"SELECT {expr} AS g, count(*) AS m, min(p_partkey) AS mn "
        f"FROM part WHERE p_size <= {pred * 5} GROUP BY {expr}"
    )


@settings(max_examples=25, deadline=None, suppress_health_check=list(HealthCheck))
@given(sql=array_fn_query())
def test_fuzz_array_functions_through_compat(spark, duckcon, views, sql):
    from datafusion_dft_spark.sql import execute_sql

    s_rows = _rows([tuple(r) for r in execute_sql(spark, sql)[-1].collect()])
    o_rows = _rows([tuple(r) for r in duckcon.sql(sql).fetchall()])
    assert s_rows == o_rows, f"compat-path mismatch for:\n{sql}"


@st.composite
def bitwise_cast_query(draw):
    """Bitwise &,| (identical precedence/semantics in both engines —
    ^ is EXCLUDED: xor in Spark, power in DuckDB) and try_cast null
    semantics on malformed input."""
    k = draw(st.integers(min_value=1, max_value=255))
    expr = draw(
        st.sampled_from(
            [
                "l_suppkey & {k}",
                "l_suppkey | {k}",
                "(l_partkey & 15) | (l_suppkey & {k})",
                "try_cast(concat('x', l_returnflag) AS BIGINT)",
                "coalesce(try_cast(l_returnflag AS BIGINT), l_linenumber)",
            ]
        )
    ).format(k=k)
    qty = draw(st.integers(min_value=5, max_value=45))
    return (
        f"SELECT CAST({expr} AS BIGINT) AS g, count(*) AS m "
        f"FROM lineitem WHERE l_quantity <= {qty} GROUP BY CAST({expr} AS BIGINT)"
    )


@settings(max_examples=25, deadline=None, suppress_health_check=list(HealthCheck))
@given(sql=bitwise_cast_query())
def test_fuzz_bitwise_and_try_cast(spark, duckcon, views, sql):
    _compare(spark, duckcon, sql)


@st.composite
def interval_arith_query(draw):
    """Date/timestamp ± INTERVAL arithmetic — the quoted-unit spelling
    (`INTERVAL 'n' DAY`) parses identically in Spark and DuckDB; epoch
    extraction of the shifted value exercises the compat epoch rewrite
    on Spark's side against DuckDB's native extract."""
    n = draw(st.integers(min_value=1, max_value=90))
    unit = draw(st.sampled_from(["DAY", "HOUR", "MINUTE"]))
    op = draw(st.sampled_from(["+", "-"]))
    qty = draw(st.integers(min_value=5, max_value=45))
    shifted = f"l_shipdate {op} INTERVAL '{n}' {unit}"
    expr = draw(
        st.sampled_from(
            [
                f"CAST(date_trunc('day', {shifted}) AS DATE)",
                f"extract(year FROM {shifted})",
                f"extract(epoch FROM date_trunc('hour', {shifted}))",
            ]
        )
    )
    return (
        f"SELECT {expr} AS g, count(*) AS m FROM lineitem "
        f"WHERE l_quantity <= {qty} GROUP BY {expr}"
    )


@settings(max_examples=25, deadline=None, suppress_health_check=list(HealthCheck))
@given(sql=interval_arith_query())
def test_fuzz_interval_arithmetic(spark, duckcon, views, sql):
    from datafusion_dft_spark.sql import execute_sql

    s_rows = _rows([tuple(r) for r in execute_sql(spark, sql)[-1].collect()])
    o_rows = _rows([tuple(r) for r in duckcon.sql(sql).fetchall()])
    assert len(s_rows) == len(o_rows), f"row count differs for:\n{sql}"
    for a, b in zip(s_rows, o_rows):
        for x, y in zip(a, b):
            if isinstance(x, float) and isinstance(y, float):
                assert math.isclose(x, y, rel_tol=1e-9, abs_tol=1e-6), (sql, a, b)
            else:
                assert x == y, (sql, a, b)
