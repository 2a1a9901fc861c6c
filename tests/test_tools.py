"""Generator determinism + generated-data usability; concurrent bench."""

from __future__ import annotations

from datafusion_dft_spark.tools.tpch_gen import gen_tables, generate


def test_generator_deterministic(spark):
    a = gen_tables(spark, 0.0001)["lineitem"].orderBy("l_orderkey", "l_linenumber", "l_partkey")
    b = gen_tables(spark, 0.0001)["lineitem"].orderBy("l_orderkey", "l_linenumber", "l_partkey")
    assert [tuple(r) for r in a.collect()] == [tuple(r) for r in b.collect()]


def test_generated_db_layout_registers(spark, tmp_path):
    from datafusion_dft_spark.catalog import register_db

    generate(spark, str(tmp_path / "db"), scale_factor=0.0001, layout="db")
    names = register_db(spark, str(tmp_path / "db" / "tables"))
    assert len(names) == 10  # 7 relational + events/documents/embeddings
    # registered under schema 'tpch' (catalog dir 'dft'); query one
    tname = [n for n in names if "lineitem" in n][0]
    n = spark.sql(f"SELECT count(*) AS n FROM {tname}").collect()[0].n
    assert n >= 100


def test_generated_data_runs_q1_shape(spark, tmp_path):
    generate(spark, str(tmp_path / "flat"), scale_factor=0.0001, layout="flat")
    df = spark.read.parquet(str(tmp_path / "flat" / "lineitem.parquet"))
    out = df.groupBy("l_returnflag", "l_linestatus").count().collect()
    assert 4 <= len(out) <= 6
    assert {r.l_returnflag for r in out} == {"A", "N", "R"}


def test_concurrent_bench(spark, sf_dir):
    from datafusion_dft_spark.catalog import register_views
    from datafusion_dft_spark.plans.bench import run_bench_concurrent

    register_views(spark, sf_dir)
    res = run_bench_concurrent(spark, "SELECT count(*) FROM orders", iterations=4)
    assert res.rows_consistent and len(res.phase_times["total"]) == 4
    assert res.concurrency_mode.startswith("concurrent[")


def test_rehearsal_generator_schema_parity(spark, sf_dir, tmp_path):
    """The adversarial rehearsal generator (repo-root tools/tpch_gen.py)
    must emit the driver corpus's schemas exactly, or sf1 bench numbers
    measure a different workload than the driver's own fixtures."""
    import sys

    sys.path.insert(0, "tools")
    try:
        from tpch_gen import generate as gen_rehearsal
    finally:
        sys.path.pop(0)

    out = str(tmp_path / "mini")
    gen_rehearsal(0.001, out)
    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"):
        got = spark.read.parquet(f"{out}/{t}.parquet").schema
        want = spark.read.parquet(f"{sf_dir}/{t}.parquet").schema
        assert [(f.name, f.dataType.simpleString()) for f in got] == [
            (f.name, f.dataType.simpleString()) for f in want
        ], t
