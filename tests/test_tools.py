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
    assert len(names) == 11  # 8 relational (incl. partsupp) + events/documents/embeddings
    # registered under schema 'tpch' (catalog dir 'dft'); query one
    tname = [n for n in names if "lineitem" in n][0]
    n = spark.sql(f"SELECT count(*) AS n FROM {tname}").collect()[0].n
    assert n >= 100


def test_decimal_money_mode(spark):
    """money='decimal' stores the spec DECIMAL(12,2) for every money /
    rate / quantity column (and the same VALUES as double mode) — the
    type the verbatim Q15 differential depends on for deterministic
    sums; default double mode stays byte-identical to the driver
    corpus shape."""
    from decimal import Decimal

    from datafusion_dft_spark.tools.tpch_gen import gen_tables

    dec = gen_tables(spark, 0.0001, money="decimal")
    dbl = gen_tables(spark, 0.0001)
    li_dec, li_dbl = dec["lineitem"], dbl["lineitem"]
    for col in ("l_quantity", "l_extendedprice", "l_discount", "l_tax"):
        assert li_dec.schema[col].dataType.simpleString() == "decimal(12,2)"
        assert li_dbl.schema[col].dataType.simpleString() == "double"
    for tbl, col in (("supplier", "s_acctbal"), ("orders", "o_totalprice"),
                     ("partsupp", "ps_supplycost"), ("part", "p_retailprice")):
        assert dec[tbl].schema[col].dataType.simpleString() == "decimal(12,2)"
    a = sorted(r.l_extendedprice for r in li_dec.select("l_extendedprice").collect())
    b = sorted(r.l_extendedprice for r in li_dbl.select("l_extendedprice").collect())
    assert len(a) == len(b)
    for va, vb in zip(a, b):
        assert va == Decimal(str(vb))
    import pytest as _pytest

    with _pytest.raises(ValueError, match="money"):
        gen_tables(spark, 0.0001, money="float16")


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


def test_partsupp_primary_key_unique(spark):
    """(ps_partkey, ps_suppkey) is a primary key (spec 4.2.3) — the
    dbgen supplier-spread stride must give each part 4 DISTINCT
    suppliers even at toy scale floors where the spec stride can land
    on a residue with d*stride ≡ 0 (mod S)."""
    from pyspark.sql import functions as F

    for sf in (0.0001, 0.001, 0.01):
        ps = gen_tables(spark, sf)["partsupp"]
        dup = (
            ps.groupBy("ps_partkey", "ps_suppkey")
            .count()
            .filter(F.col("count") > 1)
            .count()
        )
        assert dup == 0, f"sf={sf}: {dup} duplicate (partkey, suppkey) pairs"
        per_part = ps.groupBy("ps_partkey").agg(
            F.count("*").alias("n"), F.countDistinct("ps_suppkey").alias("d")
        )
        bad = per_part.filter((F.col("n") != 4) | (F.col("d") != 4)).count()
        assert bad == 0, f"sf={sf}: parts without 4 distinct suppliers"


def test_part_brand_tied_to_manufacturer(spark):
    """Spec 4.2.2: Brand#MN where M is the part's Manufacturer#M digit."""
    from pyspark.sql import functions as F

    part = gen_tables(spark, 0.001)["part"]
    mismatch = part.filter(
        F.substring("p_brand", 7, 1) != F.substring("p_mfgr", 14, 1)
    ).count()
    assert mismatch == 0
    brands = {r[0] for r in part.select("p_brand").distinct().collect()}
    assert brands <= {f"Brand#{m}{n}" for m in range(1, 6) for n in range(1, 6)}


def test_nation_region_spec_mapping(spark):
    """The 25 nations carry the official spec region assignment."""
    nation = gen_tables(spark, 0.001)["nation"]
    got = {(r.n_name, r.n_regionkey) for r in nation.collect()}
    assert ("GERMANY", 3) in got and ("CANADA", 1) in got and ("CHINA", 2) in got
    assert len(got) == 25
    region = gen_tables(spark, 0.001)["region"]
    assert {(r.r_regionkey, r.r_name) for r in region.collect()} == {
        (0, "AFRICA"), (1, "AMERICA"), (2, "ASIA"), (3, "EUROPE"), (4, "MIDDLE EAST")
    }


def test_supplier_spread_follows_spec_at_scale(spark):
    """At spec-ratio sizes the stride fallback must never trigger: the
    emitted suppkeys equal the official dbgen formula exactly."""
    ps = gen_tables(spark, 0.01)["partsupp"].collect()
    n_supp = 100
    for r in ps[:400]:
        p0 = r.ps_partkey - 1
        expect = {
            (p0 + i * (n_supp // 4 + p0 // n_supp)) % n_supp + 1 for i in range(4)
        }
        assert r.ps_suppkey in expect, (r.ps_partkey, r.ps_suppkey)


def test_classify_band_rules():
    """bench.classify_band codifies the BASELINE.md governance rule
    (r11 verdict task #5): contended = pre/post disagree >1.3x;
    in-band = both inside the pinned quiet band (cross-round absolutes
    valid); shifted-band = stable but off the quiet band (the r11
    host-infrastructure shift — same-session ratios only)."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
    from bench import QUIET_BAND, classify_band

    lo, hi = QUIET_BAND
    assert classify_band(lo, hi)["band"] == "in-band"
    assert classify_band(hi * 1.29, hi * 1.2)["band"] == "in-band"
    # stable-but-shifted (the whole r11 session): ~2x the band
    assert classify_band(hi * 2.0, hi * 2.2)["band"] == "shifted-band"
    # faster-than-pinned is also a shift, not license to re-record
    assert classify_band(lo * 0.5, lo * 0.5)["band"] == "shifted-band"
    # pre/post disagreement dominates every other classification
    assert classify_band(lo, lo * 3)["band"] == "contended"
    out = classify_band(lo, hi)
    assert out["band_quiet_ref"] == [lo, hi]
    assert out["band_pre_post_ratio"] >= 1.0


def test_should_replace_detail_stamp_guard():
    """bench.should_replace_detail (r12 verdict 'what's wrong' #2): a
    worse-stamped run must NOT clobber the committed best-stamped
    BENCH_DETAIL record; equal-or-better stamps replace (latest wins);
    --force and unstamped/unparseable records always replace."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
    from bench import should_replace_detail

    inb = {"band": "in-band"}
    shf = {"band": "shifted-band"}
    con = {"band": "contended"}
    # strictly-better committed record: refuse
    assert not should_replace_detail(inb, shf)
    assert not should_replace_detail(inb, con)
    assert not should_replace_detail(shf, con)
    # equal or better incoming: replace (latest wins tracks the code)
    assert should_replace_detail(inb, inb)
    assert should_replace_detail(shf, shf)
    assert should_replace_detail(shf, inb)
    assert should_replace_detail(con, inb)
    assert should_replace_detail(con, shf)
    # force overrides the refusal
    assert should_replace_detail(inb, con, force=True)
    # missing / unstamped / unparseable existing record: replace
    assert should_replace_detail(None, con)
    assert should_replace_detail({}, con)
    assert should_replace_detail({"band": "???"}, con)
    # an UNSTAMPED incoming record never displaces a stamped one
    assert not should_replace_detail(inb, {})
    # cross-sf runs never replace regardless of stamps (r14: an ad-hoc
    # sf1 rehearsal must not clobber the driver's sf0.1 record), but
    # force still overrides and a missing sf on either side is benign
    sf01_shf = {"band": "shifted-band", "sf": 0.1}
    sf1_inb = {"band": "in-band", "sf": 1.0}
    assert not should_replace_detail(sf01_shf, sf1_inb)
    assert not should_replace_detail(sf1_inb, sf01_shf)
    assert should_replace_detail(sf01_shf, sf1_inb, force=True)
    assert should_replace_detail(sf01_shf, {"band": "in-band"})
    assert should_replace_detail(
        sf01_shf, {"band": "shifted-band", "sf": 0.1}
    )


def test_sweep_artifact_shape_guard(tmp_path):
    """tools/sweep_sf1.load_artifact (r13 ADVICE): a parseable file
    missing the merge keys falls back to the default shape instead of
    KeyError-ing away the just-measured chunk; a well-formed file loads
    as-is; a missing/corrupt file yields the default."""
    import importlib.util
    import json
    import sys
    from pathlib import Path

    tools_dir = Path(__file__).resolve().parents[1] / "tools"
    sys.path.insert(0, str(tools_dir))  # sweep imports its sibling verify_driver
    try:
        spec = importlib.util.spec_from_file_location(
            "sweep_sf1", tools_dir / "sweep_sf1.py"
        )
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
    finally:
        sys.path.remove(str(tools_dir))

    fresh = mod.load_artifact(str(tmp_path / "absent.json"))
    assert fresh == {"queries": {}, "sessions": []}

    bad = tmp_path / "bad.json"
    bad.write_text(json.dumps({"queries": {"q": {}}}))  # no 'sessions'
    assert mod.load_artifact(str(bad)) == {"queries": {}, "sessions": []}
    bad.write_text("[1, 2]")  # not a dict
    assert mod.load_artifact(str(bad)) == {"queries": {}, "sessions": []}
    bad.write_text("{corrupt")
    assert mod.load_artifact(str(bad)) == {"queries": {}, "sessions": []}

    good = tmp_path / "good.json"
    payload = {"sf_dir": "/tmp/sf1", "queries": {"q": {"err": None}}, "sessions": [{}]}
    good.write_text(json.dumps(payload))
    assert mod.load_artifact(str(good)) == payload


def test_proxy_detail_protocol_guard(tmp_path):
    """tools/proxy_compare.load_detail (r13 ADVICE): rows measured
    under a different sf_dir or runs count refuse to merge (raise
    ProtocolMismatch) instead of silently mixing protocols under one
    PROXY.md header; malformed files reset to fresh state."""
    import importlib.util
    import json
    import pytest
    from pathlib import Path

    spec = importlib.util.spec_from_file_location(
        "proxy_compare",
        Path(__file__).resolve().parents[1] / "tools" / "proxy_compare.py",
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    fresh = mod.load_detail(str(tmp_path / "absent.json"), "/d", 4)
    assert fresh == {"sf_dir": "/d", "runs": 4, "rows": {}, "sessions": []}

    p = tmp_path / "detail.json"
    committed = {"sf_dir": "/d", "runs": 4, "rows": {"q": {}}, "sessions": [{}]}
    p.write_text(json.dumps(committed))
    assert mod.load_detail(str(p), "/d", 4) == committed
    with pytest.raises(mod.ProtocolMismatch):
        mod.load_detail(str(p), "/other", 4)
    with pytest.raises(mod.ProtocolMismatch):
        mod.load_detail(str(p), "/d", 8)

    p.write_text(json.dumps({"sf_dir": "/d", "runs": 4}))  # missing keys
    assert mod.load_detail(str(p), "/d", 4)["rows"] == {}
    p.write_text("{corrupt")
    assert mod.load_detail(str(p), "/d", 4)["rows"] == {}
