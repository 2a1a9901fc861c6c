"""Deterministic sampling: differential vs DuckDB + stability properties."""

from __future__ import annotations

from pyspark.sql import functions as F

from datafusion_dft_spark.catalog import load_tables
from datafusion_dft_spark.operators import sampling as sp


def test_sample_matches_duckdb(spark, sf_dir, duckcon):
    docs = load_tables(spark, sf_dir)["documents"]
    got = {r.doc_id for r in sp.deterministic_sample(docs, "doc_id", 0.2).select("doc_id").collect()}
    want = {r[0] for r in duckcon.sql(
        "SELECT doc_id FROM (" + sp.sample_oracle_sql("doc_id", 0.2) + ")"
    ).fetchall()}
    assert got == want
    n = docs.count()
    assert 0.1 * n <= len(got) <= 0.3 * n  # roughly the asked fraction


def test_sample_stable_under_repartition(spark, sf_dir):
    """Membership is content-keyed: repartitioning must not change it
    (the property seed-based df.sample lacks)."""
    docs = load_tables(spark, sf_dir)["documents"]
    a = {r.doc_id for r in sp.deterministic_sample(docs, "doc_id", 0.15).select("doc_id").collect()}
    b = {
        r.doc_id
        for r in sp.deterministic_sample(docs.repartition(7), "doc_id", 0.15).select("doc_id").collect()
    }
    assert a == b


def test_sample_nested_subsets(spark, sf_dir):
    """p1 < p2 implies sample(p1) is a subset of sample(p2) — incremental
    growth of a training mix never flips prior membership."""
    docs = load_tables(spark, sf_dir)["documents"]
    small = {r.doc_id for r in sp.deterministic_sample(docs, "doc_id", 0.1).select("doc_id").collect()}
    big = {r.doc_id for r in sp.deterministic_sample(docs, "doc_id", 0.3).select("doc_id").collect()}
    assert small <= big


def test_stratified_fractions(spark, sf_dir):
    docs = load_tables(spark, sf_dir)["documents"]
    langs = [r.lang for r in docs.select("lang").distinct().collect()]
    keep, drop = langs[0], langs[1:]
    out = sp.stratified_sample(docs, "doc_id", "lang", {keep: 1.0})
    got_langs = {r.lang for r in out.select("lang").distinct().collect()}
    assert got_langs == {keep}  # absent strata drop
    assert out.count() == docs.filter(F.col("lang") == keep).count()  # fraction 1.0 keeps all

    half = sp.stratified_sample(docs, "doc_id", "lang", {keep: 0.5})
    n_all = docs.filter(F.col("lang") == keep).count()
    assert 0.3 * n_all <= half.count() <= 0.7 * n_all


def test_sample_predicate_is_scan_level(spark, sf_dir):
    """No shuffle: the sample is a filter, not an exchange."""
    from datafusion_dft_spark.plans import explain as ex

    docs = load_tables(spark, sf_dir)["documents"]
    df = sp.deterministic_sample(docs, "doc_id", 0.2)
    assert ex.exchange_count(df) == 0, ex.simple_plan(df)


def test_inverse_frequency_matches_duckdb(spark, sf_dir, duckcon):
    """Thresholds floor(M*sqrt(n_min/n_s)) derive bit-identically in
    DuckDB from the same counts — full differential on the sampled set."""
    docs = load_tables(spark, sf_dir)["documents"]
    got = {
        r.doc_id
        for r in sp.inverse_frequency_sample(docs, "doc_id", "lang")
        .select("doc_id")
        .collect()
    }
    want = {
        r[0]
        for r in duckcon.sql(
            f"""
            WITH counts AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang),
            mn AS (SELECT min(n) AS n_min FROM counts),
            th AS (SELECT lang,
                          CAST(floor({sp._M} * sqrt(CAST(n_min AS DOUBLE) / n)) AS BIGINT) AS t
                   FROM counts, mn)
            SELECT d.doc_id FROM documents d JOIN th USING (lang)
            WHERE ('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8))::BIGINT
                  % {sp._M} < th.t
            """
        ).fetchall()
    }
    assert got == want


def test_inverse_frequency_flattens(spark, sf_dir):
    """The rarest stratum survives whole; every kept stratum share moves
    toward sqrt-flat; temperature=0 keeps everything."""
    docs = load_tables(spark, sf_dir)["documents"]
    before = {r.lang: r["count"] for r in docs.groupBy("lang").count().collect()}
    out = sp.inverse_frequency_sample(docs, "doc_id", "lang")
    after = {r.lang: r["count"] for r in out.groupBy("lang").count().collect()}
    rare = min(before, key=before.get)
    assert after[rare] == before[rare]  # fraction exactly 1.0
    # sampled sizes target n_s * sqrt(n_min/n_s) = sqrt(n_min * n_s):
    # dominant strata shrink, ordering by size is preserved but compressed
    for lang, n in before.items():
        import math

        target = math.sqrt(before[rare] * n)
        assert after.get(lang, 0) <= n
        assert abs(after.get(lang, 0) - target) <= max(25, 0.25 * target)
    kept_all = sp.inverse_frequency_sample(docs, "doc_id", "lang", temperature=0.0)
    assert kept_all.count() == docs.count()


def test_inverse_frequency_scan_level(spark, sf_dir):
    """The mixture predicate is still scan-level: zero exchanges."""
    from datafusion_dft_spark.plans import explain as ex

    docs = load_tables(spark, sf_dir)["documents"]
    df = sp.inverse_frequency_sample(docs, "doc_id", "lang")
    assert ex.exchange_count(df) == 0, ex.simple_plan(df)


def test_inverse_frequency_validation(spark):
    docs = spark.createDataFrame([(1, "en")], "doc_id long, lang string")
    import pytest as _pytest

    with _pytest.raises(ValueError):
        sp.inverse_frequency_sample(docs, "doc_id", "lang", temperature=1.5)
    empty = spark.createDataFrame([], "doc_id long, lang string")
    assert sp.inverse_frequency_sample(empty, "doc_id", "lang").count() == 0


def test_skew_report_hand_computed(spark):
    """skew_report metrics on a known distribution: keys a:6 b:2 c:1 ->
    n_keys=3, max=6, mean=3, p99 interpolated on [1,2,6], ratio=2,
    suggested_salt=ceil(2)=2."""
    from datafusion_dft_spark.operators.joins import skew_report

    rows = [("a",)] * 6 + [("b",)] * 2 + [("c",)]
    df = spark.createDataFrame(rows, "k string")
    got = {r.metric: r.val for r in skew_report(df, "k").collect()}
    assert got["n_keys"] == 3.0
    assert got["max_count"] == 6.0
    assert got["mean_count"] == 3.0
    # percentile(cnt, .99) over sorted [1,2,6]: pos=0.99*2=1.98 ->
    # 2 + 0.98*(6-2) = 5.92
    assert got["p99_count"] == 5.92
    assert got["max_over_mean"] == 2.0
    assert got["suggested_salt"] == 2.0


def test_mixture_sample_hits_target_shares(spark, sf_dir):
    """Output mixture lands on the explicit weights; the scarcest
    stratum (relative to its target) is kept whole."""
    docs = load_tables(spark, sf_dir)["documents"]
    weights = {"src0": 0.5, "src1": 0.3, "src2": 0.2}
    before = {
        r["source"]: r["count"]
        for r in docs.groupBy("source").count().collect()
    }
    out = sp.mixture_sample(docs, "doc_id", "source", weights)
    after = {r["source"]: r["count"] for r in out.groupBy("source").count().collect()}
    # only weighted sources survive
    assert set(after) <= set(weights)
    n_out = min(before[s] / w for s, w in weights.items())
    # src0 is the cap (uniform counts, largest weight): kept whole
    assert after["src0"] == before["src0"]
    total = sum(after.values())
    for s, w in weights.items():
        # md5-hash sampling is exact-threshold, not exact-count: allow
        # binomial-ish slack around the target share.
        target = w * n_out
        assert abs(after.get(s, 0) - target) <= max(5, 0.35 * target), (s, after, target)
    assert total <= sum(before.values())


def test_mixture_sample_scan_level(spark, sf_dir):
    from datafusion_dft_spark.plans import explain as ex

    docs = load_tables(spark, sf_dir)["documents"]
    df = sp.mixture_sample(docs, "doc_id", "source", {"src0": 0.5, "src1": 0.5})
    assert ex.exchange_count(df) == 0, ex.simple_plan(df)


def test_mixture_sample_validation(spark):
    docs = spark.createDataFrame([(1, "src0")], "doc_id long, source string")
    import pytest as _pytest

    with _pytest.raises(ValueError, match="at least one"):
        sp.mixture_sample(docs, "doc_id", "source", {})
    with _pytest.raises(ValueError, match="> 0"):
        sp.mixture_sample(docs, "doc_id", "source", {"src0": 0.0})
    with _pytest.raises(ValueError, match="absent"):
        sp.mixture_sample(docs, "doc_id", "source", {"src0": 0.5, "nope": 0.5})


def test_weighted_sample_tilts_to_heavy_rows(spark):
    rows = [(i, 1000 if i < 10 else 1) for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, w long")
    got = {r["doc_id"] for r in sp.weighted_sample(df, "doc_id", "w", 10, seed=1).collect()}
    heavy = sum(1 for i in got if i < 10)
    # heavy rows are 1000x more likely; with 10 draws from 10 heavy +
    # 90 light the draw is dominated by heavy rows.
    assert heavy >= 7, got
    assert len(got) == 10


def test_weighted_sample_stable_under_repartition(spark, sf_dir):
    docs = load_tables(spark, sf_dir)["documents"]
    a = {r["doc_id"] for r in sp.weighted_sample(docs, "doc_id", "n_chars", 50, 3).collect()}
    b = {
        r["doc_id"]
        for r in sp.weighted_sample(docs.repartition(7), "doc_id", "n_chars", 50, 3).collect()
    }
    assert a == b
    assert len(a) == 50


def test_weighted_sample_matches_duckdb(spark, sf_dir, duckcon):
    docs = load_tables(spark, sf_dir)["documents"]
    got = {r["doc_id"] for r in sp.weighted_sample(docs, "doc_id", "n_chars", 80, 5).collect()}
    exp = {
        r[0]
        for r in duckcon.sql(
            "SELECT doc_id FROM ("
            + sp.weighted_oracle_sql("doc_id", "n_chars", 80, 5)
            + ")"
        ).fetchall()
    }
    assert got == exp


def test_weighted_sample_plan_is_topk(spark, sf_dir):
    docs = load_tables(spark, sf_dir)["documents"]
    df = sp.weighted_sample(docs, "doc_id", "n_chars", 10, 0)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan, plan


def test_weighted_sample_validation(spark):
    df = spark.createDataFrame([(1, 0)], "doc_id long, w long")
    import pytest as _pytest

    with _pytest.raises(ValueError, match="n must be"):
        sp.weighted_sample(df, "doc_id", "w", 0)
    # the weight guard is IN-PLAN (raise_error branch — no extra eager
    # scan), so it surfaces at execution time as a Spark job failure.
    with _pytest.raises(Exception, match="non-positive weight"):
        sp.weighted_sample(df, "doc_id", "w", 1).collect()
