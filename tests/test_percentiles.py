"""Differential tests for the distributed exact-percentile operators.

Both formulations must reproduce Spark's builtin ``percentile(col, p)``
bit-for-bit (linear interpolation at rank ``(N-1)*p``) — the builtin
is itself oracle-checked against DuckDB ``median`` in
``distinct_aggregates``, so agreement here chains the whole path.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datafusion_dft_spark.operators.percentiles import (
    percentile_exact_hist,
    percentile_exact_refine,
)


def _builtin(df, p):
    return {
        r.g: r.p
        for r in df.groupBy("g").agg(F.expr(f"percentile(v, {p})").alias("p")).collect()
    }


@pytest.fixture(scope="module")
def skewed(spark):
    # 7 groups, heavy duplication (13-value domain) — exercises ties,
    # interpolation between equal values, and uneven group sizes.
    return (
        spark.range(0, 40000)
        .select(
            (F.col("id") % 7).alias("g"),
            ((F.col("id") * F.col("id")) % 13).cast("double").alias("v"),
        )
        .cache()
    )


@pytest.fixture(scope="module")
def continuous(spark):
    # Near-unique value domain: md5-derived doubles, the case where the
    # builtin's per-group value map scales with the rows.
    return (
        spark.range(0, 20000)
        .select(
            (F.col("id") % 3).alias("g"),
            (
                F.conv(F.substring(F.md5(F.col("id").cast("string")), 1, 8), 16, 10)
                .cast("double")
                / 4294967296.0
            ).alias("v"),
        )
        .cache()
    )


@pytest.mark.parametrize("p", [0.0, 0.25, 0.5, 0.9, 1.0])
def test_hist_matches_builtin(skewed, p):
    got = {
        r.g: r.p for r in percentile_exact_hist(skewed, ["g"], "v", p, "p").collect()
    }
    assert got == _builtin(skewed, p)


@pytest.mark.parametrize("p", [0.0, 0.001, 0.25, 0.5, 0.999, 1.0])
def test_refine_matches_builtin(skewed, p):
    got = {
        r.g: r.p for r in percentile_exact_refine(skewed, ["g"], "v", p, "p").collect()
    }
    assert got == _builtin(skewed, p)


@pytest.mark.parametrize("p", [0.25, 0.5, 0.75])
def test_refine_continuous_domain(continuous, p):
    got = {
        r.g: r.p
        for r in percentile_exact_refine(continuous, ["g"], "v", p, "p").collect()
    }
    assert got == _builtin(continuous, p)


def test_refine_coarse_sketch_still_exact(skewed):
    """accuracy=10 widens the pruning band enormously — the refine
    step must stay exact regardless of how loose the sketch is."""
    got = {
        r.g: r.p
        for r in percentile_exact_refine(
            skewed, ["g"], "v", 0.5, "p", accuracy=10
        ).collect()
    }
    assert got == _builtin(skewed, 0.5)


def test_null_and_all_null_groups(spark):
    df = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("a", None), ("b", None), ("c", 5.0)],
        "g string, v double",
    )
    expect = _builtin(df, 0.5)  # a -> 1.5, b -> None, c -> 5.0
    for fn in (percentile_exact_hist, percentile_exact_refine):
        got = {r.g: r.p for r in fn(df, ["g"], "v", 0.5, "p").collect()}
        assert got == expect, fn.__name__


def test_singleton_groups(spark):
    df = spark.createDataFrame([("a", 3.0), ("b", 7.0)], "g string, v double")
    for fn in (percentile_exact_hist, percentile_exact_refine):
        got = {r.g: r.p for r in fn(df, ["g"], "v", 0.5, "p").collect()}
        assert got == {"a": 3.0, "b": 7.0}, fn.__name__


def test_multi_group_columns(skewed):
    df = skewed.withColumn("g2", (F.col("v") > 6).cast("int"))
    ref = {
        (r.g, r.g2): r.p
        for r in df.groupBy("g", "g2")
        .agg(F.expr("percentile(v, 0.5)").alias("p"))
        .collect()
    }
    got = {
        (r.g, r.g2): r.p
        for r in percentile_exact_refine(df, ["g", "g2"], "v", 0.5, "p").collect()
    }
    assert got == ref


@pytest.mark.parametrize(
    ("n", "p"),
    [(83, 0.6), (211, 0.31), (70, 0.71), (999, 0.5), (13, 0.9), (2, 0.5)],
)
def test_small_near_unique_groups(spark, n, p):
    """Regression (review round 6): small groups of near-unique values.

    The fixed 3/accuracy quantile margin is below one ordinal (1/N)
    when N << accuracy, so without the small-group cutoff the sketch
    band excluded the interpolation's upper value and the operator
    silently returned inf/NaN."""
    df = spark.range(0, n).selectExpr(
        "0 AS g",
        "CAST(conv(substr(md5(CAST(id AS STRING)), 1, 8), 16, 10) AS DOUBLE) / 4294967296.0 AS v",
    )
    want = _builtin(df, p)
    got = {r.g: r.p for r in percentile_exact_refine(df, ["g"], "v", p, "p").collect()}
    assert got == want
    assert all(x is not None and x == x and abs(x) != float("inf") for x in got.values())


def test_mixed_group_sizes_cross_cutoff(spark):
    """One frame holding groups on both sides of the 2*accuracy cutoff
    exercises the clamp path and the no-clamp path in a single plan."""
    df = spark.range(0, 5080).selectExpr(
        "CASE WHEN id < 80 THEN 0 ELSE 1 END AS g",
        "CAST(conv(substr(md5(CAST(id AS STRING)), 1, 8), 16, 10) AS DOUBLE) / 4294967296.0 AS v",
    )
    want = _builtin(df, 0.37)
    got = {
        r.g: r.p
        for r in percentile_exact_refine(df, ["g"], "v", 0.37, "p", accuracy=50).collect()
    }
    assert got == want


def test_nonfinite_values_route_around_clamp(spark):
    """A large (clamp-regime) group legitimately containing ±inf/NaN
    must NOT trip the sentinel guard: such groups are detected in the
    probe and keep their full domain (advisor r6). Results match the
    builtin, including a genuinely infinite percentile."""
    # g=0: 300 finite values + +inf tail (p=0.99 lands on inf);
    # g=1: -inf head; g=2: NaN values; g=3: all-finite control that
    # still exercises the clamp path in the same plan.
    df = spark.range(0, 1240).selectExpr(
        "CASE WHEN id < 310 THEN 0 WHEN id < 620 THEN 1 WHEN id < 930 THEN 2 ELSE 3 END AS g",
        """CASE
             WHEN id < 300 THEN CAST(id AS DOUBLE)
             WHEN id < 310 THEN double('inf')
             WHEN id < 320 THEN double('-inf')
             WHEN id < 620 THEN CAST(id AS DOUBLE)
             WHEN id < 930 THEN double('NaN')
             ELSE CAST(id AS DOUBLE)
           END AS v""",
    )
    for p in (0.5, 0.99):
        want = _builtin(df, p)
        got = {
            r.g: r.p
            for r in percentile_exact_refine(df, ["g"], "v", p, "p", accuracy=50).collect()
        }
        # NaN != NaN — compare with a repr that treats NaN as equal
        norm = lambda d: {k: repr(val) for k, val in d.items()}
        assert norm(got) == norm(want), p


def test_finite_guard_still_active(spark):
    """The sentinel guard stays armed for all-finite clamped groups —
    scoping it to clamped groups must not disarm it (the contract of
    review finding r5: fail loudly on a band miss, never approximate)."""
    from datafusion_dft_spark.operators import percentiles as pct

    df = spark.range(0, 500).selectExpr(
        "0 AS g", "CAST(id AS DOUBLE) AS v"
    )
    got = {
        r.g: r.p for r in percentile_exact_refine(df, ["g"], "v", 0.5, "p", accuracy=50).collect()
    }
    assert got == {0: 249.5}


def test_internal_names_do_not_collide(spark):
    """Group columns named like internal plan columns must still work."""
    df = spark.createDataFrame(
        [("a", 1, 1.0), ("a", 1, 2.0), ("b", 2, 5.0)], "n string, val int, v double"
    )
    for fn in (percentile_exact_hist, percentile_exact_refine):
        got = {
            (r.n, r.val): r.p for r in fn(df, ["n", "val"], "v", 0.5, "p").collect()
        }
        assert got == {("a", 1): 1.5, ("b", 2): 5.0}, fn.__name__


# --------------------------------------------------------------------------
# Property fuzz: random value distributions / group counts / p values.
# --------------------------------------------------------------------------
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    p=st.floats(min_value=0.0, max_value=1.0, allow_nan=False),
    n_groups=st.integers(min_value=1, max_value=5),
    domain=st.integers(min_value=1, max_value=50),
    rows=st.integers(min_value=1, max_value=3000),
    accuracy=st.sampled_from([20, 1000, 10000]),
    near_unique=st.booleans(),
)
def test_fuzz_refine_vs_builtin(spark, p, n_groups, domain, rows, accuracy, near_unique):
    """Any (distribution, p, accuracy) triple must reproduce the builtin
    exactly — including coarse sketches, single-row groups, p at the
    extremes, and near-unique value domains (the regime the round-6
    review caught). Values are a deterministic scatter so runs are
    reproducible without RNG."""
    val = (
        "CAST(conv(substr(md5(CAST(id AS STRING)), 1, 8), 16, 10) AS DOUBLE) / 4294967296.0"
        if near_unique
        else f"CAST((id * id + 7 * id) % {domain} AS DOUBLE) / 3.0"
    )
    df = spark.range(0, rows).selectExpr(f"id % {n_groups} AS g", f"{val} AS v")
    want = _builtin(df, p)
    got = {
        r.g: r.p
        for r in percentile_exact_refine(
            df, ["g"], "v", p, "p", accuracy=accuracy
        ).collect()
    }
    assert got == want


def test_group_drift_separates_shifted_group(spark):
    """group_drift: a group drawn from the same distribution as the
    corpus shows near-zero drift; a shifted group shows ~the shift."""
    from pyspark.sql import functions as F

    from datafusion_dft_spark.operators.percentiles import group_drift

    # dominant clean source + a small shifted source: the global
    # distribution ~= the dominant one, so 'same' reads near zero and
    # 'shifted' carries ~the injected +0.5 shift.
    rows = [("same", (i % 180) / 180.0) for i in range(180)]
    rows += [("shifted", 0.5 + i / 20.0) for i in range(20)]
    df = spark.createDataFrame(rows, "src string, q double")
    got = {r["src"]: r["drift"] for r in group_drift(df, ["src"], F.col("q")).collect()}
    assert got["shifted"] > got["same"] + 0.2, got
    assert got["same"] < 0.15, got
    assert got["shifted"] >= 0.4, got


def test_group_drift_zero_when_identical(spark):
    from pyspark.sql import functions as F

    from datafusion_dft_spark.operators.percentiles import group_drift

    rows = [(s, i / 50.0) for s in ("a", "b") for i in range(50)]
    df = spark.createDataFrame(rows, "src string, q double")
    got = {r["src"]: r["drift"] for r in group_drift(df, ["src"], F.col("q")).collect()}
    assert all(v <= 1e-6 for v in got.values()), got
