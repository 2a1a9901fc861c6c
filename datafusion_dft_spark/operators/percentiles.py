"""Distributed exact percentiles via value histograms.

Spark's builtin exact ``percentile`` aggregate buffers a value->count
map per group and merges all partial maps in the FINAL aggregation
task for that group. On a low-cardinality group key over a
high-cardinality value column that concentrates the whole merge +
sort in a handful of tasks: measured 8.2 s steady at sf1 for three
``l_returnflag`` groups over ~1M distinct ``l_extendedprice`` values
— the one >12x scale cliff left open by the sf1 rehearsal (SCALE.md).

The histogram formulation keeps every heavy step distributed:

1. ``groupBy(group, value).count()`` — hash-partitioned on
   (group, value), so the combine work spreads over ALL shuffle
   partitions instead of one per group; map-side partial aggregation
   collapses duplicate values before the shuffle.
2. A per-group ordered cumulative sum over the DISTINCT values picks
   the two interpolation bounds. This window does sort each group's
   distinct values in one task, but on (value, count) pairs — the
   compressed domain, not the rows. For a truly unbounded continuous
   domain at extreme scale, the escape hatch is range-partitioned
   selection (repartitionByRange + partition-offset prefix sums) or
   the sketch path (``percentile_approx``), which is the production
   answer the reference's approx aggregates exist for.
3. Group totals are one row per group; the join back to the bounds is
   broadcast.

Semantics match Spark's ``percentile(col, p)`` (and DuckDB's
``median`` / ``quantile_cont``) exactly: linear interpolation at rank
``(N-1) * p`` over the sorted non-null values; a group whose values
are all null yields NULL (verified differentially in
tests/test_percentiles.py).

Reference parity: dft exposes exact percentiles through DataFusion's
``approx_percentile_cont``/``median`` surface (SURVEY §2.4); this
module is the scale-correct exact path backing
``distinct_aggregates``'s oracle columns.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def percentile_exact_hist(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    p: float,
    out_col: str | None = None,
) -> DataFrame:
    """Exact interpolated percentile per group: (group..., out_col).

    Equivalent to ``df.groupBy(*group_cols).agg(percentile(value_col, p))``
    but with the combine work distributed over (group, value) instead
    of concentrated per group. Groups present in ``df`` whose values
    are all NULL are emitted with a NULL percentile, matching the
    builtin aggregate.
    """
    out_col = out_col or f"p{int(p * 100)}_{value_col}"
    gcols = [F.col(c) for c in group_cols]
    v = F.col(value_col).cast("double")

    # Every group that exists in the input, so all-null groups survive
    # to the final left join (count(value) counts non-nulls only).
    groups = df.groupBy(*gcols).agg(F.count(v).alias("n"))
    hist = (
        df.filter(v.isNotNull())
        .groupBy(*gcols, v.alias("val"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w = W.partitionBy(*group_cols).orderBy("val")
    cum = hist.withColumn("cum", F.sum("cnt").over(w))

    # Target ordinals (0-based): rank rn = (N-1)*p, bounds floor/ceil.
    tot = groups.filter(F.col("n") > 0).select(
        *gcols,
        ((F.col("n") - F.lit(1)) * F.lit(float(p))).alias("rn"),
    )
    tot = tot.withColumn("lo", F.floor("rn")).withColumn("hi", F.ceil("rn"))

    j = cum.join(F.broadcast(tot), group_cols)
    covers_lo = (F.col("cum") > F.col("lo")) & (F.col("cum") - F.col("cnt") <= F.col("lo"))
    covers_hi = (F.col("cum") > F.col("hi")) & (F.col("cum") - F.col("cnt") <= F.col("hi"))
    bounds = (
        j.filter(covers_lo | covers_hi)
        .groupBy(*gcols)
        .agg(
            F.min(F.when(covers_lo, F.col("val"))).alias("vlo"),
            F.min(F.when(covers_hi, F.col("val"))).alias("vhi"),
            F.max("rn").alias("rn"),
            F.max("lo").alias("lo"),
        )
        .select(
            *gcols,
            (
                F.col("vlo")
                + (F.col("rn") - F.col("lo")) * (F.col("vhi") - F.col("vlo"))
            ).alias(out_col),
        )
    )
    return groups.select(*gcols).join(bounds, group_cols, "left")


def percentile_exact_refine(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    p: float,
    out_col: str | None = None,
    accuracy: int = 10000,
) -> DataFrame:
    """Exact percentile via approx-prune + exact-refine; constant-size tail.

    ``percentile_exact_hist`` still sorts each group's full distinct-
    value domain in one task. This variant bounds that step to a
    CONSTANT independent of cardinality:

    1. One pass computes per-group N and a Greenwald-Khanna
       ``percentile_approx`` at ``p -/+ 3/accuracy`` — the sketch's
       rank error is ``<= N/accuracy``, so the true ordinal
       ``(N-1)*p`` is guaranteed to fall between the two returned
       values with a 2N/accuracy rank margin on each side.
    2. The second pass clamps every value outside ``[ap_lo, ap_hi]``
       to a ±infinity sentinel BEFORE the histogram ``groupBy(group,
       value)``. Clamping preserves ranks (everything below the band
       collapses into one ordered bucket, likewise above), so the
       exact cumulative-count walk is unchanged — but the histogram
       now holds ~6N/accuracy in-band values + 2 sentinels per group
       (~3.6k rows per group at sf1 defaults), and the per-group sort
       is O(band), not O(distinct values).
    3. An in-plan ``assert_true`` guards the sketch contract: if the
       target ordinal ever landed in a sentinel bucket the result
       would be non-finite, and the query FAILS rather than silently
       returning an approximation.

    Both passes are single scans with map-side partial aggregation;
    nothing grows with distinct-value cardinality except the (tiny)
    shuffled band. This is the 100 TB-correct exact path; see the
    module docstring for why the builtin and the plain histogram fall
    over. Used for ``distinct_aggregates``'s ``exact_p50`` column
    (l_extendedprice, ~1M distinct values at sf1: builtin 8.2 s →
    hist 5.5 s → refine, with the whole walk on ~4k rows).
    """
    out_col = out_col or f"p{int(p * 100)}_{value_col}"
    gcols = [F.col(c) for c in group_cols]
    v = F.col(value_col).cast("double")
    q_lo = max(0.0, p - 3.0 / accuracy)
    q_hi = min(1.0, p + 3.0 / accuracy)

    probe = df.groupBy(*gcols).agg(
        F.count(v).alias("n"),
        F.percentile_approx(v, F.array(F.lit(q_lo), F.lit(q_hi)), F.lit(accuracy)).alias(
            "aps"
        ),
    )
    thresholds = probe.filter(F.col("n") > 0).select(
        *gcols,
        ((F.col("n") - F.lit(1)) * F.lit(float(p))).alias("rn"),
        F.col("aps")[0].alias("ap_lo"),
        F.col("aps")[1].alias("ap_hi"),
    )
    thresholds = thresholds.withColumn("lo", F.floor("rn")).withColumn("hi", F.ceil("rn"))

    NEG, POS = float("-inf"), float("inf")
    clamped = (
        df.filter(v.isNotNull())
        .join(F.broadcast(thresholds), group_cols)
        .select(
            *gcols,
            "rn",
            "lo",
            "hi",
            F.when(v < F.col("ap_lo"), F.lit(NEG))
            .when(v > F.col("ap_hi"), F.lit(POS))
            .otherwise(v)
            .alias("val"),
        )
    )
    hist = clamped.groupBy(*gcols, "rn", "lo", "hi", "val").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    w = W.partitionBy(*group_cols).orderBy("val")
    cum = hist.withColumn("cum", F.sum("cnt").over(w))
    covers_lo = (F.col("cum") > F.col("lo")) & (F.col("cum") - F.col("cnt") <= F.col("lo"))
    covers_hi = (F.col("cum") > F.col("hi")) & (F.col("cum") - F.col("cnt") <= F.col("hi"))
    bounds = (
        cum.filter(covers_lo | covers_hi)
        .groupBy(*gcols)
        .agg(
            F.min(F.when(covers_lo, F.col("val"))).alias("vlo"),
            F.min(F.when(covers_hi, F.col("val"))).alias("vhi"),
            F.max("rn").alias("rn"),
            F.max("lo").alias("lo"),
        )
        .select(
            *gcols,
            (
                F.col("vlo")
                + (F.col("rn") - F.col("lo")) * (F.col("vhi") - F.col("vlo"))
            ).alias(out_col),
        )
    )
    # Sketch-contract guard: a target ordinal inside a sentinel bucket
    # yields ±inf or NaN here — fail loudly, never approximate silently.
    finite = (
        F.col(out_col).isNull()
        | (~F.isnan(out_col) & (F.col(out_col) > F.lit(NEG)) & (F.col(out_col) < F.lit(POS)))
    )
    bounds = bounds.withColumn(
        "_refine_ok", F.assert_true(finite, F.lit("percentile_exact_refine: band missed ordinal"))
    ).drop("_refine_ok")
    return probe.select(*gcols).join(bounds, group_cols, "left")


def median_exact_hist(
    df: DataFrame, group_cols: list[str], value_col: str, out_col: str | None = None
) -> DataFrame:
    """Exact median per group — ``percentile_exact_hist`` at p=0.5."""
    return percentile_exact_hist(
        df, group_cols, value_col, 0.5, out_col or f"median_{value_col}"
    )


def percentile_col(value_col: str, p: float) -> Column:
    """The builtin exact-percentile aggregate expression (small-domain path).

    Kept as the single place that spells the builtin, so call sites can
    choose per column: builtin for value domains known to be small
    (its per-group map IS the histogram then), ``percentile_exact_hist``
    when the domain scales with the data.
    """
    return F.expr(f"percentile({value_col}, {p})")
