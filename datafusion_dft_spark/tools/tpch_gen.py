"""Deterministic TPC-H-style data generator, Spark-native.

Reference analog: ``dft generate-tpch --scale-factor N --format parquet``
(src/args.rs:229-234, src/tpch.rs:201-339) which writes one table per
directory under ``{db}/tables/dft/tpch/{table}/`` (tpch.rs:87-96).

This generator is distribution-first: every table is
``spark.range(n)`` projected through hash-derived deterministic
columns (xxhash64 of (row id, column tag) modulo value spaces), so
generation parallelizes across the cluster with no driver data path
and is reproducible bit-for-bit at any parallelism. Schemas match the
driver corpus (FIXTURES.md), so generated databases work with every
query in the registry.

Row counts per scale factor mirror the corpus ratios:
lineitem 6M*sf, orders 1.5M*sf, customer 150k*sf, part 200k*sf,
supplier 10k*sf, nation 25, region 5.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
STATUSES = ["F", "O", "P"]
RETURNFLAGS = ["A", "N", "R"]
PART_ADJ = ["blue", "cold", "hot", "large", "new", "old", "red", "small"]
PART_NOUN = ["bolt", "gear", "gizmo", "ring", "widget"]
PART_TYPES = ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]


def _h(tag: str) -> F.Column:
    """Deterministic per-row hash for column ``tag`` (non-negative)."""
    return F.abs(F.xxhash64(F.col("id"), F.lit(tag)))


def _pick(tag: str, values: list[str]) -> F.Column:
    arr = F.array(*[F.lit(v) for v in values])
    return F.element_at(arr, (_h(tag) % len(values) + 1).cast("int"))


def _money(tag: str, lo: float, hi: float) -> F.Column:
    cents = _h(tag) % int((hi - lo) * 100)
    return F.round(F.lit(lo) + cents / 100.0, 2)


def _date(tag: str, start: str, days: int) -> F.Column:
    return F.date_add(F.to_date(F.lit(start)), (_h(tag) % days).cast("int")).cast(
        "timestamp"
    )


def gen_tables(spark: SparkSession, scale_factor: float) -> dict[str, DataFrame]:
    n_li = max(int(6_000_000 * scale_factor), 100)
    n_ord = max(int(1_500_000 * scale_factor), 25)
    n_cust = max(int(150_000 * scale_factor), 10)
    n_part = max(int(200_000 * scale_factor), 10)
    n_supp = max(int(10_000 * scale_factor), 5)

    region = spark.range(5).select(
        F.col("id").cast("int").alias("r_regionkey"),
        F.element_at(F.array(*[F.lit(r) for r in REGIONS]), F.col("id").cast("int") + 1).alias("r_name"),
    )
    nation = spark.range(25).select(
        F.col("id").cast("int").alias("n_nationkey"),
        F.concat(F.lit("NATION_"), F.col("id")).alias("n_name"),
        (_h("n_region") % 5).cast("int").alias("n_regionkey"),
    )
    supplier = spark.range(n_supp).select(
        (F.col("id") + 1).alias("s_suppkey"),
        F.concat(F.lit("Supplier#"), F.col("id") + 1).alias("s_name"),
        (_h("s_nation") % 25).cast("int").alias("s_nationkey"),
        _money("s_bal", -999.99, 9999.99).alias("s_acctbal"),
    )
    customer = spark.range(n_cust).select(
        (F.col("id") + 1).alias("c_custkey"),
        F.concat(F.lit("Customer#"), F.col("id") + 1).alias("c_name"),
        (_h("c_nation") % 25).cast("int").alias("c_nationkey"),
        _money("c_bal", -999.99, 9999.99).alias("c_acctbal"),
        _pick("c_seg", SEGMENTS).alias("c_mktsegment"),
    )
    part = spark.range(n_part).select(
        (F.col("id") + 1).alias("p_partkey"),
        F.concat_ws(" ", _pick("p_adj", PART_ADJ), _pick("p_noun", PART_NOUN)).alias("p_name"),
        F.concat(F.lit("Brand#"), (_h("p_brand") % 25 + 1)).alias("p_brand"),
        _pick("p_type", PART_TYPES).alias("p_type"),
        (_h("p_size") % 50 + 1).cast("int").alias("p_size"),
        _money("p_price", 900.0, 2000.0).alias("p_retailprice"),
    )
    orders = spark.range(n_ord).select(
        (F.col("id") + 1).alias("o_orderkey"),
        (_h("o_cust") % n_cust + 1).alias("o_custkey"),
        _pick("o_status", STATUSES).alias("o_orderstatus"),
        _money("o_total", 1000.0, 500000.0).alias("o_totalprice"),
        _date("o_date", "1995-01-01", 2400).alias("o_orderdate"),
        _pick("o_prio", PRIORITIES).alias("o_orderpriority"),
    )
    lineitem = spark.range(n_li).select(
        (_h("l_order") % n_ord + 1).alias("l_orderkey"),
        (_h("l_part") % n_part + 1).alias("l_partkey"),
        (_h("l_supp") % n_supp + 1).alias("l_suppkey"),
        (_h("l_line") % 7 + 1).cast("int").alias("l_linenumber"),
        (_h("l_qty") % 50 + 1).cast("double").alias("l_quantity"),
        _money("l_price", 900.0, 100000.0).alias("l_extendedprice"),
        ((_h("l_disc") % 11) / 100.0).alias("l_discount"),
        ((_h("l_tax") % 9) / 100.0).alias("l_tax"),
        _pick("l_rflag", RETURNFLAGS).alias("l_returnflag"),
        _pick("l_lstatus", ["F", "O"]).alias("l_linestatus"),
        _date("l_ship", "1995-01-02", 2500).alias("l_shipdate"),
    )
    n_events = max(int(1_000_000 * scale_factor), 50)
    n_docs = max(int(50_000 * scale_factor), 20)
    n_emb = max(int(20_000 * scale_factor), 20)
    events = spark.range(n_events).select(
        F.col("id").alias("event_id"),
        (F.to_timestamp(F.lit("2024-01-01")) + F.make_dt_interval(secs=(_h("e_ts") % 2_592_000).cast("double"))).alias("ts"),
        (_h("e_user") % max(n_events // 40, 2)).alias("user_id"),
        _pick("e_type", ["click", "error", "purchase", "signup", "view"]).alias("event_type"),
        _money("e_val", 0.0, 200.0).alias("value"),
        F.concat(F.lit('{"k": '), (_h("e_k") % 100), F.lit("}")).alias("props"),
    )
    vocab = ["the", "a", "fast", "slow", "key", "order", "sort", "table", "scan",
             "merge", "part", "window", "small", "big", "hash", "join", "row",
             "data", "query", "spark", "group", "filter", "value", "batch",
             "stream", "line", "customer", "column", "agg", "vector"]
    varr = F.array(*[F.lit(w) for w in vocab])
    documents = spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.array_join(
            F.transform(
                F.sequence(F.lit(1), (_h("d_len") % 80 + 20).cast("int")),
                lambda i: F.element_at(varr, (F.abs(F.xxhash64(F.col("id"), F.lit("d_w"), i)) % len(vocab) + 1).cast("int")),
            ),
            " ",
        ).alias("text"),
        _pick("d_lang", ["de", "en", "en", "es", "fr", "zh"]).alias("lang"),
        F.concat(F.lit("src"), (_h("d_src") % 20)).alias("source"),
    ).withColumn("n_chars", F.length("text"))
    embeddings = spark.range(n_emb).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(63)),
            lambda d: ((F.xxhash64(F.col("id"), F.lit("v"), d) % 2000) / 1000.0).cast("float"),
        ).alias("embedding"),
        (_h("e_label") % 10).cast("int").alias("label"),
    )
    return {
        "region": region,
        "nation": nation,
        "supplier": supplier,
        "customer": customer,
        "part": part,
        "orders": orders,
        "lineitem": lineitem,
        "events": events,
        "documents": documents,
        "embeddings": embeddings,
    }


def generate(
    spark: SparkSession,
    output_dir: str,
    scale_factor: float = 0.01,
    layout: str = "flat",
) -> list[str]:
    """Write the generated tables as parquet.

    layout="flat": ``{dir}/{table}.parquet`` (driver-corpus shape);
    layout="db":   ``{dir}/tables/dft/tpch/{table}/`` (reference's
                   directory-database shape, src/tpch.rs:87-96).
    """
    written = []
    for name, df in gen_tables(spark, scale_factor).items():
        if layout == "db":
            path = os.path.join(output_dir, "tables", "dft", "tpch", name)
            df.write.mode("overwrite").parquet(path)
        else:
            path = os.path.join(output_dir, f"{name}.parquet")
            df.coalesce(1).write.mode("overwrite").parquet(path)
        written.append(path)
    return written
