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
supplier 10k*sf, partsupp 4*part, nation 25, region 5.

Value domains follow the PUBLIC TPC-H specification (the reference's
``generate-tpch`` delegates to the official-dbgen-compatible tpchgen
crate, src/tpch.rs:201-339): real nation names with the spec's region
mapping, three-syllable part types, Brand#MN tied to Manufacturer#M,
color-word part names, and the spec's partsupp supplier-spread
formula — so the reference's own embedded TPC-H query texts
(src/server/http/tpch.rs), which filter on 'GERMANY', '%BRASS',
'forest%', 'Brand#45', 'Customer…Complaints', select real rows on a
generated database instead of passing vacuously. Columns are a
SUPERSET of the driver corpus schemas (FIXTURES.md): everything the
driver corpus has, plus the spec columns those query texts touch
(p_mfgr/p_container, s_address/s_phone/s_comment, partsupp; since r9
also o_shippriority/o_comment, c_address/c_phone/c_comment, and
l_commitdate/l_receiptdate/l_shipmode/l_shipinstruct, plus FK-valid
l_suppkey and the spec o_orderdate range) — enough that EVERY
non-empty embedded query text Q1-Q22 runs non-vacuously; the whole
suite is hash-compared against DuckDB in tests/test_tpch_verbatim.py.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
# Official TPC-H nation -> region mapping (spec 4.2.3, public).
NATIONS = [
    ("ALGERIA", 0), ("ARGENTINA", 1), ("BRAZIL", 1), ("CANADA", 1),
    ("EGYPT", 4), ("ETHIOPIA", 0), ("FRANCE", 3), ("GERMANY", 3),
    ("INDIA", 2), ("INDONESIA", 2), ("IRAN", 4), ("IRAQ", 4),
    ("JAPAN", 2), ("JORDAN", 4), ("KENYA", 0), ("MOROCCO", 0),
    ("MOZAMBIQUE", 0), ("PERU", 1), ("CHINA", 2), ("ROMANIA", 3),
    ("SAUDI ARABIA", 4), ("VIETNAM", 2), ("RUSSIA", 3),
    ("UNITED KINGDOM", 3), ("UNITED STATES", 1),
]
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
STATUSES = ["F", "O", "P"]
RETURNFLAGS = ["A", "N", "R"]
# TPC-H spec 4.2.2.13: P_TYPE = syl1 + ' ' + syl2 + ' ' + syl3.
TYPE_SYL1 = ["STANDARD", "SMALL", "MEDIUM", "LARGE", "ECONOMY", "PROMO"]
TYPE_SYL2 = ["ANODIZED", "BURNISHED", "PLATED", "POLISHED", "BRUSHED"]
TYPE_SYL3 = ["TIN", "NICKEL", "BRASS", "STEEL", "COPPER"]
CONTAINER_SYL1 = ["SM", "LG", "MED", "JUMBO", "WRAP"]
CONTAINER_SYL2 = ["CASE", "BOX", "BAG", "JAR", "PKG", "PACK", "CAN", "DRUM"]
# spec 4.2.2.13: L_SHIPMODE / L_SHIPINSTRUCT value sets (public).
SHIPMODES = ["REG AIR", "AIR", "RAIL", "SHIP", "TRUCK", "MAIL", "FOB"]
SHIPINSTRUCTS = ["DELIVER IN PERSON", "COLLECT COD", "NONE", "TAKE BACK RETURN"]
# TPC-H spec P_NAME color words (92, public spec appendix).
COLORS = (
    "almond antique aquamarine azure beige bisque black blanched blue blush "
    "brown burlywood burnished chartreuse chiffon chocolate coral cornflower "
    "cornsilk cream cyan dark deep dim dodger drab firebrick floral forest "
    "frosted gainsboro ghost goldenrod green grey honeydew hot indian ivory "
    "khaki lace lavender lawn lemon light lime linen magenta maroon medium "
    "metallic midnight mint misty moccasin navajo navy olive orange orchid "
    "pale papaya peach peru pink plum powder puff purple red rose rosy royal "
    "saddle salmon sandy seashell sienna sky slate smoke snow spring steel "
    "tan thistle tomato turquoise violet wheat white yellow"
).split()


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


def gen_tables(
    spark: SparkSession, scale_factor: float, money: str = "double"
) -> dict[str, DataFrame]:
    """money="decimal" stores TPC-H money/rate/quantity columns as
    DECIMAL(12,2) (the spec's type). The driver corpus uses double, so
    that stays the default — but decimal is what makes the embedded
    Q15 text deterministic: ``total_revenue = (select max(...))``
    needs the view's SUM recomputed twice inside one query to agree
    EXACTLY, and double sums in Spark vary at the ULP with shuffle
    merge order (run-to-run!), while decimal sums are exact. The
    verbatim differential suite generates with money="decimal"."""
    if money not in ("double", "decimal"):
        raise ValueError(f"money must be 'double' or 'decimal', got {money!r}")

    def _m(tag: str, lo: float, hi: float) -> F.Column:
        c = _money(tag, lo, hi)
        return c.cast("decimal(12,2)") if money == "decimal" else c

    def _rate(c: F.Column) -> F.Column:
        return c.cast("decimal(12,2)") if money == "decimal" else c

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
        F.element_at(
            F.array(*[F.lit(n) for n, _ in NATIONS]), F.col("id").cast("int") + 1
        ).alias("n_name"),
        F.element_at(
            F.array(*[F.lit(r) for _, r in NATIONS]), F.col("id").cast("int") + 1
        ).cast("int").alias("n_regionkey"),
    )
    supplier = spark.range(n_supp).select(
        (F.col("id") + 1).alias("s_suppkey"),
        F.concat(F.lit("Supplier#"), F.col("id") + 1).alias("s_name"),
        (_h("s_nation") % 25).cast("int").alias("s_nationkey"),
        _m("s_bal", -999.99, 9999.99).alias("s_acctbal"),
        F.concat(F.lit("addr "), _h("s_addr") % 10_000_000).alias("s_address"),
        F.format_string(
            "%d-%03d-%03d-%04d",
            (_h("s_nation") % 25) + 10,
            (_h("s_ph1") % 1000).cast("int"),
            (_h("s_ph2") % 1000).cast("int"),
            (_h("s_ph3") % 10000).cast("int"),
        ).alias("s_phone"),
        # ~3% carry the spec's BBB complaint marker so Q16's
        # '%Customer%Complaints%' NOT IN subquery is non-empty at
        # small scale factors (the spec plants 5 per 10k suppliers —
        # zero at sf<=0.1).
        F.when(
            _h("s_cmt") % 33 == 0,
            F.concat(F.lit("sly Customer deposits Complaints "), _h("s_cmtx") % 100),
        )
        .otherwise(F.concat(F.lit("quiet packages wake "), _h("s_cmtx") % 100))
        .alias("s_comment"),
    )
    customer = spark.range(n_cust).select(
        (F.col("id") + 1).alias("c_custkey"),
        F.concat(F.lit("Customer#"), F.col("id") + 1).alias("c_name"),
        (_h("c_nation") % 25).cast("int").alias("c_nationkey"),
        _m("c_bal", -999.99, 9999.99).alias("c_acctbal"),
        _pick("c_seg", SEGMENTS).alias("c_mktsegment"),
        F.concat(F.lit("addr "), _h("c_addr") % 10_000_000).alias("c_address"),
        # spec 4.2.2.9: country code = nationkey + 10 (Q22 substrings it)
        F.format_string(
            "%d-%03d-%03d-%04d",
            (_h("c_nation") % 25) + 10,
            (_h("c_ph1") % 1000).cast("int"),
            (_h("c_ph2") % 1000).cast("int"),
            (_h("c_ph3") % 10000).cast("int"),
        ).alias("c_phone"),
        F.concat(F.lit("steady pending ideas sleep "), _h("c_cmt") % 100).alias(
            "c_comment"
        ),
    )
    mfgr = _h("p_mfgr") % 5 + 1
    part = spark.range(n_part).select(
        (F.col("id") + 1).alias("p_partkey"),
        # spec-style color-word name; 'forest%' (Q20) matches ~1/92
        F.concat_ws(" ", _pick("p_c1", COLORS), _pick("p_c2", COLORS)).alias("p_name"),
        F.concat(F.lit("Manufacturer#"), mfgr).alias("p_mfgr"),
        # spec 4.2.2: Brand#MN where M is the manufacturer digit
        F.concat(F.lit("Brand#"), mfgr * 10 + (_h("p_brandn") % 5 + 1)).alias("p_brand"),
        F.concat_ws(
            " ", _pick("p_t1", TYPE_SYL1), _pick("p_t2", TYPE_SYL2), _pick("p_t3", TYPE_SYL3)
        ).alias("p_type"),
        (_h("p_size") % 50 + 1).cast("int").alias("p_size"),
        F.concat_ws(" ", _pick("p_k1", CONTAINER_SYL1), _pick("p_k2", CONTAINER_SYL2)).alias(
            "p_container"
        ),
        _m("p_price", 900.0, 2000.0).alias("p_retailprice"),
    )
    # spec 4.2.3: each part has 4 supplier rows; suppkey spread per the
    # official dbgen formula  (ps_partkey + i*(S/4 + (ps_partkey-1)/S)) % S + 1
    # with INTEGER division in the stride (a modulo there lets the four
    # rows of a part collide onto one suppkey, breaking the
    # (ps_partkey, ps_suppkey) primary key the spec guarantees).  At
    # spec ratios (P = 20*S, S >= 10000) the stride S/4 + p0/S can never
    # satisfy d*stride ≡ 0 (mod S) for d in 1..3, so the four keys are
    # distinct; our toy floors (S as low as 5, P/S up to 20) CAN hit a
    # bad residue (e.g. S=10, stride=5 collides i=0 with i=2), so guard:
    # if the spec stride lands on a bad residue fall back to S//4, which
    # is collision-free for all S >= 4 (1 <= d*(S//4) <= 3S/4 < S).
    def _ps_suppkey(p0: F.Column, i: F.Column) -> F.Column:
        """Supplier key of the part's i-th (0..3) partsupp row."""
        base = max(1, n_supp // 4)
        cand = F.lit(base) + F.floor(p0 / n_supp)
        bad = (
            ((cand % n_supp) == 0)
            | (((cand * 2) % n_supp) == 0)
            | (((cand * 3) % n_supp) == 0)
        )
        stride = F.when(bad, F.lit(base)).otherwise(cand)
        return (p0 + i * stride) % n_supp + 1

    partsupp = spark.range(n_part * 4).select(
        (F.col("id") / 4 + 1).cast("long").alias("ps_partkey"),
        _ps_suppkey((F.col("id") / 4).cast("long"), F.col("id") % 4).alias(
            "ps_suppkey"
        ),
        (_h("ps_qty") % 9999 + 1).cast("int").alias("ps_availqty"),
        _m("ps_cost", 1.0, 1000.0).alias("ps_supplycost"),
    )
    # spec 4.2.3: O_CUSTKEY is never a multiple of 3 — one third of
    # customers have NO orders (Q13's zero-spike, Q22's NOT EXISTS).
    # j-th (0-based) natural not divisible by 3 is j + j//2 + 1.
    _cj = _h("o_cust") % max(n_cust - n_cust // 3, 1)
    orders = spark.range(n_ord).select(
        (F.col("id") + 1).alias("o_orderkey"),
        (_cj + F.floor(_cj / 2) + 1).alias("o_custkey"),
        _pick("o_status", STATUSES).alias("o_orderstatus"),
        _m("o_total", 1000.0, 500000.0).alias("o_totalprice"),
        # spec range starts 1992-01-01 (O_ORDERDATE uniform
        # [STARTDATE, ENDDATE-151]); the embedded Q4/Q5 texts window on
        # calendar-1994 orders — a 1995+ start makes them vacuous
        _date("o_date", "1992-01-01", 2400).alias("o_orderdate"),
        _pick("o_prio", PRIORITIES).alias("o_orderpriority"),
        F.lit(0).cast("int").alias("o_shippriority"),  # spec: constant 0
        # ~1.5% carry the Q13 exclusion pattern '%special%requests%'
        F.when(
            _h("o_cmt") % 66 == 0,
            F.concat(F.lit("special packages requests "), _h("o_cmtx") % 100),
        )
        .otherwise(F.concat(F.lit("quick final deposits "), _h("o_cmtx") % 100))
        .alias("o_comment"),
    )
    # spec 4.2.3: a lineitem's supplier is one of its part's FOUR
    # partsupp suppliers (l_suppkey FK into partsupp, not independent) —
    # without this, Q2/Q9/Q20-style lineitem⋈partsupp correlations are
    # vacuously empty because random (l_partkey, l_suppkey) pairs never
    # hit a partsupp row.
    lineitem = spark.range(n_li).select(
        (_h("l_order") % n_ord + 1).alias("l_orderkey"),
        (_h("l_part") % n_part + 1).alias("l_partkey"),
        _ps_suppkey(_h("l_part") % n_part, _h("l_supp") % 4).alias("l_suppkey"),
        (_h("l_line") % 7 + 1).cast("int").alias("l_linenumber"),
        _rate((_h("l_qty") % 50 + 1).cast("double")).alias("l_quantity"),
        _m("l_price", 900.0, 100000.0).alias("l_extendedprice"),
        _rate((_h("l_disc") % 11) / 100.0).alias("l_discount"),
        _rate((_h("l_tax") % 9) / 100.0).alias("l_tax"),
        _pick("l_rflag", RETURNFLAGS).alias("l_returnflag"),
        _pick("l_lstatus", ["F", "O"]).alias("l_linestatus"),
        # spec range [1992-01-02, ~1998-11]: the embedded Q20 text
        # windows on calendar-1994 shipments — a 1995+ start would
        # make its correlated sum NULL everywhere (vacuous query)
        _date("l_ship", "1992-01-02", 2500).alias("l_shipdate"),
        # spec: commitdate = orderdate + [30,90], receiptdate =
        # shipdate + [1,30]; anchored to shipdate here (lineitems are
        # hash-generated, not per-order) so Q4's l_commitdate <
        # l_receiptdate and Q21's l_receiptdate > l_commitdate select
        # realistic ~half/~quarter slices
        F.date_add(
            _date("l_ship", "1992-01-02", 2500), (_h("l_cmit") % 61 - 30).cast("int")
        ).cast("timestamp").alias("l_commitdate"),
        F.date_add(
            _date("l_ship", "1992-01-02", 2500), (_h("l_rcpt") % 30 + 1).cast("int")
        ).cast("timestamp").alias("l_receiptdate"),
        _pick("l_smode", SHIPMODES).alias("l_shipmode"),
        _pick("l_sinst", SHIPINSTRUCTS).alias("l_shipinstruct"),
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
        "partsupp": partsupp,
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
    money: str = "double",
    fmt: str = "parquet",
) -> list[str]:
    """Write the generated tables.

    layout="flat": ``{dir}/{table}.parquet`` (driver-corpus shape);
    layout="db":   ``{dir}/tables/dft/tpch/{table}/`` (reference's
                   directory-database shape, src/tpch.rs:87-96).
    money="decimal": spec DECIMAL(12,2) money columns (see gen_tables).
    fmt="vortex" (args.rs:232-234 TpchFormat::Vortex analog): each
    table through the driver-side vortex writer — flat layout only,
    gated on the vortex-data package like every vortex entry point.
    """
    if fmt == "vortex" and layout != "flat":
        raise ValueError("fmt='vortex' supports the flat layout only")
    written = []
    for name, df in gen_tables(spark, scale_factor, money=money).items():
        if fmt == "vortex":
            from ..sources.io import write_any

            os.makedirs(output_dir, exist_ok=True)
            path = os.path.join(output_dir, f"{name}.vortex")
            write_any(df, path, "vortex")
        elif layout == "db":
            path = os.path.join(output_dir, "tables", "dft", "tpch", name)
            df.write.mode("overwrite").parquet(path)
        else:
            path = os.path.join(output_dir, f"{name}.parquet")
            df.coalesce(1).write.mode("overwrite").parquet(path)
        written.append(path)
    return written
