"""Deterministic global shuffle for training-data pipelines.

Training runs need the corpus in a SHUFFLED but REPRODUCIBLE order:
re-running the pipeline (or resuming a failed run) must produce the
same example order, and changing the seed must produce an unrelated
one. Seed-based ``df.orderBy(rand(seed))`` is partitioning-dependent
and irreproducible across engines; the auditable formulation orders by
a content hash of ``(key, seed)`` instead — the same trick the
deterministic samplers use (``operators/sampling.py``), applied to
ordering.

Assigning the 0-based global POSITION of each row in that order is a
distributed rank. A naive ``row_number() OVER (ORDER BY hash)``
collapses to a single task; this module uses the same two-pass
decomposition as ``operators/packing.py``:

1. The first hex byte of the hash splits the order into 256
   contiguous, order-aligned buckets (fixed-width lowercase hex means
   lexicographic order == numeric order, so bucket-major order IS hash
   order).
2. A tiny aggregation counts rows per bucket (<=256 rows to the
   driver); the exclusive prefix sum gives each bucket's starting
   position.
3. One shuffle: ``row_number`` within each bucket (ordered by the
   full hash, ties broken by the key) plus the literal bucket-offset
   map.

At 100 TB: one data shuffle across 256 near-uniform buckets (md5
equidistributes, so no salting needed — unlike ordered prefix sums
over ids), driver state 256 longs. Every step is engine-portable
(md5 + integer arithmetic), so the full position assignment is
differentially verifiable against a plain SQL ``row_number`` oracle
(``queries/sampling.py::sampling_suite``, ``tests/test_ordering.py``).

Beyond-reference surface for the training-pipeline mandate.
"""

from __future__ import annotations

from itertools import chain

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def shuffle_hash(key: str, seed: int):
    """The ordering hash: md5 of the key's string form + the seed."""
    return F.md5(F.concat(F.col(key).cast("string"), F.lit(f"#{seed}")))


def deterministic_shuffle(
    df: DataFrame, key: str, seed: int = 0, pos_col: str = "shuffle_pos"
) -> DataFrame:
    """Add each row's 0-based position in the seeded content-hash order.

    Reproducible across runs, engines, and input partitioning; a new
    ``seed`` yields an unrelated order. ``key`` values must be unique
    (they tie-break hash collisions). Eagerly runs one 256-row
    aggregation; the returned plan has a single data shuffle.
    """
    h = shuffle_hash(key, seed)
    bucket = F.conv(F.substring(h, 1, 2), 16, 10).cast("int")

    # Duplicate keys would make the tie-break nondeterministic (two
    # rows with identical (hash, key) order arbitrarily) — guard inside
    # the counts job we already run; a duplicate key always shares a
    # hash and therefore a bucket.
    rows = df.groupBy(bucket.alias("b")).agg(
        F.count(F.lit(1)).alias("n"), F.count_distinct(F.col(key)).alias("d")
    ).collect()
    dup_buckets = [
        "NULL" if r["b"] is None else int(r["b"])
        for r in rows
        if r["n"] != r["d"]
    ]
    if dup_buckets:
        raise ValueError(
            f"deterministic_shuffle requires unique, non-NULL {key!r} values; "
            f"duplicate/NULL values found in bucket(s) {dup_buckets[:5]}"
        )
    counts = {int(r["b"]): int(r["n"]) for r in rows}
    prefix: dict[int, int] = {}
    acc = 0
    for b in sorted(counts):
        prefix[b] = acc
        acc += counts[b]
    if not prefix:
        return df.withColumn(pos_col, F.lit(0).cast("long"))
    pmap = F.create_map(
        *chain.from_iterable((F.lit(b), F.lit(off)) for b, off in prefix.items())
    )

    w = Window.partitionBy("_shuf_bucket").orderBy(F.col("_shuf_h"), F.col(key))
    return (
        df.withColumn("_shuf_h", h)
        .withColumn("_shuf_bucket", bucket)
        .withColumn(
            pos_col,
            (
                F.element_at(pmap, F.col("_shuf_bucket"))
                + F.row_number().over(w)
                - 1
            ).cast("long"),
        )
        .drop("_shuf_h", "_shuf_bucket")
    )


def write_training_shards(
    df: DataFrame,
    path: str,
    key: str,
    seed: int = 0,
    shard_rows: int = 10000,
) -> int:
    """Export the corpus as deterministic, order-carrying parquet shards.

    The final step of a training-data pipeline: rows land in
    ``shard=K`` directories of exactly ``shard_rows`` rows (last shard
    short), where shard K holds global shuffle positions
    ``[K*shard_rows, (K+1)*shard_rows)`` — so reading shards in
    directory order and rows in ``shuffle_pos`` order replays the
    exact seeded training order on any engine, resumable mid-epoch at
    any shard boundary. Writes are distributed (each shard is written
    by the executor holding it — one repartition on the shard id, no
    driver collect). Returns the shard count.
    """
    if shard_rows < 1:
        raise ValueError(f"shard_rows must be >= 1, got {shard_rows}")
    shuffled = deterministic_shuffle(df, key, seed=seed)
    sharded = shuffled.withColumn(
        "shard", F.expr(f"shuffle_pos div {shard_rows}L").cast("long")
    )
    (
        sharded.repartition("shard")
        .sortWithinPartitions("shuffle_pos")
        .write.partitionBy("shard")
        .mode("overwrite")
        .parquet(path)
    )
    n = sharded.agg(F.max("shard")).first()[0]
    return 0 if n is None else int(n) + 1


def shuffle_oracle_sql(key: str, seed: int, table: str = "documents") -> str:
    """DuckDB-equivalent single-stream definition, for differentials."""
    return (
        f"SELECT *, CAST(row_number() OVER ("
        f"ORDER BY md5(CAST({key} AS VARCHAR) || '#{seed}'), {key}"
        f") - 1 AS BIGINT) AS shuffle_pos FROM {table}"
    )
