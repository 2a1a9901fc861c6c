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
decomposition as ``operators/packing.py`` (shared machinery in
``operators/_prefix.py``):

1. The first ``bucket_hex`` hex chars of the hash split the order into
   ``16**bucket_hex`` contiguous, order-aligned buckets (fixed-width
   lowercase hex means lexicographic order == numeric order, so
   bucket-major order IS hash order).
2. A tiny aggregation counts rows per bucket; the exclusive prefix sum
   gives each bucket's starting position.
3. One shuffle: ``row_number`` within each bucket (ordered by the
   full hash, ties broken by the key) plus a dense bucket-offsets
   array literal (one plan node at any bucket count — see
   ``operators/_prefix.py``).

At 100 TB: one data shuffle across near-uniform buckets (md5
equidistributes, so no salting needed — unlike ordered prefix sums
over ids), driver state ``16**bucket_hex`` longs. Size ``bucket_hex``
to the cluster: the per-bucket window sort is single-task, so buckets
must outnumber cores and fit executor spill budgets — 2 (256 buckets)
suits the test host, 3–4 (4k/65k buckets) a large cluster. Every step
is engine-portable (md5 + integer arithmetic), so the full position
assignment is differentially verifiable against a plain SQL
``row_number`` oracle (``queries/sampling.py::sampling_suite``,
``tests/test_ordering.py``).

Beyond-reference surface for the training-pipeline mandate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ._prefix import bucket_prefix


def shuffle_hash(key: str, seed: int):
    """The ordering hash: md5 of the key's string form + the seed."""
    return F.md5(F.concat(F.col(key).cast("string"), F.lit(f"#{seed}")))


def _shuffle_with_total(
    df: DataFrame,
    key: str,
    seed: int,
    pos_col: str,
    bucket_hex: int,
) -> tuple[DataFrame, int]:
    """(shuffled df, total row count) — the count rides the prefix pass
    so callers that need it (shard export) pay no extra job."""
    if not 1 <= bucket_hex <= 4:
        raise ValueError(f"bucket_hex must be in [1, 4], got {bucket_hex}")
    h = shuffle_hash(key, seed)
    bucket = F.conv(F.substring(h, 1, bucket_hex), 16, 10).cast("int")

    pmap, total = bucket_prefix(
        df, bucket, F.col(key), key, "deterministic_shuffle"
    )
    if pmap is None:
        return df.withColumn(pos_col, F.lit(0).cast("long")), 0

    w = Window.partitionBy("_shuf_bucket").orderBy(F.col("_shuf_h"), F.col(key))
    out = (
        df.withColumn("_shuf_h", h)
        .withColumn("_shuf_bucket", bucket)
        .withColumn(
            pos_col,
            (
                F.element_at(pmap, F.col("_shuf_bucket") + F.lit(1))
                + F.row_number().over(w)
                - 1
            ).cast("long"),
        )
        .drop("_shuf_h", "_shuf_bucket")
    )
    return out, total


def deterministic_shuffle(
    df: DataFrame,
    key: str,
    seed: int = 0,
    pos_col: str = "shuffle_pos",
    bucket_hex: int = 2,
) -> DataFrame:
    """Add each row's 0-based position in the seeded content-hash order.

    Reproducible across runs, engines, and input partitioning; a new
    ``seed`` yields an unrelated order. ``key`` values must be unique
    and non-NULL (they tie-break hash collisions; violations raise).
    Eagerly runs one ``16**bucket_hex``-row aggregation; the returned
    plan has a single data shuffle. ``bucket_hex`` sizes the
    parallelism of that shuffle (see module docstring) without
    changing the result — positions are bucket-count-invariant.
    """
    out, _ = _shuffle_with_total(df, key, seed, pos_col, bucket_hex)
    return out


def write_training_shards(
    df: DataFrame,
    path: str,
    key: str,
    seed: int = 0,
    shard_rows: int = 10000,
    bucket_hex: int = 2,
) -> int:
    """Export the corpus as deterministic, order-carrying parquet shards.

    The final step of a training-data pipeline: rows land in
    ``shard=K`` directories of exactly ``shard_rows`` rows (last shard
    short), where shard K holds global shuffle positions
    ``[K*shard_rows, (K+1)*shard_rows)`` — so reading shards in
    ascending NUMERIC shard value and rows in ``shuffle_pos`` order
    replays the exact seeded training order on any engine (DuckDB
    replay asserted in tests), resumable mid-epoch at any shard
    boundary. (Lexicographic directory listing puts ``shard=10``
    before ``shard=2`` — order by the shard value, not the listing.) Writes are
    distributed (each shard is written by the executor holding it —
    one repartition on the shard id, no driver collect). Returns the
    shard count, derived from the prefix pass's row total — the input
    plan executes exactly twice (the guarded counts pass + the write),
    never a third time. Expensive upstream pipelines should be
    persisted first so the two passes agree and don't recompute
    (``queries/pipeline.py::export_clean_corpus`` does).
    """
    if shard_rows < 1:
        raise ValueError(f"shard_rows must be >= 1, got {shard_rows}")
    shuffled, total = _shuffle_with_total(
        df, key, seed, "shuffle_pos", bucket_hex
    )
    sharded = shuffled.withColumn(
        "shard", F.expr(f"shuffle_pos div {shard_rows}L").cast("long")
    )
    (
        # sort key must lead with the partition column: the dynamic-
        # partition writer requires [shard] ordering and would insert
        # its own non-stable sort (discarding a bare shuffle_pos sort);
        # with the (shard, shuffle_pos) prefix one sort survives and
        # files come out genuinely position-ordered
        sharded.repartition("shard")
        .sortWithinPartitions("shard", "shuffle_pos")
        .write.partitionBy("shard")
        .mode("overwrite")
        .parquet(path)
    )
    return -(-total // shard_rows) if total else 0


def shuffle_oracle_sql(key: str, seed: int, table: str = "documents") -> str:
    """DuckDB-equivalent single-stream definition, for differentials."""
    return (
        f"SELECT *, CAST(row_number() OVER ("
        f"ORDER BY md5(CAST({key} AS VARCHAR) || '#{seed}'), {key}"
        f") - 1 AS BIGINT) AS shuffle_pos FROM {table}"
    )
