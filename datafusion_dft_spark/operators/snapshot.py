"""Snapshot diff: audit an incremental corpus update.

Training corpora update in snapshots (new crawl, re-extraction,
takedown pass); the first question every downstream consumer asks is
"what changed?" — which documents were added, removed, or re-extracted
with different content. That drives incremental dedup (only added/
changed rows need probing — the streaming-dedup and incremental-LSH
paths in this repo), cache invalidation, and takedown verification.

Shape at scale: both snapshots project to (key, fingerprint) — a
narrow md5 per row — then ONE full-outer equi-join on the key (both
sides shuffle-partitioned by the same key, so at 100 TB this is the
canonical co-partitioned sort-merge join; bucketed tables make it
exchange-free) classifies every key:

- ``added``   — key only in the new snapshot
- ``removed`` — key only in the old snapshot
- ``changed`` — both, fingerprints differ
- unchanged rows are dropped before anything downstream touches them
  (the overwhelming majority in a real update — the diff's output is
  bounded by the churn, not the corpus).

Fingerprints are md5 of the content column(s), engine-portable like
every other fingerprint in the repo, so the whole diff replays in
DuckDB (oracle arm of ``dedup_exact``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def snapshot_diff(
    old: DataFrame, new: DataFrame, key: str, content: str
) -> DataFrame:
    """``(key, status, old_fp, new_fp)`` for every key whose content
    changed between snapshots; ``status`` ∈ added/removed/changed.
    Unchanged keys are filtered out (churn-bounded output).

    Presence is carried as explicit flags from each side, NOT inferred
    from fingerprint NULL-ness: ``md5(NULL content)`` is itself NULL,
    so a NULL-content row present in both snapshots must classify by
    the flags (null-safe fingerprint comparison — NULL↔NULL content is
    unchanged, NULL↔text is changed) rather than masquerade as an
    add/remove (r11 ADVICE)."""
    # 16-byte BINARY digests cross the join exchange; the hex strings
    # are derived after (guide §2.3, narrower types): unhex(md5(x)) is
    # injective on md5 output, so the null-safe changed/unchanged
    # classification is identical, and lower(hex(...)) reproduces the
    # md5 hex string exactly (NULL content → NULL digest → NULL fp,
    # classified by the presence flags as before).
    a = old.select(
        F.col(key),
        F.lit(True).alias("_in_old"),
        F.unhex(F.md5(F.col(content).cast("string"))).alias("_old_h"),
    )
    b = new.select(
        F.col(key),
        F.lit(True).alias("_in_new"),
        F.unhex(F.md5(F.col(content).cast("string"))).alias("_new_h"),
    )
    joined = a.join(b, key, "full_outer")
    status = (
        F.when(F.col("_in_old").isNull(), F.lit("added"))
        .when(F.col("_in_new").isNull(), F.lit("removed"))
        .when(~F.col("_old_h").eqNullSafe(F.col("_new_h")), F.lit("changed"))
    )
    return (
        joined.withColumn("status", status)
        .filter(F.col("status").isNotNull())
        .select(
            key,
            "status",
            F.lower(F.hex("_old_h")).alias("old_fp"),
            F.lower(F.hex("_new_h")).alias("new_fp"),
        )
    )
