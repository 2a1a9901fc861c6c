"""Custom stateful streaming operator via applyInPandasWithState.

Beyond-reference (the reference has no streaming): the escape hatch for
streaming semantics Spark's built-in operators can't express — here a
per-user running profile (event count, value sum, last-seen timestamp)
maintained across micro-batches in managed state.

State is partitioned by the group key, so it scales horizontally; each
micro-batch touches only the groups present in that batch. Arrow
batches carry the rows (same transport as the batch mapInPandas path).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
        T.StructField("last_seen_us", T.LongType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
        T.StructField("last_seen_us", T.LongType()),
    ]
)


def _update_profile(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    n, total, last = state.get if state.exists else (0, 0.0, 0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
        if len(pdf):
            last = max(last, int(pdf["ts"].astype("int64").max() // 1000))
    state.update((n, float(total), int(last)))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "total_value": [round(total, 2)],
            "last_seen_us": [last],
        }
    )


def user_profiles(events: DataFrame) -> DataFrame:
    """Per-user running profile, updated incrementally per micro-batch."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update_profile,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
