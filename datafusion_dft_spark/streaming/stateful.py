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


FUNNEL_OUTPUT = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("stage", T.IntegerType()),
        # monotone per-user event count: identifies the FINAL emission
        # in an update-mode sink (stage itself is NOT monotone — a
        # late, earlier-timestamped view can demote a user)
        T.StructField("n_seen", T.LongType()),
    ]
)

# First-touch epoch-micros per stage; 0 = not seen (events are
# post-1970 by contract, and 0 keeps the state tuple non-nullable).
FUNNEL_STATE = T.StructType(
    [
        T.StructField("t_signup", T.LongType()),
        T.StructField("t_view", T.LongType()),
        T.StructField("t_click", T.LongType()),
        T.StructField("t_purchase", T.LongType()),
        T.StructField("n_seen", T.LongType()),
    ]
)

_FUNNEL_TYPES = ("signup", "view", "click", "purchase")


def _funnel_stage(t: tuple) -> int:
    ts, tv, tc, tp = t
    stage = 0
    if ts:
        stage = 1
        if tv and ts <= tv:
            stage = 2
            if tc and tv <= tc:
                stage = 3
                if tp and tc <= tp:
                    stage = 4
    return stage


def _update_funnel(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    prev = list(state.get) if state.exists else [0, 0, 0, 0, 0]
    mins, n_seen = prev[:4], prev[4]
    for pdf in pdfs:
        n_seen += len(pdf)
        for i, et in enumerate(_FUNNEL_TYPES):
            sub = pdf.loc[pdf["event_type"] == et, "ts"]
            if len(sub):
                t = int(sub.astype("int64").min() // 1000)
                mins[i] = t if mins[i] == 0 else min(mins[i], t)
    state.update((*mins, n_seen))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "stage": [_funnel_stage(tuple(mins))],
            "n_seen": [n_seen],
        }
    )


def funnel_stages(events: DataFrame) -> DataFrame:
    """Streaming twin of the batch ordered funnel (queries/events.py
    'seq' arm): per-user FIRST-TOUCH timestamps per stage held in
    managed state, the user's current prefix stage re-emitted whenever
    a micro-batch advances it. Keeping MINIMA makes the operator
    ARRIVAL-ORDER INSENSITIVE — late or out-of-order events can only
    lower a first-touch time, so the state converges to exactly the
    batch first-touch relation and the final per-user stage equals the
    batch computation (asserted stream==batch in tests). Same scale
    shape as user_profiles: state partitioned by user, each
    micro-batch touches only the users it contains."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update_funnel,
        outputStructType=FUNNEL_OUTPUT,
        stateStructType=FUNNEL_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
