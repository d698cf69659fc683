"""Custom stateful streaming operator: gap-based sessionization via
``applyInPandasWithState``.

This is the (b)-tier custom-operator path from the round brief: the
semantics (emit a session row when a >30-min gap closes it) aren't
expressible as a built-in streaming aggregate, so per-user state holds
the open session; a later event past the gap closes and emits it.
NoTimeout is deliberate: a processing-time timeout would keep an
Available-Now drain spinning empty micro-batches for the full 30-min
wall-clock gap before it could flush idle users — unbounded in a
finite test run. Open sessions therefore stay in state at end of
input (exactly one per active user), which the tests account for.

Scale: state is one small row per active user (two longs + a count);
the stream shuffles once on user_id (the groupBy key) and the binary
payload of events never enters state.

Ordering contract: events may arrive unordered WITHIN a micro-batch
(we sort per user per batch) but micro-batches must be non-decreasing
in event time — i.e. the source files are time-range partitioned AND
land in event-time order (the parquet file source processes files in
modification-time order), the natural layout of ingested event logs.
Fully out-of-order sources would need watermark-driven buffering in
state (not implemented).
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_GAP_SECONDS = 1800

OUTPUT_SCHEMA = (
    "user_id bigint, session_start timestamp, session_end timestamp, "
    "n_events bigint"
)
STATE_SCHEMA = "start_s bigint, last_s bigint, n_events bigint"


def _sessionize_user(
    key: tuple[Any, ...],
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.exists:
        start_s, last_s, n = state.get
    else:
        start_s = last_s = n = None

    closed: list[tuple[int, int, int]] = []
    for pdf in pdfs:
        if len(pdf) == 0:
            continue
        pdf = pdf.sort_values(["ts", "event_id"])
        for ts in pdf["ts"]:
            s = int(ts.timestamp())
            if start_s is None:
                start_s, last_s, n = s, s, 1
            elif s - last_s > SESSION_GAP_SECONDS:
                closed.append((start_s, last_s, n))
                start_s, last_s, n = s, s, 1
            else:
                last_s, n = s, n + 1
    if start_s is not None:
        state.update((start_s, last_s, n))
    yield _emit(user_id, closed)


def _emit(user_id, sessions: list[tuple[int, int, int]]) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "user_id": [user_id] * len(sessions),
            "session_start": [pd.Timestamp(s, unit="s") for s, _, _ in sessions],
            "session_end": [pd.Timestamp(e, unit="s") for _, e, _ in sessions],
            "n_events": [n for _, _, n in sessions],
        }
    )


def sessionize_stream(events: DataFrame) -> DataFrame:
    """Streaming DF of events -> streaming DF of CLOSED sessions.
    Sessions still open when input is exhausted stay in state — a
    finite drain therefore sees every session except each user's last
    open one, which the test accounts for against the batch oracle."""
    return events.groupBy("user_id").applyInPandasWithState(
        _sessionize_user,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
