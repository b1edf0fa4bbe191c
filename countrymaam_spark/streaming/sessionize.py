"""Custom stateful streaming operator: per-user sessionization with
``applyInPandasWithState``.

The batch form (driver query ``events_sessionize``) is a lag + running-sum
window; a stream cannot window over its whole history, so state carries
(last event time, sessions so far, events so far) per user across
micro-batches. With drops arriving in event-time order the final update per
user equals the batch result exactly (tests/test_streaming.py asserts it).

Within a micro-batch the engine hands the group's rows UNSORTED — the
handler sorts by (ts, event_id) before merging with state, so output is a
pure function of the row multiset, independent of partitioning.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = "user_id long, n_sessions long, n_events long"
STATE_SCHEMA = "last_s long, sessions long, events long"
GAP_S = 1800


def _sessionize_group(key, pdfs, state: GroupState):
    rows = pd.concat(list(pdfs), ignore_index=True)
    rows = rows.sort_values(["ts", "event_id"], kind="stable")
    ts_s = (rows["ts"].astype("int64") // 1_000_000_000).to_numpy()
    if state.exists:
        last_s, sessions, events = state.get
    else:
        last_s, sessions, events = -(10**15), 0, 0
    for t in ts_s:
        if t - last_s > GAP_S:
            sessions += 1
        last_s = int(t)
        events += 1
    state.update((last_s, sessions, events))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_sessions": [sessions], "n_events": [events]}
    )


def sessionize_stream(events_stream: DataFrame) -> DataFrame:
    """events(ts timestamp, user_id, event_id, ...) -> per-user running
    (n_sessions, n_events), one update row per user per micro-batch."""
    return (
        events_stream.select("user_id", "ts", "event_id")
        .groupBy("user_id")
        .applyInPandasWithState(
            _sessionize_group,
            OUT_SCHEMA,
            STATE_SCHEMA,
            "update",
            GroupStateTimeout.NoTimeout,
        )
    )
