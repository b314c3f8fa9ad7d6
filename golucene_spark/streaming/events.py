"""Streaming analytics over event streams: watermarked windowed
aggregation and custom stateful sessionization.

The reference has no streaming (SURVEY §2.5); these are the
Spark-native operators a large-scale event pipeline needs on top of
the batch shapes already oracle-paired in the gate
(events_windowed_agg / events_sessionize):

- ``windowed_counts_stream``: tumbling-window count/sum with a
  watermark — late events beyond the watermark are dropped, windows
  are emitted once finalized (append mode).
- ``sessionize_stream``: gap-based sessions per user via
  ``applyInPandasWithState`` — the custom stateful operator path;
  state = (session_start, last_ts, n_events), a session closes when a
  later event arrives past the gap or the state times out.

Both take a STREAMING DataFrame (readStream) and return a streaming
DataFrame; batch parity is asserted in tests against the same
aggregation run with the batch API (gate oracle twin semantics).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_SCHEMA = (
    "user_id long, session_start timestamp, session_end timestamp, n_events long"
)
_STATE_SCHEMA = "start long, last long, n long"


def windowed_counts_stream(
    events: DataFrame,
    window: str = "15 minutes",
    watermark: str = "30 minutes",
    ts_col: str = "ts",
    keys: tuple = ("event_type",),
    value_col: str = "value",
) -> DataFrame:
    """Tumbling-window aggregation with late-data handling: events more
    than ``watermark`` behind the max seen ``ts`` are dropped; in
    append output mode a window row is emitted exactly once, when the
    watermark passes its end."""
    w = F.window(ts_col, window)
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(w.alias("w"), *keys)
        .agg(
            F.count("*").alias("n"),
            F.sum(value_col).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("win_start"),
            F.col("w.end").alias("win_end"),
            *keys,
            "n",
            "sum_value",
        )
    )


def _session_fn(gap_seconds: int, timeout_seconds: int | None):
    def fn(key, pdfs, state: GroupState):
        (user_id,) = key
        out = []
        if state.hasTimedOut:
            start, last, n = state.get
            state.remove()
            out.append((user_id, start, last, n))
        else:
            rows = pd.concat(list(pdfs), ignore_index=True)
            ts = sorted(int(t.value // 10**9) for t in pd.to_datetime(rows["ts"]))
            if state.exists:
                start, last, n = state.get
            else:
                start, last, n = ts[0], ts[0], 0
                ts = ts  # first event counted in the loop below
            for t in ts:
                if t - last > gap_seconds:
                    out.append((user_id, start, last, n))
                    start, n = t, 0
                last = max(last, t)
                n += 1
            state.update((start, last, n))
            if timeout_seconds is not None:
                state.setTimeoutDuration(timeout_seconds * 1000)
        if out:
            yield pd.DataFrame(
                {
                    "user_id": [o[0] for o in out],
                    "session_start": pd.to_datetime([o[1] for o in out], unit="s"),
                    "session_end": pd.to_datetime([o[2] for o in out], unit="s"),
                    "n_events": [o[3] for o in out],
                }
            )

    return fn


def sessionize_stream(
    events: DataFrame,
    gap_seconds: int = 1800,
    ts_col: str = "ts",
    user_col: str = "user_id",
    timeout_seconds: int | None = None,
) -> DataFrame:
    """Gap-based sessionization as a custom stateful streaming operator
    (applyInPandasWithState).  Emits a row per CLOSED session (a later
    event arrived past the gap); open sessions stay in state.  Pass
    ``timeout_seconds`` to also flush idle sessions on processing-time
    timeout (note: timeouts keep the trigger loop busy between batches,
    so leave it off when driving tests with processAllAvailable)."""
    src = events.select(F.col(user_col).alias("user_id"), F.col(ts_col).alias("ts"))
    timeout = (
        GroupStateTimeout.NoTimeout
        if timeout_seconds is None
        else GroupStateTimeout.ProcessingTimeTimeout
    )
    return src.groupBy("user_id").applyInPandasWithState(
        _session_fn(gap_seconds, timeout_seconds),
        SESSION_SCHEMA,
        _STATE_SCHEMA,
        "append",
        timeout,
    )
