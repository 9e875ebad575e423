"""Custom stateful streaming operators via ``applyInPandasWithState``.

The reference's WindowView keeps per-window partial aggregate state and
fires on watermark, with ALLOWED_LATENESS holding state open for late
rows (/root/reference/src/Storages/WindowView/StorageWindowView.h:28-33,
74-95; WatermarkTransform at src/Processors/Transforms/
WatermarkTransform.cpp). Structured Streaming's built-in windowed aggs
cover the declarative cases (streaming/windows.py); this module is the
arbitrary-stateful escape hatch — the Spark analogue of writing a
custom WindowView aggregation:

- :func:`stateful_counts` — per-key running counts with a TTL, the
  minimal custom-state shape (state survives micro-batches, expires on
  event-time timeout like a fired window).
- :func:`sessionize` — custom session assembly with explicit gap
  logic, the shape funnels/sequenceMatch take when they must run
  continuously instead of over collected arrays.

Scale: state lives in the state store partitioned by key — the same
sharded-by-key layout the reference uses for window state; skew in the
key domain is the thing to watch, exactly as for any groupBy.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import functions as F


COUNTS_SCHEMA = "user_id bigint, n_events bigint, last_seen timestamp"
COUNTS_STATE_SCHEMA = "n bigint, last_us bigint"


def _counts_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Accumulate per-user event counts; event-time-style TTL via
    processing-time timeout (state drops like a fired window)."""
    if state.hasTimedOut:
        state.remove()
        return
    n, last_us = state.get if state.exists else (0, 0)
    for pdf in pdfs:
        n += len(pdf)
        if len(pdf):
            last_us = max(last_us, int(pdf["ts"].astype("int64").max() // 1000))
    state.update((n, last_us))
    state.setTimeoutDuration(60 * 60 * 1000)  # 1h idle -> fire/expire
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "last_seen": [pd.Timestamp(last_us, unit="us")],
        }
    )


def stateful_counts(events: DataFrame) -> DataFrame:
    """Running per-user counts over a stream of events(ts, user_id).

    Output mode: update (one row per key per micro-batch touched)."""
    return (
        events.select("user_id", F.col("ts").cast("timestamp").alias("ts"))
        .groupBy("user_id")
        .applyInPandasWithState(
            _counts_fn,
            outputStructType=COUNTS_SCHEMA,
            stateStructType=COUNTS_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )


SESSION_SCHEMA = "user_id bigint, session_start timestamp, session_end timestamp, n_events bigint"
SESSION_STATE_SCHEMA = "start_us bigint, end_us bigint, n bigint"
_GAP_US = 30 * 60 * 1_000_000


def _sessionize_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Assemble sessions with a 30-min gap; emits CLOSED sessions only
    (append semantics, like a WindowView firing on watermark)."""
    if state.hasTimedOut:
        if state.exists:
            start_us, end_us, n = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "session_start": [pd.Timestamp(start_us, unit="us")],
                    "session_end": [pd.Timestamp(end_us, unit="us")],
                    "n_events": [n],
                }
            )
        return
    ts_us: list[int] = []
    for pdf in pdfs:
        ts_us.extend(int(v) // 1000 for v in pdf["ts"].astype("int64"))
    ts_us.sort()
    start_us, end_us, n = state.get if state.exists else (None, None, 0)
    closed: list[tuple[int, int, int]] = []
    for t in ts_us:
        if start_us is None:
            start_us, end_us, n = t, t, 1
        elif t - end_us >= _GAP_US:
            closed.append((start_us, end_us, n))
            start_us, end_us, n = t, t, 1
        else:
            end_us, n = t, n + 1
    state.update((start_us, end_us, n))
    state.setTimeoutDuration(30 * 60 * 1000)
    if closed:
        yield pd.DataFrame(
            {
                "user_id": [key[0]] * len(closed),
                "session_start": [pd.Timestamp(s, unit="us") for s, _, _ in closed],
                "session_end": [pd.Timestamp(e, unit="us") for _, e, _ in closed],
                "n_events": [c for _, _, c in closed],
            }
        )


def sessionize(events: DataFrame) -> DataFrame:
    """Continuous sessionization of events(ts, user_id); 30-min gap."""
    return (
        events.select("user_id", F.col("ts").cast("timestamp").alias("ts"))
        .groupBy("user_id")
        .applyInPandasWithState(
            _sessionize_fn,
            outputStructType=SESSION_SCHEMA,
            stateStructType=SESSION_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )
