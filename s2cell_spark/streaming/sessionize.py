"""Sessionization — gap-based session windows, batch and streaming.

The canonical training-data grouping (user browse sessions, conversation
turns, device activity bursts): consecutive events of a key belong to one
session while the gap between them stays under ``gap``; a quiet period
closes the session.

* **Batch**: :func:`user_sessions` uses Spark's NATIVE
  ``F.session_window`` — whole-stage-codegen'd gap-merge aggregation, no
  Python. The DuckDB oracle re-derives sessions relationally (lag +
  gap-flag + running sum = classic islands-and-gaps), so the native
  operator is value-checked end-to-end.
* **Streaming**: :func:`streaming_sessions` is the custom stateful form
  via ``applyInPandasWithState`` with an EVENT-TIME timeout: per-key
  state holds the open session (start, last_ts, count); events extend or
  roll it; the watermark passing last_ts + gap fires the timeout and
  emits the CLOSED session exactly once. This is the
  state-with-deadline pattern ``session_window`` aggregation cannot
  express when the per-session payload is custom (here: count + span;
  in production: token budgets, dedup digests, per-session sketches).

State at scale: one small record per key with an OPEN session; closed
sessions leave the store immediately (timeout removal). Shuffles once on
the key per micro-batch — the same partitioning any keyed aggregate pays.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
    TimestampType,
)

SESSION_OUT = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start", TimestampType()),
        StructField("session_end", TimestampType()),
        StructField("n_events", LongType()),
    ]
)
# open-session state: (start_us, last_us, n) as int64 epoch-micros
_SESSION_STATE = StructType(
    [
        StructField("start_us", LongType()),
        StructField("last_us", LongType()),
        StructField("n", LongType()),
    ]
)


def user_sessions(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """(user_id, session_start, session_end, n_events) per gap-session —
    batch, fully native (``F.session_window``). ``session_end`` is the
    LAST EVENT's timestamp (not Spark's end+gap convention), so the batch
    and streaming forms agree row-for-row."""
    return (
        events.groupBy(
            F.col("user_id"), F.session_window(F.col("ts"), gap).alias("w")
        )
        .agg(F.count("*").alias("n_events"), F.max("ts").alias("session_end"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            "session_end",
            F.col("n_events").cast("long").alias("n_events"),
        )
    )


def streaming_sessions(
    events_stream: DataFrame,
    gap_seconds: int = 1800,
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming gap-sessionization with exactly-once CLOSED-session
    emission. Equivalent to :func:`user_sessions` over the union of all
    micro-batches, for every session the watermark has closed (tested
    streaming==batch)."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap_us = int(gap_seconds) * 1_000_000

    def sessionize(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            start_us, last_us, n = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "session_start": [pd.Timestamp(start_us, unit="us")],
                    "session_end": [pd.Timestamp(last_us, unit="us")],
                    "n_events": [n],
                }
            )
            return
        rows = pd.concat(list(pdfs), ignore_index=True)
        if rows.empty:
            return
        ts_us = rows["ts"].astype("datetime64[us]").astype("int64").sort_values()
        out = []
        if state.exists:
            start_us, last_us, n = state.get
        else:
            start_us, last_us, n = int(ts_us.iloc[0]), int(ts_us.iloc[0]) - 1, 0
        # break at diff >= gap, matching native session_window exactly: a
        # session's window is [start, last+gap), so an event landing AT
        # last+gap starts a new session
        for t in ts_us:
            t = int(t)
            if t - last_us >= gap_us and n > 0:
                out.append((start_us, last_us, n))
                start_us, n = t, 0
            # within-watermark out-of-order event may still predate the
            # open session's start; extend backwards rather than misdate
            start_us = min(start_us, t)
            last_us = max(last_us, t)
            n += 1
        state.update((start_us, last_us, n))
        # the still-open tail session times out once the event-time
        # watermark passes last_ts + gap
        state.setTimeoutTimestamp(last_us // 1000 + gap_us // 1000)
        if out:
            yield pd.DataFrame(
                {
                    "user_id": [key[0]] * len(out),
                    "session_start": [pd.Timestamp(s, unit="us") for s, _, _ in out],
                    "session_end": [pd.Timestamp(e, unit="us") for _, e, _ in out],
                    "n_events": [n_ for _, _, n_ in out],
                }
            )

    keyed = events_stream.select("user_id", "ts").withWatermark("ts", watermark)
    return keyed.groupBy("user_id").applyInPandasWithState(
        sessionize,
        outputStructType=SESSION_OUT,
        stateStructType=_SESSION_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
