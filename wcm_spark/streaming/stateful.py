"""Custom stateful streaming operator: applyInPandasWithState sessionization.

The engine's crawl loop is iterative batch (SURVEY §3.4), but the
training-data side wants streaming session windows with custom state —
the operator Spark lacks natively for arbitrary session logic. This is
the ``applyInPandasWithState`` pattern: per-user GroupState holds the
open session (session_no, start, end, count); a >gap event closes and
emits it. Closed-session output matches the batch sessionization query
(datapipe/queries.py::sessionization) row-for-row — pinned by
tests/test_plans_streaming.py — so the streaming and batch paths share
one semantic definition.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
    TimestampType,
)

__all__ = ["sessionize_stream", "SESSION_OUTPUT_SCHEMA"]

SESSION_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_no", LongType()),
        StructField("n_events", LongType()),
        StructField("session_start", TimestampType()),
        StructField("session_end", TimestampType()),
    ]
)

_STATE_SCHEMA = StructType(
    [
        StructField("session_no", LongType()),
        StructField("start_us", LongType()),
        StructField("end_us", LongType()),
        StructField("n_events", LongType()),
    ]
)


def sessionize_stream(events: DataFrame, gap_sec: int = 1800, flush_ms: int = 60_000) -> DataFrame:
    """Streaming session windows over (user_id, ts, event_id) with custom
    per-user state. Emits CLOSED sessions (append mode); the open tail
    session lives in GroupState across micro-batches and flushes on
    processing-time timeout."""
    gap_us = gap_sec * 1_000_000

    def fold(key, pdfs, state: GroupState):
        (user_id,) = key
        if state.hasTimedOut:
            if state.exists:
                no, start_us, end_us, n = state.get
                state.remove()
                yield pd.DataFrame(
                    {
                        "user_id": [user_id],
                        "session_no": [no],
                        "n_events": [n],
                        "session_start": [pd.Timestamp(start_us, unit="us")],
                        "session_end": [pd.Timestamp(end_us, unit="us")],
                    }
                )
            return

        if state.exists:
            no, start_us, end_us, n = state.get
        else:
            no, start_us, end_us, n = 0, None, None, 0

        closed = []
        for pdf in pdfs:
            pdf = pdf.sort_values(["ts", "event_id"])
            for ts in pdf["ts"]:
                t_us = int(pd.Timestamp(ts).value // 1000)
                if start_us is None:
                    no, start_us, end_us, n = no + 1, t_us, t_us, 1
                elif t_us - end_us > gap_us:
                    closed.append((user_id, no, n, start_us, end_us))
                    no, start_us, end_us, n = no + 1, t_us, t_us, 1
                else:
                    end_us = t_us
                    n += 1

        state.update((no, start_us, end_us, n))
        state.setTimeoutDuration(flush_ms)
        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [c[0] for c in closed],
                    "session_no": [c[1] for c in closed],
                    "n_events": [c[2] for c in closed],
                    "session_start": [pd.Timestamp(c[3], unit="us") for c in closed],
                    "session_end": [pd.Timestamp(c[4], unit="us") for c in closed],
                }
            )

    return (
        events.select("user_id", "ts", "event_id")
        .groupBy("user_id")
        .applyInPandasWithState(
            fold,
            outputStructType=SESSION_OUTPUT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )
