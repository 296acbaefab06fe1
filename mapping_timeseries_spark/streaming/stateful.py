"""Custom stateful streaming: gap-based sessionization with
``applyInPandasWithState`` (SURVEY §2.10 north-star: custom stateful
operators beyond the built-in windows).

``session_window`` already covers plain gap sessions; this operator exists
for session shapes the built-ins can't express (running aggregates beyond
sum/count, custom close conditions) and as the template for arbitrary
per-key streaming state. State per user: (session_start, last_ts,
n_events, sum_value); a session closes — and emits exactly one row — when
the event-time watermark passes last_ts + gap (EventTimeTimeout), so state
is watermark-bounded exactly like the built-in operators.

API choice: Spark 4's successor API (``transformWithStateInPandas`` —
composite state, timers, TTL) was evaluated against the same design, but
its driver-side runner requires protobuf, which this runtime does not
provide (measured: STREAMING_PYTHON_RUNNER_INITIALIZATION_FAILURE,
ImportError google.protobuf). ``applyInPandasWithState`` has no such
dependency and expresses this operator fully, so it is the portable
choice.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

__all__ = ["stream_sessionize_stateful"]

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start", TimestampType()),
        StructField("session_end", TimestampType()),
        StructField("n_events", IntegerType()),
        StructField("sum_value", DoubleType()),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("session_start", LongType()),   # epoch micros
        StructField("last_ts", LongType()),
        StructField("n_events", IntegerType()),
        StructField("sum_value", DoubleType()),
    ]
)


def _to_micros(ts: pd.Timestamp) -> int:
    return int(ts.value // 1000)


def stream_sessionize_stateful(
    events: DataFrame,
    gap_minutes: int = 10,
    watermark: str = "30 minutes",
) -> DataFrame:
    """Per-user sessions via arbitrary streaming state.

    Emits one row per CLOSED session (append semantics); sessions still
    open when the stream ends are never emitted — standard
    streaming-session behavior. Events are assumed unique per user+ts.
    """
    gap_us = gap_minutes * 60 * 1_000_000

    def fn(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterable[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            start, last, n, total = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [user_id],
                    "session_start": [pd.Timestamp(start * 1000)],
                    "session_end": [pd.Timestamp(last * 1000)],
                    "n_events": [n],
                    "sum_value": [total],
                }
            )
            return

        rows = pd.concat(list(pdfs)).sort_values("ts")
        closed: list[tuple[int, int, int, float]] = []
        if state.exists:
            start, last, n, total = state.get
        else:
            start = last = None
            n, total = 0, 0.0

        for ts, value in zip(rows["ts"], rows["value"]):
            tus = _to_micros(ts)
            if start is None:
                start, last, n, total = tus, tus, 1, float(value)
            elif tus - last >= gap_us:
                closed.append((start, last, n, total))
                start, last, n, total = tus, tus, 1, float(value)
            else:
                last = tus
                n += 1
                total += float(value)

        state.update((start, last, n, total))
        # wake up when the watermark passes the session gap
        state.setTimeoutTimestamp((last + gap_us) // 1000)

        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [user_id] * len(closed),
                    "session_start": [pd.Timestamp(s * 1000) for s, *_ in closed],
                    "session_end": [pd.Timestamp(e * 1000) for _, e, *_ in closed],
                    "n_events": [c for *_, c, _ in closed],
                    "sum_value": [v for *_, v in closed],
                }
            )

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
