"""Custom stateful streaming: gap-based sessionization with
``applyInPandasWithState`` (SURVEY §2.10 north-star: custom stateful
operators beyond the built-in windows).

``session_window`` already covers plain gap sessions; this operator exists
for session shapes the built-ins can't express (running aggregates beyond
sum/count, custom close conditions) and as the template for arbitrary
per-key streaming state. State per user: a LIST of open sessions
(start, last, n, sum) — see STATE_SCHEMA's note for why a single open
session is not enough; a session closes — and emits exactly one row —
when the event-time watermark passes its last + gap (EventTimeTimeout),
so state is watermark-bounded exactly like the built-in operators.

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
    ArrayType,
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

#: State is a LIST of open sessions per user (parallel arrays), not a
#: single (start, last): closing a session the moment a gap appears
#: INSIDE one micro-batch would finalize before the watermark passes,
#: and a later within-watermark event falling into that gap would land
#: in the wrong session (or, arriving out of order, drag `last`
#: backwards). Multiple candidate sessions therefore stay open
#: simultaneously until EventTimeTimeout retires each one.
STATE_SCHEMA = StructType(
    [
        StructField("starts", ArrayType(LongType())),   # epoch micros
        StructField("lasts", ArrayType(LongType())),
        StructField("ns", ArrayType(IntegerType())),
        StructField("totals", ArrayType(DoubleType())),
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

    Emits one row per CLOSED session (append semantics): a session is
    closed only when the event-time watermark passes ``last + gap`` —
    the same finalization rule as the built-in ``session_window`` — so
    out-of-order events admitted by the watermark merge into (or
    bridge) the correct open session instead of corrupting an
    already-emitted one. Sessions still open when the stream ends are
    never emitted — standard streaming-session behavior. Events are
    assumed unique per user+ts.
    """
    gap_us = gap_minutes * 60 * 1_000_000

    def load(state: GroupState):
        if state.exists:
            starts, lasts, ns, totals = state.get
            return list(starts), list(lasts), list(ns), list(totals)
        return [], [], [], []

    def emit_df(user_id, sessions):
        return pd.DataFrame(
            {
                "user_id": [user_id] * len(sessions),
                "session_start": [pd.Timestamp(s * 1000) for s, _, _, _ in sessions],
                "session_end": [pd.Timestamp(e * 1000) for _, e, _, _ in sessions],
                "n_events": [n for _, _, n, _ in sessions],
                "sum_value": [v for _, _, _, v in sessions],
            }
        )

    def arm_timeout(state: GroupState, lasts):
        # earliest close among open sessions; must be strictly past the
        # current watermark or Spark rejects the timestamp
        wm_ms = state.getCurrentWatermarkMs()
        close_ms = (min(lasts) + gap_us) // 1000
        state.setTimeoutTimestamp(max(close_ms, wm_ms + 1))

    def fn(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterable[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            starts, lasts, ns, totals = load(state)
            wm_ms = state.getCurrentWatermarkMs()
            ripe = [
                i for i in range(len(starts))
                if (lasts[i] + gap_us) // 1000 <= wm_ms
            ]
            keep = [i for i in range(len(starts)) if i not in set(ripe)]
            if ripe:
                yield emit_df(
                    user_id,
                    sorted(
                        (starts[i], lasts[i], ns[i], totals[i]) for i in ripe
                    ),
                )
            if keep:
                starts = [starts[i] for i in keep]
                lasts = [lasts[i] for i in keep]
                ns = [ns[i] for i in keep]
                totals = [totals[i] for i in keep]
                state.update((starts, lasts, ns, totals))
                arm_timeout(state, lasts)
            else:
                state.remove()
            return

        starts, lasts, ns, totals = load(state)
        rows = pd.concat(list(pdfs))
        for ts, value in zip(rows["ts"], rows["value"]):
            tus = _to_micros(ts)
            # sessions this event attaches to: within gap of the
            # interval on either side (it may BRIDGE two sessions)
            hit = [
                i for i in range(len(starts))
                if tus > starts[i] - gap_us and tus < lasts[i] + gap_us
            ]
            if not hit:
                starts.append(tus)
                lasts.append(tus)
                ns.append(1)
                totals.append(float(value))
                continue
            merged = (
                min(min(starts[i] for i in hit), tus),
                max(max(lasts[i] for i in hit), tus),
                sum(ns[i] for i in hit) + 1,
                sum(totals[i] for i in hit) + float(value),
            )
            for i in sorted(hit, reverse=True):
                del starts[i], lasts[i], ns[i], totals[i]
            starts.append(merged[0])
            lasts.append(merged[1])
            ns.append(merged[2])
            totals.append(merged[3])

        state.update((starts, lasts, ns, totals))
        arm_timeout(state, lasts)
        return

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
