"""Event-time windowing and sessionization (SURVEY §2.10 north-star ops).

The reference is batch-only; these are the standard event-stream operators
its ``events`` fixture calls for: tumbling/sliding aggregation, native
session windows, gap-based batch sessionization, deterministic dedup, and
JSON payload extraction. Every function here works on a BATCH DataFrame;
the same transformations applied to a streaming DataFrame live in
streaming/windows.py (they share these builders — batch/stream parity by
construction).

Scale notes
-----------
Tumbling/sliding aggs are hash aggregations keyed by (window, group) —
map-side partial agg + one shuffle, no per-key state beyond the aggregate
buffer. Sessionization shuffles once on user_id; session assembly is a
window cumsum (no applyInPandas state needed in batch).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "tumbling_agg",
    "sliding_agg",
    "session_agg_native",
    "sessionize_batch",
    "dedup_events",
    "parse_props",
]

_TS_FMT = "yyyy-MM-dd HH:mm:ss"


def tumbling_agg(events: DataFrame, duration: str = "1 hour") -> DataFrame:
    """Tumbling event-time window aggregation: per (window, event_type)
    count + value sum."""
    return (
        events.groupBy(F.window("ts", duration).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("sum_value"))
        .select(
            F.date_format("w.start", _TS_FMT).alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def sliding_agg(
    events: DataFrame, duration: str = "1 hour", slide: str = "30 minutes"
) -> DataFrame:
    """Sliding (hopping) window aggregation — each event lands in
    duration/slide windows."""
    return (
        events.groupBy(F.window("ts", duration, slide).alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("sum_value"))
        .select(
            F.date_format("w.start", _TS_FMT).alias("window_start"),
            "n_events",
            "sum_value",
        )
    )


def session_agg_native(events: DataFrame, gap: str = "10 minutes") -> DataFrame:
    """Native session windows (``session_window``): per-user sessions closed
    after ``gap`` of inactivity. Works in batch and streaming."""
    return (
        events.groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("sum_value"))
        .select(
            "user_id",
            F.date_format("w.start", _TS_FMT).alias("session_start"),
            "n_events",
            "sum_value",
        )
    )


def sessionize_batch(
    events: DataFrame, gap_minutes: int = 10, formatted: bool = True
) -> DataFrame:
    """Gap-based sessionization via lag + cumulative sum (the classic batch
    formulation; SURVEY §2.10): a session breaks where the gap to the
    previous event exceeds the threshold.

    Returns one row per session: user_id, session_id (1-based per user),
    session_start, session_end, n_events, sum_value. Semantically equal to
    :func:`session_agg_native` up to session_window's end-exclusive bound.

    ``formatted=False`` keeps session_start/session_end as RAW timestamps
    (full microsecond precision) instead of second-truncated strings —
    required when the bounds feed containment logic (interval_join
    attribution: a second-truncated end excludes the session's own last
    event if it carries sub-second precision).
    """
    w_user = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = gap_minutes * 60 * 1_000_000
    prev_ts = F.lag("ts").over(w_user)
    # microsecond precision, and >= to match session_window's end-exclusive
    # bound (an event exactly `gap` after the previous starts a new session)
    is_new = (
        prev_ts.isNull()
        | ((F.unix_micros("ts") - F.unix_micros(prev_ts)) >= gap_us)
    ).cast("bigint")
    with_session = events.withColumn(
        "session_id",
        F.sum(is_new).over(
            w_user.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    start = F.min("ts")
    end = F.max("ts")
    if formatted:
        start = F.date_format(start, _TS_FMT)
        end = F.date_format(end, _TS_FMT)
    return with_session.groupBy("user_id", "session_id").agg(
        start.alias("session_start"),
        end.alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
        F.sum("value").alias("sum_value"),
    )


def dedup_events(events: DataFrame) -> DataFrame:
    """Deterministic dedup: first event per (user_id, event_type) by
    (ts, event_id). ``dropDuplicates`` keeps an arbitrary row; this is the
    order-stable variant an oracle can check. The streaming twin
    (watermarked dropDuplicates) is in streaming/windows.py."""
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    return (
        events.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )


def parse_props(events: DataFrame) -> DataFrame:
    """JSON payload extraction from the ``props`` string column
    (get_json_object — the engine's JSON scalar surface)."""
    return events.select(
        "event_id",
        "user_id",
        "event_type",
        F.get_json_object("props", "$.k").cast("int").alias("prop_k"),
    )
