from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mapping_timeseries_spark.operators.sessionize import sessionize_batch
from mapping_timeseries_spark.sources.readers import read_table
from mapping_timeseries_spark.streaming.stateful import stream_sessionize_stateful

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events_batch(spark):
    return read_table(spark, SF_DIR, "events").cache()


def test_stateful_sessionizer_matches_batch(spark, events_batch, tmp_path_factory):
    # stage the events into 3 time-ordered files so availableNow processes
    # several microbatches: the watermark advances between batches, firing
    # EventTimeTimeout for sessions whose gap has passed
    d = tmp_path_factory.mktemp("stateful_events")
    df = events_batch.orderBy("ts")
    total = df.count()
    pdf = df.toPandas()
    for i in range(3):
        chunk = pdf.iloc[i * total // 3 : (i + 1) * total // 3]
        chunk.to_parquet(str(d / f"part-{i}.parquet"), index=False)

    raw_schema = spark.read.parquet(str(d)).schema
    stream = (
        spark.readStream.schema(raw_schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d))
    )
    from mapping_timeseries_spark.sources.readers import normalize_ts

    stream = normalize_ts(stream, "ts")  # writer-dependent raw ts type
    sessions = stream_sessionize_stateful(stream, gap_minutes=10)
    q = (
        sessions.writeStream.format("memory")
        .queryName("t_stateful")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r["user_id"], r["session_start"].strftime("%Y-%m-%d %H:%M:%S"), r["n_events"])
        for r in spark.table("t_stateful").collect()
    }

    want_all = {
        (r["user_id"], r["session_start"], r["n_events"])
        for r in sessionize_batch(events_batch, gap_minutes=10).collect()
    }
    # closed streaming sessions must be a subset of batch sessions, exact
    # on (user, start, count); open-tail sessions are legitimately missing
    assert got, "some sessions must have closed across microbatches"
    assert got <= want_all
    # and most sessions should have closed (tail is one open session/user)
    assert len(got) >= len(want_all) * 0.5, (len(got), len(want_all))


def test_stateful_sessionizer_merges_late_within_watermark_event(
    spark, tmp_path_factory
):
    """The cross-batch disorder case the single-open-session state got
    wrong: batch 1 shows a gap (10:00, 10:20), batch 2 delivers a LATE
    but within-watermark event at 10:05. Correct gap-sessionization of
    the full event set is [10:00-10:05] n=2 and [10:20] n=1; the old
    operator had already emitted [10:00] n=1 mid-batch and then dragged
    the open session's `last` backwards to 10:05."""
    import pandas as pd

    d = tmp_path_factory.mktemp("late_events")
    base = pd.Timestamp("2024-01-01 10:00:00")

    def mk(name, minutes):
        pd.DataFrame(
            {
                "user_id": [1] * len(minutes),
                "ts": [base + pd.Timedelta(minutes=m) for m in minutes],
                "value": [1.0] * len(minutes),
            }
        ).to_parquet(str(d / name), index=False)

    mk("part-0.parquet", [0, 20])     # gap appears inside batch 1
    mk("part-1.parquet", [5, 90])     # late infill + watermark push
    mk("part-2.parquet", [150])       # fire remaining timers

    raw_schema = spark.read.parquet(str(d)).schema
    stream = (
        spark.readStream.schema(raw_schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d))
    )
    from mapping_timeseries_spark.sources.readers import normalize_ts

    stream = normalize_ts(stream, "ts")
    sessions = stream_sessionize_stateful(stream, gap_minutes=10)
    q = (
        sessions.writeStream.format("memory")
        .queryName("t_stateful_late")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = sorted(
        (
            r["session_start"].strftime("%H:%M"),
            r["session_end"].strftime("%H:%M"),
            r["n_events"],
        )
        for r in spark.table("t_stateful_late").collect()
    )
    # the late 10:05 must merge into the 10:00 session, the 10:20
    # session must stay separate, and 10:30/11:30 close as the
    # watermark passes; no inverted intervals, no n=1 phantom for 10:00
    assert ("10:00", "10:05", 2) in got
    assert ("10:20", "10:20", 1) in got
    assert all(s <= e for s, e, _ in got)
