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
