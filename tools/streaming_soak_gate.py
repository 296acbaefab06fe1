"""Sustained-load soak gate for the stateful streaming half (r10).

The stream==batch pytest pins prove the streaming operators compute the
right answers on finite inputs; none of them proves the 100 TB-relevant
RUNTIME claims — that the stateful sessionizer keeps up with a
continuous source, and that its state PLATEAUS under watermark eviction
instead of leaking (a leaking state store kills a production stream no
matter how correct its batches are). This gate runs
``streaming.stateful.stream_sessionize_stateful`` — the
applyInPandasWithState path, the engine's heaviest streaming machinery —
against a rate source for SOAK_WALL_S seconds and records the
per-trigger progress series.

Workload shape: ``rowsPerSecond`` events; event time is the rate
source's timestamp accelerated ``SPEEDUP``x (watermarks operate on
event time, so synthetic acceleration compresses hours of session
lifecycle into a minutes-long soak without touching the operator).
``user_id`` rotates between two cohorts of ``COHORT`` users every
``COHORT_FLIP_EVENT_S`` event-seconds: while cohort B is active,
cohort A's sessions age past the gap, the advancing watermark fires
their EventTimeTimeout, and their state is EVICTED — so closed
sessions stream out continuously and total state is bounded by the
active cohorts, which is exactly the plateau the gate checks.

Checks (recorded per entry in the artifact):
- keepup: median triggerExecution wall over the steady region stays
  under the trigger interval — the stream is not accumulating backlog;
- state_plateau: max state rows over the last third of the soak is
  within PLATEAU_TOL of the max over the middle third, AND the final
  state rows stay under an absolute ceiling of a few cohorts — state
  is evicted as fast as it is admitted (no leak);
- emits: closed sessions actually streamed out (eviction emits, not
  just deletes);
- clean: the query raised no exception and processed > 0 rows.

Writes artifacts/streaming_soak_gate.json.
Usage: python tools/streaming_soak_gate.py [out.json]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

ROWS_PER_SEC = 50_000
SOAK_WALL_S = 180
TRIGGER_S = 5
SPEEDUP = 10          # event time runs 10x wall time
COHORT = 2_000        # users per cohort (two cohorts alternate)
COHORT_FLIP_EVENT_S = 300   # flip active cohort every 5 event-minutes
GAP_MINUTES = 2       # session gap (event time)
WATERMARK = "1 minutes"     # event-time watermark
PLATEAU_TOL = 1.6     # last-third state max <= tol * middle-third max
STATE_CEILING = 6 * COHORT  # absolute leak backstop


def evaluate_checks(
    series: list[dict],
    emitted: int,
    exception: str | None,
    trigger_s: int = TRIGGER_S,
    cohort: int = COHORT,
    plateau_tol: float = PLATEAU_TOL,
    state_ceiling: int = STATE_CEILING,
) -> tuple[dict, dict]:
    """The gate's pass/fail arithmetic, separated from the live stream so
    pytest can pin it (same contract as bench.py's gate helpers): returns
    (checks, metrics). Steady region drops the first third (startup and
    the first closure wave); the plateau check compares the middle and
    final thirds' state maxima and applies the absolute leak backstop."""
    n = len(series)
    steady = series[n // 3 :]
    mid = series[n // 3 : 2 * n // 3]
    last = series[2 * n // 3 :]
    # Degenerate-run guard (ADVICE r10 #1): a stream that dies before
    # any progress entry (or whose trigger_ms is all-None) must produce
    # a FAILING artifact, not a StatisticsError/ValueError traceback
    # with no artifact at all.
    trigger_vals = [
        s["trigger_ms"] for s in steady if s["trigger_ms"] is not None
    ]
    if not trigger_vals or not mid or not last:
        checks = {
            "keepup": False,
            "state_plateau": False,
            "emits": False,
            "evicts": False,
            "clean": False,
        }
        metrics = {
            "note": "no progress recorded: stream died before the steady "
            "region or every trigger_ms was None",
            "progress_entries": n,
            "closed_sessions_emitted": emitted,
            "exception": exception,
        }
        return checks, metrics
    med_trigger_ms = statistics.median(trigger_vals)
    mid_state = max(s["state_rows"] or 0 for s in mid)
    last_state = max(s["state_rows"] or 0 for s in last)
    total_removed = sum(s["state_removed"] or 0 for s in series)
    removed_known = any(s["state_removed"] is not None for s in series)
    checks = {
        "keepup": med_trigger_ms < trigger_s * 1000,
        "state_plateau": last_state <= plateau_tol * max(mid_state, 1)
        and last_state <= state_ceiling,
        "emits": emitted > 2 * cohort,
        # numRowsRemoved is version-dependent in the progress payload;
        # when absent, eviction is still proven by plateau + emits
        "evicts": (not removed_known) or total_removed > 2 * cohort,
        "clean": exception is None
        and sum(s["input_rows"] or 0 for s in series) > 0,
    }
    metrics = {
        "median_trigger_ms_steady": med_trigger_ms,
        "state_rows_mid_third_max": mid_state,
        "state_rows_last_third_max": last_state,
        "state_rows_removed_total": total_removed,
        "closed_sessions_emitted": emitted,
    }
    return checks, metrics


def main() -> int:
    out_json = (
        sys.argv[1]
        if len(sys.argv) > 1
        else os.path.join(REPO, "artifacts", "streaming_soak_gate.json")
    )
    from pyspark.sql import functions as F

    from bench import box_calibration
    from mapping_timeseries_spark.session import get_spark
    from mapping_timeseries_spark.streaming.stateful import (
        stream_sessionize_stateful,
    )

    spark = get_spark(
        "streaming-soak-gate",
        master="local[32]",
        shuffle_partitions=16,
        extra_conf={"spark.driver.memory": "16g"},
    )
    spark.range(1000).selectExpr("sum(id)").collect()
    pre = box_calibration()

    rate = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", ROWS_PER_SEC)
        .option("numPartitions", 8)
        .load()
    )
    # accelerate event time SPEEDUP-x around the launch instant:
    # intervals (gaps, lateness) scale by SPEEDUP while absolute event
    # times stay near the present — scaling raw epoch micros would park
    # them in year ~2530, past pandas' int64-ns Timestamp ceiling the
    # state function converts through. The cohort then rotates on the
    # accelerated clock.
    base_us = int(time.time() * 1_000_000)
    ev_us = F.lit(base_us) + (
        F.unix_micros(F.col("timestamp")) - F.lit(base_us)
    ) * F.lit(SPEEDUP)
    events = rate.select(
        F.timestamp_micros(ev_us).alias("ts"),
        F.col("value"),
    ).select(
        (
            (F.col("value") % COHORT)
            + F.lit(COHORT)
            * ((F.unix_seconds(F.col("ts")) / COHORT_FLIP_EVENT_S).cast("long") % 2)
        ).alias("user_id"),
        "ts",
        (F.col("value") % 100).cast("double").alias("value"),
    )
    sessions = stream_sessionize_stateful(
        events, gap_minutes=GAP_MINUTES, watermark=WATERMARK
    )
    q = (
        sessions.writeStream.format("memory")
        .queryName("soak_sessions")
        .outputMode("append")
        .trigger(processingTime=f"{TRIGGER_S} seconds")
        .start()
    )

    series = []
    t_start = time.monotonic()
    seen_batches = set()
    while time.monotonic() - t_start < SOAK_WALL_S:
        time.sleep(2.0)
        p = q.lastProgress
        if not p or p["batchId"] in seen_batches:
            continue
        seen_batches.add(p["batchId"])
        st = (p.get("stateOperators") or [{}])[0]
        series.append(
            {
                "wall_s": round(time.monotonic() - t_start, 1),
                "batch_id": p["batchId"],
                "input_rows": p.get("numInputRows"),
                "input_rps": round(p.get("inputRowsPerSecond") or 0.0, 1),
                "processed_rps": round(
                    p.get("processedRowsPerSecond") or 0.0, 1
                ),
                "trigger_ms": (p.get("durationMs") or {}).get(
                    "triggerExecution"
                ),
                "state_rows": st.get("numRowsTotal"),
                "state_removed": st.get("numRowsRemoved"),
            }
        )
    exc = q.exception()
    emitted = spark.table("soak_sessions").count()
    q.stop()

    checks, metrics = evaluate_checks(
        series, emitted, str(exc) if exc else None
    )
    out = {
        "config": {
            "rows_per_sec": ROWS_PER_SEC,
            "soak_wall_s": SOAK_WALL_S,
            "trigger_s": TRIGGER_S,
            "event_time_speedup": SPEEDUP,
            "cohort_users": COHORT,
            "cohort_flip_event_s": COHORT_FLIP_EVENT_S,
            "gap_minutes": GAP_MINUTES,
            "watermark": WATERMARK,
            "plateau_tol": PLATEAU_TOL,
            "state_ceiling_rows": STATE_CEILING,
        },
        "checks": checks,
        **metrics,
        "exception": str(exc) if exc else None,
        "progress_series": series,
        "all_green": all(checks.values()),
        "box_calibration": {"pre": pre, "post": box_calibration()},
    }
    with open(out_json, "w") as f:
        json.dump(out, f, indent=1)
    print(
        json.dumps({k: v for k, v in out.items() if k != "progress_series"})
    )
    print(f"wrote {out_json} all_green={out['all_green']}")
    spark.stop()
    return 0 if out["all_green"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
