"""Measure the bench probes' SESSION spread on one boot (r13, VERDICT
r12 #8 evidence): N fresh Spark sessions in sequence, each taking one
``shuffle_calibration`` (7 reps → median + min + rep spread) and one
``jvm_calibration`` reading, on an otherwise idle box. The artifact
records every reading plus the cross-session spread of each estimator,
so the SCALE.md reading rule ("use the min estimator for drift
attribution") carries its own measurement.

Usage: python tools/probe_spread.py [n_sessions] [out.json]
"""

from __future__ import annotations

import json
import os
import statistics
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def spread(vals: list[float]) -> float:
    """(max-min)/min — the honest worst-case session disagreement."""
    return round((max(vals) - min(vals)) / min(vals), 3)


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    out_json = (
        sys.argv[2]
        if len(sys.argv) > 2
        else os.path.join(REPO, "artifacts", "probe_spread.json")
    )
    import bench
    from mapping_timeseries_spark.session import get_spark

    readings = []
    for i in range(n):
        spark = get_spark(
            f"probe-spread-{i}", master="local[32]", shuffle_partitions=32
        )
        # the bench's own warmup shape: one tiny action before probing
        spark.range(1000).selectExpr("sum(id)").collect()
        r = dict(bench.shuffle_calibration(spark))
        r["jvm_loop_sec"] = bench.jvm_calibration(spark)
        r["py_loop_sec"] = bench.box_calibration()["py_loop_sec"]
        readings.append(r)
        print(f"session {i}: {json.dumps(r)}", flush=True)
        spark.stop()
    med = [r["shuffle_loop_sec"] for r in readings]
    mn = [r["shuffle_loop_min_sec"] for r in readings]
    jvm = [r["jvm_loop_sec"] for r in readings]
    out = {
        "boot_id": open("/proc/sys/kernel/random/boot_id").read().strip(),
        "n_sessions": n,
        "readings": readings,
        "session_spread": {
            "shuffle_median": spread(med),
            "shuffle_min": spread(mn),
            "jvm": spread(jvm),
        },
        "medians": {
            "shuffle_median": round(statistics.median(med), 4),
            "shuffle_min": round(statistics.median(mn), 4),
            "jvm": round(statistics.median(jvm), 4),
        },
    }
    os.makedirs(os.path.dirname(out_json), exist_ok=True)
    with open(out_json, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {out_json}: spreads {out['session_spread']}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
