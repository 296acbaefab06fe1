"""Same-process A/B of session-conf variants over selected bench legs.

Usage:
  python tools/r13_ab.py '{"spark.foo":"true"}' leg1 leg2 ... [--reps=N]

Runs each leg with bench.time_query (noop sink, cache cleared between
reps) under (A) the baseline session conf and (B) baseline + overrides,
in ONE process with two interleaved passes (A,B,A,B per leg) so box
drift hits both sides equally. Confs are set via spark.conf.set before
each side and restored after; only runtime-settable SQL confs work here.

Prints one JSON line: per-leg A/B medians and the ratio.
"""

from __future__ import annotations

import json
import os
import statistics
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from r13_explain_dump import bench_query_map  # noqa: E402

import bench  # noqa: E402
from mapping_timeseries_spark.session import get_spark  # noqa: E402


def main() -> None:
    overrides = json.loads(sys.argv[1])
    legs = [a for a in sys.argv[2:] if not a.startswith("--")]
    reps = 4
    for a in sys.argv[2:]:
        if a.startswith("--reps="):
            reps = int(a.split("=", 1)[1])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        "r13_ab",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
        extra_conf={"spark.driver.memory": "16g"},
    )
    qs = bench_query_map()
    from mapping_timeseries_spark.operators.dedup import dedup_cache_scope

    baseline = {}
    for k in overrides:
        try:
            baseline[k] = spark.conf.get(k)
        except Exception:
            baseline[k] = None

    def run_side(name: str, side: str) -> list[float]:
        confs = overrides if side == "B" else baseline
        for k, v in confs.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
        with dedup_cache_scope():
            return bench.time_query(
                spark, qs[name], sf_dir, reps,
                build_timed=name in bench.DRIVER_LEGS,
            )

    out = {"overrides": overrides, "reps": reps, "legs": {}}
    for name in legs:
        if name not in qs:
            print(f"unknown leg {name}", file=sys.stderr)
            continue
        # interleave: warm A, warm B discarded inside each side's reps
        # via the median (first rep carries codegen); run A then B then
        # A then B and pool, so slow drift cancels
        ra = run_side(name, "A")
        rb = run_side(name, "B")
        ra += run_side(name, "A")
        rb += run_side(name, "B")
        ma = statistics.median(ra[1:])
        mb = statistics.median(rb[1:])
        # min estimator: on a box with EXTERNAL bursty contention
        # (observed loadavg 14 with zero in-container CPU users), noise
        # on a fixed deterministic workload is strictly additive, so the
        # min over interleaved reps estimates the uncontended time and
        # converges much faster than the median (same argument as
        # bench.shuffle_calibration's shuffle_loop_min_sec)
        na, nb = min(ra[1:]), min(rb[1:])
        out["legs"][name] = {
            "A_reps": [round(x, 3) for x in ra],
            "B_reps": [round(x, 3) for x in rb],
            "A_median": round(ma, 3),
            "B_median": round(mb, 3),
            "A_min": round(na, 3),
            "B_min": round(nb, 3),
            "B_over_A_median": round(mb / ma, 3) if ma > 0 else None,
            "B_over_A_min": round(nb / na, 3) if na > 0 else None,
        }
        print(
            f"{name}: A={ma:.3f}/{na:.3f} B={mb:.3f}/{nb:.3f} "
            f"ratio(min)={nb / na:.3f}",
            file=sys.stderr,
        )
    for k, v in baseline.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
