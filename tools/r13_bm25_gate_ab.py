"""Same-session interleaved A/B of the bm25 postings reuse shape.

A = plain pin (current tree): postings = _pin(postings); four consumers
    of a cold scoring plan materialize it concurrently.
B = pin + vocab-key gate: postings = _pin(postings).repartition("wh") —
    AQE stage reuse materializes the pin exactly once per action.

Flipped by monkeypatching search._pin for side B (the gate composes on
top of whatever _pin returns), so both sides run the REAL bm25_topk
bench leg in one session. bench.time_query methodology; row identity
asserted first.

Usage: python tools/r13_bm25_gate_ab.py [--reps=N]
"""

from __future__ import annotations

import json
import os
import statistics
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from r13_explain_dump import bench_query_map  # noqa: E402

import bench  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from mapping_timeseries_spark.operators import search  # noqa: E402
from mapping_timeseries_spark.operators.dedup import dedup_cache_scope  # noqa: E402
from mapping_timeseries_spark.session import get_spark  # noqa: E402

_ORIG_PIN = search._pin


def _gated_pin(df):
    pinned = _ORIG_PIN(df)
    if "wh" in df.columns and "tf" in df.columns:  # the postings frame
        return pinned.repartition(F.col("wh"))
    return pinned


def main() -> None:
    reps = 4
    for a in sys.argv[1:]:
        if a.startswith("--reps="):
            reps = int(a.split("=", 1)[1])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        "r13_bm25_gate_ab",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
        extra_conf={"spark.driver.memory": "16g"},
    )
    fn = bench_query_map()["bm25_topk"]

    def run_side(side: str, n: int) -> list[float]:
        search._pin = _gated_pin if side == "B" else _ORIG_PIN
        try:
            with dedup_cache_scope():
                return bench.time_query(spark, fn, sf_dir, n)
        finally:
            search._pin = _ORIG_PIN

    rows = {}
    for side in "AB":
        search._pin = _gated_pin if side == "B" else _ORIG_PIN
        with dedup_cache_scope():
            rows[side] = sorted(map(str, fn(spark, sf_dir).collect()))
        search._pin = _ORIG_PIN
        spark.catalog.clearCache()
    assert rows["A"] == rows["B"], "gate changed bm25 results!"

    out = {"rows_identical": True}
    reps_by = {"A": [], "B": []}
    for _ in range(2):
        for side in "AB":
            reps_by[side] += run_side(side, reps)
    for side in "AB":
        r = reps_by[side]
        out[f"{side}_reps"] = [round(x, 3) for x in r]
        out[f"{side}_median"] = round(statistics.median(r[1:]), 3)
        out[f"{side}_min"] = round(min(r[1:]), 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
