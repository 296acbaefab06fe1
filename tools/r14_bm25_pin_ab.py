"""Same-session interleaved A/B: bm25 postings pin+gate vs GATE-ONLY
(VERDICT r13 #4: `postings = _pin(postings).repartition(wh)` is the
pin+exchange combo the r13 mapping-leg matrix measured as
worst-of-both; the pin is plausibly redundant now that the exchange is
the reuse point — and at scale it holds vocabulary×doc rows in executor
memory for nothing if so).

A = current tree: _pin(postings).repartition(wh)
B = gate-only:    postings.repartition(wh)   (no persist)

Flipped by monkeypatching search._pin to identity for side B — the
repartition stays in both shapes, so the ONLY difference is the cache.
Row identity asserted first; bench.time_query methodology (noop sink,
cache cleared between reps); interleaved A/B/A/B blocks so host drift
lands on both sides.

Usage: python tools/r14_bm25_pin_ab.py [--reps=N] [--blocks=M]
"""

from __future__ import annotations

import json
import os
import statistics
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from r13_explain_dump import bench_query_map  # noqa: E402

import bench  # noqa: E402

from mapping_timeseries_spark.operators import search  # noqa: E402
from mapping_timeseries_spark.operators.dedup import dedup_cache_scope  # noqa: E402
from mapping_timeseries_spark.session import get_spark  # noqa: E402

_ORIG_PIN = search._pin


def _identity_pin(df):
    return df


def main() -> None:
    reps, blocks = 4, 2
    for a in sys.argv[1:]:
        if a.startswith("--reps="):
            reps = int(a.split("=", 1)[1])
        if a.startswith("--blocks="):
            blocks = int(a.split("=", 1)[1])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        "r14_bm25_pin_ab",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
        extra_conf={"spark.driver.memory": "16g"},
    )
    fn = bench_query_map()["bm25_topk"]

    def run_side(side: str, n: int) -> list[float]:
        search._pin = _identity_pin if side == "B" else _ORIG_PIN
        try:
            with dedup_cache_scope():
                return bench.time_query(spark, fn, sf_dir, n)
        finally:
            search._pin = _ORIG_PIN

    rows = {}
    for side in "AB":
        search._pin = _identity_pin if side == "B" else _ORIG_PIN
        try:
            with dedup_cache_scope():
                rows[side] = sorted(map(str, fn(spark, sf_dir).collect()))
        finally:
            search._pin = _ORIG_PIN
        spark.catalog.clearCache()
    assert rows["A"] == rows["B"], "dropping the pin changed bm25 results!"

    out = {"rows_identical": True, "n_rows": len(rows["A"])}
    reps_by: dict = {"A": [], "B": []}
    for _ in range(blocks):
        for side in "AB":
            reps_by[side] += run_side(side, reps)
    for side in "AB":
        r = reps_by[side]
        out[f"{side}_reps"] = [round(x, 3) for x in r]
        steady = [x for i, x in enumerate(r) if i % reps != 0]
        out[f"{side}_median"] = round(statistics.median(steady), 3)
        out[f"{side}_min"] = round(min(steady), 3)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
