"""Interleaved A/B of spark.sql.execution.arrow.maxRecordsPerBatch at
10x scale (guide §4.2): the sequential blocks in r14_scale_cores read
batch=2000 faster on BOTH dtw legs (-14%/-5% medians), but sequential
blocks carry order effects — this tool interleaves A (default 10000)
and B (2000) blocks in one session, covers the full Arrow blast radius
(both dtw legs + corr_pvalues, the only other Arrow-kernel query), and
stamps steal per block.

Also dumps the ngram candidate-join strategy at 10x (static explain —
the broadcast decision is made from size estimates at planning time):
at sf0.1 the prefix table broadcasts; VERDICT r13 #5's co-partitioning
idea only exists at a scale where it stops broadcasting.

Usage: python tools/r14_dtw_batch_ab.py [factor] [--reps=N] [--blocks=M]
Writes artifacts/r14_dtw_batch_ab.json and
plans/r14/ngram_jaccard_10x_static.txt.
"""

from __future__ import annotations

import io
import json
import os
import shutil
import statistics
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402
from r13_explain_dump import bench_query_map  # noqa: E402
from scale_stress import replicate  # noqa: E402

from mapping_timeseries_spark.operators.dedup import dedup_cache_scope  # noqa: E402
from mapping_timeseries_spark.session import get_spark  # noqa: E402

LEGS = ["dtw_summary", "dtw_mapping", "corr_pvalues"]
SIDES = {"A": "10000", "B": "2000"}


def main() -> None:
    factor, reps, blocks = 10, 3, 2
    for a in sys.argv[1:]:
        if a.startswith("--reps="):
            reps = int(a.split("=", 1)[1])
        elif a.startswith("--blocks="):
            blocks = int(a.split("=", 1)[1])
        else:
            factor = int(a)
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_dir = os.path.join(root, "artifacts", f"r14_dtw_ab_{factor}x_data")
    spark = get_spark(
        "r14_dtw_batch_ab",
        master="local[32]",
        shuffle_partitions=32,
        extra_conf={"spark.driver.memory": "16g"},
    )
    print(f"replicating {factor}x ...", file=sys.stderr)
    replicate(spark, factor, out_dir)
    qs = bench_query_map()
    result: dict = {"factor": factor, "reps": reps, "blocks": blocks, "sides": SIDES, "raw": {}}
    try:
        # row identity first: the knob must not change results
        for leg in LEGS:
            rows = {}
            for side, val in SIDES.items():
                spark.conf.set(
                    "spark.sql.execution.arrow.maxRecordsPerBatch", val
                )
                with dedup_cache_scope():
                    rows[side] = sorted(
                        map(str, qs[leg](spark, out_dir).collect())
                    )
                spark.catalog.clearCache()
            assert rows["A"] == rows["B"], f"batch size changed {leg} rows!"
        result["rows_identical"] = True
        for _ in range(blocks):
            for side, val in SIDES.items():
                spark.conf.set(
                    "spark.sql.execution.arrow.maxRecordsPerBatch", val
                )
                for leg in LEGS:
                    a = bench._steal_snapshot()
                    with dedup_cache_scope():
                        r = bench.time_query(spark, qs[leg], out_dir, reps)
                    b = bench._steal_snapshot()
                    steal = (
                        round(100.0 * (b[0] - a[0]) / max(b[1] - a[1], 1), 2)
                        if a and b
                        else None
                    )
                    result["raw"].setdefault(leg, {}).setdefault(
                        side, []
                    ).append({"reps": [round(x, 3) for x in r], "steal_pct": steal})
                    print(f"{side} {leg}: {r} steal={steal}", file=sys.stderr)
        spark.conf.set(
            "spark.sql.execution.arrow.maxRecordsPerBatch", "10000"
        )
        for leg, sides in result["raw"].items():
            summ = {}
            for side, recs in sides.items():
                steady = [
                    x for rec in recs for x in rec["reps"][1:]
                ]  # drop each block's first rep (warmup)
                summ[side] = {
                    "median": round(statistics.median(steady), 3),
                    "min": round(min(steady), 3),
                }
            result.setdefault("summary", {})[leg] = summ
        # ngram candidate-join strategy at this factor (static explain)
        with dedup_cache_scope():
            df = qs["ngram_jaccard"](spark, out_dir)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
        txt = buf.getvalue()
        with open(
            os.path.join(root, "plans", "r14", f"ngram_jaccard_{factor}x_static.txt"), "w"
        ) as f:
            f.write(txt)
        result["ngram_join_at_factor"] = {
            "BroadcastHashJoin": txt.count("BroadcastHashJoin"),
            "SortMergeJoin": txt.count("SortMergeJoin"),
            "ShuffledHashJoin": txt.count("ShuffledHashJoin"),
        }
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)
        spark.stop()
    path = os.path.join(root, "artifacts", "r14_dtw_batch_ab.json")
    with open(path, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result.get("summary"), indent=1))
    print(json.dumps(result.get("ngram_join_at_factor")))


if __name__ == "__main__":
    main()
