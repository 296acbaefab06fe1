"""100x spot-gate for the heavy text family (VERDICT r7 #7).

There is no sf1 testdata in this container (TESTDATA.md ships sf0.001/
0.01/0.1), so the "one more decade out" evidence is a 100x replicated
corpus (tools/scale_stress.replicate at factor 100 — per-word-renamed
replicas, so every dedup/containment graph is exactly 100 disjoint
copies of the 1x graph). The five heaviest text-family registry queries
run once each at 100x; the gate is:

- the query COMPLETES one more decade out (no spill-death, no OOM, no
  driver collapse), with the wall recorded, and
- its output row count equals the REPLICA-SCALED expectation, computed
  from the measured 1x count: per-doc outputs (text_stats,
  quality_score) and within-replica pair outputs (ngram_jaccard near +
  contam legs, minhash verified pairs) scale exactly 100x; dsir_select
  emits exactly k rows at any scale (top-k is k by construction).

Row-count identity at 100x is the strongest check DuckDB cannot give us
at this scale (the naive ngram-Jaccard oracle is quadratic in shared
shingles — fine at sf0.01, hopeless at 100x sf0.1); value-level
hash parity is already gated at sf0.001/0.01/0.1 plus the 10x stress
suite (artifacts/CORRECTNESS_stress10x*.json).

Usage: python tools/text_100x_gate.py [out.json]
Writes artifacts/text_100x_gate.json; the 100x corpus lands under
artifacts/scale_stress_100x/ (gitignored, ~1.5 GB; regenerated when
missing).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_1X = "/root/testdata/sf0.1"
DIR_100X = os.path.join(REPO, "artifacts", "scale_stress_100x")
FACTOR = 100

#: registry query -> how its output cardinality scales with F replicas
#: ("xF" = exactly F times the 1x count; "k" = top-k, constant)
QUERIES = {
    "ngram_jaccard": "xF",
    "text_stats": "xF",
    "quality_score": "xF",
    "minhash_dedup": "xF",
    "dsir_select": "k",
}


def main() -> int:
    out_json = (
        sys.argv[1]
        if len(sys.argv) > 1
        else os.path.join(REPO, "artifacts", "text_100x_gate.json")
    )
    import __spark_entry__ as entry_mod
    from bench import box_calibration
    from mapping_timeseries_spark.session import get_spark

    spark = get_spark(
        "text-100x-gate",
        master="local[32]",
        shuffle_partitions=64,
        extra_conf={"spark.driver.memory": "24g"},
    )
    spark.range(1000).selectExpr("sum(id)").collect()

    if not os.path.isdir(DIR_100X):
        print(f"{DIR_100X} missing — replicating {FACTOR}x (one-time)")
        sys.path.insert(0, os.path.join(REPO, "tools"))
        import scale_stress

        t0 = time.monotonic()
        scale_stress.replicate(spark, FACTOR, DIR_100X)
        print(f"replicated in {time.monotonic() - t0:.0f}s")

    qs = dict(entry_mod.queries())
    pre = box_calibration()
    res = {}
    for name, scaling in QUERIES.items():
        n1 = qs[name](spark, SF_1X).count()
        spark.catalog.clearCache()
        t0 = time.monotonic()
        n100 = qs[name](spark, DIR_100X).count()
        wall = time.monotonic() - t0
        spark.catalog.clearCache()
        expected = n1 * FACTOR if scaling == "xF" else n1
        res[name] = {
            "rows_1x": n1,
            "rows_100x": n100,
            "expected_100x": expected,
            "count_ok": n100 == expected,
            "wall_100x_sec": round(wall, 1),
        }
        print(name, json.dumps(res[name]))
    out = {
        "factor": FACTOR,
        "corpus": DIR_100X,
        "queries": res,
        "all_green": all(v["count_ok"] for v in res.values()),
        "box_calibration": {"pre": pre, "post": box_calibration()},
    }
    print(json.dumps({k: v for k, v in out.items() if k != "queries"}))
    if out["all_green"]:
        with open(out_json, "w") as f:
            json.dump(out, f, indent=1)
        print(f"wrote {out_json}")
    else:
        print("COUNT GATES FAILED — artifact not written")
    spark.stop()
    return 0 if out["all_green"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
