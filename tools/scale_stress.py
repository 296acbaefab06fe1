"""Scale-up stress: replicate the sf0.1 tables N-fold (key-offset
copies, so entity/order cardinality actually grows) into a temp dir,
then time representative queries at 1x vs Nx — the direct "would this
survive a scale-up" measurement (wall time should grow ~linearly; a
super-linear jump exposes a hidden quadratic or a spill).

    python tools/scale_stress.py [factor] [query ...]

Writes the replicated tables under artifacts/scale_stress_<factor>x/
(deleted on exit unless KEEP_STRESS_DATA=1). Document text gets a
per-replica suffix token so dedup structure (dup groups, near-dup
graph) keeps its 1x shape instead of creating cross-replica dup
explosions that would change the workload's character.
"""

from __future__ import annotations

import os
import shutil
import statistics
import sys
import time

SF_DIR = "/root/testdata/sf0.1"
REPS = 3


def replicate(spark, factor: int, out_dir: str) -> None:
    from pyspark.sql import functions as F

    os.makedirs(out_dir, exist_ok=True)
    specs = {
        # table: (key columns to offset, text column or None)
        "orders": (["o_orderkey", "o_custkey"], None),
        "lineitem": (["l_orderkey"], None),
        "customer": (["c_custkey"], None),
        "documents": (["doc_id"], "text"),
        "embeddings": (["vec_id"], None),
        "events": (["event_id", "user_id"], None),
    }
    for name, (key_cols, text_col) in specs.items():
        src = spark.read.parquet(os.path.join(SF_DIR, f"{name}.parquet"))
        offsets = {c: (src.agg(F.max(c)).first()[0] or 0) + 1 for c in key_cols}
        parts = []
        for i in range(factor):
            p = src
            for c, off in offsets.items():
                p = p.withColumn(c, F.col(c) + F.lit(i * off))
            if text_col is not None and i > 0:
                p = p.withColumn(
                    text_col, F.concat(F.col(text_col), F.lit(f" r{i}"))
                )
            parts.append(p)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        out.write.mode("overwrite").parquet(os.path.join(out_dir, f"{name}.parquet"))
    for name in ("region", "nation", "supplier", "part"):
        shutil.copy(
            os.path.join(SF_DIR, f"{name}.parquet"),
            os.path.join(out_dir, f"{name}.parquet"),
        )


def main() -> int:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    names = sys.argv[2:] or ["corr_mapping", "minhash_dedup", "dtw_summary",
                             "exact_dedup", "pack_export"]

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as entry_mod
    from mapping_timeseries_spark.session import get_spark

    spark = get_spark("scale-stress", master="local[32]",
                      extra_conf={"spark.driver.memory": "16g"})
    spark.range(1000).selectExpr("sum(id)").collect()

    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "artifacts", f"scale_stress_{factor}x",
    )
    print(f"replicating {factor}x into {out_dir} ...")
    replicate(spark, factor, out_dir)

    qs = dict(entry_mod.queries())
    qs["pack_export"] = entry_mod.q_pack_export
    try:
        for name in names:
            times = {}
            for label, sf_dir in (("1x", SF_DIR), (f"{factor}x", out_dir)):
                reps = []
                for _ in range(REPS):
                    t0 = time.time()
                    qs[name](spark, sf_dir).write.format("noop").mode(
                        "overwrite"
                    ).save()
                    spark.catalog.clearCache()
                    reps.append(time.time() - t0)
                times[label] = statistics.median(reps)
            ratio = times[f"{factor}x"] / max(times["1x"], 1e-9)
            print(
                f"{name}: 1x={times['1x']:.2f}s {factor}x={times[f'{factor}x']:.2f}s "
                f"ratio={ratio:.2f} (linear would be <= {factor}.0)"
            )
    finally:
        if not os.environ.get("KEEP_STRESS_DATA"):
            shutil.rmtree(out_dir, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
