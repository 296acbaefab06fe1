"""Same-session interleaved shape A/B for the map_tables bench legs.

Replicates engine.map_tables' correlation and auto bodies (inputs =
monthly_spend/monthly_revenue like the corr_mapping / auto_mapping bench
legs) with the candidate reuse shapes from the qa_invariants probe
(tools/r13_pin_shape_ab.py):

corr leg:   A = persist t1/t2 (current)      B = repartition(KEY) gates
auto leg:   A = persist t1/t2 + cache merged + cache corr (current)
            B = gate t1/t2, keep merged/corr caches
            C = gate t1/t2, plain merged, gate corr (no caches)
            D = gate t1/t2 + gate merged + gate corr

All shapes are result-identical (asserted). bench.time_query methodology.

Usage: python tools/r13_map_shape_ab.py corr|auto [--reps=N] [--shapes=..]
"""

from __future__ import annotations

import json
import os
import statistics
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from __spark_entry__ import MAX_LAG  # noqa: E402
from mapping_timeseries_spark.config import MappingConfig  # noqa: E402
from mapping_timeseries_spark.config import AUTO_SIMPLE_THRESHOLD  # noqa: E402
from mapping_timeseries_spark.operators.canonicalize import (  # noqa: E402
    VALUE1,
    VALUE2,
    canonicalize,
    lattice_snap,
)
from mapping_timeseries_spark.operators.correlation import (  # noqa: E402
    best_lag_correlation,
)
from mapping_timeseries_spark.operators.dtw import build_dtw_mappings  # noqa: E402
from mapping_timeseries_spark.operators.lag_join import (  # noqa: E402
    build_correlation_mappings,
)
from mapping_timeseries_spark.operators.merge import merge_series  # noqa: E402
from mapping_timeseries_spark.session import get_spark  # noqa: E402
from mapping_timeseries_spark.sources.fixtures import (  # noqa: E402
    monthly_revenue,
    monthly_spend,
)

KEY = "cus_code"


def _inputs(spark, sf_dir, snap: bool):
    t1 = monthly_spend(spark, sf_dir)
    t2 = monthly_revenue(spark, sf_dir)
    if snap:
        t1 = t1.withColumn("txn_amount", lattice_snap("txn_amount"))
        t2 = t2.withColumn("revenue", lattice_snap("revenue"))
    t1 = canonicalize(t1, KEY, "month", "txn_amount", VALUE1, "table1")
    t2 = canonicalize(t2, KEY, "month", "revenue", VALUE2, "table2")
    return t1, t2


def q_corr(spark, sf_dir, shape: str):
    t1, t2 = _inputs(spark, sf_dir, snap=False)
    if shape == "A":
        t1, t2 = t1.persist(), t2.persist()
    else:
        t1 = t1.repartition(F.col(KEY))
        t2 = t2.repartition(F.col(KEY))
    merged = merge_series(t1, t2)
    corr = best_lag_correlation(merged, MAX_LAG)
    out = build_correlation_mappings(t1, t2, corr, 0.7)
    return out.select(
        KEY, "time1", F.round("value1", 6).alias("value1"),
        "time2", F.round("value2", 6).alias("value2"),
        "lag_offset", "method", F.round("correlation", 6).alias("correlation"),
    )


def q_auto(spark, sf_dir, shape: str):
    cfg = MappingConfig(method="auto")
    t1, t2 = _inputs(spark, sf_dir, snap=True)
    if shape == "A":
        t1, t2 = t1.persist(), t2.persist()
    else:
        t1 = t1.repartition(F.col(KEY))
        t2 = t2.repartition(F.col(KEY))
    merged = merge_series(t1, t2)
    if shape == "A" or shape == "B":
        merged_c = merged.cache()
    elif shape == "D":
        merged_c = merged.repartition(F.col(KEY))
    else:
        merged_c = merged
    corr = best_lag_correlation(merged_c, cfg.max_lag)
    if shape == "A" or shape == "B":
        corr = corr.cache()
    else:
        corr = corr.repartition(F.col(KEY))
    split = max(AUTO_SIMPLE_THRESHOLD, cfg.min_correlation)
    simple = corr.where(F.col("correlation") >= split)
    complex_keys = corr.where(F.col("correlation") < split).select(KEY)
    corr_part = build_correlation_mappings(t1, t2, simple, cfg.min_correlation)
    dtw_part = build_dtw_mappings(
        merged_c.join(complex_keys, on=KEY, how="left_semi"),
        cfg.window_size,
        cfg.normalize,
    )
    out = corr_part.unionByName(dtw_part, allowMissingColumns=True)
    return out.select(
        KEY, "time1", F.round("value1", 6).alias("value1"),
        "time2", F.round("value2", 6).alias("value2"),
        "lag_offset", "method",
        F.round("correlation", 6).alias("correlation"),
        F.round("dtw_cost", 6).alias("dtw_cost"),
    )


def main() -> None:
    leg = sys.argv[1]
    reps = 3
    shapes = "AB" if leg == "corr" else "ABCD"
    for a in sys.argv[2:]:
        if a.startswith("--reps="):
            reps = int(a.split("=", 1)[1])
        if a.startswith("--shapes="):
            shapes = a.split("=", 1)[1]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        "r13_map_shape_ab",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
        extra_conf={"spark.driver.memory": "16g"},
    )
    fn = q_corr if leg == "corr" else q_auto

    rows = {}
    for shape in shapes:
        rows[shape] = sorted(map(str, fn(spark, sf_dir, shape).collect()))
        spark.catalog.clearCache()
    first = rows[shapes[0]]
    assert all(rows[s] == first for s in shapes), "shape results diverge!"

    out = {"leg": leg, "rows_identical": True}
    reps_by = {s: [] for s in shapes}
    for _ in range(2):
        for shape in shapes:
            reps_by[shape] += bench.time_query(
                spark, (lambda sh: lambda s, d: fn(s, d, sh))(shape),
                sf_dir, reps,
            )
    for shape in shapes:
        r = reps_by[shape]
        out[f"{shape}_reps"] = [round(x, 3) for x in r]
        out[f"{shape}_median"] = round(statistics.median(r[1:]), 3)
        out[f"{shape}_min"] = round(min(r[1:]), 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
