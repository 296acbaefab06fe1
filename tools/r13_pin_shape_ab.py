"""Same-session interleaved A/B/C of the mapping-family t1/t2 reuse shapes.

The mapping legs (qa_invariants here as the probe; corr_mapping and
auto_mapping share the pattern) pin t1/t2 with scoped_pin because several
consumers read them. A COLD pin is materialized concurrently by every
consumer's first stage (the r13 profiling saw duplicate lineitem scans in
one qa action). Three candidate shapes:

A = scoped_pin(t)                       (current tree)
B = scoped_pin(t).repartition(KEY,TIME) (gate: AQE stage reuse dedupes the
                                         cold materialization; cache kept)
C = t.repartition(KEY,TIME)             (no pin at all: the exchange itself
                                         is the shared materialization —
                                         ReusedExchange computes the
                                         subtree once, consumers re-read
                                         its shuffle files)

All three give identical results (repartition/caching never change rows).
bench.time_query methodology (noop sink, cache cleared between reps).

Usage: python tools/r13_pin_shape_ab.py [--reps=N]
"""

from __future__ import annotations

import json
import os
import statistics
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from __spark_entry__ import MAX_LAG, MIN_CORRELATION  # noqa: E402
from mapping_timeseries_spark.operators.correlation import (  # noqa: E402
    best_lag_correlation,
)
from mapping_timeseries_spark.operators.lag_join import (  # noqa: E402
    build_correlation_mappings,
)
from mapping_timeseries_spark.operators.dedup import (  # noqa: E402
    dedup_cache_scope,
    scoped_pin,
)
from mapping_timeseries_spark.operators.merge import merge_series  # noqa: E402
from mapping_timeseries_spark.operators.quality import qa_invariants  # noqa: E402
from mapping_timeseries_spark.session import get_spark  # noqa: E402
from mapping_timeseries_spark.sources.fixtures import (  # noqa: E402
    monthly_revenue,
    monthly_spend,
)


def _qa(spark, sf_dir, shape: str):
    t1 = monthly_spend(spark, sf_dir)
    t2 = monthly_revenue(spark, sf_dir)
    if shape == "A":
        t1, t2 = scoped_pin(t1), scoped_pin(t2)
    elif shape == "B":
        t1 = scoped_pin(t1).repartition("cus_code", "month")
        t2 = scoped_pin(t2).repartition("cus_code", "month")
    elif shape == "C":
        t1 = t1.repartition("cus_code", "month")
        t2 = t2.repartition("cus_code", "month")
    elif shape == "D":
        # entity-only key: subset of the merge-join keys (co-partition
        # still satisfied) AND the key of every downstream window/groupBy
        t1 = t1.repartition("cus_code")
        t2 = t2.repartition("cus_code")
    corr = best_lag_correlation(merge_series(t1, t2), MAX_LAG)
    mapped = build_correlation_mappings(t1, t2, corr, MIN_CORRELATION)
    qa = qa_invariants(mapped, t1)
    return qa.select(
        F.col("total_entities").cast("bigint").alias("total_entities"),
        F.col("mapped_entities").cast("bigint").alias("mapped_entities"),
        F.col("total_mappings").cast("bigint").alias("total_mappings"),
        F.col("duplicates").cast("bigint").alias("duplicates"),
        "min_lag",
        "max_lag",
        F.round("avg_lag", 6).alias("avg_lag"),
        F.round("min_ratio", 6).alias("min_ratio"),
        F.round("max_ratio", 6).alias("max_ratio"),
        F.round("avg_ratio", 6).alias("avg_ratio"),
        F.round("std_ratio", 6).alias("std_ratio"),
        F.col("temporal_violations").cast("bigint").alias("temporal_violations"),
    )


def main() -> None:
    reps = 4
    shapes = "ABC"
    for a in sys.argv[1:]:
        if a.startswith("--reps="):
            reps = int(a.split("=", 1)[1])
        if a.startswith("--shapes="):
            shapes = a.split("=", 1)[1]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        "r13_pin_shape_ab",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
        extra_conf={"spark.driver.memory": "16g"},
    )

    def side(shape):
        with dedup_cache_scope():
            return bench.time_query(
                spark, lambda s, d: _qa(s, d, shape), sf_dir, reps
            )

    # row-identity first: all three shapes must collect identical rows
    rows = {}
    for shape in shapes:
        with dedup_cache_scope():
            rows[shape] = sorted(
                map(str, _qa(spark, sf_dir, shape).collect())
            )
    first = rows[shapes[0]]
    assert all(rows[s] == first for s in shapes), "shape results diverge!"

    out = {"rows_identical": True}
    reps_by = {s: [] for s in shapes}
    for _ in range(2):  # two interleaved passes so drift hits all sides
        for shape in shapes:
            reps_by[shape] += side(shape)
    for shape in shapes:
        r = reps_by[shape]
        out[f"{shape}_reps"] = [round(x, 3) for x in r]
        out[f"{shape}_median"] = round(statistics.median(r[1:]), 3)
        out[f"{shape}_min"] = round(min(r[1:]), 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
