"""Scale-behavior evidence tests: the claims SCALE.md makes about
runtime mitigation, measured/plan-asserted rather than asserted in prose.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from mapping_timeseries_spark.sources.readers import read_table

SF_DIR = "/root/testdata/sf0.01"


def test_approx_distinct_error_bound(spark):
    """The A4 scale path (approx_count_distinct, HLL) stays within its
    configured rsd against the exact counts the oracle gate verifies —
    the evidence behind COVERAGE's 'prefer approx at 1e10 entities'."""
    orders = read_table(spark, SF_DIR, "orders")
    by_month = (
        orders.groupBy(F.date_format("o_orderdate", "yyyy-MM").alias("m"))
        .agg(
            F.count_distinct("o_custkey").alias("exact"),
            F.approx_count_distinct("o_custkey", rsd=0.02).alias("approx"),
        )
        .collect()
    )
    assert by_month
    for r in by_month:
        # 0.02 rsd is a standard deviation, not a hard bound — 5 sigma
        # across ~80 groups makes a false failure vanishingly unlikely
        assert abs(r["approx"] - r["exact"]) <= max(5, 0.10 * r["exact"]), (
            r["m"], r["exact"], r["approx"],
        )


def test_zorder_layout_prunes_on_both_dimensions(spark, tmp_path):
    """Z-ORDER analogue: files of the Morton-sorted layout cover small
    rectangles of (a, b) space, so min/max footer pruning works for
    predicates on EITHER column — a plain a-sort leaves every file
    spanning the full b range (b-predicates read 100% of files)."""
    import os

    from pyspark.sql import functions as F

    from mapping_timeseries_spark.sources.writers import write_zordered

    n = 40_000
    df = spark.range(n).select(
        (F.col("id") % 997).alias("a"),
        ((F.col("id") * 7919) % 997).alias("b"),
        F.col("id").alias("payload"),
    )
    plain_path = str(tmp_path / "plain")
    z_path = str(tmp_path / "zord")
    df.repartitionByRange(16, "a").sortWithinPartitions("a").write.parquet(
        plain_path
    )
    write_zordered(df, z_path, "a", "b", bits=8, files=16)

    def file_ranges(path, col):
        out = []
        for f in os.listdir(path):
            if f.endswith(".parquet"):
                r = (
                    spark.read.parquet(os.path.join(path, f))
                    .agg(F.min(col), F.max(col))
                    .head()
                )
                out.append((r[0], r[1]))
        return out

    def hit_fraction(ranges, lo, hi):
        hits = sum(1 for mn, mx in ranges if not (mx < lo or mn > hi))
        return hits / len(ranges)

    # b-predicate over ~10% of the b domain: the a-sorted layout cannot
    # skip anything; the z-layout skips most files
    plain_b = hit_fraction(file_ranges(plain_path, "b"), 100, 199)
    z_b = hit_fraction(file_ranges(z_path, "b"), 100, 199)
    assert plain_b == 1.0
    assert z_b <= 0.5
    # and the z-layout still prunes on a — worse than a pure a-sort
    # (the curve splits a with fewer top-level bits than b at this file
    # count) but far from the plain layout's 100%-read on b
    z_a = hit_fraction(file_ranges(z_path, "a"), 100, 199)
    assert z_a <= 0.625
    # no rows were lost to the layout
    assert spark.read.parquet(z_path).count() == n


def test_aqe_skew_join_splits_hot_partition(spark):
    """AQE's skew-join mitigation — the runtime half of the engine's skew
    strategy (salting is the static half, relational.salted_agg) —
    actually engages on a hot-keyed sort-merge join: the executed plan
    marks the join skew=true and splits the oversized partition instead
    of leaving one straggler task.

    Thresholds are lowered to make a ~95%-hot-key local fixture cross the
    skew bar; at production scale the defaults (256 MB) play the same
    role. Broadcast is disabled to force the sort-merge shape AQE
    rewrites (a broadcast join has no skewed shuffle to fix — it is
    itself the mitigation when one side is small).
    """
    before = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.adaptive.skewJoin.enabled",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
            "spark.sql.autoBroadcastJoinThreshold",
        )
    }
    try:
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16KB"
        )
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
        spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

        n = 60_000
        fact = spark.range(n).select(
            # ~95% of rows on one key, the rest spread over 1000 keys
            F.when(F.col("id") % 20 != 0, F.lit(7)).otherwise(F.col("id") % 1000)
            .alias("k"),
            (F.col("id") * 2).alias("payload"),
        )
        dim = spark.range(1000).select(
            F.col("id").alias("k"), F.lit("d").alias("tag")
        )
        joined = fact.join(dim, "k")
        # collect() on THIS DataFrame: a .count() would run a different
        # QueryExecution and leave joined's adaptive plan unfinalized
        assert len(joined.collect()) == n
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan, plan[:2000]
    finally:
        for k, v in before.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_hot_clique_gate_artifact():
    """Adversarial-input evidence (VERDICT r8 #1): the committed
    hot-clique gate artifact (tools/hot_clique_gate.py — planted
    near-identical k-cliques up to k=10,000) pins that star-mode LSH
    candidates stay linear and span the clique while the all-pairs
    generator measures quadratic and dies at k=10k on this box."""
    import json
    import os

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "artifacts",
        "hot_clique_gate.json",
    )
    with open(path) as f:
        d = json.load(f)
    assert d["star_linear"]
    assert d["pairs_quadratic"]
    for r in d["rows"]:
        # star candidate set is bounded by the banded frame (linear)
        assert r["cand_star"] <= r["n_banded"], r["k"]
        # and it SPANS the clique: one cluster holding all k members
        assert r["star_clique_spanned"], r["k"]
        # where both modes ran to completion, components are identical
        if "clusters_equal" in r:
            assert r["clusters_equal"], r["k"]
    big = d["rows"][-1]
    assert big["k"] >= 10_000
    # the counterfactual at k=10k: >=3e8-row hot-bucket join volume
    # (vs ~1e4 star candidates); measured to die on this box
    assert big["pairs_join_volume"] > 1000 * big["cand_star"]


def test_scratch_meter_sees_shuffle_bytes(spark):
    """The disk-residency meter (scratch.ScratchMeter, VERDICT r8 #4)
    measures a real shuffle: a forced wide exchange leaves its shuffle
    files in the DiskBlockManager dirs while the action runs, and the
    meter's peak delta captures them."""
    from mapping_timeseries_spark.scratch import ScratchMeter, spark_local_dirs

    dirs = spark_local_dirs(spark)
    assert dirs and all(os.path.isdir(d) for d in dirs)
    df = (
        spark.range(0, 3_000_000)
        .selectExpr("id % 100000 as k", "cast(id as string) as payload")
        .repartition(32, "k")
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    with ScratchMeter(spark, interval=0.05) as m:
        df.write.format("noop").mode("overwrite").save()
    assert m.samples >= 1
    # a 3M-row two-exchange shuffle writes megabytes; assert a loose
    # floor so cleaner timing can't flake the test
    assert m.peak_delta_bytes > 100_000, (m.base_bytes, m.peak_bytes)


def test_scratch_drain_settles(tmp_path):
    """drain() (r10, VERDICT r9 "wrong" #2) returns promptly when the
    dirs are already under the floor, and returns the settled count
    when bytes are static above it — the two paths the 100x gate's
    between-region release takes. (The asynchronous-deletion path is
    what the gate itself exercises; here we pin the termination
    conditions so a refactor can't turn drain into a 120 s sleep.)"""
    import time as _t

    from mapping_timeseries_spark.scratch import drain

    d = tmp_path / "scratch"
    d.mkdir()
    # under floor -> immediate
    t0 = _t.monotonic()
    assert drain([str(d)], floor_bytes=1024) == 0
    assert _t.monotonic() - t0 < 1.0
    # static above floor -> returns after stable_secs, not timeout
    (d / "residue").write_bytes(b"x" * 4096)
    t0 = _t.monotonic()
    got = drain(
        [str(d)], floor_bytes=1024, stable_secs=0.6, timeout=30, interval=0.1
    )
    assert got == 4096
    assert _t.monotonic() - t0 < 5.0


def test_replicate_range_matches_union_replicate(spark, tmp_path):
    """The constant-plan corpus replicator (tools/scale_stress.
    replicate_range, the 1000x gate's builder — a broadcast replica-index
    crossJoin) is multiset-identical, schema included, to the N-way
    unionByName replicate the 100x gates were measured on: per-domain key
    offsets line up FK->PK inside every replica, replica 0 is bit-equal
    to 1x, and documents get the per-word replica suffix for r > 0 (the
    property that keeps cross-replica Jaccard at exactly 0)."""
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    import scale_stress

    old_sf = scale_stress.SF_DIR
    scale_stress.SF_DIR = "/root/testdata/sf0.001"
    try:
        a = str(tmp_path / "union")
        b = str(tmp_path / "range")
        scale_stress.replicate(spark, 2, a)
        scale_stress.replicate_range(spark, 2, b, partitions=4)
        for t in ("orders", "lineitem", "documents"):
            da = spark.read.parquet(os.path.join(a, f"{t}.parquet"))
            db = spark.read.parquet(os.path.join(b, f"{t}.parquet"))
            assert da.schema == db.schema, t
            assert da.exceptAll(db).count() == 0, t
            assert db.exceptAll(da).count() == 0, t
    finally:
        scale_stress.SF_DIR = old_sf


def test_best_lag_correlation_single_pass_plan(spark):
    """The r10 one-pass contract, plan-asserted so it cannot silently
    revert: best_lag_correlation's physical plan is merged -> lead
    window -> explode -> agg(entity,lag) -> agg(entity) with NO join —
    the old grid+stats shape joined two differently-keyed aggregations
    over `merged`, re-executing the upstream merge join per action when
    uncached (measured at the 1000x gate: corr_mapping 542 s vs
    auto_mapping 287 s). A join or a second window reappearing in this
    plan means the second pass is back."""
    from mapping_timeseries_spark.operators.correlation import (
        best_lag_correlation,
    )
    from mapping_timeseries_spark.operators.merge import merge_series
    from mapping_timeseries_spark.sources.fixtures import (
        monthly_revenue,
        monthly_spend,
    )

    sf = "/root/testdata/sf0.001"
    merged = merge_series(monthly_spend(spark, sf), monthly_revenue(spark, sf))
    best = best_lag_correlation(merged, max_lag=3)
    plan = best._jdf.queryExecution().executedPlan().toString()
    # exactly the upstream joins — t1-t2 merge plus monthly_revenue's
    # internal lineitem-orders join — and one lead window; the old
    # two-pass shape added a stats join and doubled every upstream scan
    n_joins = sum(plan.count(j) for j in
                  ("SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin",
                   "BroadcastNestedLoopJoin", "CartesianProduct"))
    assert n_joins == 2, f"expected merge + revenue joins only, got {n_joins}:\n{plan}"
    assert plan.count("Window") == 1, plan
    # single pass over merged == single read of each fact table's role:
    # lineitem once, orders twice (spend + revenue sides) = 3 scans
    assert plan.count("FileScan parquet") == 3, plan
    # and the result still matches the reference semantics on real data
    rows = {r["cus_code"]: r for r in best.collect()}
    assert rows and all(0 <= r["optimal_lag"] <= 3 for r in rows.values())
