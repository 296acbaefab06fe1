"""HLL distinct-count sketches: merge stability (incremental tracks a
full rebuild inside the sketch error budget — the contract that makes
the state durable), roll-up algebra, and accuracy vs the exact count.
Estimates are deliberately NOT pinned bit-equal across layouts: the
Datasketches encoding is build-history-dependent (measured ~1% wobble),
and pretending otherwise would make the suite flaky."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mapping_timeseries_spark.operators.sketches import (
    advance_distinct_state,
    distinct_sketch,
    merge_sketches,
    sketch_estimate,
)

SF = "/root/testdata/sf0.001"


def _est(sketches, group_cols):
    return {
        tuple(r[c] for c in group_cols): r["n_distinct"]
        for r in sketch_estimate(sketches).collect()
    }


def test_sketch_accuracy_and_determinism(spark):
    """Estimates track exact countDistinct within HLL error (lgk=12 ->
    ~1.6% std error; assert 5%), and are identical under a different
    input partitioning (register max is order-independent)."""
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    grp = ["l_returnflag"]
    got = _est(distinct_sketch(li, grp, "l_orderkey"), grp)
    exact = {
        (r["l_returnflag"],): r["n"]
        for r in li.groupBy("l_returnflag")
        .agg(F.countDistinct("l_orderkey").alias("n"))
        .collect()
    }
    assert set(got) == set(exact)
    for k in exact:
        assert got[k] == pytest.approx(exact[k], rel=0.05), (k, got[k], exact[k])
    # estimates are NOT bit-identical across layouts (sparse->dense
    # promotion depends on build history) — pin the measured ~1% wobble
    # stays inside the sketch's error budget, not equality
    again = _est(
        distinct_sketch(li.repartition(13, "l_orderkey"), grp, "l_orderkey"),
        grp,
    )
    for k in got:
        assert again[k] == pytest.approx(got[k], rel=0.03)


def test_incremental_state_equals_full_rebuild(spark):
    """The durability contract: advancing the sketch state batch by
    batch tracks sketching the concatenated history inside the error
    budget — register-wise union introduces no systematic drift. Also
    bootstraps from None and grows new groups."""
    orders = spark.read.parquet(f"{SF}/orders.parquet").select(
        "o_custkey", "o_orderkey", (F.col("o_orderkey") % 3).alias("b")
    )
    grp = ["o_custkey"]
    state = None
    for i in range(3):
        batch = orders.where(F.col("b") == i)
        state = advance_distinct_state(state, batch, grp, "o_orderkey")
    full = distinct_sketch(orders, grp, "o_orderkey")
    se, fe = _est(state, grp), _est(full, grp)
    assert set(se) == set(fe)
    for k in fe:
        assert se[k] == pytest.approx(fe[k], rel=0.03), (k, se[k], fe[k])
    assert state.count() == orders.select("o_custkey").distinct().count()


def test_rollup_matches_direct_coarse_sketch(spark):
    """month -> coarser-grain roll-up: unioning fine-grain sketches
    tracks a direct coarse sketch (same set; encodings may differ by
    build history)."""
    ev = spark.read.parquet(f"{SF}/events.parquet").select(
        "user_id",
        F.date_format("ts", "yyyy-MM").alias("month"),
        F.col("event_type"),
    )
    fine = distinct_sketch(ev, ["event_type", "month"], "user_id")
    rolled = merge_sketches(fine, ["event_type"])
    direct = distinct_sketch(ev, ["event_type"], "user_id")
    re_, de = _est(rolled, ["event_type"]), _est(direct, ["event_type"])
    assert set(re_) == set(de)
    for k in de:
        assert re_[k] == pytest.approx(de[k], rel=0.03)
    # roll-up never exceeds the sum of the parts (union <= disjoint sum)
    fine_est = _est(fine, ["event_type", "month"])
    rolled_est = _est(rolled, ["event_type"])
    for (et,), v in rolled_est.items():
        assert v <= sum(
            n for (e, _m), n in fine_est.items() if e == et
        ) * 1.05
