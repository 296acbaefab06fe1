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


# ---------------------------------------------------------------------------
# Deterministic log-decade histograms
# ---------------------------------------------------------------------------

from mapping_timeseries_spark.operators.sketches import (  # noqa: E402
    advance_histogram_state,
    advance_topk_state,
    histogram_quantiles,
    merge_histograms,
    merge_topk,
    topk_sketch,
    value_histogram,
)


def _hist_rows(h, group_cols):
    """Canonical comparable form: exploded, fully sorted."""
    return sorted(
        tuple(r[c] for c in group_cols) + (r["bucket"], r["c"], r["n"])
        for r in h.select(
            *group_cols, "n", F.explode("hist").alias("bucket", "c")
        ).collect()
    )


def test_histogram_quantiles_within_relative_error(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    grp = ["l_returnflag"]
    h = value_histogram(li, grp, "l_extendedprice")
    hq = {
        r["l_returnflag"]: (r["hp25"], r["hp50"], r["hp75"])
        for r in histogram_quantiles(h, grp, [0.25, 0.5, 0.75]).collect()
    }
    exact = {
        r["l_returnflag"]: r["ex"]
        for r in li.groupBy(*grp)
        .agg(
            F.expr(
                "percentile(l_extendedprice, array(0.25, 0.5, 0.75))"
            ).alias("ex")
        )
        .collect()
    }
    assert set(hq) == set(exact)
    for flag, est in hq.items():
        for e, x in zip(est, exact[flag]):
            # lower-bound estimate: undershoots, < 1% relative (3 digits)
            # plus the rank-definition gap (lower vs interpolated), which
            # at fixture n is far inside another 1%.
            assert e <= x + 1e-9
            assert (x - e) / x < 0.02

    # counts in the state are exhaustive: n equals the group row count
    n_by_flag = {
        r["l_returnflag"]: r["n"] for r in h.select(*grp, "n").collect()
    }
    true_n = {
        r["l_returnflag"]: r["c"]
        for r in li.groupBy(*grp).agg(F.count("*").alias("c")).collect()
    }
    assert n_by_flag == true_n


def test_histogram_bucket_is_leading_digit_floor(spark):
    df = spark.createDataFrame(
        [(0.4,), (7.0,), (99.9,), (123.0,), (999.0,), (1234.5,),
         (99999.9,), (1.5e7,), (-1234.5,)],
        "v double",
    )
    h = value_histogram(df.withColumn("g", F.lit(1)), ["g"], "v")
    got = {b for b, _ in h.select(F.explode("hist")).collect()}
    assert got == {0, 7, 99, 123, 999, 1230, 99900, 15000000, -1230}


def test_histogram_merge_is_bitwise_rebuild(spark):
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    grp = ["o_orderpriority"]
    state = None
    for m in [0, 1, 2]:
        batch = orders.where(F.col("o_orderkey") % 3 == m)
        state = advance_histogram_state(state, batch, grp, "o_totalprice")
    full = value_histogram(orders, grp, "o_totalprice")
    assert _hist_rows(state, grp) == _hist_rows(full, grp)
    # layout-independence: a different physical partitioning, same state
    repart = value_histogram(
        orders.repartition(13, "o_custkey"), grp, "o_totalprice"
    )
    assert _hist_rows(repart, grp) == _hist_rows(full, grp)


def test_histogram_rollup_matches_direct(spark):
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    fine = value_histogram(
        orders, ["o_orderpriority", "o_orderstatus"], "o_totalprice"
    )
    rolled = merge_histograms(fine, ["o_orderpriority"])
    direct = value_histogram(orders, ["o_orderpriority"], "o_totalprice")
    assert _hist_rows(rolled, ["o_orderpriority"]) == _hist_rows(
        direct, ["o_orderpriority"]
    )


# ---------------------------------------------------------------------------
# Misra-Gries heavy hitters
# ---------------------------------------------------------------------------


def _true_counts(df, group_cols, term_col):
    rows = df.groupBy(*group_cols, term_col).agg(
        F.count("*").alias("c")
    ).collect()
    out = {}
    for r in rows:
        g = tuple(r[c] for c in group_cols)
        out.setdefault(g, {})[r[term_col]] = r["c"]
    return out


def _assert_mg_bounds(rows, true, group_cols, k):
    """The three Misra-Gries guarantees, per group, over collected rows."""
    for r in rows:
        g = tuple(r[c] for c in group_cols)
        counters = r["counters"] or {}
        err, n = r["err"], r["n"]
        assert n == sum(true[g].values())
        assert err <= n // (k + 1) + (1 if n % (k + 1) else 0)
        assert len(counters) <= k
        for t, c in counters.items():
            assert c <= true[g][t] <= c + err, (g, t)
        for t, tc in true[g].items():
            if t not in counters:
                assert tc <= err, (g, t)


def test_topk_sketch_bounds_and_exact_small_groups(spark):
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    grp = ["o_orderpriority"]
    k = 8
    st = topk_sketch(orders, grp, "o_custkey", k)
    true = _true_counts(orders, grp, "o_custkey")
    _assert_mg_bounds(st.collect(), true, grp, k)
    # a group with <= k distinct terms is EXACT (err 0, all terms kept)
    small = orders.where(F.col("o_custkey") < 10)
    st_small = topk_sketch(small, grp, "o_custkey", 50)
    for r in st_small.collect():
        assert r["err"] == 0
        g = (r["o_orderpriority"],)
        assert dict(r["counters"]) == _true_counts(
            small, grp, "o_custkey"
        )[g]


def test_topk_advance_and_merge_keep_bounds(spark):
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    k = 12
    state = None
    for m in [0, 1, 2, 3]:
        batch = orders.where(F.col("o_orderkey") % 4 == m)
        state = advance_topk_state(state, batch, [], "o_custkey", k)
    true = {(): _true_counts(
        orders.withColumn("_g", F.lit(1)), ["_g"], "o_custkey"
    )[(1,)]}

    rows = state.collect()
    assert len(rows) == 1
    _assert_mg_bounds(rows, true, [], k)
    # every term with true frequency > n/(k+1) is guaranteed present
    n = rows[0]["n"]
    hot = {t for t, c in true[()].items() if c > n / (k + 1)}
    assert hot <= set((rows[0]["counters"] or {}).keys())


def test_topk_rollup_bounds_vs_direct(spark):
    ev = spark.read.parquet(f"{SF}/events.parquet")
    k = 10
    fine = topk_sketch(ev, ["event_type"], "user_id", k)
    rolled = merge_topk(fine.drop("event_type").withColumn(
        "g", F.lit(1)
    ), ["g"], k)
    true = {(1,): _true_counts(
        ev.withColumn("g", F.lit(1)), ["g"], "user_id"
    )[(1,)]}
    _assert_mg_bounds(rolled.collect(), true, ["g"], k)


def test_histogram_quantiles_rejects_colliding_names(spark):
    # quantile_col rounds q*100 to an integer percent; 0.125 and 0.115
    # both name hp12 (banker's rounding), which would emit duplicate
    # output columns — rejected at build time (ADVICE r8 #4)
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    h = value_histogram(li, ["l_returnflag"], "l_extendedprice")
    with pytest.raises(ValueError, match="collide"):
        histogram_quantiles(h, ["l_returnflag"], [0.125, 0.115])
