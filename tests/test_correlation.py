from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from mapping_timeseries_spark.operators.canonicalize import VALUE1, VALUE2, canonicalize
from mapping_timeseries_spark.operators.correlation import (
    best_lag_correlation,
    correlation_all_lags,
    lag_correlation_grid,
)
from mapping_timeseries_spark.operators.merge import merge_series
from mapping_timeseries_spark.sources.fixtures import synthetic_pair

from .oracles import best_lag_oracle

MAX_LAG = 6


@pytest.fixture(scope="module")
def merged(spark):
    t1, t2 = synthetic_pair(spark, num_customers=30, num_months=24)
    t1 = canonicalize(t1, "cus_code", "month", "txn_amount", VALUE1)
    t2 = canonicalize(t2, "cus_code", "month", "revenue", VALUE2)
    return merge_series(t1, t2).cache()


def test_best_lag_matches_numpy_oracle(spark, merged):
    result = {
        r["cus_code"]: r
        for r in best_lag_correlation(merged, MAX_LAG).collect()
    }
    groups = merged.orderBy("cus_code", "month").toPandas().groupby("cus_code")
    assert len(result) == len(groups)
    for cus, pdf in groups:
        lag, corr = best_lag_oracle(
            pdf["txn_amount"].to_numpy(), pdf["revenue"].to_numpy(), MAX_LAG
        )
        row = result[cus]
        assert row["optimal_lag"] == lag, cus
        assert row["correlation"] == pytest.approx(corr, abs=1e-9), cus
        assert row["num_months"] == len(pdf)
        assert row["txn_mean"] == pytest.approx(pdf["txn_amount"].mean())


def test_simple_pattern_recovers_planted_lag(spark, merged):
    # 'simple' family: revenue = 0.1 * txn shifted 1 month -> lag 1, high corr
    simple = (
        best_lag_correlation(merged, MAX_LAG)
        .where(F.col("cus_code").isin([f"CUS_{i:04d}" for i in range(0, 30, 3)]))
        .collect()
    )
    assert simple
    for row in simple:
        assert row["optimal_lag"] == 1, row
        assert row["correlation"] >= 0.7, row


def test_grid_lag_zero_equals_plain_corr(spark, merged):
    grid = lag_correlation_grid(merged, MAX_LAG).where(F.col("lag") == 0)
    plain = merged.groupBy("cus_code").agg(
        F.corr("txn_amount", "revenue").alias("c"), F.count("*").alias("n")
    )
    joined = grid.join(plain, "cus_code").collect()
    assert joined
    for r in joined:
        assert r["corr"] == pytest.approx(r["c"], abs=1e-12)
        assert r["n_pairs"] == r["n"]


def test_short_series_returns_zero(spark):
    df = spark.createDataFrame(
        [("A", "2024-01", 1.0, 2.0)],
        "cus_code string, month string, txn_amount double, revenue double",
    )
    row = best_lag_correlation(df, MAX_LAG).collect()[0]
    assert (row["optimal_lag"], row["correlation"]) == (0, 0.0)


def test_constant_series_returns_minus_one(spark):
    rows = [("A", f"2024-{m:02d}", 5.0, float(m)) for m in range(1, 7)]
    df = spark.createDataFrame(
        rows, "cus_code string, month string, txn_amount double, revenue double"
    )
    row = best_lag_correlation(df, MAX_LAG).collect()[0]
    assert (row["optimal_lag"], row["correlation"]) == (0, -1.0)


def test_lattice_mean_rounded_half_up_on_midpoint(spark):
    # Two 4-dp values whose exact mean 66797.4792125 sits on the 5e-7
    # midpoint: portable integer half-up must emit ...479213 (HALF_UP), the
    # value plain round(avg, 6) gives only on engines that round the
    # shortest-decimal repr (Spark) but not ones rounding the binary double
    # (DuckDB) — the round-2 corr_best_lag divergence.
    # 7x .4792 + 1x .4793 -> S=5343798337 micros over N=8:
    # exact mean 5343798337/80000 = 66797.4792125, a true 6-dp midpoint.
    rows = [
        ("A", f"2024-{m:02d}", 66797.4792, 66797.4792) for m in range(1, 8)
    ] + [("A", "2024-08", 66797.4793, 66797.4793)]
    df = spark.createDataFrame(
        rows, "cus_code string, month string, txn_amount double, revenue double"
    )
    row = best_lag_correlation(
        df, MAX_LAG, mean_lattice_scale=10000, mean_round_dp=6
    ).collect()[0]
    assert row["txn_mean"] == 66797.479213
    assert row["rev_mean"] == 66797.479213


def test_lattice_mean_rounded_negative_sums(spark):
    """Refund-month entities: a net-negative sum must floor correctly
    (both engines' % is truncated remainder — the bare a - a % b
    identity returned -0.02 for a mean of exactly -0.03) and round
    halves AWAY from zero like decimal ROUND_HALF_UP / F.round."""
    rows = [
        # mean exactly -0.03 (the live-repro case)
        ("NEG", "2024-01", -0.03, 1.0),
        ("NEG", "2024-02", -0.03, 1.0),
        # 6-dp midpoint: 7x -.4792 + 1x -.4793 -> exact mean
        # -66797.4792125, HALF_UP away from zero -> -66797.479213
        *[("MID", f"2024-{m:02d}", -66797.4792, 1.0) for m in range(1, 8)],
        ("MID", "2024-08", -66797.4793, 1.0),
    ]
    df = spark.createDataFrame(
        rows, "cus_code string, month string, txn_amount double, revenue double"
    )
    got = {
        r["cus_code"]: r["txn_mean"]
        for r in best_lag_correlation(
            df, MAX_LAG, mean_lattice_scale=10000, mean_round_dp=6
        ).collect()
    }
    assert got["NEG"] == -0.03
    assert got["MID"] == -66797.479213


def test_moment_state_skips_null_either_side(spark):
    """corr_from_moments must agree with the one-shot grid when the x
    side carries nulls: F.corr skips a pair when EITHER value is null,
    so the moment filter must too (a null x counted into n made the
    finished corr read 0.9 where the grid said 0.99587)."""
    import pytest as _pytest

    from mapping_timeseries_spark.operators.correlation import (
        corr_from_moments,
        corr_moment_state,
        lag_correlation_grid,
    )

    rows = [
        ("A", "2024-01", 1.0, 2.0),
        ("A", "2024-02", None, 3.0),
        ("A", "2024-03", 3.0, 5.0),
        ("A", "2024-04", 4.0, 6.0),
    ]
    df = spark.createDataFrame(
        rows, "cus_code string, month string, txn_amount double, revenue double"
    )
    grid = {
        (r["cus_code"], r["lag"]): (r["corr"], r["n_pairs"])
        for r in lag_correlation_grid(df, 2).collect()
    }
    fin = {
        (r["cus_code"], r["lag"]): (r["corr"], r["n_pairs"])
        for r in corr_from_moments(corr_moment_state(df, 2)).collect()
    }
    g_corr, g_n = grid[("A", 0)]
    f_corr, f_n = fin[("A", 0)]
    assert g_n == 3 and f_n == 3  # the null-x row is NOT a pair
    assert f_corr == _pytest.approx(g_corr, rel=1e-9)
    from mapping_timeseries_spark.operators.correlation import lattice_residual

    df = spark.createDataFrame(
        [("A", 1.2345), ("B", 2.0001)], "cus_code string, txn_amount double"
    )
    res = lattice_residual(df, "txn_amount", 10000).collect()[0]
    assert res["max_lattice_residual"] < 1e-6


def test_all_lags_array_sorted_and_complete(spark, merged):
    row = correlation_all_lags(merged, MAX_LAG).limit(1).collect()[0]
    lags = [e["lag"] for e in row["all_lags"]]
    assert lags == sorted(lags)
    assert lags[0] == 0


def test_incremental_corr_moments_match_full_recompute(spark, merged):
    """The incremental-pipeline invariant: merging the historical moment
    state with the delta computed from (max_lag-row tail + new months)
    equals the full-recompute state — so a month-append touches
    O(entities x max_lag) history rows instead of all history — and the
    finished corr matches both the moment formula on the full state and
    Spark's own corr aggregate."""
    from pyspark.sql import Window

    from mapping_timeseries_spark.operators.correlation import (
        corr_from_moments,
        corr_moment_state,
        corr_moments_delta,
        merge_moment_states,
    )

    months = sorted(r["month"] for r in merged.select("month").distinct().collect())
    cutoff = months[-4]  # last 4 months arrive "later"
    history = merged.where(F.col("month") < cutoff)
    new_rows = merged.where(F.col("month") >= cutoff)

    w = Window.partitionBy("cus_code").orderBy(F.col("month").desc())
    tail = (
        history.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= MAX_LAG)
        .drop("__rn")
    )

    incr = merge_moment_states(
        corr_moment_state(history, MAX_LAG),
        corr_moments_delta(tail, new_rows, MAX_LAG),
    )
    full = corr_moment_state(merged, MAX_LAG)

    def by_key(df):
        return {
            (r["cus_code"], r["lag"]): (
                r["n"], r["sx"], r["sy"], r["sxx"], r["syy"], r["sxy"]
            )
            for r in df.collect()
        }

    got, want = by_key(incr), by_key(full)
    assert got.keys() == want.keys()
    for k in want:
        assert got[k][0] == want[k][0], k  # pair counts exact
        for g, w_ in zip(got[k][1:], want[k][1:]):
            assert g == pytest.approx(w_, rel=1e-9, abs=1e-6), k

    # finishing the merged state reproduces the grid's corr values
    grid = {
        (r["cus_code"], r["lag"]): (r["corr"], r["n_pairs"])
        for r in lag_correlation_grid(merged, MAX_LAG).collect()
    }
    fin = {
        (r["cus_code"], r["lag"]): (r["corr"], r["n_pairs"])
        for r in corr_from_moments(incr).collect()
    }
    assert fin.keys() == grid.keys()
    for k, (c, n) in grid.items():
        fc, fn = fin[k]
        assert fn == n, k
        if c is None or (isinstance(c, float) and np.isnan(c)):
            # zero-variance side: grid NaN/null, moments NULL
            assert fc is None or np.isnan(fc), k
        else:
            assert fc == pytest.approx(c, rel=1e-7, abs=1e-9), k


def test_moment_state_exact_at_perfect_anticorrelation(spark):
    """r10 regression (found by the first sf0.1 run of the cross-engine
    state gate): a perfectly anti-correlated entity must finish at
    EXACTLY -1.0 through the bootstrap+append moment algebra. Raw double
    moments lost the n*sxy - sx*sy cancellation at |corr| ~ 1 and
    finished one live sf0.1 entity at -0.999985; the exact-lattice
    decimal moments cannot (the subtraction is exact, and the final
    sqrt/divide of cov=-sqrt(vx*vy) reproduces +/-1.0 bit-for-bit)."""
    from mapping_timeseries_spark.operators.correlation import (
        corr_from_moments,
        corr_moment_state,
        corr_moments_delta,
        merge_moment_states,
    )

    # 2dp money lattice, revenue an exact NEGATIVE affine image of txn
    rows = [
        ("C1", f"2023-{m:02d}", round(50_000.00 + 137.25 * m, 2),
         round(99_999.75 - 137.25 * m, 2))
        for m in range(1, 10)
    ]
    merged = spark.createDataFrame(
        rows, "cus_code string, month string, txn_amount double, revenue double"
    )
    history = merged.where(F.col("month") < "2023-07")
    new_rows = merged.where(F.col("month") >= "2023-07")
    tail = history.orderBy(F.col("month").desc()).limit(MAX_LAG)
    state = merge_moment_states(
        corr_moment_state(history, MAX_LAG),
        corr_moments_delta(tail, new_rows, MAX_LAG),
    )
    lag0 = {
        r["cus_code"]: r["corr"]
        for r in corr_from_moments(state).where(F.col("lag") == 0).collect()
    }
    assert lag0["C1"] == -1.0  # exact, no approx
