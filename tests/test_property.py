from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from mapping_timeseries_spark.operators.dtw import dtw_align
from mapping_timeseries_spark.operators.correlation import best_lag_correlation

from .oracles import best_lag_oracle, dtw_oracle

finite = st.floats(
    min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False
)
series = st.lists(finite, min_size=1, max_size=25)


@settings(max_examples=60, deadline=None)
@given(a=series, b=series, window=st.sampled_from([None, 1, 2, 5]),
       normalize=st.booleans())
def test_dtw_property(a, b, window, normalize):
    a = np.array(a)
    b = np.array(b)
    cost, path = dtw_align(a, b, window=window, normalize=normalize)
    ocost, opath = dtw_oracle(a, b, window=window, normalize=normalize)
    if np.isinf(ocost):
        assert np.isinf(cost)
        return
    assert cost == pytest.approx(ocost, rel=1e-9, abs=1e-9)
    # path validity invariants always hold
    assert path[-1] == (len(a) - 1, len(b) - 1)
    for (i0, j0), (i1, j1) in zip(path, path[1:]):
        assert (i1 - i0, j1 - j0) in {(0, 1), (1, 0), (1, 1)}
    if window is not None:
        assert all(abs(i - j) <= window for i, j in path)


def test_best_lag_fuzz_adversarial(spark):
    """Nasty entity shapes in one Spark pass: constants, zeros, negatives,
    n=1, n=2, monotones — each must match the numpy reference semantics."""
    rng = np.random.default_rng(41)
    rows = []
    specs = {}
    for e in range(40):
        kind = e % 8
        n = [1, 2, 3, 5, 8, 13, 24, 24][kind]
        if kind == 0:
            txn, rev = [5.0], [1.0]
        elif kind == 1:
            txn, rev = [3.0, 3.0], [7.0, 7.0]          # constants, n=2
        elif kind == 2:
            txn, rev = [0.0] * 3, [0.0] * 3            # all zeros
        elif kind == 3:
            txn = list(range(5)); rev = list(range(5, 0, -1))  # anti-corr
        else:
            txn = rng.uniform(-100, 100, n).tolist()
            rev = rng.uniform(-100, 100, n).tolist()
        cus = f"E{e:03d}"
        specs[cus] = (np.array(txn), np.array(rev))
        for i in range(n):
            rows.append((cus, f"20{10 + i // 12}-{i % 12 + 1:02d}",
                         float(txn[i]), float(rev[i])))
    df = spark.createDataFrame(
        rows, "cus_code string, month string, txn_amount double, revenue double"
    )
    got = {r["cus_code"]: r for r in best_lag_correlation(df, 6).collect()}
    assert set(got) == set(specs)
    for cus, (txn, rev) in specs.items():
        lag, corr = best_lag_oracle(txn, rev, 6)
        assert got[cus]["optimal_lag"] == lag, cus
        assert got[cus]["correlation"] == pytest.approx(corr, abs=1e-9), cus
