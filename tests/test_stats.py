from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from mapping_timeseries_spark.functions.stats import (
    betainc_regularized,
    pearson_pvalue_np,
)


def t_sf_exact(t: float, nu: int) -> float:
    """Student-t survival function: Cauchy closed form at nu=1, else
    high-resolution numeric quadrature of the t density (independent of the
    betainc implementation under test)."""
    if nu == 1:  # Cauchy
        return 0.5 - math.atan(t) / math.pi
    norm = math.exp(
        math.lgamma((nu + 1) / 2) - math.lgamma(nu / 2)
    ) / math.sqrt(nu * math.pi)
    # integrate density from 0 to t on a fine grid; sf = 0.5 - integral
    grid = np.linspace(0.0, t, 200001)
    dens = norm * (1.0 + grid**2 / nu) ** (-(nu + 1) / 2)
    return 0.5 - float(np.trapz(dens, grid))


def p_exact(r: float, n: int) -> float:
    nu = n - 2
    t = abs(r) * math.sqrt(nu / (1.0 - r * r))
    return 2.0 * t_sf_exact(t, nu)


@pytest.mark.parametrize("n", [3, 4, 6])
@pytest.mark.parametrize("r", [0.0, 0.1, 0.3, -0.5, 0.7, -0.9, 0.99])
def test_pvalue_matches_closed_forms(r, n):
    got = float(pearson_pvalue_np(np.array([r]), np.array([n]))[0])
    want = p_exact(r, n)
    assert got == pytest.approx(want, rel=1e-9, abs=1e-12), (r, n)


def test_pvalue_properties():
    # p(r=0) = 1; monotone decreasing in |r|; in [0,1]; n<=2 -> NaN
    rs = np.linspace(0, 0.999, 50)
    ps = pearson_pvalue_np(rs, np.full_like(rs, 12))
    assert ps[0] == pytest.approx(1.0)
    assert np.all(np.diff(ps) <= 1e-12)
    assert np.all((ps >= 0) & (ps <= 1))
    assert np.isnan(pearson_pvalue_np(np.array([0.5]), np.array([2]))[0])
    assert pearson_pvalue_np(np.array([1.0]), np.array([10]))[0] == 0.0


def test_betainc_basics():
    # I_x(1,1) = x (uniform); I_x(a,b) symmetric around its median cases
    xs = np.array([0.0, 0.25, 0.5, 0.75, 1.0])
    np.testing.assert_allclose(
        betainc_regularized(np.ones(5), np.ones(5), xs), xs, atol=1e-12
    )
    # I_x(0.5, 0.5) = (2/pi) * asin(sqrt(x)) (arcsine law)
    x = np.array([0.1, 0.4, 0.9])
    np.testing.assert_allclose(
        betainc_regularized(np.full(3, 0.5), np.full(3, 0.5), x),
        2 / np.pi * np.arcsin(np.sqrt(x)),
        rtol=1e-10,
    )


def test_grid_pvalues_on_spark(spark):
    from mapping_timeseries_spark.operators.correlation import lag_grid_with_pvalues

    rows = []
    rng = np.random.default_rng(31)
    for cus in ["A", "B"]:
        base = rng.uniform(100, 1000, 12)
        for i in range(12):
            rows.append(
                (cus, f"2024-{i+1:02d}", float(base[i]),
                 float(base[i] * 0.1 + rng.normal(0, 5)))
            )
    df = spark.createDataFrame(
        rows, "cus_code string, month string, txn_amount double, revenue double"
    )
    grid = lag_grid_with_pvalues(df, 3).collect()
    for row in grid:
        if row["corr"] is not None and not math.isnan(row["corr"]) and row["n_pairs"] > 2:
            assert 0.0 <= row["pvalue"] <= 1.0
            want = p_exact(max(min(row["corr"], 1.0), -1.0), row["n_pairs"]) \
                if row["n_pairs"] - 2 in (1, 2, 4) else None
            if want is not None:
                assert row["pvalue"] == pytest.approx(want, rel=1e-9)
