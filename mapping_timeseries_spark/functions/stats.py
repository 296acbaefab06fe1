"""Statistical functions: Pearson p-values without scipy (SURVEY §2.9 D2).

The research notebook attaches a two-sided p-value to every (entity, lag)
correlation (02_corr_mapping.p:60-91, scipy.stats.pearsonr). Spark has no
Student-t CDF and this environment has no scipy, so the p-value is derived
from (r, n) directly:

    t = r * sqrt((n-2) / (1-r^2))
    p = I_x(nu/2, 1/2)   with  nu = n-2,  x = nu / (nu + t^2)

where I_x is the regularized incomplete beta function, computed with the
standard continued-fraction (modified Lentz) algorithm. Vectorized numpy
inside an Arrow-batched pandas UDF — the one permissible Python hot path,
applied only to the (entity, lag) grid (tiny relative to the fact data).

Tests pin the implementation against exact closed forms of the Student-t
survival function at nu = 1 (Cauchy), 2 and 4.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType

__all__ = ["betainc_regularized", "pearson_pvalue_np", "pearson_pvalue_udf"]

_MAX_ITER = 200
_EPS = 3e-14
_TINY = 1e-300


def _betacf(a: np.ndarray, b: np.ndarray, x: np.ndarray) -> np.ndarray:
    """Continued fraction for the incomplete beta (modified Lentz),
    vectorized over same-shape arrays."""
    qab = a + b
    qap = a + 1.0
    qam = a - 1.0
    c = np.ones_like(x)
    d = 1.0 - qab * x / qap
    d = np.where(np.abs(d) < _TINY, _TINY, d)
    d = 1.0 / d
    h = d.copy()
    for m in range(1, _MAX_ITER + 1):
        m2 = 2 * m
        aa = m * (b - m) * x / ((qam + m2) * (a + m2))
        d = 1.0 + aa * d
        d = np.where(np.abs(d) < _TINY, _TINY, d)
        c = 1.0 + aa / c
        c = np.where(np.abs(c) < _TINY, _TINY, c)
        d = 1.0 / d
        h = h * d * c
        aa = -(a + m) * (qab + m) * x / ((a + m2) * (qap + m2))
        d = 1.0 + aa * d
        d = np.where(np.abs(d) < _TINY, _TINY, d)
        c = 1.0 + aa / c
        c = np.where(np.abs(c) < _TINY, _TINY, c)
        d = 1.0 / d
        delta = d * c
        h = h * delta
        if np.all(np.abs(delta - 1.0) < _EPS):
            break
    return h


def betainc_regularized(
    a: np.ndarray, b: np.ndarray, x: np.ndarray
) -> np.ndarray:
    """Regularized incomplete beta I_x(a, b), vectorized.

    Uses the symmetry I_x(a,b) = 1 - I_{1-x}(b,a) to keep the continued
    fraction in its fast-converging region x < (a+1)/(a+b+2).
    """
    a = np.asarray(a, dtype=float)
    b = np.asarray(b, dtype=float)
    x = np.asarray(x, dtype=float)
    a, b, x = np.broadcast_arrays(a, b, x)
    out = np.empty_like(x)

    ln_front = (
        a * np.log(np.clip(x, _TINY, None))
        + b * np.log(np.clip(1.0 - x, _TINY, None))
        - (_lbeta(a, b))
    )
    use_direct = x < (a + 1.0) / (a + b + 2.0)

    # direct branch
    xa, aa, ba = x[use_direct], a[use_direct], b[use_direct]
    if xa.size:
        front = np.exp(ln_front[use_direct]) / aa
        out[use_direct] = front * _betacf(aa, ba, xa)
    # symmetric branch — the log-front is symmetric in (a,x)<->(b,1-x),
    # so ln_front computed above already covers it; recomputing it here
    # would run the _lbeta lgamma loop (the costly part) a second time
    xs, as_, bs = x[~use_direct], a[~use_direct], b[~use_direct]
    if xs.size:
        front = np.exp(ln_front[~use_direct]) / bs
        out[~use_direct] = 1.0 - front * _betacf(bs, as_, 1.0 - xs)

    out[x <= 0.0] = 0.0
    out[x >= 1.0] = 1.0
    return out


def _lbeta(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    from math import lgamma

    # otypes so empty inputs are legal (all-filtered degenerate batches)
    lg = np.vectorize(lgamma, otypes=[float])
    return lg(a) + lg(b) - lg(a + b)


def pearson_pvalue_np(r: np.ndarray, n: np.ndarray) -> np.ndarray:
    """Two-sided Pearson p-value from correlation r and sample size n.

    Matches scipy.stats.pearsonr's p for n > 2; returns NaN for n <= 2 or
    |r| >= 1 -> 0.0 (perfect correlation).
    """
    r = np.asarray(r, dtype=float)
    n = np.asarray(n, dtype=float)
    r, n = np.broadcast_arrays(r, n)
    nu = n - 2.0
    out = np.full_like(r, np.nan)
    ok = (nu > 0) & np.isfinite(r)
    r_ok = np.clip(r[ok], -1.0, 1.0)
    nu_ok = nu[ok]
    with np.errstate(divide="ignore", invalid="ignore"):
        t2 = r_ok**2 * nu_ok / np.clip(1.0 - r_ok**2, _TINY, None)
        x = nu_ok / (nu_ok + t2)
    p = betainc_regularized(nu_ok / 2.0, 0.5, x)
    p[np.abs(r_ok) >= 1.0] = 0.0
    res = out.copy()
    res[ok] = np.clip(p, 0.0, 1.0)
    return res


# explicit DataType (not a DDL string): the decorator must not require an
# active SparkSession at import time
@pandas_udf(DoubleType())
def pearson_pvalue_udf(r: pd.Series, n: pd.Series) -> pd.Series:
    """Arrow-batched column form of :func:`pearson_pvalue_np`."""
    return pd.Series(pearson_pvalue_np(r.to_numpy(), n.to_numpy(dtype=float)))


def with_pvalue(corr_col: Column, n_col: Column) -> Column:
    """Column expression attaching the two-sided p-value."""
    return pearson_pvalue_udf(corr_col, n_col)
