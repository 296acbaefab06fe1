"""Pure-numpy re-implementations of the reference semantics (SURVEY §5),
used as pytest oracles for the non-SQL-expressible operators.

These follow the *documented* behavior of mapping_engine.py:109-216 (lag
scan with strict-improvement argmax; banded DTW with up>left>diag backtrack
ties) — independently written, loop-based, deliberately naive.
"""

from __future__ import annotations

import numpy as np


def pearson(x: np.ndarray, y: np.ndarray) -> float:
    x = x.astype(float)
    y = y.astype(float)
    sx, sy = x.std(), y.std()
    if sx == 0 or sy == 0:
        return float("nan")
    return float(((x - x.mean()) * (y - y.mean())).mean() / (sx * sy))


def best_lag_oracle(txn: np.ndarray, rev: np.ndarray, max_lag: int) -> tuple[int, float]:
    """Semantics of mapping_engine.py:117-160."""
    if len(txn) < 2 or len(rev) < 2:
        return 0, 0.0
    winner, best = 0, -1.0
    for lag in range(max_lag + 1):
        if len(txn) - lag < 2 or len(rev) - lag < 2:
            continue
        a = txn if lag == 0 else txn[:-lag]
        b = rev[lag:]
        k = min(len(a), len(b))
        if k < 2:
            continue
        r = pearson(a[:k], b[:k])
        if not np.isnan(r) and r > best:
            best, winner = r, lag
    return winner, best


def znorm(arr: np.ndarray) -> np.ndarray:
    mu, sd = arr.mean(), arr.std()
    return arr - mu if (sd == 0 or np.isnan(sd)) else (arr - mu) / sd


def dtw_oracle(
    txn: np.ndarray,
    rev: np.ndarray,
    window: int | None = None,
    normalize: bool = True,
) -> tuple[float, list[tuple[int, int]]]:
    """Semantics of mapping_engine.py:162-216, naive sequential DP."""
    a = znorm(txn.astype(float)) if normalize else txn.astype(float)
    b = znorm(rev.astype(float)) if normalize else rev.astype(float)
    n, m = len(a), len(b)
    acc = np.full((n + 1, m + 1), np.inf)
    acc[0, 0] = 0.0
    for i in range(1, n + 1):
        j_range = (
            range(max(1, i - window), min(m + 1, i + window + 1))
            if window is not None
            else range(1, m + 1)
        )
        for j in j_range:
            step = abs(a[i - 1] - b[j - 1])
            acc[i, j] = step + min(acc[i - 1, j], acc[i, j - 1], acc[i - 1, j - 1])
    path = []
    i, j = n, m
    while i > 0 and j > 0:
        path.append((i - 1, j - 1))
        options = [(acc[i - 1, j], (i - 1, j)), (acc[i, j - 1], (i, j - 1)),
                   (acc[i - 1, j - 1], (i - 1, j - 1))]
        _, (i, j) = min(options, key=lambda t: t[0])
    path.reverse()
    return float(acc[n, m]), path
