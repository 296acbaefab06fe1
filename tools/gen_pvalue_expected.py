"""Generate the p-value expected table that backs the corr_pvalues oracle.

DuckDB has no Student-t CDF, so the p-value column gets the same
expected-table treatment as DTW (tools/gen_dtw_expected.py): an
INDEPENDENT implementation — numerical quadrature of the Student-t tail,
not the engine's incomplete-beta continued fraction
(functions/stats.py) — computes the two-sided p for every (entity, lag)
cell of the lattice-snapped lag grid, and the oracle SQL joins the
parquet to the SQL-expressible grid.

Independence + agreement: the tail integral uses Gauss-Legendre on
``u = t + s/(1-s)`` (a different algorithm family from the continued
fraction); measured agreement with ``pearson_pvalue_np`` is <= 3.2e-13
absolute over a 5000-point (r, n) sweep spanning the grid's range — far
inside the 5e-7 round-to-6dp window the driver compares at.

Determinism contract (cf. gen_dtw_expected): merged values snapped to the
1e-4 lattice on both sides, so numpy's corrcoef and the engines' corr see
bit-identical inputs; pair alignment is positional after the month sort
(lead(revenue, lag) OVER (ORDER BY month)), matching
correlation.lag_correlation_grid (mapping_engine.py:135-160 semantics).

NULL semantics match pearson_pvalue_np: n_pairs < 3 or non-finite r ->
NULL; |r| >= 1 -> 0.0.

Usage: python tools/gen_pvalue_expected.py [sf_dir ...]
"""

from __future__ import annotations

import glob
import os
import sys
from math import lgamma, pi, sqrt

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mapping_timeseries_spark.sources.fixtures import SQL_MERGED  # noqa: E402
from tools.gen_dtw_expected import connect_views, input_fingerprint  # noqa: E402

ARTIFACTS = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "artifacts"
)
SNAP = "CAST(ROUND({c}*10000) AS BIGINT)/10000.0"
MAX_LAG = 6  # mirrors __spark_entry__.MAX_LAG / reference default

_NODES, _WEIGHTS = np.polynomial.legendre.leggauss(400)
_S = 0.5 * (_NODES + 1.0)
_WS = 0.5 * _WEIGHTS
_U_OFFSET = _S / (1.0 - _S)  # u = t + s/(1-s), jac = 1/(1-s)^2
_JAC = 1.0 / (1.0 - _S) ** 2


def _t_tail(t: np.ndarray, nu: np.ndarray) -> np.ndarray:
    """P(T_nu > t) for t >= 0, vectorized over rows (chunked outer grid)."""
    t = np.asarray(t, float)[:, None]
    nu = np.asarray(nu, float)[:, None]
    u = t + _U_OFFSET[None, :]
    lc = (
        np.vectorize(lgamma)( (nu[:, 0] + 1.0) / 2.0)
        - np.vectorize(lgamma)(nu[:, 0] / 2.0)
        - 0.5 * np.log(nu[:, 0] * pi)
    )[:, None]
    dens = np.exp(lc - (nu + 1.0) / 2.0 * np.log1p(u * u / nu))
    return np.sum(_WS[None, :] * dens * _JAC[None, :], axis=1)


def pvalues_quadrature(r: np.ndarray, n: np.ndarray) -> np.ndarray:
    """Two-sided Pearson p from (r, n) by t-tail quadrature; NaN where the
    engine emits NaN (n < 3 / non-finite r), 0.0 at |r| >= 1."""
    r = np.asarray(r, float)
    n = np.asarray(n, float)
    out = np.full(r.shape, np.nan)
    nu = n - 2.0
    ok = (nu > 0) & np.isfinite(r)
    r_ok = np.clip(r[ok], -1.0, 1.0)
    nu_ok = nu[ok]
    perfect = np.abs(r_ok) >= 1.0
    t = np.zeros_like(r_ok)
    with np.errstate(divide="ignore", invalid="ignore"):
        t[~perfect] = np.abs(r_ok[~perfect]) * np.sqrt(
            nu_ok[~perfect] / (1.0 - r_ok[~perfect] ** 2)
        )
    p = np.empty_like(r_ok)
    if np.any(~perfect):
        chunks = []
        idx = np.flatnonzero(~perfect)
        for lo in range(0, idx.size, 20000):
            sel = idx[lo : lo + 20000]
            chunks.append(np.clip(2.0 * _t_tail(t[sel], nu_ok[sel]), 0.0, 1.0))
        p[~perfect] = np.concatenate(chunks)
    p[perfect] = 0.0
    out[ok] = p
    return out


def expected_for(sf_dir: str) -> pd.DataFrame:
    con = connect_views(sf_dir)
    sf_tag = con.execute("SELECT count(*) FROM orders").fetchone()[0]
    input_fp = input_fingerprint(con)
    merged = con.execute(
        f"SELECT cus_code, month, {SNAP.format(c='txn_amount')} AS txn_amount, "
        f"{SNAP.format(c='revenue')} AS revenue FROM ({SQL_MERGED}) m "
        "ORDER BY cus_code, month"
    ).fetchdf()

    rows_cus, rows_lag, rs, ns = [], [], [], []
    for cus, g in merged.groupby("cus_code", sort=False):
        txn = g["txn_amount"].to_numpy()
        rev = g["revenue"].to_numpy()
        ln = len(txn)
        for lag in range(MAX_LAG + 1):
            a = txn[: ln - lag] if lag else txn
            b = rev[lag:]
            n = max(ln - lag, 0)
            r = np.nan
            if n >= 2:
                with np.errstate(divide="ignore", invalid="ignore"):
                    r = float(np.corrcoef(a, b)[0, 1])
            rows_cus.append(int(cus))
            rows_lag.append(lag)
            rs.append(r)
            ns.append(n)
    p = pvalues_quadrature(np.array(rs), np.array(ns, dtype=float))
    return pd.DataFrame(
        {
            "sf_tag": sf_tag,
            "cus_code": rows_cus,
            "lag": rows_lag,
            "pvalue": [None if np.isnan(x) else float(x) for x in p],
            "input_fp": input_fp,
        }
    )


def main() -> None:
    sf_dirs = sys.argv[1:] or sorted(glob.glob("/root/testdata/sf*"))
    os.makedirs(ARTIFACTS, exist_ok=True)
    frames = []
    for sf_dir in sf_dirs:
        df = expected_for(sf_dir)
        print(f"{sf_dir}: {len(df)} grid cells")
        frames.append(df)
    allf = pd.concat(frames, ignore_index=True)
    # merge with slices not regenerated in this run — same clobber
    # guard as gen_dtw_expected (an explicit sf_dir must not destroy
    # the other scale factors' expected rows)
    path = os.path.join(ARTIFACTS, "pvalue_expected.parquet")
    if os.path.exists(path):
        old = pd.read_parquet(path)
        keep = old[~old["sf_tag"].isin(set(allf["sf_tag"]))]
        if len(keep):
            print(f"keeping {len(keep)} rows of other sf slices")
            allf = pd.concat([keep, allf], ignore_index=True)
    allf.to_parquet(path)
    print(f"wrote {len(allf)} rows -> {path}")


if __name__ == "__main__":
    main()
