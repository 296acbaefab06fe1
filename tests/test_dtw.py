from __future__ import annotations

import numpy as np
import pytest

from mapping_timeseries_spark.operators.dtw import (
    dtw_align,
    dtw_pairs,
    dtw_per_entity,
    dtw_summary,
    flatten_dtw_paths,
    zscore,
)

from .oracles import dtw_oracle


def _path_cost(a, b, path, normalize):
    from mapping_timeseries_spark.operators.dtw import zscore

    az = zscore(a.astype(float)) if normalize else a.astype(float)
    bz = zscore(b.astype(float)) if normalize else b.astype(float)
    return sum(abs(az[i] - bz[j]) for i, j in path)


@pytest.mark.parametrize("window", [None, 1, 3])
@pytest.mark.parametrize("normalize", [True, False])
def test_dtw_matches_sequential_oracle(window, normalize):
    rng = np.random.default_rng(7)
    for trial in range(20):
        n = int(rng.integers(2, 30))
        m = n if window is not None else int(rng.integers(2, 30))
        a = rng.uniform(0, 100, n)
        b = rng.uniform(0, 100, m)
        cost, path = dtw_align(a, b, window=window, normalize=normalize)
        ocost, opath = dtw_oracle(a, b, window=window, normalize=normalize)
        if np.isinf(ocost):
            assert np.isinf(cost)
            continue
        # STRICT since r5: the wavefront accumulate is bitwise-equal to
        # the sequential DP, so cost AND path match exactly — no
        # "alternate equal-cost optimum" escape hatch (the r5 sf0.1
        # oracle run proved that hatch was hiding a real tie-break
        # divergence; see operators/dtw.py module docstring)
        assert cost == ocost, (trial, window)
        assert path == opath, (trial, window)


def test_accumulate_bitwise_matches_naive_dp():
    """The load-bearing r5 invariant: the wavefront accumulate produces
    a bitwise-identical acc matrix to the textbook sequential DP
    (cost + min of three neighbors per cell), banded and unbanded,
    rectangular, batched — including symmetric inputs that maximize
    mathematical ties. Not approx: array_equal."""
    from mapping_timeseries_spark.operators.dtw import (
        _accumulate,
        _batched_accumulate,
    )

    def naive(a, b, w):
        n, m = len(a), len(b)
        acc = np.full((n + 1, m + 1), np.inf)
        acc[0, 0] = 0.0
        for i in range(1, n + 1):
            jr = (
                range(max(1, i - w), min(m + 1, i + w + 1))
                if w is not None
                else range(1, m + 1)
            )
            for j in jr:
                step = abs(a[i - 1] - b[j - 1])
                acc[i, j] = step + min(
                    acc[i - 1, j], acc[i, j - 1], acc[i - 1, j - 1]
                )
        return acc

    rng = np.random.default_rng(11)
    for trial in range(60):
        n = int(rng.integers(2, 30))
        m = n if trial % 2 else int(rng.integers(2, 30))
        a = np.round(rng.normal(0, 100, n), 2)
        # every third trial: b is a prefix/duplicate of a — symmetric
        # cost matrices, the tie-dense case the r5 bug hid in
        b = a[:m].copy() if (trial % 3 == 0 and m <= n) else np.round(
            rng.normal(0, 100, m), 2
        )
        w = None if trial % 4 else int(rng.integers(1, 8))
        assert np.array_equal(_accumulate(a, b, w), naive(a, b, w)), (
            trial, n, m, w,
        )

    e, n = 16, 18
    A = np.round(rng.normal(0, 50, (e, n)), 2)
    B = A + np.where(
        rng.random((e, n)) < 0.5, 0.0, np.round(rng.normal(0, 1, (e, n)), 2)
    )
    for w in (None, 3):
        accb = _batched_accumulate(A, B, w)
        for i in range(e):
            assert np.array_equal(accb[i], _accumulate(A[i], B[i], w)), (i, w)


def test_path_invariants():
    rng = np.random.default_rng(3)
    a = rng.uniform(0, 10, 15)
    b = rng.uniform(0, 10, 12)
    cost, path = dtw_align(a, b)
    assert cost >= 0
    assert path[-1] == (14, 11)
    for (i0, j0), (i1, j1) in zip(path, path[1:]):
        assert (i1 - i0, j1 - j0) in {(0, 1), (1, 0), (1, 1)}


def test_band_respected():
    rng = np.random.default_rng(4)
    a = rng.uniform(0, 10, 20)
    b = rng.uniform(0, 10, 20)
    _, path = dtw_align(a, b, window=2)
    assert all(abs(i - j) <= 2 for i, j in path)


def test_band_narrower_than_length_gap_gives_inf():
    # |n - m| > window -> corner unreachable; inf propagates (SURVEY §7.4)
    a = np.arange(10.0)
    b = np.arange(3.0)
    cost, _ = dtw_align(a, b, window=2)
    assert np.isinf(cost)


def test_identical_series_zero_cost():
    a = np.array([1.0, 5.0, 3.0, 8.0])
    cost, path = dtw_align(a, a.copy())
    assert cost == pytest.approx(0.0)
    assert path == [(i, i) for i in range(4)]


def test_zscore_constant_series_mean_centers():
    out = zscore(np.array([4.0, 4.0, 4.0]))
    assert np.allclose(out, 0.0)


def test_single_point_series():
    cost, path = dtw_align(np.array([1.0]), np.array([2.0]))
    assert path == [(0, 0)]
    assert np.isfinite(cost)


@pytest.mark.parametrize("window", [None, 3])
def test_batched_path_matches_per_entity(spark, window):
    # the mapInPandas batched DP must agree with the applyInPandas scalar
    # path on cost and alignment pairs, across mixed series lengths
    rng = np.random.default_rng(5)
    rows = []
    for c in range(20):
        n = int(rng.integers(2, 30))
        vals = rng.uniform(10, 1000, n)
        revs = rng.uniform(10, 1000, n)
        for i in range(n):
            rows.append((f"C{c:03d}", f"20{i//12+10}-{i%12+1:02d}",
                         float(vals[i]), float(revs[i])))
    df = spark.createDataFrame(
        rows, "cus_code string, month string, txn_amount double, revenue double"
    )
    slow = {
        r["cus_code"]: r
        for r in dtw_per_entity(df, window_size=window).collect()
    }
    fast_sum = {r["cus_code"]: r for r in dtw_summary(df, window_size=window).collect()}
    assert set(slow) == set(fast_sum)
    for cus, s in slow.items():
        f = fast_sum[cus]
        if np.isinf(s["total_cost"]):
            assert np.isinf(f["total_cost"])
        else:
            assert f["total_cost"] == pytest.approx(s["total_cost"], rel=1e-9)
        assert f["num_mappings"] == s["num_mappings"]

    fast_pairs = dtw_pairs(df, window_size=window).toPandas()
    for cus, s in slow.items():
        got = fast_pairs[fast_pairs.cus_code == cus].sort_values(
            ["txn_idx", "rev_idx"]
        )
        want = sorted((p["txn_idx"], p["rev_idx"]) for p in s["path"])
        assert list(zip(got.txn_idx, got.rev_idx)) == want, cus


def test_per_entity_spark(spark):
    rows = []
    rng = np.random.default_rng(11)
    for cus in ["A", "B", "C"]:
        vals = rng.uniform(100, 1000, 12)
        for i in range(12):
            rows.append((cus, f"2024-{i+1:02d}", float(vals[i]), float(vals[i]) * 0.1))
    df = spark.createDataFrame(
        rows, "cus_code string, month string, txn_amount double, revenue double"
    )
    results = dtw_per_entity(df).collect()
    assert len(results) == 3
    for r in results:
        assert r["num_mappings"] == len(r["path"])
        # proportional series -> identical after z-score -> diagonal path
        assert r["total_cost"] == pytest.approx(0.0, abs=1e-9)
        assert [(p["txn_idx"], p["rev_idx"]) for p in r["path"]] == [
            (i, i) for i in range(12)
        ]
    flat = flatten_dtw_paths(dtw_per_entity(df))
    assert flat.count() == 36
    assert flat.columns == [
        "cus_code", "time1", "value1", "time2", "value2",
        "lag_offset", "method", "dtw_cost",
    ]


def test_batched_path_survives_null_values_in_series(spark):
    """A null value inside one entity's series must not kill the whole
    task: numpy converts None to NaN silently and Arrow maps NaN back to
    NULL — with the old non-nullable schema that was a task-killing
    IllegalStateException for one dirty entity. The dirty entity now
    comes back with a null cost the caller can filter, and the CLEAN
    entity in the same bucket keeps its exact normal result."""
    from mapping_timeseries_spark.operators.dtw import dtw_summary

    rows = []
    for i in range(6):
        rows.append(("CLEAN", f"2024-{i+1:02d}", float(i + 1), float(2 * i + 1)))
        rows.append(
            ("DIRTY", f"2024-{i+1:02d}",
             None if i == 3 else float(i + 1), float(i + 2))
        )
    df = spark.createDataFrame(
        rows, "cus_code string, month string, txn_amount double, revenue double"
    )
    got = {r["cus_code"]: r for r in dtw_summary(df).collect()}
    assert set(got) == {"CLEAN", "DIRTY"}
    # clean entity: identical to its isolated (all-clean) run
    alone = dtw_summary(df.where(df.cus_code == "CLEAN")).collect()[0]
    assert got["CLEAN"]["total_cost"] == pytest.approx(alone["total_cost"])
    assert got["CLEAN"]["num_mappings"] == alone["num_mappings"]
    # dirty entity: present with a null (was-NaN) cost, never dropped
    assert got["DIRTY"]["total_cost"] is None
    assert got["DIRTY"]["num_mappings"] >= 1


def test_batched_path_scalar_fallback_on_undecodable_bucket(spark):
    """The per-bucket scalar retry itself: feed _bucket_results inputs
    the vectorized path genuinely cannot stack (ragged object content),
    via the run()-level try/except, by checking _scalar_bucket_results
    directly — per-entity dtw_align, identity-path degradation for an
    entity that still fails (mapping_engine.py:313-316)."""
    import numpy as np

    from mapping_timeseries_spark.operators.dtw import (
        _scalar_bucket_results,
        dtw_align,
    )

    keys = np.array(["OK", "BAD"])
    months = [np.array(["2024-01", "2024-02"]), np.array(["2024-01", "2024-02"])]
    txn = [np.array([1.0, 2.0]), np.array([object(), 2.0], dtype=object)]
    rev = [np.array([2.0, 4.0]), np.array([1.0, 2.0])]
    out = list(
        _scalar_bucket_results(keys, months, txn, rev, None, True, False)
    )
    by_key = {str(o["cus_code"][0]): o for o in out}
    want_cost, want_path = dtw_align(
        np.array([1.0, 2.0]), np.array([2.0, 4.0]), normalize=True
    )
    assert by_key["OK"]["total_cost"][0] == pytest.approx(want_cost)
    assert by_key["OK"]["num_mappings"][0] == len(want_path)
    # BAD's float() conversion raises -> identity path, cost 0.0
    assert by_key["BAD"]["total_cost"][0] == 0.0
    assert by_key["BAD"]["num_mappings"][0] == 2
