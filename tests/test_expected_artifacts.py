"""Staleness guard for the pre-computed oracle artifacts.

The driver regenerates /root/testdata between rounds (and its generator
has changed before — events.ts flipped physical type in round 3). The
DTW / p-value expected tables under artifacts/ are keyed to the data
they were generated from; if the data drifts, every query gated on them
goes red with no obvious cause. These tests fail EARLY and name the fix:
re-run tools/gen_dtw_expected.py and tools/gen_pvalue_expected.py.

No Spark needed — duckdb + numpy only, so this is one of the fastest
modules in the suite.
"""

from __future__ import annotations

import glob
import os

import duckdb
import numpy as np
import pandas as pd
import pytest

ARTIFACTS = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "artifacts")
REGEN = "stale artifacts? re-run tools/gen_dtw_expected.py and tools/gen_pvalue_expected.py"


def _sf_dirs():
    return sorted(glob.glob("/root/testdata/sf*"))


def _orders_count(sf_dir):
    con = duckdb.connect()
    return con.execute(
        f"SELECT count(*) FROM '{sf_dir}/orders.parquet'"
    ).fetchone()[0]


@pytest.mark.parametrize("artifact", [
    "dtw_expected_summary.parquet",
    "dtw_expected_mapping.parquet",
    "pvalue_expected.parquet",
])
def test_artifact_sf_tags_match_testdata(artifact):
    tags = set(pd.read_parquet(os.path.join(ARTIFACTS, artifact))["sf_tag"])
    for sf_dir in _sf_dirs():
        assert _orders_count(sf_dir) in tags, (sf_dir, artifact, REGEN)


def test_dtw_expected_matches_live_oracle_sf0001():
    """Recompute sf0.001 end to end with the independent numpy DP and
    require byte-equal agreement with the committed artifact slice."""
    from tools.gen_dtw_expected import expected_for

    sf_dir = "/root/testdata/sf0.001"
    live_summary, live_mapping = expected_for(sf_dir)
    tag = _orders_count(sf_dir)
    stored = pd.read_parquet(
        os.path.join(ARTIFACTS, "dtw_expected_summary.parquet")
    )
    stored = stored[stored["sf_tag"] == tag].reset_index(drop=True)
    assert len(stored) == len(live_summary), REGEN
    merged = stored.merge(
        live_summary, on=["sf_tag", "cus_code"], suffixes=("_stored", "_live")
    )
    assert len(merged) == len(stored), REGEN
    assert (merged["num_mappings_stored"] == merged["num_mappings_live"]).all(), REGEN
    assert np.array_equal(
        merged["total_cost_stored"].to_numpy(),
        merged["total_cost_live"].to_numpy(),
    ), REGEN

    stored_map = pd.read_parquet(
        os.path.join(ARTIFACTS, "dtw_expected_mapping.parquet")
    )
    assert (stored_map["sf_tag"] == tag).sum() == len(live_mapping), REGEN


def test_pvalue_expected_matches_live_oracle_sf0001():
    from tools.gen_pvalue_expected import expected_for

    sf_dir = "/root/testdata/sf0.001"
    live = expected_for(sf_dir)
    tag = _orders_count(sf_dir)
    stored = pd.read_parquet(os.path.join(ARTIFACTS, "pvalue_expected.parquet"))
    stored = stored[stored["sf_tag"] == tag].reset_index(drop=True)
    merged = stored.merge(
        live, on=["sf_tag", "cus_code", "lag"], suffixes=("_stored", "_live")
    )
    assert len(merged) == len(stored) == len(live), REGEN
    a = merged["pvalue_stored"].to_numpy(dtype=float)
    b = merged["pvalue_live"].to_numpy(dtype=float)
    both_nan = np.isnan(a) & np.isnan(b)
    assert np.all(both_nan | (a == b)), REGEN
