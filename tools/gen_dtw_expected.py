"""Generate the DTW expected tables that back the driver's DuckDB oracle.

The per-entity DTW dynamic program is not expressible in plain SQL, so its
hash gate uses a *pre-computed expected table*: this script runs the
independent naive numpy DP from ``tests/oracles.py`` (a deliberately
loop-based re-implementation of the reference semantics,
mapping_engine.py:162-216 — NOT the engine's vectorized min-plus code) over
the same merged series the engine consumes, and writes the results to
parquet under ``artifacts/``. The oracle SQL then simply reads the parquet
and the driver hashes Spark-vs-expected like any other query.

Determinism contract (why Spark can hash-match a numpy program):

- merged ``txn_amount``/``revenue`` are snapped to the exact 1e-4 lattice
  on BOTH sides (``CAST(ROUND(x*10000) AS BIGINT)/10000.0``) before DTW, so
  the input vectors are bit-identical doubles regardless of each engine's
  float-sum ordering;
- both sides sort by the ``YYYY-MM`` month string (unique per entity);
- z-normalization is the same numpy expression on identical inputs;
- total_cost is compared after round(·, 6); num_mappings is an integer.

Measured parity (round 3): at sf0.01 and sf0.1, 0/15493 entities differ in
(total_cost@6dp, num_mappings); alignment paths are identical at sf0.01
(the driver's gate) with 14/14091 entities at sf0.1 picking a different
equal-cost path (min-plus vs sequential DP last-ulp tie flips).

Each row carries ``sf_tag`` = row count of the ``orders`` table at that
scale factor, so one static oracle SQL string can select the right slice
with ``WHERE sf_tag = (SELECT count(*) FROM orders)``.

Usage: python tools/gen_dtw_expected.py [sf_dir ...]
(default: every /root/testdata/sf* directory)
"""

from __future__ import annotations

import glob
import os
import sys

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mapping_timeseries_spark.sources.fixtures import SQL_MERGED  # noqa: E402
from tests.oracles import dtw_oracle  # noqa: E402

ARTIFACTS = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "artifacts"
)
SNAP = "CAST(ROUND({c}*10000) AS BIGINT)/10000.0"

# Content fingerprint of the (lattice-snapped) merged input a slice was
# generated from. sf_tag alone (orders row count) can't catch regenerated
# testdata with an unchanged row count but different values; the guard in
# tests/test_expected_artifacts.py recomputes this from live testdata and
# compares. md5-of-ordered-string-agg: stable across DuckDB versions.
SQL_INPUT_FP = (
    "SELECT md5(string_agg("
    "  cus_code || ':' || month || ':' "
    "  || CAST(ROUND(txn_amount*10000) AS BIGINT) || ':' "
    "  || CAST(ROUND(revenue*10000) AS BIGINT), "
    "  '|' ORDER BY cus_code, month)) "
    "FROM ({merged}) m"
)


def input_fingerprint(con: "duckdb.DuckDBPyConnection") -> str:
    """md5 over the ordered lattice-snapped merged rows (views must be
    registered on ``con``)."""
    return con.execute(SQL_INPUT_FP.format(merged=SQL_MERGED)).fetchone()[0]


def connect_views(sf_dir: str) -> "duckdb.DuckDBPyConnection":
    con = duckdb.connect()
    for t in ("orders", "lineitem"):
        p = f"{sf_dir}/{t}.parquet"
        # Spark-written tables (the scale_stress corpora) are DIRECTORIES
        # of part files — glob them, same as tools/compare_oracle.py
        src = f"{p}/*.parquet" if os.path.isdir(p) else p
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")
    return con


def expected_for(sf_dir: str) -> tuple[pd.DataFrame, pd.DataFrame]:
    con = connect_views(sf_dir)
    sf_tag = con.execute("SELECT count(*) FROM orders").fetchone()[0]
    input_fp = input_fingerprint(con)
    merged = con.execute(
        f"SELECT cus_code, month, {SNAP.format(c='txn_amount')} AS txn_amount, "
        f"{SNAP.format(c='revenue')} AS revenue FROM ({SQL_MERGED}) m "
        "ORDER BY cus_code, month"
    ).fetchdf()

    summary, mapping = [], []
    for cus, g in merged.groupby("cus_code", sort=False):
        txn = g["txn_amount"].to_numpy()
        rev = g["revenue"].to_numpy()
        months = g["month"].to_numpy()
        cost, path = dtw_oracle(txn, rev, window=None, normalize=True)
        summary.append((sf_tag, int(cus), float(cost), len(path)))
        for ti, ri in path:
            mapping.append(
                (
                    sf_tag,
                    int(cus),
                    int(ti),
                    int(ri),
                    str(months[ti]),
                    str(months[ri]),
                    float(txn[ti]),
                    float(rev[ri]),
                    float(cost),
                )
            )
    sdf = pd.DataFrame(
        summary, columns=["sf_tag", "cus_code", "total_cost", "num_mappings"]
    )
    mdf = pd.DataFrame(
        mapping,
        columns=[
            "sf_tag",
            "cus_code",
            "txn_idx",
            "rev_idx",
            "txn_month",
            "rev_month",
            "txn_amount",
            "revenue",
            "total_cost",
        ],
    )
    sdf["input_fp"] = input_fp
    mdf["input_fp"] = input_fp
    return sdf, mdf


def main() -> None:
    sf_dirs = sys.argv[1:] or sorted(glob.glob("/root/testdata/sf*"))
    os.makedirs(ARTIFACTS, exist_ok=True)
    summaries, mappings = [], []
    for sf_dir in sf_dirs:
        sdf, mdf = expected_for(sf_dir)
        print(f"{sf_dir}: {len(sdf)} entities, {len(mdf)} path steps")
        summaries.append(sdf)
        mappings.append(mdf)
    all_s = pd.concat(summaries, ignore_index=True)
    all_m = pd.concat(mappings, ignore_index=True)
    # MERGE with any slices not regenerated in this run: invoking the
    # generator with one explicit sf_dir (the documented usage) must
    # refresh that slice, not clobber every other scale factor's
    # expected rows (which would red all DTW-family gates at the other
    # sfs on the next run)
    s_path = os.path.join(ARTIFACTS, "dtw_expected_summary.parquet")
    m_path = os.path.join(ARTIFACTS, "dtw_expected_mapping.parquet")
    new_tags = set(all_s["sf_tag"])
    for path, new in ((s_path, all_s), (m_path, all_m)):
        if os.path.exists(path):
            old = pd.read_parquet(path)
            keep = old[~old["sf_tag"].isin(new_tags)]
            if len(keep):
                print(f"keeping {len(keep)} rows of other sf slices in {path}")
                new = pd.concat([keep, new], ignore_index=True)
        new.to_parquet(path)
    print(
        f"wrote {len(all_s)} summary / {len(all_m)} mapping rows -> {ARTIFACTS}"
    )


if __name__ == "__main__":
    main()
