from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.001"


def test_oracle_keys_subset_of_queries():
    q = entry_mod.queries()
    o = entry_mod.oracle_sql()
    assert set(o) <= set(q)
    # every non-oracle query is one of the documented non-SQL-expressible ops
    rows_only = set(q) - set(o)
    assert rows_only == {
        # per-group DP (applyInPandas) — not SQL-expressible
        "corr_pvalues",
        "dtw_summary",
        "dtw_mapping",
        "recommendation_table",
        "auto_mapping",
        # (minhash_dedup and simhash_dedup run portable-hash variants and
        # ARE oracle'd; the xxhash64 variants are pinned by pytest recall)
        # engine-specific sampling sequence
        "sample",
        # mapInPandas stub decoder
        "multimodal_extract",
    }


def test_all_queries_plan_and_return_rows(spark):
    # planning + a 1-row touch per query at the smallest sf: catches schema
    # errors and missing columns without the cost of full collects
    for name, fn in entry_mod.queries().items():
        df = fn(spark, SF_DIR)
        assert df.columns, name
        df.limit(1).collect()


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
