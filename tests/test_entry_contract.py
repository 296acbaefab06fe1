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
    # (the DTW family is hash-gated via the numpy expected tables under
    # artifacts/ since round 3; sampling has the hash-gated sample_portable
    # twin alongside the rows-only engine-RNG sample)
    rows_only = set(q) - set(o)
    assert rows_only == {
        # engine-specific sampling sequence (see sample_portable)
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
