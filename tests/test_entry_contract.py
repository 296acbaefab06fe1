from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.001"

# The driver's correctness harness checks only the first 50 queries()
# entries; anything past that silently loses its per-round verification
# (round-3 lesson: 7 similarity/multimodal queries fell out of the
# window). Keep the registry at or under the cap — fold same-grain
# queries together rather than appending past 50.
DRIVER_CORRECTNESS_CAP = 50


def test_registry_fits_driver_window():
    assert len(entry_mod.queries()) <= DRIVER_CORRECTNESS_CAP


def test_oracle_keys_subset_of_queries():
    q = entry_mod.queries()
    o = entry_mod.oracle_sql()
    assert set(o) <= set(q)
    # every registered query now carries a DuckDB oracle: the DTW family is
    # hash-gated via the numpy expected tables under artifacts/, sampling
    # via the portable-hash twins, and multimodal via the WAV-synthesis
    # formula oracle (the engine-RNG `sample` is pytest-pinned below and
    # intentionally outside the registry)
    assert set(q) - set(o) == set()


def test_engine_rng_sample_pinned(spark):
    # q_sample stays out of queries() (driver window, no oracle possible
    # for engine RNG) but the P11 API surface must keep working: seeded,
    # reproducible, and in the right fraction ballpark
    a = entry_mod.q_sample(spark, SF_DIR)
    b = entry_mod.q_sample(spark, SF_DIR)
    n_a = a.count()
    assert n_a == b.count()  # same seed -> same sample
    total = entry_mod.read_table(spark, SF_DIR, "orders").count()
    assert 0.02 * total < n_a < 0.25 * total  # fraction=0.1


def test_all_queries_plan_and_return_rows(spark):
    # planning + a 1-row touch per query at the smallest sf: catches schema
    # errors and missing columns without the cost of full collects
    for name, fn in entry_mod.queries().items():
        df = fn(spark, SF_DIR)
        assert df.columns, name
        df.limit(1).collect()


def test_queries_survive_hostile_session_defaults(spark):
    # the driver calls queries() with ITS OWN session — Spark 4 defaults
    # to ANSI mode (corr on zero-variance groups -> DIVIDE_BY_ZERO) and
    # whatever host timezone. Re-hostilize the session before EVERY query
    # and require each q_* to restore its contract via ensure_runtime_conf
    ns = spark.newSession()
    for name, fn in entry_mod.queries().items():
        ns.conf.set("spark.sql.ansi.enabled", "true")
        ns.conf.set("spark.sql.session.timeZone", "America/New_York")
        df = fn(ns, SF_DIR)
        df.limit(1).collect()
        assert ns.conf.get("spark.sql.ansi.enabled") == "false", name
        assert ns.conf.get("spark.sql.session.timeZone") == "UTC", name


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0


def test_production_mapping_staged_equals_unstaged(spark, tmp_path, monkeypatch):
    """VERDICT r10 #2: the mid-plan routed-table checkpoint
    (SPARK_GRAFT_STAGE_DIR) exists to halve the 1000x scratch high-water;
    it must be a pure execution-strategy change — results bitwise equal."""
    monkeypatch.delenv("SPARK_GRAFT_STAGE_DIR", raising=False)
    plain = entry_mod.q_production_mapping(spark, SF_DIR)
    rows_plain = sorted(map(tuple, plain.collect()))
    spark.catalog.clearCache()
    monkeypatch.setenv("SPARK_GRAFT_STAGE_DIR", str(tmp_path))
    staged = entry_mod.q_production_mapping(spark, SF_DIR)
    rows_staged = sorted(map(tuple, staged.collect()))
    spark.catalog.clearCache()
    assert staged.columns == plain.columns
    assert rows_staged == rows_plain
    # the staging actually wrote (the env path was honored)
    import os as _os

    assert any(d.startswith("routed_") for d in _os.listdir(tmp_path))


def test_production_mapping_staged_guarded_after_scope(
    spark, tmp_path, monkeypatch
):
    """ADVICE r12 #3: a staged q_production_mapping plan consumed after
    its enclosing dedup_cache_scope exits now raises
    StagedScopeExpiredError naming the vacuumed path, instead of the
    pre-r13 bare executor FileNotFoundError."""
    import pytest as _pytest

    from mapping_timeseries_spark.operators.dedup import dedup_cache_scope
    from mapping_timeseries_spark.plans.pipeline import (
        StagedScopeExpiredError,
    )

    monkeypatch.setenv("SPARK_GRAFT_STAGE_DIR", str(tmp_path))
    with dedup_cache_scope():
        staged = entry_mod.q_production_mapping(spark, SF_DIR)
        assert staged.limit(1).count() >= 0  # live inside the scope
    with _pytest.raises(StagedScopeExpiredError, match="vacuumed"):
        staged.count()

def test_ngram_jaccard_staged_equals_unstaged(spark, tmp_path, monkeypatch):
    """VERDICT r13 #3: with SPARK_GRAFT_STAGE_DIR set, q_ngram_jaccard
    stages the shared hsets frame to parquet (one tokenize+shingle pass,
    no cold-pin materialization race) instead of scoped_pin. Pure
    execution-strategy change — results bitwise equal."""
    monkeypatch.delenv("SPARK_GRAFT_STAGE_DIR", raising=False)
    plain = entry_mod.q_ngram_jaccard(spark, SF_DIR)
    rows_plain = sorted(map(tuple, plain.collect()))
    spark.catalog.clearCache()
    monkeypatch.setenv("SPARK_GRAFT_STAGE_DIR", str(tmp_path))
    staged = entry_mod.q_ngram_jaccard(spark, SF_DIR)
    rows_staged = sorted(map(tuple, staged.collect()))
    spark.catalog.clearCache()
    assert staged.columns == plain.columns
    assert rows_staged == rows_plain
    import os as _os

    assert any(d.startswith("ngram_hsets_") for d in _os.listdir(tmp_path))


def test_ngram_jaccard_staged_guarded_after_scope(
    spark, tmp_path, monkeypatch
):
    """Same post-scope contract as production_mapping: a staged
    q_ngram_jaccard plan consumed after its dedup_cache_scope exits
    raises StagedScopeExpiredError, not a bare FileNotFoundError."""
    import pytest as _pytest

    from mapping_timeseries_spark.operators.dedup import dedup_cache_scope
    from mapping_timeseries_spark.plans.pipeline import (
        StagedScopeExpiredError,
    )

    monkeypatch.setenv("SPARK_GRAFT_STAGE_DIR", str(tmp_path))
    with dedup_cache_scope():
        staged = entry_mod.q_ngram_jaccard(spark, SF_DIR)
        assert staged.limit(1).count() >= 0
    with _pytest.raises(StagedScopeExpiredError, match="vacuumed"):
        staged.count()
