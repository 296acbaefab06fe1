from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from mapping_timeseries_spark import MappingConfig
from mapping_timeseries_spark.operators.canonicalize import VALUE1, VALUE2, canonicalize
from mapping_timeseries_spark.operators.correlation import best_lag_correlation
from mapping_timeseries_spark.operators.dtw import dtw_summary
from mapping_timeseries_spark.operators.merge import merge_series
from mapping_timeseries_spark.operators.quality import (
    alignment_coverage,
    duplicate_stats,
    profile_columns,
    qa_report,
)
from mapping_timeseries_spark.operators.recommend import (
    compare_methods,
    recommendation_table,
    route_entities,
)
from mapping_timeseries_spark.plans.pipeline import run_pipeline
from mapping_timeseries_spark.sources.fixtures import synthetic_pair


@pytest.fixture(scope="module")
def pair(spark):
    t1, t2 = synthetic_pair(spark, num_customers=15, num_months=18)
    return t1.cache(), t2.cache()


def test_profile_columns(spark):
    df = spark.createDataFrame(
        [(1.0, None), (-2.0, 3.0), (None, -4.0)], "a double, b double"
    )
    rows = {r["column"]: r for r in profile_columns(df, ["a", "b"]).collect()}
    assert rows["a"]["total_rows"] == 3
    assert rows["a"]["null_count"] == 1
    assert rows["a"]["negative_count"] == 1
    assert rows["b"]["null_count"] == 1
    assert rows["b"]["min_value"] == -4.0


def test_alignment_coverage(spark):
    t1 = spark.createDataFrame(
        [("A", "2024-01", 1.0), ("A", "2024-02", 1.0)],
        "cus_code string, month string, txn_amount double",
    )
    t2 = spark.createDataFrame(
        [("A", "2024-02", 2.0), ("A", "2024-03", 2.0)],
        "cus_code string, month string, revenue double",
    )
    row = alignment_coverage(t1, t2).collect()[0]
    assert (row["total_cells"], row["matched"]) == (3, 1)
    assert (row["table1_only"], row["table2_only"]) == (1, 1)


def test_duplicate_stats(spark):
    df = spark.createDataFrame(
        [("A", "2024-01"), ("A", "2024-01"), ("A", "2024-02")],
        "cus_code string, month string",
    )
    row = duplicate_stats(df, ["cus_code", "month"]).collect()[0]
    assert (row["total_rows"], row["distinct_rows"], row["duplicates"]) == (3, 2, 1)


def test_recommendation_thresholds(spark):
    comp = spark.createDataFrame(
        [
            ("HI", 0.9, 1, 3.0, 10, 0.3),   # high corr, low lag -> Correlation/High
            ("EI", 0.6, 1, 8.0, 10, 0.8),   # -> Either / Medium
            ("DT", 0.2, 5, 12.0, 10, 1.2),  # -> DTW / Medium
            ("CX", 0.1, 5, 30.0, 10, 3.0),  # -> Complex / Low
        ],
        "cus_code string, correlation double, optimal_lag int, total_cost double,"
        " num_mappings int, avg_distance double",
    )
    rec = {r["cus_code"]: r for r in recommendation_table(comp).collect()}
    assert rec["HI"]["recommended_method"] == "Correlation"
    assert rec["HI"]["confidence"] == "High"
    assert rec["EI"]["recommended_method"].startswith("Either")
    assert rec["DT"]["recommended_method"] == "DTW"
    assert rec["CX"]["recommended_method"] == "Complex - Manual Review"
    assert rec["CX"]["confidence"] == "Low"


def test_route_entities_fallback(spark):
    entities = spark.createDataFrame([("A",), ("B",), ("C",)], "cus_code string")
    recs = spark.createDataFrame(
        [("A", "Correlation", 2), ("B", "DTW", 0)],
        "cus_code string, recommended_method string, optimal_lag int",
    )
    routed = {r["cus_code"]: r for r in route_entities(entities, recs).collect()}
    assert routed["A"]["route"] == "correlation" and routed["A"]["optimal_lag"] == 2
    assert routed["B"]["route"] == "dtw"
    # unseen entity -> default route with lag 1 (05_prod_dev.py:409-411)
    assert routed["C"]["route"] == "default" and routed["C"]["optimal_lag"] == 1


def test_quality_null_and_empty_edges(spark):
    """Null-key rows must not fabricate duplicates, an all-NULL column
    must profile negative_count=0 (not None), duplicate cells must not
    multiply alignment counts, and an empty mapped frame must report 0
    temporal violations (not None -> spurious FAIL)."""
    # duplicate_stats: 3 unique keys, one carrying a NULL column
    df = spark.createDataFrame(
        [("a", "x"), ("b", None), ("c", "y")], "k string, t string"
    )
    row = duplicate_stats(df, ["k", "t"]).first()
    assert (row["total_rows"], row["distinct_rows"], row["duplicates"]) == (3, 3, 0)

    # profile: all-NULL value column
    nulls = spark.createDataFrame([(None,), (None,)], "v double")
    prow = profile_columns(nulls, ["v"]).first()
    assert prow["null_count"] == 2 and prow["negative_count"] == 0

    # alignment: duplicated cells on both sides count as ONE cell
    t1 = spark.createDataFrame(
        [("C1", "2024-01"), ("C1", "2024-01")], "cus_code string, month string"
    )
    t2 = spark.createDataFrame(
        [("C1", "2024-01")] * 3 + [("C1", "2024-02")],
        "cus_code string, month string",
    )
    arow = alignment_coverage(t1, t2).first()
    assert (arow["total_cells"], arow["matched"], arow["table2_only"]) == (2, 1, 1)

    # qa on an empty mapping: violations 0, not None
    from mapping_timeseries_spark.operators.quality import qa_invariants

    empty = spark.createDataFrame(
        [], "cus_code string, time1 string, value1 double, time2 string, "
            "value2 double, lag_offset int",
    )
    inp = spark.createDataFrame([("C1", "2024-01")], "cus_code string, month string")
    qrow = qa_invariants(empty, inp).first()
    assert qrow["temporal_violations"] == 0


def test_qa_report_gates(spark, pair):
    t1, t2 = pair
    t1c = canonicalize(t1, "cus_code", "month", "txn_amount", VALUE1)
    t2c = canonicalize(t2, "cus_code", "month", "revenue", VALUE2)
    merged = merge_series(t1c, t2c)
    from mapping_timeseries_spark.operators.lag_join import (
        build_correlation_mappings,
    )

    corr = best_lag_correlation(merged, 6)
    mapped = build_correlation_mappings(t1c, t2c, corr, 0.3)
    report = qa_report(mapped, t1c)
    assert set(report["checks"]) == {
        "coverage", "duplicates", "lag", "ratio", "temporal",
    }
    assert report["checks"]["duplicates"]["duplicates"] == 0
    assert report["checks"]["temporal"]["violations"] == 0
    assert report["checks"]["lag"]["max_lag"] <= 6


def test_pipeline_end_to_end(spark, pair, tmp_path):
    t1, t2 = pair
    merged = merge_series(
        canonicalize(t1, "cus_code", "month", "txn_amount", VALUE1),
        canonicalize(t2, "cus_code", "month", "revenue", VALUE2),
    )
    recs = recommendation_table(
        compare_methods(best_lag_correlation(merged, 6), dtw_summary(merged))
    )
    out = str(tmp_path / "run")
    result = run_pipeline(
        spark, t1, t2, recs,
        "cus_code", "month", "txn_amount", "revenue",
        output_path=out, config=MappingConfig(), run_id="testrun",
    )
    assert result.stats["total_mappings"] > 0
    assert result.stats["sla_nonempty_ok"]
    assert os.path.exists(os.path.join(out, "run_testrun.json"))
    written = spark.read.parquet(os.path.join(out, "mappings"))
    assert written.count() == result.stats["total_mappings"]
    methods = {r["method"] for r in written.select("method").distinct().collect()}
    assert methods <= {"correlation", "correlation_default", "dtw"}


def test_pipeline_versioned_publish_and_qa_rollback(spark, pair, tmp_path):
    """versioned_root publishes each run as a snapshot; a QA-failing run
    stays on disk for forensics but the table pointer auto-rolls back to
    the last good version (the reference's RESTORE runbook,
    05_prod_dev.py:1163-1191, as pipeline behavior)."""
    from mapping_timeseries_spark.sources.versioned import (
        read_versioned,
        table_history,
    )

    t1, t2 = pair
    root = str(tmp_path / "mappings_vt")
    good = run_pipeline(
        spark, t1, t2, None,
        "cus_code", "month", "txn_amount", "revenue",
        versioned_root=root, run_id="good",
    )
    assert good.stats["written_version"] == 1
    assert good.stats["published_version"] == 1
    v1_rows = read_versioned(spark, root).count()
    assert v1_rows == good.stats["total_mappings"]

    # second run with table2 gutted to one entity: coverage craters, QA
    # fails, the staged v2 must never be published (pointer stays at v1
    # with no transient window)
    one_entity = t2.where(
        F.col("cus_code") == t2.select("cus_code").first()["cus_code"]
    )
    bad = run_pipeline(
        spark, t1, one_entity, None,
        "cus_code", "month", "txn_amount", "revenue",
        versioned_root=root, run_id="bad",
    )
    assert not bad.qa["passed"]
    assert bad.stats["written_version"] == 2
    assert bad.stats["published_version"] == 1
    # readers still see v1; the failed snapshot remains for forensics
    assert read_versioned(spark, root).count() == v1_rows
    assert read_versioned(spark, root, version=2).count() == bad.stats[
        "total_mappings"
    ]
    # two-phase publish: the failed run stages v2 but never publishes, so
    # history records only the writes (no restore entry needed — the
    # pointer never moved off v1)
    notes = [h["note"] for h in table_history(root)]
    assert notes == ["pipeline run good", "pipeline run bad"]


def test_pipeline_first_run_qa_failure_stays_unpublished(spark, pair, tmp_path):
    """Fresh versioned table whose FIRST run fails QA: the staged
    snapshot must never become the published pointer (the old
    publish-then-rollback flow had nothing to roll back to and left the
    failed table live for readers)."""
    from mapping_timeseries_spark.sources.versioned import (
        current_version,
        read_versioned,
    )

    t1, t2 = pair
    one_entity = t2.where(
        F.col("cus_code") == t2.select("cus_code").first()["cus_code"]
    )
    root = str(tmp_path / "fresh_vt")
    bad = run_pipeline(
        spark, t1, one_entity, None,
        "cus_code", "month", "txn_amount", "revenue",
        versioned_root=root, run_id="firstbad",
    )
    assert not bad.qa["passed"]
    assert bad.stats["written_version"] == 1
    assert bad.stats["published_version"] is None
    assert current_version(root) is None
    with pytest.raises(Exception):
        read_versioned(spark, root)  # nothing published to read
    # forensics: the staged snapshot is still addressable by number
    assert read_versioned(spark, root, version=1).count() == bad.stats[
        "total_mappings"
    ]


def test_pipeline_writes_both_sinks_when_both_given(spark, pair, tmp_path):
    import os as _os

    t1, t2 = pair
    root = str(tmp_path / "both_vt")
    out = str(tmp_path / "both_out")
    res = run_pipeline(
        spark, t1, t2, None,
        "cus_code", "month", "txn_amount", "revenue",
        versioned_root=root, output_path=out, run_id="both",
    )
    assert res.qa["passed"]
    # versioned snapshot published AND the partitioned path written
    assert res.stats["published_version"] == 1
    mdir = _os.path.join(out, "mappings")
    assert _os.path.isdir(mdir)
    assert spark.read.parquet(mdir).count() == res.stats["total_mappings"]


def test_pipeline_qa_fail_gates_both_sinks(spark, pair, tmp_path):
    """r4 advice: with versioned_root AND output_path set, the
    partitioned sink used to be written BEFORE QA ran, so a QA-failed
    run exposed data through output_path/mappings even though the
    version pointer correctly stayed unflipped. Both sinks are now
    behind the same gate."""
    import os as _os

    t1, t2 = pair
    one_entity = t2.where(
        F.col("cus_code") == t2.select("cus_code").first()["cus_code"]
    )
    root = str(tmp_path / "gate_vt")
    out = str(tmp_path / "gate_out")
    bad = run_pipeline(
        spark, t1, one_entity, None,
        "cus_code", "month", "txn_amount", "revenue",
        versioned_root=root, output_path=out, run_id="gatedbad",
    )
    assert not bad.qa["passed"]
    assert bad.stats["published_version"] is None
    # the partitioned sink must not exist — no reader path sees the data
    assert not _os.path.isdir(_os.path.join(out, "mappings"))
    # run metadata still lands for forensics
    assert _os.path.isfile(_os.path.join(out, "run_gatedbad.json"))


def test_incremental_pipeline_date_slice(spark, pair, tmp_path):
    from mapping_timeseries_spark.plans.pipeline import run_incremental

    t1, t2 = pair
    p1, p2 = str(tmp_path / "t1"), str(tmp_path / "t2")
    t1.write.parquet(p1)
    t2.write.parquet(p2)
    result = run_incremental(
        spark, p1, p2, None,
        "cus_code", "month", "txn_amount", "revenue",
        start="2023-04", end="2023-09",
    )
    months = {
        r["time1"]
        for r in result.mapped.select("time1").distinct().collect()
    }
    assert months
    assert all("2023-04" <= m <= "2023-09" for m in months)
    # the t2 slice reaches max_lag months PAST end (the lag join maps
    # time1 -> time1 + lag); slicing t2 to [start, end] silently
    # dropped every mapping whose lag exceeded the slice width
    months2 = {
        r["time2"]
        for r in result.mapped.select("time2").distinct().collect()
    }
    assert all("2023-04" <= m <= "2024-03" for m in months2)  # end + 6


def test_incremental_single_month_recovers_lagged_mappings(spark, tmp_path):
    """The regression the forward reach exists for: a one-month slice
    must still produce mappings for an entity whose model lag is 2 —
    its t2 rows live two months PAST the slice, and no other run could
    ever produce the pair (the later run excludes the t1 month)."""
    from mapping_timeseries_spark.plans.pipeline import run_incremental

    rows1 = [("L2", f"2024-{m:02d}", 100.0 + m) for m in range(1, 9)]
    rows2 = [("L2", f"2024-{m:02d}", 50.0 + m) for m in range(1, 9)]
    t1 = spark.createDataFrame(rows1, "cus_code string, month string, txn_amount double")
    t2 = spark.createDataFrame(rows2, "cus_code string, month string, revenue double")
    p1, p2 = str(tmp_path / "li_t1"), str(tmp_path / "li_t2")
    t1.write.parquet(p1)
    t2.write.parquet(p2)
    model = spark.createDataFrame(
        [("L2", "Correlation", 2)],
        "cus_code string, recommended_method string, optimal_lag int",
    )
    result = run_incremental(
        spark, p1, p2, model,
        "cus_code", "month", "txn_amount", "revenue",
        start="2024-05", end="2024-05",
    )
    got = [
        (r["time1"], r["time2"], r["lag_offset"])
        for r in result.mapped.collect()
    ]
    assert got == [("2024-05", "2024-07", 2)]
    assert result.stats["route_counts"] == {"correlation": 1}


def test_pipeline_without_model_trains_inline(spark, pair):
    t1, t2 = pair
    result = run_pipeline(
        spark, t1, t2, None,
        "cus_code", "month", "txn_amount", "revenue",
    )
    assert result.stats["total_mappings"] > 0
    assert result.qa["checks"]["coverage"]["mapped_customers"] > 0


# ---------------------------------------------------------------------------
# Monitoring: SLA gates, dashboard view, failure path (05_prod_dev.py
# 690-745, 963-982, 1252-1266)
# ---------------------------------------------------------------------------


def test_check_sla_gates():
    from mapping_timeseries_spark.operators.monitoring import check_sla

    ok, alerts = check_sla(
        {"coverage_pct": 95.0, "duration_seconds": 60.0, "total_mappings": 10}
    )
    assert ok and alerts == []

    ok, alerts = check_sla(
        {"coverage_pct": 50.0, "duration_seconds": 3600.0, "total_mappings": 0}
    )
    assert not ok
    assert [a.severity for a in alerts] == ["ERROR", "WARNING", "CRITICAL"]
    # machine-readable codes are the stable contract (SLA stats key off
    # them); subjects are human-facing and free to be reworded
    assert [a.code for a in alerts] == [
        "low_coverage", "long_duration", "empty_output"
    ]
    assert any("Low Coverage" in a.subject for a in alerts)


def test_avg_rank_distributed_matches_pandas(spark):
    """Range-partitioned two-phase rank == pandas rank(method='average')
    (scipy's spearman convention), including a tie block bigger than a
    partition's share — ties must land in ONE range partition."""
    import numpy as np
    import pandas as pd

    from mapping_timeseries_spark.operators.recommend import (
        avg_rank_distributed,
    )

    rng = np.random.default_rng(11)
    vals = list(rng.normal(0, 1, 300)) + [0.5] * 120 + [-2.0] * 3
    expected = pd.Series(vals).rank(method="average")
    df = spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate(vals)], "i long, v double"
    ).repartition(6)
    got = {
        r["i"]: r["rk"]
        for r in avg_rank_distributed(df, "v", "rk", num_partitions=7).collect()
    }
    assert len(got) == len(vals)
    for i, want in enumerate(expected):
        assert got[i] == want, (i, got[i], want)


def test_monitoring_view_roundtrip(spark):
    from mapping_timeseries_spark.operators.monitoring import (
        create_monitoring_view,
        monitoring_summary,
    )

    mapped = spark.createDataFrame(
        [
            ("A", "2024-01", 100.0, "2024-02", 10.0, "correlation"),
            ("A", "2024-02", 200.0, "2024-03", 30.0, "correlation"),
            ("B", "2024-01", 0.0, "2024-01", 5.0, "dtw"),
        ],
        "cus_code string, time1 string, value1 double, time2 string, "
        "value2 double, method string",
    ).withColumn("processed_at", F.to_timestamp(F.lit("2026-01-01 00:00:00")))

    rows = {r["method"]: r for r in monitoring_summary(mapped).collect()}
    corr = rows["correlation"]
    assert corr["total_mappings"] == 2
    assert corr["unique_customers"] == 1
    assert corr["avg_revenue"] == pytest.approx(20.0)
    assert corr["avg_transaction"] == pytest.approx(150.0)
    # conversion: (10/100 + 30/200) / 2 = 0.125
    assert corr["avg_conversion_rate"] == pytest.approx(0.125)
    # value1=0 -> NULLIF guards the ratio; avg over zero non-null ratios
    assert rows["dtw"]["avg_conversion_rate"] is None

    # dp=0 (round to whole units) is a valid request and must take the
    # portable path, not silently fall through to plain float means
    whole = {
        r["method"]: r
        for r in monitoring_summary(
            mapped, value_lattice_scale=1, value_round_dp=0
        ).collect()
    }
    assert whole["correlation"]["avg_revenue"] == pytest.approx(20.0)
    assert whole["correlation"]["avg_transaction"] == pytest.approx(150.0)
    with pytest.raises(ValueError, match=">= 0"):
        monitoring_summary(mapped, value_lattice_scale=1, value_round_dp=-1)
    with pytest.raises(ValueError, match="requires value_lattice_scale"):
        monitoring_summary(mapped, value_round_dp=6)
    # scale=0 would compute 0/0 lattice means (NaN) — must be rejected
    with pytest.raises(ValueError, match=">= 1"):
        monitoring_summary(mapped, value_lattice_scale=0)

    # CREATE OR REPLACE semantics: re-registering swaps the content
    create_monitoring_view(mapped, "t_monitoring")
    assert spark.table("t_monitoring").count() == 2
    create_monitoring_view(mapped.where(F.col("method") == "dtw"), "t_monitoring")
    assert spark.table("t_monitoring").count() == 1


def test_pipeline_failure_path(spark, pair, tmp_path):
    from pyspark.sql.utils import AnalysisException

    t1, t2 = pair
    out = str(tmp_path / "failrun")
    seen = []
    # a recommendations frame missing required columns blows up routing
    bad_recs = spark.createDataFrame([(1,)], "nonsense int")
    with pytest.raises(Exception) as excinfo:
        run_pipeline(
            spark, t1, t2, bad_recs,
            "cus_code", "month", "txn_amount", "revenue",
            output_path=out, run_id="failrun", on_alert=seen.append,
        )
    assert excinfo.type is not None
    # CRITICAL alert emitted and error log written (05_prod_dev.py:963-982)
    assert len(seen) == 1
    assert seen[0].severity == "CRITICAL"
    assert "failrun" in seen[0].subject
    log = os.path.join(out, "error_failrun.log")
    assert os.path.exists(log)
    assert "Error:" in open(log).read()


def test_pipeline_alerts_on_result(spark, pair):
    t1, t2 = pair
    result = run_pipeline(
        spark, t1, t2, None,
        "cus_code", "month", "txn_amount", "revenue",
    )
    # healthy synthetic pair: all SLA gates green, no alerts
    assert result.stats["sla_met"]
    assert result.alerts == []


def test_pipeline_scratch_dir_stages_and_results_equal(spark, pair, tmp_path, monkeypatch):
    """r12 (VERDICT r11 #6): staging is default-on under
    run_pipeline(scratch_dir=...) — previously opt-in via the
    SPARK_GRAFT_STAGE_DIR env var only. Pure execution-strategy change:
    results bitwise equal on BOTH branches (supplied recommendations /
    inline-trained model), the stage dir actually gets written, and the
    dedup_cache_scope vacuums it."""
    import os as _os

    from mapping_timeseries_spark.operators.dedup import dedup_cache_scope

    monkeypatch.delenv("SPARK_GRAFT_STAGE_DIR", raising=False)
    t1, t2 = pair
    merged = merge_series(
        canonicalize(t1, "cus_code", "month", "txn_amount", VALUE1),
        canonicalize(t2, "cus_code", "month", "revenue", VALUE2),
    )
    recs = recommendation_table(
        compare_methods(best_lag_correlation(merged, 6), dtw_summary(merged))
    )
    scratch = str(tmp_path / "scratch")

    def rows(result):
        # processed_at is a wall-clock stamp; run_id is pinned equal
        return sorted(
            map(tuple, result.mapped.drop("processed_at").collect())
        )

    for recommendations in (recs, None):
        plain = run_pipeline(
            spark, t1, t2, recommendations,
            "cus_code", "month", "txn_amount", "revenue", run_id="stagecmp",
        )
        with dedup_cache_scope():
            staged = run_pipeline(
                spark, t1, t2, recommendations,
                "cus_code", "month", "txn_amount", "revenue",
                run_id="stagecmp", scratch_dir=scratch,
            )
            label = "routed_" if recommendations is not None else "model_"
            assert any(
                d.startswith(label) for d in _os.listdir(scratch)
            ), "scratch_dir was configured but nothing staged"
            assert rows(staged) == rows(plain)
        # scope exit vacuumed the staged dirs (best-effort delete)
        assert _os.listdir(scratch) == []


def test_staged_frame_expires_with_clear_error(spark, pair, tmp_path):
    """VERDICT r12 #7: a scope-staged plan touched after its scope
    vacuumed the dir raises StagedScopeExpiredError (path + contract in
    the message) instead of the old bare executor FileNotFoundError —
    and works normally while the scope is live."""
    import pytest as _pytest

    from mapping_timeseries_spark.operators.dedup import dedup_cache_scope
    from mapping_timeseries_spark.plans.pipeline import (
        StagedScopeExpiredError,
        _stage_entity_table,
    )

    t1, _ = pair
    with dedup_cache_scope():
        staged = _stage_entity_table(
            spark, t1.limit(5), str(tmp_path), "model"
        )
        n_inside = staged.count()  # live inside the scope
        assert n_inside == 5
    with _pytest.raises(StagedScopeExpiredError, match="vacuumed"):
        staged.count()
    with _pytest.raises(StagedScopeExpiredError, match="consume-inside|INSIDE"):
        staged.select("cus_code")  # transformations fail fast too


def test_pipeline_sink_branch_vacuums_scratch(spark, pair, tmp_path, monkeypatch):
    """ADVICE r12: with a sink configured, run_pipeline re-points
    result.mapped at the WRITTEN sink and vacuums its own staged dirs —
    no scope needed, no leak, and the returned frame is byte-consistent
    with the sink (same rows, same schema as the unstaged run)."""
    import os as _os

    monkeypatch.delenv("SPARK_GRAFT_STAGE_DIR", raising=False)
    t1, t2 = pair
    scratch = str(tmp_path / "scratch")
    out = str(tmp_path / "out")
    result = run_pipeline(
        spark, t1, t2, None,
        "cus_code", "month", "txn_amount", "revenue",
        output_path=out, run_id="sinkvac", scratch_dir=scratch,
    )
    # the pipeline vacuumed its own staging — nothing left to leak
    assert not _os.path.exists(scratch) or _os.listdir(scratch) == []
    sink = spark.read.parquet(_os.path.join(out, "mappings"))
    got = sorted(map(tuple, result.mapped.collect()))
    want_rows = sink.select(*result.mapped.columns).collect()
    assert got == sorted(
        tuple(r[c] for c in result.mapped.columns) for r in want_rows
    )
    plain = run_pipeline(
        spark, t1, t2, None,
        "cus_code", "month", "txn_amount", "revenue", run_id="sinkvac",
    )
    assert [
        (f.name, f.dataType) for f in result.mapped.schema.fields
    ] == [(f.name, f.dataType) for f in plain.mapped.schema.fields]


def test_pipeline_sinkless_staged_result_guarded(spark, pair, tmp_path, monkeypatch):
    """Sinkless + scratch_dir keeps the documented lazy-leak contract,
    but the returned frame is now guarded: consuming it after the
    enclosing scope vacuumed the staging raises StagedScopeExpiredError
    instead of a bare FileNotFoundError."""
    import pytest as _pytest

    from mapping_timeseries_spark.operators.dedup import dedup_cache_scope
    from mapping_timeseries_spark.plans.pipeline import StagedScopeExpiredError

    monkeypatch.delenv("SPARK_GRAFT_STAGE_DIR", raising=False)
    t1, t2 = pair
    scratch = str(tmp_path / "scratch")
    with dedup_cache_scope():
        result = run_pipeline(
            spark, t1, t2, None,
            "cus_code", "month", "txn_amount", "revenue",
            run_id="guardrun", scratch_dir=scratch,
        )
        assert result.mapped.count() > 0  # consume-inside path still fine
    with _pytest.raises(StagedScopeExpiredError, match="vacuumed"):
        result.mapped.count()


def test_pipeline_supplied_model_not_staged(spark, pair, tmp_path, monkeypatch):
    """A caller-supplied model is already detached from the training
    exchanges — staging it would be a pointless extra write; the
    scratch dir must stay empty on that path."""
    import os as _os

    monkeypatch.delenv("SPARK_GRAFT_STAGE_DIR", raising=False)
    t1, t2 = pair
    merged = merge_series(
        canonicalize(t1, "cus_code", "month", "txn_amount", VALUE1),
        canonicalize(t2, "cus_code", "month", "revenue", VALUE2),
    )
    model = best_lag_correlation(merged, 6)
    scratch = str(tmp_path / "scratch2")
    result = run_pipeline(
        spark, t1, t2, None,
        "cus_code", "month", "txn_amount", "revenue",
        model=model, scratch_dir=scratch,
    )
    assert result.stats["total_mappings"] > 0
    assert not _os.path.exists(scratch) or _os.listdir(scratch) == []
