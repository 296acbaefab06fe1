"""Production pipeline shell (SURVEY §3.2, 05_prod_dev.py:769-982).

validate -> route (saved recommendations, lag-1 fallback) -> map -> QA ->
partitioned write -> run metadata. Differences from the reference, by
design:

- single-pass validation/QA (operators/quality.py) instead of an action
  per metric;
- segment routing computed once (operators/recommend.route_entities)
  instead of three filtered frames each forced with .count();
- stats collected via ``observe`` on the one write, not extra counts;
- results unioned by NAME (reference uses positional union,
  05_prod_dev.py:417-421 — a silent-corruption hazard the engine rejects).
"""

from __future__ import annotations

import os
import time
import uuid
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

from ..config import MappingConfig
from ..operators.canonicalize import KEY, VALUE1, VALUE2, canonicalize
from ..operators.correlation import best_lag_correlation
from ..operators.dtw import build_dtw_mappings
from ..operators.lag_join import build_correlation_mappings
from ..operators.merge import merge_series
from ..operators.monitoring import Alert, check_sla
from ..operators.quality import qa_report
from ..operators.recommend import route_entities
from ..sources.writers import write_partitioned, write_run_metadata

__all__ = ["PipelineResult", "run_pipeline", "run_incremental"]


@dataclass
class PipelineResult:
    mapped: DataFrame
    qa: dict[str, Any]
    stats: dict[str, Any] = field(default_factory=dict)
    alerts: list[Alert] = field(default_factory=list)


def _mappings_for_route(
    t1: DataFrame,
    t2: DataFrame,
    merged: DataFrame,
    routed: DataFrame,
    cfg: MappingConfig,
) -> DataFrame:
    """Build per-route mappings and union by name.

    Correlation-routed and fallback entities carry their (model or default)
    lag; DTW-routed entities run the aligner. The routed lag join reuses
    build_correlation_mappings by shaping routed rows as a correlations
    frame with a passing score.
    """
    corr_like = routed.where(F.col("route").isin("correlation", "default")).select(
        KEY,
        "optimal_lag",
        # routed lags are applied unconditionally (the model already
        # decided); inject a sentinel score above any threshold
        F.lit(1.0).alias("correlation"),
    )
    corr_part = build_correlation_mappings(t1, t2, corr_like, min_correlation=0.0)
    corr_part = corr_part.drop("correlation").join(
        routed.select(KEY, F.col("route")), on=KEY, how="left"
    ).select(
        KEY,
        "time1",
        "value1",
        "time2",
        "value2",
        "lag_offset",
        F.when(F.col("route") == "default", "correlation_default")
        .otherwise("correlation")
        .alias("method"),
    )

    dtw_keys = routed.where(F.col("route") == "dtw").select(KEY)
    dtw_part = build_dtw_mappings(
        merged.join(dtw_keys, on=KEY, how="left_semi"),
        cfg.window_size,
        cfg.normalize,
    ).select(KEY, "time1", "value1", "time2", "value2", "lag_offset", "method")

    return corr_part.unionByName(dtw_part)


def run_pipeline(
    spark,
    table1: DataFrame,
    table2: DataFrame,
    recommendations: DataFrame | None,
    key_col: str,
    time_col: str,
    value1_col: str,
    value2_col: str,
    output_path: str | None = None,
    config: MappingConfig | None = None,
    run_id: str | None = None,
    on_alert: Any = None,
    versioned_root: str | None = None,
) -> PipelineResult:
    """End-to-end production run. With ``recommendations=None`` the model
    is trained inline (best-lag correlation over the merged frame), which
    is the research-flow bootstrap.

    SLA gates (operators.monitoring.check_sla) run on the stats and the
    resulting alerts are returned on the result (and pushed to ``on_alert``
    if given). On ANY exception the failure path (05_prod_dev.py:963-982)
    emits a CRITICAL alert and writes ``error_{run_id}.log`` under
    ``output_path``, then re-raises — a library surfaces the error, unlike
    the reference's swallow-and-return-False.

    ``versioned_root``: publish the mapping table as a snapshot version
    (sources.versioned) and AUTO-ROLLBACK on QA failure — the reference's
    manual RESTORE runbook (05_prod_dev.py:1163-1191) as pipeline
    behavior: a failing run's output stays on disk for forensics
    (`stats["published_version"]`) but the table pointer snaps back to
    the last good version (`stats["rolled_back_to"]`), so downstream
    readers never consume a QA-failed table.
    """
    cfg = config or MappingConfig()
    run_id = run_id or uuid.uuid4().hex[:12]
    try:
        return _run_pipeline_body(
            spark, table1, table2, recommendations, key_col, time_col,
            value1_col, value2_col, output_path, cfg, run_id, on_alert,
            versioned_root,
        )
    except Exception as exc:  # noqa: BLE001 — failure path mirrors reference
        import traceback

        alert = Alert(
            "CRITICAL",
            "pipeline_failed",
            f"Pipeline Failed - {run_id}",
            f"Error: {exc}\n\n{traceback.format_exc()}",
        )
        if on_alert is not None:
            on_alert(alert)
        if output_path:
            os.makedirs(output_path, exist_ok=True)
            with open(
                os.path.join(output_path, f"error_{run_id}.log"), "w"
            ) as fh:
                fh.write(alert.message)
        raise


def _run_pipeline_body(
    spark,
    table1: DataFrame,
    table2: DataFrame,
    recommendations: DataFrame | None,
    key_col: str,
    time_col: str,
    value1_col: str,
    value2_col: str,
    output_path: str | None,
    cfg: MappingConfig,
    run_id: str,
    on_alert: Any,
    versioned_root: str | None = None,
) -> PipelineResult:
    t_start = time.time()

    t1 = canonicalize(table1, key_col, time_col, value1_col, VALUE1, "table1")
    t2 = canonicalize(table2, key_col, time_col, value2_col, VALUE2, "table2")
    merged = merge_series(t1, t2)

    if recommendations is None:
        corr = best_lag_correlation(merged, cfg.max_lag)
        mapped = build_correlation_mappings(t1, t2, corr, cfg.min_correlation).select(
            KEY, "time1", "value1", "time2", "value2", "lag_offset", "method"
        )
    else:
        routed = route_entities(t1.select(KEY).distinct(), recommendations)
        mapped = _mappings_for_route(t1, t2, merged, routed, cfg)

    mapped = mapped.withColumn("pipeline_run_id", F.lit(run_id)).withColumn(
        "processed_at", F.current_timestamp()
    )

    obs = Observation("pipeline")
    mapped = mapped.observe(
        obs, F.count(F.lit(1)).alias("total_mappings")
    )

    published_version = None
    if versioned_root:
        from ..sources.versioned import current_version, write_versioned

        # the POINTER, not max(history): after an earlier rollback the
        # newest allocated snapshot is exactly the one we must not
        # restore to
        last_good = current_version(versioned_root)
        published_version = write_versioned(
            mapped, versioned_root, note=f"pipeline run {run_id}"
        )
        total_mappings = obs.get["total_mappings"]
    elif output_path:
        write_partitioned(mapped, os.path.join(output_path, "mappings"), "time1")
        total_mappings = obs.get["total_mappings"]
    else:
        total_mappings = mapped.count()

    qa = qa_report(mapped, t1)
    rolled_back_to = None
    if versioned_root and not qa["passed"]:
        # auto-rollback (05_prod_dev.py:1163-1191 as behavior): snap the
        # pointer back to the last good version; the failed snapshot
        # stays on disk under published_version for forensics
        from ..sources.versioned import restore_version

        if last_good is not None:
            restore_version(versioned_root, last_good)
            rolled_back_to = last_good
    duration = time.time() - t_start

    # SLA gates (05_prod_dev.py:703-745) via the structured monitor
    sla_met, alerts = check_sla(
        {
            "coverage_pct": qa["checks"]["coverage"]["coverage_pct"],
            "duration_seconds": duration,
            "total_mappings": total_mappings,
        }
    )
    if on_alert is not None:
        for alert in alerts:
            on_alert(alert)
    stats = {
        "pipeline_run_id": run_id,
        "total_mappings": total_mappings,
        "duration_seconds": round(duration, 3),
        "qa_passed": qa["passed"],
        "sla_met": sla_met,
        # keyed off the machine-readable Alert.code, never subject text
        "sla_coverage_ok": not any(a.code == "low_coverage" for a in alerts),
        "sla_duration_ok": not any(a.code == "long_duration" for a in alerts),
        "sla_nonempty_ok": not any(a.code == "empty_output" for a in alerts),
    }
    if versioned_root:
        stats["published_version"] = published_version
        stats["rolled_back_to"] = rolled_back_to
    if output_path:
        write_run_metadata(
            os.path.join(output_path, f"run_{run_id}.json"),
            {"stats": stats, "qa": qa},
        )
    return PipelineResult(mapped=mapped, qa=qa, stats=stats, alerts=alerts)


def run_incremental(
    spark,
    table1_path: str,
    table2_path: str,
    recommendations: DataFrame | None,
    key_col: str,
    time_col: str,
    value1_col: str,
    value2_col: str,
    start: str,
    end: str,
    **kwargs,
) -> PipelineResult:
    """Incremental date-range run (05_prod_dev.py:1054-1101): re-run the
    batch pipeline over only the [start, end] slice of both inputs.

    The range predicate lands in the parquet scan (min/max row-group skip;
    partition pruning when the inputs are partitioned by the time column),
    so an incremental month touches O(selected months) of input — the
    reference's approach, minus its unused checkpoint path.

    Correlation lags reach up to max_lag months back, so the model
    (``recommendations``) should come from a full-history training run;
    the incremental slice only *applies* it.
    """
    from ..sources.readers import read_incremental

    t1 = read_incremental(spark, table1_path, time_col, start, end)
    t2 = read_incremental(spark, table2_path, time_col, start, end)
    return run_pipeline(
        spark, t1, t2, recommendations,
        key_col, time_col, value1_col, value2_col, **kwargs,
    )
