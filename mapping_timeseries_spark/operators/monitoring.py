"""Production monitoring surface (SURVEY §3.2).

Three reference pieces the pipeline shell was missing:

- the monitoring dashboard view (05_prod_dev.py:1252-1266): per
  (process_date, method) mapping counts, entity counts, value means and
  conversion rate, registered with CREATE-OR-REPLACE semantics;
- the SLA monitor (05_prod_dev.py:703-745): coverage >= 80%, duration
  <= 30 min, non-empty output — returned as structured alerts instead of
  the reference's prints/SNS stubs so callers (and tests) can route them;
- the failure path (05_prod_dev.py:963-982): CRITICAL alert + error-log
  artifact on pipeline exception (wired in plans.pipeline.run_pipeline).

Scale note: the monitoring summary is one hash aggregation over the
mapping output keyed by (day, method) — map-side partial agg, one
shuffle, cardinality = days x methods (tiny). The view is metadata only.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .canonicalize import KEY
from .correlation import _lattice_mean, _lattice_mean_rounded

__all__ = [
    "Alert",
    "SLA_MIN_COVERAGE_PCT",
    "SLA_MAX_DURATION_SECONDS",
    "check_sla",
    "create_monitoring_view",
    "monitoring_summary",
]

#: SLA thresholds (05_prod_dev.py:710, 723).
SLA_MIN_COVERAGE_PCT = 80.0
SLA_MAX_DURATION_SECONDS = 30 * 60.0


@dataclass(frozen=True)
class Alert:
    """One monitoring alert (05_prod_dev.py:683-702). The reference prints
    and stubs an SNS publish; we hand the structured alert to the caller.

    ``code`` is the stable machine-readable category — downstream logic
    (SLA stats, routing) must key off it, never off the human-facing
    subject text, so a wording tweak can't silently flip a health stat."""

    severity: str  # WARNING | ERROR | CRITICAL
    code: str  # low_coverage | long_duration | empty_output | pipeline_failed
    subject: str
    message: str


def monitoring_summary(
    mapped: DataFrame,
    value_lattice_scale: int | None = None,
    value_round_dp: int | None = None,
    exact_distinct: bool = True,
) -> DataFrame:
    """Monitoring dashboard aggregation (05_prod_dev.py:1252-1266).

    Output: per (process_date, method) — total_mappings, unique_customers,
    avg_revenue, avg_transaction, avg_conversion_rate
    (value2 / NULLIF(value1, 0)), first/last processed_at.

    ``value_lattice_scale`` switches the value means to the
    order-independent lattice-integer form (see correlation._lattice_mean)
    — plain ``avg`` otherwise. Adding ``value_round_dp`` makes the means
    fully engine-portable end to end: the value means use the pure-integer
    half-up rounding (``_lattice_mean_rounded`` — F.round on a lattice
    mean is NOT portable on exact midpoints), and the conversion rate
    becomes the lattice-exact mean of the per-row ratio pre-rounded to
    ``value_round_dp`` (a quotient is never an exact decimal midpoint, so
    the per-row round IS portable; the mean of the resulting 10^-dp
    lattice then rounds with integer arithmetic). The oracle-gated driver
    query passes both; library callers get the reference's plain floats.
    ``exact_distinct=False`` uses ``approx_count_distinct`` (HLL) for the
    customer count — required on streaming frames (exact distinct needs
    unbounded per-key state) and the right call for dashboard counts at
    10^10 entities anyway.
    """
    if value_round_dp is not None and value_round_dp < 0:
        raise ValueError(f"value_round_dp must be >= 0, got {value_round_dp}")
    if value_round_dp is not None and value_lattice_scale is None:
        raise ValueError("value_round_dp requires value_lattice_scale")
    if value_lattice_scale is not None and value_lattice_scale < 1:
        # scale=0 would silently compute 0/0 means (NaN) on the lattice path
        raise ValueError(
            f"value_lattice_scale must be >= 1, got {value_lattice_scale}"
        )
    ratio = F.col("value2") / F.nullif(F.col("value1"), F.lit(0))
    # `is not None`, not truthiness: dp=0 (round to whole units) is a
    # valid request and must take the portable-rounding path
    if value_lattice_scale is not None and value_round_dp is not None:
        avg_rev = _lattice_mean_rounded(
            "value2", value_lattice_scale, value_round_dp
        )
        avg_txn = _lattice_mean_rounded(
            "value1", value_lattice_scale, value_round_dp
        )
        avg_conv = _lattice_mean_rounded(
            F.round(ratio, value_round_dp), 10**value_round_dp, value_round_dp
        )
    elif value_lattice_scale is not None:
        avg_rev = _lattice_mean("value2", value_lattice_scale)
        avg_txn = _lattice_mean("value1", value_lattice_scale)
        avg_conv = F.avg(ratio)
    else:
        avg_rev = F.avg("value2")
        avg_txn = F.avg("value1")
        avg_conv = F.avg(ratio)
    uniq = (
        F.countDistinct(KEY)
        if exact_distinct
        else F.approx_count_distinct(KEY)
    )
    return mapped.groupBy(
        F.to_date("processed_at").alias("process_date"),
        "method",
    ).agg(
        F.count(F.lit(1)).alias("total_mappings"),
        uniq.alias("unique_customers"),
        avg_rev.alias("avg_revenue"),
        avg_txn.alias("avg_transaction"),
        avg_conv.alias("avg_conversion_rate"),
        F.min("processed_at").alias("first_processed"),
        F.max("processed_at").alias("last_processed"),
    )


def create_monitoring_view(
    mapped: DataFrame,
    view_name: str = "mapping_monitoring",
    value_lattice_scale: int | None = None,
    value_round_dp: int | None = None,
) -> str:
    """CREATE OR REPLACE VIEW over the mapping output (S8,
    05_prod_dev.py:1252-1253). Registered as a replaceable temp view (our
    catalog surface); dashboards read it by name via ``spark.table``."""
    monitoring_summary(
        mapped, value_lattice_scale, value_round_dp
    ).createOrReplaceTempView(view_name)
    return view_name


def check_sla(stats: dict) -> tuple[bool, list[Alert]]:
    """SLA gates (05_prod_dev.py:703-745): returns (sla_met, alerts).

    Severities are the reference's: low coverage ERROR, long duration
    WARNING, empty output CRITICAL.
    """
    alerts: list[Alert] = []
    coverage = stats.get("coverage_pct", 0.0)
    if coverage < SLA_MIN_COVERAGE_PCT:
        alerts.append(
            Alert(
                "ERROR",
                "low_coverage",
                "SLA VIOLATION: Low Coverage",
                f"Coverage is {coverage:.1f}%, below "
                f"{SLA_MIN_COVERAGE_PCT:.0f}% threshold",
            )
        )
    duration = stats.get("duration_seconds", 0.0)
    if duration > SLA_MAX_DURATION_SECONDS:
        alerts.append(
            Alert(
                "WARNING",
                "long_duration",
                "SLA VIOLATION: Long Processing Time",
                f"Processing took {duration / 60:.1f} minutes, exceeding "
                f"{SLA_MAX_DURATION_SECONDS / 60:.0f} min threshold",
            )
        )
    if stats.get("total_mappings", 0) == 0:
        alerts.append(
            Alert(
                "CRITICAL",
                "empty_output",
                "SLA VIOLATION: No Mappings Generated",
                "Pipeline produced zero mappings",
            )
        )
    return (not alerts, alerts)
