"""Data-quality and QA operators (SURVEY §2.4 A1/A3/A5/A11, §2.3 J5,
05_prod_dev.py QualityChecker 462-621).

The reference runs each quality metric as its own Spark action (a null
count here, a duplicate count there — ~10 full scans per run). Every
operator here is a single-pass aggregation returning a small DataFrame, so
one materialization serves the whole report — the 100 TB version of the
same checks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .canonicalize import KEY, TIME

__all__ = [
    "profile_columns",
    "alignment_coverage",
    "duplicate_stats",
    "qa_invariants",
    "qa_report",
]


def profile_columns(df: DataFrame, value_cols: list[str]) -> DataFrame:
    """One-pass null/negative profile per value column (A11).

    Replaces the reference validator's per-column filter().count() loop
    (mapping_engine.py:376-414, 05_prod_dev.py:98-155) with a single
    aggregation: total rows, nulls, negatives, and percentages per column.
    Output: one row per column.
    """
    aggs = [F.count(F.lit(1)).alias("total_rows")]
    for c in value_cols:
        aggs.append(F.sum(F.col(c).isNull().cast("bigint")).alias(f"__null_{c}"))
        # when/otherwise, not a bare boolean cast: (c < 0) is NULL for a
        # NULL value, and summing all-NULLs returns NULL — an all-NULL
        # column (exactly what a profiler must flag) would report
        # negative_count=None instead of 0 (the DuckDB twin's CASE WHEN
        # already counted 0; this side silently disagreed on that edge)
        aggs.append(
            F.sum(
                F.when(F.col(c) < 0, F.lit(1)).otherwise(F.lit(0))
            ).alias(f"__neg_{c}")
        )
        aggs.append(F.min(c).alias(f"__min_{c}"))
        aggs.append(F.max(c).alias(f"__max_{c}"))
    wide = df.agg(*aggs)
    per_col = [
        F.struct(
            F.lit(c).alias("column"),
            F.col("total_rows"),
            F.col(f"__null_{c}").alias("null_count"),
            F.col(f"__neg_{c}").alias("negative_count"),
            F.col(f"__min_{c}").cast("double").alias("min_value"),
            F.col(f"__max_{c}").cast("double").alias("max_value"),
        )
        for c in value_cols
    ]
    return wide.select(F.explode(F.array(*per_col)).alias("p")).select("p.*")


def alignment_coverage(table1: DataFrame, table2: DataFrame) -> DataFrame:
    """Full-outer alignment diagnosis (J5, 01_setup.oy:250-259): how many
    (entity, month) cells exist in both tables vs only one."""
    # distinct BEFORE the full-outer join: duplicate (entity, month)
    # cells on both sides would multiply (2 dup rows x 3 dup rows = 6
    # joined rows for ONE cell) and every count would inflate — and
    # input duplicates are precisely what a quality operator must
    # tolerate (duplicate_stats exists to count them)
    t1 = table1.select(KEY, TIME).distinct().withColumn("__in1", F.lit(1))
    t2 = table2.select(KEY, TIME).distinct().withColumn("__in2", F.lit(1))
    both = t1.join(t2, on=[KEY, TIME], how="full_outer")
    return both.agg(
        F.count(F.lit(1)).alias("total_cells"),
        F.sum(
            (F.col("__in1").isNotNull() & F.col("__in2").isNotNull()).cast("bigint")
        ).alias("matched"),
        F.sum(
            (F.col("__in1").isNotNull() & F.col("__in2").isNull()).cast("bigint")
        ).alias("table1_only"),
        F.sum(
            (F.col("__in1").isNull() & F.col("__in2").isNotNull()).cast("bigint")
        ).alias("table2_only"),
    )


def duplicate_stats(df: DataFrame, key_cols: list[str]) -> DataFrame:
    """Duplicate detection (A5, 05_prod_dev.py:510-530): total vs distinct
    on the key columns, as one aggregation (count_distinct instead of the
    reference's second scan)."""
    # countDistinct over a STRUCT, not bare columns: multi-arg
    # count_distinct drops any row with a NULL in any column, so a
    # single null-keyed row would report a phantom duplicate (the
    # struct itself is never null, so every row counts — matching the
    # DuckDB twin's SELECT DISTINCT)
    dk = F.count_distinct(F.struct(*[F.col(c) for c in key_cols]))
    return df.agg(
        F.count(F.lit(1)).alias("total_rows"),
        dk.alias("distinct_rows"),
        (F.count(F.lit(1)) - dk).alias("duplicates"),
    )


def qa_invariants(
    mapped: DataFrame,
    table1: DataFrame,
    time1_col: str = "time1",
    time2_col: str = "time2",
    value1_col: str = "value1",
    value2_col: str = "value2",
    lag_col: str = "lag_offset",
) -> DataFrame:
    """The production QA suite (05_prod_dev.py:469-621) as ONE row:

    - coverage: mapped entities vs input entities (gate >= 70%)
    - duplicates on (entity, time1, time2) (gate == 0)
    - lag min/max/avg (gate max <= 12)
    - value2/value1 ratio stats over value1 > 0 (gate max <= 1)
    - temporal violations: time2 < time1 (gate == 0)

    Two jobs total (mapped aggregation + input distinct), vs the
    reference's eight; thresholds live in :func:`qa_report`.
    """
    ratio = F.when(
        F.col(value1_col) > 0, F.col(value2_col) / F.col(value1_col)
    )
    agg = mapped.agg(
        F.count(F.lit(1)).alias("total_mappings"),
        F.count_distinct(KEY).alias("mapped_entities"),
        # struct for the same null-key reason as duplicate_stats
        (
            F.count(F.lit(1))
            - F.count_distinct(
                F.struct(F.col(KEY), F.col(time1_col), F.col(time2_col))
            )
        ).alias("duplicates"),
        F.min(lag_col).alias("min_lag"),
        F.max(lag_col).alias("max_lag"),
        F.avg(lag_col).alias("avg_lag"),
        F.min(ratio).alias("min_ratio"),
        F.max(ratio).alias("max_ratio"),
        F.avg(ratio).alias("avg_ratio"),
        F.stddev(ratio).alias("std_ratio"),
        # coalesce: sum over an EMPTY mapped frame returns NULL, and
        # qa_report's `violations == 0` check would then FAIL a run with
        # zero violations (when/otherwise also keeps null-dated rows
        # from nulling the sum)
        F.coalesce(
            F.sum(
                F.when(
                    F.to_date(F.col(time2_col)) < F.to_date(F.col(time1_col)),
                    F.lit(1),
                ).otherwise(F.lit(0))
            ),
            F.lit(0),
        ).alias("temporal_violations"),
    )
    totals = table1.agg(F.count_distinct(KEY).alias("total_entities"))
    return agg.crossJoin(totals).select(
        "total_entities",
        "mapped_entities",
        "total_mappings",
        "duplicates",
        "min_lag",
        "max_lag",
        "avg_lag",
        "min_ratio",
        "max_ratio",
        "avg_ratio",
        "std_ratio",
        "temporal_violations",
    )


def qa_report(
    mapped: DataFrame, table1: DataFrame, **kwargs
) -> dict:
    """Collect :func:`qa_invariants` and apply the reference's gates.

    Returns the reference checker's dict shape: per-check status plus an
    overall ``passed`` (FAIL on coverage < 70% or temporal violations;
    WARNING-only on duplicates, lag > 12, ratio > 1 — matching
    05_prod_dev.py status semantics).
    """
    row = qa_invariants(mapped, table1, **kwargs).collect()[0]
    coverage = (
        row["mapped_entities"] / row["total_entities"] * 100
        if row["total_entities"]
        else 0.0
    )
    checks = {
        "coverage": {
            "total_customers": row["total_entities"],
            "mapped_customers": row["mapped_entities"],
            "coverage_pct": coverage,
            "status": "PASS" if coverage >= 70 else "FAIL",
        },
        "duplicates": {
            "total_mappings": row["total_mappings"],
            "duplicates": row["duplicates"],
            "status": "PASS" if row["duplicates"] == 0 else "WARNING",
        },
        "lag": {
            "min_lag": row["min_lag"],
            "max_lag": row["max_lag"],
            "avg_lag": row["avg_lag"],
            "status": "PASS" if (row["max_lag"] or 0) <= 12 else "WARNING",
        },
        "ratio": {
            "min_ratio": row["min_ratio"],
            "max_ratio": row["max_ratio"],
            "avg_ratio": row["avg_ratio"],
            "std_ratio": row["std_ratio"] or 0.0,
            "status": "PASS"
            if (row["max_ratio"] or 0) <= 1
            else "WARNING",
        },
        "temporal": {
            "violations": row["temporal_violations"],
            "status": "PASS" if row["temporal_violations"] == 0 else "FAIL",
        },
    }
    passed = all(c["status"] != "FAIL" for c in checks.values())
    return {"passed": passed, "checks": checks}
