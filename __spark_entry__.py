"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship correlation-lag mapping at sf0.001.
``queries()`` exposes each implemented SURVEY §2 operator as a named
callable; ``oracle_sql()`` gives the DuckDB twin for every
SQL-expressible one (tables are pre-registered views).

All double outputs are rounded identically on both sides (all at 6dp: the money lattice is 4dp so no
value sits within float error of a 6dp midpoint) so the driver's order-insensitive value-hash is
stable across engines; counts are cast to BIGINT and lags to INT on both
sides for schema parity.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapping_timeseries_spark.operators.correlation import (
    best_lag_correlation,
    lag_correlation_grid,
)
from mapping_timeseries_spark.operators.dtw import build_dtw_mappings, dtw_summary
from mapping_timeseries_spark.operators.lag_join import build_correlation_mappings
from mapping_timeseries_spark.operators.merge import merge_series
from mapping_timeseries_spark.session import ensure_runtime_conf
from mapping_timeseries_spark.sources.fixtures import (
    SQL_MERGED,
    monthly_revenue,
    monthly_spend,
)

MAX_LAG = 6
MIN_CORRELATION = 0.3

# ---------------------------------------------------------------------------
# Spark-side query builders
# ---------------------------------------------------------------------------


def _merged(spark: SparkSession, sf_dir: str) -> DataFrame:
    return merge_series(monthly_spend(spark, sf_dir), monthly_revenue(spark, sf_dir))


def q_merged_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1: inner merge join of the two derived series tables."""
    ensure_runtime_conf(spark)
    m = _merged(spark, sf_dir)
    return m.select(
        "cus_code",
        "month",
        F.round("txn_amount", 6).alias("txn_amount"),
        F.round("revenue", 6).alias("revenue"),
    )


def q_corr_lag_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8 grid: per (entity, lag) Pearson correlation, positional alignment."""
    ensure_runtime_conf(spark)
    grid = lag_correlation_grid(_merged(spark, sf_dir), MAX_LAG)
    corr = F.when(F.isnan("corr"), F.lit(None)).otherwise(F.col("corr"))
    return grid.select(
        "cus_code",
        F.col("lag").cast("int").alias("lag"),
        F.round(corr, 6).alias("corr"),
        F.col("n_pairs").cast("bigint").alias("n_pairs"),
    )


def q_corr_best_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W2 argmax: per-entity optimal lag + best correlation (UDF-free)."""
    ensure_runtime_conf(spark)
    best = best_lag_correlation(_merged(spark, sf_dir), MAX_LAG)
    return best.select(
        "cus_code",
        F.col("optimal_lag").cast("int").alias("optimal_lag"),
        F.round("correlation", 6).alias("correlation"),
        F.col("num_months").cast("bigint").alias("num_months"),
        F.round("txn_mean", 6).alias("txn_mean"),
        F.round("rev_mean", 6).alias("rev_mean"),
    )


def q_corr_mapping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: correlation-lag mapping table (J2 lag join included)."""
    ensure_runtime_conf(spark)
    t1 = monthly_spend(spark, sf_dir)
    t2 = monthly_revenue(spark, sf_dir)
    corr = best_lag_correlation(merge_series(t1, t2), MAX_LAG)
    mappings = build_correlation_mappings(t1, t2, corr, MIN_CORRELATION)
    return mappings.select(
        "cus_code",
        "time1",
        F.round("value1", 6).alias("value1"),
        "time2",
        F.round("value2", 6).alias("value2"),
        F.col("lag_offset").cast("int").alias("lag_offset"),
        "method",
        F.round("correlation", 6).alias("correlation"),
    )


def q_dtw_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D3: per-entity DTW cost + path length (rows-only check: per-group DP
    via applyInPandas is not SQL-expressible; pytest holds the numpy oracle).
    """
    ensure_runtime_conf(spark)
    res = dtw_summary(_merged(spark, sf_dir), window_size=None, normalize=True)
    return res.select(
        "cus_code",
        F.round("total_cost", 6).alias("total_cost"),
        F.col("num_mappings").cast("int").alias("num_mappings"),
    )


def q_dtw_mapping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D3+F2: DTW mapping table (exploded alignment paths; rows-only)."""
    ensure_runtime_conf(spark)
    flat = build_dtw_mappings(_merged(spark, sf_dir), window_size=None, normalize=True)
    return flat.select(
        "cus_code",
        "time1",
        F.round("value1", 6).alias("value1"),
        "time2",
        F.round("value2", 6).alias("value2"),
        "lag_offset",
        "method",
        F.round("dtw_cost", 6).alias("dtw_cost"),
    )


# ---------------------------------------------------------------------------
# DuckDB oracle SQL
# ---------------------------------------------------------------------------


def _sql_lag_branches(max_lag: int) -> str:
    branches = ["SELECT cus_code, 0 AS lag, txn_amount, revenue AS rev FROM merged"]
    branches += [
        f"SELECT cus_code, {lag} AS lag, txn_amount, "
        f"lead(revenue, {lag}) OVER (PARTITION BY cus_code ORDER BY month) AS rev "
        "FROM merged"
        for lag in range(1, max_lag + 1)
    ]
    return "\nUNION ALL\n".join(branches)


def _sql_grid(max_lag: int) -> str:
    return f"""
grid AS (
  SELECT cus_code, lag, corr(txn_amount, rev) AS corr, count(rev) AS n_pairs
  FROM ({_sql_lag_branches(max_lag)}) pairs
  GROUP BY cus_code, lag
)"""


def _sql_best(max_lag: int) -> str:
    return f"""
{_sql_grid(max_lag)},
stats AS (
  SELECT cus_code, count(*) AS num_months,
         avg(txn_amount) AS txn_mean, avg(revenue) AS rev_mean
  FROM merged GROUP BY cus_code
),
ranked AS (
  SELECT cus_code, lag, corr,
         row_number() OVER (PARTITION BY cus_code
                            ORDER BY corr DESC, lag ASC) AS rn
  FROM grid
  WHERE n_pairs >= 2 AND corr IS NOT NULL AND NOT isnan(corr)
),
best AS (
  SELECT s.cus_code,
         CAST(COALESCE(r.lag, 0) AS INT) AS optimal_lag,
         COALESCE(r.corr,
                  CASE WHEN s.num_months >= 2 THEN -1.0 ELSE 0.0 END)
           AS correlation,
         s.num_months, s.txn_mean, s.rev_mean
  FROM stats s LEFT JOIN ranked r ON s.cus_code = r.cus_code AND r.rn = 1
)"""


SQL_MERGED_CTE = f"WITH merged AS ({SQL_MERGED})"

ORACLE_MERGED = f"""
{SQL_MERGED_CTE}
SELECT cus_code, month,
       round(txn_amount, 6) AS txn_amount,
       round(revenue, 6) AS revenue
FROM merged
"""

ORACLE_GRID = f"""
{SQL_MERGED_CTE},
{_sql_grid(MAX_LAG)[1:]}
SELECT cus_code, CAST(lag AS INT) AS lag, round(corr, 6) AS corr,
       CAST(n_pairs AS BIGINT) AS n_pairs
FROM grid
"""

ORACLE_BEST = f"""
{SQL_MERGED_CTE},
{_sql_best(MAX_LAG)[1:]}
SELECT cus_code, optimal_lag, round(correlation, 6) AS correlation,
       CAST(num_months AS BIGINT) AS num_months,
       round(txn_mean, 6) AS txn_mean, round(rev_mean, 6) AS rev_mean
FROM best
"""

ORACLE_MAPPING = f"""
{SQL_MERGED_CTE},
{_sql_best(MAX_LAG)[1:]},
t1 AS ({{sql_t1}}),
t2 AS ({{sql_t2}}),
valid AS (SELECT * FROM best WHERE correlation >= {MIN_CORRELATION}),
shifted AS (
  SELECT t1.cus_code, t1.month, t1.txn_amount, v.optimal_lag, v.correlation,
         strftime(strptime(t1.month || '-01', '%Y-%m-%d')
                  + to_months(v.optimal_lag), '%Y-%m') AS month2
  FROM t1 JOIN valid v ON t1.cus_code = v.cus_code
)
SELECT s.cus_code,
       s.month AS time1,
       round(s.txn_amount, 6) AS value1,
       s.month2 AS time2,
       round(t2.revenue, 6) AS value2,
       CAST(s.optimal_lag AS INT) AS lag_offset,
       'correlation' AS method,
       round(s.correlation, 6) AS correlation
FROM shifted s JOIN t2 ON s.cus_code = t2.cus_code AND s.month2 = t2.month
"""


# ---------------------------------------------------------------------------
# Driver contract
# ---------------------------------------------------------------------------


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return q_corr_mapping(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "merged_series": q_merged_series,
        "corr_lag_grid": q_corr_lag_grid,
        "corr_best_lag": q_corr_best_lag,
        "corr_mapping": q_corr_mapping,
        "dtw_summary": q_dtw_summary,
        "dtw_mapping": q_dtw_mapping,
    }


def oracle_sql() -> dict[str, str]:
    from mapping_timeseries_spark.sources.fixtures import SQL_T1, SQL_T2

    return {
        "merged_series": ORACLE_MERGED,
        "corr_lag_grid": ORACLE_GRID,
        "corr_best_lag": ORACLE_BEST,
        "corr_mapping": ORACLE_MAPPING.format(sql_t1=SQL_T1, sql_t2=SQL_T2),
    }
