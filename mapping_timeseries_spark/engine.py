"""Top-level engine API, mirroring the reference's public surface.

``map_tables`` / ``map_tables_simple`` correspond to
``GenericMappingEngine.map_tables`` (mapping_engine.py:458-591) and
``map_tables_simple`` (mapping_engine.py:761-805): validate -> canonicalize
-> merge -> method dispatch -> metadata stamp.

Differences from the reference, by design (SURVEY §4):

- no eager ``.count()`` progress actions — stats come from one
  materialization via ``df.observe`` when the caller wants them;
- no fixed ``repartition(200)`` before per-entity work — the groupBy/window
  shuffle partitions by entity already, AQE sizes it;
- auto mode computes the correlation grid ONCE and routes on it, instead of
  re-running the correlation UDF on the simple segment
  (reference double-compute at mapping_engine.py:711-719).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .config import AUTO_SIMPLE_THRESHOLD, MappingConfig
from .operators.canonicalize import VALUE1, VALUE2, canonicalize
from .operators.correlation import best_lag_correlation
from .operators.dtw import build_dtw_mappings
from .operators.lag_join import build_correlation_mappings
from .operators.merge import merge_series

__all__ = ["MappingConfig", "map_tables", "map_tables_simple"]


def map_tables(
    table1: DataFrame,
    table2: DataFrame,
    key_col: str,
    time_col: str,
    value1_col: str,
    value2_col: str,
    config: MappingConfig | None = None,
    stamp_processed_at: bool = True,
) -> DataFrame:
    """Map two long-format time-series tables; returns the mapping table.

    Output schema (README.md:165-178): ``cus_code, time1, value1, time2,
    value2, lag_offset:int?, method, correlation?|dtw_cost?,
    processed_at:timestamp``.
    """
    cfg = config or MappingConfig()
    t1 = canonicalize(table1, key_col, time_col, value1_col, VALUE1, "table1")
    t2 = canonicalize(table2, key_col, time_col, value2_col, VALUE2, "table2")
    if cfg.cache_intermediate and cfg.method != "dtw":
        # correlation/auto consume each canonical series twice: once through
        # the merged frame feeding the correlation grid, once as a side of
        # the lag join. Persisting the (entity, month) aggregates — tiny
        # relative to the raw fact tables they derive from — turns two full
        # upstream scans into one. (DTW consumes only the merged frame.)
        t1 = t1.persist()
        t2 = t2.persist()
    merged = merge_series(t1, t2)

    if cfg.method == "correlation":
        corr = best_lag_correlation(merged, cfg.max_lag)
        result = build_correlation_mappings(t1, t2, corr, cfg.min_correlation)
    elif cfg.method == "dtw":
        result = build_dtw_mappings(merged, cfg.window_size, cfg.normalize)
    else:  # auto — one correlation pass, route entities on it
        if cfg.cache_intermediate:
            merged = merged.cache()
        corr = best_lag_correlation(merged, cfg.max_lag)
        if cfg.cache_intermediate:
            corr = corr.cache()
        simple = corr.where(F.col("correlation") >= AUTO_SIMPLE_THRESHOLD)
        complex_keys = corr.where(
            F.col("correlation") < AUTO_SIMPLE_THRESHOLD
        ).select("cus_code")
        corr_part = build_correlation_mappings(t1, t2, simple, cfg.min_correlation)
        dtw_part = build_dtw_mappings(
            merged.join(complex_keys, on="cus_code", how="left_semi"),
            cfg.window_size,
            cfg.normalize,
        )
        result = corr_part.unionByName(dtw_part, allowMissingColumns=True)

    if stamp_processed_at:
        result = result.withColumn("processed_at", F.current_timestamp())
    return result


def map_tables_simple(
    spark,
    table1: DataFrame,
    table2: DataFrame,
    key_col: str,
    time_col: str,
    value1_col: str,
    value2_col: str,
    method: str = "auto",
    max_lag: int = 6,
) -> DataFrame:
    """Simplified interface (mapping_engine.py:761-805)."""
    del spark  # kept for signature parity with the reference
    return map_tables(
        table1,
        table2,
        key_col,
        time_col,
        value1_col,
        value2_col,
        MappingConfig(method=method, max_lag=max_lag),
    )
