"""mapping_timeseries_spark — a PySpark-native time-series mapping engine.

A from-scratch, Spark-first implementation of the capabilities of the
reference ``dangphdh/mapping-timeseries`` (Databricks notebooks around two
pandas GROUPED_MAP UDFs): lagged-correlation and DTW alignment of two
long-format entity time-series tables, plus the relational, streaming and
LLM-data-pipeline operators inventoried in SURVEY.md §2.
"""

from .config import MappingConfig
from .engine import map_tables, map_tables_simple
from .session import ensure_runtime_conf, get_spark

__all__ = [
    "MappingConfig",
    "map_tables",
    "map_tables_simple",
    "get_spark",
    "ensure_runtime_conf",
]
