"""Sources (SURVEY §2.1 S1-S4).

Thin, pushdown-friendly readers. The reference reads Delta paths and
catalog tables (05_prod_dev.py:804-805, mapping_engine.py:821-822); our
storage is parquet. Filters passed to :func:`read_table` land in the scan's
``PushedFilters`` and, for partitioned layouts, prune partitions.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TPCH_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


#: Columns stored as TIMESTAMP(NANOS) in pandas-written parquet; read as
#: long (legacy conf in session.RUNTIME_CONF) and converted here. Floor
#: division to microseconds matches DuckDB's truncation of the same files.
_NANO_TS_COLS = {"events": ["ts"]}


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one fixture table (S2)."""
    from ..session import ensure_runtime_conf

    ensure_runtime_conf(spark)
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    for col in _NANO_TS_COLS.get(name, []):
        if dict(df.dtypes).get(col) == "bigint":
            # integer DIV: float division would lose microsecond precision
            # (nanosecond epochs exceed double's 53-bit mantissa)
            df = df.withColumn(
                col, F.timestamp_micros(F.expr(f"`{col}` DIV 1000"))
            )
    return df


def read_incremental(
    spark: SparkSession,
    path: str,
    time_col: str,
    start: str,
    end: str,
) -> DataFrame:
    """Date-range incremental scan (S4, 05_prod_dev.py:1065-1069).

    The ``between`` predicate is pushed to the parquet reader (min/max
    row-group skipping) and prunes partitions when the sink was written
    ``partitionBy(time_col)``.
    """
    return spark.read.parquet(path).where(F.col(time_col).between(start, end))


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Temp views over the fixture tables for the SQL surface (S3/S8)."""
    for name in TPCH_TABLES:
        read_table(spark, sf_dir, name).createOrReplaceTempView(name)
