"""Sinks (SURVEY §2.1 S5-S9).

The reference writes Delta (overwrite + month-partitioned + saveAsTable +
SQL view, 05_prod_dev.py:861-876, 04_comparision.py:434-443); vanilla-Spark
equivalents are parquet. Delta-only features (time travel/RESTORE, ZORDER,
overwriteSchema) are out of scope for a vanilla engine — documented N/A in
SURVEY §7.3.
"""

from __future__ import annotations

import json
import os
from typing import Any

from pyspark.sql import DataFrame, SparkSession


def write_overwrite(df: DataFrame, path: str) -> None:
    """S5: plain overwrite sink."""
    df.write.mode("overwrite").parquet(path)


def write_partitioned(df: DataFrame, path: str, partition_col: str) -> None:
    """S6: month-partitioned sink (05_prod_dev.py:861-867) — enables
    partition pruning for the incremental scan (readers.read_incremental).

    At 100 TB, partitioning by month keeps file counts sane (hundreds of
    partitions) while giving the date-range reads O(selected months) I/O.
    """
    df.write.mode("overwrite").partitionBy(partition_col).parquet(path)


def save_as_table(
    df: DataFrame, table: str, path: str | None = None, partition_col: str | None = None
) -> None:
    """S7: catalog table (saveAsTable / CREATE TABLE ... USING parquet)."""
    writer = df.write.mode("overwrite").format("parquet")
    if partition_col:
        writer = writer.partitionBy(partition_col)
    if path:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def save_bucketed(
    df: DataFrame,
    table: str,
    num_buckets: int = 64,
    bucket_cols: tuple[str, ...] = ("cus_code",),
    sort_cols: tuple[str, ...] | None = None,
    path: str | None = None,
) -> None:
    """S7 scale path: bucketed (+ optionally sorted) catalog table.

    Two tables bucketed identically on the join key join with ZERO
    shuffle — the scan IS the co-location (pytest asserts the joint plan
    has no Exchange). At 100 TB this is the difference between re-shuffling
    the fact tables every run and paying one bucketing write once: store
    the canonical (entity, month) series bucketed by entity and
    ``merge_series`` plus every downstream per-entity groupBy reads
    pre-partitioned data. ``sortBy`` within buckets additionally lets the
    sort-merge join skip its sort. Size ``num_buckets`` so a bucket fits
    an executor's memory at the target scale (100 TB / 64k buckets ≈
    1.5 GB; here 64 for local fixtures).
    """
    writer = (
        df.write.mode("overwrite")
        .format("parquet")
        .bucketBy(num_buckets, *bucket_cols)
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    if path:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def create_view(spark: SparkSession, name: str, sql: str) -> None:
    """S8: SQL view over results (05_prod_dev.py:1252-1266)."""
    spark.sql(f"CREATE OR REPLACE TEMP VIEW {name} AS {sql}")


def write_run_metadata(path: str, metadata: dict[str, Any]) -> None:
    """S9: run-metadata JSON artifact (05_prod_dev.py:885-903), driver-side."""
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        json.dump(metadata, f, indent=2, default=str)
