"""Quick-start: map any two entity/time/value tables — the engine's
version of the reference's example_usage.py, runnable end to end
(executed by tests/test_examples.py so it cannot rot).

    python examples/quickstart.py

Walks the same six steps as the reference quick start: session, data,
simple-interface mapping, results, analysis, save — then the two things
the reference could not do on plain parquet: publish the mapping table
as a snapshot VERSION and read it AS OF.
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def main(spark=None, out_root: str | None = None, show: bool = True) -> dict:
    own_session = spark is None
    if own_session:
        from mapping_timeseries_spark.session import get_spark

        spark = get_spark("quickstart", master="local[4]", shuffle_partitions=4)
    out_root = out_root or tempfile.mkdtemp(prefix="mts_quickstart_")

    # ── Step 1-2: your two tables (entity, time 'yyyy-MM', value) ──────
    # swap for spark.read.parquet(...) / spark.table(...) in production
    from mapping_timeseries_spark.sources.fixtures import synthetic_pair

    transactions, revenue = synthetic_pair(
        spark, num_customers=40, num_months=24
    )

    # ── Step 3: map them (simple interface, reference-parity) ──────────
    from mapping_timeseries_spark.engine import map_tables_simple

    result = map_tables_simple(
        spark,
        table1=transactions,
        table2=revenue,
        key_col="cus_code",
        time_col="month",
        value1_col="txn_amount",
        value2_col="revenue",
        method="auto",   # 'correlation', 'dtw', or 'auto'
        max_lag=3,
    )

    # ── Step 4-5: inspect ──────────────────────────────────────────────
    summary = result.groupBy("method").agg(
        F.count(F.lit(1)).alias("total_mappings"),
        F.round(F.avg("lag_offset"), 3).alias("avg_lag"),
        F.round(F.avg("value1"), 2).alias("avg_transaction"),
        F.round(F.avg("value2"), 2).alias("avg_revenue"),
    )
    lags = result.groupBy("lag_offset").count().orderBy("lag_offset")
    if show:
        result.show(5, truncate=False)
        summary.show()
        lags.show()

    # ── Step 6: publish as a snapshot version (vanilla time travel) ────
    from mapping_timeseries_spark.sources.versioned import (
        read_versioned,
        table_history,
        write_versioned,
    )

    table_root = os.path.join(out_root, "mapping_table")
    v = write_versioned(result, table_root, note="quickstart run")
    latest_rows = read_versioned(spark, table_root).count()

    stats = {
        "total_mappings": latest_rows,
        "methods": sorted(
            r["method"] for r in summary.select("method").collect()
        ),
        "published_version": v,
        "history": [h["note"] for h in table_history(table_root)],
    }
    if show:
        print(f"published v{v} at {table_root}: {stats}")
    if own_session:
        spark.stop()
    return stats


if __name__ == "__main__":
    main()
