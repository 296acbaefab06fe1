"""Stateful month-append production flow, runnable end to end
(executed by tests/test_examples.py so it cannot rot).

    python examples/incremental_production.py

The reference's incremental mode (05_prod_dev.py:1054-1101) re-trains
the lag model on the date slice alone — a one-month slice cannot see
any lag past its own width. This engine's stateful mode keeps the
full-history model WITHOUT re-scanning history:

1. one-time backfill — ``init_corr_state`` persists the per-(entity,
   lag) correlation sufficient statistics, a ``max_lag``-row series
   tail, and per-entity count/sum state (versioned snapshots; the meta
   file is the atomic commit point);
2. each month — ``run_incremental(state_root=...)`` advances the state
   from O(entities x max_lag + new rows) input, finishes the
   full-history model from state, and emits QA-gated mappings for the
   new slice only;
3. retention — ``vacuum_corr_state`` clears superseded snapshots.
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

        spark = get_spark(
            "incremental-production", master="local[4]", shuffle_partitions=4
        )
    out_root = out_root or tempfile.mkdtemp(prefix="mts_incremental_")

    from mapping_timeseries_spark.operators.canonicalize import (
        VALUE1,
        VALUE2,
        canonicalize,
    )
    from mapping_timeseries_spark.operators.merge import merge_series
    from mapping_timeseries_spark.plans.incremental import (
        init_corr_state,
        vacuum_corr_state,
    )
    from mapping_timeseries_spark.plans.pipeline import run_incremental
    from mapping_timeseries_spark.sources.fixtures import synthetic_pair

    # -- data: two years of history land as parquet tables ------------
    t1, t2 = synthetic_pair(spark, num_customers=15, num_months=24)
    p1, p2 = os.path.join(out_root, "txn"), os.path.join(out_root, "rev")
    t1.write.mode("overwrite").parquet(p1)
    t2.write.mode("overwrite").parquet(p2)
    months = sorted(
        r["month"] for r in t1.select("month").distinct().collect()
    )
    history_end, new_month = months[-2], months[-1]

    # -- 1. one-time backfill: state over history ----------------------
    state_root = os.path.join(out_root, "corr_state")
    c1 = canonicalize(
        t1.where(F.col("month") <= history_end),
        "cus_code", "month", "txn_amount", VALUE1,
    )
    c2 = canonicalize(
        t2.where(F.col("month") <= history_end),
        "cus_code", "month", "revenue", VALUE2,
    )
    meta = init_corr_state(merge_series(c1, c2), state_root, max_lag=6)
    if show:
        print(f"state bootstrapped through {meta['through_month']}")

    # -- 2. the monthly job: advance + apply, full-history model -------
    result = run_incremental(
        spark, p1, p2, None,
        "cus_code", "month", "txn_amount", "revenue",
        start=new_month, end=new_month,
        state_root=state_root,
        output_path=os.path.join(out_root, "out"),
    )
    n_new = result.stats["total_mappings"]
    if show:
        print(
            f"month {new_month}: {n_new} mappings, "
            f"qa_passed={result.qa['passed']}, sla={result.stats['sla_met']}"
        )

    # -- 3. retention ---------------------------------------------------
    removed = vacuum_corr_state(state_root, keep_last=1)
    if show:
        print(f"vacuumed snapshots: {removed}")

    out = {
        "through_month": meta["through_month"],
        "new_month_mappings": n_new,
        "qa_passed": result.qa["passed"],
        "state_root": state_root,
    }
    if own_session:
        spark.stop()
    return out


if __name__ == "__main__":
    main()
