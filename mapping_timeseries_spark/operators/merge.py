"""Merge join (SURVEY §2.3 J1): align the two series tables on (key, time).

The central "same period" operation — an inner equi-join on the composite
key (reference: mapping_engine.py:540-550).

Scale notes
-----------
Both inputs arrive partitioned however the scan produced them; the join
shuffles both sides on (cus_code, month). We deliberately do NOT
pre-``repartition(N, 'cus_code')`` like the reference (mapping_engine.py:530)
— that adds a shuffle on a *prefix* of the join key which Catalyst cannot
reuse for the (cus_code, month) join, so it pays twice. AQE picks the
post-shuffle partition count and auto-broadcasts a small side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from .canonicalize import KEY, TIME, VALUE1, VALUE2


def merge_series(table1: DataFrame, table2: DataFrame) -> DataFrame:
    """Inner-join canonical t1/t2 on (cus_code, month).

    Output columns: cus_code, month, txn_amount, revenue — matching the
    reference's merged frame (mapping_engine.py:545-550).
    """
    return table1.join(table2, on=[KEY, TIME], how="inner").select(
        KEY, TIME, VALUE1, VALUE2
    )
