"""Canonicalization layer (SURVEY §2.2 P1) and schema validation.

Arbitrary user column names are normalized to the internal canonical names
``cus_code`` / ``month`` / value via a rename-projection, exactly as the
reference does on entry (mapping_engine.py:517-527). The projection is also
what lets Catalyst prune the scan to three columns (SURVEY §4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

KEY = "cus_code"
TIME = "month"
VALUE1 = "txn_amount"
VALUE2 = "revenue"


def validate_schema(
    df: DataFrame, required_columns: list[str], table_name: str = "table"
) -> bool:
    """Column-name presence check; raises ``ValueError`` on missing columns.

    Matches the reference validator's contract (mapping_engine.py:356-374):
    name presence only, no type checks, driver-side (no Spark job).
    """
    missing = set(required_columns) - set(df.columns)
    if missing:
        raise ValueError(f"{table_name} missing required columns: {missing}")
    return True


def lattice_snap(col: str | F.Column, scale: int = 10000):
    """Snap a money-lattice double to its exact 1/scale lattice point:
    ``round(x*scale)::bigint / scale``.

    Monthly sums of 2-4dp money are *mathematically* on the 1e-4 lattice but
    each engine's float summation lands ~ulps away from it, in
    engine-specific directions. Snapping makes the values bit-identical
    doubles across engines/implementations — the precondition for feeding
    them into a float-sensitive DP (DTW) whose oracle runs elsewhere.
    Requires |x*scale| < 2^53 and accumulated error < 0.5/scale (holds for
    money sums by a huge margin).
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.round(c * F.lit(scale)).cast("bigint") / F.lit(float(scale))


def canonicalize(
    df: DataFrame,
    key_col: str,
    time_col: str,
    value_col: str,
    value_alias: str,
    table_name: str = "table",
) -> DataFrame:
    """Rename-projection to the canonical 3-column long format.

    Reference: mapping_engine.py:517-527. Validation errors match
    test_mapping_engine.py:249-265 (missing column -> ValueError).
    """
    validate_schema(df, [key_col, time_col, value_col], table_name)
    return df.select(
        F.col(key_col).alias(KEY),
        F.col(time_col).alias(TIME),
        F.col(value_col).alias(value_alias),
    )
