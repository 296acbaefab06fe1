"""Method comparison, recommendation model, and production routing
(SURVEY §2.3 J8, §2.2 P9/P6, §3.3).

The research flow (04_comparision.py) joins correlation and DTW summaries
per entity and derives a routing table ("the model"); the production
pipeline (05_prod_dev.py:330-451) re-loads it and routes each entity to a
method, with a lag-1 correlation fallback for entities the model has never
seen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .canonicalize import KEY

__all__ = [
    "compare_methods",
    "recommendation_table",
    "route_entities",
    "CORRELATION_METHODS",
]

#: recommended_method values routed to the correlation path
#: (05_prod_dev.py:369-371).
CORRELATION_METHODS = (
    "Correlation",
    "Either (prefer Correlation for simplicity)",
)


def compare_methods(corr_results: DataFrame, dtw_results: DataFrame) -> DataFrame:
    """Inner-join per-entity correlation and DTW summaries
    (04_comparision.py:45-56).

    dtw_results needs (cus_code, total_cost, num_mappings); adds
    avg_distance = total_cost / num_mappings (03_dtw_mapping.py variant).
    """
    return (
        corr_results.select(KEY, "correlation", "optimal_lag")
        .join(
            dtw_results.select(
                KEY,
                "total_cost",
                "num_mappings",
                (F.col("total_cost") / F.col("num_mappings")).alias("avg_distance"),
            ),
            on=KEY,
            how="inner",
        )
    )


def recommendation_table(comparison: DataFrame) -> DataFrame:
    """Per-entity routing model (04_comparision.py:243-287).

    Thresholds and strings are the reference's verbatim — they ARE the
    model contract consumed by the production pipeline.
    """
    c = F.col("correlation")
    cost = F.col("total_cost")
    return comparison.select(
        KEY,
        "correlation",
        "optimal_lag",
        "total_cost",
        F.when((c >= 0.7) & (F.col("optimal_lag") <= 2), "Correlation")
        .when((c >= 0.5) & (cost <= 10), "Either (prefer Correlation for simplicity)")
        .when(cost <= 15, "DTW")
        .otherwise("Complex - Manual Review")
        .alias("recommended_method"),
        F.when((c >= 0.8) | (cost <= 5), "High")
        .when((c >= 0.5) | (cost <= 15), "Medium")
        .otherwise("Low")
        .alias("confidence"),
        F.when(c >= 0.7, "High correlation with simple lag pattern")
        .when(cost <= 10, "Low DTW cost indicates good alignment")
        .when(
            (c < 0.3) & (cost > 20),
            "Both methods show poor fit - investigate data quality",
        )
        .otherwise("Moderate fit - consider business context")
        .alias("reason"),
    )


def route_entities(
    input_entities: DataFrame, recommendations: DataFrame
) -> DataFrame:
    """Production routing (05_prod_dev.py:358-414): left-join the model and
    assign each entity a route.

    Output: ``cus_code, route ('correlation'|'dtw'|'default'), optimal_lag``
    — ``default`` is the no-recommendation fallback with lag fixed to 1
    (05_prod_dev.py:409-411). The reference materializes three filtered
    DataFrames + counts; we emit one routed frame (single pass) that
    callers split with cheap filters.
    """
    joined = input_entities.select(KEY).join(
        recommendations.select(KEY, "recommended_method", "optimal_lag"),
        on=KEY,
        how="left",
    )
    return joined.select(
        KEY,
        F.when(
            F.col("recommended_method").isin(*CORRELATION_METHODS), "correlation"
        )
        .when(F.col("recommended_method") == "DTW", "dtw")
        .when(F.col("recommended_method").isNull(), "default")
        .otherwise("manual_review")
        .alias("route"),
        F.when(F.col("recommended_method").isNull(), F.lit(1))
        .otherwise(F.col("optimal_lag"))
        .cast("int")
        .alias("optimal_lag"),
    )
