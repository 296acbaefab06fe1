"""Mergeable distinct-count sketches (HyperLogLog) for incremental
pipelines — the 100 TB answer to "distinct users per month, updated on
every append" when exact ``countDistinct`` would re-shuffle the whole
history per refresh.

Built on Spark's Datasketches HLL aggregates (``hll_sketch_agg`` /
``hll_union_agg`` / ``hll_sketch_estimate`` — JVM-side, no Python in
the path). The pattern mirrors ``plans/incremental.py``'s moment
algebra: persist a per-group SKETCH (kilobytes, not member sets),
advance it by unioning the new batch's sketches, estimate on read.

Why this is exact-enough and scale-correct:

- An HLL register set is a per-bucket MAX over hashed members — a set
  property with NO systematic order/partitioning dependence, so
  ``union(sketch(A), sketch(B))`` estimates what ``sketch(A ∪ B)``
  estimates and incremental state cannot drift from a full rebuild
  beyond sketch noise. Honest caveat (measured, pytest-pinned): the
  Datasketches estimate is not bit-identical across aggregation
  layouts — sparse->dense promotion depends on build history, so two
  equal sets can estimate apart by a fraction of the ~1.6% standard
  error (observed 0.6–1% on 1.1k-distinct groups). Contracts in tests
  are therefore tolerance-based; anything needing bit-stable numbers
  belongs on the exact countDistinct path.
- The union is algebraic (register-wise max), so advancing state costs
  O(groups × sketch_size) regardless of history length — the same
  contract the correlation moments carry.
- Estimates are approximate (~1.6%/sqrt(2^lgk) relative error at the
  default lgk=12); the exact twin (`countDistinct`) remains the right
  call below shuffle-pain scale. These operators exist for the regime
  where the exact form is the bottleneck.

Binary sketch encodings may legally differ between equal sets (sparse
vs dense promotion depends on build history), so equality contracts in
tests pin the ESTIMATES, never the bytes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "distinct_sketch",
    "sketch_estimate",
    "merge_sketches",
    "advance_distinct_state",
]

#: Default log2(registers): 4096 registers ≈ 1.6% relative standard
#: error, ~2-4 KB per group.
DEFAULT_LGK = 12


def distinct_sketch(
    df: DataFrame,
    group_cols: list,
    value_col: str,
    lgk: int = DEFAULT_LGK,
) -> DataFrame:
    """Per-group HLL sketch of ``value_col``: (group_cols..., sketch).
    One shuffle on the group key with map-side partial aggregation —
    the partials are sketches too, so hot groups combine before the
    exchange."""
    return df.groupBy(*group_cols).agg(
        F.hll_sketch_agg(value_col, F.lit(lgk)).alias("sketch")
    )


def sketch_estimate(
    sketches: DataFrame, estimate_col: str = "n_distinct"
) -> DataFrame:
    """Attach the distinct-count estimate to a sketch frame (keeps the
    sketch column — callers persisting state want both)."""
    return sketches.withColumn(
        estimate_col,
        F.hll_sketch_estimate(F.col("sketch")).cast("bigint"),
    )


def merge_sketches(
    sketches: DataFrame, group_cols: list, lgk: int = DEFAULT_LGK
) -> DataFrame:
    """Roll sketches up to a coarser grain (e.g. month -> year, or
    merging an old state table with a new batch's sketches) by
    register-wise union. ``allowDifferentLgConfigK`` stays False: a
    silent precision downgrade when states built under different lgk
    meet should be an explicit migration, not an accident."""
    return sketches.groupBy(*group_cols).agg(
        F.hll_union_agg("sketch", F.lit(False)).alias("sketch")
    )


def advance_distinct_state(
    state: DataFrame | None,
    new_batch: DataFrame,
    group_cols: list,
    value_col: str,
    lgk: int = DEFAULT_LGK,
) -> DataFrame:
    """Fold an append-only batch into the persisted per-group sketch
    state: sketch the batch, union with the existing state by group
    (full-outer semantics via unionByName — groups new to this batch
    keep their old sketch, brand-new groups appear). ``state=None``
    bootstraps from the first batch. Cost is O(groups + batch); the
    history is never re-read — pytest pins advanced-state estimates to a
    full recompute over the concatenated history within the sketch
    error budget (see the module caveat on bit-identity)."""
    fresh = distinct_sketch(new_batch, group_cols, value_col, lgk)
    if state is None:
        return fresh
    return merge_sketches(
        state.select(*group_cols, "sketch").unionByName(fresh),
        group_cols,
        lgk,
    )
