"""As-of join: each left row picks the most recent right row at or before
its time (per key) — the canonical time-series alignment operator Spark
has no built-in for (the north-star brief's named example of a custom
operator; the reference's lag join, ``mapping_engine.py:626-644``, is the
equal-grain special case of it).

Spark-first formulation: NOT a range join (whose candidate set explodes
as |left| × |right-per-key| and falls back to broadcast-nested-loop),
but the union-window trick:

1. tag and ``unionByName`` both sides — right rows carry the value
   columns, left rows carry nulls;
2. one window per key ordered by (time, is_left) with
   ``last(value, ignorenulls=True)`` over the unbounded-preceding frame —
   the running "latest right value seen";
3. keep the left rows.

Cost: ONE shuffle of left+right on the key (same exchange the
downstream per-entity work reuses), per-row O(1) window state — the
same shape at 100 TB as at test scale. Right rows at a time equal to a
left row's time DO match (ASOF inclusive: right sorts before left on
the tie via the is_left column).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["asof_join", "interval_join"]


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    key_col: str,
    ts_col: str,
    start_col: str,
    end_col: str,
    granule_seconds: int = 3600,
    max_granules: int = 100_000,
) -> DataFrame:
    """Range/interval join: attach to each point row the interval (same
    key) containing its timestamp — the other classic time-series join
    Spark lacks natively.

    A naive ``ts BETWEEN start AND end`` theta join plans as
    broadcast-nested-loop with an |points| × |intervals-per-key|
    candidate set. The scale formulation buckets time into granules:
    intervals explode to the granules they span (cheap — span/granule
    rows each), points map to their single granule, and the join is a
    plain equi-join on (key, granule) + a containment filter. Candidate
    pairs are bounded by per-granule density instead of per-key interval
    count, and Catalyst gets a shuffled hash join it can size.

    ``start_col``/``end_col`` may be timestamps or castable strings.
    Points in no interval are dropped (inner); points in overlapping
    intervals yield one row per containing interval.

    ``max_granules`` guards the explode: one corrupt far-future end
    timestamp (the classic ``9999-12-31`` sentinel) would otherwise
    materialize a ~70M-element sequence for a single row and OOM the
    executor. Intervals spanning more granules than the cap raise a
    runtime error naming the offending key rather than silently
    truncating; raise the cap or pre-filter if genuinely long intervals
    are expected. Intervals with a NULL/unparseable bound or with
    ``end < start`` contribute NO matches (they contain no point —
    consistent with the inner-join contract) instead of aborting the
    job: a CASE over a NULL span takes the ELSE branch, so the naive
    ``when(span_ok, ...).otherwise(raise_error)`` formulation fired the
    error for exactly the rows that span nothing — and a negative span
    would have slipped past a one-sided cap into ``sequence``'s
    DESCENDING default (~29M elements for an epoch-0 end at 60s
    granules: the precise explosion the cap exists to stop).
    """
    g = F.lit(int(granule_seconds))
    start_g = F.floor(F.unix_timestamp(F.col(start_col).cast("timestamp")) / g)
    end_g = F.floor(F.unix_timestamp(F.col(end_col).cast("timestamp")) / g)
    span = end_g - start_g
    guarded_end = F.when(span <= F.lit(int(max_granules)), end_g).otherwise(
        F.raise_error(
            F.concat(
                F.lit(
                    f"interval_join: interval spans more than {int(max_granules)}"
                    f" granules of {int(granule_seconds)}s for key="
                ),
                F.col(key_col).cast("string"),
            )
        ).cast("long")
    )
    iv = intervals.where(
        start_g.isNotNull() & end_g.isNotNull() & (span >= 0)
    ).withColumn("__g", F.explode(F.sequence(start_g, guarded_end)))
    pt = points.withColumn(
        "__g", F.floor(F.unix_timestamp(F.col(ts_col).cast("timestamp")) / g)
    )
    ts = F.col(ts_col).cast("timestamp")
    return (
        pt.join(iv, [key_col, "__g"])
        .where(
            (ts >= F.col(start_col).cast("timestamp"))
            & (ts <= F.col(end_col).cast("timestamp"))
        )
        .drop("__g")
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_col: str,
    time_col: str,
    value_cols: list[str],
    suffix: str = "_asof",
) -> DataFrame:
    """ASOF LEFT JOIN (backward): DuckDB-twin semantics of
    ``left ASOF LEFT JOIN right ON left.key = right.key AND
    left.time >= right.time``.

    Returns every ``left`` row with ``<value>{suffix}`` columns from the
    latest right row at-or-before its time plus ``<time_col>{suffix}``
    (the matched right time), all NULL when no right row precedes.

    ``right`` must be unique per (key, time) — aggregate first if not
    (ties would resolve to the last row in union order, which is not
    deterministic across engines).
    """
    clash = set(value_cols) & set(left.columns)
    if clash:
        raise ValueError(f"value_cols collide with left columns: {sorted(clash)}")
    # the generated output names must be fresh too, or the final select
    # produces duplicate columns (AMBIGUOUS_REFERENCE downstream) — e.g.
    # chaining asof_join on its own output with the default suffix
    out_clash = {f"{v}{suffix}" for v in value_cols} | {f"{time_col}{suffix}"}
    out_clash &= set(left.columns)
    if out_clash:
        raise ValueError(
            f"output columns already exist in left: {sorted(out_clash)}; "
            f"pass a different suffix"
        )
    lt = left.withColumn("__is_left", F.lit(1))
    rt = right.select(
        key_col,
        F.col(time_col).alias(time_col),
        *value_cols,
    ).withColumn("__is_left", F.lit(0))
    unioned = lt.unionByName(rt, allowMissingColumns=True)

    w = (
        Window.partitionBy(key_col)
        .orderBy(F.col(time_col).asc(), F.col("__is_left").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # carry the matched right row as ONE struct, then unpack: per-column
    # last(v, ignorenulls=True) would skip a matched row whose value is
    # NULL and fall back to an OLDER row's value — time{suffix} and the
    # value columns could then come from DIFFERENT right rows (a
    # "frankenrow" the DuckDB ASOF twin never produces). The struct is
    # non-null for every right row, so ignorenulls selects matched ROWS
    # atomically and NULL values ride through as the matched row's NULLs.
    right_row = F.when(
        F.col("__is_left") == 0,
        F.struct(F.col(time_col).alias("__t"), *[F.col(v) for v in value_cols]),
    )
    matched = F.last(right_row, ignorenulls=True).over(w)
    out = unioned.select(
        "*",
        matched["__t"].alias(f"{time_col}{suffix}"),
        *[matched[v].alias(f"{v}{suffix}") for v in value_cols],
    )
    return out.where(F.col("__is_left") == 1).drop("__is_left", *value_cols)
