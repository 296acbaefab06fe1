"""SparkSession construction and per-query session settings.

The reference mutates a live session inside the engine constructor
(mapping_engine.py:449-456). We instead set everything once at build time,
and expose :func:`ensure_runtime_conf` for code paths that receive an
externally-built session (e.g. the driver harness).
"""

from __future__ import annotations

from pyspark.sql import SparkSession

#: Runtime-settable SQL confs the engine relies on.
#:
#: - AQE + partition coalescing (reference mapping_engine.py:451-452):
#:   runtime re-planning, auto-broadcast, skew-join handling at scale.
#: - Arrow (reference mapping_engine.py:453): vectorized JVM<->Python
#:   transfer for the DTW ``applyInPandas`` path.
#: - ``ansi.enabled=false``: Spark 4 defaults to ANSI mode, under which
#:   ``corr`` on a zero-variance or single-point group raises
#:   DIVIDE_BY_ZERO. The reference's scipy ``pearsonr`` yields NaN there
#:   and the lag scan skips it (mapping_engine.py:152-158); non-ANSI
#:   ``corr`` reproduces that (NaN/null, filtered downstream).
RUNTIME_CONF: dict[str, str] = {
    # UTC so NTZ->LTZ normalization in readers.read_table is a pure
    # relabeling (no wall-clock shift, no DST edge) in ANY session,
    # including the driver harness's externally-built one.
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    # r13 (guide §2.2/§2.4): let AQE re-optimize CACHED plans too. By
    # default Spark compiles persist()-ed subplans WITHOUT AQE so the
    # cached partitioning is stable, which leaves every pinned frame
    # (scoped_pin in the dedup/bm25/mapping paths) materialized at the
    # raw spark.sql.shuffle.partitions count and every downstream stage
    # running that many tasks regardless of data size — measured at
    # sf0.1: 32-task stages throughout corr_mapping/auto_mapping while
    # the unpinned corr_best_lag coalesced to 2-8 tasks. With this on,
    # cached plans get the same AQE coalescing/skew handling as the
    # rest of the query (partitioning only — results unchanged;
    # interleaved A/B min-of-8: corr_mapping -36%, bm25_topk -25%,
    # auto_mapping -15%, ngram_jaccard -14%, nothing slower). Scale
    # posture: this is the scale-ADAPTIVE choice (cached partition
    # count follows data volume instead of a constant), not a local[32]
    # tune; the trade is that a cached plan's output partitioning may
    # change across runs, which nothing in this engine relies on.
    "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.ansi.enabled": "false",
    # pandas-written parquet carries TIMESTAMP(NANOS), which the Spark
    # reader rejects outright; read as long and convert in the reader
    # (readers.read_table) — microsecond truncation matches DuckDB's
    # handling of the same files.
    "spark.sql.legacy.parquet.nanosAsLong": "true",
}


def ensure_runtime_conf(spark: SparkSession) -> SparkSession:
    """Apply :data:`RUNTIME_CONF` to an existing session (idempotent)."""
    for key, value in RUNTIME_CONF.items():
        spark.conf.set(key, value)
    return spark


def get_spark(
    app_name: str = "mapping_timeseries_spark",
    master: str = "local[*]",
    shuffle_partitions: int = 32,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build a session tuned for this engine.

    ``shuffle_partitions=32`` matches local core count for tests; on a real
    cluster callers pass a value sized to the data (or rely on AQE
    coalescing from a higher initial number).
    """
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
    )
    for key, value in RUNTIME_CONF.items():
        builder = builder.config(key, value)
    for key, value in (extra_conf or {}).items():
        builder = builder.config(key, value)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
