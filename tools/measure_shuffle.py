"""Measure executed shuffle volume per query (evidence for SCALE.md).

Runs each named query to completion, then walks the EXECUTED plan (the
post-AQE one) and sums the shuffle write metrics of every Exchange plus
the rows moved. The point: shuffle bytes are the scale currency — a
query whose shuffle volume grows super-linearly in the input is the one
that dies at 100 TB, long before CPU does. Run at two scale factors and
compare:

    python tools/measure_shuffle.py /root/testdata/sf0.01 corr_mapping
    python tools/measure_shuffle.py /root/testdata/sf0.1  corr_mapping

Prints one line per query: shuffle bytes written, shuffle records,
input rows scanned, and the bytes/input-row ratio that should stay flat
across scale factors for a linear operator.
"""

from __future__ import annotations

import sys


def _walk(node, out, seen):
    # JVM object identity guard: AQE nodes expose the same subtree under
    # several accessors (executedPlan/finalPhysicalPlan) and stages can
    # reuse exchanges — count every physical node exactly once or the
    # totals silently double
    node_id = node.id()
    if node_id in seen:
        return
    seen.add(node_id)
    name = node.nodeName()
    metrics = node.metrics()
    it = metrics.iterator()
    while it.hasNext():
        kv = it.next()
        key, metric = kv._1(), kv._2()
        if name.startswith("Exchange") or "ShuffleQueryStage" in name:
            if key == "shuffleBytesWritten" or metric.name().get() == "shuffle bytes written":
                out["shuffle_bytes"] += metric.value()
            if key == "shuffleRecordsWritten" or metric.name().get() == "shuffle records written":
                out["shuffle_records"] += metric.value()
        if "Scan" in name and metric.name().get() == "number of output rows":
            out["scan_rows"] += metric.value()
    ch = node.children().iterator()
    while ch.hasNext():
        _walk(ch.next(), out, seen)
    # AQE wraps executed stages; descend into the materialized subtree
    # (ONE accessor — finalPhysicalPlan is the same plan, see guard)
    for attr in ("executedPlan", "plan"):
        if hasattr(node, attr):
            try:
                _walk(getattr(node, attr)(), out, seen)
            except Exception:
                pass


def measure(df) -> dict:
    df.collect()
    qe = df._jdf.queryExecution()
    plan = qe.executedPlan()
    out = {"shuffle_bytes": 0, "shuffle_records": 0, "scan_rows": 0}
    _walk(plan, out, set())
    return out


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    names = sys.argv[2:]

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as entry_mod
    from mapping_timeseries_spark.session import get_spark

    qs = dict(entry_mod.queries())
    qs["pack_export"] = entry_mod.q_pack_export
    if not names:
        names = ["merged_series", "corr_mapping", "auto_mapping",
                 "minhash_dedup", "embedding_near_dups", "exact_dedup",
                 "quality_score", "pack_export"]
    unknown = [n for n in names if n not in qs]
    if unknown:  # fail before Spark startup and partial measurements
        print(f"unknown queries: {unknown}; known: {sorted(qs)}")
        return 2
    spark = get_spark("shuffle-measure", master="local[32]")
    for name in names:
        df = qs[name](spark, sf_dir)
        m = measure(df)
        ratio = (
            m["shuffle_bytes"] / m["scan_rows"] if m["scan_rows"] else float("nan")
        )
        print(
            f"{name}: shuffle_bytes={m['shuffle_bytes']:,} "
            f"shuffle_records={m['shuffle_records']:,} "
            f"scan_rows={m['scan_rows']:,} bytes_per_scan_row={ratio:.1f}"
        )
        spark.catalog.clearCache()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
