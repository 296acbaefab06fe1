"""Dump EXECUTED (AdaptiveSparkPlan final) plans for named queries into
plans/r14/.

Usage: python tools/r14_executed_dump.py <suffix> <query> [query ...]

Runs each query once through the noop sink (so AQE finalizes every
stage), then writes the post-execution ``explain("formatted")`` — which
carries the "== Final Plan ==" sections with ReusedExchange /
AQEShuffleRead nodes — to plans/r14/<query>_<suffix>.txt. This is the
runtime truth the static dumps cannot show (a bare exchange-gate reuse
point prints its subtree once per consumer in the STATIC tree; only the
executed plan proves the shuffle was planned once and reused —
OPTIMIZATION_r13.md "NOTE on reading the static plans").

Reads $SPARK_GRAFT_SF_DIR / $SPARK_GRAFT_CPUS exactly like bench.py.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from r13_explain_dump import bench_query_map  # noqa: E402

from mapping_timeseries_spark.session import get_spark  # noqa: E402


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        "r14",
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(
        "r14_executed_dump",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
        extra_conf={"spark.driver.memory": "16g"},
    )
    qs = bench_query_map()
    from mapping_timeseries_spark.operators.dedup import dedup_cache_scope

    for name in names:
        if name not in qs:
            print(f"unknown query {name}", file=sys.stderr)
            continue
        with dedup_cache_scope():
            df = qs[name](spark, sf_dir)
            spark.sparkContext.setJobDescription(f"executed_dump:{name}")
            df.write.format("noop").mode("overwrite").save()
            spark.sparkContext.setJobDescription(None)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
        spark.catalog.clearCache()
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(buf.getvalue())
        txt = buf.getvalue()
        print(
            f"dumped {name}_{suffix}.txt reused_exchanges="
            f"{txt.count('ReusedExchange')} "
            f"inmemory_scans={txt.count('InMemoryTableScan')}",
            file=sys.stderr,
        )
    spark.stop()


if __name__ == "__main__":
    main()
