"""Physical-plan audit for the headline queries (evidence for SCALE.md).

For each named query, builds the DataFrame at the given sf_dir and
summarizes ``explain("formatted")``: exchange count (total / broadcast),
whole-stage-codegen spans, ``PushedFilters`` lines (filter pushdown
reaching the parquet reader), and ``ReadSchema`` lines (column pruning —
a scan reading all columns for a narrow projection is a bug).

Usage: python tools/audit_plans.py [sf_dir] [query ...]
"""

from __future__ import annotations

import contextlib
import io
import sys

DEFAULT_QUERIES = [
    "corr_best_lag",
    "corr_mapping",
    "auto_mapping",
    "qa_invariants",
    "method_agreement",
    "monitoring_view",
    "minhash_dedup",
    "cosine_topk",
    "ann_topk",
    "ivf_topk",
    "embedding_near_dups",
    "sample_stratified",
]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    names = sys.argv[2:] or DEFAULT_QUERIES

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as entry_mod
    from mapping_timeseries_spark.session import get_spark

    spark = get_spark("audit_plans")
    qs = dict(entry_mod.queries())
    # bench-only legs (same aliases bench.py uses), so the audit can
    # cover every benched plan, not just the 50 registry entries
    for alias, fn_name in (
        ("gopher_repetition", "q_gopher_repetition"),
        ("dsir_select", "q_dsir_select"),
        ("minhash_incr", "q_minhash_incr"),
        ("bm25_topk", "q_bm25_topk"),
        ("ivf_topk_indexed", "q_ivf_topk_indexed"),
        ("bpe_train", "q_bpe_train"),
        ("unigram_train", "q_unigram_train"),
    ):
        fn = getattr(entry_mod, fn_name, None)
        if fn is not None:
            qs[alias] = fn
    for name in names:
        if name not in qs:
            print(f"=== {name}: not in queries()")
            continue
        df = qs[name](spark, sf_dir)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        # count operators from the detail headers "(N) Exchange" ONLY: a
        # raw substring count doubles every node (formatted explain
        # prints the tree line "Exchange (N)" AND the detail header) and
        # further counts ReusedExchange nodes, which are references to
        # an existing shuffle, not additional ones. The r4 review caught
        # the published counts being ~2x for exactly this reason.
        import re as _re

        headers = _re.findall(r"^\(\d+\) (\w+)", plan, flags=_re.M)
        exchanges = sum(1 for h in headers if h in ("Exchange", "BroadcastExchange"))
        broadcasts = sum(1 for h in headers if h == "BroadcastExchange")
        reused = sum(1 for h in headers if h == "ReusedExchange")
        # under AQE the pre-execution plan is an AdaptiveSparkPlan shell
        # with no codegen subtrees yet (they materialize per stage at
        # runtime), so probe the codegen count with AQE off — the static
        # plan's "Found N WholeStageCodegen subtrees" header
        import re

        spark.conf.set("spark.sql.adaptive.enabled", "false")
        try:
            cbuf = io.StringIO()
            with contextlib.redirect_stdout(cbuf):
                # fresh Dataset: df's own QueryExecution was already forced
                # under AQE by the formatted explain and is cached on it
                df.where("true").explain("codegen")
            m = re.search(
                r"Found (\d+) WholeStageCodegen subtrees", cbuf.getvalue()
            )
            codegen_spans = int(m.group(1)) if m else 0
        finally:
            spark.conf.set("spark.sql.adaptive.enabled", "true")
        print(
            f"=== {name}: Exchange={exchanges} (broadcast={broadcasts}, "
            f"reused={reused}) codegen_spans={codegen_spans}"
        )
        for line in plan.splitlines():
            stripped = line.strip()
            if "PushedFilters" in stripped or "ReadSchema" in stripped:
                print("   ", stripped[:160])
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
