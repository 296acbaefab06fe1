"""Cold-profile the ngram_jaccard leg STAGED vs UNSTAGED (VERDICT r13
#3 done-criterion: the staged flow must run the tokenize+shingle pass
over the documents table exactly ONCE per build, where the unstaged
cold pin materializes it concurrently from every consumer).

Counts, per action, the stages whose inputBytes indicate a read of the
documents parquet (the tokenize+shingle pass is the only consumer of
that table in this leg), via the UI REST API with per-phase job
descriptions.

Usage: SPARK_GRAFT_SF_DIR=... python tools/r14_ngram_staged_profile.py
Prints one JSON document.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod  # noqa: E402

import bench  # noqa: E402

from mapping_timeseries_spark.operators.dedup import dedup_cache_scope  # noqa: E402
from mapping_timeseries_spark.session import get_spark  # noqa: E402


class _StealMeter:
    """Steal-time % across a phase (host-contention stamp for the
    artifact — a code change cannot move steal)."""

    def __enter__(self):
        self._a = bench._steal_snapshot()
        return self

    def __exit__(self, *exc):
        b = bench._steal_snapshot()
        self.steal_pct = (
            round(100.0 * (b[0] - self._a[0]) / max(b[1] - self._a[1], 1), 2)
            if self._a is not None and b is not None
            else None
        )


def _rest(base: str, path: str):
    with urllib.request.urlopen(base + path, timeout=30) as r:
        return json.loads(r.read())


def _stages_for(base: str, app_id: str, label: str):
    jobs = _rest(base, f"/api/v1/applications/{app_id}/jobs")
    my = [j for j in jobs if (j.get("description") or "") == label]
    sids = sorted({s for j in my for s in j.get("stageIds", [])})
    out = []
    for sid in sids:
        try:
            sl = _rest(base, f"/api/v1/applications/{app_id}/stages/{sid}")
        except Exception:
            continue
        for s in sl:
            if s.get("status") == "SKIPPED":
                continue
            out.append(
                {
                    "stage": sid,
                    "input": s.get("inputBytes") or 0,
                    "exec_ms": s.get("executorRunTime") or 0,
                    "tasks": s.get("numCompleteTasks") or 0,
                }
            )
    return out


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    doc_bytes = os.path.getsize(
        os.path.join(sf_dir, "documents.parquet")
    ) if os.path.isfile(os.path.join(sf_dir, "documents.parquet")) else None
    spark = get_spark(
        "r14_ngram_staged_profile",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
        extra_conf={
            "spark.driver.memory": "16g",
            "spark.ui.enabled": "true",
            "spark.ui.port": "4050",
        },
    )
    sc = spark.sparkContext
    base = f"http://localhost:{sc.uiWebUrl.rsplit(':', 1)[1]}"
    app_id = sc.applicationId
    out: dict = {"sf_dir": sf_dir, "cpus": cpus, "doc_parquet_bytes": doc_bytes}

    def corpus_stages(stages):
        # a stage that reads the documents table has inputBytes >= ~90%
        # of the parquet file size (column pruning can shave a little)
        if not doc_bytes:
            return [s for s in stages if s["input"] > 0]
        return [s for s in stages if s["input"] >= 0.5 * doc_bytes]

    # UNSTAGED cold action (the default pin path)
    os.environ.pop("SPARK_GRAFT_STAGE_DIR", None)
    with _StealMeter() as sm_u, dedup_cache_scope():
        df = entry_mod.q_ngram_jaccard(spark, sf_dir)
        sc.setJobDescription("unstaged_main")
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        wall_unstaged = round(time.time() - t0, 3)
        sc.setJobDescription(None)
    spark.catalog.clearCache()
    st = _stages_for(base, app_id, "unstaged_main")
    out["unstaged"] = {
        "wall_main": wall_unstaged,
        "steal_pct": sm_u.steal_pct,
        "corpus_scan_stages_main": len(corpus_stages(st)),
        "corpus_scan_detail": corpus_stages(st),
        "total_exec_ms": sum(s["exec_ms"] for s in st),
    }

    # STAGED: the build (hsets parquet write) is its own labeled action
    tmp = tempfile.mkdtemp(prefix="ngram_staged_profile_")
    os.environ["SPARK_GRAFT_STAGE_DIR"] = tmp
    try:
        with _StealMeter() as sm_s, dedup_cache_scope():
            sc.setJobDescription("staged_build")
            t0 = time.time()
            df = entry_mod.q_ngram_jaccard(spark, sf_dir)
            wall_build = round(time.time() - t0, 3)
            sc.setJobDescription("staged_main")
            t0 = time.time()
            df.write.format("noop").mode("overwrite").save()
            wall_main = round(time.time() - t0, 3)
            sc.setJobDescription(None)
        spark.catalog.clearCache()
        st_b = _stages_for(base, app_id, "staged_build")
        st_m = _stages_for(base, app_id, "staged_main")
        out["staged"] = {
            "wall_build": wall_build,
            "wall_main": wall_main,
            "steal_pct": sm_s.steal_pct,
            # NOTE on classification: a fresh session's first parquet
            # scan can report inputBytes=0 (metrics attribution quirk,
            # observed on the build's tokenize stage), so raw stage
            # lists travel alongside the threshold counts — the build
            # list should contain exactly ONE exec-heavy stage (the
            # single tokenize+shingle pass) and the main list should
            # show every heavy stage reading the STAGED parquet sizes,
            # never the documents table.
            "corpus_scan_stages_build": len(corpus_stages(st_b)),
            "corpus_scan_stages_main": len(corpus_stages(st_m)),
            "stages_build": st_b,
            "stages_main": st_m,
            "total_exec_ms": sum(s["exec_ms"] for s in st_b + st_m),
        }
    finally:
        os.environ.pop("SPARK_GRAFT_STAGE_DIR", None)
        shutil.rmtree(tmp, ignore_errors=True)
    spark.stop()
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
