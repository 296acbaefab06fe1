"""Measure IVF recall@k on the embeddings fixture: seed centroids vs
Lloyd-refined (evidence for SCALE.md; judge r4 item #5 — the pytest
recall tests pin the property on synthetic clusters, this measures the
real fixture at the bench operating point).

Usage: python tools/ivf_recall.py [sf_dir] [k] [nlist] [nprobe]
Defaults match q_ivf_topk: k=5, nlist=16, nprobe=3, queries vec_id<20.
"""

from __future__ import annotations

import sys
import time


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    nlist = int(sys.argv[3]) if len(sys.argv) > 3 else 16
    nprobe = int(sys.argv[4]) if len(sys.argv) > 4 else 3

    sys.path.insert(0, "/root/repo")
    from pyspark.sql import functions as F

    from mapping_timeseries_spark.operators.similarity import (
        cosine_topk,
        ivf_refine_centroids,
        ivf_seed_centroids,
        ivf_topk,
    )
    from mapping_timeseries_spark.session import get_spark
    from mapping_timeseries_spark.sources.readers import read_table

    spark = get_spark(
        "ivf-recall", extra_conf={"spark.driver.memory": "8g"}
    )
    emb = read_table(spark, sf_dir, "embeddings").persist()
    queries = emb.where(F.col("vec_id") < 20)
    exact = {
        (r["query_id"], r["vec_id"])
        for r in cosine_topk(emb, queries, k=k).collect()
    }

    def recall(cents) -> float:
        got = {
            (r["query_id"], r["vec_id"])
            for r in ivf_topk(
                emb, queries, k=k, nprobe=nprobe, centroids=cents
            ).collect()
        }
        return len(got & exact) / len(exact)

    seeds = ivf_seed_centroids(emb, nlist).persist()
    r_seed = recall(seeds)
    t0 = time.time()
    refined = ivf_refine_centroids(emb, seeds, iterations=2).persist()
    refined.count()
    t_refine = time.time() - t0
    r_refined = recall(refined)
    print(
        f'{{"sf_dir": "{sf_dir}", "k": {k}, "nlist": {nlist}, '
        f'"nprobe": {nprobe}, "recall_seed": {r_seed:.4f}, '
        f'"recall_lloyd2": {r_refined:.4f}, '
        f'"refine_sec": {t_refine:.2f}}}'
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
