"""Same-session interleaved A/B of q_ngram_jaccard's two code shapes:

A = shared hsets (current tree): one pinned tokenize+shingle+hash pass
    feeds both the PPJoin half and the decontamination half.
B = independent passes (pre-r13 shape): each half derives its own
    shingle frames (ngram_jaccard_pairs pins its own hsets; decontam
    re-shingles train and holdout from the raw docs).

Both shapes run under the SAME session conf (whatever session.py ships)
with bench.time_query methodology (noop sink, cache cleared between
reps). Prints one JSON line.

Usage: python tools/r13_ngram_shape_ab.py [--reps=N]
"""

from __future__ import annotations

import json
import os
import statistics
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from mapping_timeseries_spark.operators.dedup import (  # noqa: E402
    _ngram_hsets,
    dedup_cache_scope,
    ngram_decontaminate,
    ngram_jaccard_pairs,
    scoped_pin,
)
from mapping_timeseries_spark.session import get_spark  # noqa: E402
from mapping_timeseries_spark.sources.readers import read_table  # noqa: E402


def q_shared(spark, sf_dir):
    docs = read_table(spark, sf_dir, "documents")
    hsets = scoped_pin(_ngram_hsets(docs, "text", 2, keep_cols=("source",)))
    near = ngram_jaccard_pairs(docs, threshold=0.5, hsets=hsets).select(
        F.lit("neardup").alias("kind"),
        "doc_a",
        "doc_b",
        F.round("jaccard", 6).alias("score"),
    )
    contam = ngram_decontaminate(
        docs.where(F.col("source") != "src0"),
        docs.where(F.col("source") == "src0"),
        min_overlap=0.2,
        train_hsets=hsets.where(F.col("source") != "src0"),
        holdout_hsets=hsets.where(F.col("source") == "src0"),
    ).select(
        F.lit("contam").alias("kind"),
        F.col("train_doc").alias("doc_a"),
        F.col("holdout_doc").alias("doc_b"),
        F.round("overlap", 6).alias("score"),
    )
    return near.unionByName(contam)


def q_independent(spark, sf_dir):
    docs = read_table(spark, sf_dir, "documents")
    near = ngram_jaccard_pairs(docs, threshold=0.5).select(
        F.lit("neardup").alias("kind"),
        "doc_a",
        "doc_b",
        F.round("jaccard", 6).alias("score"),
    )
    contam = ngram_decontaminate(
        docs.where(F.col("source") != "src0"),
        docs.where(F.col("source") == "src0"),
        min_overlap=0.2,
    ).select(
        F.lit("contam").alias("kind"),
        F.col("train_doc").alias("doc_a"),
        F.col("holdout_doc").alias("doc_b"),
        F.round("overlap", 6).alias("score"),
    )
    return near.unionByName(contam)


def main() -> None:
    reps = 4
    for a in sys.argv[1:]:
        if a.startswith("--reps="):
            reps = int(a.split("=", 1)[1])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        "r13_ngram_shape_ab",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
        extra_conf={"spark.driver.memory": "16g"},
    )

    def side(fn):
        with dedup_cache_scope():
            return bench.time_query(spark, fn, sf_dir, reps)

    ra = side(q_shared)
    rb = side(q_independent)
    ra += side(q_shared)
    rb += side(q_independent)
    out = {
        "A_shared_reps": [round(x, 3) for x in ra],
        "B_independent_reps": [round(x, 3) for x in rb],
        "A_median": round(statistics.median(ra[1:]), 3),
        "B_median": round(statistics.median(rb[1:]), 3),
        "A_min": round(min(ra[1:]), 3),
        "B_min": round(min(rb[1:]), 3),
    }
    out["B_over_A_median"] = round(out["B_median"] / out["A_median"], 3)
    out["B_over_A_min"] = round(out["B_min"] / out["A_min"], 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
