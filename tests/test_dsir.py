"""DSIR importance resampling (operators/dsir.py): planted-corpus
direction checks, an independent pure-Python md5 recomputation of the
weights, degenerate-doc behavior, and the TakeOrderedAndProject scale
path pinned equal to the full-rank selection."""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from mapping_timeseries_spark.operators.dsir import (
    dsir_feature_counts,
    dsir_gumbel_topk,
    dsir_logratio,
    dsir_weights,
)

SF = "/root/testdata/sf0.001"
B = 64  # small bucket count so planted tests cover collisions too


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _py_features(text: str) -> list[int]:
    toks = text.split()
    grams = toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]
    return [_h60(g) % B for g in grams]


def _py_logratio(target_texts, raw_texts, alpha=0.5) -> dict[int, int]:
    def counts(texts):
        c: dict[int, int] = {}
        for t in texts:
            for b in _py_features(t):
                c[b] = c.get(b, 0) + 1
        return c

    tc, rc = counts(target_texts), counts(raw_texts)
    tt, rt = sum(tc.values()), sum(rc.values())
    out = {}
    for b in range(B):
        pt = (tc.get(b, 0) + alpha) / (tt + alpha * B)
        pr = (rc.get(b, 0) + alpha) / (rt + alpha * B)
        out[b] = round(math.log(pt) * 1e9) - round(math.log(pr) * 1e9)
    return out


PLANTED = [
    (0, "alpha beta gamma alpha beta", "src0"),
    (1, "alpha gamma beta", "src0"),
    (2, "delta epsilon zeta delta", "src1"),
    (3, "epsilon zeta zeta delta", "src1"),
    (4, "alpha beta delta epsilon", "src2"),
    (5, "", "src2"),
    (6, None, "src2"),
]


@pytest.fixture(scope="module")
def planted(spark):
    return spark.createDataFrame(
        PLANTED, "doc_id long, text string, source string"
    )


def test_dsir_weights_match_python_twin(spark, planted):
    target = planted.where(F.col("source") == "src0")
    raw = planted.where(F.col("source") != "src0")
    model = dsir_logratio(target, raw, n_buckets=B)
    got = {
        r["doc_id"]: (r["n_features"], r["dsir_logw_nats"])
        for r in dsir_weights(planted, model, n_buckets=B).collect()
    }
    lr = _py_logratio(
        [t for _, t, s in PLANTED if s == "src0"],
        [t for _, t, s in PLANTED if s != "src0" and t],
    )
    for doc_id, text, _ in PLANTED:
        feats = _py_features(text) if text else []
        want = (len(feats), sum(lr[b] for b in feats))
        assert got[doc_id] == want, doc_id
    # direction: target-vocabulary docs score positive, raw negative
    assert got[0][1] > 0 and got[1][1] > 0
    assert got[2][1] < 0 and got[3][1] < 0
    # degenerate docs survive with zero weight
    assert got[5] == (0, 0) and got[6] == (0, 0)


def test_dsir_feature_counts_are_occurrences(spark, planted):
    # doc 0 "alpha beta gamma alpha beta": 5 unigrams + 4 bigrams = 9
    fc = dsir_feature_counts(planted, n_buckets=B)
    n = (
        fc.where(F.col("doc_id") == 0)
        .agg(F.sum("cnt").alias("s"))
        .collect()[0]["s"]
    )
    assert n == 9


def test_dsir_selection_pulls_toward_target(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    target = docs.where(F.col("source") == "src0")
    raw = docs.where(F.col("source") != "src0")
    model = dsir_logratio(target, raw, n_buckets=2048)
    sel = dsir_gumbel_topk(
        dsir_weights(docs, model, n_buckets=2048), k=100, full_rank=True
    )
    picked = {
        r["doc_id"] for r in sel.where("dsir_selected = 1").collect()
    }
    assert len(picked) == 100
    src0_ids = {r["doc_id"] for r in target.select("doc_id").collect()}
    # the target slice is 25/500 of the corpus; importance resampling
    # must pull essentially all of it into the top-100
    assert len(picked & src0_ids) >= len(src0_ids) - 1


def test_dsir_topk_scale_path_matches_full_rank(spark, planted):
    target = planted.where(F.col("source") == "src0")
    raw = planted.where(F.col("source") != "src0")
    model = dsir_logratio(target, raw, n_buckets=B)
    w = dsir_weights(planted, model, n_buckets=B)
    full = dsir_gumbel_topk(w, k=3, full_rank=True)
    fast = dsir_gumbel_topk(w, k=3)  # DEFAULT is the scale path
    plan = fast._sc._jvm.PythonSQLUtils.explainString(
        fast._jdf.queryExecution(), "simple"
    )
    # default plan: per-partition k-heaps, no single-partition window
    assert "TakeOrderedAndProject" in plan and "Window" not in plan
    want = {
        r["doc_id"]: r["dsir_score"]
        for r in full.where("dsir_selected = 1").collect()
    }
    got = {r["doc_id"]: r["dsir_score"] for r in fast.collect()}
    assert got == want
