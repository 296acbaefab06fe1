"""Statistical text models: bigram-LM perplexity + Naive-Bayes
classifier vs an independent pure-Python oracle, planted-signal
behavior, OOV/empty-doc edges, and layout determinism.

The DuckDB hash twin runs in the driver gate (quality_score fold);
these tests pin SEMANTICS against a from-scratch reimplementation so a
bug mirrored into the SQL twin cannot self-certify.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from mapping_timeseries_spark.operators.textmodels import (
    NAT_SCALE,
    bigram_lm_counts,
    lm_perplexity,
    nb_score,
    nb_train,
)

TRAIN = [
    (0, "the cat sat on the mat", 0),
    (1, "the dog sat on the rug", 0),
    (2, "a cat and a dog play", 0),
    (3, "buy cheap pills now online", 1),
    (4, "cheap pills cheap pills buy", 1),
]


def _py_lm(train_texts, score_texts, k=0.5):
    """From-scratch bigram LM with the engine's micro-nat contract."""
    uni: dict = {}
    bi: dict = {}
    for t in train_texts:
        ws = t.split()
        for i, w in enumerate(ws):
            uni[w] = uni.get(w, 0) + 1
            if i + 1 < len(ws):
                key = (w, ws[i + 1])
                bi[key] = bi.get(key, 0) + 1
    v = len(uni) + 1
    out = []
    for t in score_texts:
        ws = t.split()
        if len(ws) < 2:
            out.append((0, 0, None, None))
            continue
        nats = 0
        oov = 0
        for i in range(len(ws) - 1):
            c2 = bi.get((ws[i], ws[i + 1]), 0)
            c1 = uni.get(ws[i], 0)
            if c2 == 0:
                oov += 1
            p = (c2 + k) / (c1 + k * v)
            nats += int(round(math.log(p) * NAT_SCALE))
        n = len(ws) - 1
        avg = round(-nats / (NAT_SCALE * n), 6)
        out.append((n, oov, avg, round(math.exp(avg), 6)))
    return out


def test_lm_matches_pure_python_oracle(spark):
    docs = spark.createDataFrame(
        [(i, t) for i, t, _ in TRAIN] + [(5, "the cat play online"), (6, "hi")],
        ["doc_id", "text"],
    )
    train = docs.where(F.col("doc_id") <= 4)
    model = bigram_lm_counts(train)
    # v is a LAZY 1-row frame (model building must trigger no job)
    assert model["v"].first()["v"] == len(
        {w for _, t, _ in TRAIN for w in t.split()}
    ) + 1
    got = {
        r["doc_id"]: (r["n_trans"], r["oov_trans"], r["avg_nll"], r["ppl"])
        for r in lm_perplexity(docs, model, k=0.5).collect()
    }
    texts = [t for _, t, _ in TRAIN] + ["the cat play online", "hi"]
    want = _py_lm(texts[:5], texts, k=0.5)
    for i, w in enumerate(want):
        assert got[i] == w, (i, got[i], w)
    # single-token and unseen-bigram docs took the edge paths
    assert got[6] == (0, 0, None, None)
    assert got[5][1] > 0  # "cat play" / "play online" unseen in train


def test_lm_discriminates_in_domain_text(spark):
    """Text drawn from the training distribution must score lower
    perplexity than out-of-domain text — the signal the CCNet-style
    filter thresholds on."""
    docs = spark.createDataFrame(
        [(i, t) for i, t, _ in TRAIN]
        + [
            (10, "the cat sat on the rug"),      # in-domain recombination
            (11, "quantum flux harmonics collapse entropy"),  # out-of-domain
        ],
        ["doc_id", "text"],
    )
    model = bigram_lm_counts(docs.where(F.col("doc_id") <= 4))
    ppl = {
        r["doc_id"]: r["ppl"]
        for r in lm_perplexity(docs, model).collect()
    }
    assert ppl[10] < ppl[11]


def test_lm_empty_and_repartition_determinism(spark):
    docs = spark.createDataFrame(
        [(0, "a b c d e"), (1, ""), (2, "   "), (3, "x")],
        ["doc_id", "text"],
    )
    model = bigram_lm_counts(docs)
    base = {tuple(r) for r in lm_perplexity(docs, model).collect()}
    # empty/whitespace/single-token docs present with zero transitions
    by_id = {r[0]: r for r in base}
    for d in (1, 2, 3):
        assert by_id[d][1] == 0 and by_id[d][3] is None
    model2 = bigram_lm_counts(docs.repartition(7, "text"))
    again = {
        tuple(r)
        for r in lm_perplexity(
            docs.repartition(5, "doc_id"), model2
        ).collect()
    }
    assert base == again


def test_nb_classifies_planted_classes(spark):
    """A cleanly separable planted corpus: ham words vs spam words.
    Held-out docs composed of class vocabulary must classify correctly,
    and log_odds sign must equal the predicted label."""
    docs = spark.createDataFrame(
        [(i, t, y) for i, t, y in TRAIN], ["doc_id", "text", "y"]
    )
    model = nb_train(docs, "y")
    test = spark.createDataFrame(
        [
            (100, "the cat and the dog"),
            (101, "cheap pills online now"),
        ],
        ["doc_id", "text"],
    )
    got = {r["doc_id"]: r for r in nb_score(test, model).collect()}
    assert got[100]["predicted"] == 0 and got[100]["log_odds"] < 0
    assert got[101]["predicted"] == 1 and got[101]["log_odds"] > 0
    assert got[100]["n_oov"] == 0


def test_nb_matches_pure_python_oracle(spark):
    docs = spark.createDataFrame(
        [(i, t, y) for i, t, y in TRAIN], ["doc_id", "text", "y"]
    )
    model = nb_train(docs, "y", alpha=1.0)
    got = {
        r["doc_id"]: (r["n_words"], r["n_oov"], r["log_odds"], r["predicted"])
        for r in nb_score(docs, model).collect()
    }

    # from-scratch NB with the same micro-nat contract
    cw: dict = {}
    t1 = t0 = 0
    for _, t, y in TRAIN:
        for w in t.split():
            c = cw.setdefault(w, [0, 0])
            c[y] += 1
            if y:
                t1 += 1
            else:
                t0 += 1
    v = len(cw) + 1
    n1 = sum(1 for r in TRAIN if r[2])
    n0 = len(TRAIN) - n1
    prior = int(round(math.log(n1 / n0) * NAT_SCALE))
    for i, t, _ in TRAIN:
        nats = prior
        for w in t.split():
            c0, c1 = cw[w]
            w1 = int(round(math.log((c1 + 1.0) / (t1 + v)) * NAT_SCALE))
            w0 = int(round(math.log((c0 + 1.0) / (t0 + v)) * NAT_SCALE))
            nats += w1 - w0
        want = (
            len(t.split()),
            0,
            round(nats / NAT_SCALE, 6),
            int(nats > 0),
        )
        assert got[i] == want, (i, got[i], want)


def test_nb_oov_and_empty_docs(spark):
    docs = spark.createDataFrame(
        [(i, t, y) for i, t, y in TRAIN], ["doc_id", "text", "y"]
    )
    model = nb_train(docs, "y")
    test = spark.createDataFrame(
        [(200, "zzz yyy xxx"), (201, "")], ["doc_id", "text"]
    )
    got = {r["doc_id"]: r for r in nb_score(test, model).collect()}
    # fully-OOV doc: every word ignored, decision falls back to the prior
    assert got[200]["n_oov"] == 3
    prior_lo = round(model["prior_nats"] / NAT_SCALE, 6)
    assert got[200]["log_odds"] == prior_lo
    # empty doc: zero words, same prior fallback
    assert got[201]["n_words"] == 0 and got[201]["log_odds"] == prior_lo


def test_nb_train_rejects_single_class(spark):
    docs = spark.createDataFrame(
        [(0, "a b", 1), (1, "c d", 1)], ["doc_id", "text", "y"]
    )
    with pytest.raises(ValueError, match="each class"):
        nb_train(docs, "y")


def test_quality_score_oracle_survives_blank_docs(spark, tmp_path):
    """Regression for a latent oracle-twin divergence: DuckDB zip-pads
    dual unnests to the longer side, so a blank/whitespace-only doc in
    the LM TRAIN slice emitted a spurious (NULL, NULL) pair row and
    inflated the twin's vocabulary by one relative to the engine. The
    driver fixtures happen to contain no blank docs, so the gate never
    fired — this test runs the REAL registry query and the REAL oracle
    SQL on a corpus that does."""
    import duckdb as _duckdb
    import pandas as pd

    import __spark_entry__ as entry_mod
    from tools.compare_oracle import frame_hash

    rows = [
        (0, "the quick brown fox jumps over the lazy dog", "en", "src1", 43),
        (1, "", "en", "src1", 0),                       # blank, non-src0: TRAIN side
        (2, "   ", "en", "src2", 3),                    # whitespace-only, TRAIN side
        (3, "a holdout style page about mountains", "en", "src0", 36),
        (4, "another ordinary document with plain words", "en", "src2", 42),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    sf_dir = str(tmp_path / "blankcorpus")
    docs.coalesce(1).write.parquet(f"{sf_dir}/documents.parquet")

    sdf = entry_mod.queries()["quality_score"](spark, sf_dir).toPandas()

    con = _duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet/*.parquet'"
    )
    ddf = con.execute(entry_mod.oracle_sql()["quality_score"]).df()
    assert len(sdf) == len(ddf) == 5
    assert sorted(sdf.columns) == sorted(ddf.columns)
    assert frame_hash(sdf) == frame_hash(ddf)


def test_map_twins_match_batch_on_unicode_whitespace(spark):
    """Java-regex \\s is ASCII-only; Python str.split() splits on NBSP /
    U+2028 / FS too. The map twins must tokenize exactly like the batch
    operators or stream==batch parity silently breaks on crawl text —
    regression for the live finding (_py_tokens)."""
    from mapping_timeseries_spark.operators.textmodels import (
        lm_score_map,
        nb_score,
        nb_score_map,
    )

    docs = spark.createDataFrame(
        [
            (0, "foo\u00a0bar baz"),          # NBSP glues a token pair
            (1, "alpha\u2028beta gamma"),      # line separator
            (2, "plain ascii words here"),
            (4, "solitary"),  # 1 token: zero transitions (LM short-doc)
            (5, ""),          # 0 tokens
            (3, "mixed ws\ttabs and\nnewlines"),
        ],
        ["doc_id", "text"],
    )
    model = nb_train(
        docs.withColumn("y", (F.col("doc_id") % 2).cast("int")), "y"
    )
    cols = ["doc_id", "n_words", "n_oov", "log_odds", "predicted"]
    ref = sorted(
        tuple(r[c] for c in cols) for r in nb_score(docs, model).collect()
    )
    twin = sorted(
        tuple(r[c] for c in cols)
        for r in nb_score_map(docs, model).collect()
    )
    assert twin == ref
    # NBSP doc: ONE glued token, not two
    by_id = {r[0]: r for r in twin}
    assert by_id[0][1] == 2  # ["foo\xa0bar", "baz"]

    lm = bigram_lm_counts(docs)
    lcols = ["doc_id", "n_trans", "oov_trans", "avg_nll", "ppl"]
    lref = sorted(
        tuple(r[c] for c in lcols)
        for r in lm_perplexity(docs, lm).collect()
    )
    ltwin = sorted(
        tuple(r[c] for c in lcols)
        for r in lm_score_map(docs, lm).collect()
    )
    assert ltwin == lref


def test_map_twin_model_collect_is_bounded(spark):
    """The map twins' driver collect of the broadcast model is gated by
    max_model_rows: the default raises on oversized tables instead of
    silently collecting (the 100 TB bigram table would kill the
    driver); on_overflow='prune' keeps a deterministic top-K whose tail
    scores through the existing backoff; a cap that covers the whole
    table is a no-op (pruned == full, bitwise)."""
    from mapping_timeseries_spark.operators.textmodels import (
        lm_score_map,
        nb_score_map,
    )

    docs = spark.createDataFrame(
        [(i, t) for i, (_, t, _) in enumerate(TRAIN)], ["doc_id", "text"]
    )
    lm = bigram_lm_counts(docs)
    n_bi = lm["bi"].count()
    assert n_bi > 4

    cols = ["doc_id", "n_trans", "oov_trans", "avg_nll", "ppl"]
    full = sorted(
        tuple(r[c] for c in cols)
        for r in lm_score_map(docs, lm).collect()
    )
    # covering cap == full model, bitwise
    capped = sorted(
        tuple(r[c] for c in cols)
        for r in lm_score_map(docs, lm, max_model_rows=n_bi).collect()
    )
    assert capped == full
    # undersized cap: default raises with guidance, never collects
    with pytest.raises(ValueError, match="max_model_rows"):
        lm_score_map(docs, lm, max_model_rows=3).collect()
    # pruned: still scores every doc, pruned bigrams surface as backoff
    # transitions (oov_trans can only grow, n_trans is structural)
    pruned = sorted(
        tuple(r[c] for c in cols)
        for r in lm_score_map(
            docs, lm, max_model_rows=3, on_overflow="prune"
        ).collect()
    )
    assert [p[0:2] for p in pruned] == [f[0:2] for f in full]
    assert all(p[2] >= f[2] for p, f in zip(pruned, full))
    assert sum(p[2] for p in pruned) > sum(f[2] for f in full)
    with pytest.raises(ValueError, match="on_overflow"):
        lm_score_map(docs, lm, on_overflow="bogus").collect()

    model = nb_train(
        docs.withColumn("y", (F.col("doc_id") > 2).cast("int")), "y"
    )
    n_w = model["weights"].count()
    ncols = ["doc_id", "n_words", "n_oov", "log_odds", "predicted"]
    nfull = sorted(
        tuple(r[c] for c in ncols)
        for r in nb_score_map(docs, model).collect()
    )
    assert (
        sorted(
            tuple(r[c] for c in ncols)
            for r in nb_score_map(
                docs, model, max_model_rows=n_w
            ).collect()
        )
        == nfull
    )
    with pytest.raises(ValueError, match="max_model_rows"):
        nb_score_map(docs, model, max_model_rows=2).collect()
    npruned = sorted(
        tuple(r[c] for c in ncols)
        for r in nb_score_map(
            docs, model, max_model_rows=2, on_overflow="prune"
        ).collect()
    )
    assert sum(p[2] for p in npruned) > sum(f[2] for f in nfull)


def test_ppl_buckets_rank_exact_integer_cuts(spark):
    """ADVICE r7: rank-mode cuts must be EXACT integer arithmetic —
    shares are snapped to rationals (limit_denominator 1e6) and the cut
    is ``n * num div den``, so user-supplied shares like 0.1 (whose
    double products carry no round-to-even tie guarantee) give the same
    split any exact-integer SQL twin computes. Pinned against pure
    Python Fraction arithmetic across share shapes and corpus sizes,
    including n values where floor(n * float_share) is one off the
    rational cut under naive float evaluation."""
    from fractions import Fraction

    from pyspark.sql import functions as F

    from mapping_timeseries_spark.operators.textmodels import ppl_buckets

    for n_all, (h, m) in [
        (10, (0.1, 0.2)),
        (29, (0.1, 0.2)),
        (30, (1 / 3.0, 1 / 3.0)),
        (49, (0.7, 0.1)),
        (7, (0.5, 0.25)),
    ]:
        scored = spark.createDataFrame(
            [(i, float(i) / 10.0) for i in range(n_all)],
            "doc_id long, avg_nll double",
        )
        got = {
            r["ppl_bucket"]: r["n"]
            for r in ppl_buckets(scored, shares=(h, m), mode="rank")
            .groupBy("ppl_bucket")
            .agg(F.count("*").alias("n"))
            .collect()
        }
        fh = Fraction(h).limit_denominator(10**6)
        fhm = (Fraction(h) + Fraction(m)).limit_denominator(10**6)
        cut1 = n_all * fh.numerator // fh.denominator
        cut2 = n_all * fhm.numerator // fhm.denominator
        assert got.get("head", 0) == cut1, (n_all, h, m, got)
        assert got.get("head", 0) + got.get("middle", 0) == cut2, (
            n_all, h, m, got,
        )


def test_ppl_buckets_rank_and_sketch(spark):
    """CCNet head/middle/tail split (Wenzek et al. 2020): exact-rank
    shares hit the requested cuts to the row, NULL-scored docs always
    land in the tail, and the sketch-mode (histogram-threshold) split
    agrees with the exact split on share sizes within the sketch's
    bucket resolution and on the overwhelming majority of docs."""
    from pyspark.sql import functions as F

    from mapping_timeseries_spark.operators.textmodels import (
        bigram_lm_counts,
        lm_perplexity,
        ppl_buckets,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    docs = docs.unionByName(
        spark.createDataFrame(
            [(9001, "solo", "en", "srcx", 4), (9002, None, "en", "srcx", 0)],
            "doc_id long, text string, lang string, source string, n_chars long",
        )
    )
    model = bigram_lm_counts(docs.where(F.col("source") != "src0"))
    scored = lm_perplexity(docs, model).cache()
    n_scored = scored.where(F.col("avg_nll").isNotNull()).count()
    n_all = scored.count()

    rank = ppl_buckets(scored, mode="rank")
    shares = {
        r["ppl_bucket"]: r["n"]
        for r in rank.groupBy("ppl_bucket").agg(F.count("*").alias("n")).collect()
    }
    # exact cuts: floor(n/3) head, floor(2n/3)-floor(n/3) middle
    assert shares["head"] == n_all // 3
    assert shares["head"] + shares["middle"] == (2 * n_all) // 3
    # NULL-scored docs are in the tail
    nulls = {
        r["ppl_bucket"]
        for r in rank.where(F.col("avg_nll").isNull()).collect()
    }
    assert nulls <= {"tail"} and len(nulls) == 1
    # deterministic under repartitioning
    again = {
        r["doc_id"]: r["ppl_bucket"]
        for r in ppl_buckets(scored.repartition(7), mode="rank").collect()
    }
    assert again == {r["doc_id"]: r["ppl_bucket"] for r in rank.collect()}

    sk = ppl_buckets(scored, mode="sketch")
    sk_shares = {
        r["ppl_bucket"]: r["n"]
        for r in sk.groupBy("ppl_bucket").agg(F.count("*").alias("n")).collect()
    }
    # sketch shares differ from exact thirds by (a) histogram bucket
    # resolution (~0.2% here) and (b) TIE CLUMPS: the 31-word synthetic
    # corpus produces many identical avg_nll values, the exact-rank cut
    # splits a tie arbitrarily by doc_id while the sketch keeps ties
    # together (arguably the more principled split). Bound: within 12%
    # of the corpus per bucket.
    for b in ("head", "middle", "tail"):
        assert abs(sk_shares.get(b, 0) - shares[b]) <= max(5, n_all // 8), (
            b, sk_shares, shares,
        )
    # per-doc agreement away from the tie clumps: >= 85% identical
    both = rank.select("doc_id", F.col("ppl_bucket").alias("b1")).join(
        sk.select("doc_id", F.col("ppl_bucket").alias("b2")), "doc_id"
    )
    agree = both.where(F.col("b1") == F.col("b2")).count()
    assert agree >= 0.85 * n_all

    import pytest as _pytest

    with _pytest.raises(ValueError, match="mode"):
        ppl_buckets(scored, mode="bogus")
    with _pytest.raises(ValueError, match="shares"):
        ppl_buckets(scored, shares=(0.7, 0.7))
    scored.unpersist()
