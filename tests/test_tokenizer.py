"""BPE tokenizer training/encoding (operators/tokenizer.py): planted
classic corpus, histogram-vs-distributed mode equality, an independent
naive oracle, encode/train consistency, and layout determinism."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mapping_timeseries_spark.operators.tokenizer import (
    END_OF_WORD,
    bpe_word_histogram,
    encode_bpe,
    train_bpe,
)


def naive_bpe(word_freqs: dict[str, int], num_merges: int, min_count: int = 2):
    """Independent reference: textbook quadratic BPE — full pair
    recount every round, no incremental bookkeeping (deliberately the
    opposite implementation strategy from the package's trainer)."""
    words = {tuple(w) + (END_OF_WORD,): f for w, f in word_freqs.items()}
    merges = []
    for _ in range(num_merges):
        counts: dict[tuple[str, str], int] = {}
        for sym, f in words.items():
            for a, b in zip(sym, sym[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + f
        if not counts:
            break
        (l, r), c = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        if c < min_count:
            break
        merges.append((l, r, c))
        new_words: dict[tuple[str, ...], int] = {}
        for sym, f in words.items():
            out, i = [], 0
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == l and sym[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            t = tuple(out)
            new_words[t] = new_words.get(t, 0) + f
        words = new_words
    return merges


@pytest.fixture(scope="module")
def corpus(spark):
    # the classic Sennrich teaching corpus shape: shared stems with
    # productive suffixes
    rows = []
    doc = 0
    for text, n in [
        ("low low low low low", 3),
        ("lower lower newer newer newer", 2),
        ("newest widest newest", 2),
        ("new new new newer", 2),
    ]:
        for _ in range(n):
            rows.append((doc, text))
            doc += 1
    return spark.createDataFrame(rows, "doc_id long, text string").cache()


def _word_freqs(spark_df):
    return {r["word"]: r["freq"] for r in spark_df.collect()}


def test_histogram_matches_naive_oracle(spark, corpus):
    hist = _word_freqs(bpe_word_histogram(corpus))
    want = naive_bpe(hist, num_merges=12)
    got = [
        (r["left"], r["right"], r["pair_count"])
        for r in train_bpe(corpus, 12).orderBy("rank").collect()
    ]
    assert got == want
    assert len(got) > 3
    # the classic corpus learns the shared stems: 'lo'/'low' and
    # 'ne'/'new' families appear among the early merges
    merged_symbols = {l + r for l, r, _ in got}
    assert "lo" in merged_symbols and "ne" in merged_symbols


def test_distributed_mode_equals_histogram(spark, corpus):
    a = [
        (r["left"], r["right"], r["pair_count"])
        for r in train_bpe(corpus, 10, mode="histogram").orderBy("rank").collect()
    ]
    b = [
        (r["left"], r["right"], r["pair_count"])
        for r in train_bpe(
            corpus, 10, mode="distributed", checkpoint_every=3
        ).orderBy("rank").collect()
    ]
    assert a == b


def test_train_is_layout_independent(spark, corpus):
    a = [
        tuple(r) for r in train_bpe(corpus, 8).orderBy("rank").collect()
    ]
    b = [
        tuple(r)
        for r in train_bpe(corpus.repartition(13), 8).orderBy("rank").collect()
    ]
    assert a == b


def test_encode_applies_ranked_merges(spark, corpus):
    merges = train_bpe(corpus, 12)
    enc = encode_bpe(corpus, merges)
    rows = {r["doc_id"]: r["bpe_tokens"] for r in enc.collect()}
    assert set(rows) == {
        r["doc_id"] for r in corpus.select("doc_id").collect()
    }
    # reconstruction: stripping END_OF_WORD and joining symbols
    # reproduces each document's words exactly
    for r in corpus.collect():
        toks = rows[r["doc_id"]]
        words, cur = [], ""
        for t in toks:
            if t.endswith(END_OF_WORD):
                words.append(cur + t[: -len(END_OF_WORD)])
                cur = ""
            else:
                cur += t
        assert cur == ""
        assert words == r["text"].split()
    # compression: frequent words collapse to one symbol
    low_doc = next(
        r["doc_id"] for r in corpus.collect() if r["text"].startswith("low low")
    )
    assert "low" + END_OF_WORD in rows[low_doc]


def test_encode_with_empty_and_whitespace_docs(spark):
    docs = spark.createDataFrame(
        [(1, "low low"), (2, ""), (3, "   "), (4, None)],
        "doc_id long, text string",
    )
    merges = train_bpe(docs, 4, min_pair_count=1)
    rows = {r["doc_id"]: r["bpe_tokens"] for r in encode_bpe(docs, merges).collect()}
    assert rows[2] == [] and rows[3] == [] and rows[4] == []
    assert rows[1]  # non-empty encoding for the real doc


def test_min_pair_count_stops_early(spark):
    docs = spark.createDataFrame(
        [(1, "ab ab cd")], "doc_id long, text string"
    )
    merges = train_bpe(docs, 50, min_pair_count=2).collect()
    # only pairs occurring >= 2 times merge: the 'ab' family (freq 2);
    # 'cd' (freq 1) never does, and the loop stops instead of padding
    assert 0 < len(merges) <= 3
    assert all(r["pair_count"] >= 2 for r in merges)
