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


def test_encode_pretokenizes_like_training_on_unicode_whitespace(spark):
    """ADVICE r6: encoding must pre-tokenize on the SAME ASCII
    whitespace class training uses (tokens() = Java \\s+), not Python
    str.split()'s all-Unicode class. A word containing NBSP is ONE word
    to training; the encoders must see it as one word too — under
    str.split() the NBSP doc would encode identically to the
    space-separated doc, which is exactly the divergence we pin
    against."""
    from mapping_timeseries_spark.operators.tokenizer import bpe_word_histogram
    from mapping_timeseries_spark.operators.unigram import (
        encode_unigram,
        train_unigram,
    )

    nbsp_word = "low\xa0low"
    docs = spark.createDataFrame(
        [(1, f"{nbsp_word} lower"), (2, "low low lower")],
        "doc_id long, text string",
    )
    # training sees the NBSP word as one token
    hist = {r["word"]: r["freq"] for r in bpe_word_histogram(docs).collect()}
    assert nbsp_word in hist and hist[nbsp_word] == 1

    merges = train_bpe(docs, 6, min_pair_count=1)
    enc = {
        r["doc_id"]: r["bpe_tokens"] for r in encode_bpe(docs, merges).collect()
    }
    # doc 1's first word keeps its NBSP: the byte content of the
    # encoding differs from doc 2's plain-space twin
    assert "".join(enc[1]).replace("</w>", "") == nbsp_word + "lower"
    assert "".join(enc[2]).replace("</w>", "") == "lowlowlower"

    vocab = train_unigram(docs, vocab_size=40, seed_size=100, max_piece_len=4)
    uenc = {
        r["doc_id"]: r["unigram_tokens"]
        for r in encode_unigram(docs, vocab).collect()
    }
    assert "".join(uenc[1]) == nbsp_word + "lower"
    assert "".join(uenc[2]) == "lowlowlower"


def test_min_pair_count_stops_early(spark):
    docs = spark.createDataFrame(
        [(1, "ab ab cd")], "doc_id long, text string"
    )
    merges = train_bpe(docs, 50, min_pair_count=2).collect()
    # only pairs occurring >= 2 times merge: the 'ab' family (freq 2);
    # 'cd' (freq 1) never does, and the loop stops instead of padding
    assert 0 < len(merges) <= 3
    assert all(r["pair_count"] >= 2 for r in merges)


# ---------------------------------------------------------------------------
# Unigram-LM tokenizer (Kudo 2018)
# ---------------------------------------------------------------------------

from mapping_timeseries_spark.operators.unigram import (  # noqa: E402
    UNK_LOGP,
    _em_round_local,
    _normalize,
    encode_unigram,
    train_unigram,
    unigram_seed_vocab,
)

SF = "/root/testdata/sf0.001"


def test_unigram_seed_vocab_counts(spark):
    # "abab" freq 2, "ab" freq 1 -> substring "ab" occurs 2x in abab
    # (weighted 2*2=4) + 1x in ab = 5; "a" likewise 5; "abab" = 2.
    docs = spark.createDataFrame(
        [(1, "abab ab"), (2, "abab")], "doc_id long, text string"
    )
    seed = unigram_seed_vocab(
        bpe_word_histogram(docs), seed_size=100, max_piece_len=4
    )
    counts = {r["piece"]: r["count"] for r in seed.collect()}
    assert counts["a"] == 5 and counts["b"] == 5
    assert counts["ab"] == 5
    assert counts["abab"] == 2
    assert counts["ba"] == 2 and counts["bab"] == 2 and counts["aba"] == 2


def test_unigram_em_monotone_likelihood(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(80)
    hist_df = bpe_word_histogram(docs)
    hist = sorted((r["word"], r["freq"]) for r in hist_df.collect())
    seed = unigram_seed_vocab(hist_df, seed_size=500, max_piece_len=6)
    logp = _normalize({r["piece"]: float(r["count"]) for r in seed.collect()})
    lls = []
    for _ in range(4):
        counts, ll = _em_round_local(hist, logp, 6)
        lls.append(ll)
        logp = _normalize(counts)
    assert all(b >= a - 1e-9 for a, b in zip(lls, lls[1:])), lls


def test_unigram_modes_agree_and_prune_respects_chars(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(60)
    kw = dict(vocab_size=60, seed_size=400, max_piece_len=5)
    vh = train_unigram(docs, mode="histogram", **kw)
    vd = train_unigram(docs, mode="distributed", **kw)
    ph = {r["piece"]: r["logp"] for r in vh.collect()}
    pdd = {r["piece"]: r["logp"] for r in vd.collect()}
    # same surviving pieces; probabilities equal to float-sum noise
    assert set(ph) == set(pdd)
    for k, v in ph.items():
        assert pdd[k] == pytest.approx(v, abs=1e-6), k
    # pruning ran (seed is larger than target) and kept every single
    # char seen in the corpus (coverage invariant)
    chars = {
        r["word"][i]
        for r in bpe_word_histogram(docs).collect()
        for i in range(len(r["word"]))
    }
    assert chars <= set(ph)
    # at most the target; can be fewer when EM zeroes out multi-char
    # pieces (dropped rather than padded), but pruning clearly ran
    assert len(ph) <= max(60, len(chars))
    assert len(ph) < 200  # seed was ~250 pieces; pruning happened


def test_unigram_viterbi_matches_bruteforce(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(60)
    vocab = train_unigram(
        docs, vocab_size=80, seed_size=300, max_piece_len=5
    )
    logp = {r["piece"]: r["logp"] for r in vocab.collect()}
    enc = encode_unigram(docs, vocab)
    words = [
        r["word"]
        for r in bpe_word_histogram(docs).collect()
        if len(r["word"]) <= 10
    ]

    def brute_best(word):
        n = len(word)
        best = None
        for mask in range(1 << max(0, n - 1)):
            cuts = [0] + [
                i + 1 for i in range(n - 1) if mask >> i & 1
            ] + [n]
            pieces = [word[a:b] for a, b in zip(cuts, cuts[1:])]
            s = 0.0
            ok = True
            for p in pieces:
                lp = logp.get(p)
                if lp is None:
                    if len(p) == 1:
                        lp = UNK_LOGP
                    else:
                        ok = False
                        break
                s += lp
            if ok and (best is None or s > best):
                best = s
        return best

    # encode one doc per word is overkill; check score parity directly
    from mapping_timeseries_spark.operators.unigram import encode_unigram as _  # noqa
    one = spark.createDataFrame(
        [(i, w) for i, w in enumerate(words)], "doc_id long, text string"
    )
    got = {
        r["text"]: r["unigram_tokens"]
        for r in encode_unigram(one, vocab).collect()
    }
    for w in words:
        pieces = got[w]
        assert "".join(pieces) == w
        score = sum(
            logp.get(p, UNK_LOGP if len(p) == 1 else None) for p in pieces
        )
        assert score == pytest.approx(brute_best(w), abs=1e-9), w


def test_unigram_unknown_char_fallback_roundtrip(spark):
    train = spark.createDataFrame(
        [(1, "data data base based")], "doc_id long, text string"
    )
    vocab = train_unigram(train, vocab_size=30, seed_size=50)
    apply_to = spark.createDataFrame(
        [(1, "dataxq zz"), (2, ""), (3, None)], "doc_id long, text string"
    )
    rows = {
        r["doc_id"]: r["unigram_tokens"]
        for r in encode_unigram(apply_to, vocab).collect()
    }
    assert "".join(rows[1]) == "dataxqzz"
    assert rows[2] == [] and rows[3] == []
    # unseen chars came out as single-char fallback pieces
    assert "x" in rows[1] and "q" in rows[1]


def test_unigram_encode_roundtrip_fuzz(spark):
    """Random small corpora over a skewed tiny vocabulary: whatever EM
    converges to, encoding must reconstruct every word exactly
    (concat(pieces) == word) and never emit a piece outside
    vocab ∪ single-char-fallback — including docs with characters the
    training corpus never saw."""
    import random

    rng = random.Random(99)
    vocab_words = ["data", "base", "databank", "redata", "ba", "set"]
    train_rows = [
        (
            i,
            " ".join(
                rng.choice(vocab_words)
                for _ in range(rng.randint(1, 12))
            ),
        )
        for i in range(25)
    ]
    train = spark.createDataFrame(train_rows, "doc_id long, text string")
    vocab = train_unigram(train, vocab_size=25, seed_size=120)
    pieces = {r["piece"] for r in vocab.collect()}

    apply_rows = train_rows[:10] + [
        (100, "dataqz zzbase unrelatedword"),
        (101, ""),
    ]
    docs = spark.createDataFrame(apply_rows, "doc_id long, text string")
    enc = {
        r["doc_id"]: r["unigram_tokens"]
        for r in encode_unigram(docs, vocab).collect()
    }
    for doc_id, text in apply_rows:
        words = text.split()
        toks = enc[doc_id]
        assert "".join(toks) == "".join(words), doc_id
        for p in toks:
            assert p in pieces or len(p) == 1, (doc_id, p)
