"""Unigram-LM tokenizer training and encoding (SURVEY §2.11 extension —
the second major subword family beside BPE in ``tokenizer.py``).

Algorithm: the unigram language model of Kudo (ACL 2018, "Subword
Regularization") as productionized in SentencePiece: seed a large
candidate piece vocabulary, fit piece probabilities by EM over the
segmentation lattice of each word, and iteratively prune the vocabulary
down to the target size. Encoding is Viterbi best segmentation under
the trained piece log-probabilities.

Scale shape (the same contract as BPE training here):

- ONE corpus-scale pass — the distinct-word histogram
  (``bpe_word_histogram``). Everything after is VOCABULARY-sized:
  Heaps' law bounds distinct words at ~10^6-10^7 even for a web-scale
  corpus, i.e. MBs of state for a 100 TB input.
- ``mode="histogram"`` (default): EM runs driver-side over the
  collected histogram — the documented driver-side exception class
  shared with BPE histogram mode and the IVF centroid collect
  (vocabulary-sized data, thousands of tight sequential iterations).
- ``mode="distributed"``: each EM iteration is one Spark job — the
  per-word forward-backward runs in Arrow-batched ``mapInPandas`` over
  the histogram with the piece table broadcast, and expected counts
  reduce through a map-side-combining groupBy. For the case the
  histogram genuinely cannot be collected. Float expected counts sum
  in partition order, so distributed mode tracks histogram mode to
  ~1e-9 relative (pytest-pinned), not bitwise.

Deviations from Kudo 2018, documented rather than hidden:

- Pruning drops the lowest-expected-count pieces (never single
  characters) instead of the exact leave-one-out loss ranking. The
  loss ranking needs a second forward pass per candidate per round;
  expected-count pruning is the standard cheap surrogate and keeps
  every guarantee the tests pin (coverage, monotone likelihood,
  Viterbi optimality).
- No subword regularization sampling at encode time (that is a
  training-time augmentation knob, not a data-pipeline need); encoding
  is deterministic Viterbi with the lexicographically-smallest-piece
  tie-break so results are layout-independent.

Characters absent from the vocabulary at encode time fall back to
single-character pieces at ``UNK_LOGP`` (SentencePiece's character
fallback), so encoding never fails and round-trip concat(pieces) ==
word always holds.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .tokenizer import bpe_word_histogram
from ..sources.readers import ensure_parallel

__all__ = [
    "unigram_seed_vocab",
    "train_unigram",
    "encode_unigram",
    "UNK_LOGP",
]

#: Log-probability assigned to single-character fallback pieces that are
#: not in the trained vocabulary (far below any trained piece, so the
#: fallback never outcompetes a real segmentation).
UNK_LOGP = -100.0

_VOCAB_SCHEMA = T.StructType(
    [
        T.StructField("piece", T.StringType(), False),
        T.StructField("logp", T.DoubleType(), False),
    ]
)


def unigram_seed_vocab(
    hist: DataFrame,
    seed_size: int = 2000,
    max_piece_len: int = 8,
) -> DataFrame:
    """Candidate pieces from the word histogram: every substring of
    length <= ``max_piece_len``, scored by frequency-weighted occurrence
    count; keep the top ``seed_size`` plus ALL single characters (full
    coverage — every word must have at least the char-by-char
    segmentation). Expression-only: the double explode runs over the
    DISTINCT-word table, ~len*max_piece_len rows per vocabulary entry,
    never over the corpus. Returns (piece, count) with a deterministic
    (count desc, piece asc) selection order."""
    w = hist.select("word", "freq", F.length("word").alias("n"))
    subs = (
        w.select(
            "word",
            "freq",
            "n",
            F.explode(F.sequence(F.lit(1), F.col("n"))).alias("start"),
        )
        .select(
            "word",
            "freq",
            F.explode(
                F.sequence(
                    F.lit(1),
                    F.least(
                        F.lit(max_piece_len), F.col("n") - F.col("start") + 1
                    ),
                )
            ).alias("plen"),
            "start",
        )
        .select(
            F.expr("substr(word, start, plen)").alias("piece"),
            "freq",
        )
        .groupBy("piece")
        .agg(F.sum("freq").cast("bigint").alias("count"))
    )
    top = subs.orderBy(F.col("count").desc(), F.col("piece").asc()).limit(
        seed_size
    )
    chars = subs.where(F.length("piece") == 1)
    return (
        top.unionByName(chars)
        .groupBy("piece")
        .agg(F.max("count").alias("count"))
    )


def _forward_backward(
    word: str, logp: dict, max_len: int
) -> tuple[dict, float]:
    """Expected piece counts and log-likelihood of one word under the
    current piece distribution (sum over all segmentations). Pure
    function of (word, logp) — shared verbatim by the driver-side EM
    and the distributed mapInPandas EM so the two modes compute the
    same quantity."""
    n = len(word)
    neg = float("-inf")
    alpha = [neg] * (n + 1)
    alpha[0] = 0.0
    for i in range(1, n + 1):
        acc = neg
        for ln in range(1, min(max_len, i) + 1):
            lp = logp.get(word[i - ln : i])
            if lp is not None and alpha[i - ln] != neg:
                x = alpha[i - ln] + lp
                acc = x if acc == neg else (
                    max(acc, x) + math.log1p(math.exp(-abs(acc - x)))
                )
        alpha[i] = acc
    ll = alpha[n]
    if ll == neg:
        return {}, neg
    beta = [neg] * (n + 1)
    beta[n] = 0.0
    for i in range(n - 1, -1, -1):
        acc = neg
        for ln in range(1, min(max_len, n - i) + 1):
            lp = logp.get(word[i : i + ln])
            if lp is not None and beta[i + ln] != neg:
                x = beta[i + ln] + lp
                acc = x if acc == neg else (
                    max(acc, x) + math.log1p(math.exp(-abs(acc - x)))
                )
        beta[i] = acc
    exp_counts: dict = {}
    for i in range(n):
        if alpha[i] == neg:
            continue
        for ln in range(1, min(max_len, n - i) + 1):
            pc = word[i : i + ln]
            lp = logp.get(pc)
            if lp is not None and beta[i + ln] != neg:
                e = math.exp(alpha[i] + lp + beta[i + ln] - ll)
                exp_counts[pc] = exp_counts.get(pc, 0.0) + e
    return exp_counts, ll


def _em_round_local(
    hist: list, logp: dict, max_len: int
) -> tuple[dict, float]:
    """One EM iteration over a (word, freq) list: returns (new expected
    counts, total corpus log-likelihood). Iteration order is sorted, so
    driver-mode float sums are deterministic."""
    counts: dict = {}
    total_ll = 0.0
    for word, freq in hist:
        exp_counts, ll = _forward_backward(word, logp, max_len)
        if ll == float("-inf"):
            continue
        total_ll += freq * ll
        for pc, e in exp_counts.items():
            counts[pc] = counts.get(pc, 0.0) + freq * e
    return counts, total_ll


def _normalize(counts: dict) -> dict:
    total = sum(counts[p] for p in sorted(counts))
    return {p: math.log(c / total) for p, c in counts.items() if c > 0.0}


#: Floor applied to single-character expected counts during training.
#: EM on a small corpus can drive a character's posterior mass to
#: exactly 0.0 once longer pieces absorb all its occurrences; without a
#: floor the ``c > 0.0`` filter in ``_normalize`` would silently drop
#: the character and break the coverage invariant (SentencePiece keeps
#: "required chars" alive the same way). 1e-6 of one occurrence is far
#: below any live piece, so the floor never changes a segmentation.
_CHAR_FLOOR = 1e-6


def _normalize_keep_chars(counts: dict, chars: set) -> dict:
    floored = dict(counts)
    for ch in chars:
        if floored.get(ch, 0.0) < _CHAR_FLOOR:
            floored[ch] = _CHAR_FLOOR
    return _normalize(floored)


def _em_round_spark(
    hist_df: DataFrame, logp: dict, max_len: int
) -> tuple[dict, float]:
    """One EM iteration as a Spark job: forward-backward per distinct
    word in Arrow-batched mapInPandas (piece table broadcast), expected
    counts reduced by a map-side-combining groupBy, then a vocabulary-
    sized collect to update the model — the same loop-control exception
    class as distributed BPE's 1-row argmax."""
    import pandas as pd

    spark = hist_df.sparkSession
    bc = spark.sparkContext.broadcast((logp, max_len))
    schema = T.StructType(
        [
            T.StructField("piece", T.StringType(), False),
            T.StructField("c", T.DoubleType(), False),
            T.StructField("ll", T.DoubleType(), False),
        ]
    )

    def run(batches):
        lp, ml = bc.value
        for pdf in batches:
            acc: dict = {}
            ll_sum = 0.0
            for word, freq in zip(pdf["word"], pdf["freq"]):
                exp_counts, ll = _forward_backward(word, lp, ml)
                if ll == float("-inf"):
                    continue
                ll_sum += freq * ll
                for pc, e in exp_counts.items():
                    acc[pc] = acc.get(pc, 0.0) + freq * e
            out = pd.DataFrame(
                {
                    "piece": list(acc.keys()) + [" ll"],
                    "c": list(acc.values()) + [0.0],
                    "ll": [0.0] * len(acc) + [ll_sum],
                }
            )
            yield out

    agg = (
        ensure_parallel(hist_df)
        .select("word", "freq")
        .mapInPandas(run, schema)
        .groupBy("piece")
        .agg(F.sum("c").alias("c"), F.sum("ll").alias("ll"))
        .collect()
    )
    counts = {}
    total_ll = 0.0
    for r in agg:
        if r["piece"] == " ll":
            total_ll += r["ll"]
        else:
            counts[r["piece"]] = r["c"]
    return counts, total_ll


def train_unigram(
    docs: DataFrame,
    vocab_size: int,
    text_col: str = "text",
    seed_size: int = 2000,
    max_piece_len: int = 8,
    em_iters_per_round: int = 2,
    shrink: float = 0.75,
    mode: str = "histogram",
) -> DataFrame:
    """Train a unigram-LM piece vocabulary; returns (piece, logp) as a
    DataFrame of at most ``vocab_size`` rows (fewer when the seed is
    smaller or when EM drives multi-char pieces to zero expected count
    — a zero-mass piece is useless and is dropped rather than padded;
    single characters are always kept, see ``_CHAR_FLOOR``).

    Loop: init probabilities from seed counts; repeat { EM
    ``em_iters_per_round`` times; drop the lowest-expected-count pieces
    down to ``shrink`` of the current size, never dropping single
    characters } until at ``vocab_size``; one final EM round.
    See the module docstring for modes and deviations."""
    if mode not in ("histogram", "distributed"):
        raise ValueError("mode must be 'histogram' or 'distributed'")
    spark = docs.sparkSession
    hist_df = bpe_word_histogram(docs, text_col)
    seed = unigram_seed_vocab(hist_df, seed_size, max_piece_len)
    seed_counts = {r["piece"]: float(r["count"]) for r in seed.collect()}
    if not seed_counts:
        return spark.createDataFrame([], _VOCAB_SCHEMA)
    logp = _normalize(seed_counts)
    chars = {p for p in logp if len(p) == 1}

    hist_local = None
    if mode == "histogram":
        hist_local = sorted(
            (r["word"], r["freq"]) for r in hist_df.collect()
        )

    def em(cur_logp: dict) -> tuple[dict, float]:
        if mode == "histogram":
            return _em_round_local(hist_local, cur_logp, max_piece_len)
        return _em_round_spark(hist_df, cur_logp, max_piece_len)

    target = max(vocab_size, len(chars))
    while True:
        counts = None
        for _ in range(em_iters_per_round):
            counts, _ll = em(logp)
            logp = _normalize_keep_chars(counts, chars)
        if len(logp) <= target:
            break
        keep_n = max(target, int(len(logp) * shrink))
        # prune by expected count, deterministic tie-break on piece;
        # single characters are exempt (coverage invariant)
        multis = sorted(
            ((p, c) for p, c in counts.items() if len(p) > 1),
            key=lambda kv: (-kv[1], kv[0]),
        )
        n_multi = max(0, keep_n - len(chars))
        kept = {p for p, _ in multis[:n_multi]} | chars
        logp = _normalize_keep_chars(
            {p: counts.get(p, 0.0) for p in kept}, chars
        )
    rows = sorted(logp.items())
    return spark.createDataFrame(rows, _VOCAB_SCHEMA)


def encode_unigram(
    docs: DataFrame,
    vocab: DataFrame,
    text_col: str = "text",
    max_piece_len: int = 8,
) -> DataFrame:
    """Tokenize documents with a trained unigram vocabulary: adds
    ``unigram_tokens: array<string>`` — per-word Viterbi best
    segmentation under the piece log-probabilities, single-character
    ``UNK_LOGP`` fallback for uncovered characters, tie-break toward
    the segmentation with lexicographically smaller piece sequence so
    output is layout-independent.

    Arrow-batched ``mapInPandas`` with the vocabulary broadcast and a
    per-batch distinct-word cache (the same shape as ``encode_bpe``);
    the corpus never shuffles."""
    import pandas as pd

    logp = {r["piece"]: r["logp"] for r in vocab.collect()}
    bc = docs.sparkSession.sparkContext.broadcast((logp, max_piece_len))

    out_schema = T.StructType(
        docs.schema.fields
        + [
            T.StructField(
                "unigram_tokens", T.ArrayType(T.StringType()), False
            )
        ]
    )
    in_cols = [f.name for f in docs.schema.fields]

    def viterbi(word: str, lp: dict, ml: int) -> list:
        n = len(word)
        neg = float("-inf")
        best = [neg] * (n + 1)
        back = [None] * (n + 1)
        best[0] = 0.0
        for i in range(1, n + 1):
            for ln in range(1, min(ml, i) + 1):
                pc = word[i - ln : i]
                w = lp.get(pc)
                if w is None and ln == 1:
                    w = UNK_LOGP
                if w is None or best[i - ln] == neg:
                    continue
                score = best[i - ln] + w
                if score > best[i] or (
                    score == best[i] and back[i] is not None
                    and pc < back[i]
                ):
                    best[i] = score
                    back[i] = pc
        pieces = []
        i = n
        while i > 0:
            pc = back[i]
            pieces.append(pc)
            i -= len(pc)
        pieces.reverse()
        return pieces

    def run(batches):
        # NOT str.split(): that splits on all Unicode whitespace (NBSP,
        # U+2028, \x85 ...) while training's histogram uses tokens() =
        # Java regex \s+ (ASCII-only) — a word containing e.g. \xa0
        # would be ONE word at training time and TWO here, diverging
        # from the trained distribution. _py_tokens is the pinned
        # Python twin of that ASCII class.
        from mapping_timeseries_spark.operators.textmodels import _py_tokens

        lp, ml = bc.value
        cache: dict = {}
        for pdf in batches:
            toks = []
            for text in pdf[text_col]:
                doc_tokens: list = []
                for w in _py_tokens(text):
                    enc = cache.get(w)
                    if enc is None:
                        enc = viterbi(w, lp, ml)
                        cache[w] = enc
                    doc_tokens.extend(enc)
                toks.append(doc_tokens)
            out = pdf[in_cols].copy()
            out["unigram_tokens"] = toks
            yield out

    return docs.mapInPandas(run, out_schema)
