"""Tokenizer-training scale stress (VERDICT r6 #4): train BPE and
unigram-LM at 1x (sf0.1) vs 10x (artifacts/scale_stress_10x) and gate
the driver-histogram assumption plus an encode round-trip.

What this pins:

- ``n_distinct_words`` growth — the histogram-mode collect is bounded
  by the corpus's distinct-word count (Heaps' law on real text). The
  stress corpus is ADVERSARIAL here by construction: every replica
  renames every token ("tok" -> "tok·rI"), so distinct words grow a
  full 10x — the worst case Heaps allows. The gate is that training
  still completes with wall growth bounded by the histogram growth
  (no super-linear term beyond the input), i.e. the collect bound
  degrades linearly and predictably, never quadratically.
- encode round-trip at both scales: concatenating each doc's encoded
  pieces (BPE: minus the </w> markers; unigram: pieces verbatim) must
  reproduce the doc's whitespace-normalized token stream exactly, for
  EVERY document — checked distributed (one comparison expression, a
  count of mismatches), no sampling.

Writes artifacts/tokenizer_stress.json. Run alone (box noise caveat in
bench.py applies). Usage: python tools/tokenizer_stress.py [out.json]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from mapping_timeseries_spark.functions.text import tokens  # noqa: E402
from mapping_timeseries_spark.operators.tokenizer import (  # noqa: E402
    bpe_word_histogram,
    encode_bpe,
    train_bpe,
)
from mapping_timeseries_spark.operators.unigram import (  # noqa: E402
    encode_unigram,
    train_unigram,
)
from mapping_timeseries_spark.session import get_spark  # noqa: E402
from mapping_timeseries_spark.sources.readers import read_table  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CORPORA = {
    "1x": "/root/testdata/sf0.1",
    "10x": os.path.join(REPO, "artifacts", "scale_stress_10x"),
}


def _mismatches(encoded, tok_col: str, strip_eow: bool) -> int:
    """Distributed round-trip check: 0 iff every doc's joined pieces
    equal its joined whitespace tokens."""
    pieces = F.col(tok_col)
    if strip_eow:
        pieces = F.transform(
            pieces, lambda t: F.regexp_replace(t, r"</w>$", "")
        )
    return (
        encoded.withColumn("__want", F.array_join(tokens(F.col("text")), ""))
        .withColumn("__got", F.array_join(pieces, ""))
        .where(
            F.coalesce(F.col("__got"), F.lit(""))
            != F.coalesce(F.col("__want"), F.lit(""))
        )
        .count()
    )


def measure(spark, sf_dir: str) -> dict:
    docs = read_table(spark, sf_dir, "documents")
    n_docs = docs.count()
    n_words = bpe_word_histogram(docs).count()

    t0 = time.monotonic()
    merges = train_bpe(docs, num_merges=200, mode="histogram")
    n_merges = merges.count()
    t_bpe = time.monotonic() - t0

    t0 = time.monotonic()
    vocab = train_unigram(
        docs, vocab_size=512, seed_size=2000, max_piece_len=6,
        mode="histogram",
    )
    n_pieces = vocab.count()
    t_uni = time.monotonic() - t0

    t0 = time.monotonic()
    bpe_bad = _mismatches(encode_bpe(docs, merges), "bpe_tokens", True)
    t_enc_bpe = time.monotonic() - t0
    t0 = time.monotonic()
    uni_bad = _mismatches(
        encode_unigram(docs, vocab, max_piece_len=6), "unigram_tokens", False
    )
    t_enc_uni = time.monotonic() - t0
    return {
        "n_docs": n_docs,
        "n_distinct_words": n_words,
        "bpe_train_sec": round(t_bpe, 2),
        "bpe_merges": n_merges,
        "unigram_train_sec": round(t_uni, 2),
        "unigram_pieces": n_pieces,
        "bpe_encode_sec": round(t_enc_bpe, 2),
        "unigram_encode_sec": round(t_enc_uni, 2),
        "bpe_roundtrip_mismatches": bpe_bad,
        "unigram_roundtrip_mismatches": uni_bad,
    }


def main() -> int:
    out_path = (
        sys.argv[1]
        if len(sys.argv) > 1
        else os.path.join(REPO, "artifacts", "tokenizer_stress.json")
    )
    spark = get_spark(
        "tokenizer-stress",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
        extra_conf={"spark.driver.memory": "16g"},
    )
    spark.range(1000).selectExpr("sum(id)").collect()
    res = {}
    for tag, sf_dir in CORPORA.items():
        if not os.path.isdir(sf_dir):
            print(f"skipping {tag}: {sf_dir} missing "
                  "(KEEP_STRESS_DATA=1 tools/scale_stress.py 10)")
            continue
        res[tag] = measure(spark, sf_dir)
        print(tag, json.dumps(res[tag]))
    if "1x" in res and "10x" in res:
        res["growth"] = {
            k: round(res["10x"][k] / max(res["1x"][k], 1e-9), 2)
            for k in (
                "n_docs",
                "n_distinct_words",
                "bpe_train_sec",
                "unigram_train_sec",
                "bpe_encode_sec",
                "unigram_encode_sec",
            )
        }
        print("growth", json.dumps(res["growth"]))
    ok = all(
        r["bpe_roundtrip_mismatches"] == 0
        and r["unigram_roundtrip_mismatches"] == 0
        for r in res.values()
        if isinstance(r, dict) and "bpe_roundtrip_mismatches" in r
    )
    with open(out_path, "w") as f:
        json.dump(res, f, indent=1)
    print(f"wrote {out_path}; roundtrip_ok={ok}")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
