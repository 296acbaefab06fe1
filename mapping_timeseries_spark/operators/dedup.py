"""Document deduplication (SURVEY §2.11): exact, n-gram Jaccard, MinHash
LSH, SimHash, and embedding-cosine near-dup.

Scale design
------------
- Exact dedup is a hash groupBy on the content hash — one shuffle keyed by
  sha2(text) (shuffling 32-byte digests, not documents).
- Exact n-gram Jaccard is quadratic in documents sharing a shingle; it is
  the verification/oracle path, run on candidate pairs only at scale.
- MinHash LSH is the scale path: signature -> band buckets -> self-join on
  (band, bucket-hash) -> candidate pairs -> Jaccard verify. The band join
  only pairs documents agreeing on a full band, so the join fan-out is the
  collision count, not n^2.
- SimHash gives a 64-bit fingerprint; near-dup = small Hamming distance.
  The block-join by fingerprint prefix bounds the pair space.
- Embedding near-dup reuses the cosine machinery from similarity.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import (
    hamming64,
    minhash_signature,
    simhash64,
    tokens,
    word_shingles,
)

__all__ = [
    "exact_dedup",
    "content_hash_dedup",
    "ngram_jaccard_pairs",
    "minhash_lsh_pairs",
    "simhash_near_dups",
]


def exact_dedup(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Exact dedup by full text: keep the smallest doc_id per distinct
    text, count the copies. Deterministic keeper -> oracle-checkable."""
    return docs.groupBy(text_col).agg(
        F.min("doc_id").alias("keeper_doc_id"),
        F.count(F.lit(1)).alias("n_copies"),
    ).select("keeper_doc_id", "n_copies")


def content_hash_dedup(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Exact dedup on sha2(text) — at scale the shuffle carries 32-byte
    digests instead of documents. Output: one row per distinct digest."""
    return (
        docs.select(F.sha2(F.col(text_col), 256).alias("content_sha"), "doc_id")
        .groupBy("content_sha")
        .agg(F.min("doc_id").alias("keeper_doc_id"), F.count(F.lit(1)).alias("n_copies"))
    )


def _shingled(docs: DataFrame, text_col: str, n: int) -> DataFrame:
    return docs.select(
        "doc_id", word_shingles(F.col(text_col), n).alias("shingles")
    ).withColumn("n_shingles", F.size("shingles"))


def ngram_jaccard_pairs(
    docs: DataFrame,
    text_col: str = "text",
    n: int = 2,
    threshold: float = 0.5,
) -> DataFrame:
    """Exact word-n-gram Jaccard similarity for all pairs sharing at least
    one shingle; emits pairs with J >= threshold (doc_a < doc_b).

    Inverted-index self-join: explode shingles, join on shingle, count
    common shingles per pair, then J = common / (|A| + |B| - common).
    Exact but pair-quadratic in dense corpora — the LSH variant below is
    the 100 TB path; this is its verifier and the DuckDB oracle twin.
    """
    sh = _shingled(docs, text_col, n)
    inv = sh.select("doc_id", "n_shingles", F.explode("shingles").alias("shingle"))
    a = inv.alias("a")
    b = inv.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.n_shingles").alias("na"),
            F.col("b.n_shingles").alias("nb"),
        )
        .agg(F.count(F.lit(1)).alias("common"))
    )
    jaccard = F.col("common") / (F.col("na") + F.col("nb") - F.col("common"))
    return (
        pairs.withColumn("jaccard", jaccard)
        .where(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def minhash_lsh_pairs(
    docs: DataFrame,
    text_col: str = "text",
    n: int = 2,
    num_hashes: int = 32,
    bands: int = 8,
    threshold: float = 0.5,
) -> DataFrame:
    """MinHash + LSH near-dup candidates, Jaccard-verified.

    signature (num_hashes minima of seeded xxhash64 over shingles)
    -> split into ``bands`` bands of ``num_hashes/bands`` rows
    -> bucket key = hash(band values); docs agreeing on any band meet in a
       bucket -> candidate pair -> verify with exact Jaccard >= threshold.

    Probability a pair with Jaccard J becomes a candidate:
    1 - (1 - J^r)^b with r = rows/band — the standard S-curve; with
    r=4, b=8 the 50% knee sits near J=0.55.

    Output matches :func:`ngram_jaccard_pairs` (its subset, by
    construction); rows-only driver check (xxhash64 has no DuckDB twin),
    recall measured against the exact operator in pytest.
    """
    rows_per_band = num_hashes // bands
    sh = _shingled(docs, text_col, n)
    signed = sh.withColumn("sig", minhash_signature(F.col("shingles"), num_hashes))
    banded = signed.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(band).alias("band"),
                        F.hash(
                            *[
                                F.col("sig")[band * rows_per_band + r]
                                for r in range(rows_per_band)
                            ]
                        ).alias("bucket"),
                    )
                    for band in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("doc_id", "bb.band", "bb.bucket")
    cand = (
        banded.alias("x")
        .join(
            banded.alias("y"),
            (F.col("x.band") == F.col("y.band"))
            & (F.col("x.bucket") == F.col("y.bucket"))
            & (F.col("x.doc_id") < F.col("y.doc_id")),
        )
        .select(
            F.col("x.doc_id").alias("doc_a"), F.col("y.doc_id").alias("doc_b")
        )
        .distinct()
    )
    # verify candidates with exact Jaccard (shingle sets re-joined by id)
    sets_a = sh.select(
        F.col("doc_id").alias("doc_a"),
        F.col("shingles").alias("sh_a"),
        F.col("n_shingles").alias("na"),
    )
    sets_b = sh.select(
        F.col("doc_id").alias("doc_b"),
        F.col("shingles").alias("sh_b"),
        F.col("n_shingles").alias("nb"),
    )
    verified = (
        cand.join(sets_a, "doc_a")
        .join(sets_b, "doc_b")
        .withColumn(
            "common", F.size(F.array_intersect("sh_a", "sh_b"))
        )
        .withColumn(
            "jaccard",
            F.col("common") / (F.col("na") + F.col("nb") - F.col("common")),
        )
        .where(F.col("jaccard") >= threshold)
    )
    return verified.select("doc_a", "doc_b", "jaccard")


def simhash_near_dups(
    docs: DataFrame,
    text_col: str = "text",
    max_hamming: int = 8,
    prefix_bits: int = 12,
) -> DataFrame:
    """SimHash near-dup pairs: 64-bit token-majority fingerprints, paired
    when Hamming distance <= max_hamming.

    Blocking: candidates must share the top ``prefix_bits`` of the
    fingerprint (single-probe multi-index blocking) — bounds the self-join
    to documents in the same prefix block instead of n^2. Documents whose
    distance is small but whose prefix differs are missed (standard
    SimHash-blocking recall trade; multiple rotated tables fix it at
    scale).
    """
    fp = docs.select(
        "doc_id", simhash64(tokens(F.col(text_col))).alias("fingerprint")
    ).withColumn("block", F.shiftrightunsigned("fingerprint", 64 - prefix_bits))
    a = fp.alias("a")
    b = fp.alias("b")
    return (
        a.join(
            b,
            (F.col("a.block") == F.col("b.block"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            hamming64(F.col("a.fingerprint"), F.col("b.fingerprint")).alias(
                "hamming"
            ),
        )
        .where(F.col("hamming") <= max_hamming)
    )
