"""Text expression helpers for the LLM-data-pipeline operators
(SURVEY §2.11): tokenization, shingling, hashing, quality heuristics.

Everything here is a JVM-side Column expression (no Python UDFs) — token
counting, shingles, rolling hashes and ratio features all stay inside
whole-stage codegen, which is what makes the document operators viable at
100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Small function-word list for stopword-ratio features.
STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it", "for", "on")

#: Modulus for the polynomial rolling hash (fits acc*31+c in int64).
FP_MOD = 1_000_000_007


def tokens(text: Column | str) -> Column:
    """Whitespace tokenization of trimmed text.

    Empty tokens are filtered: ``split(trim(''), '\\s+')`` returns
    ``['']`` in both Spark and DuckDB, which would count an empty or
    whitespace-only document as having ONE token — and give it a nonzero
    quality score, letting blank docs through a pretraining min-quality
    filter. The SQL twins apply the same ``list_filter`` (_SQL_TOKENS),
    so engine parity holds on the edge as well as the bulk."""
    return F.filter(
        F.split(F.trim(text), r"\s+"), lambda t: t != F.lit("")
    )


def token_count(text: Column | str) -> Column:
    return F.size(tokens(text))


def word_shingles_from_tokens(t: Column, n: int = 2) -> Column:
    """Adjacent word n-gram shingles (distinct) from a BOUND token-array
    column. Callers must pass a projected column, not a raw
    ``tokens(text)`` expression: subexpression elimination does not reach
    into lambda scope, so an unbound split re-runs once per array
    element — O(tokens² · chars) per doc (measured 4× on the bench's
    repetition query before binding).

    Built as chained ``zip_with`` over n parallel slices of the token
    array (gram_i = t[i] .. t[i+n-1], elementwise), NOT as
    ``transform(sequence(...), i -> element_at(t, i+j))``: explode()
    re-evaluates its child array expression per OUTPUT row, and the
    element_at form re-ran the index walk each time — O(grams²) per doc
    under a generator. Measured on the sf0.1 corpus (256k bigrams):
    explode of this form 0.8 s vs 5.6 s for the element_at form; the
    arrays themselves are identical (order included, so array_distinct
    keeps the same first occurrences).

    Docs with fewer than ``n`` tokens yield an empty array — the
    ``when`` guard keeps ``slice`` from seeing a negative length (its
    branches evaluate lazily per row, same contract the previous
    sequence(0, size-n) form relied on)."""
    m = F.size(t) - n + 1  # gram count
    grams = F.slice(t, 1, m)
    for j in range(1, n):
        grams = F.zip_with(
            grams,
            F.slice(t, j + 1, m),
            lambda a, b: F.concat_ws(" ", a, b),
        )
    return F.when(F.size(t) >= n, F.array_distinct(grams)).otherwise(
        F.array().cast("array<string>")
    )


def word_shingles(text: Column | str, n: int = 2) -> Column:
    """Shingles straight from text — convenience for one-shot/small
    frames. Hot paths should project ``tokens(text)`` to a column first
    and use :func:`word_shingles_from_tokens` (see its note)."""
    return word_shingles_from_tokens(tokens(text), n)


def char_shingles(text: Column | str, n: int = 3) -> Column:
    """Character n-gram shingles (distinct). An empty/whitespace-only
    document yields an EMPTY array (same contract as tokens() /
    word_shingles: blank docs must not share a degenerate [''] shingle
    and form spurious perfect-Jaccard cliques); a doc shorter than ``n``
    chars yields its whole text as the single shingle."""
    s = F.trim(text)
    idx = F.sequence(F.lit(1), F.greatest(F.length(s) - n + 1, F.lit(1)))
    grams = F.array_distinct(F.transform(idx, lambda i: F.substring(s, i, n)))
    return F.when(F.length(s) > 0, grams).otherwise(
        F.array().cast("array<string>")
    )


def avg_token_length(text: Column | str) -> Column:
    t = tokens(text)
    total = F.aggregate(
        F.transform(t, F.length), F.lit(0), lambda acc, x: acc + x
    )
    return total.cast("double") / F.size(t)


def stopword_ratio(text: Column | str) -> Column:
    t = tokens(text)
    hits = F.size(
        F.filter(t, lambda x: F.lower(x).isin(*STOPWORDS))
    )
    return hits.cast("double") / F.size(t)


def punct_ratio(text: Column | str) -> Column:
    """Fraction of non-alphanumeric, non-space characters."""
    s = F.col(text) if isinstance(text, str) else text
    stripped = F.regexp_replace(s, r"[A-Za-z0-9\s]", "")
    return F.length(stripped).cast("double") / F.greatest(
        F.length(s), F.lit(1)
    )


def rolling_fingerprint(text: Column | str) -> Column:
    """Polynomial rolling hash over characters: acc = (acc*31 + code) % M.

    A deterministic document fingerprint expressible in both Spark and
    ANSI-ish SQL (the DuckDB oracle mirrors it with list_reduce), unlike
    xxhash64/sha2 whose cross-engine outputs differ or are string-typed.
    """
    chars = F.filter(
        F.split(F.col(text) if isinstance(text, str) else text, ""),
        lambda x: x != "",
    )
    codes = F.transform(chars, F.ascii)
    return F.aggregate(
        codes,
        F.lit(0).cast("bigint"),
        lambda acc, c: (acc * 31 + c) % FP_MOD,
    )


def minhash_signature(shingles: Column, num_hashes: int = 32) -> Column:
    """MinHash signature: per seed i, min over shingles of
    xxhash64(shingle, i). JVM-side, no UDF; 64-bit hash space.

    Returns array<bigint> of length ``num_hashes``.
    """
    return F.array(
        *[
            F.array_min(F.transform(shingles, lambda s: F.xxhash64(s, F.lit(i))))
            for i in range(num_hashes)
        ]
    )


#: Mersenne prime 2^31-1: universal-hash modulus small enough that
#: a*h + b stays under 2^62 (no int64 overflow on either engine).
MINHASH_PRIME = 2_147_483_647


def minhash_coeffs(num_hashes: int = 32, seed: int = 20260813) -> list[tuple[int, int]]:
    """Deterministic (a, b) pairs for the universal-hash permutations
    h_i(x) = (a_i*x + b_i) mod p. The DuckDB oracle SQL is generated from
    the SAME list, so both engines evaluate identical arithmetic."""
    import random

    rng = random.Random(seed)
    return [
        (rng.randrange(1, MINHASH_PRIME), rng.randrange(0, MINHASH_PRIME))
        for _ in range(num_hashes)
    ]


def portable_hash64(s: Column) -> Column:
    """First 60 bits of md5(s) as a non-negative bigint — identical in
    Spark (``conv(substr(md5(s),1,15),16,10)``) and DuckDB
    (``('0x' || substring(md5(s),1,15))::BIGINT``). Slower than xxhash64
    (full md5 per value) but engine-portable, which is what makes the
    MinHash pipeline oracle-checkable end-to-end."""
    return F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("bigint")


def minhash_signature_portable(
    shingles: Column, num_hashes: int = 32, seed: int = 20260813
) -> Column:
    """Engine-portable MinHash signature: md5-derived base hash reduced
    mod p, permuted by ``num_hashes`` universal hashes. Still a pure
    JVM-side expression.

    Shaped as ONE ``aggregate`` over the shingle array with an
    array-of-minima accumulator (``zip_with`` against a literal
    coefficient array), so each shingle is md5-hashed exactly once — the
    naive ``array(array_min(transform(...)) per seed)`` form re-evaluates
    the base-hash lambda per seed (Catalyst inlines it), costing
    num_hashes md5 passes instead of one (~5x wall on the documents
    bench)."""
    coeffs = minhash_coeffs(num_hashes, seed)
    ab = F.array(
        *[
            F.struct(
                F.lit(a).cast("long").alias("a"), F.lit(b).cast("long").alias("b")
            )
            for a, b in coeffs
        ]
    )
    base = F.transform(shingles, lambda s: portable_hash64(s) % MINHASH_PRIME)
    init = F.array_repeat(F.lit(MINHASH_PRIME).cast("long"), num_hashes)
    return F.aggregate(
        base,
        init,
        lambda acc, h: F.zip_with(
            acc,
            ab,
            lambda m, c: F.least(m, (h * c["a"] + c["b"]) % MINHASH_PRIME),
        ),
    )


def simhash64(tokens_col: Column) -> Column:
    """64-bit SimHash over token hashes: bit b of the output is 1 when the
    majority of token hashes have bit b set. Pure expression: per-bit
    popcount via aggregate over the token array."""
    hashes = F.transform(tokens_col, lambda x: F.xxhash64(x))
    n = F.size(hashes)
    bits = []
    for b in range(64):
        ones = F.size(
            F.filter(hashes, lambda h: F.shiftright(h, b).bitwiseAND(F.lit(1)) == 1)
        )
        bits.append(
            F.when(ones * 2 >= n, F.lit(1).cast("bigint")).otherwise(
                F.lit(0).cast("bigint")
            )
            * F.lit(2 ** b if b < 63 else -(2 ** 63)).cast("bigint")
        )
    # bit 63 contributes the sign bit: adding -(2^63) sets it in two's
    # complement arithmetic without overflow
    out = bits[0]
    for piece in bits[1:]:
        out = out + piece
    # empty token array: `0*2 >= 0` is true for EVERY bit, which would
    # emit the all-bits-set fingerprint -1 and put blank docs at small
    # hamming distance from dense-hash real docs; no tokens = no
    # evidence for any bit = fingerprint 0
    return F.when(n > 0, out).otherwise(F.lit(0).cast("bigint"))


def hamming64(a: Column, b: Column) -> Column:
    """Hamming distance between two 64-bit fingerprints (popcount of XOR)."""
    x = a.bitwiseXOR(b)
    return F.bit_count(x)
