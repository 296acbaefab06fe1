"""Shared staged-LSH pipeline pieces for the scale-gate tools.

Three gates time the same staged decomposition of the near-dup
pipeline — dedup_1000x_gate's per-stage breakdown,
map_stage_10000x_gate's fourth-decade probe, and
neardup_composed_gate's end-to-end composition. The stage expressions
and parameters (word-2-gram shingles, 32 hashes, 8 bands,
non-portable xxhash64 keys, Jaccard 0.5) MUST be byte-identical across
them or the gates measure different pipelines; the r11 bucket-key fix
had to touch two banding paths and is exactly the drift this module
exists to prevent. The frames are built from the production operator
internals (operators.dedup) — no gate-only reimplementation.
"""

from __future__ import annotations

NGRAM_N = 2
NUM_HASHES = 32
BANDS = 8
PORTABLE = False
THRESHOLD = 0.5


def staged_frames(docs, pin_shingles: bool = True):
    """(shingled_filtered, banded_pinned) — stage A of the pipeline,
    pinned via the dedup cache-scope registry so callers consume inside
    dedup_cache_scope(). ``pin_shingles=False`` is for gates that never
    run the verifier (map_stage_10000x_gate): pinning 50M docs' shingle
    sets is tens of GB of cache for a frame read once, and the pin is
    only load-bearing when _verify_jaccard re-joins the shingles."""
    from mapping_timeseries_spark.operators import dedup as D

    sh = D._shingled(docs, "text", NGRAM_N)
    if pin_shingles:
        sh = D.scoped_pin(sh)
    sh = sh.where(sh.n_shingles > 0)
    banded = D.scoped_pin(D._band_frame(sh, NUM_HASHES, BANDS, PORTABLE))
    return sh, banded


def candidates(banded, mode: str):
    """Stage B first half: LSH candidate pairs ('pairs' or 'star')."""
    from mapping_timeseries_spark.operators import dedup as D

    return D._lsh_candidates(banded, mode)


def verify(cand, sh, threshold: float = THRESHOLD):
    """Stage B second half: exact-Jaccard verification."""
    from mapping_timeseries_spark.operators import dedup as D

    return D._verify_jaccard(cand, sh, threshold)


def narrowed_verify(cand, sh_unpinned, threshold: float = THRESHOLD):
    """Stage B second half, participant-narrowed form (r12, VERDICT r11
    #4): the UN-pinned shingle frame is broadcast-semi-joined down to
    the candidate participants (map-side filter — no Exchange of the
    corpus-sized side), the narrowed frame is pinned, and the same
    production verifier runs against it. Row-identical to
    verify(cand, sh) by the candidate-removing-only argument on
    narrow_sets_to_participants (pytest-pinned); exists because pinning
    50M docs' string shingle sets for a verifier that reads ~1% of them
    is the x10000 scale wall. Returns (verified_edges, narrowed_pinned)
    so the caller's scope can account for the pin."""
    from mapping_timeseries_spark.operators import dedup as D

    cand = D.scoped_pin(cand)
    narrowed = D.scoped_pin(
        D.narrow_sets_to_participants(sh_unpinned, cand)
    )
    return D._verify_jaccard(cand, narrowed, threshold), narrowed
