"""Training-data export walkthrough: raw corpus -> cleaned, mixed,
packed, sharded training set — the LLM-pipeline side of the engine,
runnable end to end (executed by tests/test_examples.py so it cannot
rot).

    python examples/training_export.py

Stages (each one a first-class operator documented in COVERAGE.md §2.11):

1. duplicated-passage stripping — Lee-et-al substring dedup excises a
   license paragraph copied verbatim across otherwise-distinct pages
   (remove_dup_spans), keeping their unique prose;
2. corpus preprocessing — exact dedup, MinHash near-dup clustering,
   benchmark decontamination, quality floor, boilerplate ceiling, AND
   the learned Naive-Bayes filter stage; all stage counts from ONE
   Observation on the export write;
3. weighted dataset mixing — per-domain epoch weights realized as a
   deterministic row multiset (no RNG anywhere: re-runs reproduce the
   exact mixture);
4. sequence packing — concat-and-chunk pack layout at a fixed token
   budget (hash-order deterministic), plus the FFD bin alternative with
   its measured padding waste;
5. shard export — portable-hash shuffle-and-shard, one task per shard;
6. BM25 retrieval audit over the exported corpus.
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def main(spark=None, out_root: str | None = None, show: bool = True) -> dict:
    own_session = spark is None
    if own_session:
        from mapping_timeseries_spark.session import get_spark

        spark = get_spark(
            "training-export", master="local[4]", shuffle_partitions=4
        )
    out_root = out_root or tempfile.mkdtemp(prefix="mts_training_")

    # ── Step 1: a raw corpus with the usual defects ────────────────────
    # swap for spark.read.parquet(...) over your crawl in production
    footer = "all content copyright example holdings contact us for licensing"
    bodies = [
        "glaciers carve valleys slowly over thousands of patient years",
        "the orchestra tuned quietly before the conductor raised a hand",
        "fermented tea cultures trade sugar for acidity and thin films",
        "object stores serve immutable blobs behind eventually consistent apis",
        "migrating birds read polarized light and magnetic field lines",
        "careful bakers weigh flour because volume lies about density",
    ]
    rows = [(i, f"{b} {footer}", "en" if i % 2 else "de") for i, b in enumerate(bodies)]
    rows += [
        (10, rows[0][1], "en"),                    # exact duplicate
        (11, "what is the tallest mountain on earth measured from sea "
             "level says the quiz page and then some filler text", "en"),
        (12, "x x x x x", "en"),                   # junk
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    holdout = spark.createDataFrame(
        [(900, "what is the tallest mountain on earth measured from sea level")],
        "doc_id long, text string",
    )

    # ── Step 1.5: strip duplicated PASSAGES (Lee-et-al substring dedup)
    # Two scraped pages embed the same license paragraph verbatim; doc-
    # level dedup keeps both (they differ), but remove_dup_spans excises
    # the copied span from each and the unique prose survives.
    from mapping_timeseries_spark.operators.dedup import remove_dup_spans

    license_para = (
        "this work is licensed under the creative commons attribution "
        "share alike international license"
    )
    scraped = spark.createDataFrame(
        [
            (20, "mountain weather shifts faster than valley forecasts "
                 "predict and the climbers know it " + license_para, "en"),
            (21, license_para + " deep caves keep a constant temperature "
                 "because rock insulates them from the surface seasons", "en"),
        ],
        "doc_id long, text string, lang string",
    )
    stripped = (
        remove_dup_spans(scraped, min_span_tokens=8)
        .join(scraped.select("doc_id", "lang"), "doc_id")
        .select("doc_id", F.col("text_clean").alias("text"), "lang")
    )
    n_stripped = stripped.where(F.col("text") != "").count()
    docs = docs.unionByName(stripped)

    # ── Step 2: preprocess + attribute every rejection ─────────────────
    # the learned-filter stage: a tiny NB model trained on labeled
    # ham/spam (in production: curated positives vs crawl negatives)
    from mapping_timeseries_spark.operators.textmodels import nb_train
    from mapping_timeseries_spark.plans.corpus_pipeline import run_corpus_pipeline

    nb_model = nb_train(
        spark.createDataFrame(
            [
                (800, "careful prose about weather rocks and music", 1),
                (801, "the reader weighs evidence with patience", 1),
                (802, "x x x x x buy now", 0),
                (803, "click here x x cheap deals", 0),
            ],
            "doc_id long, text string, y int",
        ),
        "y",
    )
    clean_path = os.path.join(out_root, "clean")
    res = run_corpus_pipeline(
        docs,
        holdout,
        clean_path,
        min_quality=0.3,
        max_boilerplate_frac=0.9,  # footer is most of each tiny doc; keep
        nb_model=nb_model,         # OOV docs fall back to the (0) prior: pass
        n_shards=2,
    )
    clean = spark.read.parquet(clean_path)

    # ── Step 3: realize the training mixture (de docs twice) ───────────
    from mapping_timeseries_spark.operators.relational import sample_weighted_mix

    mixed = sample_weighted_mix(
        clean, "lang", "doc_id", {"de": 2.0}, default_weight=1.0
    )

    # ── Step 4: pack into fixed token-budget sequences ─────────────────
    from mapping_timeseries_spark.operators.packing import (
        concat_pack_spans,
        pack_greedy_ffd,
        pack_manifest,
        packing_stats,
    )
    from mapping_timeseries_spark.operators.textstats import token_counts

    # copies need distinct pack keys or they'd collapse to one offset
    with_tokens = (
        mixed.withColumn("pack_key", F.concat_ws("#", "doc_id", "copy_idx"))
        .join(token_counts(clean).select("doc_id", "ws_tokens"), "doc_id")
    )
    spans = concat_pack_spans(with_tokens, "pack_key", "ws_tokens", budget=32)
    manifest = pack_manifest(spans, "pack_key", budget=32)
    ffd = pack_greedy_ffd(with_tokens, "pack_key", "ws_tokens", budget=32, n_shards=2)
    waste = packing_stats(ffd, budget=32).first()

    # ── Step 5: export reproducible shards of the packed mixture ───────
    from mapping_timeseries_spark.sources.writers import write_training_shards

    shards_path = os.path.join(out_root, "shards")
    write_training_shards(
        spans.select("pack_key", "doc_id", "lang", "tok_start", "pack_first"),
        shards_path,
        key_col="pack_key",
        n_shards=2,
    )

    # ── Step 6: audit the export with BM25 retrieval ───────────────────
    # keyword search over what actually shipped — the quickest way to
    # answer "did the cleaning keep the docs users will look for?"
    from mapping_timeseries_spark.operators.search import bm25_index, bm25_topk

    hits = bm25_topk(
        bm25_index(clean),
        spark.createDataFrame(
            [(1, "glaciers carve valleys")], ["query_id", "query_text"]
        ),
        k=3,
    )
    # the hit set is data-dependent — an upstream threshold tweak could
    # legitimately filter every match, which must read as "no hit", not
    # a crash
    top_row = hits.where(F.col("rank") == 1).first()
    bm25_top_doc = int(top_row["doc_id"]) if top_row is not None else None

    stats = {
        "stage_counts": {
            k: v for k, v in res.stats.items() if k.startswith("n_")
        },
        "n_passage_stripped": n_stripped,
        "bm25_top_doc": bm25_top_doc,
        "mixture_rows": mixed.count(),
        "n_packs": int(
            manifest.agg(F.countDistinct("pack_id")).first()[0]
        ),
        "ffd_waste_frac": float(waste.waste_frac),
        "shard_files": sorted(
            d for d in os.listdir(shards_path) if d.startswith("shard=")
        ),
    }
    if show:
        print(stats)
    if own_session:
        spark.stop()
    return stats


if __name__ == "__main__":
    main()
