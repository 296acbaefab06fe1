from __future__ import annotations

import os
import sys


def test_quickstart_example_runs(spark, tmp_path):
    """The shipped quickstart must actually run end to end and produce a
    non-trivial mapping table + a published version."""
    sys.path.insert(
        0, os.path.join(os.path.dirname(os.path.dirname(__file__)), "examples")
    )
    import quickstart

    stats = quickstart.main(spark=spark, out_root=str(tmp_path), show=False)
    assert stats["total_mappings"] > 0
    assert set(stats["methods"]) <= {"correlation", "dtw"}
    assert stats["published_version"] == 1
    assert stats["history"] == ["quickstart run"]


def test_incremental_production_example_runs(spark, tmp_path):
    """The stateful month-append walkthrough must run end to end:
    bootstrap, advance+apply via run_incremental(state_root=...), and
    vacuum — with mappings emitted for the appended month."""
    sys.path.insert(
        0, os.path.join(os.path.dirname(os.path.dirname(__file__)), "examples")
    )
    import incremental_production

    stats = incremental_production.main(
        spark=spark, out_root=str(tmp_path), show=False
    )
    assert stats["new_month_mappings"] > 0
    assert stats["qa_passed"] in (True, False)  # QA ran either way
    assert os.path.isfile(os.path.join(stats["state_root"], "_meta.json"))


def test_training_export_example_runs(spark, tmp_path):
    """The training-export walkthrough must run end to end: rejects the
    planted defects, realizes the de x2 mixture, packs, and shards."""
    sys.path.insert(
        0, os.path.join(os.path.dirname(os.path.dirname(__file__)), "examples")
    )
    import training_export

    stats = training_export.main(spark=spark, out_root=str(tmp_path), show=False)
    sc = stats["stage_counts"]
    # 9 base docs + 2 passage-stripped scraped pages
    assert sc["n_input"] == 11
    assert stats["n_passage_stripped"] == 2
    # planted: 1 exact dup, 1 contaminated, 1 junk -> 8 survive (the
    # stripped pages keep their unique prose and pass every stage; the
    # NB stage rejects only spam-vocabulary text — OOV docs fall back
    # to the balanced prior and pass)
    assert sc["n_retained"] == 8
    assert sc["n_pass_classifier"] == 10  # junk doc x-vocab rejected
    # 3 de docs doubled (6) + 5 en docs once
    assert stats["mixture_rows"] == 11
    # the glacier doc survived cleaning and tops its own query
    assert stats["bm25_top_doc"] == 0
    assert stats["n_packs"] >= 2
    assert 0 <= stats["ffd_waste_frac"] < 0.5
    assert stats["shard_files"] == ["shard=0", "shard=1"]


def test_incremental_serving_example_runs(spark, tmp_path):
    """The continuous-ingestion walkthrough must run end to end:
    batch deduped against the persisted LSH index (and folded in),
    BM25 index appended and serving, sketch state advanced."""
    sys.path.insert(
        0, os.path.join(os.path.dirname(os.path.dirname(__file__)), "examples")
    )
    import incremental_serving

    stats = incremental_serving.main(
        spark=spark, out_root=str(tmp_path), show=False
    )
    assert stats["n_standing"] > 0 and stats["n_batch"] > 0
    assert stats["n_bm25_hits"] > 0 and stats["bm25_top_doc"] is not None
    assert stats["vocab_estimates"]
    # every flagged pair involves the batch by construction
    assert stats["n_dup_batch_docs"] <= stats["n_batch"]


def test_incremental_month_close_example_runs(spark, tmp_path):
    """The unified month-close walkthrough (VERDICT r6 #8): all five
    mergeable-state families advanced from one append, each asserting
    its own advance==rebuild contract inline, sketches persisted
    through the versioned-pointer idiom."""
    sys.path.insert(
        0, os.path.join(os.path.dirname(os.path.dirname(__file__)), "examples")
    )
    import incremental_month_close

    stats = incremental_month_close.main(
        spark=spark, out_root=str(tmp_path), show=False
    )
    assert stats["n_model_entities"] > 0
    assert stats["bm25_top_doc"] is not None
    assert stats["vocab_estimates"] and stats["hot_keys"]
    assert stats["txn_p50"] > 0 and stats["txn_p99"] >= stats["txn_p50"]
    # second versions published for every sketch family (v1 = standing
    # corpus / history, v2 = the close's append)
    assert all(v == 2 for v in stats["sketch_versions"].values())
    assert stats["n_nn_results"] > 0
