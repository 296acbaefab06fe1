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
