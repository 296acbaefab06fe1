from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from mapping_timeseries_spark.sources.versioned import (
    read_versioned,
    restore_version,
    table_history,
    vacuum_versions,
    write_versioned,
)


def _df(spark, tag: str, n: int):
    return spark.range(n).select(
        "id", F.lit(tag).alias("tag"), (F.col("id") * 2.0).alias("v")
    )


def test_versioned_write_read_history_restore(spark, tmp_path):
    root = str(tmp_path / "vt")
    assert write_versioned(_df(spark, "one", 5), root, note="initial") == 1
    assert write_versioned(_df(spark, "two", 7), root) == 2

    # latest read sees v2; VERSION AS OF sees v1
    assert read_versioned(spark, root).count() == 7
    assert read_versioned(spark, root, version=1).count() == 5
    assert {r["tag"] for r in read_versioned(spark, root, 1).collect()} == {"one"}

    hist = table_history(root)
    assert [h["version"] for h in hist] == [1, 2]
    assert hist[0]["note"] == "initial"

    # RESTORE: pointer flips back, history records it, snapshots intact
    restore_version(root, 1)
    assert read_versioned(spark, root).count() == 5
    assert [h["version"] for h in table_history(root)] == [1, 2, 1]
    assert read_versioned(spark, root, version=2).count() == 7  # still there

    # next write continues the sequence past every allocated version
    assert write_versioned(_df(spark, "three", 3), root) == 3
    assert read_versioned(spark, root).count() == 3

    with pytest.raises(ValueError, match="missing version"):
        restore_version(root, 99)


def test_versioned_vacuum_keeps_pointer_and_tail(spark, tmp_path):
    root = str(tmp_path / "vt2")
    for i in range(1, 5):
        write_versioned(_df(spark, f"t{i}", i), root)
    restore_version(root, 2)  # pointer on an old version
    removed = vacuum_versions(root, keep_last=2)
    # newest two (3, 4) kept + pointed-at 2 kept -> only 1 removed
    assert removed == [1]
    assert read_versioned(spark, root).count() == 2  # pointer survives
    assert read_versioned(spark, root, version=4).count() == 4
    with pytest.raises(ValueError, match="does not exist"):
        read_versioned(spark, root, version=1)
    assert not os.path.isdir(os.path.join(root, "v=000001"))


def test_versioned_rejects_non_table(spark, tmp_path):
    with pytest.raises(FileNotFoundError, match="not a versioned table"):
        read_versioned(spark, str(tmp_path / "nope"))


def test_write_versioned_recovers_from_orphan_snapshot_dir(spark, tmp_path):
    """A crash between the snapshot write and the history append leaves
    an orphan v=N directory; the next write must allocate PAST it
    instead of permanently wedging on errorifexists."""
    import os

    from mapping_timeseries_spark.sources.versioned import (
        read_versioned,
        write_versioned,
    )

    root = str(tmp_path / "orphan_vt")
    df = spark.range(5).toDF("n")
    assert write_versioned(df, root, note="v1") == 1
    # simulate the crash: snapshot dir exists, history never updated
    os.makedirs(os.path.join(root, "v=000002", "_simulated_orphan"))
    v = write_versioned(df, root, note="after crash")
    assert v == 3  # allocated past the orphan, not wedged on it
    assert read_versioned(spark, root).count() == 5
