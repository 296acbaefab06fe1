"""Versioned streaming refresh soak (r11, VERDICT r10 #8): the
sessionizer soak proved keep-up + bounded state; this gate proves the
OTHER streaming runtime claim — the foreachBatch two-phase publish
(streaming/windows.stream_to_versioned over sources/versioned.py) never
exposes a partial or QA-failed table to readers, including across an
injected mid-soak crash and checkpoint-resume retry.

Shape: a rate source (ROWS_PER_SEC) aggregated per key (value % KEYS,
complete output mode) refreshes a versioned table on a 1 s trigger. The
QA gate is sabotaged on purpose: it VETOES (returns False) a fixed
subset of batches and RAISES once mid-soak (killing the query the way a
real QA crash would — after the snapshot is staged, before the
checkpoint commit). The soak then RESTARTS from the same checkpoint:
foreachBatch's at-least-once contract redelivers the in-flight batch,
which re-stages under a fresh version.

Throughout BOTH phases an independent reader (pyarrow, not Spark — the
check must not share the writer's code path) hammers the table at
~20 reads/s through the same pointer protocol readers use
(version pointer file -> v=NNNNNN parquet dir) and asserts, per read:

- the read succeeds (no torn file / missing dir / absent _SUCCESS);
- the pointed version only ever ADVANCES;
- re-reads of the SAME version are bit-identical (snapshots immutable);
- per-key counts and their total are NONDECREASING across versions
  (complete-mode aggregation only grows — a shrink would mean a partial
  snapshot was published);
- no read ever observes a version the QA gate vetoed or crashed on
  (two-phase publish: staged != published).

Artifact checks (all must pass):
  clean_reads        zero reader errors across the soak
  no_partial         zero consistency violations (above invariants)
  qa_gated           observed versions disjoint from vetoed/crashed ones
  resumed_after_crash the restarted stream published new versions
  forensic_orphans   vetoed/crashed snapshots remain on disk, unpublished

Writes artifacts/versioned_refresh_soak_gate.json.
Usage: python tools/versioned_refresh_soak_gate.py [out.json]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ROWS_PER_SEC = 5000
KEYS = 100
PHASE1_SEC = 40.0
PHASE2_SEC = 30.0
VETO_EVERY = 4      # qa returns False on every 4th staged batch
CRASH_AT_CALL = 6   # qa raises on its 6th phase-1 call (once)


class Reader(threading.Thread):
    """Independent pointer-protocol reader: pyarrow, no Spark."""

    def __init__(self, root: str):
        super().__init__(daemon=True)
        self.root = root
        self.stop_evt = threading.Event()
        self.reads = 0
        self.errors: list[str] = []
        self.violations: list[str] = []
        self.observed: dict[int, tuple] = {}  # version -> (rows, total)
        self.max_version = 0

    def run(self):
        import pyarrow.parquet as pq

        # the published-version pointer (sources/versioned._POINTER),
        # read through the same protocol read_versioned uses
        pointer = os.path.join(self.root, "_latest")
        while not self.stop_evt.is_set():
            time.sleep(0.05)
            if not os.path.exists(pointer):
                continue
            self.reads += 1
            try:
                with open(pointer) as f:
                    v = int(f.read().strip())
                vdir = os.path.join(self.root, f"v={v:06d}")
                if not os.path.exists(os.path.join(vdir, "_SUCCESS")):
                    self.violations.append(
                        f"v{v}: published without _SUCCESS"
                    )
                    continue
                t = pq.read_table(vdir)
                rows = t.num_rows
                total = sum(t.column("cnt").to_pylist())
            except Exception as e:  # torn read IS the failure mode
                self.errors.append(f"v?: {type(e).__name__}: {e}")
                continue
            if v < self.max_version:
                self.violations.append(
                    f"pointer regressed {self.max_version} -> {v}"
                )
            self.max_version = max(self.max_version, v)
            prev = self.observed.get(v)
            if prev is not None and prev != (rows, total):
                self.violations.append(
                    f"v{v} mutated: {prev} -> {(rows, total)}"
                )
            if prev is None:
                # nondecreasing vs the newest earlier-observed version
                earlier = [k for k in self.observed if k < v]
                if earlier:
                    er, et = self.observed[max(earlier)]
                    if rows < er or total < et:
                        self.violations.append(
                            f"v{v} shrank vs v{max(earlier)}: "
                            f"({rows},{total}) < ({er},{et})"
                        )
                self.observed[v] = (rows, total)


def evaluate_checks(
    observed: set,
    gated: set,
    read_errors: list,
    violations: list,
    phase1_exc: str | None,
    max_pub_at_crash: int,
    max_version: int,
    orphans_on_disk: list,
    crash_injected: bool = True,
) -> dict:
    """The gate's pass/fail arithmetic, separated from the live stream
    so pytest can pin it (same contract as the sessionizer soak's
    evaluate_checks and bench.py's gate helpers). ``crash_injected``
    must be True for resumed_after_crash to pass: a phase-1 death from
    an UNRELATED error (before the QA sabotage fired) would otherwise
    satisfy 'an exception happened and phase 2 advanced' without ever
    exercising the crash-redelivery contract the check is named for."""
    return {
        "clean_reads": not read_errors,
        "no_partial": not violations,
        "qa_gated": not (observed & gated),
        "resumed_after_crash": crash_injected
        and phase1_exc is not None
        and max_version > max_pub_at_crash,
        "forensic_orphans": len(orphans_on_disk) == len(gated),
    }


def main() -> int:
    out_json = (
        sys.argv[1]
        if len(sys.argv) > 1
        else os.path.join(
            REPO, "artifacts", "versioned_refresh_soak_gate.json"
        )
    )
    from pyspark.sql import functions as F

    from bench import box_calibration
    from mapping_timeseries_spark.session import get_spark
    from mapping_timeseries_spark.sources.versioned import table_history
    from mapping_timeseries_spark.streaming.windows import stream_to_versioned

    work = tempfile.mkdtemp(prefix="vsoak_")
    root = os.path.join(work, "table")
    checkpoint = os.path.join(work, "ckpt")

    spark = get_spark(
        "versioned-refresh-soak",
        master="local[8]",
        shuffle_partitions=8,
        extra_conf={"spark.driver.memory": "8g"},
    )
    spark.range(10).selectExpr("sum(id)").collect()
    pre = box_calibration()

    agg = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", ROWS_PER_SEC)
        .load()
        .groupBy((F.col("value") % KEYS).alias("key"))
        .agg(F.count(F.lit(1)).alias("cnt"), F.max("value").alias("max_v"))
    )

    vetoed: list[int] = []
    crashed: list[int] = []
    crash_flag = os.path.join(work, "crashed_once")

    def make_qa():
        calls = {"n": 0}

        def qa(batch_df) -> bool:
            calls["n"] += 1
            # the just-staged version is the history max (qa runs after
            # write_versioned(publish=False), before publish_version)
            v = max(h["version"] for h in table_history(root))
            if calls["n"] == CRASH_AT_CALL and not os.path.exists(crash_flag):
                with open(crash_flag, "w") as f:
                    f.write(str(v))
                crashed.append(v)
                raise RuntimeError(
                    f"injected QA crash on staged v{v} (soak gate)"
                )
            if calls["n"] % VETO_EVERY == 0:
                vetoed.append(v)
                return False
            return True

        return qa

    reader = Reader(root)
    reader.start()

    phase1_exc = None
    t0 = time.monotonic()
    try:
        stream_to_versioned(
            agg, root, checkpoint,
            qa_check=make_qa(),
            processing_time="1 second",
            run_seconds=PHASE1_SEC,
        )
    except Exception as e:
        # keep the REAL type+message (truncated): an unrelated phase-1
        # death must be readable in the artifact, and crash_injected
        # (crashed non-empty) — not the mere presence of an exception —
        # is what lets resumed_after_crash pass
        phase1_exc = f"{type(e).__name__}: {str(e)[:300]}"
    phase1_wall = round(time.monotonic() - t0, 1)
    max_pub_after_crash = reader.max_version

    # restart from the SAME checkpoint: at-least-once redelivery of the
    # crashed batch, re-staged under a fresh version. Guarded so a
    # phase-2 failure still writes a FAILING artifact with the reader's
    # evidence (the traceback-no-artifact mode ADVICE r10 #1 named).
    phase2_exc = None
    t0 = time.monotonic()
    try:
        stream_to_versioned(
            agg, root, checkpoint,
            qa_check=make_qa(),
            processing_time="1 second",
            run_seconds=PHASE2_SEC,
        )
    except Exception as e:
        phase2_exc = f"{type(e).__name__}: {str(e)[:300]}"
    phase2_wall = round(time.monotonic() - t0, 1)

    time.sleep(1.0)
    reader.stop_evt.set()
    reader.join(timeout=10)

    history = table_history(root)
    staged = {h["version"] for h in history}
    observed = set(reader.observed)
    gated = sorted(set(vetoed) | set(crashed))
    on_disk_orphans = [
        v for v in gated
        if os.path.isdir(os.path.join(root, f"v={v:06d}"))
        and v not in observed
    ]

    checks = evaluate_checks(
        observed,
        set(gated),
        reader.errors,
        reader.violations,
        phase1_exc,
        max_pub_after_crash,
        reader.max_version,
        on_disk_orphans,
        crash_injected=bool(crashed),
    )
    checks["phase2_clean"] = phase2_exc is None
    out = {
        "rows_per_sec": ROWS_PER_SEC,
        "keys": KEYS,
        "phase1_wall_sec": phase1_wall,
        "phase2_wall_sec": phase2_wall,
        "phase1_exception": phase1_exc,
        "phase2_exception": phase2_exc,
        "crash_injected": bool(crashed),
        "reads_total": reader.reads,
        "read_errors": reader.errors[:5],
        "violations": reader.violations[:5],
        "versions_staged": len(staged),
        "versions_observed": len(observed),
        "max_version_observed": reader.max_version,
        "max_published_at_crash": max_pub_after_crash,
        "qa_vetoed_versions": vetoed,
        "qa_crashed_versions": crashed,
        "orphans_on_disk": on_disk_orphans,
        "checks": checks,
        "all_green": all(checks.values()),
        "box_calibration": {"pre": pre, "post": box_calibration()},
    }
    os.makedirs(os.path.dirname(out_json), exist_ok=True)
    with open(out_json, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))
    print(f"wrote {out_json} all_green={out['all_green']}")
    spark.stop()
    shutil.rmtree(work, ignore_errors=True)
    return 0 if out["all_green"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
