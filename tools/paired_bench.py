"""Paired same-boot bench of two git refs — the ONLY instrument this
repo trusts for cross-round performance claims (r13 lesson, SCALE.md
"Measured findings (r13)"): this container shares hardware, and host
tenancy moves same-boot day totals ±10–20% at a VALID box gate while
py_loop, loadavg, and both boot-class probes stay quiet-class. Probe
normalization therefore cannot attribute a cross-round delta to code.
What CAN: check out tree A and tree B as worktrees, run each tree's
own ``bench.py`` back-to-back on the same boot within the same hour,
and read the per-leg difference — the box axis cancels to the pair's
session-noise floor (measured ±0.3 s on sub-second legs, the run pair
states its own floor via the frozen controls both trees share).

This is how VERDICT r12 #1 was settled: the r11-maiden tree (1a2dd76)
vs HEAD on the r12-anchor boot read −2.15 s total (mapping family
−2.55 s) for the NEW code while the maiden tree's own frozen controls
stood +28–77% above their r11-boot readings — code faster, box slower.

Usage:
    python tools/paired_bench.py REF_B [REF_A] [out.json]

REF_A defaults to HEAD (the working tree's committed state). Each ref
runs in a detached git worktree under /tmp (removed afterwards unless
KEEP_PAIRED_WORKTREES=1). The benches run SEQUENTIALLY (never
concurrently — they'd contend); run this on an otherwise idle box.
Emits one JSON artifact with both trees' totals, boxes, controls, and
the per-leg delta table sorted by |delta|.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def paired_summary(queries_a: dict, queries_b: dict) -> dict:
    """Pure per-leg pairing arithmetic (pytest-pinned): legs common to
    both runs get delta = A − B (A is the newer tree by convention, so
    negative deltas mean the newer code is faster); one-sided legs are
    listed, never silently dropped (no-silent-caps rule)."""
    common = sorted(set(queries_a) & set(queries_b))
    legs = {
        k: {
            "a": queries_a[k],
            "b": queries_b[k],
            "delta": round(queries_a[k] - queries_b[k], 3),
        }
        for k in common
    }
    return {
        "legs": dict(
            sorted(legs.items(), key=lambda kv: -abs(kv[1]["delta"]))
        ),
        "only_in_a": sorted(set(queries_a) - set(queries_b)),
        "only_in_b": sorted(set(queries_b) - set(queries_a)),
        "total_a_common": round(sum(queries_a[k] for k in common), 3),
        "total_b_common": round(sum(queries_b[k] for k in common), 3),
        "delta_common": round(
            sum(queries_a[k] - queries_b[k] for k in common), 3
        ),
    }


def _run_ref(ref: str, tag: str) -> dict:
    wt = f"/tmp/paired_bench_{tag}_{ref.replace('/', '_')[:24]}"
    shutil.rmtree(wt, ignore_errors=True)
    subprocess.run(
        ["git", "worktree", "add", "--detach", wt, ref],
        cwd=REPO,
        check=True,
        capture_output=True,
    )
    try:
        t0 = time.time()
        proc = subprocess.run(
            [sys.executable, "bench.py"],
            cwd=wt,
            capture_output=True,
            text=True,
            timeout=int(os.environ.get("PAIRED_BENCH_TIMEOUT", "1800")),
        )
        lines = [
            ln for ln in proc.stdout.strip().splitlines() if ln.startswith("{")
        ]
        if proc.returncode != 0 or not lines:
            raise RuntimeError(
                f"bench for {ref} failed rc={proc.returncode}: "
                f"{proc.stderr[-500:]}"
            )
        out = json.loads(lines[-1])
        out["_ref"] = ref
        out["_started_at_epoch"] = round(t0, 0)
        # the worktree's own detail file carries the controls — fold the
        # shared frozen-control readings in (both trees carry them, so
        # the pair states its own noise floor)
        detail_path = os.path.join(wt, "artifacts", "BENCH_detail_last.json")
        if os.path.isfile(detail_path):
            with open(detail_path) as f:
                detail = json.load(f)
            out["_controls"] = detail.get("controls")
            out["_box_warnings"] = detail.get("box_warnings")
        return out
    finally:
        if os.environ.get("KEEP_PAIRED_WORKTREES") != "1":
            subprocess.run(
                ["git", "worktree", "remove", "--force", wt],
                cwd=REPO,
                capture_output=True,
            )


def main() -> int:
    if len(sys.argv) < 2:
        print(__doc__)
        return 2
    ref_b = sys.argv[1]
    ref_a = sys.argv[2] if len(sys.argv) > 2 else "HEAD"
    out_json = (
        sys.argv[3]
        if len(sys.argv) > 3
        else os.path.join(REPO, "artifacts", "paired_bench.json")
    )
    boot = open("/proc/sys/kernel/random/boot_id").read().strip()
    # B first, then A: if the box drifts monotonically mid-pair, the
    # drift biases AGAINST the newer tree — a conservative ordering for
    # "the new code is faster" claims
    res_b = _run_ref(ref_b, "b")
    res_a = _run_ref(ref_a, "a")
    summary = paired_summary(res_a["queries"], res_b["queries"])
    artifact = {
        "protocol": "paired same-boot sequential bench (SCALE.md r13)",
        "boot_id": boot,
        "ref_a": ref_a,
        "ref_b": ref_b,
        "total_a": res_a["value"],
        "total_b": res_b["value"],
        "box_a": res_a.get("box"),
        "box_b": res_b.get("box"),
        "controls_a": res_a.get("_controls"),
        "controls_b": res_b.get("_controls"),
        "box_warnings_a": res_a.get("_box_warnings"),
        "box_warnings_b": res_b.get("_box_warnings"),
        "invalid_a": res_a.get("invalid_box"),
        "invalid_b": res_b.get("invalid_box"),
        "summary": summary,
    }
    os.makedirs(os.path.dirname(out_json), exist_ok=True)
    with open(out_json, "w") as f:
        json.dump(artifact, f, indent=1)
    print(
        f"A={ref_a}: {res_a['value']}  B={ref_b}: {res_b['value']}  "
        f"delta(common)={summary['delta_common']}"
    )
    print(f"wrote {out_json}")
    return 0 if not (res_a.get("invalid_box") or res_b.get("invalid_box")) else 1


if __name__ == "__main__":
    raise SystemExit(main())
