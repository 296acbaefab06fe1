"""Pure-python gate logic in bench.py (no SparkSession needed).

VERDICT r9 #7: peak_scratch_bytes was recorded since r9 but nothing
failed when it doubled — bench.py now pins per-leg ceilings the way
QUIET_PY_LOOP is pinned and emits violations under scratch_warnings.
These tests cover the comparison logic itself; the wiring (keys present
in the artifact) is asserted on the committed artifact when it exists.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench


def test_scratch_violations_empty_when_under_ceilings():
    scratch = {"ngram_jaccard": 100, "corr_mapping": 0}
    assert bench.scratch_violations(scratch) == []


def test_scratch_violations_pinned_leg_uses_its_own_ceiling():
    cap = bench.SCRATCH_CEILING_BYTES["ngram_jaccard"]
    # over the DEFAULT but under its own pin -> no violation
    assert bench.scratch_violations({"ngram_jaccard": cap - 1}) == []
    out = bench.scratch_violations({"ngram_jaccard": cap + 1})
    assert len(out) == 1
    assert "ngram_jaccard" in out[0] and str(cap) in out[0]


def test_scratch_violations_unpinned_leg_uses_default():
    d = bench.SCRATCH_CEILING_DEFAULT
    assert bench.scratch_violations({"new_leg": d}) == []
    out = bench.scratch_violations({"new_leg": d + 1})
    assert len(out) == 1 and "new_leg" in out[0]


def test_scratch_violations_sorted_and_multiple():
    d = bench.SCRATCH_CEILING_DEFAULT
    out = bench.scratch_violations({"zz": d + 1, "aa": d + 1, "mm": 0})
    assert [v.split()[0] for v in out] == ["aa", "zz"]


def test_scratch_violations_custom_ceilings_override_pins():
    out = bench.scratch_violations({"x": 11}, ceilings={"x": 10})
    assert len(out) == 1
    assert bench.scratch_violations({"x": 10}, ceilings={"x": 10}) == []


def test_r9_quiet_measurements_fit_pins():
    """The pins must be generous vs the last committed quiet artifact:
    a pin tighter than an already-measured quiet value would warn on
    every run (the gate would cry wolf from day one)."""
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "artifacts",
        "BENCH_detail_last.json",
    )
    if not os.path.exists(path):
        return
    with open(path) as f:
        detail = json.load(f)
    scratch = detail.get("peak_scratch_bytes", {})
    # every recorded leg sits under its ceiling with >=2x headroom
    for name, b in scratch.items():
        cap = bench.SCRATCH_CEILING_BYTES.get(
            name, bench.SCRATCH_CEILING_DEFAULT
        )
        assert b * 2 <= cap, (name, b, cap)


def test_artifact_carries_gate_keys():
    """The committed detail artifact (when present and post-r10) carries
    the scratch pins and the violation list, so the number and its gate
    travel together."""
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "artifacts",
        "BENCH_detail_last.json",
    )
    if not os.path.exists(path):
        return
    with open(path) as f:
        detail = json.load(f)
    if "scratch_warnings" not in detail:
        return  # pre-r10 artifact still committed; refreshed this round
    assert isinstance(detail["scratch_warnings"], list)
    assert detail["gate"]["scratch_ceilings"] == bench.SCRATCH_CEILING_BYTES
    assert (
        detail["gate"]["scratch_ceiling_default"]
        == bench.SCRATCH_CEILING_DEFAULT
    )


def _soak_series(n=30, trigger_ms=1200, state=4000, removed=400, inp=250000):
    return [
        {
            "trigger_ms": trigger_ms,
            "state_rows": state,
            "state_removed": removed,
            "input_rows": inp,
        }
        for _ in range(n)
    ]


def test_streaming_soak_checks_green_on_healthy_series():
    """The soak gate's pass arithmetic (tools/streaming_soak_gate.py
    evaluate_checks — same separated-logic contract as the bench gate
    helpers above): a healthy plateaued series passes all five."""
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from streaming_soak_gate import evaluate_checks

    checks, metrics = evaluate_checks(
        _soak_series(), emitted=10_000, exception=None
    )
    assert all(checks.values()), checks
    assert metrics["state_rows_last_third_max"] == 4000


def test_streaming_soak_checks_catch_failures():
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from streaming_soak_gate import evaluate_checks

    # state leak: last third grows past tol * middle third
    leak = _soak_series()
    for i, s in enumerate(leak):
        s["state_rows"] = 4000 + (i * 400 if i >= 20 else 0)
    checks, _ = evaluate_checks(leak, emitted=10_000, exception=None)
    assert not checks["state_plateau"]

    # backlog: trigger wall exceeds the interval
    checks, _ = evaluate_checks(
        _soak_series(trigger_ms=9000), emitted=10_000, exception=None
    )
    assert not checks["keepup"]

    # absolute ceiling backstop even when flat
    checks, _ = evaluate_checks(
        _soak_series(state=50_000), emitted=10_000, exception=None
    )
    assert not checks["state_plateau"]

    # no emissions / dirty run
    checks, _ = evaluate_checks(_soak_series(), emitted=0, exception=None)
    assert not checks["emits"]
    checks, _ = evaluate_checks(_soak_series(), emitted=10_000, exception="boom")
    assert not checks["clean"]

    # removals key present but eviction count implausibly low
    checks, _ = evaluate_checks(
        _soak_series(removed=0), emitted=10_000, exception=None
    )
    assert not checks["evicts"]
    # removals key absent entirely -> eviction proven by plateau+emits
    checks, _ = evaluate_checks(
        _soak_series(removed=None), emitted=10_000, exception=None
    )
    assert checks["evicts"]
