"""COVERAGE.md anchor-honesty guard (VERDICT r8 #8).

COVERAGE.md cites implementations as `` `path/module.py symbol` ``
anchors; modules get reworked every round and anchors silently drift
(several r7 anchors moved in r8). This test extracts every such anchor
and asserts the symbol still exists in the cited module — pure text
checks, no Spark session, so it runs in milliseconds.

Resolution rules: the cited path is matched by SUFFIX against the
repo's python files (COVERAGE abbreviates `sources/writers.py` to
`writers.py` when unambiguous in context — both forms appear); the
symbol must appear as a module-level/class-level `def`, a `class`, or a
module-level assignment in at least one suffix-matching file.
"""

from __future__ import annotations

import os
import re

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
COVERAGE = os.path.join(REPO, "COVERAGE.md")

ANCHOR = re.compile(r"`([A-Za-z_/]+\.py) ([A-Za-z_][A-Za-z_0-9]*)`")


def _py_files() -> list[str]:
    out = []
    for root, dirs, files in os.walk(REPO):
        dirs[:] = [
            d
            for d in dirs
            if d not in {".git", "__pycache__", "artifacts", "spark-warehouse"}
        ]
        out.extend(
            os.path.join(root, f) for f in files if f.endswith(".py")
        )
    return out


README = os.path.join(REPO, "README.md")
ARTIFACT_CITE = re.compile(r"`([A-Za-z_0-9]+_gate\.json)`")


def test_coverage_anchors_resolve():
    with open(COVERAGE) as fh:
        text = fh.read()
    anchors = sorted(set(ANCHOR.findall(text)))
    assert len(anchors) >= 50, "anchor extraction regressed"
    _assert_anchors_resolve(anchors)


def test_readme_quickstart_anchors_resolve():
    """r13 (VERDICT r12 #9): the 100x-user quickstart table cites knobs
    as `module.py symbol` anchors and evidence as gate artifacts — both
    must keep resolving as modules get reworked."""
    with open(README) as fh:
        text = fh.read()
    anchors = sorted(set(ANCHOR.findall(text)))
    assert len(anchors) >= 10, "README quickstart anchors regressed"
    _assert_anchors_resolve(anchors)
    cited = sorted(set(ARTIFACT_CITE.findall(text)))
    assert len(cited) >= 3, "README artifact citations regressed"
    missing = [
        a
        for a in cited
        if not os.path.isfile(os.path.join(REPO, "artifacts", a))
    ]
    assert not missing, f"README cites absent gate artifacts: {missing}"


def _assert_anchors_resolve(anchors):
    files = _py_files()
    sources: dict[str, str] = {}
    missing = []
    for relfile, symbol in anchors:
        cands = [f for f in files if f.endswith(os.sep + relfile)]
        if not cands:
            missing.append(f"{relfile} (no such module) [{symbol}]")
            continue
        pat = re.compile(
            rf"^\s*(?:def|class)\s+{re.escape(symbol)}\b"
            rf"|^{re.escape(symbol)}\s*[:=]",
            re.M,
        )
        for f in cands:
            if f not in sources:
                with open(f) as fh:
                    sources[f] = fh.read()
            if pat.search(sources[f]):
                break
        else:
            missing.append(f"{relfile} {symbol}")
    assert not missing, (
        "stale COVERAGE.md anchors (module reworked without updating "
        f"the doc): {missing}"
    )


def test_every_registry_query_documented():
    """The inverse direction: every queries() registry entry must appear
    somewhere in COVERAGE.md — a query added to the driver contract
    without a coverage row is invisible to the §2 audit."""
    import __spark_entry__ as entry_mod

    with open(COVERAGE) as fh:
        text = fh.read()
    undocumented = [n for n in entry_mod.queries() if n not in text]
    assert not undocumented, (
        f"registry queries missing from COVERAGE.md: {undocumented}"
    )
