"""Doc-count drift guard (round-4 verdict "weak" #4).

The parity-check count and the test count are advertised in several
documents (README.md, CLAUDE.md, BASELINE.md).  They kept drifting when
hand-synced (114 vs 118 in round 4), so both are now MEASURED:

  * tools/check_reference_parity.py counts its own OK/FAIL verdict lines and
    writes evidence/parity_counts.json;
  * tests/conftest.py pytest_sessionfinish writes evidence/test_count.json
    after any full unfiltered green run.

This test fails when any doc states a number that disagrees with another
doc or with the measured artifacts.
"""
import json
import os
import re

import pytest

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _read(name):
    with open(os.path.join(HERE, name)) as f:
        return f.read()


def _artifact(name):
    path = os.path.join(HERE, "evidence", name)
    if not os.path.exists(path):
        return None
    with open(path) as f:
        return json.load(f)


def test_parity_check_count_consistent():
    stated = {}
    for doc in ("README.md", "BASELINE.md"):
        hits = re.findall(r"PASS[^0-9]{0,30}?(\d+)\s+checks",
                          _read(doc), re.S)
        if hits:
            stated[doc] = {int(h) for h in hits}
    assert stated, "no doc states a parity check count anymore"
    all_counts = set().union(*stated.values())
    assert len(all_counts) == 1, f"docs disagree on parity count: {stated}"
    counts = _artifact("parity_counts.json")
    if counts is None:
        pytest.skip("parity tool not yet run (no parity_counts.json)")
    assert all_counts == {counts["checks"]}, (
        f"docs say {all_counts} checks but the tool measured "
        f"{counts['checks']} (evidence/parity_counts.json)")
    assert counts["pass"], "last recorded parity run FAILED"


def test_test_count_consistent():
    stated = {}
    for doc in ("README.md", "CLAUDE.md", "BASELINE.md"):
        hits = {int(h) for h in re.findall(
            r"(\d{3,4}) (?:tests|passed)", _read(doc))}
        if hits:
            stated[doc] = hits
    assert stated, "no doc states a test count anymore"
    all_counts = set().union(*stated.values())
    assert len(all_counts) == 1, f"docs disagree on test count: {stated}"
    art = _artifact("test_count.json")
    if art is None:
        pytest.skip("no full-suite run recorded yet (test_count.json)")
    # docs state "N tests (+1 env-gated skip)": N passed out of `collected`
    n = next(iter(all_counts))
    assert art["collected"] - 1 <= n <= art["collected"], (
        f"docs say {n} tests but the last full run collected "
        f"{art['collected']} (evidence/test_count.json)")
