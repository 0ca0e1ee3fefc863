"""Docs-vs-artifacts consistency checker (VERDICT r4 #3).

Round 4 shipped a BASELINE.md citing 7 CSV rows while the committed CSV
held 1.  This test pins every headline number quoted in
README/BASELINE/PERF to the artifact it cites: each CLAIM names the doc,
a regex capturing the quoted number(s), the artifact file, and how to
read the same quantity from it.  Regenerating artifacts without
updating the docs (or vice versa) fails the suite.

The claims are curated, not scraped — add one when a doc gains a
load-bearing number.  Tolerance is relative (quoted numbers are rounded
prose; artifacts are exact).
"""

import csv
import json
import os
import re

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _csv_cell(path, row_key, col):
    with open(os.path.join(REPO, path)) as f:
        for r in csv.DictReader(f):
            if r.get("data") == row_key:
                return float(r[col])
    raise AssertionError(f"{path}: no row {row_key!r}")


def _json_field(path, *keys):
    with open(os.path.join(REPO, path)) as f:
        txt = f.read()
    # Epoch files may hold several JSON lines; use the last object.
    obj = None
    for line in txt.strip().splitlines():
        line = line.strip()
        if line.startswith("{"):
            try:
                obj = json.loads(line)
            except json.JSONDecodeError:
                pass
    assert obj is not None, f"{path}: no JSON object"
    for k in keys:
        obj = obj[k]
    return float(obj)


# (doc, regex with float groups, [(artifact getter, tolerance)...])
# A getter is a 0-arg lambda returning the artifact value for the
# corresponding regex group, in order.
CLAIMS = [
    (
        "BASELINE.md",
        r"rmat20 \(31\.4M edges\) \*\*([\d.]+)/([\d.]+) GF/s\*\*",
        [
            (lambda: _csv_cell("bench_results/spmm_sweep.csv", "rmat20",
                               "K=128-tiled-gflops"), 0.02),
            (lambda: _csv_cell("bench_results/spmm_sweep.csv", "rmat20",
                               "K=128-tiled-hilo-gflops"), 0.02),
        ],
    ),
    (
        "README.md",
        r"rmat-20 \(31\.4M\s*\nedges\) ([\d.]+)–([\d.]+) GF/s",
        [
            (lambda: _csv_cell("bench_results/spmm_sweep.csv", "rmat20",
                               "K=128-tiled-gflops"), 0.03),
            (lambda: _csv_cell("bench_results/spmm_sweep.csv", "rmat20",
                               "K=128-tiled-hilo-gflops"), 0.03),
        ],
    ),
]


@pytest.mark.parametrize(
    "doc,pattern,getters",
    CLAIMS,
    ids=[f"{d}:{p[:30]}" for d, p, _ in CLAIMS],
)
def test_doc_numbers_trace_to_artifacts(doc, pattern, getters):
    with open(os.path.join(REPO, doc)) as f:
        text = f.read()
    m = re.search(pattern, text)
    if m is None:
        pytest.fail(
            f"{doc}: claim pattern {pattern!r} no longer matches — the "
            "doc text changed; update the CLAIMS entry in this test"
        )
    assert len(m.groups()) == len(getters), (
        f"{doc}: {len(m.groups())} captured numbers vs "
        f"{len(getters)} artifact getters"
    )
    for i, (getter, tol) in enumerate(getters):
        quoted = float(m.group(i + 1))
        actual = getter()
        rel = abs(quoted - actual) / max(abs(actual), 1e-9)
        assert rel <= tol, (
            f"{doc} quotes {quoted} (group {i + 1} of {pattern!r}) but "
            f"the cited artifact holds {actual} (rel diff {rel:.3f} > "
            f"{tol}) — regenerate with scripts/round5_measure.sh and "
            "update the doc, or fix the claim"
        )
