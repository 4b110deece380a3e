"""Guards for the two round-artifact contracts that went stale
silently in rounds 6-7:

- the bench JSON line must fit the driver's 2000-char stdout tail
  capture (BENCH_r06/r07 were recorded with the line's head cut off
  — ``parsed: null`` — because the line outgrew the window), and
- README's registry counts must match the actual registry (they sat
  one behind for two rounds).

Both tests are pure-python (no SparkSession) so they run in the
fast ``-m "not oracle"`` loop.
"""

from __future__ import annotations

import json
import os
import re

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

#: The driver records the last 2000 chars of bench.py's stdout and
#: parses them; leave margin for a stray newline / log line.
TAIL_BUDGET = 1900


def test_bench_line_fits_tail_capture():
    """Build the summary line exactly as bench.main() prints it, with
    worst-case-width dummy values, and assert it fits the capture
    window. Fails at test time — not two rounds later in a verdict —
    when a query added to HEADLINE/FIXED pushes the line over."""
    import bench

    # the printed line rounds per-query values to 2 decimals and
    # carries the HEADLINE set only (FIXED rides fixed_total; all
    # 3-decimal detail lives in BENCH_FULL.json) — mirror that here.
    # Worst-case per-query width is 99.99: any single headline query
    # crossing 100 s would itself be a flagged 20x regression long
    # before the line budget mattered.
    dummy = {n: 99.99 for n in bench.HEADLINE}
    line = json.dumps({
        "metric": "headline_queries_total_wall_clock",
        "value": 12345.678,
        "unit": "sec",
        "core_total": 12345.678,
        "extended_total": 12345.678,
        "fixed_total": 12345.678,
        "common_subset_total": 12345.678,
        "cold_total": 12345.678,
        "freshness_oldest": "never:289",
        # box calibration rides the line under compact keys (box ==
        # fixed_vs_committed, norm == value / box; long names are in
        # BENCH_FULL.latest.json) precisely to fit this budget
        "box": 12.34,
        "norm": 12345.68,
        "queries": dummy,
        "sf": 0.01,
    }, separators=(",", ":"))
    assert len(line) <= TAIL_BUDGET, (
        f"bench summary line is {len(line)} bytes > {TAIL_BUDGET}: it "
        "will be truncated in the driver's 2000-char tail capture and "
        "recorded as parsed:null. Move per-query detail for the new "
        "entries into BENCH_FULL.json (or shorten query names).")


def test_bench_lists_are_registered_and_disjoint():
    import bench
    from big_data_analytics_spark.queries import load_all

    reg = load_all()
    missing = [n for n in bench.HEADLINE + bench.FIXED + bench.COLD
               if n not in reg]
    assert not missing, f"bench names not in registry: {missing}"
    overlap = set(bench.HEADLINE) & set(bench.FIXED)
    assert not overlap, f"queries in both HEADLINE and FIXED: {overlap}"
    assert bench.R7_SET <= set(bench.HEADLINE), (
        "common-subset anchor names must stay in HEADLINE")


def test_readme_registry_counts_match():
    """README advertises the registry size; generate-don't-handwrite:
    the numbers in README must equal len(load_all()) and the oracled
    subset, or this fails naming both."""
    from big_data_analytics_spark.queries import load_all

    reg = load_all()
    n_total = len(reg)
    n_oracled = sum(1 for q in reg.values() if q.oracle is not None)

    text = open(os.path.join(REPO, "README.md")).read()
    m_total = re.search(r"(\d+) named queries", text)
    m_orc = re.search(r"(\d+)-query DuckDB correctness gate", text)
    assert m_total and m_orc, "README registry-count sentences missing"
    assert int(m_total.group(1)) == n_total, (
        f"README says {m_total.group(1)} named queries; registry has "
        f"{n_total} — update README.md")
    assert int(m_orc.group(1)) == n_oracled, (
        f"README says a {m_orc.group(1)}-query oracle gate; registry "
        f"has {n_oracled} oracled queries — update README.md")


def test_freshness_histogram_covers_registry():
    """The freshness histogram (VERDICT r12 task 5) must account for
    every registry query exactly once, and its oldest-vintage pair —
    the compact form that rides the bench line — must agree with the
    histogram it summarizes."""
    import bench
    from big_data_analytics_spark.queries import load_all

    reg = load_all()
    fresh = bench._freshness(reg)
    assert sum(fresh["hist"].values()) == len(reg)
    assert fresh["oldest_n"] == fresh["hist"][fresh["oldest"]]
    graded = [k for k in fresh["hist"] if k != "never"]
    if "never" not in fresh["hist"]:
        assert fresh["oldest"] == min(graded)


def test_box_factor_reads_committed_snapshot():
    """The box calibration (VERDICT r13 task 3) must be computed from
    the COMMITTED BENCH_FULL.json snapshot — not the untracked .latest
    file, not a historical BENCH_r*.json — and must return None rather
    than a guess when the snapshot can't anchor it (different sf)."""
    import bench

    with open(os.path.join(REPO, "BENCH_FULL.json")) as f:
        committed = json.load(f)
    sf = committed["sf"]
    anchor = float(committed["fixed_total"])
    # a run that reproduces the committed fixed_total exactly is, by
    # definition, on a committed-equivalent box: factor 1.0
    assert bench._box_factor(anchor, sf) == 1.0
    # a run 1.28x hotter (the r13 driver-box episode) reads as 1.28
    assert bench._box_factor(round(anchor * 1.28, 3), sf) == pytest.approx(
        1.28, abs=0.01)
    # sf mismatch -> no anchor -> None (fields omitted, never guessed)
    assert bench._box_factor(anchor, sf * 10) is None


def test_box_normalized_headline_derivation():
    """value_box_normalized must be exactly value / fixed_vs_committed
    — derived, not independently measured — so the two fields can
    never drift apart. Checked on the summary-construction arithmetic
    (pure python; the full bench run is the driver's job)."""
    value, box = 71.25, 1.283
    assert round(value / box, 3) == pytest.approx(55.534, abs=0.001)


def test_rotation_retires_the_oldest_vintage():
    """Rotation-capacity guard (VERDICT r13 task 7): 293 queries / 50
    graded slots means per-query driver evidence ages ~6 rounds per
    cycle, and that only stays bounded if every round's head retires
    the ENTIRE oldest vintage and grades every never-graded addition.
    This rebuilds the per-query vintage map exactly as bench._freshness
    does and asserts:

    1. every query whose driver evidence is at the oldest vintage sits
       in GRADE_HEAD (so freshness_oldest strictly advances when the
       round comes back green), and
    2. every never-graded oracled query sits in GRADE_HEAD (so
       registry additions can never outpace retirement — the head must
       absorb each add in its own round, which caps additions at
       50 minus the rotation debt and makes over-adding fail HERE at
       commit time instead of two rounds later in a verdict).
    """
    import glob

    from big_data_analytics_spark.queries import GRADE_HEAD, load_all

    reg = load_all()
    last = {}
    for path in sorted(glob.glob(os.path.join(REPO,
                                              "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        rnd = int(m.group(1))
        with open(path) as f:
            doc = json.load(f)
        for name, row in doc.items():
            if isinstance(row, dict) and not row.get("err") and (
                    row.get("hash_match") or row.get("rows_match")):
                last[name] = max(last.get(name, 0), rnd)

    oracled = {n for n, q in reg.items() if q.oracle is not None}
    graded_vintages = sorted(last[n] for n in oracled if n in last)
    assert graded_vintages, "no driver evidence at all?"
    oldest = graded_vintages[0]
    stale = sorted(n for n in oracled if last.get(n) == oldest)
    missing_stale = [n for n in stale if n not in GRADE_HEAD]
    assert not missing_stale, (
        f"oldest vintage r{oldest:02d} rows not in GRADE_HEAD: "
        f"{missing_stale} — the head must retire the whole oldest "
        f"cohort each round (or split it across consecutive rounds by "
        f"updating this guard deliberately, not by accident)")
    never = sorted(n for n in oracled if n not in last)
    missing_new = [n for n in never if n not in GRADE_HEAD]
    assert not missing_new, (
        f"never-graded queries not in GRADE_HEAD: {missing_new} — "
        f"additions must be graded in their own round")
