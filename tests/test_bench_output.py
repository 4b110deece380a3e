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
