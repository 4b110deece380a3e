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

    The vintage map reads GIT-TRACKED correctness artifacts only
    (r14 ADVICE): the driver drops CORRECTNESS_r{N}.json AFTER the
    round's final commit, so an untracked artifact describes a
    grading of the PREVIOUS tree — counting it would flip this guard
    red on every freshly-graded checkout before the builder has had
    any chance to rotate. Committing the artifact (the driver does,
    at round start) re-arms the guard for the next rotation, so the
    forcing function survives; it just fires at commit/round
    boundaries instead of mid-grading. Untracked artifacts are named
    in a warning so the pending cohort is visible.

    Escape hatch (r14 ADVICE): a future oldest cohort larger than
    the head's fill capacity (50 slots minus canaries and
    never-graded adds) cannot fit in one round. In that case the
    guard demands the head be PACKED with oldest-vintage rows up to
    capacity — a deliberate multi-round split — instead of full
    coverage, which would be unsatisfiable without editing the test.
    """
    import glob
    import subprocess
    import warnings

    from big_data_analytics_spark.queries import GRADE_HEAD, load_all

    reg = load_all()
    all_artifacts = sorted(glob.glob(os.path.join(REPO,
                                                  "CORRECTNESS_r*.json")))
    try:
        tracked = set(subprocess.run(
            ["git", "ls-files", "CORRECTNESS_r*.json"], cwd=REPO,
            capture_output=True, text=True, check=True,
        ).stdout.split())
    except (OSError, subprocess.CalledProcessError):
        tracked = None  # not a git checkout: grade everything present
    paths, pending = [], []
    for path in all_artifacts:
        if tracked is not None and os.path.basename(path) not in tracked:
            pending.append(os.path.basename(path))
        else:
            paths.append(path)
    if pending:
        warnings.warn(
            f"ignoring untracked driver artifact(s) {pending} — they "
            f"grade a previous tree; commit them and rotate GRADE_HEAD "
            f"to the cohort they age out", stacklevel=1)
    last = {}
    for path in paths:
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
    never = sorted(n for n in oracled if n not in last)
    missing_stale = [n for n in stale if n not in GRADE_HEAD]
    # Fill capacity: head slots minus the two standing canaries and
    # the never-graded adds the head must also absorb. A cohort
    # bigger than this is split across rounds (packed head), not
    # demanded whole (unsatisfiable).
    capacity = len(GRADE_HEAD) - 2 - len(never)
    if len(stale) > capacity:
        in_head = len(stale) - len(missing_stale)
        assert in_head >= capacity, (
            f"oldest vintage r{oldest:02d} has {len(stale)} rows — "
            f"larger than the head's fill capacity ({capacity}); the "
            f"head must be PACKED with oldest-vintage rows "
            f"(found {in_head}) so the split completes in the fewest "
            f"rounds")
    else:
        assert not missing_stale, (
            f"oldest vintage r{oldest:02d} rows not in GRADE_HEAD: "
            f"{missing_stale} — the head must retire the whole oldest "
            f"cohort each round (cohorts larger than the head's fill "
            f"capacity are split automatically by the packed-head "
            f"branch above)")
    missing_new = [n for n in never if n not in GRADE_HEAD]
    assert not missing_new, (
        f"never-graded queries not in GRADE_HEAD: {missing_new} — "
        f"additions must be graded in their own round")


def test_rotation_guard_ignores_untracked_artifacts():
    """The guard above must be immune to a driver artifact that lands
    AFTER the final commit (r14 ADVICE: the r14 file flipped the guard
    red on the as-delivered tree through no fault of the tree). Drop a
    deliberately poisonous UNTRACKED artifact — a far-future round
    that grades only one non-head query, which would otherwise make
    that query the unique newest vintage and every real query stale —
    and assert the guard still passes (warning, not failure)."""
    import warnings

    poison = os.path.join(REPO, "CORRECTNESS_r98.json")
    assert not os.path.exists(poison)
    try:
        with open(poison, "w") as f:
            json.dump({"a1_pricing_summary": {
                "rows_match": True, "schema_match": True,
                "hash_match": True, "spark_rows": 6,
                "oracle_rows": 6, "err": None}}, f)
        with warnings.catch_warnings(record=True) as caught:
            warnings.simplefilter("always")
            test_rotation_retires_the_oldest_vintage()
        assert any("CORRECTNESS_r98.json" in str(w.message)
                   for w in caught), (
            "untracked artifact should be skipped WITH a warning "
            "naming it")
    finally:
        os.remove(poison)


def test_box_factor_null_snapshot_omits_not_crashes():
    """r14 ADVICE: a committed snapshot with "fixed_total": null (or a
    non-numeric sf) must make _box_factor return None — omitting the
    box fields as documented — not TypeError the whole bench run."""
    import json as _json
    from unittest import mock

    import bench

    for doc in ({"fixed_total": None, "sf": 0.1},
                {"fixed_total": 9.7, "sf": None},
                {"fixed_total": "n/a", "sf": 0.1}):
        with mock.patch.object(_json, "load", return_value=doc):
            assert bench._box_factor(9.7, 0.1) is None
