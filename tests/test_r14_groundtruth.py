"""Round-14 ground-truth recounts (the oracle-independence rule from
queries/__init__.py): gov4's DuckDB oracle runs the SAME generated
CASE chain as the Spark side — deliberately, that is what makes the
two engines agree exactly — so a transcription bug in the chain
would hash-match green. This recount re-derives the release from the
MECHANISM'S DEFINITION in plain Python: literal class Counters, the
Knuth hash in Python ints, and an independently-written inverse-CDF
walk of the clamped geometric distribution."""

from __future__ import annotations

import math
from collections import Counter

import duckdb
import pytest

from tests.conftest import SF_CORRECT as SF


def test_gov4_matches_pure_python_geometric_mechanism(spark):
    from big_data_analytics_spark.queries.governance import (
        _DP_EPS_E3,
        _DP_GRID,
        _DP_K,
        _DP_KEY_MULT,
        _DP_KNUTH,
        _DP_MOD,
        gov4_dp_noisy_counts,
    )

    rows = duckdb.connect().execute(
        f"SELECT c_nationkey, CAST(FLOOR(c_acctbal / 1000.0) AS BIGINT) "
        f"FROM '{SF}/customer.parquet'").fetchall()
    counts: Counter = Counter(rows)

    # independently-written inverse CDF of the clamped geometric
    # mechanism (Ghosh et al. 2009): walk k = -K..K accumulating
    # P(k) = (1-a)/(1+a) * a^|k| with the tail mass folded into the
    # end bins, quantized to the grid the engines use
    a = math.exp(-_DP_EPS_E3 / 1000.0)
    p = [(1 - a) / (1 + a) * a ** abs(k)
         for k in range(-_DP_K, _DP_K + 1)]
    fold = (1.0 - sum(p)) / 2.0
    p[0] += fold
    p[-1] += fold

    def noise_of(u: int) -> int:
        cum = 0.0
        for k, pk in zip(range(-_DP_K, _DP_K + 1), p):
            cum += pk
            if u < int(cum * _DP_GRID):
                return k
        return _DP_K

    want = {}
    for (nat, band), n in counts.items():
        u = ((nat * _DP_KEY_MULT + band) * _DP_KNUTH % _DP_MOD
             + _DP_MOD) % _DP_MOD // 32
        z = noise_of(u)
        want[(nat, band)] = (n, z, max(n + z, 0))

    got = {(r["c_nationkey"], r["bal_band"]):
           (int(r["n"]), int(r["noise"]), int(r["noisy_n"]))
           for r in gov4_dp_noisy_counts(spark, SF).collect()}
    assert got == want

    # mechanism sanity on the fixture: noise is bounded by the clamp,
    # both signs occur (a constant-noise bug would pass the equality
    # above only if the recount shared it — this is the cheap
    # independent signal), and the clamp keeps releases non-negative
    zs = [z for _, z, _ in got.values()]
    assert all(-_DP_K <= z <= _DP_K for z in zs)
    assert any(z > 0 for z in zs) and any(z < 0 for z in zs)
    assert all(nn >= 0 for _, _, nn in got.values())
    # empirical spread should look geometric-ish, not uniform: the
    # majority of classes get |noise| <= 2 (true mass ~0.84 at eps=1)
    frac_small = sum(abs(z) <= 2 for z in zs) / len(zs)
    assert frac_small > 0.6, frac_small
