"""Independent imperative recounts for round-13 additions (ORACLE
INDEPENDENCE policy, queries/__init__.py): gov3 t-closeness. The
recount re-derives every class's TVD from the raw parquet in plain
Python (Counter + Fraction — exact rational arithmetic, no floor
tricks shared with either engine), so a shared Spark/oracle
formulation bug cannot hash-match green.
"""

import math
from collections import Counter
from fractions import Fraction

import duckdb

SF = "/root/testdata/sf0.001"


def test_gov3_matches_pure_python_tvd(spark):
    from big_data_analytics_spark.queries.governance import (
        _T_CLOSE_Q,
        gov3_t_closeness,
    )

    rows = duckdb.connect().execute(
        f"SELECT c_nationkey, c_acctbal, c_mktsegment "
        f"FROM '{SF}/customer.parquet'").fetchall()
    n_total = len(rows)
    glob = Counter(seg for _, _, seg in rows)
    cls_seg: Counter = Counter()
    cls_n: Counter = Counter()
    for nk, bal, seg in rows:
        band = math.floor(bal / 1000.0)
        cls_seg[(nk, band, seg)] += 1
        cls_n[(nk, band)] += 1

    want = {}
    for (nk, band), n in cls_n.items():
        tvd = Fraction(0)
        for seg, g in glob.items():
            p = Fraction(cls_seg.get((nk, band, seg), 0), n)
            q = Fraction(g, n_total)
            tvd += abs(p - q)
        tvd = tvd / 2
        tvd_q = (tvd.numerator * 10**9) // tvd.denominator
        want[(nk, band)] = (n, tvd_q, tvd_q <= _T_CLOSE_Q)

    got = {(int(r["c_nationkey"]), int(r["bal_band"])): (
        int(r["n"]), int(r["tvd_q"]), bool(r["is_t_close"]))
        for r in gov3_t_closeness(spark, SF).collect()}
    assert got == want
    # sanity: the fixture exercises both verdicts or at least has
    # classes (a degenerate all-true fixture would not prove the
    # threshold comparison runs)
    assert len(got) > 10
