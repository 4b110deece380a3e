"""Independent recount for gi1_activity_islands — its oracle restates
the same row_number-difference trick as the Spark plan (ORACLE
INDEPENDENCE policy, queries/__init__.py), so a shared boundary bug
(an off-by-one in the epoch-day arithmetic, a timezone shift in the
day truncation) would hash-match green. This reference scans each
user's sorted distinct active days and counts streaks directly."""

from __future__ import annotations

import duckdb


def _reference(rows):
    by_user: dict[int, set] = {}
    for u, d in rows:
        by_user.setdefault(int(u), set()).add(d)
    out = {}
    for u, ds in by_user.items():
        days = sorted(ds)
        n_islands, longest, run = 1, 1, 1
        for prev, cur in zip(days, days[1:]):
            if (cur - prev).days == 1:
                run += 1
            else:
                n_islands += 1
                run = 1
            longest = max(longest, run)
        out[u] = (n_islands, longest, days[0].isoformat())
    return out


def test_gi1_matches_streak_scan(spark):
    from big_data_analytics_spark.queries.cdc import gi1_activity_islands

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    rows = con.sql(
        f"SELECT DISTINCT user_id, CAST(ts AS DATE) "
        f"FROM '{sf}/events.parquet'").fetchall()
    want = _reference(rows)

    got = {int(r["user_id"]): (int(r["n_islands"]),
                               int(r["longest_streak"]),
                               r["first_active_day"])
           for r in gi1_activity_islands(spark, sf).collect()}
    assert got == want
