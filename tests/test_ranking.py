"""operators/ranking.py — stitched global ranking primitives.

Each helper must reproduce the naive total-order window EXACTLY
(same rows, same values) while planning only bucket-partitioned
windows over the data; the equivalence here is the correctness
contract the sh1/ec1/seg1/oc1 rewrites rely on."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from big_data_analytics_spark.operators.ranking import (
    stitched_cumsum,
    stitched_ntile,
    stitched_row_number,
)


@pytest.fixture(scope="module")
def skewed(spark):
    # heavy ties (50 distinct keys over 5000 rows) + a signed value:
    # exercises tie-straddling buckets, duplicate percentile bounds,
    # and negative cumsum paths in one fixture
    rng = random.Random(7)
    rows = [(i, rng.randint(0, 50), rng.choice([-1, 1]))
            for i in range(5000)]
    return spark.createDataFrame(rows, "id long, v long, d long")


def _same(a, b) -> bool:
    return a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_row_number_matches_naive(skewed):
    naive = skewed.select(
        "id", F.row_number().over(Window.orderBy("v", "id")).cast("long")
        .alias("rn"))
    st = stitched_row_number(skewed, "v", ["id"], out="rn",
                             num_buckets=16).select("id", "rn")
    assert _same(naive, st)


def test_row_number_total_col(skewed):
    st = stitched_row_number(skewed, "v", ["id"], out="rn",
                             total_col="n", num_buckets=16)
    assert st.select("n").distinct().collect()[0][0] == 5000


@pytest.mark.parametrize("k", [5, 7, 100, 6000])
def test_ntile_matches_naive(skewed, k):
    # k=6000 > n exercises the q=0 edge (every tile size 0 or 1)
    naive = skewed.select(
        "id", F.ntile(k).over(Window.orderBy("v", "id")).cast("long")
        .alias("t"))
    st = stitched_ntile(skewed, k, "v", ["id"], out="t",
                        num_buckets=16).select("id", "t")
    assert _same(naive, st)


def test_ntile_rejects_bad_k(skewed):
    with pytest.raises(ValueError):
        stitched_ntile(skewed, 0, "v", ["id"])


def test_cumsum_matches_naive(skewed):
    w = (Window.orderBy("v", "id")
         .rowsBetween(Window.unboundedPreceding, 0))
    naive = skewed.select(
        "id", F.sum("d").over(w).cast("long").alias("c"))
    st = stitched_cumsum(skewed, "v", ["id"], val="d", out="c",
                         num_buckets=16).select("id", "c")
    assert _same(naive, st)


def test_bucket_expr_skips_bounds_pass(skewed):
    """Caller-supplied monotone bucketing (uniform-hash path) must
    produce identical tiles and plan no percentile aggregate."""
    st = stitched_ntile(skewed, 10, "v", ["id"], out="t",
                        bucket_expr=F.expr("v DIV 8"))
    naive = skewed.select(
        "id", F.ntile(10).over(Window.orderBy("v", "id")).cast("long")
        .alias("t"))
    assert _same(naive, st.select("id", "t"))
    plan = st._jdf.queryExecution().optimizedPlan().toString()
    assert "percentile_approx" not in plan


def test_windows_bucket_partitioned(skewed):
    """The data-grain window must be partitioned by the bucket id;
    the only ordering-only window runs over the bucket totals."""
    st = stitched_row_number(skewed, "v", ["id"], out="rn",
                             num_buckets=16)
    plan = st._jdf.queryExecution().executedPlan().toString()
    import re
    nodes = re.findall(r"Window \[[^\n]+", plan)
    assert any("windowspecdefinition(__srk_bkt#" in n for n in nodes)
    for n in nodes:
        if re.search(r"windowspecdefinition\(\w+#\d+L? (?:ASC|DESC)", n):
            assert "__srk_b" in n


def test_single_row_and_all_ties(spark):
    """Degenerate shapes: one row; all keys equal (every row in one
    bucket — the documented low-cardinality worst case must still be
    exact)."""
    one = spark.createDataFrame([(7, 1)], "id long, v long")
    r = stitched_row_number(one, "v", ["id"], out="rn").collect()
    assert r[0]["rn"] == 1
    import pyspark.sql.functions as SF

    ties = spark.range(100).select(
        SF.col("id"), SF.lit(5).alias("v"))
    naive = ties.select(
        "id", SF.ntile(7).over(Window.orderBy("v", "id")).cast("long")
        .alias("t"))
    st = stitched_ntile(ties, 7, "v", ["id"], out="t",
                        num_buckets=8).select("id", "t")
    assert _same(naive, st)


def test_negative_and_extreme_keys(spark):
    """Signed keys spanning the long range must bucket monotonically
    (the boundary comparison is plain long ordering)."""
    rows = [(i, v) for i, v in enumerate(
        [-(1 << 62), -5, -5, 0, 3, (1 << 62), 7, -1, 0, 12])]
    df = spark.createDataFrame(rows, "id long, v long")
    naive = df.select(
        "id", F.row_number().over(Window.orderBy("v", "id")).cast("long")
        .alias("rn"))
    st = stitched_row_number(df, "v", ["id"], out="rn",
                             num_buckets=4).select("id", "rn")
    assert _same(naive, st)


def test_tie_bucket_matches_naive(skewed):
    """Heavy-tie composite bucketing must reproduce the naive window
    exactly, for row_number, ntile, and cumsum."""
    naive_rn = skewed.select(
        "id", F.row_number().over(Window.orderBy("v", "id")).cast("long")
        .alias("rn"))
    st_rn = stitched_row_number(skewed, "v", ["id"], out="rn",
                                num_buckets=8, tie_bucket=True
                                ).select("id", "rn")
    assert _same(naive_rn, st_rn)
    naive_t = skewed.select(
        "id", F.ntile(5).over(Window.orderBy("v", "id")).cast("long")
        .alias("t"))
    st_t = stitched_ntile(skewed, 5, "v", ["id"], out="t",
                          num_buckets=8, tie_bucket=True
                          ).select("id", "t")
    assert _same(naive_t, st_t)
    w = (Window.orderBy("v", "id")
         .rowsBetween(Window.unboundedPreceding, 0))
    naive_c = skewed.select(
        "id", F.sum("d").over(w).cast("long").alias("c"))
    st_c = stitched_cumsum(skewed, "v", ["id"], val="d", out="c",
                           num_buckets=8, tie_bucket=True
                           ).select("id", "c")
    assert _same(naive_c, st_c)


def test_tie_bucket_splits_tie_runs(spark):
    """A constant key (one giant tie run) must split into multiple
    buckets under tie_bucket — the whole point: without it every row
    lands in one bucket/task."""
    import pyspark.sql.functions as SF

    from big_data_analytics_spark.operators.ranking import (
        _BKT,
        _with_bucket,
    )

    df = spark.range(1000).select(SF.lit(1).alias("v"),
                                  SF.col("id").alias("id"))
    b = _with_bucket(df, "v", 8, None, tie_bucket_col="id")
    n_buckets = b.select(_BKT).distinct().count()
    assert n_buckets >= 4, n_buckets
    plain = _with_bucket(df, "v", 8, None)
    assert plain.select(_BKT).distinct().count() == 1


def test_tie_bucket_requires_tiebreak(skewed):
    with pytest.raises(ValueError):
        stitched_row_number(skewed, "v", out="rn", tie_bucket=True)


def test_stitched_cumsum_rejects_fractional_val(spark):
    """The integral-val contract is enforced at plan time: a double
    val column would truncate per bucket (bucket-boundary-dependent
    results), so it must raise, not silently mis-sum."""
    from big_data_analytics_spark.operators.ranking import stitched_cumsum

    df = spark.range(10).selectExpr("id AS k", "id * 0.5 AS v")
    with pytest.raises(TypeError, match="integral"):
        stitched_cumsum(df, "k", val="v")
