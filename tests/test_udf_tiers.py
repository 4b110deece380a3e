"""UDF tiers: tier-2/3 must agree with tier-1 closed forms on the
overlap (the reason tier 1 is the default)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from big_data_analytics_spark.catalog import load_table
from big_data_analytics_spark.functions.udf_tiers import (
    grouped_ols,
    salary_score_expr,
    sigmoid_expr,
    sigmoid_pandas,
)
from tests.conftest import SF_CORRECT


def test_sigmoid_tiers_agree(spark):
    df = spark.range(-50, 50).select((F.col("id") / 10.0).alias("x"))
    both = df.select(
        sigmoid_expr(F.col("x")).alias("expr"),
        sigmoid_pandas(F.col("x")).alias("pandas"),
    )
    assert both.filter(F.abs(F.col("expr") - F.col("pandas")) > 1e-12).count() == 0


def test_sigmoid_bounds(spark):
    df = spark.range(-1000, 1000, 100).select(F.col("id").cast("double").alias("x"))
    vals = [r.s for r in df.select(sigmoid_expr(F.col("x")).alias("s")).collect()]
    assert all(0.0 <= v <= 1.0 for v in vals)


def test_salary_score_is_linear(spark):
    df = spark.createDataFrame([(2.0,), (4.0,)], ["gpa"])
    got = [r.s for r in df.select(salary_score_expr(F.col("gpa")).alias("s")).collect()]
    assert got == [30000.0, 40000.0]


def test_grouped_ols_matches_regr_slope(spark):
    """Tier 3 (applyInPandas refit) == tier 1 (regr_slope aggregate)."""
    li = load_table(spark, SF_CORRECT, "lineitem").limit(20000)
    tier1 = {
        r.l_returnflag: (r.slope, r.intercept)
        for r in li.groupBy("l_returnflag").agg(
            F.regr_slope("l_extendedprice", "l_quantity").alias("slope"),
            F.regr_intercept("l_extendedprice", "l_quantity").alias("intercept"),
        ).collect()
    }
    tier3 = {
        r.l_returnflag: (r.slope, r.intercept, r.n)
        for r in grouped_ols(li, ["l_returnflag"], "l_quantity",
                             "l_extendedprice").collect()
    }
    assert set(tier1) == set(tier3)
    for k in tier1:
        assert tier3[k][0] == pytest.approx(tier1[k][0], rel=1e-9)
        assert tier3[k][1] == pytest.approx(tier1[k][1], rel=1e-9)
