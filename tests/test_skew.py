"""Skew operators: salted plans must produce bit-identical results to
the plain plans (the salt may only move work, never change answers)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from big_data_analytics_spark.catalog import load_table
from big_data_analytics_spark.operators.skew import (
    replicate_for_skew_join,
    salted_sum_count,
    with_join_salt,
)
from tests.conftest import SF_CORRECT


@pytest.fixture(scope="module")
def skewed(spark):
    """90% of rows share one key — the shape AQE's stats can miss in a
    groupBy."""
    hot = spark.range(90_000).select(
        F.lit("hot").alias("k"), (F.col("id") % 100).cast("double").alias("v"))
    cold = spark.range(10_000).select(
        F.concat(F.lit("cold"), (F.col("id") % 500).cast("string")).alias("k"),
        (F.col("id") % 7).cast("double").alias("v"))
    return hot.unionByName(cold).cache()


def test_salted_aggregate_exact(skewed):
    got = {r.k: (r.sum_v, r["count"])
           for r in salted_sum_count(skewed, ["k"], "v", n_salts=16).collect()}
    exp = {r.k: (r.s, r.c)
           for r in skewed.groupBy("k").agg(
               F.sum("v").alias("s"), F.count(F.lit(1)).alias("c")).collect()}
    assert set(got) == set(exp)
    for k in exp:
        assert got[k][1] == exp[k][1]                    # counts exact
        assert got[k][0] == pytest.approx(exp[k][0])     # sums (fp merge)


def test_salted_join_exact(spark, skewed):
    dim = spark.createDataFrame(
        [("hot", "H")] + [(f"cold{i}", f"C{i}") for i in range(500)],
        ["k", "label"])
    n_salts = 8
    big = with_join_salt(skewed, n_salts)
    small = replicate_for_skew_join(dim, n_salts)
    salted = (
        big.join(small, ["k", "__salt"])
        .groupBy("label").agg(F.count(F.lit(1)).alias("n"))
    )
    plain = (
        skewed.join(dim, "k").groupBy("label").agg(F.count(F.lit(1)).alias("n"))
    )
    got = {r.label: r.n for r in salted.collect()}
    exp = {r.label: r.n for r in plain.collect()}
    assert got == exp


def test_approx_count_distinct_tolerance(spark):
    """SURVEY §2.4: approximate distinct available built-in; HLL at
    rsd=0.02 must land within 5% of exact on 15k distinct keys."""
    o = load_table(spark, SF_CORRECT, "orders")
    exact = o.select("o_orderkey").distinct().count()
    approx = o.agg(
        F.approx_count_distinct("o_orderkey", rsd=0.02).alias("a")).first().a
    assert abs(approx - exact) / exact < 0.05
