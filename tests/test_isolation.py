"""Isolation forest (M13 exact semantics): planted global anomalies
must outrank every inlier, scores obey the paper's range/meaning, and
the fit is seed-deterministic."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from big_data_analytics_spark.ml.isolation import (
    _c,
    isolation_forest_fit,
    isolation_forest_score,
)


@pytest.fixture(scope="module")
def planted(spark):
    """400 inliers ~ N(0, 1)² plus 8 far-out anomalies."""
    rng = np.random.default_rng(3)
    inl = rng.normal(0, 1, (400, 2))
    anom = rng.uniform(8, 12, (8, 2)) * rng.choice([-1, 1], (8, 2))
    rows = [(i, float(a), float(b)) for i, (a, b) in enumerate(inl)] + \
           [(1000 + i, float(a), float(b)) for i, (a, b) in enumerate(anom)]
    return spark.createDataFrame(rows, ["row_id", "f1", "f2"]).cache()


def test_anomalies_outrank_inliers(spark, planted):
    model = isolation_forest_fit(planted, ["f1", "f2"], n_trees=100, seed=11)
    scored = isolation_forest_score(model, planted, keep_cols=["row_id"])
    top8 = [r.row_id for r in
            scored.orderBy(F.desc("if_score")).limit(8).collect()]
    assert all(i >= 1000 for i in top8), top8
    # paper semantics: anomalies well above 0.5, inlier average below
    stats = scored.withColumn("is_anom", F.col("row_id") >= 1000) \
        .groupBy("is_anom").agg(F.avg("if_score").alias("m")).collect()
    means = {r.is_anom: r.m for r in stats}
    assert means[True] > 0.6 > means[False]


def test_scores_in_unit_interval(spark, planted):
    model = isolation_forest_fit(planted, ["f1", "f2"], n_trees=50, seed=5)
    scored = isolation_forest_score(model, planted)
    lohi = scored.agg(F.min("if_score"), F.max("if_score")).first()
    assert 0.0 < lohi[0] and lohi[1] <= 1.0


def test_fit_deterministic_under_seed(spark, planted):
    m1 = isolation_forest_fit(planted, ["f1", "f2"], n_trees=20, seed=7)
    m2 = isolation_forest_fit(planted, ["f1", "f2"], n_trees=20, seed=7)
    s1 = isolation_forest_score(m1, planted, keep_cols=["row_id"])
    s2 = isolation_forest_score(m2, planted, keep_cols=["row_id"])
    r1 = sorted((r.row_id, round(r.if_score, 12)) for r in s1.collect())
    r2 = sorted((r.row_id, round(r.if_score, 12)) for r in s2.collect())
    assert r1 == r2


def test_c_normalizer_closed_form():
    """c(n) = 2H(n−1) − 2(n−1)/n with the harmonic approximation the
    paper (and sklearn) use."""
    assert _c(1) == 0.0
    n = 256
    h = math.log(n - 1) + 0.5772156649015329
    assert _c(n) == pytest.approx(2 * h - 2 * (n - 1) / n)
    # a point isolated at depth c(psi) scores exactly 0.5
    assert 2 ** (-_c(256) / _c(256)) == 0.5
