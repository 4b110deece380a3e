"""Cost-complexity pruning (ml/pruning.py) — exact ccp_alpha semantics
on MLlib-fitted trees (reference BasicsDecisionTree.ipynb:807-840)."""

from __future__ import annotations

import pytest
from pyspark.ml.feature import VectorAssembler
from pyspark.ml.regression import DecisionTreeRegressor
from pyspark.sql import functions as F

from big_data_analytics_spark.ml.pruning import (
    cost_complexity_pruning_path,
    cv_ccp_prune,
    extract_tree,
    prune_at_alpha,
    refresh_stats,
    tree_predict_expr,
)

FEATURES = ["x1", "x2"]


@pytest.fixture(scope="module")
def noisy(spark):
    """Piecewise-constant signal + deterministic hash noise: a deep
    tree overfits the noise, so pruning has something real to cut."""
    return spark.range(2000).select(
        (F.col("id") % 40).cast("double").alias("x1"),
        (F.col("id") % 13).cast("double").alias("x2"),
    ).withColumn(
        "y",
        F.when(F.col("x1") < 20, 10.0).otherwise(50.0)
        + (F.pmod(F.xxhash64("x1", "x2"), F.lit(1000)) / 100.0),
    ).cache()


@pytest.fixture(scope="module")
def fitted(noisy):
    va = VectorAssembler(inputCols=FEATURES, outputCol="__f")
    assembled = va.transform(noisy)
    model = DecisionTreeRegressor(featuresCol="__f", labelCol="y",
                                  maxDepth=6, seed=1).fit(assembled)
    return model, assembled


def test_extracted_tree_matches_mllib_predictions(fitted, noisy):
    """The py4j mirror + CASE WHEN compilation must reproduce MLlib's
    own transform() predictions exactly (same splits, same leaves)."""
    model, assembled = fitted
    tree = extract_tree(model)
    expr = tree_predict_expr(tree, FEATURES)
    mismatch = (
        model.transform(assembled)
        .withColumn("__expr_pred", expr)
        .filter(F.abs(F.col("prediction") - F.col("__expr_pred")) > 1e-9)
        .count()
    )
    assert mismatch == 0


def test_pruning_path_shape(fitted):
    """Breiman path invariants: alphas strictly ordered from 0, risks
    nondecreasing (each collapse can only raise training risk), and
    the sequence ends at the root-only tree."""
    model, _ = fitted
    tree = extract_tree(model)
    alphas, risks = cost_complexity_pruning_path(tree)
    assert alphas[0] == 0.0
    assert all(a2 >= a1 - 1e-12 for a1, a2 in zip(alphas, alphas[1:]))
    assert all(r2 >= r1 - 1e-9 for r1, r2 in zip(risks, risks[1:]))
    assert len(alphas) == len(risks)


def test_prune_alpha_extremes(fitted):
    model, _ = fitted
    tree = extract_tree(model)
    assert prune_at_alpha(tree, 0.0).n_leaves() <= tree.n_leaves()
    assert prune_at_alpha(tree, float("inf")).n_leaves() == 1
    # pruned leaf count is monotone nonincreasing in alpha
    alphas, _ = cost_complexity_pruning_path(tree)
    leaves = [prune_at_alpha(tree, a).n_leaves() for a in alphas]
    assert all(l2 <= l1 for l1, l2 in zip(leaves, leaves[1:]))


def test_subtree_risk_is_training_mse(fitted, noisy):
    """For variance impurity, R(T) (summed weighted leaf impurities)
    IS the training MSE of the tree's predictions — the closed-form
    check that the risk bookkeeping is right."""
    model, assembled = fitted
    tree = refresh_stats(extract_tree(model), assembled, FEATURES, "y")
    _, risks = cost_complexity_pruning_path(tree)
    mse = (
        model.transform(assembled)
        .agg(F.avg(F.pow(F.col("prediction") - F.col("y"), 2)))
        .collect()[0][0]
    )
    assert risks[0] == pytest.approx(mse, rel=1e-6)


def test_cv_ccp_prune_selects_smaller_tree(noisy):
    """On signal+noise, CV must keep the signal splits and cut noise:
    the selected tree is smaller than the unpruned deep tree but still
    separates the two plateaus (x1<20 vs >=20)."""
    pruned, best_alpha, cv_mse = cv_ccp_prune(
        noisy, FEATURES, "y", max_depth=6, k=3, seed=17)
    assert best_alpha >= 0.0
    assert len(cv_mse) >= 2
    assert 1 <= pruned.n_leaves() < 64
    # the plateau split must survive: predictions differ across it
    expr = tree_predict_expr(pruned, FEATURES)
    got = (noisy.withColumn("__p", expr)
           .groupBy(F.col("x1") < 20).agg(F.avg("__p").alias("p"))
           .collect())
    preds = {bool(r[0]): r["p"] for r in got}
    assert abs(preds[True] - preds[False]) > 20
