"""Tree ensembles, TF-IDF pipeline, CV grid search (M7-M9, M14, M17)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from big_data_analytics_spark.catalog import load_table
from big_data_analytics_spark.ml import evaluate
from big_data_analytics_spark.ml.trees import (
    decision_tree_classifier,
    gbt_regressor,
    grid_search_cv,
    random_forest_regressor,
    tfidf_sentiment_pipeline,
)
from tests.conftest import SF_CORRECT


@pytest.fixture(scope="module")
def carseats_like(spark):
    """Nonlinear regression target with one dominant feature (the
    Carseats/Boston role)."""
    rng = np.random.default_rng(12)
    n = 800
    x1 = rng.uniform(0, 10, n)
    x2 = rng.uniform(0, 10, n)
    x3 = rng.normal(0, 1, n)          # noise feature
    y = np.where(x1 > 5, 10 + 2 * x2, 2 + 0.5 * x2) + rng.normal(0, 1, n)
    df = spark.createDataFrame(
        [(float(a), float(b), float(c), float(t))
         for a, b, c, t in zip(x1, x2, x3, y)],
        ["x1", "x2", "x3", "y"])
    return df.cache()


def test_decision_tree_classifier_splits_signal(spark):
    rng = np.random.default_rng(5)
    n = 600
    x = rng.uniform(-1, 1, (n, 2))
    y = (x[:, 0] > 0.1).astype(int)   # axis-aligned split: tree-perfect
    df = spark.createDataFrame(
        [(float(a), float(b), int(t)) for (a, b), t in zip(x, y)],
        ["f1", "f2", "label"])
    model, predict = decision_tree_classifier(df, ["f1", "f2"], "label",
                                              max_depth=3)
    pred = predict(df)
    acc = pred.filter(F.col("label") == F.col("prediction")).count() / n
    assert acc > 0.97
    assert model.depth <= 3


def test_random_forest_feature_importance(carseats_like):
    model, predict = random_forest_regressor(
        carseats_like, ["x1", "x2", "x3"], "y", num_trees=60,
        feature_subset="all")  # featureSubsetStrategy='all' == bagging
    imp = list(model.featureImportances.toArray())
    # x1 (the split driver) must dominate the noise feature x3
    assert imp[0] > imp[2]
    m = evaluate.regression_metrics(predict(carseats_like), label="y")
    assert m["rmse"] < 3.0


def test_gbt_beats_single_tree(carseats_like):
    from big_data_analytics_spark.ml.trees import decision_tree_regressor
    _, dt_pred = decision_tree_regressor(carseats_like, ["x1", "x2", "x3"],
                                         "y", max_depth=2)
    _, gbt_pred = gbt_regressor(carseats_like, ["x1", "x2", "x3"], "y",
                                max_iter=30, max_depth=3)
    dt_rmse = evaluate.regression_metrics(dt_pred(carseats_like), label="y")["rmse"]
    gbt_rmse = evaluate.regression_metrics(gbt_pred(carseats_like), label="y")["rmse"]
    assert gbt_rmse < dt_rmse


def test_tfidf_pipeline_on_documents(spark):
    """Synthetic sentiment: label = contains a planted token; the
    TF-IDF + logistic pipeline must learn it."""
    docs = load_table(spark, SF_CORRECT, "documents").limit(300)
    labeled = docs.withColumn(
        "label",
        F.when(F.col("doc_id") % 2 == 0,
               F.lit(1)).otherwise(F.lit(0)))
    # plant the signal token into positive docs
    labeled = labeled.withColumn(
        "text",
        F.when(F.col("label") == 1,
               F.concat(F.col("text"), F.lit(" excellent excellent")))
        .otherwise(F.col("text")))
    model = tfidf_sentiment_pipeline().fit(labeled)
    pred = model.transform(labeled)
    acc = pred.filter(F.col("label") == F.col("prediction")).count() / 300
    assert acc > 0.95
    # vocabulary is bounded as configured
    cv_model = model.stages[2]
    assert len(cv_model.vocabulary) <= 500


def test_grid_search_cv_picks_capacity(carseats_like):
    best_model, best_depth, metrics = grid_search_cv(
        carseats_like, ["x1", "x2", "x3"], "y",
        max_depths=(1, 3, 6), num_folds=3)
    # depth-1 underfits a two-regime target; CV must not pick it
    assert best_depth > 1
    assert metrics[1] > metrics[best_depth]  # rmse: lower is better


def test_staged_gbt_error_decreases(carseats_like):
    from big_data_analytics_spark.ml.trees import staged_gbt_error
    errors = staged_gbt_error(carseats_like, ["x1", "x2", "x3"], "y",
                              max_iter=15)
    assert len(errors) == 15
    assert errors[-1] < errors[0]          # boosting reduces training MSE
    assert errors[-1] < 0.6 * errors[0]


def test_one_vs_rest_multiclass(spark):
    import numpy as np
    from big_data_analytics_spark.ml.trees import one_vs_rest_classifier
    from big_data_analytics_spark.ml.evaluate import multiclass_metrics

    rng = np.random.default_rng(31)
    centers = [(-4, 0), (4, 0), (0, 5)]
    rows = []
    for lbl, (cx, cy) in enumerate(centers):
        pts = rng.normal([cx, cy], 0.8, (150, 2))
        rows += [(float(a), float(b), lbl) for a, b in pts]
    df = spark.createDataFrame(rows, ["f1", "f2", "label"]).cache()
    model, predict = one_vs_rest_classifier(df, ["f1", "f2"], "label")
    m = multiclass_metrics(predict(df))
    assert m["accuracy"] > 0.95
    assert m["macro_f1"] > 0.95


def test_forward_stepwise_cp(spark):
    import numpy as np
    from big_data_analytics_spark.ml.regression import forward_stepwise

    rng = np.random.default_rng(33)
    n = 400
    x1 = rng.normal(0, 1, n)          # strong signal
    x2 = rng.normal(0, 1, n)          # weak signal
    x3 = rng.normal(0, 1, n)          # pure noise
    y = 4 * x1 + 1 * x2 + rng.normal(0, 1, n)
    df = spark.createDataFrame(
        [(float(a), float(b), float(c), float(t))
         for a, b, c, t in zip(x1, x2, x3, y)],
        ["x1", "x2", "x3", "y"])
    path = forward_stepwise(df, ["x1", "x2", "x3"], "y")
    assert [s["added"] for s in path[:2]] == ["x1", "x2"]  # signal first
    assert path[0]["rss"] > path[1]["rss"] >= path[2]["rss"]
    # Cp is minimized at the true model size (2), not the full model
    cps = [s["cp"] for s in path]
    assert cps[1] <= cps[0] and cps[1] <= cps[2] + 2.0


def test_describe_exact_matches_pandas(spark, carseats_like):
    from big_data_analytics_spark.ml.evaluate import describe_exact
    got = describe_exact(carseats_like, ["x1", "y"]).toPandas().set_index("summary")
    pdf = carseats_like.select("x1", "y").toPandas()
    exp = pdf.describe()
    for stat in ("mean", "std", "min", "25%", "50%", "75%", "max"):
        assert got.loc[stat, "x1"] == pytest.approx(exp.loc[stat, "x1"], rel=1e-9)
        assert got.loc[stat, "y"] == pytest.approx(exp.loc[stat, "y"], rel=1e-9)
    assert got.loc["count", "x1"] == len(pdf)
