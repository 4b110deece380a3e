"""ML layer: exact-equality vs numpy closed forms where deterministic
(OLS, metrics, LDA decision rule), range assertions for iterative fits
(SURVEY.md §5 test plan item 4).
"""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from big_data_analytics_spark.ml import classify, cluster, evaluate, features, regression


@pytest.fixture(scope="module")
def reg_data(spark):
    """y = 3 + 2*x1 - 1.5*x2 + noise, seeded numpy, known OLS answer."""
    rng = np.random.default_rng(42)
    n = 500
    x1, x2 = rng.normal(0, 1, n), rng.normal(0, 2, n)
    y = 3 + 2 * x1 - 1.5 * x2 + rng.normal(0, 0.5, n)
    rows = [(float(a), float(b), float(c)) for a, b, c in zip(x1, x2, y)]
    df = spark.createDataFrame(rows, ["x1", "x2", "y"])
    return df.cache(), x1, x2, y


def _numpy_ols(X, y):
    Xd = np.column_stack([X, np.ones(len(y))])
    beta, *_ = np.linalg.lstsq(Xd, y, rcond=None)
    resid = y - Xd @ beta
    rss = float(resid @ resid)
    sigma2 = rss / (len(y) - Xd.shape[1])
    se = np.sqrt(np.diag(sigma2 * np.linalg.inv(Xd.T @ Xd)))
    return beta, se, rss


def test_ols_matches_closed_form(reg_data):
    df, x1, x2, y = reg_data
    fit = regression.ols_fit(df, ["x1", "x2"], "y")
    beta, se, rss = _numpy_ols(np.column_stack([x1, x2]), y)
    assert fit.coef["x1"] == pytest.approx(beta[0], abs=1e-8)
    assert fit.coef["x2"] == pytest.approx(beta[1], abs=1e-8)
    assert fit.coef["intercept"] == pytest.approx(beta[2], abs=1e-8)
    assert fit.std_err["x1"] == pytest.approx(se[0], rel=1e-6)
    assert fit.std_err["intercept"] == pytest.approx(se[2], rel=1e-6)
    assert fit.rss == pytest.approx(rss, rel=1e-6)
    assert 0.9 < fit.r2 <= 1.0
    # significant terms: |t| huge, p ~ 0
    assert abs(fit.t_values["x1"]) > 20 and fit.p_values["x1"] < 1e-6
    lo, hi = fit.conf_int()["x1"]
    assert lo < beta[0] < hi


def test_vif_detects_collinearity(spark):
    rng = np.random.default_rng(0)
    a = rng.normal(0, 1, 300)
    b = a * 0.95 + rng.normal(0, 0.1, 300)   # collinear with a
    c = rng.normal(0, 1, 300)                # independent
    df = spark.createDataFrame(
        [(float(x), float(y), float(z)) for x, y, z in zip(a, b, c)],
        ["a", "b", "c"])
    v = regression.vif(df, ["a", "b", "c"])
    assert v["a"] > 10 and v["b"] > 10 and v["c"] < 2


def test_anova_f_nested(reg_data):
    df, *_ = reg_data
    f_stat, q, dof = regression.anova_f(df, ["x1"], ["x1", "x2"], "y")
    assert q == 1 and dof == len(df.collect()) - 3
    assert f_stat > 100  # x2 is strongly significant


def test_logistic_and_metrics(spark):
    rng = np.random.default_rng(1)
    n = 1000
    x = rng.normal(0, 1, (n, 2))
    logit = 1.5 * x[:, 0] - 2.0 * x[:, 1]
    y = (rng.uniform(size=n) < 1 / (1 + np.exp(-logit))).astype(int)
    df = spark.createDataFrame(
        [(float(a), float(b), int(t)) for (a, b), t in zip(x, y)],
        ["x1", "x2", "label"]).cache()
    model, predict = classify.logistic_fit(df, ["x1", "x2"], "label")
    pred = predict(df)
    m = classify.classification_metrics(pred)
    assert m["accuracy"] > 0.75
    assert 0 < m["f1"] <= 1
    cm = classify.confusion_matrix(pred).collect()
    assert sum(r.n for r in cm) == n
    # coefficient signs recovered
    assert model.coefficients[0] > 0 > model.coefficients[1]


def test_lda_closed_form(spark):
    """Two well-separated gaussians: LDA must classify near-perfectly
    and match the numpy closed-form decision rule."""
    rng = np.random.default_rng(7)
    n = 400
    x0 = rng.normal([-2, 0], 1.0, (n, 2))
    x1 = rng.normal([2, 1], 1.0, (n, 2))
    rows = ([(float(a), float(b), 0) for a, b in x0]
            + [(float(a), float(b), 1) for a, b in x1])
    df = spark.createDataFrame(rows, ["f1", "f2", "label"]).cache()
    model = classify.lda_fit(df, ["f1", "f2"], "label")
    pred = model.predict(df)
    acc = classify.classification_metrics(pred)["accuracy"]
    assert acc > 0.97
    # priors and means match numpy
    assert model.priors[0] == pytest.approx(0.5)
    assert model.means[0][0] == pytest.approx(float(x0[:, 0].mean()), abs=1e-9)
    assert model.means[1][1] == pytest.approx(float(x1[:, 1].mean()), abs=1e-9)


def test_knn(spark):
    train = spark.createDataFrame(
        [(0.0, 0.0, 0), (0.1, 0.1, 0), (5.0, 5.0, 1), (5.1, 5.1, 1)],
        ["f1", "f2", "label"])
    test = spark.createDataFrame(
        [(1, 0.2, 0.2), (2, 4.9, 4.9), (3, 0.0, 0.1)], ["id", "f1", "f2"])
    got = {r.id: r.prediction
           for r in classify.knn_predict(train, test, ["f1", "f2"], "label",
                                         k=3).collect()}
    assert got == {1: 0, 2: 1, 3: 0}


def test_kmeans_finds_planted_clusters(spark):
    rng = np.random.default_rng(3)
    centers = [(-5, -5), (0, 5), (5, -5)]
    rows = []
    for cx, cy in centers:
        pts = rng.normal([cx, cy], 0.5, (100, 2))
        rows += [(float(a), float(b)) for a, b in pts]
    df = spark.createDataFrame(rows, ["f1", "f2"]).cache()
    model, preds, inertia = cluster.kmeans_fit(df, ["f1", "f2"], k=3, seed=5)
    assert preds.select("prediction").distinct().count() == 3
    assert inertia < 300 * 2  # ~2*var per point bound
    assert cluster.silhouette(preds) > 0.7
    db = cluster.davies_bouldin(preds, ["f1", "f2"])
    assert db < 0.5  # tight, well-separated clusters
    elbow = cluster.elbow_curve(df, ["f1", "f2"], ks=[2, 3, 4], seed=5)
    assert elbow[3] < elbow[2]  # inertia drops to the true k


def test_pca_low_rank(spark):
    """Planted rank-1 structure + tiny noise → first component ≈ all
    the variance."""
    rng = np.random.default_rng(4)
    t = rng.normal(0, 3, 300)
    rows = [(float(a), float(2 * a + rng.normal(0, .01)),
             float(-a + rng.normal(0, .01))) for a in t]
    df = spark.createDataFrame(rows, ["f1", "f2", "f3"])
    _, transformed, ratios = cluster.pca_fit(df, ["f1", "f2", "f3"], 2)
    assert ratios[0] > 0.99
    cum = cluster.cumulative_explained_variance(ratios)
    assert cum[-1] == pytest.approx(sum(ratios))


def test_regression_metrics_exact(spark):
    df = spark.createDataFrame(
        [(1.0, 2.0), (2.0, 2.0), (4.0, 3.0)], ["label", "prediction"])
    m = evaluate.regression_metrics(df)
    assert m["mse"] == pytest.approx((1 + 0 + 1) / 3)
    assert m["mae"] == pytest.approx(2 / 3)
    assert m["rmse"] == pytest.approx(math.sqrt(2 / 3))
    assert m["mape"] == pytest.approx((1 / 1 + 0 / 2 + 1 / 4) / 3)


def test_roc_auc_rank_identity(spark):
    df = spark.createDataFrame(
        [(1, 0.9), (1, 0.8), (0, 0.7), (1, 0.6), (0, 0.4), (0, 0.2)],
        ["label", "p1"])
    # pairs: pos scores {0.9,.8,.6} vs neg {.7,.4,.2}: 8 of 9 correct
    assert evaluate.roc_auc(df) == pytest.approx(8 / 9)


def test_log_loss(spark):
    df = spark.createDataFrame([(1, 0.9), (0, 0.2)], ["label", "p1"])
    expected = -(math.log(0.9) + math.log(0.8)) / 2
    assert evaluate.log_loss(df) == pytest.approx(expected)


def test_bootstrap_se_of_mean(spark):
    """Bootstrap SE of the sample mean ≈ σ/√n."""
    rng = np.random.default_rng(9)
    vals = rng.normal(10, 2, 400)
    df = spark.createDataFrame([(float(v),) for v in vals], ["x"]).cache()

    def mean_stat(d):
        return d.agg(F.avg("x")).first()[0]

    se = regression.bootstrap_se(df, mean_stat, B=30, seed=11)
    theory = 2 / math.sqrt(400)
    assert 0.4 * theory < se < 2.5 * theory


def test_feature_helpers(spark):
    df = spark.createDataFrame(
        [(1.0, "a"), (2.0, "b"), (3.0, "a"), (4.0, "c")], ["x", "cat"])
    scaled = features.standard_scale(df, ["x"])
    import numpy as np
    vals = np.array([r.scaled[0] for r in scaled.collect()])
    assert vals.mean() == pytest.approx(0, abs=1e-9)
    assert vals.std(ddof=1) == pytest.approx(1, abs=1e-9)
    oh = features.one_hot(df, "cat")
    assert "cat_onehot" in oh.columns
    poly = features.polynomial_terms(df, "x", 3)
    assert poly.filter(F.col("x_pow3") != F.pow("x", 3)).count() == 0
    tr, te = features.train_test_split(df, 0.5, seed=1)
    assert tr.count() + te.count() == 4


def test_prediction_intervals_closed_form(spark, reg_data):
    """PI bounds match the numpy closed form and achieve ~95% coverage
    on the training data."""
    df, x1, x2, y = reg_data
    fit = regression.ols_fit(df, ["x1", "x2"], "y")
    got = regression.ols_prediction_intervals(df, fit, df).toPandas()
    X = np.column_stack([x1, x2, np.ones(len(y))])
    xtx_inv = np.linalg.inv(X.T @ X)
    beta, _, rss = _numpy_ols(np.column_stack([x1, x2]), y)
    sigma2 = rss / (len(y) - 3)
    z = 1.959963984540054
    # closed-form check on each row
    pred_map = {(round(r.x1, 9), round(r.x2, 9)): r for r in got.itertuples()}
    for i in range(0, len(y), 97):
        xt = np.array([x1[i], x2[i], 1.0])
        h = float(xt @ xtx_inv @ xt)
        half = z * math.sqrt(sigma2 * (1 + h))
        center = float(xt @ beta)
        r = pred_map[(round(x1[i], 9), round(x2[i], 9))]
        assert r.pi_lower == pytest.approx(center - half, abs=1e-6)
        assert r.pi_upper == pytest.approx(center + half, abs=1e-6)
    # empirical coverage ≈ 95%
    covered = ((got.pi_lower <= got.y) & (got.y <= got.pi_upper)).mean()
    assert covered > 0.92


def test_imputer_fills_nulls(spark):
    df = spark.createDataFrame(
        [(1.0, 10.0), (2.0, None), (3.0, 30.0), (None, 20.0)],
        "a double, b double")
    out = features.impute_mean(df, ["a", "b"])
    rows = out.collect()
    assert all(r.a is not None and r.b is not None for r in rows)
    vals_a = sorted(r.a for r in rows)
    assert vals_a == [1.0, 2.0, 2.0, 3.0]  # null -> mean(1,2,3)=2


def test_calinski_harabasz(spark):
    import numpy as np
    rng = np.random.default_rng(44)
    tight = []
    for cx, cy in [(-5, -5), (5, 5)]:
        tight += [(float(a), float(b)) for a, b in rng.normal([cx, cy], 0.3, (80, 2))]
    df = spark.createDataFrame(tight, ["f1", "f2"])
    _, preds, _ = cluster.kmeans_fit(df, ["f1", "f2"], k=2, seed=3)
    ch = cluster.calinski_harabasz(preds, ["f1", "f2"])
    assert ch > 1000  # far-separated tight clusters → huge CH


def test_pca_reconstruction_error(spark):
    """Rank-1 data + tiny noise: 1 component reconstructs almost
    perfectly; the identity-based MSE matches an explicit numpy
    reconstruction."""
    rng = np.random.default_rng(55)
    t = rng.normal(0, 2, 400)
    X = np.column_stack([t, 2 * t, -0.5 * t]) + rng.normal(0, 0.05, (400, 3))
    df = spark.createDataFrame([tuple(map(float, r)) for r in X],
                               ["f1", "f2", "f3"])
    mse1 = cluster.pca_reconstruction_error(df, ["f1", "f2", "f3"], 1)
    mse3 = cluster.pca_reconstruction_error(df, ["f1", "f2", "f3"], 3)
    # numpy oracle: project onto top-1 PC of centered data
    Xc = X - X.mean(axis=0)
    U, S, Vt = np.linalg.svd(Xc, full_matrices=False)
    recon = (Xc @ Vt[0]).reshape(-1, 1) @ Vt[0].reshape(1, -1)
    # sample-variance convention (ddof=1) to match Summarizer.variance
    exp_mse = float(((Xc - recon) ** 2).sum() / (len(X) - 1) / 3)
    assert mse1 == pytest.approx(exp_mse, rel=1e-6)
    assert mse3 == pytest.approx(0.0, abs=1e-9)
    assert mse1 < 0.01  # tiny residual noise


def test_interaction_terms(spark):
    df = spark.createDataFrame([(2.0, 3.0), (4.0, 5.0)], ["a", "b"])
    out = features.interaction_terms(df, [("a", "b")])
    assert [r.a_x_b for r in out.orderBy("a").collect()] == [6.0, 20.0]


def test_gaussian_nb_planted_distributions(spark):
    """Two well-separated Gaussians: NB must recover near-perfect
    accuracy, and the decision flips between the class means."""
    rng = np.random.default_rng(7)
    n = 400
    x0 = rng.normal(0.0, 1.0, (n, 2))
    x1 = rng.normal(4.0, 1.0, (n, 2))
    rows = [(float(a), float(b), 0.0) for a, b in x0] + \
           [(float(a), float(b), 1.0) for a, b in x1]
    df = spark.createDataFrame(rows, ["f1", "f2", "label"])
    _, predict = classify.gaussian_nb_fit(df, ["f1", "f2"], "label")
    m = classify.classification_metrics(predict(df))
    assert m["accuracy"] > 0.98
    probe = spark.createDataFrame(
        [(0.0, 0.0), (4.0, 4.0)], ["f1", "f2"])
    got = [r.prediction for r in predict(probe).orderBy("f1").collect()]
    assert got == [0.0, 1.0]


def test_ols_rejects_regularization(reg_data):
    df, *_ = reg_data
    with pytest.raises(ValueError, match="inference"):
        regression.ols_fit(df, ["x1", "x2"], "y", reg=0.1)


def test_graded_ols_queries_match_ml_module(spark):
    """The driver-graded regression rows (ml1 simple, ml3 multiple)
    and the ml/ module's MLlib normal-equation fit are two
    implementations of the same estimator — they must agree on the
    same data. Ties the graded surface to the notebook-parity ML
    surface."""
    from big_data_analytics_spark.ml.regression import ols_fit
    from big_data_analytics_spark.queries import load_all
    sf = "/root/testdata/sf0.01"
    reg = load_all()
    li = (spark.read.parquet(f"{sf}/lineitem.parquet")
          .select("l_returnflag", "l_quantity", "l_extendedprice",
                  "l_discount"))

    # ml1: per-returnflag simple regression price ~ quantity
    graded = {r["l_returnflag"]: r
              for r in reg["ml1_ols_inference"].spark_fn(spark, sf).collect()}
    for flag, row in graded.items():
        fit = ols_fit(li.filter(F.col("l_returnflag") == flag),
                      ["l_quantity"], "l_extendedprice")
        assert abs(fit.coef["l_quantity"] - row["slope"]) < 1e-3, flag
        assert abs(fit.coef["intercept"] - row["intercept"]) < 1e-1, flag
        assert abs(fit.r2 - row["r2"]) < 1e-4, flag
        assert abs(fit.std_err["l_quantity"] - row["se_slope"]) < 1e-3, flag

    # ml3: whole-table multiple regression price ~ quantity + discount
    m3 = reg["ml3_ols_multiple"].spark_fn(spark, sf).collect()[0]
    fit = ols_fit(li.withColumn("disc_pct", F.col("l_discount") * 100.0),
                  ["l_quantity", "disc_pct"], "l_extendedprice")
    assert abs(fit.coef["l_quantity"] - m3["coef_quantity"]) < 1e-3
    assert abs(fit.coef["disc_pct"] - m3["coef_discount_pct"]) < 1e-2
    assert abs(fit.coef["intercept"] - m3["intercept"]) < 1e-1
    assert abs(fit.r2 - m3["r2"]) < 1e-4
