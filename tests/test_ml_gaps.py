"""MLlib-gap implementations: QDA vs numpy closed form, RBF-RFF beats
linear on a circle, anomaly detector finds planted outliers."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from big_data_analytics_spark.ml.classify import classification_metrics, linear_svc_fit
from big_data_analytics_spark.ml.gaps import (
    qda_fit,
    random_fourier_features,
    rbf_svc_fit,
    robust_anomaly_scores,
)


def test_qda_different_covariances(spark):
    """Classes share a mean direction but differ in covariance shape —
    LDA-inseparable, QDA-separable."""
    rng = np.random.default_rng(21)
    n = 1500
    x0 = rng.normal(0, 0.5, (n, 2))            # tight blob
    x1 = rng.normal(0, 3.0, (n, 2))            # wide blob, same center
    x1 = x1[np.linalg.norm(x1, axis=1) > 2.2][:900]  # ring-ish
    rows = ([(float(a), float(b), 0) for a, b in x0]
            + [(float(a), float(b), 1) for a, b in x1])
    df = spark.createDataFrame(rows, ["f1", "f2", "label"]).cache()
    model = qda_fit(df, ["f1", "f2"], "label")
    pred = model.predict(df)
    acc = classification_metrics(pred)["accuracy"]
    assert acc > 0.9
    # sufficient stats match numpy
    assert model.means[0][0] == pytest.approx(float(x0[:, 0].mean()), abs=1e-9)
    cov0 = np.cov(x0, rowvar=False)
    inv0 = np.linalg.inv(cov0)
    assert model.cov_invs[0][0][0] == pytest.approx(inv0[0, 0], rel=1e-6)
    assert model.log_dets[0] == pytest.approx(float(np.log(np.linalg.det(cov0))), rel=1e-6)


def test_rff_kernel_approximation(spark):
    """E[z(x)ᵀz(y)] ≈ exp(−γ‖x−y‖²): check the feature map approximates
    the RBF kernel on a known pair."""
    df = spark.createDataFrame([(0.0, 0.0), (1.0, 0.5)], ["f1", "f2"])
    mapped, names = random_fourier_features(df, ["f1", "f2"],
                                            n_components=2048, gamma=0.7)
    rows = mapped.collect()
    z0 = np.array([rows[0][n] for n in names])
    z1 = np.array([rows[1][n] for n in names])
    approx = float(z0 @ z1)
    exact = float(np.exp(-0.7 * ((1.0 - 0.0) ** 2 + (0.5 - 0.0) ** 2)))
    assert approx == pytest.approx(exact, abs=0.08)  # MC error ~1/sqrt(D)


def test_rbf_svc_beats_linear_on_circle(spark):
    rng = np.random.default_rng(22)
    n = 1200
    x = rng.uniform(-2, 2, (n, 2))
    y = (np.linalg.norm(x, axis=1) < 1.2).astype(int)  # disc inside square
    df = spark.createDataFrame(
        [(float(a), float(b), int(t)) for (a, b), t in zip(x, y)],
        ["f1", "f2", "label"]).cache()
    _, lin_pred = linear_svc_fit(df, ["f1", "f2"], "label", max_iter=30)
    lin_acc = classification_metrics(lin_pred(df))["accuracy"]
    _, rbf_pred = rbf_svc_fit(df, ["f1", "f2"], "label",
                              n_components=96, gamma=1.0, max_iter=30)
    rbf_acc = classification_metrics(rbf_pred(df))["accuracy"]
    assert rbf_acc > 0.85
    assert rbf_acc > lin_acc + 0.1  # the kernel map is doing the work


def test_anomaly_detector_finds_planted_outliers(spark):
    rng = np.random.default_rng(23)
    normal = rng.normal(0, 1, (500, 2))
    outliers = rng.normal(0, 1, (10, 2)) + 12.0   # far cluster
    rows = ([(i, float(a), float(b)) for i, (a, b) in enumerate(normal)]
            + [(1000 + i, float(a), float(b)) for i, (a, b) in enumerate(outliers)])
    df = spark.createDataFrame(rows, ["id", "f1", "f2"])
    scored = robust_anomaly_scores(df, ["f1", "f2"], contamination=0.03)
    flagged = {r.id for r in scored.filter(F.col("is_anomaly") == 1).collect()}
    planted = {1000 + i for i in range(10)}
    assert planted <= flagged            # every planted outlier caught
    assert len(flagged) <= 0.05 * 510 + 5  # and not wildly over-flagging
