"""MLlib-gap implementations (SURVEY.md §7 "MLlib gaps", §2.9 M4, M10,
M13): QDA, RBF-kernel classification via random Fourier features,
quantile-based anomaly scoring.

Each follows the engine policy: sufficient statistics / feature maps
as distributed aggregates and column expressions; only O(p²)-sized
scalars ever reach the driver. Where the method is an *approximation*
of the sklearn original, the docstring says exactly how.
"""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from big_data_analytics_spark.ml.classify import _dotv, _inv, _matvec


def _det(m: list[list[float]]) -> float:
    """LU determinant of a small p×p matrix (driver-side)."""
    n = len(m)
    a = [row[:] for row in m]
    det = 1.0
    for col in range(n):
        piv = max(range(col, n), key=lambda r: abs(a[r][col]))
        if a[piv][col] == 0:
            return 0.0
        if piv != col:
            a[col], a[piv] = a[piv], a[col]
            det = -det
        det *= a[col][col]
        for r in range(col + 1, n):
            f = a[r][col] / a[col][col]
            a[r] = [x - f * y for x, y in zip(a[r], a[col])]
    return det


class QDAModel:
    """Quadratic discriminant analysis from per-class sufficient stats
    (reference: sklearn QuadraticDiscriminantAnalysis,
    Assignment2_for_data_mining.ipynb:997). Unlike LDA, each class has
    its own covariance; the decision surface is quadratic:

        δ_k(x) = −½ ln|Σ_k| − ½ (x−μ_k)ᵀ Σ_k⁻¹ (x−μ_k) + ln π_k
    """

    def __init__(self, classes, priors, means, cov_invs, log_dets, features):
        self.classes = classes
        self.priors = priors
        self.means = means
        self.cov_invs = cov_invs
        self.log_dets = log_dets
        self.features = features

    def predict(self, df: DataFrame) -> DataFrame:
        scores = []
        for k in self.classes:
            mu, ci = self.means[k], self.cov_invs[k]
            const = (-0.5 * self.log_dets[k] + math.log(self.priors[k])
                     - 0.5 * _dotv(mu, _matvec(ci, mu)))
            # δ_k(x) = const + x'Σ⁻¹μ − ½ x'Σ⁻¹x, expanded per term
            expr = F.lit(const)
            w = _matvec(ci, mu)
            for j, f in enumerate(self.features):
                expr = expr + F.col(f) * F.lit(w[j])
            p = len(self.features)
            for i in range(p):
                for j in range(p):
                    expr = expr - 0.5 * F.lit(ci[i][j]) * F.col(self.features[i]) * F.col(self.features[j])
            scores.append(expr.alias(f"__q_{k}"))
        out = df.select("*", *scores)
        best = F.greatest(*[F.col(f"__q_{k}") for k in self.classes])
        pred = F.coalesce(*[
            F.when(F.col(f"__q_{k}") == best, F.lit(float(k)))
            for k in self.classes
        ])
        return out.withColumn("prediction", pred).drop(
            *[f"__q_{k}" for k in self.classes])


def qda_fit(df: DataFrame, features: list[str], label: str) -> QDAModel:
    """One aggregation pass per moment: class counts, means, and
    per-class second moments → per-class covariance (driver inverts the
    tiny p×p matrices)."""
    p = len(features)
    aggs = [F.count(F.lit(1)).alias("n")]
    aggs += [F.avg(f).alias(f"m_{i}") for i, f in enumerate(features)]
    for i in range(p):
        for j in range(i, p):
            aggs.append(F.avg(F.col(features[i]) * F.col(features[j]))
                        .alias(f"s_{i}_{j}"))
    rows = df.groupBy(label).agg(*aggs).collect()
    n_total = sum(r["n"] for r in rows)
    classes = sorted(r[label] for r in rows)
    by = {r[label]: r for r in rows}
    priors, means, cov_invs, log_dets = {}, {}, {}, {}
    for k in classes:
        r = by[k]
        nk = r["n"]
        mu = [r[f"m_{i}"] for i in range(p)]
        cov = [[0.0] * p for _ in range(p)]
        for i in range(p):
            for j in range(i, p):
                # sample covariance from raw moments (n/(n-1) correction)
                c = (r[f"s_{i}_{j}"] - mu[i] * mu[j]) * nk / (nk - 1)
                cov[i][j] = cov[j][i] = c
        priors[k] = nk / n_total
        means[k] = mu
        cov_invs[k] = _inv(cov)
        log_dets[k] = math.log(_det(cov))
    return QDAModel(classes, priors, means, cov_invs, log_dets, features)


# ---------------------------------------------------------------------
# RBF kernel via random Fourier features (M10)
# ---------------------------------------------------------------------

def _gauss_pair(key: str) -> tuple[float, float]:
    """Deterministic standard-normal pair via Box–Muller over md5 bits
    (plan-constant, same on every executor — no RNG state)."""
    raw = hashlib.md5(key.encode()).digest()
    u1 = (int.from_bytes(raw[:8], "little") + 1) / (2 ** 64 + 1)
    u2 = int.from_bytes(raw[8:], "little") / 2 ** 64
    r = math.sqrt(-2 * math.log(u1))
    return r * math.cos(2 * math.pi * u2), r * math.sin(2 * math.pi * u2)


def random_fourier_features(df: DataFrame, features: list[str],
                            n_components: int = 64, gamma: float = 1.0,
                            prefix: str = "rff", salt: str = "rff") -> tuple[DataFrame, list[str]]:
    """Rahimi–Recht map: z_d(x) = sqrt(2/D)·cos(w_dᵀx + b_d) with
    w ~ N(0, 2γI), b ~ U[0, 2π); E[z(x)ᵀz(y)] = exp(−γ‖x−y‖²), so a
    linear model on z approximates an RBF-kernel machine (the
    documented substitute for sklearn SVC(kernel='rbf'), SURVEY §2.9
    M10). Weights are hash-derived constants baked into the plan."""
    cols = []
    names = []
    scale = math.sqrt(2.0 / n_components)
    for d in range(n_components):
        proj = None
        for i, f in enumerate(features):
            g, _ = _gauss_pair(f"{salt}|w|{d}|{i}")
            w = g * math.sqrt(2 * gamma)
            t = F.col(f) * F.lit(w)
            proj = t if proj is None else proj + t
        b = (int.from_bytes(hashlib.md5(f"{salt}|b|{d}".encode()).digest()[:8],
                            "little") / 2 ** 64) * 2 * math.pi
        name = f"{prefix}_{d}"
        cols.append((F.cos(proj + F.lit(b)) * F.lit(scale)).alias(name))
        names.append(name)
    return df.select("*", *cols), names


def rbf_svc_fit(df: DataFrame, features: list[str], label: str,
                n_components: int = 64, gamma: float = 1.0,
                C: float = 1.0, max_iter: int = 50):
    """RBF-kernel classifier = random Fourier features + LinearSVC."""
    from big_data_analytics_spark.ml.classify import linear_svc_fit

    mapped, names = random_fourier_features(df, features, n_components, gamma)
    model, _ = linear_svc_fit(mapped, names, label, C=C, max_iter=max_iter)

    def predict(d: DataFrame) -> DataFrame:
        m, _ = random_fourier_features(d, features, n_components, gamma)
        from pyspark.ml.feature import VectorAssembler
        assembled = VectorAssembler(inputCols=names, outputCol="__features").transform(m)
        return model.transform(assembled)

    return model, predict


# ---------------------------------------------------------------------
# Anomaly detection (M13 substitute)
# ---------------------------------------------------------------------

def robust_anomaly_scores(df: DataFrame, features: list[str],
                          contamination: float = 0.1) -> DataFrame:
    """Quantile-based anomaly detection — the documented substitute for
    sklearn IsolationForest (SURVEY §2.9 M13: "approximate with
    distance/quantile rules"). Per feature: robust z = |x − median| /
    (1.4826·MAD); score = max over features; the top ``contamination``
    fraction is flagged.

    An exact-semantics path (per-partition sklearn IsolationForest fit
    via applyInPandas, broadcast-ensemble scoring) was checked for this
    environment on 2026-08-13: sklearn is not installed (ModuleNotFound
    on import), so the MAD substitute stays the shipped behavior.

    Two aggregate passes (medians, then MADs) + one score threshold via
    exact percentile — no tree ensemble, but the same
    top-k-most-deviant contract on tabular data, fully distributed."""
    med_row = df.agg(*[
        F.percentile(F.col(f), F.lit(0.5)).alias(f) for f in features
    ]).first()
    medians = {f: med_row[f] for f in features}
    mad_row = df.agg(*[
        F.percentile(F.abs(F.col(f) - F.lit(medians[f])), F.lit(0.5)).alias(f)
        for f in features
    ]).first()
    mads = {f: (mad_row[f] or 1e-12) * 1.4826 for f in features}
    score = F.greatest(*[
        F.abs(F.col(f) - F.lit(medians[f])) / F.lit(mads[f]) for f in features
    ]) if len(features) > 1 else (
        F.abs(F.col(features[0]) - F.lit(medians[features[0]])) / F.lit(mads[features[0]]))
    scored = df.withColumn("anomaly_score", score)
    cutoff = scored.agg(
        F.percentile(F.col("anomaly_score"), F.lit(1.0 - contamination))
    ).first()[0]
    return scored.withColumn("is_anomaly",
                             (F.col("anomaly_score") > F.lit(cutoff)).cast("int"))
