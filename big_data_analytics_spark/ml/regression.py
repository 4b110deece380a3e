"""Regression with statistical inference (SURVEY.md §2.9 M1-M2, M20-M21).

The reference's core statistical tool is ``sm.OLS(...).fit()`` with a
full inference summary (coefficients, std errors, t/p-values, R²,
confidence intervals — codes_in_book_of_statisct.ipynb:6488-6577).
MLlib's ``LinearRegression`` with the *normal* solver exposes the same
closed-form quantities distributedly; ``ols_fit`` packages them in the
statsmodels layout. VIF and ANOVA-F comparisons are derived from
auxiliary fits / residual aggregates, as in the notebooks.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from pyspark.ml.feature import VectorAssembler
from pyspark.ml.regression import LinearRegression
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class OLSResult:
    """statsmodels-summary-shaped OLS fit."""
    features: list[str]               # without intercept
    coef: dict[str, float]            # includes 'intercept'
    std_err: dict[str, float]
    t_values: dict[str, float]
    p_values: dict[str, float]
    r2: float
    r2_adj: float
    rss: float
    n: int
    model: object                     # fitted MLlib model (for predict)
    assembler: object

    def predict(self, df: DataFrame) -> DataFrame:
        return self.model.transform(self.assembler.transform(df))

    def conf_int(self, alpha: float = 0.05) -> dict[str, tuple[float, float]]:
        """Normal-approximation CIs (exact-t needs scipy; at notebook
        n≥100 the difference is <1%; documented approximation)."""
        z = _z_crit(alpha)
        return {
            k: (self.coef[k] - z * self.std_err[k],
                self.coef[k] + z * self.std_err[k])
            for k in self.coef
        }


def _z_crit(alpha: float) -> float:
    # inverse normal CDF via Acklam's rational approximation (no scipy)
    p = 1 - alpha / 2
    a = [-3.969683028665376e+01, 2.209460984245205e+02, -2.759285104469687e+02,
         1.383577518672690e+02, -3.066479806614716e+01, 2.506628277459239e+00]
    b = [-5.447609879822406e+01, 1.615858368580409e+02, -1.556989798598866e+02,
         6.680131188771972e+01, -1.328068155288572e+01]
    c = [-7.784894002430293e-03, -3.223964580411365e-01, -2.400758277161838e+00,
         -2.549732539343734e+00, 4.374664141464968e+00, 2.938163982698783e+00]
    d = [7.784695709041462e-03, 3.224671290700398e-01, 2.445134137142996e+00,
         3.754408661907416e+00]
    plow, phigh = 0.02425, 1 - 0.02425
    if p < plow:
        q = math.sqrt(-2 * math.log(p))
        return (((((c[0]*q+c[1])*q+c[2])*q+c[3])*q+c[4])*q+c[5]) / \
               ((((d[0]*q+d[1])*q+d[2])*q+d[3])*q+1)
    if p <= phigh:
        q = p - 0.5
        r = q * q
        return (((((a[0]*r+a[1])*r+a[2])*r+a[3])*r+a[4])*r+a[5])*q / \
               (((((b[0]*r+b[1])*r+b[2])*r+b[3])*r+b[4])*r+1)
    q = math.sqrt(-2 * math.log(1 - p))
    return -(((((c[0]*q+c[1])*q+c[2])*q+c[3])*q+c[4])*q+c[5]) / \
        ((((d[0]*q+d[1])*q+d[2])*q+d[3])*q+1)


def ols_fit(df: DataFrame, features: list[str], label: str,
            elastic_net: float = 0.0, reg: float = 0.0) -> OLSResult:
    """OLS with inference via MLlib's normal-equation solver.

    Distributed X'X/X'y accumulation + closed-form solve — the same
    math statsmodels does, without collecting rows. Reference:
    sm.OLS + summary(), codes_in_book_of_statisct.ipynb:6488-6577.

    Inference (std errors / t / p) only exists for the unregularized
    normal-equation fit — MLlib's summary omits coefficient standard
    errors for regularized models, which would otherwise surface here
    as an opaque attribute error deep in the summary access.
    """
    if reg != 0.0:
        raise ValueError(
            "ols_fit provides inference (std_err/t/p), which MLlib does not "
            "compute for regularized fits; use reg=0.0, or fit "
            "pyspark.ml.regression.LinearRegression directly for ridge/lasso "
            "point estimates without inference")
    assembler = VectorAssembler(inputCols=features, outputCol="__features")
    assembled = assembler.transform(df)
    lr = LinearRegression(featuresCol="__features", labelCol=label,
                          solver="normal", regParam=reg,
                          elasticNetParam=elastic_net)
    model = lr.fit(assembled)
    s = model.summary
    names = features + ["intercept"]
    coefs = list(model.coefficients) + [model.intercept]
    # MLlib orders stderr/t/p as [features..., intercept]
    out = OLSResult(
        features=features,
        coef=dict(zip(names, coefs)),
        std_err=dict(zip(names, s.coefficientStandardErrors)),
        t_values=dict(zip(names, s.tValues)),
        p_values=dict(zip(names, s.pValues)),
        r2=s.r2,
        r2_adj=s.r2adj,
        rss=s.meanSquaredError * s.numInstances,
        n=s.numInstances,
        model=model,
        assembler=assembler,
    )
    return out


def vif(df: DataFrame, features: list[str]) -> dict[str, float]:
    """Variance inflation factors: VIF_j = 1/(1−R²_j) where R²_j is
    from regressing feature j on the others (reference:
    variance_inflation_factor, codes_in_book_of_statisct.ipynb:5925)."""
    out = {}
    for f in features:
        others = [x for x in features if x != f]
        r2 = ols_fit(df, others, f).r2
        out[f] = float("inf") if r2 >= 1.0 else 1.0 / (1.0 - r2)
    return out


def anova_f(df: DataFrame, reduced: list[str], full: list[str],
            label: str) -> tuple[float, int, int]:
    """ANOVA F-statistic comparing nested OLS models (reference:
    anova_lm(m1, m3), codes_in_book_of_statisct.ipynb:7809).
    Returns (F, df_num, df_den)."""
    assert set(reduced) < set(full)
    m_r = ols_fit(df, reduced, label)
    m_f = ols_fit(df, full, label)
    q = len(full) - len(reduced)
    dof = m_f.n - len(full) - 1
    f_stat = ((m_r.rss - m_f.rss) / q) / (m_f.rss / dof)
    return f_stat, q, dof


def residual_diagnostics(fit: OLSResult, df: DataFrame, label: str) -> DataFrame:
    """Residual/leverage-style diagnostics as columns (reference:
    influence plots, codes_in_book_of_statisct.ipynb:7249): prediction,
    residual, standardized residual (by global residual stddev)."""
    pred = fit.predict(df).withColumn(
        "residual", F.col(label) - F.col("prediction"))
    sd = pred.agg(F.stddev_samp("residual")).first()[0]
    return pred.withColumn("std_residual", F.col("residual") / F.lit(sd))


def bootstrap_se(df: DataFrame, statistic, B: int = 100,
                 seed: int = 0) -> float:
    """Bootstrap standard error of a scalar statistic (reference:
    boot_SE, codes_in_book_of_statisct.ipynb:8596-8631).

    ``statistic(df) -> float``. Each replicate is a with-replacement
    sample (Poissonized: expected n rows); the driver loop is B
    sequential Spark jobs — fine for notebook-scale B, and each job is
    fully distributed."""
    vals = []
    for i in range(B):
        rep = df.sample(withReplacement=True, fraction=1.0, seed=seed + i)
        vals.append(statistic(rep))
    mean = sum(vals) / B
    return math.sqrt(sum((v - mean) ** 2 for v in vals) / (B - 1))


def ols_prediction_intervals(df_train: DataFrame, fit: OLSResult,
                             df_new: DataFrame,
                             alpha: float = 0.05) -> DataFrame:
    """Prediction intervals for new observations (reference:
    get_prediction().summary_frame() / conf_int(obs=True),
    codes_in_book_of_statisct.ipynb:6997-7042 — SURVEY §2.9 M1 "not
    built-in → closed-form via summary stats").

    Closed form: ŷ ± z·σ̂·sqrt(1 + h(x)), h(x) = x̃ᵀ(XᵀX)⁻¹x̃ with
    x̃ = [features..., 1]. (XᵀX) is accumulated as one distributed
    aggregate over the *training* frame; the (p+1)² inverse is
    driver-side; the interval is then a pure column expression over
    ``df_new`` — nothing collects. Normal z in place of t (exact-t
    needs scipy; negligible at notebook n).
    """
    feats = fit.features
    p = len(feats)
    cols = feats + ["__one"]
    df1 = df_train.withColumn("__one", F.lit(1.0))
    aggs = []
    for i in range(p + 1):
        for j in range(i, p + 1):
            aggs.append(F.sum(F.col(cols[i]) * F.col(cols[j]))
                        .alias(f"xx_{i}_{j}"))
    r = df1.agg(*aggs).first()
    xtx = [[0.0] * (p + 1) for _ in range(p + 1)]
    for i in range(p + 1):
        for j in range(i, p + 1):
            xtx[i][j] = xtx[j][i] = r[f"xx_{i}_{j}"]
    from big_data_analytics_spark.ml.classify import _inv
    xtx_inv = _inv(xtx)

    sigma2 = fit.rss / (fit.n - p - 1)
    z = _z_crit(alpha)

    pred = fit.predict(df_new)
    xs = [F.col(f) for f in feats] + [F.lit(1.0)]
    h = F.lit(0.0)
    for i in range(p + 1):
        for j in range(p + 1):
            h = h + F.lit(xtx_inv[i][j]) * xs[i] * xs[j]
    half = F.lit(z) * F.sqrt(F.lit(sigma2) * (F.lit(1.0) + h))
    return (
        pred.withColumn("pi_lower", F.col("prediction") - half)
        .withColumn("pi_upper", F.col("prediction") + half)
    )


def mallows_cp(fit: OLSResult, sigma2_full: float) -> float:
    """Mallows Cp = RSS/σ²_full − n + 2(p+1) (reference: nCp,
    explained_codes.ipynb:519-543)."""
    p = len(fit.features)
    return fit.rss / sigma2_full - fit.n + 2 * (p + 1)


def forward_stepwise(df: DataFrame, candidates: list[str], label: str,
                     max_features: int | None = None) -> list[dict]:
    """Forward stepwise selection (reference: Stepwise.first_peak,
    explained_codes.ipynb:519-670): greedily add the feature that most
    reduces RSS; report RSS/R²/Cp per step. Driver loop over MLlib
    fits — each fit is distributed; the loop is O(k·p) fits."""
    full = ols_fit(df, candidates, label)
    sigma2_full = full.rss / (full.n - len(candidates) - 1)
    selected: list[str] = []
    path: list[dict] = []
    while candidates and (max_features is None or len(selected) < max_features):
        best = None
        for c in candidates:
            fit = ols_fit(df, selected + [c], label)
            if best is None or fit.rss < best[1].rss:
                best = (c, fit)
        c, fit = best
        selected.append(c)
        candidates = [x for x in candidates if x != c]
        path.append({
            "added": c,
            "features": list(selected),
            "rss": fit.rss,
            "r2": fit.r2,
            "cp": mallows_cp(fit, sigma2_full),
        })
    return path
