"""Classification surface (SURVEY.md §2.9 M3-M7, M10):
logistic regression, confusion matrices, Gaussian NB, LDA (closed-form
sufficient statistics — not in MLlib), kNN (broadcast join — not in
MLlib), linear SVM.
"""

from __future__ import annotations

import math

from pyspark.ml.classification import (
    LinearSVC,
    LogisticRegression,
    NaiveBayes,
)
from pyspark.ml.feature import VectorAssembler
from pyspark.ml.stat import Summarizer
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def logistic_fit(df: DataFrame, features: list[str], label: str,
                 threshold: float = 0.5, reg: float = 0.0):
    """Binomial GLM fit (reference: sm.Logit / GLM(Binomial),
    data_mining_Assignment1.ipynb:1467-1817). Returns the fitted model
    + assembler; ``predict`` adds probability/prediction columns."""
    assembler = VectorAssembler(inputCols=features, outputCol="__features")
    lr = LogisticRegression(featuresCol="__features", labelCol=label,
                            threshold=threshold, regParam=reg)
    model = lr.fit(assembler.transform(df))

    def predict(d: DataFrame) -> DataFrame:
        return model.transform(assembler.transform(d))

    return model, predict


def confusion_matrix(pred: DataFrame, label: str = "label",
                     prediction: str = "prediction") -> DataFrame:
    """label × prediction counts (reference: sklearn confusion_matrix,
    data_mining_Assignment1.ipynb:2014) — a groupBy, not a collect."""
    return (
        pred.groupBy(label, prediction)
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(label, prediction)
    )


def classification_metrics(pred: DataFrame, label: str = "label",
                           prediction: str = "prediction") -> dict[str, float]:
    """Accuracy/precision/recall/F1 for binary labels as one aggregate
    pass (reference: sklearn metrics, SURVEY §2.9 M19)."""
    l, p = F.col(label).cast("double"), F.col(prediction).cast("double")
    row = pred.agg(
        F.avg((l == p).cast("double")).alias("acc"),
        F.sum(((l == 1) & (p == 1)).cast("long")).alias("tp"),
        F.sum(((l == 0) & (p == 1)).cast("long")).alias("fp"),
        F.sum(((l == 1) & (p == 0)).cast("long")).alias("fn"),
    ).first()
    prec = row.tp / (row.tp + row.fp) if (row.tp + row.fp) else 0.0
    rec = row.tp / (row.tp + row.fn) if (row.tp + row.fn) else 0.0
    f1 = 2 * prec * rec / (prec + rec) if (prec + rec) else 0.0
    return {"accuracy": row.acc, "precision": prec, "recall": rec, "f1": f1}


def gaussian_nb_fit(df: DataFrame, features: list[str], label: str):
    """Gaussian Naive Bayes (reference: sklearn GaussianNB,
    Assignment2_for_data_mining.ipynb:1061) via MLlib NaiveBayes."""
    assembler = VectorAssembler(inputCols=features, outputCol="__features")
    nb = NaiveBayes(featuresCol="__features", labelCol=label,
                    modelType="gaussian")
    model = nb.fit(assembler.transform(df))

    def predict(d: DataFrame) -> DataFrame:
        return model.transform(assembler.transform(d))

    return model, predict


def linear_svc_fit(df: DataFrame, features: list[str], label: str,
                   C: float = 1.0, max_iter: int = 50):
    """Linear SVM (reference: SVC(kernel='linear'), SVM.ipynb:71).
    RBF kernels are not in MLlib — the documented path is random
    Fourier features + LinearSVC (SURVEY §2.9 M10), not implemented
    here."""
    assembler = VectorAssembler(inputCols=features, outputCol="__features")
    svc = LinearSVC(featuresCol="__features", labelCol=label,
                    regParam=1.0 / C, maxIter=max_iter)
    model = svc.fit(assembler.transform(df))

    def predict(d: DataFrame) -> DataFrame:
        return model.transform(assembler.transform(d))

    return model, predict


# ---------------------------------------------------------------------
# LDA — closed-form sufficient statistics (MLlib gap, SURVEY §7)
# ---------------------------------------------------------------------

class LDAModel:
    """Linear discriminant analysis from grouped sufficient statistics.

    Fit = one aggregation pass (per-class mean vectors + pooled
    within-class covariance via Summarizer), solve on the driver
    (p×p, tiny), score as a column expression — no MLlib estimator
    exists for LDA (reference: sklearn LinearDiscriminantAnalysis,
    data_mining_Assignment1.ipynb:1826-2038).

    Scoring rule: δ_k(x) = x'Σ⁻¹μ_k − ½μ_k'Σ⁻¹μ_k + log π_k;
    predict argmax_k δ_k(x).
    """

    def __init__(self, classes, priors, means, cov_inv, features):
        self.classes = classes
        self.priors = priors       # {k: π_k}
        self.means = means         # {k: [μ]}
        self.cov_inv = cov_inv     # p×p list-of-lists
        self.features = features

    def predict(self, df: DataFrame) -> DataFrame:
        scores = []
        for k in self.classes:
            w = _matvec(self.cov_inv, self.means[k])              # Σ⁻¹μ_k
            b = (-0.5 * _dotv(self.means[k], w)
                 + math.log(self.priors[k]))
            expr = F.lit(b)
            for j, f in enumerate(self.features):
                expr = expr + F.col(f) * F.lit(w[j])
            scores.append(expr.alias(f"__score_{k}"))
        out = df.select("*", *scores)
        best = F.greatest(*[F.col(f"__score_{k}") for k in self.classes])
        pred = F.coalesce(*[
            F.when(F.col(f"__score_{k}") == best, F.lit(float(k)))
            for k in self.classes
        ])
        return out.withColumn("prediction", pred).drop(
            *[f"__score_{k}" for k in self.classes])


def _matvec(m, v):
    return [sum(m[i][j] * v[j] for j in range(len(v))) for i in range(len(m))]


def _dotv(a, b):
    return sum(x * y for x, y in zip(a, b))


def _inv(m):
    """Gauss-Jordan inverse for the (tiny, p×p) pooled covariance."""
    n = len(m)
    aug = [row[:] + [1.0 if i == j else 0.0 for j in range(n)]
           for i, row in enumerate(m)]
    for col in range(n):
        piv = max(range(col, n), key=lambda r: abs(aug[r][col]))
        aug[col], aug[piv] = aug[piv], aug[col]
        d = aug[col][col]
        aug[col] = [x / d for x in aug[col]]
        for r in range(n):
            if r != col and aug[r][col] != 0:
                factor = aug[r][col]
                aug[r] = [x - factor * y for x, y in zip(aug[r], aug[col])]
    return [row[n:] for row in aug]


def lda_fit(df: DataFrame, features: list[str], label: str) -> LDAModel:
    assembled = VectorAssembler(inputCols=features, outputCol="__f").transform(df)
    stats = (
        assembled.groupBy(label)
        .agg(
            Summarizer.mean(F.col("__f")).alias("mean"),
            Summarizer.count(F.col("__f")).alias("n"),
            Summarizer.variance(F.col("__f")).alias("var"),
        )
        .collect()
    )
    n_total = sum(r["n"] for r in stats)
    p = len(features)
    classes = sorted(r[label] for r in stats)
    by = {r[label]: r for r in stats}
    priors = {k: by[k]["n"] / n_total for k in classes}
    means = {k: list(by[k]["mean"]) for k in classes}

    # pooled covariance: Σ = Σ_k Σ_i (x−μ_k)(x−μ_k)' / (n−K). Cross
    # terms need E[x_i x_j] per class — one more aggregate pass.
    prods = []
    for i in range(p):
        for j in range(i, p):
            prods.append(
                F.sum(F.col(features[i]) * F.col(features[j]))
                .alias(f"s_{i}_{j}"))
    rows = df.groupBy(label).agg(*prods).collect()
    sums = {r[label]: r for r in rows}
    cov = [[0.0] * p for _ in range(p)]
    for i in range(p):
        for j in range(i, p):
            tot = 0.0
            for k in classes:
                nk = by[k]["n"]
                tot += sums[k][f"s_{i}_{j}"] - nk * means[k][i] * means[k][j]
            c = tot / (n_total - len(classes))
            cov[i][j] = cov[j][i] = c
    return LDAModel(classes, priors, means, _inv(cov), features)


# ---------------------------------------------------------------------
# kNN — broadcast join (MLlib gap, SURVEY §7)
# ---------------------------------------------------------------------

def knn_predict(train: DataFrame, test: DataFrame, features: list[str],
                label: str, k: int = 1, id_col: str = "id") -> DataFrame:
    """k-nearest-neighbor classification (reference:
    KNeighborsClassifier(1), Assignment2_for_data_mining.ipynb:1029).

    Broadcast the (small) training set against the test set, rank by
    squared euclidean distance per test row, majority-vote the top k.
    At scale the train side must be LSH-pruned first
    (operators.similarity); this is the exact small-train path."""
    t = train.select(
        F.col(label).alias("__train_label"),
        *[F.col(f).alias(f"__t_{f}") for f in features],
    )
    dist = None
    for f in features:
        d = (F.col(f) - F.col(f"__t_{f}")) ** 2
        dist = d if dist is None else dist + d
    joined = test.crossJoin(F.broadcast(t)).withColumn("__dist", dist)
    w = Window.partitionBy(id_col).orderBy(F.asc("__dist"), F.asc("__train_label"))
    topk = joined.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") <= k)
    votes = (
        topk.groupBy(id_col, "__train_label")
        .agg(F.count(F.lit(1)).alias("votes"), F.min("__dist").alias("best"))
    )
    vw = Window.partitionBy(id_col).orderBy(
        F.desc("votes"), F.asc("best"), F.asc("__train_label"))
    winners = (
        votes.withColumn("__vr", F.row_number().over(vw))
        .filter(F.col("__vr") == 1)
        .select(id_col, F.col("__train_label").alias("prediction"))
    )
    return test.join(winners, id_col)
