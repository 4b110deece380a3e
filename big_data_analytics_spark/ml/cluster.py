"""Clustering + dimensionality reduction (SURVEY.md §2.9 M11-M13).
"""

from __future__ import annotations

from pyspark.ml.clustering import KMeans
from pyspark.ml.evaluation import ClusteringEvaluator
from pyspark.ml.feature import PCA, VectorAssembler
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def kmeans_fit(df: DataFrame, features: list[str], k: int, seed: int = 1):
    """KMeans (reference: sklearn KMeans(n_clusters=4),
    data_mining_Assignment1.ipynb clustering section). Returns
    (model, predictions_df, inertia)."""
    assembled = VectorAssembler(inputCols=features, outputCol="__features").transform(df)
    model = KMeans(featuresCol="__features", k=k, seed=seed).fit(assembled)
    preds = model.transform(assembled)
    return model, preds, model.summary.trainingCost


def elbow_curve(df: DataFrame, features: list[str],
                ks=range(2, 7), seed: int = 1) -> dict[int, float]:
    """Inertia per k (the reference's elbow loop)."""
    return {k: kmeans_fit(df, features, k, seed)[2] for k in ks}


def silhouette(preds: DataFrame) -> float:
    """Squared-euclidean silhouette (reference: silhouette_score).
    MLlib's evaluator is the distributed form; sklearn's exact
    pairwise silhouette is O(n²) and intentionally not reproduced."""
    return ClusteringEvaluator(
        featuresCol="__features", predictionCol="prediction",
        metricName="silhouette").evaluate(preds)


def davies_bouldin(preds: DataFrame, features: list[str]) -> float:
    """Davies–Bouldin index from per-cluster aggregates (reference:
    davies_bouldin_score) — centroids and mean dispersions are one
    groupBy; the K×K comparison runs on the driver."""
    import math

    cents = (
        preds.groupBy("prediction")
        .agg(*[F.avg(f).alias(f"c_{f}") for f in features],
             F.count(F.lit(1)).alias("n"))
        .collect()
    )
    centroids = {r.prediction: [r[f"c_{f}"] for f in features] for r in cents}
    disp = {}
    for k, c in centroids.items():
        d = None
        for j, f in enumerate(features):
            t = (F.col(f) - F.lit(c[j])) ** 2
            d = t if d is None else d + t
        disp[k] = (
            preds.filter(F.col("prediction") == k)
            .agg(F.avg(F.sqrt(d))).first()[0]
        )
    ks = sorted(centroids)
    worst = []
    for a in ks:
        best = 0.0
        for b in ks:
            if a == b:
                continue
            dist = math.sqrt(sum((x - y) ** 2 for x, y in
                             zip(centroids[a], centroids[b])))
            best = max(best, (disp[a] + disp[b]) / dist)
        worst.append(best)
    return sum(worst) / len(worst)


def pca_fit(df: DataFrame, features: list[str], n_components: int):
    """PCA with explained variance (reference: sklearn PCA,
    data_mining_Assignment1.ipynb dimensionality section). Returns
    (model, transformed_df, explained_variance_ratios)."""
    assembled = VectorAssembler(inputCols=features, outputCol="__features").transform(df)
    model = PCA(inputCol="__features", outputCol="pca",
                k=n_components).fit(assembled)
    return model, model.transform(assembled), list(model.explainedVariance)


def cumulative_explained_variance(ratios: list[float]) -> list[float]:
    """np.cumsum analogue on the (tiny) ratio list."""
    out, acc = [], 0.0
    for r in ratios:
        acc += r
        out.append(acc)
    return out


def calinski_harabasz(preds: DataFrame, features: list[str]) -> float:
    """Calinski–Harabasz index = (B/(k−1)) / (W/(n−k)) from the same
    per-cluster aggregates as Davies–Bouldin (reference:
    calinski_harabasz_score — SURVEY §2.9 M11)."""
    stats = (
        preds.groupBy("prediction")
        .agg(*[F.avg(f).alias(f"c_{f}") for f in features],
             F.count(F.lit(1)).alias("n"),
             *[F.sum(F.pow(F.col(f), 2)).alias(f"ss_{f}") for f in features])
        .collect()
    )
    n_total = sum(r.n for r in stats)
    k = len(stats)
    grand = [sum(r[f"c_{f}"] * r.n for r in stats) / n_total for f in features]
    between = sum(
        r.n * sum((r[f"c_{f}"] - g) ** 2 for f, g in zip(features, grand))
        for r in stats
    )
    # within-SS per cluster: Σx² − n·c² (per feature)
    within = sum(
        sum(r[f"ss_{f}"] - r.n * r[f"c_{f}"] ** 2 for f in features)
        for r in stats
    )
    return (between / (k - 1)) / (within / (n_total - k))


def pca_reconstruction_error(df: DataFrame, features: list[str],
                             n_components: int) -> float:
    """Mean squared reconstruction error of a k-component PCA
    (reference: inverse_transform MSE, data_mining_Assignment1.ipynb
    dimensionality section — SURVEY §2.9 M12).

    For mean-centered data, MSE = total variance − variance captured
    by the k components; computed from the PCA model's explained
    variance without materializing reconstructions. The identity holds
    exactly for the optimal linear projection, so no per-row
    pc @ loadingsᵀ pass is needed."""
    from pyspark.ml.feature import VectorAssembler
    from pyspark.ml.stat import Summarizer

    assembled = VectorAssembler(inputCols=features, outputCol="__features").transform(df)
    model = PCA(inputCol="__features", outputCol="pca",
                k=n_components).fit(assembled)
    variances = assembled.select(
        Summarizer.variance(F.col("__features")).alias("v")).first().v
    total_var = float(sum(variances))
    captured = total_var * float(sum(model.explainedVariance))
    # per-feature mean squared error = residual variance / n_features
    return (total_var - captured) / len(features)
