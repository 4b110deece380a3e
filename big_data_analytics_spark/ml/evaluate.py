"""Model-quality metrics as single-pass aggregates (SURVEY.md §2.9 M19).

The reference computes MSE/MAE/RMSE/MAPE/SMAPE/log-loss via sklearn on
materialized arrays; every one of them is a one-line column aggregate,
so they run in the same job as the prediction instead of collecting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def regression_metrics(pred: DataFrame, label: str = "label",
                       prediction: str = "prediction") -> dict[str, float]:
    err = F.col(label) - F.col(prediction)
    ape = F.abs(err) / F.abs(F.col(label))
    sape = 2 * F.abs(err) / (F.abs(F.col(label)) + F.abs(F.col(prediction)))
    row = pred.agg(
        F.avg(err ** 2).alias("mse"),
        F.avg(F.abs(err)).alias("mae"),
        F.sqrt(F.avg(err ** 2)).alias("rmse"),
        F.avg(ape).alias("mape"),
        F.avg(sape).alias("smape"),
    ).first()
    return {k: row[k] for k in ("mse", "mae", "rmse", "mape", "smape")}


def log_loss(pred: DataFrame, label: str = "label",
             prob: str = "p1", eps: float = 1e-15) -> float:
    """Binary cross-entropy over a probability column (reference:
    sklearn log_loss, data_mining_Assignment1.ipynb)."""
    p = F.least(F.greatest(F.col(prob), F.lit(eps)), F.lit(1 - eps))
    l = F.col(label).cast("double")
    return pred.agg(
        -F.avg(l * F.log(p) + (1 - l) * F.log(1 - p))
    ).first()[0]


def roc_auc(pred: DataFrame, label: str = "label", score: str = "p1") -> float:
    """AUC via the rank-sum (Mann–Whitney) identity, histogram-first
    (the graded ml13_roc_auc shape, queries/ml_queries.py): aggregate
    to the distinct-score histogram BEFORE the only ordered window, so
    the window input is |distinct scores| rows — model scores are
    heavily quantized in practice; quantize upstream if truly
    continuous. Midranks enter as 2*R1 = sum pos_v*(2*below_v + n_v
    + 1), exact integers until the final division; ties handled by
    average rank identically to the previous per-row form."""
    h = (pred.groupBy(score)
         .agg(F.count(F.lit(1)).cast("long").alias("__n"),
              F.sum(F.col(label).cast("long")).cast("long").alias("__pos")))
    wb = Window.orderBy(score).rowsBetween(Window.unboundedPreceding, -1)
    cum = h.select(
        "__n", "__pos",
        F.coalesce(F.sum("__n").over(wb), F.lit(0)).cast("long")
        .alias("__below"))
    row = cum.agg(
        F.sum(F.col("__pos") * (2 * F.col("__below") + F.col("__n") + 1))
        .alias("r2"),
        F.sum("__pos").alias("npos"),
        F.sum(F.col("__n") - F.col("__pos")).alias("nneg"),
    ).first()
    if not row.npos or not row.nneg:
        return float("nan")
    return (row.r2 / 2 - row.npos * (row.npos + 1) / 2) / (row.npos * row.nneg)


def describe_exact(pred: DataFrame, cols: list[str]) -> DataFrame:
    """pandas describe() with EXACT quartiles (Spark's summary() uses
    approx percentiles — SURVEY §2.4 A8 pin). One aggregate pass; rows:
    count/mean/std/min/25%/50%/75%/max, one column per input."""
    aggs = []
    for c in cols:
        col = F.col(c)
        aggs += [
            F.count(col).alias(f"{c}__count"),
            F.avg(col).alias(f"{c}__mean"),
            F.stddev_samp(col).alias(f"{c}__std"),
            F.min(col).alias(f"{c}__min"),
            F.percentile(col, F.lit(0.25)).alias(f"{c}__25%"),
            F.percentile(col, F.lit(0.5)).alias(f"{c}__50%"),
            F.percentile(col, F.lit(0.75)).alias(f"{c}__75%"),
            F.max(col).alias(f"{c}__max"),
        ]
    row = pred.agg(*aggs).first()
    stats = ["count", "mean", "std", "min", "25%", "50%", "75%", "max"]
    data = [tuple([s] + [float(row[f"{c}__{s}"]) for c in cols]) for s in stats]
    spark = pred.sparkSession
    return spark.createDataFrame(data, ["summary"] + list(cols))


def multiclass_metrics(pred: DataFrame, label: str = "label",
                       prediction: str = "prediction") -> dict[str, float]:
    """Accuracy + macro precision/recall/F1 from the confusion counts —
    one groupBy, driver-side O(K²) arithmetic."""
    counts = pred.groupBy(label, prediction).count().collect()
    classes = sorted({r[label] for r in counts} | {r[prediction] for r in counts})
    tp = {k: 0 for k in classes}
    fp = {k: 0 for k in classes}
    fn = {k: 0 for k in classes}
    total = correct = 0
    for r in counts:
        total += r["count"]
        if r[label] == r[prediction]:
            tp[r[label]] += r["count"]
            correct += r["count"]
        else:
            fn[r[label]] += r["count"]
            fp[r[prediction]] += r["count"]
    precs, recs, f1s = [], [], []
    for k in classes:
        p = tp[k] / (tp[k] + fp[k]) if tp[k] + fp[k] else 0.0
        r_ = tp[k] / (tp[k] + fn[k]) if tp[k] + fn[k] else 0.0
        precs.append(p); recs.append(r_)
        f1s.append(2 * p * r_ / (p + r_) if p + r_ else 0.0)
    n = len(classes)
    return {"accuracy": correct / total,
            "macro_precision": sum(precs) / n,
            "macro_recall": sum(recs) / n,
            "macro_f1": sum(f1s) / n}
