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
    """AUC via the rank-sum (Mann–Whitney) identity over a window rank
    — no curve materialization, ties handled by average rank."""
    ranked = pred.withColumn(
        "__r",
        F.avg(F.row_number().over(Window.orderBy(F.col(score))).cast("double"))
        .over(Window.partitionBy(score)),
    )
    row = ranked.agg(
        F.sum(F.when(F.col(label) == 1, F.col("__r"))).alias("rpos"),
        F.sum(F.when(F.col(label) == 1, 1).otherwise(0)).alias("npos"),
        F.sum(F.when(F.col(label) == 0, 1).otherwise(0)).alias("nneg"),
    ).first()
    if not row.npos or not row.nneg:
        return float("nan")
    return (row.rpos - row.npos * (row.npos + 1) / 2) / (row.npos * row.nneg)
