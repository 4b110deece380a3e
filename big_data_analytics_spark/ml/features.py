"""Feature engineering: assembly, scaling, encoding, splits, polynomial
terms (SURVEY.md §2.9 M2, M15-M17; §2.2 P14, P19).
"""

from __future__ import annotations

from pyspark.ml.feature import (
    MinMaxScaler,
    OneHotEncoder,
    StandardScaler,
    StringIndexer,
    VectorAssembler,
)
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def assemble(df: DataFrame, cols: list[str], out: str = "features") -> DataFrame:
    """Numeric columns → MLlib vector (the notebooks' np.column_stack)."""
    return VectorAssembler(inputCols=cols, outputCol=out).transform(df)


def standard_scale(df: DataFrame, cols: list[str], out: str = "scaled") -> DataFrame:
    """Z-score scaling (reference: sklearn StandardScaler,
    codes_in_book_of_statisct.ipynb:7293)."""
    assembled = assemble(df, cols, "__raw")
    model = StandardScaler(inputCol="__raw", outputCol=out,
                           withMean=True, withStd=True).fit(assembled)
    return model.transform(assembled).drop("__raw")


def min_max_scale(df: DataFrame, cols: list[str], out: str = "scaled") -> DataFrame:
    assembled = assemble(df, cols, "__raw")
    model = MinMaxScaler(inputCol="__raw", outputCol=out).fit(assembled)
    return model.transform(assembled).drop("__raw")


def one_hot(df: DataFrame, col: str, out_prefix: str | None = None,
            drop_last: bool = True) -> DataFrame:
    """pd.get_dummies(drop_first=True) analogue (reference:
    codes_in_book_of_statisct.ipynb:7911)."""
    p = out_prefix or col
    idx = StringIndexer(inputCol=col, outputCol=f"{p}_idx",
                        stringOrderType="alphabetAsc").fit(df)
    enc = OneHotEncoder(inputCols=[f"{p}_idx"], outputCols=[f"{p}_onehot"],
                        dropLast=drop_last)
    indexed = idx.transform(df)
    return enc.fit(indexed).transform(indexed)


def polynomial_terms(df: DataFrame, col: str, degree: int) -> DataFrame:
    """Power columns col^1..col^degree (reference poly() design
    matrices, codes_in_book_of_statisct.ipynb:8221) as plain
    expressions — no vector round-trip needed for named terms."""
    out = df
    for d in range(2, degree + 1):
        out = out.withColumn(f"{col}_pow{d}", F.pow(F.col(col), d))
    return out


def train_test_split(df: DataFrame, test_frac: float = 0.5,
                     seed: int = 0) -> tuple[DataFrame, DataFrame]:
    """randomSplit wrapper (reference: sklearn train_test_split,
    BasicsDecisionTree.ipynb:775). Fractions are expected, not exact —
    exact-count splits don't parallelize."""
    train, test = df.randomSplit([1.0 - test_frac, test_frac], seed=seed)
    return train, test


def temporal_split(df: DataFrame, ts_col: str, cutoff) -> tuple[DataFrame, DataFrame]:
    """Train = before cutoff, test = from cutoff (reference: Smarket
    Year<2005 split, data_mining_Assignment1.ipynb:1561)."""
    return df.filter(F.col(ts_col) < cutoff), df.filter(F.col(ts_col) >= cutoff)


def impute_mean(df: DataFrame, cols: list[str], strategy: str = "mean") -> DataFrame:
    """Null imputation (reference: SimpleImputer(strategy='mean'),
    data_mining_Assignment1.ipynb — SURVEY §2.9 M16) via MLlib Imputer;
    imputed values replace the originals in place."""
    from pyspark.ml.feature import Imputer

    out_cols = [f"__imp_{c}" for c in cols]
    model = Imputer(inputCols=cols, outputCols=out_cols,
                    strategy=strategy).fit(df)
    imputed = model.transform(df)
    for c, o in zip(cols, out_cols):
        imputed = imputed.drop(c).withColumnRenamed(o, c)
    return imputed


def interaction_terms(df: DataFrame, pairs: list[tuple[str, str]]) -> DataFrame:
    """Pairwise interaction columns a_x_b = a*b (reference: the manual
    lstat*age term, codes_in_book_of_statisct.ipynb:7636 — SURVEY §2.9
    M2) as plain expressions."""
    out = df
    for a, b in pairs:
        out = out.withColumn(f"{a}_x_{b}", F.col(a) * F.col(b))
    return out
