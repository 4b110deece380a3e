"""The engine's three UDF tiers (SURVEY.md §2.11).

Policy, in order of preference:

1. **SQL expression** — JVM-side, whole-stage codegen, free Catalyst
   optimization. Every X1-X10 function in the reference that is pure
   arithmetic/logic lands here (e.g. the sigmoid at
   data_mining_Assignment1.ipynb:995 is one line of `exp`).
2. **Vectorized pandas_udf** — Arrow-batched columnar transfer,
   ~10-100× faster than row UDFs; for genuinely opaque Python logic
   over columns.
3. **Grouped applyInPandas** — the UDAF/UDTF analogue: whole groups as
   pandas DataFrames (the reference's per-resample model refits,
   codes_in_book_of_statisct.ipynb:8664-8678).

Tier 2/3 exist for when tier 1 *can't* express the logic — tests
assert tier 1 and tier 2 agree on the overlap, which is exactly why
tier 1 should win whenever available.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType


# --------------------------------------------------------------------
# Tier 1 — expressions (the preferred path)
# --------------------------------------------------------------------

def sigmoid_expr(col: Column) -> Column:
    """X8 (`logistic(x)` = 1/(1+e^-x)) as a pure expression."""
    return 1.0 / (1.0 + F.exp(-col))


def salary_score_expr(gpa: Column) -> Column:
    """X10 (`salary_difference_by_gpa`) — a linear scoring fn is just
    column arithmetic (Assignment2_for_data_mining.ipynb:43)."""
    return 5000.0 * gpa + 20000.0


# --------------------------------------------------------------------
# Tier 2 — vectorized pandas UDF (Arrow batches)
# --------------------------------------------------------------------

# NB: a DataType instance, not a DDL string — string return types are
# parsed at decoration time and require an active SparkSession, which
# breaks plain module import
@pandas_udf(DoubleType())
def sigmoid_pandas(v: pd.Series) -> pd.Series:
    """The same sigmoid as an Arrow-batched UDF — exists to demonstrate
    the tier (and to be the template for genuinely opaque logic, e.g. a
    compiled scoring model). Tests assert it matches sigmoid_expr."""
    import numpy as np
    return 1.0 / (1.0 + np.exp(-v))


# --------------------------------------------------------------------
# Tier 3 — grouped applyInPandas (UDAF/UDTF analogue)
# --------------------------------------------------------------------

def grouped_ols(df: DataFrame, group_cols: list[str], x: str, y: str) -> DataFrame:
    """Per-group OLS refit via applyInPandas — the reference's
    boot_OLS-per-resample pattern (X5). Each group becomes a pandas
    frame on an executor; output is one coefficient row per group.

    For the single-feature case this duplicates `regr_slope`/
    `regr_intercept` (tier 1 — see a10_corr_regression); it exists for
    the general case (arbitrary sklearn/statsmodels estimators per
    group) and is tested against the tier-1 closed form.
    """
    out_schema = ", ".join(
        [f"{c} string" for c in group_cols] + ["slope double",
                                               "intercept double",
                                               "n bigint"])

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np
        xs, ys = pdf[x].to_numpy(), pdf[y].to_numpy()
        xm, ym = xs.mean(), ys.mean()
        denom = ((xs - xm) ** 2).sum()
        slope = float(((xs - xm) * (ys - ym)).sum() / denom) if denom else float("nan")
        return pd.DataFrame([
            {**{c: pdf[c].iloc[0] for c in group_cols},
             "slope": slope,
             "intercept": float(ym - slope * xm),
             "n": len(pdf)}
        ])

    return df.groupBy(*group_cols).applyInPandas(fit, schema=out_schema)
