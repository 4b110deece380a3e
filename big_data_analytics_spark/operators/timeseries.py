"""Per-key sequential recursions (EMA & friends) — the one aggregate
family no Spark window frame can express (y_t depends on y_{t-1}, not
on a frame of inputs), so this is the sanctioned Pandas-UDF tier:
shuffle once by key, run the vectorized recursion per group in Arrow
batches.

Scale shape: one exchange on the key (same as any groupBy), then
C-speed pandas ewm inside each group; memory is bounded by the
largest single key's history, which is the irreducible requirement of
a sequential recursion. Skewed keys: salt by coarse time range first
and stitch with a per-range carry-in (not implemented here — at that
point the right tool is the streaming stateful operator).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import types as T


def ema(df: DataFrame, key: str, ts: str, value: str, alpha: float,
        tiebreak: str | None = None, out_col: str = "ema") -> DataFrame:
    """Exponential moving average per key, ordered by (ts, tiebreak):
    y_0 = x_0; y_t = alpha*x_t + (1-alpha)*y_{t-1} (pandas
    ``ewm(adjust=False)`` semantics). Output schema = input + out_col."""
    if not 0.0 < alpha <= 1.0:
        raise ValueError(f"alpha must be in (0, 1], got {alpha}")
    order = [ts] + ([tiebreak] if tiebreak else [])
    schema = T.StructType(
        df.schema.fields + [T.StructField(out_col, T.DoubleType())])

    def fn(pdf):
        pdf = pdf.sort_values(order, kind="mergesort")
        pdf[out_col] = pdf[value].ewm(alpha=alpha, adjust=False).mean()
        return pdf

    return df.groupBy(key).applyInPandas(fn, schema)
