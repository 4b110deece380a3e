"""Per-key sequential recursions (EMA & friends) — the one aggregate
family no Spark window frame can express (y_t depends on y_{t-1}, not
on a frame of inputs), so this is the sanctioned Pandas-UDF tier:
shuffle once by key, run the vectorized recursion per group in Arrow
batches.

Scale shape: one exchange on the key (same as any groupBy), then
C-speed pandas ewm inside each group; memory is bounded by the
largest single key's history. For keys too hot for that bound,
:func:`ema_partitioned` splits each key by a coarse time range and
stitches ranges with a carry term — EMA is a *linear* recurrence, so
a range's output is ``local (carry=0) + carry_in · (1−α)^(pos+1)``
exactly, and the carry recurrence runs over per-range summaries (a
few rows per key), never the raw history.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from big_data_analytics_spark.operators.joins import sized_side


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


def ema_partitioned(df: DataFrame, key: str, ts: str, value: str,
                    alpha: float, range_col: Column,
                    tiebreak: str | None = None,
                    out_col: str = "ema") -> DataFrame:
    """EMA for skewed keys: identical semantics to :func:`ema`, but no
    single task ever holds a key's full history.

    Three stages, all bounded:

    1. **Local pass** — group by (key, range): per-row EMA assuming a
       zero carry-in (recursion seeded with 0) plus the row's decay
       factor ``(1−α)^(pos+1)``; per-range summary (end value, total
       decay, first x).
    2. **Stitch** — per key over the tiny per-range summary (one row
       per range): ``carry_0 = first_x`` (reproduces y_0 = x_0),
       ``carry_{r+1} = local_end_r + decay_r · carry_r``.
    3. **Apply** — join carries back (measured-pinned: broadcast only
       while the (|keys| × |ranges|) summary is under the repo
       ceiling) and add ``carry · (1−α)^(pos+1)`` to each local
       value.

    Exact in real arithmetic; float results agree with the sequential
    recursion to ~1e-12 relative (powers computed once per row).
    """
    if not 0.0 < alpha <= 1.0:
        raise ValueError(f"alpha must be in (0, 1], got {alpha}")
    order = [ts] + ([tiebreak] if tiebreak else [])
    ranged = df.withColumn("__range", range_col)

    local_schema = T.StructType(
        ranged.schema.fields + [
            T.StructField("__local", T.DoubleType()),
            T.StructField("__decay", T.DoubleType()),
        ])

    def local_pass(pdf):
        import numpy as np
        pdf = pdf.sort_values(order, kind="mergesort")
        x = pdf[value].to_numpy(dtype=np.float64)
        # recursion seeded with 0: prepend 0, ewm, drop the seed
        import pandas as pd
        seeded = pd.Series(np.concatenate(([0.0], x)))
        local = seeded.ewm(alpha=alpha, adjust=False).mean().to_numpy()[1:]
        pos = np.arange(1, len(x) + 1, dtype=np.float64)
        pdf["__local"] = local
        pdf["__decay"] = np.power(1.0 - alpha, pos)
        return pdf

    local = ranged.groupBy(key, "__range").applyInPandas(
        local_pass, local_schema)

    order_key = F.struct(*[F.col(c) for c in order])
    summary = local.groupBy(key, "__range").agg(
        F.max_by("__local", order_key).alias("__local_end"),
        F.min("__decay").alias("__range_decay"),  # (1-a)^n = smallest
        F.min_by(F.col(value), order_key).alias("__first_x"),
    )

    stitch_schema = (f"{key} {dict(df.dtypes)[key]}, __range "
                     f"{dict(summary.dtypes)['__range']}, __carry double")

    def stitch(pdf):
        import pandas as pd
        pdf = pdf.sort_values("__range")
        carry, carries = None, []
        for _, row in pdf.iterrows():
            if carry is None:
                carry = row["__first_x"]
            carries.append(carry)
            carry = row["__local_end"] + row["__range_decay"] * carry
        return pd.DataFrame({key: pdf[key], "__range": pdf["__range"],
                             "__carry": carries})

    # carries is (|keys| x |ranges|)-sized — it GROWS with the key
    # universe, so the attachment is measured-pinned (checkpoint so
    # the count doesn't re-run the stitch, then broadcast only under
    # the repo ceiling; sort-merge past it)
    carries = (summary.groupBy(key).applyInPandas(stitch, stitch_schema)
               .localCheckpoint())

    return (
        local.join(sized_side(carries, carries.count()), [key, "__range"])
        .withColumn(out_col,
                    F.col("__local") + F.col("__carry") * F.col("__decay"))
        .drop("__range", "__local", "__decay", "__carry")
    )


def holt_linear(df: DataFrame, key: str, ts: str, value: str,
                alpha: float, beta: float,
                tiebreak: str | None = None) -> DataFrame:
    """Holt's linear (double exponential) smoothing per key, ordered
    by (ts, tiebreak): level l_0 = x_0, trend b_0 = 0, then

        l_t = alpha*x_t + (1-alpha)*(l_{t-1} + b_{t-1})
        b_t = beta*(l_t - l_{t-1}) + (1-beta)*b_{t-1}

    Returns one row per key: (key, final_level, final_trend, n) —
    the state a forecaster needs (h-step forecast = level +
    h*trend). The sequential recursion is bit-reproducible across
    engines when the operation order is spelled identically (module
    docstring; the ts1/EMA precedent). For skewed keys the
    ema_partitioned range-stitching generalizes: the coupled
    recurrence is linear, so per-range 2x2 matrix carries compose —
    not needed at the tested key cardinalities."""
    if not 0.0 < alpha <= 1.0 or not 0.0 <= beta <= 1.0:
        raise ValueError(f"bad smoothing params alpha={alpha} beta={beta}")
    order = [ts] + ([tiebreak] if tiebreak else [])
    schema = T.StructType([
        df.schema[key],
        T.StructField("final_level", T.DoubleType()),
        T.StructField("final_trend", T.DoubleType()),
        T.StructField("n", T.LongType()),
    ])

    def fn(pdf):
        import pandas as pd
        pdf = pdf.sort_values(order, kind="mergesort")
        xs = pdf[value].tolist()
        level, trend = xs[0], 0.0
        for x in xs[1:]:
            # identical op order to the oracle's list_reduce lambda
            new_level = alpha * x + (1.0 - alpha) * (level + trend)
            trend = beta * (new_level - level) + (1.0 - beta) * trend
            level = new_level
        return pd.DataFrame({key: [pdf[key].iloc[0]],
                             "final_level": [level],
                             "final_trend": [trend],
                             "n": [len(xs)]})

    return df.groupBy(key).applyInPandas(fn, schema)
