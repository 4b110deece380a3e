"""EMA operator: exact closed-form recursion, partition invariance,
and ordering determinism."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from big_data_analytics_spark.operators.timeseries import ema, ema_partitioned


def _expected_ema(values, alpha):
    out = [values[0]]
    for x in values[1:]:
        out.append(alpha * x + (1 - alpha) * out[-1])
    return out


def test_ema_matches_recursion(spark):
    vals = [10.0, 12.0, 8.0, 14.0, 11.0, 9.0]
    df = spark.createDataFrame(
        [(1, i, v) for i, v in enumerate(vals)] +
        [(2, i, 2 * v) for i, v in enumerate(vals)],
        ["user_id", "t", "value"],
    )
    got = ema(df, key="user_id", ts="t", value="value", alpha=0.4)
    for uid, scale in [(1, 1.0), (2, 2.0)]:
        rows = (got.filter(F.col("user_id") == uid).orderBy("t")
                .select("ema").collect())
        exp = _expected_ema([scale * v for v in vals], 0.4)
        assert [r.ema for r in rows] == pytest.approx(exp, abs=1e-12)


def test_ema_partition_invariant(spark):
    df = spark.range(0, 2000).select(
        (F.col("id") % 7).alias("user_id"),
        F.col("id").alias("t"),
        (F.sin(F.col("id").cast("double")) * 10).alias("value"),
    )
    a = ema(df.coalesce(1), "user_id", "t", "value", 0.25)
    b = ema(df.repartition(8), "user_id", "t", "value", 0.25)
    canon = lambda d: sorted(  # noqa: E731
        (r.user_id, r.t, round(r.ema, 12)) for r in d.collect())
    assert canon(a) == canon(b)


def test_ema_rejects_bad_alpha(spark):
    df = spark.createDataFrame([(1, 1, 1.0)], ["user_id", "t", "value"])
    with pytest.raises(ValueError, match="alpha"):
        ema(df, "user_id", "t", "value", 0.0)


def test_ema_partitioned_matches_sequential(spark):
    """The range-stitched EMA must reproduce the single-group
    recursion to float precision, including across range boundaries
    and for a key whose history spans many ranges (the skew case)."""
    df = spark.range(0, 3000).select(
        (F.col("id") % 3).alias("user_id"),
        F.col("id").alias("t"),
        (F.sin(F.col("id").cast("double")) * 10 + 5).alias("value"),
    )
    seq = ema(df, "user_id", "t", "value", 0.3)
    par = ema_partitioned(df, "user_id", "t", "value", 0.3,
                          range_col=(F.col("t") / 100).cast("long"))
    j = (seq.withColumnRenamed("ema", "e_seq")
         .join(par.withColumnRenamed("ema", "e_par"),
               ["user_id", "t", "value"]))
    assert j.count() == 3000
    bad = j.filter(
        F.abs(F.col("e_seq") - F.col("e_par"))
        > 1e-9 * (F.abs(F.col("e_seq")) + 1e-9)).count()
    assert bad == 0


def test_ema_partitioned_single_range_degenerates(spark):
    """With one range the stitched path IS the sequential path."""
    df = spark.createDataFrame(
        [(1, i, float(v)) for i, v in enumerate([5, 9, 2, 7])],
        ["user_id", "t", "value"])
    par = ema_partitioned(df, "user_id", "t", "value", 0.5,
                          range_col=F.lit(0))
    got = [r.ema for r in par.orderBy("t").collect()]
    assert got == pytest.approx(_expected_ema([5.0, 9.0, 2.0, 7.0], 0.5),
                                abs=1e-12)


def test_holt_linear_matches_sequential_replay(spark):
    """holt_linear == an explicit driver-side replay of the coupled
    recursion, independent of input partitioning."""
    import pandas as pd
    from big_data_analytics_spark.operators.timeseries import holt_linear
    rows = [(k, t, float(v)) for k in (1, 2)
            for t, v in enumerate([5, 9, 2, 7, 7, 1, 8][: 5 + k])]
    df = spark.createDataFrame(rows, "k long, t long, value double")
    out = {r.k: r for r in
           holt_linear(df.repartition(7), key="k", ts="t",
                       value="value", alpha=0.4, beta=0.3).collect()}
    for k in (1, 2):
        xs = [float(v) for _, t, v in
              [r for r in rows if r[0] == k]]
        level, trend = xs[0], 0.0
        for x in xs[1:]:
            nl = 0.4 * x + 0.6 * (level + trend)
            trend = 0.3 * (nl - level) + 0.7 * trend
            level = nl
        assert out[k].final_level == level, k
        assert out[k].final_trend == trend, k
        assert out[k].n == len(xs)


def test_holt_linear_rejects_bad_params(spark):
    import pytest as _pytest
    from big_data_analytics_spark.operators.timeseries import holt_linear
    df = spark.createDataFrame([(1, 1, 1.0)], "k long, t long, value double")
    with _pytest.raises(ValueError):
        holt_linear(df, key="k", ts="t", value="value",
                    alpha=0.0, beta=0.5)
