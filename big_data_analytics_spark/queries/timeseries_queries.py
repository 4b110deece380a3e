"""Registry surface for the sequential-recursion operators.

EMA is a *sequential* recursion (y_t depends on y_{t-1}), which no
ANSI window frame expresses — but it IS a deterministic left fold, and
DuckDB's ``list_reduce`` over a per-key ordered array runs the exact
same IEEE op sequence (``alpha*x + (1-alpha)*acc``) as the pandas
``ewm(adjust=False)`` recursion inside the Spark operator (with
adjust=False the normalizing weight is exactly 1.0, so pandas'
``old_wt*avg + new_wt*x`` is the same two flops). Identical input
doubles + identical op order = bit-identical outputs, so the driver
gets a hard value-hash row with **no rounding at all** — the fold's
raw doubles compare exactly. (The array-at-once oracle is fine at
fixture scale; the Spark side never materializes a key's history
outside one Arrow batch, and the skew path stitches ranges —
operators/timeseries.py.)

Preconditions checked on the driver testdata: ``value`` has no NULLs
and (user_id, ts, event_id) is unique, so both engines sort
identically and the fold sees the same sequence.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from big_data_analytics_spark.catalog import load_table
from big_data_analytics_spark.operators.timeseries import ema, holt_linear
from big_data_analytics_spark.queries import query


@query(
    "ts1_ema_user_value",
    oracle="""
    SELECT user_id,
           list_reduce(list(value ORDER BY ts, event_id),
                       (acc, x) -> 0.3*x + 0.7*acc) AS final_ema,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM events
    GROUP BY user_id
    """,
)
def ts1_ema_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user EMA (alpha=0.3) of event values over event time —
    summarized per user (last smoothed value + event count) so the
    result is small and deterministic. Unrounded: the sequential fold
    is bit-reproducible across engines (module docstring)."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "value")
    smoothed = ema(ev, key="user_id", ts="ts", value="value",
                   alpha=0.3, tiebreak="event_id")
    return smoothed.groupBy("user_id").agg(
        F.max_by("ema", F.struct(F.col("ts"), F.col("event_id")))
        .alias("final_ema"),
        F.count(F.lit(1)).alias("n_events"),
    )


_HOLT_A = 0.4
_HOLT_B = 0.3


@query(
    "ts4_holt_trend",
    oracle=f"""
    WITH s AS (
        SELECT user_id,
               list_reduce(
                   list([value, 0.0]::DOUBLE[] ORDER BY ts, event_id),
                   (acc, e) -> [
                       {_HOLT_A}*e[1]
                       + {1.0 - _HOLT_A}*(acc[1] + acc[2]),
                       {_HOLT_B}*({_HOLT_A}*e[1]
                                  + {1.0 - _HOLT_A}*(acc[1] + acc[2])
                                  - acc[1])
                       + {1.0 - _HOLT_B}*acc[2]]) AS lb,
               CAST(COUNT(*) AS BIGINT) AS n_events
        FROM events GROUP BY user_id
    )
    SELECT user_id, lb[1] AS final_level, lb[2] AS final_trend,
           lb[1] + 3.0 * lb[2] AS forecast_3,
           n_events
    FROM s
    """,
)
def ts4_holt_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt's linear (level+trend) exponential smoothing per user
    (alpha={A}, beta={B}) over the event-time value series, emitting
    the final state and the 3-step-ahead forecast. Extends ts1's
    single-recurrence EMA to the COUPLED two-state recursion — the
    workhorse of operational forecasting. Unrounded: the sequential
    fold is bit-reproducible across engines when the operation order
    is spelled identically (the DuckDB oracle's list_reduce lambda
    recomputes the new level inside the trend update exactly as the
    Python loop does).

    Same scale anatomy as ts1: one shuffle on the key, per-key
    sequential Arrow-batched recursion; a skewed key would use the
    range-stitching in operators/timeseries.py (the coupled
    recurrence is linear, so 2x2 matrix carries compose across
    ranges)."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "value")
    out = holt_linear(ev, key="user_id", ts="ts", value="value",
                      alpha=_HOLT_A, beta=_HOLT_B, tiebreak="event_id")
    return out.select(
        "user_id", "final_level", "final_trend",
        (F.col("final_level") + 3.0 * F.col("final_trend"))
        .alias("forecast_3"),
        F.col("n").alias("n_events"))


ts4_holt_trend.__doc__ = ts4_holt_trend.__doc__.format(
    A=_HOLT_A, B=_HOLT_B)


_SEN_Q = 1_000_000  # slope micro-grid: micro-(value-cents)/day


@query(
    "ts8_theil_sen_trend",
    oracle=f"""
    WITH daily AS (
        SELECT user_id, date_trunc('day', ts) AS d,
               CAST(SUM(CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT))
                   AS BIGINT) AS c
        FROM events GROUP BY 1, 2
    ), pairs AS (
        SELECT a.user_id,
               CAST(FLOOR({_SEN_Q} * (b.c - a.c)
                          / date_diff('day', a.d, b.d)) AS BIGINT)
                   AS slope_q
        FROM daily a JOIN daily b
          ON b.user_id = a.user_id AND b.d > a.d
    ), ranked AS (
        SELECT user_id, slope_q,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY slope_q) AS rk,
               COUNT(*) OVER (PARTITION BY user_id) AS np
        FROM pairs
    ), med AS (
        SELECT user_id, slope_q AS sen_slope_q, np
        FROM ranked WHERE rk = (np + 1) // 2
    )
    SELECT d.user_id,
           CAST(COUNT(*) AS BIGINT) AS n_days,
           m.np AS n_pairs,
           m.sen_slope_q
    FROM daily d JOIN med m USING (user_id)
    GROUP BY d.user_id, m.np, m.sen_slope_q
    """,
)
def ts8_theil_sen_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen robust trend per user: the median of all pairwise
    slopes of the user's daily spend series — the standard
    outlier-resistant alternative to ts4's least-squares-flavored
    Holt trend (a single spiked day moves an OLS slope arbitrarily,
    but moves the pairwise-slope MEDIAN not at all; breakdown point
    ~29%). Each pairwise slope is the exact rational (cents_j -
    cents_i) / (days_j - days_i) floor-quantized to a 1e-6 grid, and
    the per-user median is the EXACT lower median (rank (n+1)//2
    over the sorted quantized slopes — the a8 exact-percentile
    discipline, no interpolation, no float comparator), so the whole
    estimator is integer-deterministic on both engines.

    Scale shape: the daily rollup is one map-side-combinable
    groupBy; the pair expansion is a per-user self-join whose fan-out
    is bounded by the per-user DAY count (~days^2/2 pairs per user,
    independent of event volume — the gr5 bounded-expansion class,
    and the reason the expansion runs on the daily rollup, never raw
    events); the median is one per-user window over the bounded pair
    set. At 100 TB: users parallelize embarrassingly, and per-user
    cost is capped by the calendar, not the data."""
    ev = load_table(spark, sf_dir, "events")
    daily = (ev.groupBy(
        "user_id", F.date_trunc("day", F.col("ts")).alias("d"))
        .agg(F.sum(F.floor(F.col("value") * 100.0 + 0.5).cast("long"))
             .cast("long").alias("c")))
    a = daily.select("user_id", F.col("d").alias("d1"),
                     F.col("c").alias("c1"))
    b = daily.select("user_id", F.col("d").alias("d2"),
                     F.col("c").alias("c2"))
    pairs = (a.join(b, "user_id")
             .filter(F.col("d2") > F.col("d1"))
             .select("user_id",
                     F.floor(F.lit(_SEN_Q) * (F.col("c2") - F.col("c1"))
                             / F.datediff("d2", "d1")).cast("long")
                     .alias("slope_q")))
    w = Window.partitionBy("user_id").orderBy("slope_q")
    med = (pairs
           .withColumn("rk", F.row_number().over(w))
           .withColumn("np", F.count(F.lit(1)).over(
               Window.partitionBy("user_id")))
           .filter(F.col("rk") == F.expr("(np + 1) div 2"))
           .select("user_id", F.col("slope_q").alias("sen_slope_q"),
                   F.col("np").cast("long").alias("n_pairs")))
    ndays = daily.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_days"))
    return (ndays.join(med, "user_id")
            .select("user_id", "n_days", "n_pairs", "sen_slope_q"))
