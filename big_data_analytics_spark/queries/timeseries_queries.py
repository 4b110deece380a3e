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

from pyspark.sql import DataFrame, SparkSession
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
