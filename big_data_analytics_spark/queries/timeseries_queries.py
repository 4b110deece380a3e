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
from big_data_analytics_spark.operators.timeseries import ema
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
