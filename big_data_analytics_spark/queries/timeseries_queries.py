"""Registry surface for the sequential-recursion operators.

EMA has no ANSI-SQL equivalent (recursive dependence on the previous
output — DuckDB has no EWM either), so this is one of the declared
rows-only entries: exact validation lives in tests/test_timeseries.py
(closed-form recursion + partition invariance).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from big_data_analytics_spark.catalog import load_table
from big_data_analytics_spark.operators.timeseries import ema
from big_data_analytics_spark.queries import query


@query("ts1_ema_user_value")
def ts1_ema_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user EMA (alpha=0.3) of event values over event time —
    summarized per user (last smoothed value + event count) so the
    result is small and deterministic."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "value")
    smoothed = ema(ev, key="user_id", ts="ts", value="value",
                   alpha=0.3, tiebreak="event_id")
    last = smoothed.groupBy("user_id").agg(
        F.max_by("ema", F.struct(F.col("ts"), F.col("event_id")))
        .alias("final_ema"),
        F.count(F.lit(1)).alias("n_events"),
    )
    return last.select(
        "user_id",
        F.round(F.col("final_ema"), 9).alias("final_ema"),
        "n_events",
    )
