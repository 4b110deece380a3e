"""Window functions & sessionization (SURVEY.md §2.5).

The reference computes window-style results at data-generation time
(lag-based dwell times, dataset_generator.py:273-274; session bounds,
:263-321); here they're derived at query time with window functions and
a gap-based sessionizer.

All window frames carry a deterministic total order (timestamp + id
tie-break) so results are reproducible across engines and runs — an
under-specified ORDER BY is a correctness bug at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from big_data_analytics_spark.catalog import load_table
from big_data_analytics_spark.functions.money import money_cents
from big_data_analytics_spark.queries import query


# --------------------------------------------------------------------
# W1 — lag feature. Reference: hour_lag1 = np.roll(y,1); Lag1..Lag5
# columns (SURVEY §2.5 W1).
# --------------------------------------------------------------------
@query(
    "w1_event_lag_delta",
    oracle="""
    SELECT event_id, user_id, value,
           value - LAG(value) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS delta
    FROM events
    """,
)
def w1_event_lag_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user lag-1 difference over event time."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "event_id", "user_id", "value",
        (F.col("value") - F.lag("value").over(w)).alias("delta"),
    )


# --------------------------------------------------------------------
# W5 — running (cumulative) sum. Reference: np.cumsum of explained
# variance (SURVEY §2.5 W5). DECIMAL accumulator: a running double sum
# is association-order-dependent (Spark folds sequentially, other
# engines use segment trees) — decimal makes it exact everywhere.
# --------------------------------------------------------------------
@query(
    "w5_customer_running_spend",
    oracle="""
    SELECT o_orderkey, o_custkey,
           CAST(SUM(CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT))
                OVER (PARTITION BY o_custkey
                      ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS DOUBLE) / 100.0 AS running_spend
    FROM orders
    """,
)
def w5_customer_running_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer running spend in order-date order."""
    orders = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return orders.select(
        "o_orderkey", "o_custkey",
        (F.sum(money_cents("o_totalprice")).over(w).cast("double") / 100.0)
        .alias("running_spend"),
    )


# --------------------------------------------------------------------
# W4/W6 — top-1-per-group via ranked window (argmax / last-by-order).
# Reference: price_history[-1] after sort (dataset_generator.py:208-209),
# np.argmax (SURVEY §2.5 W4, W6).
# --------------------------------------------------------------------
@query(
    "w4_latest_order_per_customer",
    oracle="""
    SELECT o_custkey, o_orderkey AS latest_orderkey,
           strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS latest_orderdate,
           o_totalprice AS latest_total
    FROM (
        SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
               ROW_NUMBER() OVER (PARTITION BY o_custkey
                                  ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        FROM orders
    ) WHERE rn = 1
    """,
)
def w4_latest_order_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-element-by-order per key (row_number window + rank filter)."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_orderdate"), F.desc("o_orderkey")
    )
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "o_custkey",
            F.col("o_orderkey").alias("latest_orderkey"),
            F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss")
            .alias("latest_orderdate"),
            F.col("o_totalprice").alias("latest_total"),
        )
    )


# --------------------------------------------------------------------
# W7 — gap-based batch sessionization. Reference sessions carry
# start/end/duration generated upfront (dataset_generator.py:263-321);
# here sessions are *derived* from the raw event stream: a >30-min gap
# starts a new session (lag + running count), then one row per session.
# Streaming twin: session_window() in streaming/events.py.
# --------------------------------------------------------------------
@query(
    "w7_sessionize_events",
    oracle="""
    WITH flagged AS (
        SELECT user_id, ts, event_id,
               CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER (
                        PARTITION BY user_id ORDER BY ts, event_id)
                         <= 1800000000
                    THEN 0 ELSE 1 END AS is_new
        FROM events
    ), numbered AS (
        SELECT user_id, ts, event_id,
               CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_seq
        FROM flagged
    )
    SELECT user_id, session_seq,
           COUNT(*) AS n_events,
           strftime(MIN(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_start,
           strftime(MAX(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_end,
           epoch_us(MAX(ts)) - epoch_us(MIN(ts)) AS duration_us
    FROM numbered
    GROUP BY user_id, session_seq
    """,
)
def w7_sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap sessionization: lag → new-session flag → running count as
    session id → per-session aggregates. Duration in exact integer
    microseconds (unix_micros) to stay engine-portable."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    prev_us = F.lag(F.unix_micros(F.col("ts"))).over(w)
    is_new = F.when(
        F.unix_micros(F.col("ts")) - prev_us <= 30 * 60 * 1_000_000, 0
    ).otherwise(1)
    return (
        ev.withColumn("is_new", is_new)
        .withColumn("session_seq", F.sum("is_new").over(cum))
        .groupBy("user_id", "session_seq")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS")
            .alias("session_start"),
            F.date_format(F.max("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS")
            .alias("session_end"),
            (F.unix_micros(F.max("ts")) - F.unix_micros(F.min("ts"))).alias("duration_us"),
        )
    )


# --------------------------------------------------------------------
# Ranking functions (SURVEY §2.5: absent in the reference, free
# built-ins for the extension surface): rank / dense_rank / ntile.
# --------------------------------------------------------------------
@query(
    "wr_rank_functions",
    oracle="""
    SELECT o_custkey, o_orderkey,
           RANK() OVER w AS rnk,
           DENSE_RANK() OVER w AS drnk,
           NTILE(4) OVER w AS quartile,
           CAST(ROW_NUMBER() OVER w AS BIGINT) AS rn
    FROM orders
    WHERE o_custkey % 100 = 0
    WINDOW w AS (PARTITION BY o_custkey
                 ORDER BY o_totalprice DESC, o_orderkey)
    """,
)
def wr_rank_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank/dense_rank/ntile/row_number over a deterministic
    (price desc, key) order."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") % 100 == 0)
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey"))
    return o.select(
        "o_custkey", "o_orderkey",
        # cast to long: Spark rank functions return int, DuckDB BIGINT
        F.rank().over(w).cast("long").alias("rnk"),
        F.dense_rank().over(w).cast("long").alias("drnk"),
        F.ntile(4).over(w).cast("long").alias("quartile"),
        F.row_number().over(w).cast("long").alias("rn"),
    )
