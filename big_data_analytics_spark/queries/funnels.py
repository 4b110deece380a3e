"""Sessionized conversion funnel — the composite analytics pattern:
gap-based sessionization, ordered step detection (view → click →
purchase, each step at-or-after the previous), session-level rollup.
One shuffle on user_id; every later stage is a window over the same
partitioning, so no further exchanges.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from big_data_analytics_spark.catalog import load_table
from big_data_analytics_spark.queries import query

_GAP_US = 30 * 60 * 1_000_000


@query(
    "fn1_session_funnel",
    oracle=f"""
    WITH ordered AS (
        SELECT user_id, event_id, event_type, ts,
               CASE WHEN LAG(ts) OVER w IS NULL
                     OR epoch_us(ts) - epoch_us(LAG(ts) OVER w) > {_GAP_US}
                    THEN 1 ELSE 0 END AS is_new
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sess AS (
        SELECT *, SUM(is_new) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) AS session_id
        FROM ordered
    ), s1 AS (
        SELECT *, MIN(CASE WHEN event_type = 'view' THEN ts END)
                      OVER (PARTITION BY user_id, session_id) AS v_ts
        FROM sess
    ), s2 AS (
        SELECT *, MIN(CASE WHEN event_type = 'click' AND ts >= v_ts
                           THEN ts END)
                      OVER (PARTITION BY user_id, session_id) AS c_ts
        FROM s1
    ), s3 AS (
        SELECT *, MIN(CASE WHEN event_type = 'purchase' AND ts >= c_ts
                           THEN ts END)
                      OVER (PARTITION BY user_id, session_id) AS p_ts
        FROM s2
    ), per_sess AS (
        SELECT DISTINCT user_id, session_id,
               v_ts IS NOT NULL AS s_view,
               c_ts IS NOT NULL AS s_click,
               p_ts IS NOT NULL AS s_buy
        FROM s3
    )
    SELECT COUNT(*) AS n_sessions,
           CAST(SUM(CASE WHEN s_view THEN 1 ELSE 0 END) AS BIGINT)
               AS reached_view,
           CAST(SUM(CASE WHEN s_click THEN 1 ELSE 0 END) AS BIGINT)
               AS reached_click,
           CAST(SUM(CASE WHEN s_buy THEN 1 ELSE 0 END) AS BIGINT)
               AS reached_purchase
    FROM per_sess
    """,
)
def fn1_session_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered-step funnel over 30-minute-gap sessions: a click only
    counts at-or-after the session's first view, a purchase only
    at-or-after that click. Step timestamps are conditional window
    mins chained across three projections (each step's predicate
    references the previous step's column), all over the one
    (user, session) partitioning."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type", "ts")
    w_ord = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("ts").over(w_ord)
    is_new = F.when(
        prev.isNull()
        | (F.unix_micros(F.col("ts")) - F.unix_micros(prev) > _GAP_US),
        1).otherwise(0)
    sess = ev.withColumn("is_new", is_new).withColumn(
        "session_id",
        F.sum("is_new").over(
            w_ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )
    w_sess = Window.partitionBy("user_id", "session_id")
    s1 = sess.withColumn(
        "v_ts",
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(w_sess))
    s2 = s1.withColumn(
        "c_ts",
        F.min(F.when((F.col("event_type") == "click")
                     & (F.col("ts") >= F.col("v_ts")), F.col("ts")))
        .over(w_sess))
    s3 = s2.withColumn(
        "p_ts",
        F.min(F.when((F.col("event_type") == "purchase")
                     & (F.col("ts") >= F.col("c_ts")), F.col("ts")))
        .over(w_sess))
    per_sess = s3.select(
        "user_id", "session_id",
        F.col("v_ts").isNotNull().alias("s_view"),
        F.col("c_ts").isNotNull().alias("s_click"),
        F.col("p_ts").isNotNull().alias("s_buy"),
    ).distinct()
    return per_sess.agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.sum(F.col("s_view").cast("long")).alias("reached_view"),
        F.sum(F.col("s_click").cast("long")).alias("reached_click"),
        F.sum(F.col("s_buy").cast("long")).alias("reached_purchase"),
    )
