"""Sessionized conversion funnel — the composite analytics pattern:
gap-based sessionization, ordered step detection (view → click →
purchase, each step at-or-after the previous), session-level rollup.
One shuffle on user_id; the per-session step detection is an in-place
aggregate under the same partitioning, so no further exchanges.
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
    at-or-after that click.

    Shape (round-6 rewrite): ONE exchange total. Sessionization is the
    lag/cumsum window over user_id; the step detection is a single
    per-(user, session) aggregate — v_ts as a conditional MIN, clicks
    and purchases as sorted timestamp arrays, then each step's
    timestamp is the first array element at-or-after the previous
    step's. Because hash-partitioning on user_id already satisfies the
    clustered distribution on (user_id, session_id), the aggregate
    runs in place with NO second exchange — replacing the prior
    three-window chain + DISTINCT (one extra exchange + sort + three
    window passes). Per-session arrays hold only that session's
    click/purchase timestamps — strictly smaller than the per-user
    sort partitions the window already required, so no new skew
    exposure at scale."""
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
    # collect_list skips nulls, so each array holds exactly that
    # step's timestamps; sort_array makes "first element >= prev step"
    # the conditional MIN the window chain computed. A null previous
    # step makes the >= predicate null -> filter drops every element
    # -> try_element_at on empty -> null, matching the chained
    # conditional-window semantics on missing steps.
    per_sess = sess.groupBy("user_id", "session_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts")))
        .alias("v_ts"),
        F.sort_array(F.collect_list(
            F.when(F.col("event_type") == "click", F.col("ts"))))
        .alias("clicks"),
        F.sort_array(F.collect_list(
            F.when(F.col("event_type") == "purchase", F.col("ts"))))
        .alias("purchases"),
    )
    c_ts = F.try_element_at(
        F.filter("clicks", lambda x: x >= F.col("v_ts")), F.lit(1))
    steps = per_sess.withColumn("c_ts", c_ts).withColumn(
        "p_ts",
        F.try_element_at(
            F.filter("purchases", lambda x: x >= F.col("c_ts")), F.lit(1)))
    per_sess = steps.select(
        F.col("v_ts").isNotNull().alias("s_view"),
        F.col("c_ts").isNotNull().alias("s_click"),
        F.col("p_ts").isNotNull().alias("s_buy"),
    )
    return per_sess.agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.sum(F.col("s_view").cast("long")).alias("reached_view"),
        F.sum(F.col("s_click").cast("long")).alias("reached_click"),
        F.sum(F.col("s_buy").cast("long")).alias("reached_purchase"),
    )
