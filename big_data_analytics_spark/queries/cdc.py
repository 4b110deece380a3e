"""Change-data-capture patterns: MERGE-style upsert application and
gaps-and-islands activity streaks.

A 100 TB corpus is never rebuilt from scratch — it's maintained by
applying CDC batches (insert/update/delete) against the previous
snapshot. Spark's open formats do this via MERGE INTO; the engine
shape underneath is exactly one full-outer join on the key between
the snapshot and the (much smaller) change batch, which is what
``up1`` pins down. Islands (``gi1``) are the standard
row_number-difference trick: one exchange on the entity key, two
windows over the same partitioning, no joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from big_data_analytics_spark.catalog import load_table
from big_data_analytics_spark.queries import query

INSERT_OFFSET = 10_000_000
INSERT_PRICE = 42.42


@query(
    "up1_orders_upsert",
    oracle=f"""
    WITH changes AS (
        SELECT o_orderkey AS key, 'U' AS op,
               FLOOR(o_totalprice * 1.05 * 100.0 + 0.5) / 100.0 AS new_price
        FROM orders WHERE o_orderkey % 10 = 0
        UNION ALL
        SELECT o_orderkey AS key, 'D' AS op, NULL AS new_price
        FROM orders WHERE o_orderkey % 10 = 1
        UNION ALL
        SELECT o_orderkey + {INSERT_OFFSET} AS key, 'I' AS op,
               {INSERT_PRICE} AS new_price
        FROM orders WHERE o_orderkey % 10 = 2
    )
    SELECT COALESCE(b.o_orderkey, c.key) AS o_orderkey,
           COALESCE(c.op, '=') AS op,
           COALESCE(c.new_price, b.o_totalprice) AS o_totalprice
    FROM orders b FULL OUTER JOIN changes c ON b.o_orderkey = c.key
    WHERE COALESCE(c.op, '=') <> 'D'
    """,
)
def up1_orders_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO semantics as a single full-outer join: a
    deterministic CDC batch (key%10==0 → +5% price update, %10==1 →
    delete, %10==2 → insert under a shifted key) applied to the orders
    snapshot. Matched+op=U takes the new value, matched+op=D drops the
    row, unmatched-change inserts, unmatched-base passes through.

    Scale: the join shuffles on the primary key both sides; with the
    snapshot bucketed by key (writers.write_parquet partition/sort
    knobs) the base side needs no exchange at all, which is how open
    table formats make CDC application incremental. Updated price uses
    the integer-cents half-up convention for bit parity."""
    base = load_table(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    changes = (
        base.where(k % 10 == 0).select(
            k.alias("key"), F.lit("U").alias("op"),
            (F.floor(F.col("o_totalprice") * 1.05 * 100.0 + 0.5) / 100.0)
            .alias("new_price"))
        .unionAll(base.where(k % 10 == 1).select(
            k.alias("key"), F.lit("D").alias("op"),
            F.lit(None).cast("double").alias("new_price")))
        .unionAll(base.where(k % 10 == 2).select(
            (k + INSERT_OFFSET).alias("key"), F.lit("I").alias("op"),
            F.lit(INSERT_PRICE).alias("new_price")))
    )
    merged = base.join(changes, base.o_orderkey == changes.key,
                       "full_outer")
    return (
        merged.where(F.coalesce(F.col("op"), F.lit("=")) != "D")
        .select(
            F.coalesce(F.col("o_orderkey"), F.col("key"))
            .alias("o_orderkey"),
            F.coalesce(F.col("op"), F.lit("=")).alias("op"),
            F.coalesce(F.col("new_price"), F.col("o_totalprice"))
            .alias("o_totalprice"),
        )
    )


@query(
    "gi1_activity_islands",
    oracle="""
    WITH days AS (
        SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
    ), grouped AS (
        SELECT user_id, d,
               (d - DATE '1970-01-01')
               - ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY d)
               AS island
        FROM days
    ), islands AS (
        SELECT user_id, island, COUNT(*) AS len,
               MIN(d) AS island_start
        FROM grouped GROUP BY user_id, island
    )
    SELECT user_id,
           COUNT(*) AS n_islands,
           CAST(MAX(len) AS BIGINT) AS longest_streak,
           STRFTIME(MIN(island_start), '%Y-%m-%d') AS first_active_day
    FROM islands GROUP BY user_id
    """,
)
def gi1_activity_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: consecutive-day activity streaks per user via
    the row_number-difference trick (days in one run share
    ``epoch_day - row_number``). One exchange on user_id serves the
    dedup, the window, and both aggregations — Catalyst reuses the
    partitioning, so the whole query is a single shuffle over the
    distinct (user, day) pairs, never the raw events."""
    ev = load_table(spark, sf_dir, "events")
    days = ev.select("user_id", F.to_date("ts").alias("d")).distinct()
    w = Window.partitionBy("user_id").orderBy("d")
    grouped = days.select(
        "user_id", "d",
        (F.datediff("d", F.lit("1970-01-01"))
         - F.row_number().over(w)).alias("island"),
    )
    islands = grouped.groupBy("user_id", "island").agg(
        F.count("*").alias("len"), F.min("d").alias("island_start"))
    return islands.groupBy("user_id").agg(
        F.count("*").alias("n_islands"),
        F.max("len").cast("long").alias("longest_streak"),
        F.date_format(F.min("island_start"), "yyyy-MM-dd")
        .alias("first_active_day"),
    )
