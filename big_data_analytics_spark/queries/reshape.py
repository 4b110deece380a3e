"""Reshape operators: unpivot/melt (the inverse of pv1's pivot) and
top-k-per-group (the grouped cousin of o1's global top-k).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from big_data_analytics_spark.catalog import load_table
from big_data_analytics_spark.queries import query


@query(
    "pv2_unpivot_metrics",
    oracle="""
    WITH wide AS (
        SELECT l_returnflag,
               CAST(SUM(CAST(l_quantity AS BIGINT)) AS DOUBLE) AS sum_qty,
               CAST(SUM(CAST(FLOOR(l_extendedprice*100.0+0.5) AS BIGINT))
                    AS DOUBLE)/100.0 AS sum_price,
               CAST(COUNT(*) AS DOUBLE) AS n_lines
        FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag, metric, value
    FROM wide
    UNPIVOT (value FOR metric IN (sum_qty, sum_price, n_lines))
    """,
)
def pv2_unpivot_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide per-flag metrics melted to (flag, metric, value) rows —
    Spark's unpivot (stack) against DuckDB's UNPIVOT. Quantities are
    integral so the BIGINT sum is exact; money goes through cents."""
    l = load_table(spark, sf_dir, "lineitem")
    wide = l.groupBy("l_returnflag").agg(
        F.sum(F.col("l_quantity").cast("long")).cast("double")
        .alias("sum_qty"),
        (F.sum(F.floor(F.col("l_extendedprice") * 100.0 + F.lit(0.5)))
         .cast("double") / F.lit(100.0)).alias("sum_price"),
        F.count(F.lit(1)).cast("double").alias("n_lines"),
    )
    return wide.unpivot(
        ids=["l_returnflag"],
        values=["sum_qty", "sum_price", "n_lines"],
        variableColumnName="metric",
        valueColumnName="value",
    )


@query(
    "o2g_topk_per_group",
    oracle="""
    SELECT o_orderpriority, o_orderkey,
           CAST(FLOOR(o_totalprice*100.0+0.5) AS BIGINT) AS totalprice_cents
    FROM orders
    QUALIFY ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                               ORDER BY o_totalprice DESC, o_orderkey) <= 3
    """,
)
def o2g_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders by value within each priority: row_number + filter
    plans as WindowGroupLimit, so each partition keeps only its local
    top-3 per group before the shuffle (asserted in test_plans) — the
    grouped analogue of o1's TakeOrderedAndProject."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        o.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= 3)
        .select(
            "o_orderpriority", "o_orderkey",
            F.floor(F.col("o_totalprice") * 100.0 + F.lit(0.5))
            .cast("long").alias("totalprice_cents"),
        )
    )
