"""Reshape operators: unpivot/melt (the inverse of pv1's pivot).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
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
