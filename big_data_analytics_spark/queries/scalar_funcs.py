"""Scalar function surface — string / date / math / JSON
(SURVEY.md §2.8 F1-F21).

The reference's scalar vocabulary (f-string concat, replace/strip,
split, title-case, ISO date parsing/formatting, month truncation,
2-dp money rounding, clamps) re-expressed as built-in JVM-side column
expressions — no Python UDFs anywhere on this path, so every query
stays inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from big_data_analytics_spark.catalog import load_table
from big_data_analytics_spark.queries import query


# --------------------------------------------------------------------
# F1-F7 — string functions. Reference: f"{user_id}#{ts}" row keys
# (load_hbase.py:117), replace(':','') (:116), split('#')[0]
# (clv_integration.py:27), .title() (dataset_generator.py:212),
# zero-padded ids (:235).
# --------------------------------------------------------------------
@query(
    "f1_string_functions",
    oracle="""
    SELECT c_custkey,
           concat(c_mktsegment, '#', CAST(c_custkey AS VARCHAR)) AS row_key,
           upper(c_mktsegment) AS seg_upper,
           lower(c_name) AS name_lower,
           substr(c_name, 1, 8) AS name_prefix,
           CAST(length(c_name) AS BIGINT) AS name_len,
           regexp_replace(c_name, '[0-9]', '', 'g') AS name_no_digits,
           replace(c_name, '#', '-') AS name_dash,
           lpad(CAST(c_custkey AS VARCHAR), 9, '0') AS padded_key,
           CASE WHEN contains(c_name, '1') THEN 1 ELSE 0 END AS has_one,
           split_part(c_name, '#', 1) AS name_stem
    FROM customer
    """,
)
def f1_string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite-key concat, case, substring, length, regex strip,
    replace, zero-pad, contains, split — the reference's entire string
    vocabulary in one projection."""
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.concat(F.col("c_mktsegment"), F.lit("#"),
                 F.col("c_custkey").cast("string")).alias("row_key"),
        F.upper("c_mktsegment").alias("seg_upper"),
        F.lower("c_name").alias("name_lower"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.length("c_name").cast("long").alias("name_len"),
        F.regexp_replace("c_name", "[0-9]", "").alias("name_no_digits"),
        F.replace(F.col("c_name"), F.lit("#"), F.lit("-")).alias("name_dash"),
        F.lpad(F.col("c_custkey").cast("string"), 9, "0").alias("padded_key"),
        F.when(F.col("c_name").contains("1"), 1).otherwise(0).alias("has_one"),
        F.split(F.col("c_name"), "#").getItem(0).alias("name_stem"),
    )


# --------------------------------------------------------------------
# F8-F11 — date functions. Reference: fromisoformat (load_hbase.py:127),
# strftime('%Y%m%d') (:127), to_period('M') (visualizations.py:86),
# timedelta arithmetic (dataset_generator.py:290,308).
# --------------------------------------------------------------------
@query(
    "f8_date_functions",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS BIGINT) AS order_year,
           CAST(quarter(o_orderdate) AS BIGINT) AS order_quarter,
           CAST(month(o_orderdate) AS BIGINT) AS order_month,
           strftime(o_orderdate, '%Y%m%d') AS yyyymmdd,
           strftime(o_orderdate, '%Y-%m') AS year_month,
           strftime(date_trunc('month', o_orderdate), '%Y-%m-%d %H:%M:%S') AS month_start,
           strftime(o_orderdate + INTERVAL 30 DAY, '%Y-%m-%d %H:%M:%S') AS due_date,
           CAST(datediff('day', DATE '1995-01-01', o_orderdate) AS BIGINT) AS days_since_epoch0
    FROM orders
    """,
)
def f8_date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ISO parse/format, yyyymmdd bucket keys, month truncation,
    interval arithmetic, day differences."""
    o = load_table(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.year(d).cast("long").alias("order_year"),
        F.quarter(d).cast("long").alias("order_quarter"),
        F.month(d).cast("long").alias("order_month"),
        F.date_format(d, "yyyyMMdd").alias("yyyymmdd"),
        F.date_format(d, "yyyy-MM").alias("year_month"),
        F.date_format(F.date_trunc("month", d), "yyyy-MM-dd HH:mm:ss").alias("month_start"),
        F.date_format(d + F.expr("INTERVAL 30 DAYS"), "yyyy-MM-dd HH:mm:ss").alias("due_date"),
        F.datediff(d, F.lit("1995-01-01").cast("date")).cast("long")
        .alias("days_since_epoch0"),
    )
