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


# --------------------------------------------------------------------
# F13-F15 — math: money rounding (bround convention), pow/sqrt/log/abs,
# clamps. Reference: round(x,2) everywhere (dataset_generator.py:392),
# min/max clamps (:284), derived scores (clv_integration.py:55-56).
# --------------------------------------------------------------------
@query(
    "f13_math_functions",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           FLOOR(l_extendedprice * (1 - l_discount) * 100.0 + 0.5) / 100.0 AS net_price_2dp,
           sqrt(l_quantity) AS qty_sqrt,
           pow(l_discount, 2) AS disc_sq,
           ROUND(ln(l_extendedprice), 9) AS price_ln,
           abs(l_quantity - 25.0) AS qty_dev,
           least(l_quantity, 40.0) AS qty_capped,
           greatest(l_quantity - 40.0, 0.0) AS qty_over,
           CAST(floor(l_extendedprice) AS BIGINT) AS price_floor,
           CAST(ceil(l_extendedprice) AS BIGINT) AS price_ceil
    FROM lineitem
    WHERE l_orderkey % 100 = 0
    """,
)
def f13_math_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Money rounding + elementary math + clamps (least/greatest for the
    reference's min()/max() bounds)."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 100 == 0)
    q = F.col("l_quantity")
    return li.select(
        "l_orderkey", "l_linenumber",
        # portable 2-dp money rounding: floor(x*100+0.5)/100 is pure IEEE
        # arithmetic (Spark's round() rounds the shortest-decimal repr,
        # which other engines don't reproduce)
        (F.floor(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100.0 + 0.5)
         / 100.0).alias("net_price_2dp"),
        F.sqrt(q).alias("qty_sqrt"),
        F.pow(F.col("l_discount"), 2).alias("disc_sq"),
        # libm vs JVM log differ in the last ulp — round before compare
        F.round(F.log(F.col("l_extendedprice")), 9).alias("price_ln"),
        F.abs(q - 25.0).alias("qty_dev"),
        F.least(q, F.lit(40.0)).alias("qty_capped"),
        F.greatest(q - 40.0, F.lit(0.0)).alias("qty_over"),
        F.floor("l_extendedprice").alias("price_floor"),
        F.ceil("l_extendedprice").alias("price_ceil"),
    )


# --------------------------------------------------------------------
# F20 — JSON extraction. Reference: json.dumps into HBase cells
# (load_hbase.py:123), json.load (dataset_generator.py:158-160).
# --------------------------------------------------------------------
@query(
    "f20_json_extract",
    oracle="""
    SELECT event_type,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS k_total,
           COUNT(*) AS n
    FROM events
    GROUP BY event_type
    """,
)
def f20_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed field extraction from a JSON string column, then
    aggregated — from_json with an explicit schema (never inference on
    the hot path)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.withColumn("k", F.get_json_object("props", "$.k").cast("long"))
        .groupBy("event_type")
        .agg(F.sum("k").alias("k_total"), F.count(F.lit(1)).alias("n"))
    )
