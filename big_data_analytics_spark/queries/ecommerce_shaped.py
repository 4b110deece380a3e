"""The reference's own e-commerce pipelines, registered as driver-
visible queries (SURVEY.md §3 entry points).

These run on the seeded datagen fixtures (nested structs / arrays /
maps — shapes the TPC-H star schema can't express), so they have no
DuckDB oracle here: the driver records rows-only checks, and the deep
value-level validation lives in tests/test_ecommerce.py (invariants +
independent pandas recomputation).

The fixture scale follows the sf_dir argument so smoke (sf0.001) stays
fast while correctness (sf0.01) exercises more rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from big_data_analytics_spark.datagen import gen_all
from big_data_analytics_spark.pipelines import (
    clv,
    monthly_sales,
    product_daily_metrics,
    products_enriched,
    revenue_by_state,
    top_products,
)
from big_data_analytics_spark.queries import query

_CACHE: dict[tuple, dict[str, DataFrame]] = {}


def _fixture(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    n_sessions = 500 if "0.001" in sf_dir else 2000
    key = (id(spark), n_sessions)
    if key not in _CACHE:
        d = gen_all(spark, n_users=100, n_products=50,
                    n_categories=5, n_sessions=n_sessions)
        # persist: several registered queries share the same fixture —
        # without caching each one regenerates the nested sessions
        _CACHE[key] = {k: v.cache() for k, v in d.items()}
    return _CACHE[key]


@query("ecom_revenue_by_state")
def ecom_revenue_by_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference query #1 (/root/reference/spark_processing.py:45-52):
    users ⋈ transactions → SUM(total) by geo_data.state → top 10."""
    d = _fixture(spark, sf_dir)
    return revenue_by_state(d["users"], d["transactions"], n=10)


@query("ecom_top_products")
def ecom_top_products(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference query #2 (/root/reference/mongodb_pipeline.py:8-25):
    unwind items → group-sum subtotal → top 5 → name enrichment."""
    d = _fixture(spark, sf_dir)
    return top_products(d["transactions"], d["products"], n=5)


@query("ecom_clv")
def ecom_clv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference query #3 (/root/reference/clv_integration.py:53-56):
    per-user spend ⟕ session metrics → engagement_score → clv."""
    d = _fixture(spark, sf_dir)
    return clv(d["users"], d["transactions"], d["sessions"])


@query("ecom_product_daily_metrics")
def ecom_product_daily_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference materialized view (/root/reference/load_hbase.py:127-134):
    per-(product, day) views/cart_additions/purchases counters."""
    d = _fixture(spark, sf_dir)
    return product_daily_metrics(d["sessions"])


@query("ecom_monthly_sales")
def ecom_monthly_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference rollup (/root/reference/visualizations.py:85-87):
    monthly revenue trend."""
    d = _fixture(spark, sf_dir)
    return monthly_sales(d["transactions"])


@query("ecom_products_enriched")
def ecom_products_enriched(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference denormalization (/root/reference/load_mongo.py:76-94):
    embedded category struct with Unknown-Category fallback."""
    d = _fixture(spark, sf_dir)
    return products_enriched(d["products"], d["categories"])


@query("ecom_dwell_times")
def ecom_dwell_times(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W2 — derive per-view dwell time from raw ordered view timestamps
    with lead(): the reference computes view_duration at generation
    time as consecutive slot diffs (dataset_generator.py:273-274); this
    recovers it at query time and cross-checks against the stored
    value. Returns per-session match stats (all rows must match)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    d = _fixture(spark, sf_dir)
    views = (
        d["sessions"]
        .select("session_id", "duration_seconds",
                F.to_timestamp("end_time").alias("end_ts"),
                F.posexplode("page_views").alias("pos", "pv"))
        .select("session_id", "duration_seconds", "end_ts", "pos",
                F.to_timestamp(F.col("pv.timestamp")).alias("view_ts"),
                F.col("pv.view_duration").alias("stored_duration"))
    )
    w = Window.partitionBy("session_id").orderBy("pos")
    derived = views.withColumn(
        "derived_duration",
        (F.unix_timestamp(F.coalesce(F.lead("view_ts").over(w), F.col("end_ts")))
         - F.unix_timestamp("view_ts")).cast("int"),
    )
    return derived.agg(
        F.count(F.lit(1)).alias("n_views"),
        F.sum((F.col("derived_duration") == F.col("stored_duration"))
              .cast("long")).alias("n_matching"),
        F.sum((F.col("derived_duration") != F.col("stored_duration"))
              .cast("long")).alias("n_mismatching"),
    )


@query("ecom_page_transitions")
def ecom_page_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W3 — Markov page-transition matrix: lag(page_type) over the
    in-session view order, then count (prev → curr) pairs. The
    reference *generates* pages from a transition table
    (dataset_generator.py:110-127); this is the inverse analysis."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    d = _fixture(spark, sf_dir)
    views = (
        d["sessions"]
        .select("session_id", F.posexplode("page_views").alias("pos", "pv"))
        .select("session_id", "pos", F.col("pv.page_type").alias("page_type"))
    )
    w = Window.partitionBy("session_id").orderBy("pos")
    trans = views.withColumn(
        "prev_page", F.coalesce(F.lag("page_type").over(w), F.lit("<start>")))
    return (
        trans.groupBy("prev_page", F.col("page_type").alias("next_page"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
