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
        _CACHE[key] = gen_all(spark, n_users=100, n_products=50,
                              n_categories=5, n_sessions=n_sessions)
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
