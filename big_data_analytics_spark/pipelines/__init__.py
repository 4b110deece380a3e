from big_data_analytics_spark.pipelines.ecommerce import (
    revenue_by_state,
    top_products,
    user_spend,
    user_session_metrics,
    clv,
    product_daily_metrics,
    monthly_sales,
    products_enriched,
    inventory_levels,
)

__all__ = [
    "revenue_by_state", "top_products", "user_spend",
    "user_session_metrics", "clv", "product_daily_metrics",
    "monthly_sales", "products_enriched", "inventory_levels",
]
