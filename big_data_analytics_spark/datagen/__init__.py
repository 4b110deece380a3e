from big_data_analytics_spark.datagen.ecommerce import (
    gen_categories,
    gen_products,
    gen_users,
    gen_sessions,
    gen_transactions,
    gen_all,
)

__all__ = [
    "gen_categories", "gen_products", "gen_users",
    "gen_sessions", "gen_transactions", "gen_all",
]
