from big_data_analytics_spark.operators import dedup, similarity

__all__ = ["dedup", "similarity"]
