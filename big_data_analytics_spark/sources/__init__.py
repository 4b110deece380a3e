from big_data_analytics_spark.sources import readers, writers

__all__ = ["readers", "writers"]
