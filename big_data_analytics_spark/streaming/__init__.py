from big_data_analytics_spark.streaming import events

__all__ = ["events"]
