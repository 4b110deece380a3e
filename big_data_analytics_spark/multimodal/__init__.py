from big_data_analytics_spark.multimodal import binary_ops

__all__ = ["binary_ops"]
