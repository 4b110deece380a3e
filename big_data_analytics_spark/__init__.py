"""big_data_analytics_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the query and data-processing surface of
the reference project ``SeraphineMukabugingo/Big_data_Analytics`` (an
e-commerce analytics stack built on MongoDB + HBase + Spark + pandas
notebooks), rebuilt Spark-first:

- all storage is Parquet-backed DataFrames (no Mongo/HBase);
- all queries are declarative DataFrame/SQL plans optimized by Catalyst;
- the pandas/sklearn notebook surface maps to ``pyspark.ml`` plus
  closed-form aggregate implementations;
- an extension surface adds large-scale training-data pipeline operators
  (dedup, similarity search, text analysis, multimodal columns).

See SURVEY.md at the repo root for the full capability inventory.
"""

from big_data_analytics_spark.session import get_spark
from big_data_analytics_spark.catalog import load_table, register_tables

__all__ = ["get_spark", "load_table", "register_tables"]
