"""ML / statistical analytics layer (SURVEY.md §2.9).

The reference's notebook surface (~3,300 lines of pandas/statsmodels/
sklearn labs: regression, classification, clustering, PCA, resampling,
metrics) mapped to distributed implementations:

- ``pyspark.ml`` estimators where MLlib covers the capability
  (LinearRegression with inference summary, LogisticRegression,
  NaiveBayes, trees/forests/GBT, KMeans, PCA, TF-IDF);
- closed-form sufficient-statistics implementations where it doesn't
  (LDA/QDA via per-class means + covariance, kNN via broadcast join,
  OLS diagnostics, VIF, bootstrap SE) — these run as aggregates, so
  they scale like any groupBy instead of collecting data to the driver.

MLlib-gap policy is documented per function (SURVEY.md §7 "MLlib
gaps"): closed-form-on-aggregates where feasible, applyInPandas
otherwise, with the approximation called out.
"""

from big_data_analytics_spark.ml import evaluate, features, regression, classify, cluster

__all__ = ["evaluate", "features", "regression", "classify", "cluster"]
