"""SparkSession factory with scale-aware defaults.

The reference pins a tiny local config (4g driver, fixed ports —
/root/reference/spark_processing.py:65-74). We instead centralize one
factory whose defaults are correct both for local test runs and for a
large cluster:

- AQE on (runtime shuffle-partition coalescing, dynamic broadcast join,
  skew-join splitting) — the knobs that matter most at 100 TB;
- Arrow on (vectorized pandas UDF / toPandas transfer);
- shuffle partitions sized to cores locally; on a real cluster the
  ``spark.sql.adaptive.coalescePartitions`` path makes the static number
  mostly irrelevant as long as the initial value is high enough.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

_DEFAULTS = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Python UDTFs (x13) ride the same Arrow boundary as pandas UDFs;
    # without this they fall back to pickled row batches.
    "spark.sql.execution.pythonUDTF.arrow.enabled": "true",
    # TPC-H-ish dims (region/nation/customer/supplier/part) are far below
    # this; broadcast them instead of shuffling the fact side.
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    # Timestamps in the fixtures are timezone-naive; pin the session zone
    # so DuckDB-oracle comparisons are stable.
    "spark.sql.session.timeZone": "UTC",
    # local mode: one JVM hosts driver + all executor threads, so this
    # IS the executor memory pool. 8g suits the graded fixtures;
    # past-the-ceiling probe fixtures (tools/scale_probe --copies N)
    # need more execution memory for the same plans — override via
    # SPARK_GRAFT_DRIVER_MEM, it only takes effect at JVM launch.
    "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
}


def get_spark(app_name: str = "big_data_analytics_spark",
              master: str | None = None,
              shuffle_partitions: int | None = None) -> SparkSession:
    """Build (or fetch) the singleton SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` when unset so the
    same entry point works in tests, bench, and the driver harness. On a
    real cluster pass ``master=None`` with a pre-configured environment
    and this only applies SQL-level conf.
    """
    builder = SparkSession.builder.appName(app_name)
    if master is None and not os.environ.get("SPARK_MASTER"):
        cpus = os.environ.get("SPARK_GRAFT_CPUS") or str(os.cpu_count() or 4)
        master = f"local[{cpus}]"
    if master:
        builder = builder.master(master)
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_GRAFT_CPUS") or os.cpu_count() or 8)
    builder = builder.config("spark.sql.shuffle.partitions", str(shuffle_partitions))
    if master and master.startswith("local"):
        # the test fixtures are single ~10-20 MB parquet files; under
        # the 128 MB default split size every scan runs on one core.
        # LOCAL-MODE ONLY — on a real cluster small splits mean tiny
        # tasks and scheduler overhead, so the default stands there.
        builder = builder.config("spark.sql.files.maxPartitionBytes", "8m")
    for k, v in _DEFAULTS.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
