"""Bucketed co-located joins (SCALE.md): pre-bucketing both sides of a
recurring join key eliminates the per-query shuffle entirely — the
Spark-native version of the reference's HBase row-key co-location."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from big_data_analytics_spark.catalog import load_table
from tests.conftest import SF_CORRECT


@pytest.fixture(scope="module")
def warehouse(spark):
    # warehouse.dir is a static conf — use the session default
    # (./spark-warehouse) and clean up the tables + dir afterwards
    d = spark.conf.get("spark.sql.warehouse.dir")
    yield d
    for t in ("b_orders", "b_customer"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    shutil.rmtree(d.removeprefix("file:"), ignore_errors=True)


def test_bucketed_join_has_no_shuffle(spark, warehouse):
    orders = load_table(spark, SF_CORRECT, "orders")
    customer = load_table(spark, SF_CORRECT, "customer")
    (orders.write.mode("overwrite").bucketBy(8, "o_custkey")
     .sortBy("o_custkey").saveAsTable("b_orders"))
    (customer.write.mode("overwrite").bucketBy(8, "c_custkey")
     .sortBy("c_custkey").saveAsTable("b_customer"))

    # disable broadcast so the join would otherwise shuffle both sides
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        bo = spark.table("b_orders")
        bc = spark.table("b_customer")
        joined = bo.join(bc, bo.o_custkey == bc.c_custkey).groupBy(
            "c_mktsegment").agg(F.count(F.lit(1)).alias("n"))
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # both scans are bucketed on the join key → SortMergeJoin with
        # NO Exchange under either side
        join_section = plan.split("SortMergeJoin")[1] if "SortMergeJoin" in plan else plan
        assert "SortMergeJoin" in plan
        n_exchanges_for_join = plan.count("Exchange hashpartitioning(o_custkey") \
            + plan.count("Exchange hashpartitioning(c_custkey")
        assert n_exchanges_for_join == 0, plan
        # and the result is still right
        total = joined.agg(F.sum("n")).first()[0]
        assert total == load_table(spark, SF_CORRECT, "orders").count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold",
                       str(64 * 1024 * 1024))
