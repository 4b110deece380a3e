"""Driver-visible query over the Bloom semi-join operator.

operators/bloom.py was pytest-only; bl1 gives it a hash-graded driver
row. The operator's contract — prefilter + exact join ≡ exact join
(false positives cleared by the join, false negatives impossible) —
is precisely what the oracle checks: the plain semi join's aggregate
must hash-match the Bloom-prefiltered one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from big_data_analytics_spark.catalog import load_table
from big_data_analytics_spark.functions.money import money_cents
from big_data_analytics_spark.operators.bloom import bloom_semi_join
from big_data_analytics_spark.queries import query


@query(
    "bl1_bloom_semi_join",
    oracle="""
    SELECT l_returnflag,
           COUNT(*) AS n_items,
           CAST(SUM(CAST(FLOOR(l_extendedprice * 100.0 + 0.5)
                         AS BIGINT)) AS BIGINT) AS revenue_cents
    FROM lineitem
    WHERE l_suppkey IN (SELECT s_suppkey FROM supplier
                        WHERE s_nationkey = 5)
    GROUP BY l_returnflag
    """,
)
def bl1_bloom_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lineitem volume from nation-5 suppliers through the explicit
    Bloom semi-join: the small side builds a 2^16-bit bitmap
    (distributed word-wise OR, ≤1 KB to the driver), the big side is
    prefiltered by a literal-array bit test that rides whole-stage
    codegen under the scan, and the exact semi join clears false
    positives. Hash equality with the plain semi-join oracle is the
    operator's no-false-negative guarantee made gradeable.

    Scale: the prefilter drops non-matching fact rows at scan speed,
    BEFORE the exchange — the explicit form of Spark's runtime
    bloom-filter join, for plans the optimizer doesn't rewrite."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_suppkey", "l_returnflag",
        money_cents("l_extendedprice").alias("cents"))
    supp = (load_table(spark, sf_dir, "supplier")
            .filter(F.col("s_nationkey") == 5)
            .select(F.col("s_suppkey").alias("l_suppkey")))
    kept = bloom_semi_join(li, supp, "l_suppkey", num_bits=1 << 16)
    return (kept.groupBy("l_returnflag")
            .agg(F.count(F.lit(1)).alias("n_items"),
                 F.sum("cents").cast("long").alias("revenue_cents")))
