"""Driver-visible query over the skew-mitigation operators.

operators/skew.py (salted two-phase aggregation, salted skew joins)
was pytest-only; sj1 gives it a hash-graded driver row. Salting is
semantics-*preserving* by construction — the salt only changes
partition assignment, never the algebra — so the oracle is simply the
UNSALTED join + aggregate: a hash match proves the whole
replicate/salt/join/merge machinery is invisible in the result, which
is exactly the property that makes it safe to deploy against a skewed
100 TB key distribution.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from big_data_analytics_spark.catalog import load_table
from big_data_analytics_spark.functions.money import money_cents
from big_data_analytics_spark.operators.skew import (
    replicate_for_skew_join,
    with_join_salt,
)
from big_data_analytics_spark.queries import query

_N_SALTS = 8


@query(
    "sj1_salted_skew_join",
    oracle="""
    SELECT p.p_brand,
           CAST(SUM(CAST(FLOOR(l.l_extendedprice * 100.0 + 0.5)
                         AS BIGINT)) AS BIGINT) AS revenue_cents,
           COUNT(*) AS n_items
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE p.p_size <= 10
    GROUP BY p.p_brand
    """,
)
def sj1_salted_skew_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brand revenue through a SALTED join: the small side (filtered
    part) replicates across 8 salts, the fact side draws a uniform
    salt, and the join key becomes (partkey, salt) — each hot part key
    spreads over 8 tasks instead of pinning one reducer. The merge
    aggregation then collapses the salts; integer-cents revenue keeps
    the result order-independent. The oracle is the plain unsalted
    join — hash equality IS the correctness property of salting.

    Scale: this is the manual fallback for joins AQE's skew splitting
    can't fix (aggregation-after-join pins the partitioning, SCALE.md
    skew notes); cost is an 8× replication of the SMALL side only."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", money_cents("l_extendedprice").alias("cents"))
    pt = (load_table(spark, sf_dir, "part")
          .filter(F.col("p_size") <= 10)
          .select("p_partkey", "p_brand"))
    big = with_join_salt(li, _N_SALTS)
    small = replicate_for_skew_join(pt, _N_SALTS)
    return (
        big.join(small,
                 (big.l_partkey == small.p_partkey)
                 & (big["__salt"] == small["__salt"]))
        .groupBy("p_brand")
        .agg(F.sum("cents").cast("long").alias("revenue_cents"),
             F.count(F.lit(1)).alias("n_items"))
    )
