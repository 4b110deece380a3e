"""P19 deterministic variant — hash-based train/test split.

``p19_sample_and_split`` (relational2.py) exercises Spark's seeded
RNG sampling, which no other engine can reproduce, so the driver can
only rows-check it. This module adds the production alternative: a
*content-addressed* split, where the bucket is a pure function of the
row key. That is what a 100 TB training pipeline wants anyway —
membership is stable across reruns, engines, and repartitioning, and
any engine can recompute it (here: DuckDB, giving P19 a real
value-hash oracle).

Hash: Knuth multiplicative hashing — ``pmod(key * 2654435761, 2^31)``
(the golden-ratio multiplier of 2^32), then ``mod 100`` for a
percentage bucket. Chosen over xxhash64/md5 because it is exact
integer arithmetic expressible identically in every SQL dialect; the
multiplier scrambles the sequential key space so bucket membership is
uncorrelated with key ranges. All intermediates stay far below int64
overflow for any 32-bit key. Both mods are *non-negative* (``pmod``,
not ``%`` — Spark/DuckDB ``%`` keeps the dividend's sign), so negative
keys land in [0, buckets) like any other key; for non-negative keys
pmod and ``%`` agree, which keeps the oracle SQL (positive TPC-H keys)
on plain ``%``. A portable oracle for signed keys is
``((key*2654435761) % 2147483648 + 2147483648) % 2147483648 % buckets``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from big_data_analytics_spark.catalog import load_table
from big_data_analytics_spark.functions.money import money_sum
from big_data_analytics_spark.queries import query

KNUTH = 2654435761
MOD = 2147483648  # 2^31


def hash_bucket(key: Column, buckets: int = 100) -> Column:
    """Deterministic engine-portable bucket in [0, buckets) — valid for
    any signed key (pmod keeps the result non-negative)."""
    return F.pmod(F.pmod(key.cast("long") * F.lit(KNUTH), F.lit(MOD)),
                  F.lit(buckets))


def train_test_split(df: DataFrame, key: str, train_pct: int = 80,
                     buckets: int = 100) -> tuple[DataFrame, DataFrame]:
    """Stable hash split: a row's membership never changes across
    reruns or cluster layouts (unlike randomSplit, whose assignment
    depends on partitioning). Narrow — no shuffle, no RNG state."""
    b = hash_bucket(F.col(key), buckets)
    return df.filter(b < train_pct), df.filter(b >= train_pct)


#: Per-stratum keep percentages for the stratified sample (the
#: deterministic analog of DataFrame.sampleBy fractions).
STRATA_PCT = {"1-URGENT": 50, "2-HIGH": 25, "3-MEDIUM": 10,
              "4-NOT SPECIFIED": 10, "5-LOW": 5}


def stratified_hash_sample(df: DataFrame, stratum: str, key: str,
                           pct: dict[str, int],
                           buckets: int = 100) -> DataFrame:
    """sampleBy with content-addressed membership: each stratum keeps
    rows whose key-hash bucket falls under its percentage. Unlike
    ``sampleBy`` the result is identical across reruns, engines, and
    partitionings, and needs no RNG state. Strata absent from ``pct``
    are dropped (fraction 0)."""
    b = hash_bucket(F.col(key), buckets)
    frac = F.lit(None).cast("int")
    for s, p in pct.items():
        frac = F.when(F.col(stratum) == s, F.lit(p)).otherwise(frac)
    return df.withColumn("__frac", frac).filter(b < F.col("__frac")) \
             .drop("__frac")


@query(
    "p20b_stratified_sample",
    oracle=f"""
    SELECT o_orderpriority,
           COUNT(*) AS n_sampled,
           CAST(SUM(CAST(FLOOR(o_totalprice*100.0+0.5) AS BIGINT))
                AS DOUBLE)/100.0 AS revenue
    FROM orders
    WHERE (o_orderkey * {KNUTH}) % {MOD} % 100 <
          CASE o_orderpriority
            WHEN '1-URGENT' THEN 50 WHEN '2-HIGH' THEN 25
            WHEN '3-MEDIUM' THEN 10 WHEN '4-NOT SPECIFIED' THEN 10
            WHEN '5-LOW' THEN 5 END
    GROUP BY o_orderpriority
    """,
)
def p20b_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sample of orders by priority with
    per-stratum keep rates, summarized per stratum."""
    o = load_table(spark, sf_dir, "orders")
    kept = stratified_hash_sample(o, "o_orderpriority", "o_orderkey",
                                  STRATA_PCT)
    return (
        kept.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_sampled"),
             money_sum("o_totalprice").alias("revenue"))
    )


@query(
    "p19b_hash_split",
    oracle="""
    SELECT CASE WHEN (o_orderkey * 2654435761) % 2147483648 % 100 < 80
                THEN 'train' ELSE 'test' END AS split,
           COUNT(*) AS n,
           CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT))
                AS DOUBLE) / 100.0 AS revenue
    FROM orders
    GROUP BY 1
    ORDER BY split
    """,
)
def p19b_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P19 with a deterministic oracle: 80/20 hash split of orders with
    per-split row counts and exact revenue totals."""
    o = load_table(spark, sf_dir, "orders")
    train, test = train_test_split(o, "o_orderkey", 80)
    tagged = train.withColumn("split", F.lit("train")).unionByName(
        test.withColumn("split", F.lit("test")))
    return (
        tagged.groupBy("split")
        .agg(F.count(F.lit(1)).alias("n"),
             money_sum("o_totalprice").alias("revenue"))
        .orderBy("split")
    )
