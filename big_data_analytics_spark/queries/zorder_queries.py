"""Driver-visible query over the Z-order (Morton) clustering operator.

operators/zorder.py was pytest-only; z1 gives the layout component a
hash-graded driver row. The Morton encode is pure integer
bit-twiddling (shift/AND magic-number spreads), so DuckDB can compute
the identical code — the oracle replicates the exact doubling steps as
SQL bit expressions (_spread_sql), making the interleave
value-checked, not just property-tested.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from big_data_analytics_spark.catalog import load_table
from big_data_analytics_spark.operators.zorder import morton2
from big_data_analytics_spark.queries import query

#: The operator's bit-spread doubling steps, mirrored into SQL.
_SPREAD_STEPS = (
    (8, 0x00FF00FF00FF00FF),
    (4, 0x0F0F0F0F0F0F0F0F),
    (2, 0x3333333333333333),
    (1, 0x5555555555555555),
)


def _spread_sql(col: str) -> str:
    """SQL expression spreading the low 16 bits of ``col`` to even bit
    positions — byte-for-byte the operator's _spread16."""
    x = (f"((({col} & 65535) | (({col} & 65535) << 16)) "
         f"& {0x0000FFFF0000FFFF})")
    for shift, mask in _SPREAD_STEPS:
        x = f"((({x}) | (({x}) << {shift})) & {mask})"
    return x


_Z_SQL = (f"({_spread_sql('l_partkey')} | "
          f"({_spread_sql('l_suppkey')} << 1))")


@query(
    "z1_zorder_keys",
    oracle=f"""
    WITH coded AS (
        SELECT l_partkey, l_suppkey, {_Z_SQL} AS z
        FROM lineitem
    )
    SELECT CAST(z >> 20 AS BIGINT) AS z_bucket,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(MIN(l_partkey) AS BIGINT) AS min_part,
           CAST(MAX(l_partkey) AS BIGINT) AS max_part,
           CAST(MIN(l_suppkey) AS BIGINT) AS min_supp,
           CAST(MAX(l_suppkey) AS BIGINT) AS max_supp
    FROM coded
    GROUP BY z_bucket
    """,
)
def z1_zorder_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton-code bucket profile of lineitem's (l_partkey, l_suppkey):
    interleave the two keys' bits (the Delta/Iceberg OPTIMIZE ZORDER
    layout primitive, operators/zorder.py:morton2 — pure shift/AND
    column expressions, whole-stage codegen, no UDF), bucket by the
    code's high bits, and report each bucket's row count and key
    bounding box. The tight per-bucket min/max on BOTH keys is the
    point of the layout: written in z-order (zorder_write), parquet
    footer stats prune box predicates on either key.

    Scale shape: one narrow map (the encode) + one partial-combined
    aggregation — the same cost as any single-key profile; the graded
    result proves the interleave is bit-exact against an independent
    engine's integer arithmetic."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey")
    z = morton2(F.col("l_partkey"), F.col("l_suppkey"))
    return (
        li.withColumn("z", z)
        .groupBy(F.call_function("shiftright", F.col("z"), F.lit(20))
                 .cast("long").alias("z_bucket"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.min("l_partkey").cast("long").alias("min_part"),
            F.max("l_partkey").cast("long").alias("max_part"),
            F.min("l_suppkey").cast("long").alias("min_supp"),
            F.max("l_suppkey").cast("long").alias("max_supp"),
        )
    )
