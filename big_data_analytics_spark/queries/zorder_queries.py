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
from big_data_analytics_spark.operators.zorder import morton2, with_hilbert2
from big_data_analytics_spark.queries import query
from big_data_analytics_spark.operators.partitioning import spread_if_undersplit

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


_H_BITS = 16


def _hilbert_sql() -> str:
    """The operator's unrolled xy2d recursion as chained CTE stages —
    one CTE per bit, same flip/swap CASE expressions (DuckDB xor())."""
    mask = (1 << _H_BITS) - 1
    body = f"""
    WITH s{_H_BITS} AS (
        SELECT l_partkey, l_suppkey,
               l_partkey & {mask} AS hx,
               l_suppkey & {mask} AS hy,
               CAST(0 AS BIGINT) AS hd
        FROM lineitem
    )"""
    prev = f"s{_H_BITS}"
    for i in range(_H_BITS - 1, -1, -1):
        s = 1 << i
        rx = f"(CASE WHEN (hx & {s}) > 0 THEN 1 ELSE 0 END)"
        ry = f"(CASE WHEN (hy & {s}) > 0 THEN 1 ELSE 0 END)"
        body += f""", s{i} AS (
        SELECT l_partkey, l_suppkey,
               CASE WHEN {ry} = 0 THEN
                    (CASE WHEN {rx} = 1 THEN {s} - 1 - hy ELSE hy END)
                    ELSE hx END AS hx,
               CASE WHEN {ry} = 0 THEN
                    (CASE WHEN {rx} = 1 THEN {s} - 1 - hx ELSE hx END)
                    ELSE hy END AS hy,
               hd + CAST({s} AS BIGINT) * {s}
                  * xor(3 * {rx}, {ry}) AS hd
        FROM {prev}
    )"""
        prev = f"s{i}"
    body += f"""
    SELECT CAST(hd >> 20 AS BIGINT) AS h_bucket,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(MIN(l_partkey) AS BIGINT) AS min_part,
           CAST(MAX(l_partkey) AS BIGINT) AS max_part,
           CAST(MIN(l_suppkey) AS BIGINT) AS min_supp,
           CAST(MAX(l_suppkey) AS BIGINT) AS max_supp
    FROM {prev}
    GROUP BY h_bucket
    """
    return body


@query("z2_hilbert_keys", oracle=_hilbert_sql())
def z2_hilbert_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hilbert-curve bucket profile of (l_partkey, l_suppkey) — z1's
    Morton layout upgraded to the curve with PROVABLE locality:
    consecutive Hilbert indices are always Manhattan-adjacent cells
    (property-tested on the full small grid), where Morton jumps at
    every power-of-two boundary, so Hilbert-clustered files carry
    tighter bounding boxes and parquet min/max skipping prunes more
    files for the same box predicate (the layout Delta/Iceberg
    expose as OPTIMIZE ... HILBERT where supported). Same bucket
    profile shape as z1 so the two layouts' per-bucket bounding
    boxes compare directly (measured comparison in SCALE.md).

    Scale shape: the encode is {B} unrolled stages of integer
    CASE/AND/XOR expressions — materialized as intermediate columns
    so the expression tree stays LINEAR in the bit count (the naive
    chained form squares per stage and breaks codegen by stage ~8) —
    followed by one partial-combined aggregation; the whole thing is
    one narrow codegen'd map, same cost class as z1."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey")
    # the 16-stage encode is ~50 integer CASE expressions per row —
    # per-row-heavy work that serializes on the scan's few splits
    # (the ev3 under-split hazard; 3 tasks at sf0.1); spread only
    # when under-split
    li = spread_if_undersplit(li)
    coded = with_hilbert2(li, "l_partkey", "l_suppkey", out="h",
                          bits=_H_BITS)
    return (coded
            .groupBy(F.call_function("shiftright", F.col("h"), F.lit(20))
                     .cast("long").alias("h_bucket"))
            .agg(F.count(F.lit(1)).cast("long").alias("n_rows"),
                 F.min("l_partkey").cast("long").alias("min_part"),
                 F.max("l_partkey").cast("long").alias("max_part"),
                 F.min("l_suppkey").cast("long").alias("min_supp"),
                 F.max("l_suppkey").cast("long").alias("max_supp")))


z2_hilbert_keys.__doc__ = z2_hilbert_keys.__doc__.format(B=_H_BITS)
