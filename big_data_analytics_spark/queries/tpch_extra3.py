"""Third wave of TPC-H-shaped plan patterns: the partsupp-dependent
shapes (q2/q11/q20) have no partsupp table on this schema, but their
*plan patterns* — correlated per-group minimum (q2), HAVING against a
fraction of a global scalar (q11), and dominant-contributor nested
aggregation (q20) — are schema-independent. This module re-derives
each on the available star schema so the full 22-pattern family has
coverage.

Scale notes: per-group minima and global totals are tiny aggregates
that broadcast back against the fact/dim side; the lineitem
aggregations are partial+final; all money/quantity comparisons go
through integer cents (functions/money.py) so the filter cuts are
engine-stable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from big_data_analytics_spark.catalog import load_table
from big_data_analytics_spark.functions.money import money_cents, money_sum
from big_data_analytics_spark.operators.joins import sized_side
from big_data_analytics_spark.queries import query

_CENTS_SQL = "CAST(FLOOR({expr}*100.0+0.5) AS BIGINT)"


# --------------------------------------------------------------------
# Q2 pattern: correlated per-group minimum — rows equal to their
# group's min, then enrichment joins.
# --------------------------------------------------------------------
@query(
    "q2p_min_price_per_type",
    oracle=f"""
    SELECT p.p_type, p.p_partkey, p.p_name, p.p_retailprice
    FROM part p
    JOIN (SELECT p_type,
                 MIN({_CENTS_SQL.format(expr="p_retailprice")}) AS min_c
          FROM part GROUP BY p_type) m
      ON m.p_type = p.p_type
     AND {_CENTS_SQL.format(expr="p.p_retailprice")} = m.min_c
    """,
)
def q2p_min_price_per_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q2's correlated-min shape (min-cost supplier per part →
    here: cheapest part(s) per p_type). The per-type minimum is a tiny
    aggregate broadcast back against part; the equality cut compares
    integer cents, never raw doubles. Ties all surface (like q2's
    multi-supplier ties)."""
    p = load_table(spark, sf_dir, "part")
    mins = (p.groupBy("p_type")
            .agg(F.min(money_cents("p_retailprice")).alias("min_c")))
    return (
        p.join(F.broadcast(mins), "p_type")
        .filter(money_cents("p_retailprice") == F.col("min_c"))
        .select("p_type", "p_partkey", "p_name", "p_retailprice")
    )


# --------------------------------------------------------------------
# Q11 pattern: groups whose aggregate exceeds a fraction of the
# global total (scalar-subquery HAVING).
# --------------------------------------------------------------------
@query(
    "q11p_supplier_revenue_share",
    oracle=f"""
    WITH s_rev AS (
      SELECT l_suppkey,
             SUM({_CENTS_SQL.format(expr="l_extendedprice*(1-l_discount)")})
                 AS rev_c
      FROM lineitem GROUP BY l_suppkey
    ), tot AS (
      SELECT CAST(SUM(rev_c) AS BIGINT) AS tot_c FROM s_rev
    )
    SELECT l_suppkey,
           CAST(rev_c AS DOUBLE)/100.0 AS revenue,
           CAST(rev_c AS DOUBLE) / CAST(tot_c AS DOUBLE) AS share
    FROM s_rev, tot
    WHERE CAST(rev_c AS DOUBLE) > 0.011 * CAST(tot_c AS DOUBLE)
    """,
)
def q11p_supplier_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q11's fraction-of-global-total HAVING: suppliers whose
    lineitem revenue exceeds 1.1% of all revenue. Two-level exact-cents
    aggregation; the global total is a 1-row broadcast, and the share
    is a division of two identical exact longs on both engines."""
    l = load_table(spark, sf_dir, "lineitem")
    rev = (l.groupBy("l_suppkey")
           .agg(F.sum(money_cents(
               F.col("l_extendedprice") * (1 - F.col("l_discount"))))
               .alias("rev_c")))
    tot = rev.agg(F.sum("rev_c").cast("long").alias("tot_c"))
    return (
        rev.crossJoin(F.broadcast(tot))
        .filter(F.col("rev_c").cast("double")
                > 0.011 * F.col("tot_c").cast("double"))
        .select(
            "l_suppkey",
            (F.col("rev_c").cast("double") / 100.0).alias("revenue"),
            (F.col("rev_c").cast("double")
             / F.col("tot_c").cast("double")).alias("share"),
        )
    )


# --------------------------------------------------------------------
# Q20 pattern: dominant-contributor detection — nested aggregation
# where a (part, supplier) cell is compared to the part's total.
# --------------------------------------------------------------------
@query(
    "q20p_dominant_part_suppliers",
    oracle=f"""
    WITH ps AS (
      SELECT l_partkey, l_suppkey,
             SUM({_CENTS_SQL.format(expr="l_quantity")}) AS qty_c
      FROM lineitem GROUP BY l_partkey, l_suppkey
    ), pt AS (
      SELECT l_partkey, CAST(SUM(qty_c) AS BIGINT) AS tot_c
      FROM ps GROUP BY l_partkey
    )
    SELECT s.s_suppkey, s.s_name,
           CAST(COUNT(*) AS BIGINT) AS n_dominated_parts
    FROM ps
    JOIN pt USING (l_partkey)
    JOIN supplier s ON s.s_suppkey = ps.l_suppkey
    WHERE CAST(ps.qty_c AS DOUBLE) > 0.4 * CAST(pt.tot_c AS DOUBLE)
    GROUP BY s.s_suppkey, s.s_name
    """,
)
def q20p_dominant_part_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q20's excess-contributor shape: suppliers that shipped
    more than 40% of some part's total shipped quantity, with how many
    parts they dominate. The (part, supplier) rollup reuses its own
    output for the per-part total (no second lineitem scan), and the
    supplier dim is measured-pinned for the name enrichment (supplier
    SCALES with SF — broadcast under the ceiling, sort-merge past
    it)."""
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    ps = (l.groupBy("l_partkey", "l_suppkey")
          .agg(F.sum(money_cents("l_quantity")).alias("qty_c")))
    pt = ps.groupBy("l_partkey").agg(
        F.sum("qty_c").cast("long").alias("tot_c"))
    return (
        ps.join(pt, "l_partkey")
        .filter(F.col("qty_c").cast("double")
                > 0.4 * F.col("tot_c").cast("double"))
        .join(sized_side(s.select("s_suppkey", "s_name"), s.count()),
              ps.l_suppkey == F.col("s_suppkey"))
        .groupBy("s_suppkey", "s_name")
        .agg(F.count(F.lit(1)).alias("n_dominated_parts"))
    )
