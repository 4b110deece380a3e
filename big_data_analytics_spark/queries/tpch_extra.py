"""Additional TPC-H-shaped plan patterns (SURVEY.md §2 extension
surface): EXISTS-driven counts, conditional aggregation over a join,
ratio-of-conditional-sums, OR-of-ANDs predicate pushdown, distinct
counts per group.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from big_data_analytics_spark.catalog import load_table
from big_data_analytics_spark.functions.money import money_sum
from big_data_analytics_spark.operators.joins import sized_side
from big_data_analytics_spark.queries import query


# --------------------------------------------------------------------
# Q4-shaped: order-priority counts where an EXISTS condition holds.
# --------------------------------------------------------------------
@query(
    "q4_priority_with_late_items",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
    GROUP BY o_orderpriority
    """,
)
def q4_priority_with_late_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS subquery → left-semi join with a non-equi residual
    condition, then grouped count."""
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    l = load_table(spark, sf_dir, "lineitem")
    cond = (l.l_orderkey == o.o_orderkey) & (
        l.l_shipdate > o.o_orderdate + F.expr("INTERVAL 60 DAYS"))
    return (
        o.join(l, cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


# --------------------------------------------------------------------
# Q12-shaped: conditional aggregation over a fact⋈fact join.
# --------------------------------------------------------------------
@query(
    "q12_priority_shipping",
    oracle="""
    SELECT l.l_returnflag,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT','2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT','2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY l.l_returnflag
    """,
)
def q12_priority_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The two-counters-in-one-pass pattern over a join."""
    l = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
    o = load_table(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("long").alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).cast("long").alias("low_line_count"),
        )
    )


# --------------------------------------------------------------------
# Q14-shaped: ratio of a conditional money sum to the total.
# --------------------------------------------------------------------
@query(
    "q14_brand_revenue_share",
    oracle="""
    SELECT ROUND(
             (CAST(SUM(CASE WHEN p.p_type LIKE 'small%'
                       THEN CAST(FLOOR(l.l_extendedprice*(1-l.l_discount)*100.0+0.5) AS BIGINT)
                       ELSE 0 END) AS DOUBLE) / 100.0)
             / (CAST(SUM(CAST(FLOOR(l.l_extendedprice*(1-l.l_discount)*100.0+0.5) AS BIGINT)) AS DOUBLE) / 100.0)
             * 100.0, 6) AS small_type_share_pct,
           COUNT(*) AS n
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-09-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1997-10-01 00:00:00'
    """,
)
def q14_brand_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Promo-share pattern: conditional cents-sum ÷ total cents-sum,
    one pass, measured-pin part attachment (part scales with SF)."""
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-09-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-10-01 00:00:00").cast("timestamp")))
    p = load_table(spark, sf_dir, "part")
    n_part = p.count()  # parquet metadata count; part SCALES with SF
    rev_cents = F.floor(F.col("l_extendedprice") * (1 - F.col("l_discount"))
                        * 100.0 + 0.5)
    is_small = F.col("p_type").like("small%")
    return (
        l.join(sized_side(p, n_part), l.l_partkey == p.p_partkey)
        .agg(
            F.round(
                (F.sum(F.when(is_small, rev_cents).otherwise(0)).cast("double") / 100.0)
                / (F.sum(rev_cents).cast("double") / 100.0) * 100.0,
                6,
            ).alias("small_type_share_pct"),
            F.count(F.lit(1)).alias("n"),
        )
    )


# --------------------------------------------------------------------
# Q19-shaped: OR-of-ANDs selective predicate over a join.
# --------------------------------------------------------------------
@query(
    "q19_or_of_ands",
    oracle="""
    SELECT CAST(SUM(CAST(FLOOR(l.l_extendedprice*(1-l.l_discount)*100.0+0.5) AS BIGINT)) AS DOUBLE)/100.0 AS revenue,
           COUNT(*) AS n
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE (p.p_size BETWEEN 1 AND 10 AND l.l_quantity >= 30)
       OR (p.p_size BETWEEN 11 AND 25 AND l.l_quantity < 5)
       OR (p.p_brand = 'Brand#1' AND l.l_discount > 0.08)
    """,
)
def q19_or_of_ands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Disjunction of conjunctive ranges spanning both join sides —
    the predicate shape that tests residual-filter placement."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    joined = l.join(sized_side(p, p.count()), l.l_partkey == p.p_partkey)
    cond = (
        (F.col("p_size").between(1, 10) & (F.col("l_quantity") >= 30))
        | (F.col("p_size").between(11, 25) & (F.col("l_quantity") < 5))
        | ((F.col("p_brand") == "Brand#1") & (F.col("l_discount") > 0.08))
    )
    return joined.filter(cond).agg(
        money_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
        .alias("revenue"),
        F.count(F.lit(1)).alias("n"),
    )


# --------------------------------------------------------------------
# Q16-shaped: distinct counts per group after an anti-join filter.
# --------------------------------------------------------------------
@query(
    "q16_supplier_variety",
    oracle="""
    SELECT p.p_brand, p.p_type,
           COUNT(DISTINCT l.l_suppkey) AS supplier_cnt,
           COUNT(*) AS line_cnt
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE p.p_size IN (1, 5, 9, 13)
      AND NOT EXISTS (SELECT 1 FROM supplier s
                      WHERE s.s_suppkey = l.l_suppkey
                        AND s.s_acctbal < -500)
    GROUP BY p.p_brand, p.p_type
    """,
)
def q16_supplier_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT(DISTINCT) per group + anti-join exclusion list."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(
        F.col("p_size").isin(1, 5, 9, 13))
    # base-table count is the cheap (metadata) conservative bound for
    # the filtered build side
    n_part = load_table(spark, sf_dir, "part").count()
    bad_supp = load_table(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < -500)
    return (
        l.join(sized_side(p, n_part), l.l_partkey == p.p_partkey)
        .join(bad_supp, l.l_suppkey == bad_supp.s_suppkey, "left_anti")
        .groupBy("p_brand", "p_type")
        .agg(
            F.countDistinct("l_suppkey").alias("supplier_cnt"),
            F.count(F.lit(1)).alias("line_cnt"),
        )
    )


# --------------------------------------------------------------------
# Q17-shaped: correlated scalar-aggregate subquery (below-average
# quantity per part), decorrelated into an aggregate join.
# --------------------------------------------------------------------
@query(
    "q17_below_avg_quantity",
    oracle="""
    WITH part_avg AS (
        SELECT l_partkey, AVG(l_quantity) AS avg_qty
        FROM lineitem GROUP BY l_partkey
    )
    SELECT CAST(SUM(CAST(FLOOR(l.l_extendedprice * 100.0 + 0.5) AS BIGINT)) AS DOUBLE)
               / 100.0 / 7.0 AS avg_yearly,
           COUNT(*) AS n
    FROM lineitem l
    JOIN part_avg pa ON l.l_partkey = pa.l_partkey
    WHERE l.l_quantity < 0.4 * pa.avg_qty
    """,
)
def q17_below_avg_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The correlated `l_quantity < 0.4 * (SELECT avg(...) WHERE same
    part)` pattern, decorrelated: per-part averages once, joined back.
    Catalyst performs this rewrite for correlated subqueries too; the
    explicit form keeps the plan obvious."""
    l = load_table(spark, sf_dir, "lineitem")
    part_avg = l.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.avg("l_quantity").alias("avg_qty"))
    return (
        l.join(part_avg, l.l_partkey == part_avg.pk)
        .filter(F.col("l_quantity") < 0.4 * F.col("avg_qty"))
        .agg(
            (F.sum(F.floor(F.col("l_extendedprice") * 100.0 + 0.5))
             .cast("double") / 100.0 / 7.0).alias("avg_yearly"),
            F.count(F.lit(1)).alias("n"),
        )
    )


# --------------------------------------------------------------------
# Q15-shaped: aggregate view + filter on the global max of the view.
# --------------------------------------------------------------------
@query(
    "q15_top_suppliers",
    oracle="""
    WITH revenue_view AS (
        SELECT l_suppkey,
               CAST(SUM(CAST(FLOOR(l_extendedprice*(1-l_discount)*100.0+0.5) AS BIGINT)) AS DOUBLE)/100.0 AS total_rev
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, r.total_rev
    FROM revenue_view r
    JOIN supplier s ON s.s_suppkey = r.l_suppkey
    WHERE r.total_rev = (SELECT MAX(total_rev) FROM revenue_view)
    """,
)
def q15_top_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self-referencing aggregate view: revenue per supplier, keep the
    max. Exact cents revenue makes the max deterministic (a double max
    could tie-break differently across engines)."""
    l = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
    rev = l.groupBy("l_suppkey").agg(
        money_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
        .alias("total_rev"))
    max_rev = rev.agg(F.max("total_rev").alias("m"))
    s = load_table(spark, sf_dir, "supplier")
    return (
        rev.join(F.broadcast(max_rev), rev.total_rev == max_rev.m)
        .join(s, rev.l_suppkey == s.s_suppkey)
        .select("s_suppkey", "s_name", "total_rev")
    )


# --------------------------------------------------------------------
# Q22-shaped: filter on a global scalar aggregate + NOT EXISTS.
# --------------------------------------------------------------------
@query(
    "q22_idle_rich_customers",
    oracle="""
    WITH avg_bal AS (
        SELECT AVG(c_acctbal) AS a FROM customer WHERE c_acctbal > 0
    )
    SELECT c.c_nationkey AS cntry, COUNT(*) AS numcust,
           CAST(SUM(CAST(FLOOR(c.c_acctbal * 100.0 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0 AS totacctbal
    FROM customer c, avg_bal
    WHERE c.c_acctbal > avg_bal.a
      AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    GROUP BY c.c_nationkey
    """,
)
def q22_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global-scalar filter (above-average balance) + anti-join (never
    ordered), grouped. The scalar aggregate broadcasts as a 1-row
    cross join — no collect to the driver."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    avg_bal = c.filter(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("a"))
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("a"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy(F.col("c_nationkey").alias("cntry"))
        .agg(F.count(F.lit(1)).alias("numcust"),
             money_sum("c_acctbal").alias("totacctbal"))
    )
