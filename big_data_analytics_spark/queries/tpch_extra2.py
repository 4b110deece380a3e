"""Second wave of TPC-H-shaped plan patterns: the remaining classic
query shapes expressible on the driver's reduced star schema —
multi-way join pipelines (q3/q5/q7), conditional market-share ratios
(q8), profit rollups (q9), outer-join distributions (q13), grouped
HAVING semi-joins (q18), and the only-late-supplier exists/not-exists
pattern (q21). partsupp-dependent shapes (q2/q11/q20) have no
equivalent tables here and are out of scope.

Scale notes common to all: region/nation/supplier/part are broadcast
dims; the lineitem⋈orders backbone is the one real shuffle, and every
aggregate is cents-exact (functions/money.py) so results are
partitioning-independent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from big_data_analytics_spark.catalog import load_table
from big_data_analytics_spark.functions.money import money_cents, money_sum
from big_data_analytics_spark.operators.joins import sized_side
from big_data_analytics_spark.queries import query

_CENTS_SQL = "CAST(FLOOR({expr}*100.0+0.5) AS BIGINT)"


def _money_sum_sql(expr: str) -> str:
    return f"CAST(SUM({_CENTS_SQL.format(expr=expr)}) AS DOUBLE)/100.0"


# --------------------------------------------------------------------
# Q3: shipping-priority top-k — segment filter, 3-way join, grouped
# revenue, deterministic top 10.
# --------------------------------------------------------------------
@query(
    "q3_shipping_priority",
    oracle=f"""
    SELECT l.l_orderkey,
           {_money_sum_sql("l.l_extendedprice*(1-l.l_discount)")} AS revenue,
           o.o_orderdate
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1999-03-15 00:00:00'
      AND l.l_shipdate > TIMESTAMP '1999-03-15 00:00:00'
    GROUP BY l.l_orderkey, o.o_orderdate
    ORDER BY revenue DESC, o.o_orderdate, l.l_orderkey
    LIMIT 10
    """,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unshipped high-revenue orders for one market segment. The
    segment filter prunes customer before the join; revenue is exact
    cents so the top-10 cut is engine-stable."""
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1999-03-15 00:00:00").cast("timestamp"))
    l = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1999-03-15 00:00:00").cast("timestamp"))
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(money_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
             .alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("o_orderdate"), F.asc("l_orderkey"))
        .limit(10)
        .select("l_orderkey", "revenue", "o_orderdate")
    )


# --------------------------------------------------------------------
# Q5: local-supplier volume — 6-way join where the supplier must sit
# in the customer's nation.
# --------------------------------------------------------------------
@query(
    "q5_local_supplier_volume",
    oracle=f"""
    SELECT n.n_name,
           {_money_sum_sql("l.l_extendedprice*(1-l.l_discount)")} AS revenue
    FROM region r
    JOIN nation n ON n.n_regionkey = r.r_regionkey
    JOIN customer c ON c.c_nationkey = n.n_nationkey
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
                   AND s.s_nationkey = c.c_nationkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY n.n_name
    """,
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue through same-nation supplier/customer pairs in one
    region-year. region/nation/supplier broadcast; the extra
    s_nationkey = c_nationkey equi-condition rides the supplier join."""
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = load_table(spark, sf_dir, "nation")
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp")))
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(sized_side(s, s.count()), (s.s_suppkey == l.l_suppkey)
              & (s.s_nationkey == c.c_nationkey))
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(money_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
             .alias("revenue"))
    )


# --------------------------------------------------------------------
# Q7: volume shipping between two nations, by direction and year.
# --------------------------------------------------------------------
@query(
    "q7_nation_trade_volume",
    oracle=f"""
    SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
           EXTRACT(year FROM l.l_shipdate) AS ship_year,
           {_money_sum_sql("l.l_extendedprice*(1-l.l_discount)")} AS revenue
    FROM lineitem l
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation ns ON ns.n_nationkey = s.s_nationkey
    JOIN nation nc ON nc.n_nationkey = c.c_nationkey
    WHERE ((ns.n_name = 'NATION_1' AND nc.n_name = 'NATION_2')
        OR (ns.n_name = 'NATION_2' AND nc.n_name = 'NATION_1'))
      AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY 1, 2, 3
    """,
)
def q7_nation_trade_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bidirectional nation-pair trade by ship year: the self-joined
    dimension (nation twice, different roles) + OR-of-pairs predicate,
    evaluated after two broadcast joins."""
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp")))
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    ns = nation.select(F.col("n_nationkey").alias("ns_key"),
                       F.col("n_name").alias("supp_nation"))
    nc = nation.select(F.col("n_nationkey").alias("nc_key"),
                       F.col("n_name").alias("cust_nation"))
    pair = (
        ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
        | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    )
    return (
        l.join(o, o.o_orderkey == l.l_orderkey)
        .join(c, c.c_custkey == o.o_custkey)
        .join(sized_side(s, s.count()), s.s_suppkey == l.l_suppkey)
        .join(F.broadcast(ns), F.col("ns_key") == F.col("s_nationkey"))
        .join(F.broadcast(nc), F.col("nc_key") == F.col("c_nationkey"))
        .filter(pair)
        .groupBy("supp_nation", "cust_nation",
                 F.year("l_shipdate").cast("long").alias("ship_year"))
        .agg(money_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
             .alias("revenue"))
    )


# --------------------------------------------------------------------
# Q8: national market share within a region/product type, per year.
# --------------------------------------------------------------------
@query(
    "q8_market_share",
    oracle=f"""
    SELECT order_year,
           ROUND(CAST(SUM(CASE WHEN supp_nation = 'NATION_3'
                          THEN cents ELSE 0 END) AS DOUBLE)
                 / CAST(SUM(cents) AS DOUBLE), 6) AS mkt_share
    FROM (
        SELECT EXTRACT(year FROM o.o_orderdate) AS order_year,
               ns.n_name AS supp_nation,
               {_CENTS_SQL.format(expr="l.l_extendedprice*(1-l.l_discount)")} AS cents
        FROM lineitem l
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation nc ON nc.n_nationkey = c.c_nationkey
        JOIN region r ON r.r_regionkey = nc.n_regionkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation ns ON ns.n_nationkey = s.s_nationkey
        JOIN part p ON p.p_partkey = l.l_partkey
        WHERE r.r_name = 'AMERICA' AND p.p_type = 'ECONOMY'
          AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o.o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    )
    GROUP BY order_year
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One nation's share of a region's spend on one part type, per
    year: conditional cents-sum over total cents-sum (exact integer
    numerator/denominator, divided once at the end)."""
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp")))
    c = load_table(spark, sf_dir, "customer")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    s = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(
        F.col("r_name") == "AMERICA")
    nc = nation.select(F.col("n_nationkey").alias("nc_key"),
                       F.col("n_regionkey").alias("nc_region"))
    ns = nation.select(F.col("n_nationkey").alias("ns_key"),
                       F.col("n_name").alias("supp_nation"))
    cents = money_cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    joined = (
        l.join(o, o.o_orderkey == l.l_orderkey)
        .join(c, c.c_custkey == o.o_custkey)
        .join(F.broadcast(nc), F.col("nc_key") == F.col("c_nationkey"))
        .join(F.broadcast(region), F.col("nc_region") == F.col("r_regionkey"))
        .join(sized_side(s, s.count()), s.s_suppkey == l.l_suppkey)
        .join(F.broadcast(ns), F.col("ns_key") == F.col("s_nationkey"))
        .join(sized_side(p, p.count()), p.p_partkey == l.l_partkey)
        .select(F.year("o_orderdate").cast("long").alias("order_year"),
                "supp_nation", cents.alias("cents"))
    )
    return (
        joined.groupBy("order_year")
        .agg(F.round(
            F.sum(F.when(F.col("supp_nation") == "NATION_3",
                         F.col("cents")).otherwise(F.lit(0))).cast("double")
            / F.sum("cents").cast("double"), 6).alias("mkt_share"))
    )


# --------------------------------------------------------------------
# Q9-shaped: profit by supplier nation and year. The schema has no
# partsupp/supplycost, so cost is proxied as 60% of the part's retail
# price — the plan shape (LIKE-filtered part dim, 5-way join, signed
# money rollup) is the point.
# --------------------------------------------------------------------
@query(
    "q9_product_profit",
    oracle="""
    SELECT ns.n_name AS supp_nation,
           EXTRACT(year FROM l.l_shipdate) AS ship_year,
           CAST(SUM(CAST(FLOOR((l.l_extendedprice*(1-l.l_discount)
                                - 0.6*p.p_retailprice*l.l_quantity)*100.0+0.5)
                         AS BIGINT)) AS DOUBLE)/100.0 AS profit
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation ns ON ns.n_nationkey = s.s_nationkey
    WHERE p.p_name LIKE '%red%'
    GROUP BY 1, 2
    """,
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Signed profit rollup: revenue minus proxied cost per line, in
    cents before summing (FLOOR(x*100+0.5) handles negatives half-up
    identically in both engines)."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").contains("red"))
    s = load_table(spark, sf_dir, "supplier")
    ns = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("ns_key"),
        F.col("n_name").alias("supp_nation"))
    amount = (F.col("l_extendedprice") * (1 - F.col("l_discount"))
              - F.lit(0.6) * F.col("p_retailprice") * F.col("l_quantity"))
    return (
        l.join(sized_side(p, p.count()), p.p_partkey == l.l_partkey)
        .join(sized_side(s, s.count()), s.s_suppkey == l.l_suppkey)
        .join(F.broadcast(ns), F.col("ns_key") == F.col("s_nationkey"))
        .groupBy("supp_nation",
                 F.year("l_shipdate").cast("long").alias("ship_year"))
        .agg((F.sum(F.floor(amount * 100.0 + F.lit(0.5))).cast("double")
              / F.lit(100.0)).alias("profit"))
    )


# --------------------------------------------------------------------
# Q10: returned-item reporting — top 20 customers by refund-quarter
# revenue.
# --------------------------------------------------------------------
@query(
    "q10_returned_items",
    oracle=f"""
    SELECT c.c_custkey, c.c_name,
           {_money_sum_sql("l.l_extendedprice*(1-l.l_discount)")} AS revenue,
           c.c_acctbal, n.n_name
    FROM customer c
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    WHERE l.l_returnflag = 'R'
      AND o.o_orderdate >= TIMESTAMP '1998-10-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1999-01-01 00:00:00'
    GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
    ORDER BY revenue DESC, c.c_custkey
    LIMIT 20
    """,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers who returned the most revenue in one quarter: filter
    both fact sides before the join, broadcast nation, exact-cents
    top-20 with key tie-break."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1998-10-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1999-01-01 00:00:00").cast("timestamp")))
    l = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = load_table(spark, sf_dir, "nation")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(money_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
             .alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
    )


# --------------------------------------------------------------------
# Q13: customer order-count distribution via outer join.
# --------------------------------------------------------------------
@query(
    "q13_order_distribution",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist
    FROM (
        SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
        FROM customer c
        LEFT JOIN orders o ON o.o_custkey = c.c_custkey
                          AND o.o_orderpriority <> '5-LOW'
        GROUP BY c.c_custkey
    )
    GROUP BY c_count
    """,
)
def q13_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-level aggregate over a filtered LEFT join: customers with
    zero qualifying orders must appear in the c_count=0 bucket (the
    join-condition filter, not a WHERE, preserves them)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "5-LOW")
    per_cust = (
        c.join(o, o.o_custkey == c.c_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


# --------------------------------------------------------------------
# Q18: large-volume customers — grouped HAVING feeding a semi-join.
# --------------------------------------------------------------------
@query(
    "q18_large_volume_customers",
    oracle="""
    SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_orderdate,
           CAST(FLOOR(o.o_totalprice*100.0+0.5) AS BIGINT) AS totalprice_cents,
           CAST(big.qty AS DOUBLE) AS total_qty
    FROM (
        SELECT l_orderkey, SUM(l_quantity) AS qty
        FROM lineitem GROUP BY l_orderkey HAVING SUM(l_quantity) > 250
    ) big
    JOIN orders o ON o.o_orderkey = big.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    """,
)
def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders whose total quantity clears a threshold, with their
    customers: the aggregate runs first (map-side partial sums), and
    only the surviving handful of order keys join outward. Quantities
    are integral in this data, so SUM(double) is exact."""
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .filter(F.col("total_qty") > 250)
    )
    return (
        big.join(o, o.o_orderkey == big.l_orderkey)
        .join(c, c.c_custkey == o.o_custkey)
        .select(
            "c_custkey", "c_name", "o_orderkey", "o_orderdate",
            money_cents("o_totalprice").alias("totalprice_cents"),
            F.col("total_qty").cast("double").alias("total_qty"),
        )
    )


# --------------------------------------------------------------------
# Q21-shaped: the sole-late-supplier pattern. The schema has no
# commit/receipt dates, so "late" = shipped more than 90 days after
# the order date; keep suppliers who were the ONLY late supplier on a
# multi-supplier order.
# --------------------------------------------------------------------
@query(
    "q21_sole_late_supplier",
    oracle="""
    SELECT s.s_name, COUNT(*) AS numwait
    FROM (
        SELECT l.l_orderkey,
               l.l_suppkey,
               MAX(CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
                        THEN 1 ELSE 0 END) AS is_late
        FROM lineitem l
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        GROUP BY l.l_orderkey, l.l_suppkey
    ) per_supp
    JOIN (
        SELECT l_orderkey FROM (
            SELECT l.l_orderkey,
                   COUNT(*) AS n_supp,
                   SUM(MAX_LATE) AS n_late
            FROM (
                SELECT l.l_orderkey AS l_orderkey, l.l_suppkey,
                       MAX(CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
                                THEN 1 ELSE 0 END) AS MAX_LATE
                FROM lineitem l
                JOIN orders o ON o.o_orderkey = l.l_orderkey
                GROUP BY l.l_orderkey, l.l_suppkey
            ) l
            GROUP BY l.l_orderkey
        )
        WHERE n_supp >= 2 AND n_late = 1
    ) q ON q.l_orderkey = per_supp.l_orderkey
    JOIN supplier s ON s.s_suppkey = per_supp.l_suppkey
    WHERE per_supp.is_late = 1
    GROUP BY s.s_name
    """,
)
def q21_sole_late_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers who alone delayed a multi-supplier order. One
    (orderkey, suppkey) aggregate feeds both the per-order tally and
    the final filter — computed once, reused via cache, never a
    correlated re-scan."""
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    s = load_table(spark, sf_dir, "supplier")
    late = (F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"))
    per_supp = (
        l.join(o, o.o_orderkey == l.l_orderkey)
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.max(F.when(late, 1).otherwise(0)).alias("is_late"))
        .cache()
    )
    sole_late_orders = (
        per_supp.groupBy("l_orderkey")
        .agg(F.count(F.lit(1)).alias("n_supp"),
             F.sum("is_late").alias("n_late"))
        .filter((F.col("n_supp") >= 2) & (F.col("n_late") == 1))
        .select("l_orderkey")
    )
    return (
        per_supp.filter(F.col("is_late") == 1)
        .join(sole_late_orders, "l_orderkey")
        .join(sized_side(s, s.count()), s.s_suppkey == F.col("l_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )
