"""Relational operator inventory — scans, filters, joins, aggregations,
sorts, set ops (SURVEY.md §2.1-2.4, §2.6-2.7) expressed on the driver's
TPC-H-ish fixtures.

Each query mirrors a capability of the reference (citations in
docstrings point at /root/reference). The implementations are plain
declarative DataFrame plans: Catalyst provides predicate pushdown,
column pruning, broadcast-join selection, and partial aggregation —
the properties that keep these plans viable at 100 TB.

Money totals follow the integer-cents convention from
``big_data_analytics_spark.functions.money`` so results are exact and
order-independent (a parallel double-SUM is neither).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from big_data_analytics_spark.catalog import load_table
from big_data_analytics_spark.functions.money import money_sum, money_avg, scaled_sum
from big_data_analytics_spark.queries import query


# --------------------------------------------------------------------
# A1/P1/S1 — grouped pricing summary (the flagship query).
# Reference analogue: revenue-by-state group-aggregate,
# /root/reference/spark_processing.py:45-52.
# --------------------------------------------------------------------
@query(
    "a1_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(FLOOR(l_quantity * 100.0 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_qty,
           CAST(SUM(CAST(FLOOR(l_extendedprice * 100.0 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_base_price,
           CAST(SUM(CAST(FLOOR(l_extendedprice*(1-l_discount) * 100.0 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_disc_price,
           CAST(SUM(CAST(FLOOR(l_extendedprice*(1-l_discount)*(1+l_tax) * 100.0 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_charge,
           CAST(SUM(CAST(FLOOR(l_quantity * 100.0 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0 / COUNT(l_quantity) AS avg_qty,
           CAST(SUM(CAST(FLOOR(l_extendedprice * 100.0 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0 / COUNT(l_extendedprice) AS avg_price,
           CAST(SUM(CAST(FLOOR(l_discount * 10000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 10000.0 / COUNT(l_discount) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-09-01 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def a1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filter → group → multi-aggregate (sum/avg/count) with exact money
    totals. Partial + final hash aggregation; the shipdate filter and the
    6-column projection push into the Parquet scan."""
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2001-09-01 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            money_sum("l_quantity").alias("sum_qty"),
            money_sum("l_extendedprice").alias("sum_base_price"),
            money_sum(disc_price).alias("sum_disc_price"),
            money_sum(charge).alias("sum_charge"),
            money_avg("l_quantity").alias("avg_qty"),
            money_avg("l_extendedprice").alias("avg_price"),
            (scaled_sum("l_discount", 10000) / F.count("l_discount")).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# --------------------------------------------------------------------
# J1+A1+O1 — dim ⋈ dim ⋈ fact, grouped revenue. Mirrors the reference's
# revenue-by-state query (/root/reference/spark_processing.py:45-52):
# users⋈transactions → here customer⋈nation⋈orders.
# --------------------------------------------------------------------
@query(
    "j1_revenue_by_nation",
    oracle="""
    SELECT n.n_name AS nation,
           CAST(SUM(CAST(FLOOR(o.o_totalprice * 100.0 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0 AS total_revenue,
           COUNT(*) AS order_count
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
)
def j1_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inner equi-joins with broadcast dims (nation: 25 rows, customer:
    1% of fact) → grouped exact money sum. At scale: nation always
    broadcasts; customer broadcasts until ~10 GB, then AQE falls back to
    shuffled hash join."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    return (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            money_sum("o_totalprice").alias("total_revenue"),
            F.count(F.lit(1)).alias("order_count"),
        )
    )


# --------------------------------------------------------------------
# O1/O2 — top-k by aggregate without a global sort
# (TakeOrderedAndProject). Reference: ORDER BY total_revenue DESC LIMIT
# 10, /root/reference/spark_processing.py:50-51; Mongo $sort+$limit,
# /root/reference/mongodb_pipeline.py:14-15.
# --------------------------------------------------------------------
@query(
    "o1_top_orders_by_revenue",
    oracle="""
    SELECT l_orderkey,
           CAST(SUM(CAST(FLOOR(l_extendedprice*(1-l_discount) * 100.0 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0 AS revenue
    FROM lineitem
    GROUP BY l_orderkey
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def o1_top_orders_by_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-sum then top-10; exact decimal revenue makes the ordering
    deterministic, and the orderkey tie-break makes the k-boundary
    stable across engines. Catalyst plans TakeOrderedAndProject — each
    partition keeps only its local top-10."""
    li = load_table(spark, sf_dir, "lineitem")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.groupBy("l_orderkey")
        .agg(money_sum(revenue).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


# --------------------------------------------------------------------
# J2+P9 — left outer join preserving unmatched left rows + fill
# defaults. Reference: mongo_df.join(hbase_df,'user_id','left') +
# fillna({'session_count':0,...}), /root/reference/clv_integration.py:53-54.
# --------------------------------------------------------------------
@query(
    "j2_customer_order_stats",
    oracle="""
    SELECT c.c_custkey,
           c.c_mktsegment,
           COALESCE(o.order_count, 0) AS order_count,
           COALESCE(o.total_spent, 0.0) AS total_spent
    FROM customer c
    LEFT JOIN (
        SELECT o_custkey,
               COUNT(*) AS order_count,
               CAST(SUM(CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0 AS total_spent
        FROM orders GROUP BY o_custkey
    ) o ON c.c_custkey = o.o_custkey
    """,
)
def j2_customer_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate-then-left-join (pre-aggregation shrinks the probe side
    before the join — at 100 TB this is the difference between joining
    the raw fact table and joining one row per customer)."""
    from big_data_analytics_spark.operators.joins import sized_side

    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    per_cust = orders.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("order_count"),
        money_sum("o_totalprice").alias("total_spent"),
    )
    # customer-keyed aggregate GROWS with the data; post-agg stats
    # mis-broadcast it (round-12 implicit-broadcast audit) — pin on
    # the orders metadata count (strict upper bound, no FK assumption)
    return (
        customer.select("c_custkey", "c_mktsegment")
        .join(sized_side(per_cust, orders.count()),
              customer.c_custkey == per_cust.o_custkey, "left")
        .drop("o_custkey")
        .na.fill({"order_count": 0, "total_spent": 0.0})
    )


# --------------------------------------------------------------------
# Semi/anti joins — the "converted sessions only" filter family the
# reference expresses as predicates (/root/reference/dataset_generator.py:380).
# --------------------------------------------------------------------
@query(
    "j5_customers_with_urgent_orders",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderpriority = '1-URGENT')
    """,
)
def j5_customers_with_urgent_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join: one probe per customer, no row duplication, the
    orders side reduces to a distinct key set before shuffling."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    urgent = orders.filter(F.col("o_orderpriority") == "1-URGENT")
    return (
        customer.join(urgent, customer.c_custkey == urgent.o_custkey, "left_semi")
        .select("c_custkey", "c_name")
    )


@query(
    "j6_customers_without_orders",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def j6_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join (set difference by key)."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left_anti")
        .select("c_custkey", "c_name")
    )


# --------------------------------------------------------------------
# P3/P4/P6/P18 — compound predicates + derived column. Reference:
# (year>80)&(mpg>30) pandas filters, conditional expressions
# (/root/reference — SURVEY §2.2 P3-P6, P18).
# --------------------------------------------------------------------
@query(
    "p4_filter_compound",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag,
           l_extendedprice * (1 - l_discount) AS net_price
    FROM lineitem
    WHERE ((l_quantity > 45 AND l_discount >= 0.05)
           OR l_returnflag = 'R')
      AND NOT l_linestatus = 'O'
      AND l_shipdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
                         AND TIMESTAMP '1998-12-31 00:00:00'
    """,
)
def p4_filter_compound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conjunction/disjunction/negation predicates + BETWEEN + a derived
    column; all conditions push down to the Parquet scan."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (((F.col("l_quantity") > 45) & (F.col("l_discount") >= 0.05))
             | (F.col("l_returnflag") == "R"))
            & ~(F.col("l_linestatus") == "O")
            & F.col("l_shipdate").between("1996-01-01 00:00:00", "1998-12-31 00:00:00")
        )
        .select(
            "l_orderkey", "l_linenumber", "l_quantity", "l_returnflag",
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("net_price"),
        )
    )


# --------------------------------------------------------------------
# P10/P11/P12 — conditional expression / binning / recode. Reference:
# np.where(Sales>8,'Yes','No'), pd.cut bins (SURVEY §2.2 P10-P12).
# --------------------------------------------------------------------
@query(
    "p11_part_size_buckets",
    oracle="""
    SELECT CASE WHEN p_size < 10 THEN 'small'
                WHEN p_size < 25 THEN 'medium'
                ELSE 'large' END AS size_bucket,
           CASE WHEN p_type LIKE '%BRASS%' THEN 1 ELSE 0 END AS is_brass,
           COUNT(*) AS n_parts,
           CAST(SUM(CAST(FLOOR(p_retailprice * 100.0 + 0.5) AS BIGINT)) AS DOUBLE)
               / 100.0 / COUNT(p_retailprice) AS avg_price
    FROM part
    GROUP BY 1, 2
    """,
)
def p11_part_size_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """when/otherwise ladder (pd.cut analogue) + string-contains recode,
    grouped."""
    part = load_table(spark, sf_dir, "part")
    bucket = (
        F.when(F.col("p_size") < 10, "small")
        .when(F.col("p_size") < 25, "medium")
        .otherwise("large")
    )
    return (
        part.groupBy(
            bucket.alias("size_bucket"),
            F.when(F.col("p_type").contains("BRASS"), 1).otherwise(0).alias("is_brass"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            money_avg("p_retailprice").alias("avg_price"),
        )
    )


# --------------------------------------------------------------------
# A5/F10 — time-bucketed aggregation. Reference: monthly revenue via
# groupby(order_date.dt.to_period('M')), /root/reference/visualizations.py:86.
# --------------------------------------------------------------------
@query(
    "a5_monthly_revenue",
    oracle="""
    SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m-%d %H:%M:%S') AS month,
           CAST(SUM(CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0 AS total_revenue,
           COUNT(*) AS order_count
    FROM orders
    GROUP BY 1
    """,
)
def a5_monthly_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """date_trunc('month') grouping — the monthly-sales-trend rollup."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy(
            F.date_format(F.date_trunc("month", F.col("o_orderdate")),
                          "yyyy-MM-dd HH:mm:ss").alias("month"))
        .agg(
            money_sum("o_totalprice").alias("total_revenue"),
            F.count(F.lit(1)).alias("order_count"),
        )
    )


# --------------------------------------------------------------------
# A7 — frequency counts (value_counts). Reference:
# college['Elite'].value_counts() (SURVEY §2.4 A7).
# --------------------------------------------------------------------
@query(
    "a7_order_priority_counts",
    oracle="""
    SELECT o_orderpriority, o_orderstatus, COUNT(*) AS n
    FROM orders GROUP BY 1, 2
    """,
)
def a7_order_priority_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-column frequency table."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority", "o_orderstatus").agg(
        F.count(F.lit(1)).alias("n")
    )


# --------------------------------------------------------------------
# A9 — moments: mean / population & sample variance / stddev.
# Reference: np.mean/np.var/np.std with the ddof pitfall (SURVEY §2.4 A9).
# --------------------------------------------------------------------
@query(
    "a9_quantity_moments",
    oracle="""
    SELECT l_returnflag,
           ROUND(AVG(l_quantity), 6) AS mean_qty,
           ROUND(VAR_POP(l_quantity), 6) AS var_pop_qty,
           ROUND(VAR_SAMP(l_quantity), 6) AS var_samp_qty,
           ROUND(STDDEV_SAMP(l_quantity), 6) AS stddev_qty,
           MIN(l_quantity) AS min_qty,
           MAX(l_quantity) AS max_qty
    FROM lineitem GROUP BY 1
    """,
)
def a9_quantity_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit population vs sample variance (numpy defaults to ddof=0,
    Spark `variance` to ddof=1 — both exposed, rounded to absorb
    merge-order noise in the distributed moment computation)."""
    li = load_table(spark, sf_dir, "lineitem")
    q = F.col("l_quantity")
    return li.groupBy("l_returnflag").agg(
        F.round(F.avg(q), 6).alias("mean_qty"),
        F.round(F.var_pop(q), 6).alias("var_pop_qty"),
        F.round(F.var_samp(q), 6).alias("var_samp_qty"),
        F.round(F.stddev_samp(q), 6).alias("stddev_qty"),
        F.min(q).alias("min_qty"),
        F.max(q).alias("max_qty"),
    )


# --------------------------------------------------------------------
# A10/A11/M1 — correlation, covariance, closed-form OLS via regr_*.
# Reference: np.corrcoef / Smarket.corr() / sm.OLS (SURVEY §2.4 A10-A11,
# §2.9 M1).
# --------------------------------------------------------------------
@query(
    "a10_corr_regression",
    oracle="""
    SELECT l_returnflag,
           ROUND(CORR(l_quantity, l_extendedprice), 6) AS corr_qty_price,
           ROUND(COVAR_SAMP(l_quantity, l_extendedprice), 4) AS covar_qty_price,
           ROUND(REGR_SLOPE(l_extendedprice, l_quantity), 6) AS ols_slope,
           ROUND(REGR_INTERCEPT(l_extendedprice, l_quantity), 4) AS ols_intercept
    FROM lineitem GROUP BY 1
    """,
)
def a10_corr_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation, sample covariance, and single-feature OLS
    (slope/intercept) as pure aggregates — the distributed closed form of
    the reference's sm.OLS fit."""
    li = load_table(spark, sf_dir, "lineitem")
    x, y = F.col("l_quantity"), F.col("l_extendedprice")
    return li.groupBy("l_returnflag").agg(
        F.round(F.corr(x, y), 6).alias("corr_qty_price"),
        F.round(F.covar_samp(x, y), 4).alias("covar_qty_price"),
        F.round(F.regr_slope(y, x), 6).alias("ols_slope"),
        F.round(F.regr_intercept(y, x), 4).alias("ols_intercept"),
    )


# --------------------------------------------------------------------
# A12 — conditional-sum daily metrics (materialized-view shape).
# Reference: per-(product, day) views/cart_additions/purchases counters,
# /root/reference/load_hbase.py:127-134.
# --------------------------------------------------------------------
@query(
    "a12_event_daily_metrics",
    oracle="""
    SELECT strftime(date_trunc('day', ts), '%Y-%m-%d %H:%M:%S') AS day,
           COUNT(*) AS n_events,
           COUNT(DISTINCT user_id) AS n_users,
           CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS views,
           CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS clicks,
           CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchases,
           CAST(SUM(CASE WHEN event_type = 'purchase'
                    THEN CAST(FLOOR(value * 10000.0 + 0.5) AS BIGINT)
                    ELSE 0 END) AS DOUBLE) / 10000.0 AS purchase_value
    FROM events
    GROUP BY 1
    """,
)
def a12_event_daily_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-pass conditional aggregation replacing the reference's
    driver-side counter dicts: one scan, one shuffle, all three counters.
    This is the batch form of the ProductMetrics materialized view."""
    ev = load_table(spark, sf_dir, "events")
    def cnt(t):  # conditional counter
        return F.sum(F.when(F.col("event_type") == t, 1).otherwise(0))
    return (
        ev.groupBy(F.date_format(F.date_trunc("day", F.col("ts")),
                                 "yyyy-MM-dd HH:mm:ss").alias("day"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            cnt("view").alias("views"),
            cnt("click").alias("clicks"),
            cnt("purchase").alias("purchases"),
            (F.sum(
                F.when(F.col("event_type") == "purchase",
                       F.floor(F.col("value") * 10000.0 + 0.5))
                .otherwise(F.lit(0).cast("long"))
            ).cast("double") / 10000.0).alias("purchase_value"),
        )
    )


# --------------------------------------------------------------------
# U1/U2 — union + distinct. Reference: list extend / set() dedup
# (SURVEY §2.7).
# --------------------------------------------------------------------
@query(
    "u1_union_distinct",
    oracle="""
    SELECT side, COUNT(*) AS n, COUNT(DISTINCT nationkey) AS n_distinct
    FROM (
        SELECT 'cust' AS side, c_nationkey AS nationkey FROM customer
        UNION ALL
        SELECT 'supp' AS side, s_nationkey AS nationkey FROM supplier
    ) u
    GROUP BY side
    """,
)
def u1_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL by name + distinct count per branch."""
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    u = (
        customer.select(F.lit("cust").alias("side"), F.col("c_nationkey").alias("nationkey"))
        .unionByName(
            supplier.select(F.lit("supp").alias("side"), F.col("s_nationkey").alias("nationkey"))
        )
    )
    return u.groupBy("side").agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("nationkey").alias("n_distinct"),
    )


# --------------------------------------------------------------------
# P16/O3 — deterministic positional slice: global sort + limit.
# Reference: Auto[:3] / show(5) (SURVEY §2.2 P16, §2.6 O3-O4).
# --------------------------------------------------------------------
@query(
    "p16_ordered_limit",
    oracle="""
    SELECT s_suppkey, s_name, s_acctbal
    FROM supplier
    ORDER BY s_acctbal DESC, s_suppkey
    LIMIT 5
    """,
)
def p16_ordered_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 suppliers by balance with a key tie-break (positional access
    re-expressed as a deterministic ordered limit)."""
    supplier = load_table(spark, sf_dir, "supplier")
    return (
        supplier.select("s_suppkey", "s_name", "s_acctbal")
        .orderBy(F.desc("s_acctbal"), F.asc("s_suppkey"))
        .limit(5)
    )
