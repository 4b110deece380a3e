"""The reference's pipeline suite, re-expressed as single-engine
DataFrame DAGs.

The reference spreads these across Spark SQL, MongoDB aggregation,
HBase scans, and driver-side Python (SURVEY.md §3); every pipeline here
is one Catalyst plan — no client/server round-trips, no N+1 lookups,
no driver-side loops.

All take DataFrames in and return a DataFrame (storage-agnostic);
callers bind them to Parquet tables or the datagen fixtures.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from big_data_analytics_spark.functions.money import money_round, money_sum
from big_data_analytics_spark.operators.joins import sized_side


def revenue_by_state(users: DataFrame, transactions: DataFrame,
                     n: int = 10) -> DataFrame:
    """Top-n states by transaction revenue.

    Reference: /root/reference/spark_processing.py:45-52 —
    ``SELECT u.geo_data.state, SUM(t.total) ... JOIN ... GROUP BY ...
    ORDER BY total_revenue DESC LIMIT 10``. users (dim) broadcasts;
    the aggregate is partial+final so only 50 state rows shuffle.
    Money totals use the integer-cents convention (functions/money.py)
    — exact and order-independent, unlike a parallel double SUM.
    """
    return (
        transactions.join(
            sized_side(users.select("user_id", "geo_data"), users.count()),
            "user_id")
        .groupBy(F.col("geo_data.state").alias("state"))
        .agg(money_sum("total").alias("total_revenue"))
        .orderBy(F.desc("total_revenue"), F.asc("state"))
        .limit(n)
    )


def top_products(transactions: DataFrame, products: DataFrame,
                 n: int = 5) -> DataFrame:
    """Top-n products by item revenue, enriched with the product name.

    Reference: /root/reference/mongodb_pipeline.py:8-25 — $unwind →
    $group-sum → $sort → $limit, then an N+1 ``find_one`` per result
    row. Here: explode → hash agg → TakeOrderedAndProject → broadcast
    join (the N+1 becomes one broadcast lookup, SURVEY §3.2).
    """
    return (
        transactions.select(F.explode("items").alias("i"))
        .groupBy(F.col("i.product_id").alias("product_id"))
        .agg(money_sum("i.subtotal").alias("total_revenue"))
        .orderBy(F.desc("total_revenue"), F.asc("product_id"))
        .limit(n)
        .join(sized_side(products.select("product_id", "name"),
                         products.count()), "product_id", "left")
        .select("product_id", "name", "total_revenue")
        .orderBy(F.desc("total_revenue"), F.asc("product_id"))
    )


def user_spend(transactions: DataFrame) -> DataFrame:
    """Per-user total spend.

    Reference: /root/reference/clv_integration.py:12-16 (Mongo $group
    per user, then a cursor→driver→createDataFrame round-trip).
    """
    return transactions.groupBy("user_id").agg(
        money_sum("total").alias("total_spent")
    )


def user_session_metrics(sessions: DataFrame) -> DataFrame:
    """Per-user session count + total duration.

    Reference: /root/reference/clv_integration.py:36-42 — an RDD
    ``groupBy`` that materializes whole groups per user; restated as a
    spillable partial+final hash aggregate (SURVEY §4 anti-pattern).
    """
    return sessions.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("int").alias("session_count"),
        F.sum("duration_seconds").cast("int").alias("total_duration"),
    )


def clv(users: DataFrame, transactions: DataFrame,
        sessions: DataFrame) -> DataFrame:
    """Customer-lifetime-value scoring table.

    Reference: /root/reference/clv_integration.py:53-56 —
    ``mongo_df.join(hbase_df, 'user_id', 'left')`` + fillna(0) +
    engagement_score = session_count*total_duration/1000, clv =
    total_spent*engagement_score. The committed reference artifact
    (part-00000-…-c000.csv) is the *degenerate* all-zero-right-side
    run (SURVEY §5); this implements the intended semantics with
    sessions.duration_seconds, while ``users`` (all 10k/100 rows) stays
    the left side so every user appears exactly once.
    """
    spend = user_spend(transactions)
    metrics = user_session_metrics(sessions)
    # USER-sized aggregates (grow with the corpus): pin on the fact
    # tables' metadata counts — an upper bound on distinct users with
    # no FK assumption — instead of derived-relation stats, which
    # mis-broadcast them at the round-12 10× audit. Broadcast below
    # the ceiling (today's plan), co-partitioned merge past it.
    n_tx, n_ss = transactions.count(), sessions.count()
    return (
        users.select("user_id")
        .join(sized_side(spend, n_tx), "user_id", "left")
        .join(sized_side(metrics, n_ss), "user_id", "left")
        .na.fill({"total_spent": 0.0, "session_count": 0, "total_duration": 0})
        .withColumn(
            "engagement_score",
            F.col("session_count") * F.col("total_duration") / 1000.0,
        )
        .withColumn("clv", money_round(F.col("total_spent")
                                       * F.col("engagement_score")))
    )


def product_daily_metrics(sessions: DataFrame) -> DataFrame:
    """Per-(product, day) views / cart_additions / purchases counters.

    Reference: /root/reference/load_hbase.py:127-134,146-152 — driver-
    side dict accumulation flushed to HBase counter columns keyed
    ``product_id#yyyymmdd``. Restated as three conditional exploded
    aggregates unioned then re-aggregated: one shuffle on
    (product_id, date), no accumulator state, idempotent (the HBase
    version double-counts on re-run).
    """
    day = F.to_date(F.to_timestamp("start_time")).alias("date")

    views = (
        sessions.select(day, F.explode("viewed_products").alias("product_id"))
        .select("product_id", "date", F.lit(1).alias("views"),
                F.lit(0).alias("cart_additions"), F.lit(0).alias("purchases"))
    )
    cart = (
        sessions.select(day, F.col("conversion_status"),
                        F.explode("cart_contents").alias("product_id", "entry"))
        .select(
            "product_id", "date", F.lit(0).alias("views"),
            F.col("entry.quantity").alias("cart_additions"),
            F.when(F.col("conversion_status") == "converted",
                   F.col("entry.quantity")).otherwise(0).alias("purchases"),
        )
    )
    return (
        views.unionByName(cart)
        .groupBy("product_id", "date")
        .agg(
            F.sum("views").alias("views"),
            F.sum("cart_additions").alias("cart_additions"),
            F.sum("purchases").alias("purchases"),
        )
    )


def monthly_sales(transactions: DataFrame,
                  ts_col: str = "timestamp",
                  amount_col: str = "total") -> DataFrame:
    """Monthly revenue rollup.

    Reference: /root/reference/visualizations.py:85-87 — pandas
    ``groupby(order_date.dt.to_period('M'))['total'].sum()``.
    """
    return (
        transactions
        .groupBy(F.date_trunc("month", F.to_timestamp(ts_col)).alias("month"))
        .agg(money_sum(amount_col).alias("total"))
        .orderBy("month")
    )


def products_enriched(products: DataFrame, categories: DataFrame) -> DataFrame:
    """Products with an embedded ``category`` struct.

    Reference: /root/reference/load_mongo.py:76-94 — a Python loop
    denormalizing the category (with an 'Unknown Category' fallback on
    FK miss) into every product document. Restated as a broadcast left
    join + struct rebuild; kept as a *view* rather than a rewrite
    (broadcast joins make the denormalization unnecessary at read
    time, SURVEY §4).
    """
    cats = categories.select(
        F.col("category_id").alias("c_category_id"),
        F.col("name").alias("c_name"),
        F.col("subcategories").alias("c_subcategories"),
    )
    return (
        products.join(F.broadcast(cats),
                      products.category_id == cats.c_category_id, "left")
        .withColumn(
            "category",
            F.struct(
                F.col("category_id").alias("category_id"),
                F.coalesce(F.col("c_name"), F.lit("Unknown Category")).alias("name"),
                # deterministic representative subcategory (the
                # reference's get_subcategory safe lookup, load_mongo.py:34-45)
                F.element_at(F.col("c_subcategories"), 1).getField("subcategory_id")
                .alias("subcategory_id"),
                F.element_at(F.col("c_subcategories"), 1).getField("name")
                .alias("subcategory_name"),
            ),
        )
        .drop("c_category_id", "c_name", "c_subcategories")
    )


def inventory_levels(transactions: DataFrame,
                     initial_stock: DataFrame) -> DataFrame:
    """Stock level after each purchase, floored at zero (A17).

    Reference: the thread-locked sequential fold
    ``current_stock = max(0, current_stock - quantity)``
    (/root/reference/dataset_generator.py:83-107). The sequential clamp
    is order-dependent state, but it has a closed form over ordered
    prefixes (Lindley's recursion):

        stock_t = max(0, s0 - C_t + max(0, max_{i<=t}(C_i - s0)))

    where C_t is the running quantity sum in (timestamp,
    transaction_id, product_id) order — the ordering key IS part of the
    semantics (SURVEY.md §7). Two window functions per product replace
    the lock: a cumulative sum and a running max, both over the same
    per-product window.

    ``initial_stock``: (product_id, current_stock) — the dimension's
    starting level. Output: one row per purchase event with the stock
    level after it, plus ``units_lost`` (demand absorbed by the floor).
    """
    events = (
        transactions.select(
            "transaction_id", "timestamp", F.explode("items").alias("i"))
        .select(
            F.col("i.product_id").alias("product_id"),
            "timestamp", "transaction_id",
            F.col("i.quantity").alias("quantity"),
        )
    )
    w = (
        Window.partitionBy("product_id")
        .orderBy("timestamp", "transaction_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    with_stock = (
        events.join(sized_side(
            initial_stock.select("product_id",
                                 F.col("current_stock").alias("s0")),
            initial_stock.count()), "product_id")
        .withColumn("cum_qty", F.sum("quantity").over(w))
        .withColumn("overdraft",
                    F.greatest(F.lit(0), F.max(F.col("cum_qty") - F.col("s0")).over(w)))
        .withColumn("stock_after",
                    F.greatest(F.lit(0),
                               F.col("s0") - F.col("cum_qty") + F.col("overdraft")))
    )
    return with_stock.select(
        "product_id", "timestamp", "transaction_id", "quantity",
        "stock_after",
        (F.col("overdraft")).alias("units_lost"),
    )
