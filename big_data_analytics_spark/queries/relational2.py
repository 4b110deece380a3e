"""Second wave of relational coverage: multi-way joins, HAVING,
grouping sets (rollup/cube), pivot, percentiles, null handling, type
coercion, array/map functions (SURVEY.md §2.2 P8/P13, §2.4 A8/A13-A15,
§2.7, §2.8 F18-F19 — plus the "free built-ins" SURVEY notes as the
extension surface).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from big_data_analytics_spark.catalog import load_table
from big_data_analytics_spark.functions.money import money_sum
from big_data_analytics_spark.queries import query

_MSUM = "CAST(SUM(CAST(FLOOR(({expr}) * 100.0 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0"


# --------------------------------------------------------------------
# J1×4 — TPC-H Q5-shaped: 5-way join, regional revenue.
# --------------------------------------------------------------------
@query(
    "j7_regional_supplier_volume",
    oracle=f"""
    SELECT r.r_name AS region,
           {_MSUM.format(expr='l.l_extendedprice * (1 - l.l_discount)')} AS revenue,
           COUNT(*) AS n_lineitems
    FROM lineitem l
    JOIN orders o    ON l.l_orderkey = o.o_orderkey
    JOIN customer c  ON o.o_custkey = c.c_custkey
    JOIN nation n    ON c.c_nationkey = n.n_nationkey
    JOIN region r    ON n.n_regionkey = r.r_regionkey
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
    GROUP BY r.r_name
    """,
)
def j7_regional_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Five-table join pyramid (fact → orders → customer → nation →
    region). Catalyst broadcast-chains the three dims; only the
    lineitem⋈orders join shuffles — the shape that matters at 100 TB."""
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("r_name").alias("region"))
        .agg(
            money_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
    )


# --------------------------------------------------------------------
# A-single-row — TPC-H Q6-shaped scan-aggregate.
# --------------------------------------------------------------------
@query(
    "a6_forecast_revenue",
    oracle=f"""
    SELECT {_MSUM.format(expr='l_extendedprice * l_discount')} AS revenue,
           COUNT(*) AS n
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 24
    """,
)
def a6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure scan-aggregate with tight range predicates — the query
    where predicate pushdown + column pruning is the whole plan."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
            & F.col("l_discount").between(0.03, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            money_sum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue"),
            F.count(F.lit(1)).alias("n"),
        )
    )


# --------------------------------------------------------------------
# HAVING — aggregate filter (TPC-H Q18-shaped).
# --------------------------------------------------------------------
@query(
    "a18_large_orders_having",
    oracle="""
    SELECT l_orderkey,
           CAST(SUM(CAST(FLOOR(l_quantity * 100.0 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0 AS total_qty
    FROM lineitem
    GROUP BY l_orderkey
    HAVING SUM(l_quantity) > 220
    """,
)
def a18_large_orders_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY + HAVING (post-aggregation predicate)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_orderkey")
        .agg(money_sum("l_quantity").alias("total_qty"),
             F.sum("l_quantity").alias("__raw"))
        .filter(F.col("__raw") > 220)
        .drop("__raw")
    )


# --------------------------------------------------------------------
# G1 — ROLLUP with grouping indicator (SURVEY §2.4 "grouping sets…
# available built-in").
# --------------------------------------------------------------------
@query(
    "g1_rollup_revenue",
    oracle="""
    SELECT COALESCE(o_orderstatus, '<all>') AS status,
           COALESCE(o_orderpriority, '<all>') AS priority,
           CAST(GROUPING(o_orderstatus) + 2 * GROUPING(o_orderpriority) AS BIGINT) AS grp,
           CAST(SUM(CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0 AS revenue,
           COUNT(*) AS n
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
)
def g1_rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical subtotals: (status, priority) → (status) → ()."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            (F.grouping("o_orderstatus")
             + 2 * F.grouping("o_orderpriority")).cast("long").alias("grp"),
            money_sum("o_totalprice").alias("revenue"),
            F.count(F.lit(1)).alias("n"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("<all>")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("<all>")).alias("priority"),
            "grp", "revenue", "n",
        )
    )


# --------------------------------------------------------------------
# G2 — CUBE.
# --------------------------------------------------------------------
@query(
    "g2_cube_counts",
    oracle="""
    SELECT COALESCE(l_returnflag, '<all>') AS returnflag,
           COALESCE(l_linestatus, '<all>') AS linestatus,
           COUNT(*) AS n
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def g2_cube_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All 2^2 grouping combinations in one pass."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.coalesce("l_returnflag", F.lit("<all>")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("<all>")).alias("linestatus"),
            "n",
        )
    )


# --------------------------------------------------------------------
# PV1 — pivot (wide conditional aggregation). Reference shape: the
# daily counter columns of A12.
# --------------------------------------------------------------------
@query(
    "pv1_status_pivot",
    oracle="""
    SELECT o_orderpriority,
           CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS F,
           CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS O,
           CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS P
    FROM orders GROUP BY o_orderpriority
    """,
)
def pv1_status_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """groupBy().pivot() with an explicit value list (never let pivot
    scan for distinct values at scale — pass the list)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
        .na.fill(0)
    )


# --------------------------------------------------------------------
# A8 — exact percentiles (describe/summary family; Spark summary() is
# approximate, this pins the exact variant — SURVEY §7).
# --------------------------------------------------------------------
@query(
    "a8_percentiles",
    oracle="""
    SELECT l_returnflag,
           ROUND(quantile_cont(l_extendedprice, 0.25), 4) AS p25,
           ROUND(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
           ROUND(quantile_cont(l_extendedprice, 0.75), 4) AS p75,
           MIN(l_extendedprice) AS min_price,
           MAX(l_extendedprice) AS max_price
    FROM lineitem GROUP BY l_returnflag
    """,
)
def a8_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated quartiles (percentile ↔ quantile_cont share
    the linear-interpolation definition)."""
    li = load_table(spark, sf_dir, "lineitem")
    p = F.col("l_extendedprice")
    return li.groupBy("l_returnflag").agg(
        F.round(F.percentile(p, F.lit(0.25)), 4).alias("p25"),
        F.round(F.percentile(p, F.lit(0.5)), 4).alias("p50"),
        F.round(F.percentile(p, F.lit(0.75)), 4).alias("p75"),
        F.min(p).alias("min_price"),
        F.max(p).alias("max_price"),
    )


# --------------------------------------------------------------------
# P8/P13 — null handling + cast-invalid-to-null (SURVEY §2.2).
# --------------------------------------------------------------------
@query(
    "p8_null_handling",
    oracle="""
    SELECT o_orderpriority,
           COUNT(*) AS n_rows,
           COUNT(nullable_price) AS n_nonnull,
           CAST(SUM(CASE WHEN nullable_price IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
           CAST(SUM(CAST(FLOOR(COALESCE(nullable_price, 0.0) * 100.0 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0 AS filled_sum
    FROM (
        SELECT o_orderpriority,
               CASE WHEN o_orderstatus = 'P' THEN NULL ELSE o_totalprice END AS nullable_price
        FROM orders
    )
    GROUP BY o_orderpriority
    """,
)
def p8_null_handling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL introduction (nullif-style), null-aware counts, and
    fill-then-aggregate (na.fill ≍ COALESCE)."""
    o = load_table(spark, sf_dir, "orders")
    nullable = F.when(F.col("o_orderstatus") == "P", F.lit(None).cast("double")) \
        .otherwise(F.col("o_totalprice"))
    return (
        o.select("o_orderpriority", nullable.alias("nullable_price"))
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count("nullable_price").alias("n_nonnull"),
            F.sum(F.col("nullable_price").isNull().cast("long")).alias("n_null"),
            money_sum(F.coalesce("nullable_price", F.lit(0.0))).alias("filled_sum"),
        )
    )


@query(
    "p13_cast_coercion",
    oracle="""
    SELECT event_type,
           COUNT(TRY_CAST(json_extract_string(props, '$.k') AS INTEGER)) AS n_numeric,
           CAST(SUM(CASE WHEN TRY_CAST(json_extract_string(props, '$.missing') AS INTEGER)
                    IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_invalid,
           CAST(CAST(COUNT(*) AS DOUBLE) AS DOUBLE) AS n_as_double
    FROM events GROUP BY event_type
    """,
)
def p13_cast_coercion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pd.to_numeric(errors='coerce') semantics: invalid → NULL via
    try-cast, then null-aware counting."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").try_cast("int")
    missing = F.get_json_object("props", "$.missing").try_cast("int")
    return ev.groupBy("event_type").agg(
        F.count(k).alias("n_numeric"),
        F.sum(missing.isNull().cast("long")).alias("n_invalid"),
        F.count(F.lit(1)).cast("double").alias("n_as_double"),
    )


# --------------------------------------------------------------------
# F18/A13/A14/A15 — array construction + folds over arrays.
# --------------------------------------------------------------------
@query(
    "f18_array_ops",
    oracle="""
    WITH per_order AS (
        SELECT l_orderkey,
               list_sort(list(l_linenumber)) AS linenums,
               list_sort(list(DISTINCT l_returnflag)) AS flags
        FROM lineitem
        WHERE l_orderkey % 50 = 0
        GROUP BY l_orderkey
    )
    SELECT l_orderkey,
           CAST(len(linenums) AS BIGINT) AS n_lines,
           linenums[1] AS first_line,
           linenums[-1] AS last_line,
           CAST(list_sum(linenums) AS BIGINT) AS line_sum,
           list_contains(flags, 'R') AS has_return,
           CAST(len(flags) AS BIGINT) AS n_flags,
           array_to_string(flags, ',') AS flags_csv
    FROM per_order
    """,
)
def f18_array_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """collect_list → sort → element_at/size/fold/contains/join — the
    reference's Python-list idioms as array expressions (collect_set ≍
    the set() construction at dataset_generator.py:269)."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 50 == 0)
    per = li.groupBy("l_orderkey").agg(
        F.array_sort(F.collect_list("l_linenumber")).alias("linenums"),
        F.array_sort(F.collect_set("l_returnflag")).alias("flags"),
    )
    return per.select(
        "l_orderkey",
        F.size("linenums").cast("long").alias("n_lines"),
        F.element_at("linenums", 1).alias("first_line"),
        F.element_at("linenums", -1).alias("last_line"),
        F.aggregate("linenums", F.lit(0).cast("long"),
                    lambda acc, x: acc + x).alias("line_sum"),
        F.array_contains("flags", "R").alias("has_return"),
        F.size("flags").cast("long").alias("n_flags"),
        F.array_join("flags", ",").alias("flags_csv"),
    )


@query(
    "a15_exists_over_array",
    oracle="""
    WITH per_order AS (
        SELECT l_orderkey, list(l_quantity) AS qtys
        FROM lineitem GROUP BY l_orderkey
    )
    SELECT
        CAST(SUM(CASE WHEN len(list_filter(qtys, q -> q > 49)) > 0
                 THEN 1 ELSE 0 END) AS BIGINT) AS orders_with_qty50,
        CAST(SUM(CASE WHEN len(list_filter(qtys, q -> q > 49)) = len(qtys)
                 THEN 1 ELSE 0 END) AS BIGINT) AS orders_all_qty50,
        COUNT(*) AS n_orders
    FROM per_order
    """,
)
def a15_exists_over_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS / FORALL over collected arrays (the reference's
    any(...)/all(...) generator predicates, dataset_generator.py:298)."""
    li = load_table(spark, sf_dir, "lineitem")
    per = li.groupBy("l_orderkey").agg(F.collect_list("l_quantity").alias("qtys"))
    return per.agg(
        F.sum(F.exists("qtys", lambda q: q > 49).cast("long"))
        .alias("orders_with_qty50"),
        F.sum(F.forall("qtys", lambda q: q > 49).cast("long"))
        .alias("orders_all_qty50"),
        F.count(F.lit(1)).alias("n_orders"),
    )


# --------------------------------------------------------------------
# F19 — map functions (build → filter → fold). The reference's
# cart_contents idioms (dataset_generator.py:282-318).
# --------------------------------------------------------------------
@query(
    "f19_map_ops",
    oracle="""
    WITH per_line AS (
        -- the fixture's (orderkey, linenumber) is not unique; pre-sum
        -- so map keys are unique by construction
        SELECT l_orderkey, l_linenumber, SUM(l_quantity) AS qty
        FROM lineitem WHERE l_orderkey % 100 = 0
        GROUP BY l_orderkey, l_linenumber
    ), per_order AS (
        SELECT l_orderkey,
               map(list(CAST(l_linenumber AS VARCHAR) ORDER BY l_linenumber),
                   list(qty ORDER BY l_linenumber)) AS qty_map
        FROM per_line
        GROUP BY l_orderkey
    )
    SELECT l_orderkey,
           CAST(cardinality(qty_map) AS BIGINT) AS n_entries,
           array_to_string(list_sort(map_keys(qty_map)), ',') AS keys_csv,
           CAST(FLOOR(list_sum(map_values(qty_map)) * 100.0 + 0.5) AS BIGINT) / 100.0 AS qty_total
    FROM per_order
    """,
)
def f19_map_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """map_from_entries / map_keys / map_values / cardinality — the
    MapType surface; values folded to a portable 2-dp total."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 100 == 0)
    per_line = li.groupBy("l_orderkey", "l_linenumber").agg(
        F.sum("l_quantity").alias("qty"))
    per = per_line.groupBy("l_orderkey").agg(
        F.map_from_entries(
            F.array_sort(F.collect_list(F.struct(
                F.col("l_linenumber").cast("string").alias("k"),
                F.col("qty").alias("v"),
            )))
        ).alias("qty_map")
    )
    return per.select(
        "l_orderkey",
        F.size("qty_map").cast("long").alias("n_entries"),
        F.array_join(F.array_sort(F.map_keys("qty_map")), ",").alias("keys_csv"),
        (F.floor(F.aggregate(F.map_values("qty_map"), F.lit(0.0),
                             lambda acc, x: acc + x) * 100.0 + 0.5)
         / 100.0).alias("qty_total"),
    )


# --------------------------------------------------------------------
# P5/P6/P17 — membership, regex-match, label-based selection.
# --------------------------------------------------------------------
@query(
    "p6_membership_and_regex",
    oracle="""
    SELECT c_custkey, c_name, c_mktsegment
    FROM customer
    WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')
      AND regexp_matches(c_name, '[05]$')
      AND NOT c_mktsegment IN ('AUTOMOBILE')
    """,
)
def p6_membership_and_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """isin + rlike + negated membership (the pandas
    str.contains / .loc label-select family, SURVEY §2.2 P5-P6, P17)."""
    c = load_table(spark, sf_dir, "customer")
    return (
        c.filter(
            F.col("c_mktsegment").isin("BUILDING", "MACHINERY")
            & F.col("c_name").rlike("[05]$")
            & ~F.col("c_mktsegment").isin("AUTOMOBILE")
        )
        .select("c_custkey", "c_name", "c_mktsegment")
    )


# --------------------------------------------------------------------
# U3/U4 — INTERSECT / EXCEPT (SURVEY §2.7: absent in the reference,
# free built-ins on the extension surface).
# --------------------------------------------------------------------
@query(
    "u3_intersect_except",
    oracle="""
    WITH cust_nations AS (SELECT DISTINCT c_nationkey AS nk FROM customer),
         supp_nations AS (SELECT DISTINCT s_nationkey AS nk FROM supplier)
    SELECT 'both' AS which, nk FROM (
        SELECT nk FROM cust_nations INTERSECT SELECT nk FROM supp_nations)
    UNION ALL
    SELECT 'cust_only' AS which, nk FROM (
        SELECT nk FROM cust_nations EXCEPT SELECT nk FROM supp_nations)
    """,
)
def u3_intersect_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set intersection and difference on key sets."""
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nk")).distinct()
    supp = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nk")).distinct()
    both = cust.intersect(supp).select(F.lit("both").alias("which"), "nk")
    only = cust.exceptAll(supp).select(F.lit("cust_only").alias("which"), "nk")
    return both.unionByName(only)


# --------------------------------------------------------------------
# U3b — INTERSECT ALL: multiset intersection (each common value kept
# min(count_left, count_right) times), then re-aggregated so the
# result stays small and order-free.
# --------------------------------------------------------------------
@query(
    "u3b_intersect_all",
    oracle="""
    SELECT l_suppkey, COUNT(*) AS n
    FROM (SELECT l_suppkey FROM lineitem WHERE l_returnflag = 'A'
          INTERSECT ALL
          SELECT l_suppkey FROM lineitem WHERE l_returnflag = 'R')
    GROUP BY l_suppkey
    """,
)
def u3b_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset intersection of the supplier-key bags of returned ('R')
    vs accepted ('A') lineitems: per key, multiplicity is
    min(count_A, count_R). ``intersectAll`` compiles to a partial-count
    aggregate + generate — one shuffle on the key, no row explosion
    beyond the min-count, so it scales like a groupBy."""
    li = load_table(spark, sf_dir, "lineitem")
    a = li.filter(F.col("l_returnflag") == "A").select("l_suppkey")
    r = li.filter(F.col("l_returnflag") == "R").select("l_suppkey")
    return (
        a.intersectAll(r)
        .groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).alias("n"))
    )


# --------------------------------------------------------------------
# F11 — sequence generation (date ranges; pd.date_range analogue,
# visualizations.py:78).
# --------------------------------------------------------------------
@query(
    "f11_date_sequence",
    oracle="""
    SELECT o_orderkey,
           CAST(len(generate_series(date_trunc('month', o_orderdate),
                               date_trunc('month', o_orderdate) + INTERVAL 11 MONTH,
                               INTERVAL 1 MONTH)) AS BIGINT) AS n_months,
           strftime(date_trunc('month', o_orderdate) + INTERVAL 11 MONTH,
                    '%Y-%m-%d %H:%M:%S') AS horizon_end
    FROM orders
    WHERE o_orderkey % 500 = 0
    """,
)
def f11_date_sequence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sequence(start, stop, interval 1 month) — forecast-horizon
    generation per row."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 500 == 0)
    start = F.date_trunc("month", F.col("o_orderdate"))
    end = start + F.expr("INTERVAL 11 MONTHS")
    return o.select(
        "o_orderkey",
        F.size(F.sequence(start, end, F.expr("INTERVAL 1 MONTH")))
        .cast("long").alias("n_months"),
        F.date_format(end, "yyyy-MM-dd HH:mm:ss").alias("horizon_end"),
    )


# --------------------------------------------------------------------
# P19/P20/F16/F17 — sampling, bootstrap resample, random columns, ids.
# Engine RNGs are not cross-engine comparable, so these are rows-only
# checks for the driver; determinism-under-seed is tested in
# tests/test_sampling.py.
# --------------------------------------------------------------------
@query("p19_sample_and_split")
def p19_sample_and_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded Bernoulli sample + randomSplit accounting: fraction
    sampled, per-split counts (sum == total), and a bootstrap
    (with-replacement) resample size — the P19/P20 surface."""
    o = load_table(spark, sf_dir, "orders")
    total = o.count()
    sampled = o.sample(fraction=0.1, seed=42).count()
    boot = o.sample(withReplacement=True, fraction=1.0, seed=7).count()
    train, test = o.randomSplit([0.8, 0.2], seed=42)
    n_train, n_test = train.count(), test.count()
    return spark.createDataFrame(
        [(total, sampled, boot, n_train, n_test, n_train + n_test)],
        "total long, sampled long, bootstrap long, train long, test long, split_sum long",
    )


@query("f17_id_generation")
def f17_id_generation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F17 — id generation tiers: deterministic hash ids (test-stable,
    the engine's default), uuid() and monotonically_increasing_id()
    (run-unique). Returns uniqueness accounting over customers."""
    c = load_table(spark, sf_dir, "customer")
    with_ids = c.select(
        "c_custkey",
        F.sha2(F.concat_ws("|", F.lit("cust"), F.col("c_custkey")), 256).alias("hash_id"),
        F.expr("uuid()").alias("uuid_id"),
        F.monotonically_increasing_id().alias("mono_id"),
    )
    return with_ids.agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("hash_id").alias("n_hash_ids"),
        F.countDistinct("uuid_id").alias("n_uuid_ids"),
        F.countDistinct("mono_id").alias("n_mono_ids"),
    )


@query(
    "f17b_hash_id_generation",
    oracle="""
    WITH ids AS (
        SELECT c_custkey,
               sha256('cust|' || CAST(c_custkey AS VARCHAR)) AS hash_id
        FROM customer
    ), s AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(COUNT(DISTINCT hash_id) AS BIGINT) AS n_distinct
        FROM ids
    )
    SELECT c_custkey, hash_id, n, n_distinct
    FROM ids, s ORDER BY c_custkey LIMIT 50
    """,
)
def f17b_hash_id_generation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F17's graded twin: the engine-default DETERMINISTIC id tier
    (sha256 over a salted key — the id scheme the seeded datagen
    uses, datagen/ecommerce.py _hex_id) certified value-exactly
    against DuckDB's sha256: the 50 lowest-key customers' actual id
    strings plus corpus-wide uniqueness counts. f17 keeps grading
    the run-unique tiers (uuid, monotonically_increasing_id) whose
    values are inherently oracle-free."""
    c = load_table(spark, sf_dir, "customer")
    ids = c.select(
        "c_custkey",
        F.sha2(F.concat_ws("|", F.lit("cust"),
                           F.col("c_custkey")), 256).alias("hash_id"))
    s = ids.agg(F.count(F.lit(1)).cast("long").alias("n"),
                F.countDistinct("hash_id").cast("long")
                .alias("n_distinct"))
    return (ids.crossJoin(F.broadcast(s))
            .orderBy("c_custkey").limit(50)
            .select("c_custkey", "hash_id", "n", "n_distinct"))


# --------------------------------------------------------------------
# J5 — key-decomposition join: composite row keys split back to join
# keys (the reference's HBase row-key parse, load_hbase.py:116-117 +
# clv_integration.py:27).
# --------------------------------------------------------------------
@query(
    "j5b_rowkey_decompose_join",
    oracle="""
    WITH keyed AS (
        SELECT concat(CAST(o_custkey AS VARCHAR), '#',
                      strftime(o_orderdate, '%Y%m%d'), '#',
                      CAST(o_orderkey AS VARCHAR)) AS row_key,
               o_totalprice
        FROM orders
    ), decomposed AS (
        SELECT CAST(split_part(row_key, '#', 1) AS BIGINT) AS custkey,
               split_part(row_key, '#', 2) AS day_key,
               o_totalprice
        FROM keyed
    )
    SELECT c.c_mktsegment,
           COUNT(*) AS n,
           CAST(SUM(CAST(FLOOR(d.o_totalprice * 100.0 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0 AS revenue
    FROM decomposed d JOIN customer c ON d.custkey = c.c_custkey
    GROUP BY c.c_mktsegment
    """,
)
def j5b_rowkey_decompose_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build HBase-style composite row keys (custkey#yyyymmdd#orderkey),
    split the key back out, and join on the decomposed component — the
    pattern the reference runs in driver-side Python. In the native
    design the key never leaves relational form; this query proves the
    round-trip is lossless."""
    o = load_table(spark, sf_dir, "orders")
    keyed = o.select(
        F.concat_ws("#", F.col("o_custkey").cast("string"),
                    F.date_format("o_orderdate", "yyyyMMdd"),
                    F.col("o_orderkey").cast("string")).alias("row_key"),
        "o_totalprice",
    )
    decomposed = keyed.select(
        F.split("row_key", "#").getItem(0).cast("long").alias("custkey"),
        F.split("row_key", "#").getItem(1).alias("day_key"),
        "o_totalprice",
    )
    c = load_table(spark, sf_dir, "customer")
    return (
        decomposed.join(c, decomposed.custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n"),
             money_sum("o_totalprice").alias("revenue"))
    )


# --------------------------------------------------------------------
# A19 — median / mode as first-class aggregates (SURVEY §2.4 notes
# them absent in the reference, built-in here).
# --------------------------------------------------------------------
@query(
    "a19_median_mode",
    oracle="""
    SELECT l_returnflag,
           ROUND(median(l_quantity), 6) AS median_qty,
           CAST(mode(l_linenumber) AS BIGINT) AS mode_linenumber,
           COUNT(*) AS n
    FROM lineitem GROUP BY l_returnflag
    """,
)
def a19_median_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact median (interpolated) and modal value per group. Mode
    tie-breaking differs across engines in general; l_linenumber's
    frequency ordering is strict in this data (and the test pins it)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.median("l_quantity"), 6).alias("median_qty"),
        F.mode("l_linenumber").cast("long").alias("mode_linenumber"),
        F.count(F.lit(1)).alias("n"),
    )
