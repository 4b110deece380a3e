"""Market-basket analytics: association rules over order baskets
(mb1) and item-item collaborative filtering (cf1).

Both queries materialize CO-OCCURRENCE PAIRS, the shape shared by
recommender pre-computation and the dedup/LSH surface: a self-join on
the basket key whose output is quadratic only in the per-basket item
count (bounded, ~single digits for TPC-H orders; ~tens for customer
histories), never in the corpus. At 100 TB the pair generation is
either one co-partitioned self-join on the basket key (mb1 — both
sides hash to the same exchange, so Catalyst reuses a single shuffle)
or, where a per-basket cap bounds the vectors, an in-basket array
combination generator with no join at all (cf1) — followed by a
partial-combined aggregate on the (item_a, item_b) pair key. No
broadcast of item-level relations (item cardinality grows with the
corpus); the one-row corpus totals ARE broadcast.

Restates the reference's co-purchase framing (its PageRank-style
product graph and CLV pipelines aggregate the same orders×lineitem
join, /root/reference/spark_processing.py:45-52) as the two classic
basket statistics: support/confidence/lift and cosine similarity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from big_data_analytics_spark.catalog import load_table
from big_data_analytics_spark.operators.joins import sized_side
from big_data_analytics_spark.queries import query
from big_data_analytics_spark.caching import register_cache

#: The distinct (basket, item) and (user, item, qty) relations feed
#: 3-4 downstream consumers per query; cache one localCheckpoint per
#: (session, sf_dir) — the graph-module pattern — instead of
#: re-persisting a fresh DataFrame on every invocation (which would
#: accumulate cache entries across repeated calls in a long session).
_REL_CACHE: dict[tuple[str, str, str], "DataFrame"] = register_cache({})


def _cached(spark: SparkSession, sf_dir: str, tag: str, build):
    key = (spark.sparkContext.applicationId, sf_dir, tag)
    df = _REL_CACHE.get(key)
    if df is None:
        df = build().localCheckpoint()
        _REL_CACHE[key] = df
    return df


@query(
    "mb1_association_rules",
    oracle="""
    WITH baskets AS (
        SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ), tot AS (
        SELECT COUNT(DISTINCT l_orderkey) AS n_orders FROM baskets
    ), item AS (
        SELECT l_partkey, COUNT(*) AS n FROM baskets GROUP BY l_partkey
    ), pairs AS (
        SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
               COUNT(*) AS pair_n
        FROM baskets a JOIN baskets b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY a.l_partkey, b.l_partkey
        HAVING COUNT(*) >= 3
    )
    SELECT part_a, part_b, pair_n,
           ROUND(CAST(pair_n AS DOUBLE) / CAST(t.n_orders AS DOUBLE), 6)
               AS support,
           ROUND(CAST(pair_n AS DOUBLE) / CAST(ia.n AS DOUBLE), 6)
               AS conf_a_to_b,
           ROUND(CAST(pair_n AS DOUBLE) * CAST(t.n_orders AS DOUBLE)
                 / (CAST(ia.n AS DOUBLE) * CAST(ib.n AS DOUBLE)), 6)
               AS lift
    FROM pairs
    JOIN item ia ON ia.l_partkey = part_a
    JOIN item ib ON ib.l_partkey = part_b
    CROSS JOIN tot t
    ORDER BY pair_n DESC, part_a, part_b
    LIMIT 100
    """,
)
def mb1_association_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-100 association rules over order baskets: pair support,
    directional confidence, and lift, from one co-partitioned
    self-join on the order key.

    Scale shape: ``baskets`` is one distinct (shuffle on the pair
    key); the self-join re-uses the order-key exchange on both sides;
    pair counts partial-aggregate before the (part_a, part_b)
    shuffle. The one-row order total is an explicit broadcast. All
    ratios derive from exact integer counts, so both engines emit
    identical doubles; ordering is the strict total order
    (pair_n DESC, part_a, part_b).

    PINNED (round-12 implicit-broadcast audit): plan-time stats on
    the checkpointed basket relation UNDERESTIMATE, and the observed
    10× plan broadcast the FACT-SIZED basket side of the self-join
    (and the part-keyed item counts) — the exact class the round-10
    explicit-broadcast audit pinned, hiding in stats-driven joins.
    The basket side now goes through sized_side on its measured count
    (cheap: the relation is checkpoint-materialized) and the item
    counts on the part table's metadata count — broadcast below the
    5M ceiling (today's plan, unchanged), co-partitioned sort-merge
    past it (the documented shape)."""
    baskets = _cached(
        spark, sf_dir, "baskets",
        lambda: load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey").distinct())
    n_baskets = baskets.count()  # cheap: checkpoint-materialized
    n_parts = load_table(spark, sf_dir, "part").count()  # metadata
    tot = baskets.agg(
        F.countDistinct("l_orderkey").alias("n_orders"))
    item = baskets.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("n"))
    a = baskets.alias("a")
    b = sized_side(baskets.alias("b"), n_baskets)
    pairs = (a.join(b, (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
                    & (F.col("a.l_partkey") < F.col("b.l_partkey")))
             .groupBy(F.col("a.l_partkey").alias("part_a"),
                      F.col("b.l_partkey").alias("part_b"))
             .agg(F.count(F.lit(1)).alias("pair_n"))
             .filter(F.col("pair_n") >= 3))
    ia = item.select(F.col("l_partkey").alias("part_a"),
                     F.col("n").alias("na"))
    ib = item.select(F.col("l_partkey").alias("part_b"),
                     F.col("n").alias("nb"))
    pn = F.col("pair_n").cast("double")
    no = F.col("n_orders").cast("double")
    out = (pairs.join(sized_side(ia, n_parts), "part_a")
           .join(sized_side(ib, n_parts), "part_b")
           .crossJoin(F.broadcast(tot))
           .select(
               "part_a", "part_b", "pair_n",
               F.round(pn / no, 6).alias("support"),
               F.round(pn / F.col("na").cast("double"), 6)
               .alias("conf_a_to_b"),
               F.round(pn * no / (F.col("na").cast("double")
                                  * F.col("nb").cast("double")), 6)
               .alias("lift"))
           .orderBy(F.desc("pair_n"), "part_a", "part_b")
           .limit(100))
    return out


@query(
    "cf1_item_item_cosine",
    oracle="""
    WITH ratings_all AS (
        SELECT o.o_custkey AS u, l.l_partkey AS i,
               SUM(CAST(l.l_quantity AS BIGINT)) AS q
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        GROUP BY o.o_custkey, l.l_partkey
    ), ratings AS (
        SELECT u, i, q FROM (
            SELECT u, i, q,
                   ROW_NUMBER() OVER (PARTITION BY u
                                      ORDER BY q DESC, i) AS rn
            FROM ratings_all)
        WHERE rn <= 20
    ), norms AS (
        SELECT i, SUM(CAST(q * q AS HUGEINT)) AS n2 FROM ratings GROUP BY i
    ), dots AS (
        SELECT a.i AS item_a, b.i AS item_b,
               SUM(CAST(a.q * b.q AS HUGEINT)) AS dot,
               COUNT(*) AS n_common
        FROM ratings a JOIN ratings b
          ON a.u = b.u AND a.i < b.i
        GROUP BY a.i, b.i
        HAVING COUNT(*) >= 3
    )
    SELECT item_a, item_b, n_common,
           CAST(dot AS BIGINT) AS dot,
           ROUND(CAST(dot AS DOUBLE)
                 / sqrt(CAST(na.n2 AS DOUBLE) * CAST(nb.n2 AS DOUBLE)),
                 6) AS cosine
    FROM dots
    JOIN norms na ON na.i = item_a
    JOIN norms nb ON nb.i = item_b
    ORDER BY 5 DESC, item_a, item_b
    LIMIT 50
    """,
)
def cf1_item_item_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Item-item collaborative filtering: cosine similarity between
    part purchase vectors over the customer dimension (implicit
    ratings = summed quantity), top-50 by similarity among pairs
    sharing >= 3 customers.

    Pair generation (round-6 rewrite, the gr5 shape): the capped
    per-user item vectors collect to sorted (i, q) arrays and one
    generator emits the C(d,2) i<j combinations carrying both
    quantities — the ratings self-join is gone entirely. The
    dot-product aggregate partial-combines on the item pair, and
    norms join the pruned pair relation. Quantities are exact
    integers, so dot products and squared norms are bit-identical
    across engines; the single sqrt at the end is IEEE-deterministic
    from identical inputs. Ordering on the ROUNDED cosine plus the
    item pair gives a strict, engine-portable total order."""
    dec = "decimal(38,0)"

    def _build_ratings() -> DataFrame:
        li = load_table(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_partkey",
            F.col("l_quantity").cast("long").alias("q"))
        o = load_table(spark, sf_dir, "orders").select(
            F.col("o_orderkey").alias("l_orderkey"), "o_custkey")
        ratings_all = (li.join(o, "l_orderkey")
                       .groupBy(F.col("o_custkey").alias("u"),
                                F.col("l_partkey").alias("i"))
                       .agg(F.sum("q").alias("q")))
        # Per-user top-20 item cap (the standard CF neighborhood
        # bound): pair fan-out per user is <= C(20,2)=190 instead of
        # quadratic in history length — the difference between a plan
        # that survives power users at 100 TB and one that OOMs on
        # them (measured: the uncapped self-join killed executors at
        # sf0.1). WindowGroupLimit keeps the rank push-down cheap.
        wu = Window.partitionBy("u").orderBy(F.desc("q"), "i")
        return (ratings_all
                .withColumn("rn", F.row_number().over(wu))
                .filter(F.col("rn") <= 20).drop("rn"))

    ratings = _cached(spark, sf_dir, "ratings", _build_ratings)
    norms = ratings.groupBy("i").agg(
        F.sum((F.col("q") * F.col("q")).cast(dec)).alias("n2"))
    # struct field order (i, q) makes sort_array order by item id, so
    # the k<j generator emits ia < ib directly; arrays are <= 20
    # elements by the cap, bounding the per-row combination cost.
    # The explicit numPartitions matters twice over: the checkpointed
    # ratings relation is AQE-coalesced to a couple of partitions
    # (right for its byte size), but the C(20,2)-per-user pair
    # fan-out below is the expensive stage and must run wide — and
    # AQE sizes shuffles by INPUT bytes, so only a user-pinned
    # partition count survives to carry the 190x generator fan-out.
    n_part = spark.sparkContext.defaultParallelism
    baskets = ratings.repartition(n_part, "u").groupBy("u").agg(
        F.sort_array(F.collect_list(F.struct("i", "q"))).alias("items"))
    # k<j pair expansion as two CHAINED explodes — each a codegen
    # Generate — instead of one interpreted nested transform×transform
    # struct build (higher-order lambdas are CodegenFallback; the gr5
    # r15 A/B measured the interpreted generator at ~5× the CPU of
    # the chained form on the same pair volume)
    pairs = (baskets
             .select("items", F.posexplode("items").alias("k", "x"))
             .select(F.col("x.i").alias("ia"), F.col("x.q").alias("qa"),
                     F.explode(F.expr(
                         "slice(items, k + 2, size(items) - k - 1)"))
                     .alias("y"))
             .select("ia", "qa", F.col("y.i").alias("ib"),
                     F.col("y.q").alias("qb")))
    dots = (pairs.groupBy(F.col("ia").alias("item_a"),
                          F.col("ib").alias("item_b"))
            .agg(F.sum((F.col("qa") * F.col("qb")).cast(dec))
                 .alias("dot"),
                 F.count(F.lit(1)).alias("n_common"))
            .filter(F.col("n_common") >= 3))
    na = norms.select(F.col("i").alias("item_a"), F.col("n2").alias("na2"))
    nb = norms.select(F.col("i").alias("item_b"), F.col("n2").alias("nb2"))
    cos = F.round(
        F.col("dot").cast("double")
        / F.sqrt(F.col("na2").cast("double") * F.col("nb2").cast("double")),
        6)
    return (dots.join(na, "item_a").join(nb, "item_b")
            .select("item_a", "item_b", "n_common",
                    F.col("dot").cast("long").alias("dot"),
                    cos.alias("cosine"))
            .orderBy(F.desc("cosine"), "item_a", "item_b")
            .limit(50))
