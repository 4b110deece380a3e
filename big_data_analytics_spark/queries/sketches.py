"""Sketch operators — the 100 TB cardinality/quantile toolkit:
HyperLogLog distinct counts (including explicit sketch merge, the
property that makes HLL work across partitions/days/tables) and
approximate quantiles.

Oracle strategy: approximate answers are engine-specific (Spark's
HLL++ and DuckDB's HLL give different estimates), so the queries
return the *exact* answer plus a boolean asserting the sketch's
estimate landed within its error bound. The oracle recomputes the
exact side and expects TRUE — so the driver still gets a value-hash
row that fails if the sketch path breaks or drifts out of bound.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from big_data_analytics_spark.catalog import load_table
from big_data_analytics_spark.queries import query


#: Acceptance band for HLL++ estimates vs exact: the default rsd=0.05
#: is one *standard deviation*, not a bound, so a 5% gate could flip
#: FALSE on an unlucky-but-correct estimate after any dataset
#: regeneration. 3×rsd (~99.7% of the estimator's distribution) keeps
#: the row a real regression tripwire without being flaky.
HLL_BAND = 0.15


@query(
    "sk1_hll_distinct_users",
    oracle="""
    SELECT event_type,
           COUNT(DISTINCT user_id) AS n_exact,
           TRUE AS hll_within_band
    FROM events
    GROUP BY event_type
    """,
)
def sk1_hll_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct users per event type: exact count alongside an HLL++
    estimate asserted within 3×rsd (estimate is deterministic for
    fixed data). At 100 TB the approx path is the one that runs — it
    needs no exact-distinct shuffle of user ids, only fixed-size
    sketch merges."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("n_exact"),
            F.approx_count_distinct("user_id").alias("__est"),
        )
        .select(
            "event_type", "n_exact",
            (F.abs(F.col("__est") - F.col("n_exact"))
             <= HLL_BAND * F.col("n_exact")).alias("hll_within_band"),
        )
    )


@query(
    "sk2_hll_mergeable",
    oracle="""
    SELECT COUNT(DISTINCT o_custkey) AS n_exact,
           TRUE AS merged_within_band
    FROM orders
    """,
)
def sk2_hll_mergeable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The property that makes HLL a scale tool: per-priority partial
    sketches union to the same answer as one global sketch. Builds a
    sketch per o_orderpriority with hll_sketch_agg, merges them with
    hll_union_agg, and asserts the merged estimate is within 3×rsd of
    the exact global distinct — the pattern for pre-aggregated daily
    sketches rolled up over arbitrary date ranges without rescanning."""
    o = load_table(spark, sf_dir, "orders")
    partials = (
        o.groupBy("o_orderpriority")
        .agg(F.hll_sketch_agg("o_custkey").alias("sketch"))
    )
    merged = partials.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias("__est"))
    exact = o.agg(F.countDistinct("o_custkey").alias("n_exact"))
    return exact.crossJoin(merged).select(
        "n_exact",
        (F.abs(F.col("__est") - F.col("n_exact"))
         <= HLL_BAND * F.col("n_exact")).alias("merged_within_band"),
    )


@query(
    "sk3_approx_quantiles",
    oracle="""
    SELECT l_returnflag,
           quantile_cont(l_quantity, 0.25) AS q25,
           quantile_cont(l_quantity, 0.50) AS q50,
           quantile_cont(l_quantity, 0.75) AS q75,
           TRUE AS approx_within_1
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def sk3_approx_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated quartiles of l_quantity per return flag,
    plus a flag that the Greenwald-Khanna approx (accuracy 10000) lands
    within ±1 of each — the approx path is the mergeable,
    bounded-memory one that scales."""
    l = load_table(spark, sf_dir, "lineitem")
    agg = l.groupBy("l_returnflag").agg(
        F.percentile("l_quantity", F.lit(0.25)).alias("q25"),
        F.percentile("l_quantity", F.lit(0.50)).alias("q50"),
        F.percentile("l_quantity", F.lit(0.75)).alias("q75"),
        F.percentile_approx(
            "l_quantity", F.array(F.lit(0.25), F.lit(0.5), F.lit(0.75)),
            F.lit(10000)).alias("__approx"),
    )
    close = (
        (F.abs(F.element_at("__approx", 1) - F.col("q25")) <= 1)
        & (F.abs(F.element_at("__approx", 2) - F.col("q50")) <= 1)
        & (F.abs(F.element_at("__approx", 3) - F.col("q75")) <= 1)
    )
    return agg.select("l_returnflag", "q25", "q50", "q75",
                      close.alias("approx_within_1"))


@query(
    "sk4_heavy_hitters",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n_exact,
           TRUE AS found_by_sketch
    FROM events
    GROUP BY event_type
    HAVING COUNT(*) > 0.1 * (SELECT COUNT(*) FROM events)
    """,
)
def sk4_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy hitters: event types above 10% frequency, exact counts,
    plus the guarantee check that the frequent-items sketch
    (``df.stat.freqItems`` — Karp/Misra-Gries family, single pass,
    bounded memory) surfaced every one of them. The sketch may return
    partition-order-dependent *extras* below the support threshold
    (why the graded output keeps only above-threshold rows, where
    inclusion is guaranteed); at 100 TB the sketch pass is the one
    that runs — no full value-frequency shuffle, fixed-size state."""
    ev = load_table(spark, sf_dir, "events")
    support = 0.1
    fi = ev.stat.freqItems(["event_type"], support)  # 1 row, array col
    exact = (
        ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_exact"))
    )
    total = ev.agg(F.count(F.lit(1)).alias("__total"))
    return (
        exact.crossJoin(F.broadcast(total))
        .filter(F.col("n_exact") > support * F.col("__total"))
        .crossJoin(F.broadcast(fi))
        .select(
            "event_type", "n_exact",
            F.array_contains("event_type_freqItems", F.col("event_type"))
            .alias("found_by_sketch"),
        )
    )


@query(
    "sk5_count_min_tokens",
    oracle="""
    WITH tok AS (
        SELECT UNNEST(string_split(text, ' ')) AS token FROM documents
    ), cnt AS (
        SELECT token, CAST(COUNT(*) AS BIGINT) AS tf FROM tok GROUP BY token
    )
    SELECT token, tf,
           TRUE AS cms_overestimates,
           TRUE AS cms_within_band
    FROM cnt
    ORDER BY tf DESC, token
    LIMIT 20
    """,
)
def sk5_count_min_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch (operators/sketches.py) over the token stream:
    the top-20 tokens' exact frequencies plus two hard CMS invariants —
    the estimate never undercounts (a deterministic property, not a
    probabilistic one), and it lands within 2·d·N/w of exact (loose
    multiple of the expected collision mass, so a dataset regeneration
    cannot flip it). The sketch is ≤ d·w rows however large the
    corpus; estimates are a broadcast probe against it."""
    from big_data_analytics_spark.operators.sketches import (
        CMS_WIDTH,
        cms_build,
        cms_estimate,
    )
    d = load_table(spark, sf_dir, "documents")
    tokens = d.select(
        F.explode(F.split(F.col("text"), " ")).alias("token"))
    exact = tokens.groupBy("token").agg(
        F.count(F.lit(1)).cast("long").alias("tf"))
    top = exact.orderBy(F.desc("tf"), "token").limit(20)
    sketch = cms_build(tokens, "token")
    est = cms_estimate(sketch, top, "token")
    total = tokens.agg(F.count(F.lit(1)).alias("__n"))
    band = 2.0 * 4 * F.col("__n") / CMS_WIDTH
    return (
        est.crossJoin(F.broadcast(total))
        .select(
            "token", "tf",
            (F.col("cms_est") >= F.col("tf")).alias("cms_overestimates"),
            ((F.col("cms_est") - F.col("tf")) <= band)
            .alias("cms_within_band"),
        )
    )


@query(
    "sk6_hll_intersection",
    oracle="""
    WITH a AS (SELECT DISTINCT user_id FROM events
               WHERE event_type = 'view'),
         b AS (SELECT DISTINCT user_id FROM events
               WHERE event_type = 'purchase')
    SELECT (SELECT COUNT(*) FROM a) AS n_a,
           (SELECT COUNT(*) FROM b) AS n_b,
           (SELECT COUNT(*) FROM a JOIN b USING (user_id))
               AS n_intersect_exact,
           TRUE AS estimate_within_band
    """,
)
def sk6_hll_intersection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set-intersection cardinality from sketches via
    inclusion-exclusion: |A∩B| ≈ HLL(A) + HLL(B) − HLL(A∪B). HLL
    cannot intersect directly — this is the standard workaround (and
    its error compounds: three estimates, so the band is wider than a
    single sketch's). The exact side is one distinct + one join;
    the sketch side never shuffles raw user ids, only three
    fixed-size sketches — at 100 TB that's the difference between a
    terabyte exchange and kilobytes.

    Output follows the sketch-oracle convention: exact values plus a
    TRUE band flag that trips if the estimator drifts."""
    ev = load_table(spark, sf_dir, "events")
    a = ev.where(F.col("event_type") == "view").select("user_id")
    b = ev.where(F.col("event_type") == "purchase").select("user_id")
    exact_a = a.distinct().count()
    est = (
        a.select(F.lit("a").alias("side"), "user_id")
        .unionByName(b.select(F.lit("b").alias("side"), "user_id"))
        .agg(
            F.approx_count_distinct(
                F.when(F.col("side") == "a", F.col("user_id"))).alias("ea"),
            F.approx_count_distinct(
                F.when(F.col("side") == "b", F.col("user_id"))).alias("eb"),
            F.approx_count_distinct("user_id").alias("eu"),
        )
        .select((F.col("ea") + F.col("eb") - F.col("eu")).alias("est"))
        .first()["est"]
    )
    n_a = exact_a
    n_b = b.distinct().count()
    n_int = a.distinct().join(b.distinct(), "user_id").count()
    # inclusion-exclusion compounds three sketch errors; band vs the
    # *union* size (the natural scale of the absolute error)
    n_union = n_a + n_b - n_int
    within = abs(est - n_int) <= 3 * HLL_BAND * max(n_union, 1)
    return spark.createDataFrame(
        [(n_a, n_b, n_int, bool(within))],
        "n_a long, n_b long, n_intersect_exact long, "
        "estimate_within_band boolean",
    )


@query(
    "bm1_bitmap_segment_intersect",
    oracle="""
    WITH a AS (SELECT DISTINCT user_id FROM events
               WHERE event_type = 'view'),
         b AS (SELECT DISTINCT user_id FROM events
               WHERE event_type = 'purchase')
    SELECT (SELECT COUNT(*) FROM a) AS n_a,
           (SELECT COUNT(*) FROM b) AS n_b,
           (SELECT COUNT(*) FROM a JOIN b USING (user_id))
               AS n_intersect,
           (SELECT COUNT(*) FROM (SELECT user_id FROM a
                                  UNION SELECT user_id FROM b))
               AS n_union
    """,
)
def bm1_bitmap_segment_intersect(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    """EXACT segment-overlap counts via distributed bitmap indexes —
    the precise companion to sk6's sketch estimate. Each segment
    becomes a bitmap over user ids packed into 64-bit words
    (word = id div 64, mask = bit(id mod 64), OR-folded per word);
    intersection/union are then word-aligned bitwise ops + bit_count,
    joined on the word index. The shuffle carries one row per
    *64 users* per segment instead of one per user — the bitmap-index
    trick OLAP engines use for audience-overlap queries. All integer,
    hash-exact."""
    ev = load_table(spark, sf_dir, "events")

    def bitmap(event_type):
        ids = (ev.where(F.col("event_type") == event_type)
               .select("user_id").distinct())
        return (ids.select(
            (F.col("user_id") / 64).cast("long").alias("word"),
            F.call_function(
                "shiftleft", F.lit(1).cast("long"),
                F.pmod(F.col("user_id"), F.lit(64)).cast("int"))
            .alias("mask"))
            .groupBy("word").agg(F.bit_or("mask").alias("bits")))
    a, b = bitmap("view"), bitmap("purchase")
    joined = (a.withColumnRenamed("bits", "ba")
              .join(b.withColumnRenamed("bits", "bb"), "word",
                    "full_outer")
              .select(F.coalesce("ba", F.lit(0)).alias("ba"),
                      F.coalesce("bb", F.lit(0)).alias("bb")))
    return joined.agg(
        F.sum(F.bit_count("ba")).cast("long").alias("n_a"),
        F.sum(F.bit_count("bb")).cast("long").alias("n_b"),
        F.sum(F.bit_count(F.col("ba").bitwiseAND(F.col("bb"))))
        .cast("long").alias("n_intersect"),
        F.sum(F.bit_count(F.col("ba").bitwiseOR(F.col("bb"))))
        .cast("long").alias("n_union"),
    )


# --------------------------------------------------------------------
# sk7 — KMV (theta) sketch: distinct estimates with EXACT set algebra
# (union + direct intersection), every estimate an integer rational.
# --------------------------------------------------------------------
_KMV_K = 64            # sketch size (k minimum values)
_KMV_BITS = 48         # md5-derived hash width: (K-1)*2^48 fits int64
_KMV_MAX = 1 << _KMV_BITS


@query(
    "sk7_kmv_theta_ops",
    oracle=f"""
    WITH h AS (
        SELECT DISTINCT event_type,
               ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 12))
                   ::BIGINT AS h,
               user_id
        FROM events WHERE event_type IN ('view', 'purchase')
    ), a AS (SELECT DISTINCT h, user_id FROM h WHERE event_type = 'view'),
       b AS (SELECT DISTINCT h, user_id FROM h
             WHERE event_type = 'purchase'),
       ska AS (SELECT h FROM (SELECT h, ROW_NUMBER() OVER (ORDER BY h)
                              AS rn FROM (SELECT DISTINCT h FROM a))
               WHERE rn <= {_KMV_K}),
       skb AS (SELECT h FROM (SELECT h, ROW_NUMBER() OVER (ORDER BY h)
                              AS rn FROM (SELECT DISTINCT h FROM b))
               WHERE rn <= {_KMV_K}),
       sku AS (SELECT h FROM (SELECT h, ROW_NUMBER() OVER (ORDER BY h)
                              AS rn FROM (SELECT DISTINCT h FROM a
                                          UNION SELECT DISTINCT h FROM b))
               WHERE rn <= {_KMV_K}),
       rho AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS r FROM sku
        WHERE h IN (SELECT h FROM ska) AND h IN (SELECT h FROM skb)
    ), est AS (
        -- exact mode below capacity: a sketch holding n < K hashes
        -- IS the distinct set, so the estimate is n itself
        SELECT 'view' AS nm,
               CASE WHEN COUNT(*) < {_KMV_K} THEN COUNT(*)
                    ELSE ({_KMV_K} - 1) * {_KMV_MAX} // MAX(h) END AS e,
               CAST(COUNT(*) AS BIGINT) AS cnt
        FROM ska
        UNION ALL
        SELECT 'purchase',
               CASE WHEN COUNT(*) < {_KMV_K} THEN COUNT(*)
                    ELSE ({_KMV_K} - 1) * {_KMV_MAX} // MAX(h) END,
               COUNT(*) FROM skb
        UNION ALL
        SELECT 'union',
               CASE WHEN COUNT(*) < {_KMV_K} THEN COUNT(*)
                    ELSE ({_KMV_K} - 1) * {_KMV_MAX} // MAX(h) END,
               COUNT(*) FROM sku
    )
    SELECT 'view' AS set_name,
           (SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) FROM a)
               AS exact_n,
           (SELECT CAST(e AS BIGINT) FROM est WHERE nm = 'view') AS est_n
    UNION ALL
    SELECT 'purchase',
           (SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) FROM b),
           (SELECT CAST(e AS BIGINT) FROM est WHERE nm = 'purchase')
    UNION ALL
    SELECT 'union',
           (SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT)
            FROM (SELECT user_id FROM a UNION SELECT user_id FROM b)),
           (SELECT CAST(e AS BIGINT) FROM est WHERE nm = 'union')
    UNION ALL
    SELECT 'intersection',
           (SELECT CAST(COUNT(*) AS BIGINT) FROM
               (SELECT DISTINCT user_id FROM a
                INTERSECT SELECT DISTINCT user_id FROM b)),
           (SELECT CAST((SELECT r FROM rho)
                        * (SELECT e FROM est WHERE nm = 'union')
                        // (SELECT cnt FROM est WHERE nm = 'union')
                   AS BIGINT))
    """,
)
def sk7_kmv_theta_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV / theta sketch set algebra — the sketch family sk1/sk6
    lack: HLL cannot intersect directly (sk6's inclusion-exclusion
    compounds error), while a K-minimum-values sketch supports DIRECT
    union and intersection estimates (Beyer et al. 2007 / the theta-
    sketch framework): keep the K smallest of a uniform 48-bit
    md5-derived hash; est(X) = (K-1)*2^48 / kth_min; union sketch =
    K smallest of the merged k-sets; intersection via the matching
    fraction rho/K of the union sketch scaled by est(union). Every
    hash is md5-derived (the d2b portable-hash family) and every
    estimate is ONE exact integer floor division, so the whole sketch
    pipeline — not just the exact side — hash-grades across engines;
    exact counts ride along per the sk-family convention.

    Scale shape: per-side distinct hashing partial-aggregates
    map-side; each k-set is TakeOrderedAndProject({K}) — no global
    sort, K rows to the driver side of nothing (the sketches stay
    relations; joins against them broadcast K-row sides). Merging
    sketches touches 2K rows regardless of data size — the reason a
    theta sketch is THE 100 TB distinct-set-algebra tool (kilobytes
    exchanged, exact-error-bounded estimates, mergeable across
    partitions/days)."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("view", "purchase"))
    h = (F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 12),
                16, 10).cast("long"))
    sides = ev.select("event_type", "user_id", h.alias("h"))
    a = sides.filter(F.col("event_type") == "view").select(
        "user_id", "h").distinct()
    b = sides.filter(F.col("event_type") == "purchase").select(
        "user_id", "h").distinct()

    def ksmall(df: DataFrame) -> DataFrame:
        return (df.select("h").distinct()
                .orderBy(F.asc("h")).limit(_KMV_K))

    ska, skb = ksmall(a), ksmall(b)
    sku = ksmall(a.select("h").union(b.select("h")))

    def est(sk: DataFrame) -> tuple[int, int]:
        row = sk.agg(F.count(F.lit(1)).alias("n"),
                     F.max("h").alias("m")).collect()[0]
        n, kth = int(row["n"]), int(row["m"])
        # exact mode below capacity: n < K hashes IS the distinct set
        if n < _KMV_K:
            return n, n
        return (_KMV_K - 1) * _KMV_MAX // kth, n

    rho = (sku.join(F.broadcast(ska), "h", "left_semi")
           .join(F.broadcast(skb), "h", "left_semi").count())
    est_u, cnt_u = est(sku)
    inter_est = rho * est_u // cnt_u
    exact_a = a.count()
    exact_b = b.count()
    exact_u = a.select("user_id").union(b.select("user_id")) \
        .distinct().count()
    exact_i = (a.select("user_id")
               .join(b.select("user_id"), "user_id", "left_semi")
               .distinct().count())
    return spark.createDataFrame(
        [("view", exact_a, est(ska)[0]),
         ("purchase", exact_b, est(skb)[0]),
         ("union", exact_u, est_u),
         ("intersection", exact_i, inter_est)],
        "set_name string, exact_n long, est_n long")


sk7_kmv_theta_ops.__doc__ = sk7_kmv_theta_ops.__doc__.format(K=_KMV_K)
