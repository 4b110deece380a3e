"""Statistics breadth: robust estimators (a21 median/MAD), one-pass
correlation matrices (a22), cohort retention (rt1), chi-square
independence (st1), and A/B proportion tests (st2) — plus the
grouped n-gram ranking (t11) that applies the o2g top-k pattern to
the text surface.

The shared discipline: every statistic reduces to sums/counts/
percentiles computed in one or two partial-combined passes, with
round-4 (or pure-integer) outputs for cross-engine hash parity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from big_data_analytics_spark.catalog import load_table
from big_data_analytics_spark.queries import query


@query(
    "a21_robust_price_stats",
    oracle="""
    WITH med AS (
        SELECT l_returnflag,
               ROUND(quantile_cont(l_extendedprice, 0.5), 4) AS median_price
        FROM lineitem GROUP BY l_returnflag
    ), dev AS (
        SELECT l.l_returnflag, m.median_price,
               ROUND(quantile_cont(ABS(l.l_extendedprice - m.median_price),
                                   0.5), 4) AS mad
        FROM lineitem l JOIN med m USING (l_returnflag)
        GROUP BY l.l_returnflag, m.median_price
    )
    SELECT l.l_returnflag,
           d.median_price,
           d.mad,
           CAST(SUM(CASE WHEN ABS(l.l_extendedprice - d.median_price)
                              > 3 * 1.4826 * d.mad
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
    FROM lineitem l JOIN dev d USING (l_returnflag)
    GROUP BY l.l_returnflag, d.median_price, d.mad
    """,
)
def a21_robust_price_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median / MAD / robust outlier counts per return flag. MAD needs
    the median *inside* a second aggregation, so the plan is two
    percentile windows over the same l_returnflag partitioning plus
    one final aggregation — Catalyst reuses the single exchange for
    all three, no join (the oracle spells it with joins because SQL
    windows can't nest; same values). The 1.4826 factor scales MAD to
    a normal-consistent sigma; round-4 percentiles keep the a8
    engine-portability convention."""
    li = load_table(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_returnflag")
    p = F.col("l_extendedprice")
    with_med = li.select(
        "l_returnflag", "l_extendedprice",
        F.round(F.percentile(p, F.lit(0.5)).over(w), 4)
        .alias("median_price"),
    )
    dev = F.abs(p - F.col("median_price"))
    with_mad = with_med.select(
        "l_returnflag", "l_extendedprice", "median_price",
        F.round(F.percentile(dev, F.lit(0.5)).over(w), 4).alias("mad"),
    )
    return with_mad.groupBy("l_returnflag", "median_price", "mad").agg(
        F.sum((F.abs(p - F.col("median_price"))
               > 3 * 1.4826 * F.col("mad")).cast("long")).cast("long")
        .alias("n_outliers"),
    )


@query(
    "t11_top_bigrams_per_lang",
    oracle="""
    WITH toks AS (
        SELECT lang, string_split(text, ' ') AS t FROM documents
    ), grams AS (
        SELECT lang,
               UNNEST(list_transform(range(1, len(t)),
                                     i -> t[i] || ' ' || t[i + 1]))
                   AS bigram
        FROM toks
    ), counted AS (
        SELECT lang, bigram, COUNT(*) AS n FROM grams
        GROUP BY lang, bigram
    )
    SELECT lang, bigram, n, CAST(rnk AS INTEGER) AS rnk FROM (
        SELECT lang, bigram, n,
               ROW_NUMBER() OVER (PARTITION BY lang
                                  ORDER BY n DESC, bigram ASC) AS rnk
        FROM counted
    ) WHERE rnk <= 5
    """,
)
def t11_top_bigrams_per_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 bigrams per language by frequency (ties broken by
    bigram). Bigram expansion is an in-array transform over adjacent
    token pairs — narrow, no UDF; the rank prunes through
    WindowGroupLimit so only ~5 rows per language survive the final
    sort, the o2g pattern. At 100 TB the (lang, bigram) count
    partial-aggregates map-side; language is low-cardinality, so the
    window partitioning is the only skew point — for a single-language
    corpus pre-aggregate by (lang, bigram-hash-bucket) first."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    # arrays_zip of shifted slices (codegen; also cleanly empty for
    # 1-token docs, where a sequence(1, 0) build would misbehave)
    grams = d.select(
        "lang",
        F.explode(F.arrays_zip(
            F.slice(toks, 1, F.size(toks) - 1),
            F.slice(toks, 2, F.size(toks) - 1))).alias("p"),
    ).select("lang", F.concat_ws(" ", "p.0", "p.1").alias("bigram"))
    counted = grams.groupBy("lang", "bigram").agg(F.count("*").alias("n"))
    w = Window.partitionBy("lang").orderBy(
        F.col("n").desc(), F.col("bigram").asc())
    return (
        counted.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= 5)
        .select("lang", "bigram", "n", F.col("rnk").cast("int"))
    )


_CORR_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]


@query(
    "a22_corr_matrix",
    oracle=f"""
    WITH pairs AS (
        {" UNION ALL ".join(
            f"SELECT '{a}' AS col_a, '{b}' AS col_b, "
            f"ROUND(corr({a}, {b}), 4) AS corr FROM lineitem"
            for i, a in enumerate(_CORR_COLS)
            for b in _CORR_COLS[i + 1:])}
    )
    SELECT col_a, col_b, corr FROM pairs
    """,
)
def a22_corr_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full pairwise correlation matrix over the numeric lineitem
    columns in ONE aggregation pass: every pair's corr is just an
    expression over shared per-column sums/products, so p columns
    cost one scan and one p²-sized result — versus the p² separate
    passes the naive per-pair loop (and the oracle's UNION ALL
    spelling) would make. Round-4 for cross-engine float parity, the
    a8/a10 convention."""
    li = load_table(spark, sf_dir, "lineitem")
    aggs = [F.count(F.lit(1)).alias("n")]
    for c in _CORR_COLS:
        aggs.append(F.sum(F.col(c)).alias(f"s_{c}"))
        aggs.append(F.sum(F.col(c) * F.col(c)).alias(f"ss_{c}"))
    pairs = [(a, b) for i, a in enumerate(_CORR_COLS)
             for b in _CORR_COLS[i + 1:]]
    for a, b in pairs:
        aggs.append(F.sum(F.col(a) * F.col(b)).alias(f"sp_{a}_{b}"))
    row = li.agg(*aggs)
    out_rows = []
    for a, b in pairs:
        n = F.col("n")
        cov = F.col(f"sp_{a}_{b}") - F.col(f"s_{a}") * F.col(f"s_{b}") / n
        va = F.col(f"ss_{a}") - F.col(f"s_{a}") * F.col(f"s_{a}") / n
        vb = F.col(f"ss_{b}") - F.col(f"s_{b}") * F.col(f"s_{b}") / n
        out_rows.append(F.struct(
            F.lit(a).alias("col_a"), F.lit(b).alias("col_b"),
            F.round(cov / F.sqrt(va * vb), 4).alias("corr")))
    return row.select(
        F.explode(F.array(*out_rows)).alias("p")).select("p.*")


@query(
    "rt1_weekly_retention",
    oracle="""
    WITH weeks AS (
        SELECT user_id,
               CAST((CAST(ts AS DATE) - DATE '2024-01-01') // 7 AS BIGINT)
                   AS wk
        FROM events
    ), cohorts AS (
        SELECT user_id, MIN(wk) AS cohort_wk FROM weeks GROUP BY user_id
    ), activity AS (
        SELECT DISTINCT w.user_id, c.cohort_wk, w.wk - c.cohort_wk AS offset_wk
        FROM weeks w JOIN cohorts c USING (user_id)
    )
    SELECT cohort_wk, offset_wk,
           COUNT(*) AS n_active_users
    FROM activity GROUP BY cohort_wk, offset_wk
    """,
)
def rt1_weekly_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users grouped by first-active week,
    counted in each subsequent week they return — the table behind
    every retention curve. Two aggregations and one join, all on
    user_id, so a single exchange serves the cohort assignment and
    the distinct; the final (cohort, offset) count is matrix-sized.
    Week indexing is integer days-since-epoch-anchor arithmetic —
    no timezone/week-start semantics to diverge between engines.
    The cohort relation is USER-sized (grows with the corpus), so its
    attachment is pinned on the events table's metadata count rather
    than left to derived-relation stats, which mis-broadcast it at
    the 10× audit — broadcast below the ceiling, else the
    co-partitioned merge this docstring always claimed."""
    from big_data_analytics_spark.operators.joins import sized_side

    ev = load_table(spark, sf_dir, "events")
    n_ev = ev.count()  # parquet metadata; bounds distinct users
    weeks = ev.select(
        "user_id",
        F.floor(F.datediff(F.to_date("ts"), F.lit("2024-01-01")) / 7)
        .cast("long").alias("wk"))
    cohorts = weeks.groupBy("user_id").agg(F.min("wk").alias("cohort_wk"))
    activity = (
        weeks.join(sized_side(cohorts, n_ev), "user_id")
        .select("user_id", "cohort_wk",
                (F.col("wk") - F.col("cohort_wk")).alias("offset_wk"))
        .distinct()
    )
    return activity.groupBy("cohort_wk", "offset_wk").agg(
        F.count("*").alias("n_active_users"))


@query(
    "st1_chi_square_independence",
    oracle="""
    WITH obs AS (
        SELECT o_orderpriority AS a, o_orderstatus AS b,
               COUNT(*) AS o
        FROM orders GROUP BY o_orderpriority, o_orderstatus
    ), margins AS (
        SELECT a, b, o,
               SUM(o) OVER (PARTITION BY a) AS ra,
               SUM(o) OVER (PARTITION BY b) AS cb,
               SUM(o) OVER () AS n
        FROM obs
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_cells,
           ROUND(SUM((o - ra * cb / CAST(n AS DOUBLE))
                     * (o - ra * cb / CAST(n AS DOUBLE))
                     / (ra * cb / CAST(n AS DOUBLE))), 4) AS chi2
    FROM margins
    """,
)
def st1_chi_square_independence(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """Chi-square test of independence between order priority and
    status, computed from one contingency aggregation: observed cell
    counts, then row/column margins as windows *over the tiny
    contingency table* (never the fact table), then the chi2 fold.
    The categorical complement to the ANOVA/correlation continuous
    stats in ml/; round-4 on the statistic for engine parity (all
    inputs are exact integer counts)."""
    orders = load_table(spark, sf_dir, "orders")
    obs = orders.groupBy(
        F.col("o_orderpriority").alias("a"),
        F.col("o_orderstatus").alias("b"),
    ).agg(F.count("*").alias("o"))
    wa = Window.partitionBy("a")
    wb = Window.partitionBy("b")
    wn = Window.partitionBy()
    m = obs.select(
        "o",
        F.sum("o").over(wa).alias("ra"),
        F.sum("o").over(wb).alias("cb"),
        F.sum("o").over(wn).alias("n"),
    )
    e = F.col("ra") * F.col("cb") / F.col("n").cast("double")
    return m.agg(
        F.count("*").cast("long").alias("n_cells"),
        F.round(F.sum((F.col("o") - e) * (F.col("o") - e) / e), 4)
        .alias("chi2"),
    )


@query(
    "st2_ab_test_proportions",
    oracle="""
    WITH assigned AS (
        SELECT user_id,
               CASE WHEN (user_id * 2654435761) % 2147483648 % 2 = 0
                    THEN 'A' ELSE 'B' END AS variant,
               MAX(CASE WHEN event_type = 'purchase' AND value > 150
                        THEN 1 ELSE 0 END) AS converted
        FROM events GROUP BY user_id
    ), rates AS (
        SELECT variant, COUNT(*) AS n,
               CAST(SUM(converted) AS BIGINT) AS conv
        FROM assigned GROUP BY variant
    )
    SELECT a.n AS n_a, a.conv AS conv_a, b.n AS n_b, b.conv AS conv_b,
           ROUND((a.conv / CAST(a.n AS DOUBLE)
                  - b.conv / CAST(b.n AS DOUBLE))
                 / SQRT((a.conv + b.conv) / CAST(a.n + b.n AS DOUBLE)
                        * (1 - (a.conv + b.conv)
                           / CAST(a.n + b.n AS DOUBLE))
                        * (1.0 / a.n + 1.0 / b.n)), 4) AS z_stat
    FROM (SELECT * FROM rates WHERE variant = 'A') a,
         (SELECT * FROM rates WHERE variant = 'B') b
    """,
)
def st2_ab_test_proportions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion z-test for an A/B experiment: users hash-
    assigned to variants (the deterministic-split discipline — the
    assignment IS the experiment's reproducibility), per-user
    conversion (a high-value purchase — the threshold keeps the rate
    mid-range so the pooled variance is non-degenerate), pooled-
    variance z statistic. One aggregation to
    per-user, one to per-variant, then scalar arithmetic on a 2-row
    frame. Round-4 on z; counts are exact."""
    from big_data_analytics_spark.queries.sampling import KNUTH, MOD
    ev = load_table(spark, sf_dir, "events")
    assigned = ev.groupBy("user_id").agg(
        F.max(((F.col("event_type") == "purchase")
               & (F.col("value") > 150)).cast("int"))
        .alias("converted"),
    ).select(
        F.when(F.pmod(F.col("user_id") * F.lit(KNUTH), F.lit(MOD)) % 2
               == 0, "A").otherwise("B").alias("variant"),
        "converted",
    )
    rates = assigned.groupBy("variant").agg(
        F.count("*").alias("n"),
        F.sum("converted").cast("long").alias("conv"))
    a = rates.where(F.col("variant") == "A").select(
        F.col("n").alias("n_a"), F.col("conv").alias("conv_a"))
    b = rates.where(F.col("variant") == "B").select(
        F.col("n").alias("n_b"), F.col("conv").alias("conv_b"))
    j = a.crossJoin(b)
    pa = F.col("conv_a") / F.col("n_a").cast("double")
    pb = F.col("conv_b") / F.col("n_b").cast("double")
    pool = (F.col("conv_a") + F.col("conv_b")) / (
        F.col("n_a") + F.col("n_b")).cast("double")
    z = (pa - pb) / F.sqrt(
        pool * (1 - pool)
        * (1.0 / F.col("n_a") + 1.0 / F.col("n_b")))
    return j.select("n_a", "conv_a", "n_b", "conv_b",
                    F.round(z, 4).alias("z_stat"))


@query(
    "ml1_ols_inference",
    oracle="""
    WITH rows_i AS (
        SELECT l_returnflag,
               CAST(l_quantity AS BIGINT) AS x,
               CAST(FLOOR(l_extendedprice * 100.0 + 0.5) AS BIGINT) AS y
        FROM lineitem
    ), s AS (
        SELECT l_returnflag,
               COUNT(*) AS n,
               SUM(CAST(x AS HUGEINT)) AS sx,
               SUM(CAST(y AS HUGEINT)) AS sy,
               SUM(CAST(x * x AS HUGEINT)) AS sxx,
               SUM(CAST(x * y AS HUGEINT)) AS sxy,
               SUM(CAST(y * y AS HUGEINT)) AS syy
        FROM rows_i GROUP BY l_returnflag
    ), d AS (
        SELECT l_returnflag, n,
               CAST(n AS DOUBLE) AS nd, CAST(sx AS DOUBLE) AS sxd,
               CAST(sy AS DOUBLE) AS syd, CAST(sxx AS DOUBLE) AS sxxd,
               CAST(sxy AS DOUBLE) AS sxyd, CAST(syy AS DOUBLE) AS syyd
        FROM s
    ), fit AS (
        SELECT l_returnflag, n, nd, syd, sxd, sxyd, syyd,
               (nd * sxyd - sxd * syd) AS num,
               (nd * sxxd - sxd * sxd) AS den
        FROM d
    ), coef AS (
        SELECT *, num / den AS slope_c,
               (syd - (num / den) * sxd) / nd AS a_c
        FROM fit
    )
    SELECT l_returnflag, n,
           ROUND(slope_c / 100.0, 6) AS slope,
           ROUND(a_c / 100.0, 4) AS intercept,
           ROUND((num * num) / (den * (nd * syyd - syd * syd)), 6) AS r2,
           ROUND(sqrt(((syyd - a_c * syd - slope_c * sxyd) / (nd - 2.0))
                      * nd / den) / 100.0, 6) AS se_slope,
           ROUND(slope_c / sqrt(((syyd - a_c * syd - slope_c * sxyd)
                                 / (nd - 2.0)) * nd / den), 4) AS t_slope
    FROM coef
    """,
)
def ml1_ols_inference(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed OLS WITH inference (SURVEY §2.9 M1 — the
    reference's ``sm.OLS(...).fit(); model.summary()``,
    /root/reference/codes_in_book_of_statisct.ipynb:6488-6577) as a
    driver-graded query: per-returnflag slope, intercept, R², slope
    standard error, and t-statistic for price ~ quantity, from ONE
    pass of six sufficient statistics.

    Determinism at 1000 executors: a parallel double Σy² is
    order-dependent, so every sum is exact integer arithmetic —
    quantities as BIGINT, prices as integer cents, accumulated in
    decimal(38,0) (Spark) / HUGEINT (DuckDB), converted to double
    exactly once before the closed-form algebra (identical
    expression tree on both engines). The ml/ module's regression
    surface fits the same closed form; this query pins it to an
    independent engine."""
    li = load_table(spark, sf_dir, "lineitem")
    xl = F.col("l_quantity").cast("long")
    yl = F.floor(F.col("l_extendedprice") * 100.0 + 0.5)
    dec = "decimal(38,0)"
    s = (li.select("l_returnflag", xl.alias("x"), yl.alias("y"))
         .groupBy("l_returnflag")
         .agg(F.count(F.lit(1)).alias("n"),
              F.sum(F.col("x").cast(dec)).alias("sx"),
              F.sum(F.col("y").cast(dec)).alias("sy"),
              F.sum((F.col("x") * F.col("x")).cast(dec)).alias("sxx"),
              F.sum((F.col("x") * F.col("y")).cast(dec)).alias("sxy"),
              F.sum((F.col("y") * F.col("y")).cast(dec)).alias("syy")))
    d = s.select(
        "l_returnflag", "n",
        F.col("n").cast("double").alias("nd"),
        F.col("sx").cast("double").alias("sxd"),
        F.col("sy").cast("double").alias("syd"),
        F.col("sxx").cast("double").alias("sxxd"),
        F.col("sxy").cast("double").alias("sxyd"),
        F.col("syy").cast("double").alias("syyd"))
    fit = d.select(
        "*",
        (F.col("nd") * F.col("sxyd") - F.col("sxd") * F.col("syd"))
        .alias("num"),
        (F.col("nd") * F.col("sxxd") - F.col("sxd") * F.col("sxd"))
        .alias("den"))
    coef = fit.select(
        "*",
        (F.col("num") / F.col("den")).alias("slope_c"),
        ((F.col("syd") - (F.col("num") / F.col("den")) * F.col("sxd"))
         / F.col("nd")).alias("a_c"))
    sigma_term = (((F.col("syyd") - F.col("a_c") * F.col("syd")
                    - F.col("slope_c") * F.col("sxyd"))
                   / (F.col("nd") - F.lit(2.0)))
                  * F.col("nd") / F.col("den"))
    return coef.select(
        "l_returnflag", "n",
        F.round(F.col("slope_c") / 100.0, 6).alias("slope"),
        F.round(F.col("a_c") / 100.0, 4).alias("intercept"),
        F.round((F.col("num") * F.col("num"))
                / (F.col("den") * (F.col("nd") * F.col("syyd")
                                   - F.col("syd") * F.col("syd"))), 6)
        .alias("r2"),
        F.round(F.sqrt(sigma_term) / 100.0, 6).alias("se_slope"),
        F.round(F.col("slope_c") / F.sqrt(sigma_term), 4).alias("t_slope"))


@query(
    "st3_mann_whitney_u",
    oracle="""
    WITH xs AS (
        SELECT CAST(l.l_quantity AS BIGINT) AS v,
               CASE WHEN o.o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS ia,
               CASE WHEN o.o_orderpriority = '5-LOW' THEN 1 ELSE 0 END AS ib
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        WHERE o.o_orderpriority IN ('1-URGENT', '5-LOW')
    ), pv AS (
        SELECT v, SUM(ia) AS a, SUM(ib) AS b FROM xs GROUP BY v
    ), cw AS (
        SELECT v, a, b,
               SUM(b) OVER (ORDER BY v
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) - b AS cb
        FROM pv
    ), agg AS (
        SELECT SUM(a * (2 * cb + b)) AS u2x,
               SUM(a) AS n1, SUM(b) AS n2,
               SUM((a + b) * (a + b) * (a + b) - (a + b)) AS ts
        FROM cw
    )
    SELECT CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
           ROUND(CAST(u2x AS DOUBLE) / 2.0, 1) AS u1,
           ROUND((CAST(u2x AS DOUBLE) / 2.0
                  - CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / 2.0)
                 / sqrt((CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / 12.0)
                        * ((CAST(n1 + n2 AS DOUBLE) + 1.0)
                           - CAST(ts AS DOUBLE)
                             / (CAST(n1 + n2 AS DOUBLE)
                                * (CAST(n1 + n2 AS DOUBLE) - 1.0)))), 4)
               AS z_stat
    FROM agg
    """,
)
def st3_mann_whitney_u(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann–Whitney U (rank-sum) test with tie correction: do URGENT
    and LOW-priority orders draw line quantities from the same
    distribution? The nonparametric complement to st2's z-test
    (SURVEY §2.9 notebook stats surface).

    Scale: NOT computed via global ranks (a partitionless rank over
    the fact table is a single-task sort). U reduces to pair counts
    over the per-value histogram: one hash aggregate to (value, a, b)
    — the window then runs over |distinct values| rows (50 here;
    integer-valued metrics keep this bounded), and everything stays
    exact integer until one final double formula (2·U1 is integral;
    ties via Σ(t³−t))."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", F.col("l_quantity").cast("long").alias("v"))
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority")
    xs = (li.join(o, "l_orderkey")
          .filter(F.col("o_orderpriority").isin("1-URGENT", "5-LOW"))
          .select(
              "v",
              F.when(F.col("o_orderpriority") == "1-URGENT", 1)
              .otherwise(0).alias("ia"),
              F.when(F.col("o_orderpriority") == "5-LOW", 1)
              .otherwise(0).alias("ib")))
    pv = xs.groupBy("v").agg(F.sum("ia").alias("a"), F.sum("ib").alias("b"))
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    cw = pv.select(
        "a", "b", (F.sum("b").over(w) - F.col("b")).alias("cb"))
    agg = cw.agg(
        F.sum(F.col("a") * (2 * F.col("cb") + F.col("b"))).alias("u2x"),
        F.sum("a").alias("n1"), F.sum("b").alias("n2"),
        F.sum((F.col("a") + F.col("b")) * (F.col("a") + F.col("b"))
              * (F.col("a") + F.col("b"))
              - (F.col("a") + F.col("b"))).alias("ts"))
    n1d = F.col("n1").cast("double")
    n2d = F.col("n2").cast("double")
    nd = (F.col("n1") + F.col("n2")).cast("double")
    u1 = F.col("u2x").cast("double") / 2.0
    var = (n1d * n2d / 12.0) * ((nd + 1.0)
                                - F.col("ts").cast("double")
                                / (nd * (nd - 1.0)))
    return agg.select(
        "n1", "n2",
        F.round(u1, 1).alias("u1"),
        F.round((u1 - n1d * n2d / 2.0) / F.sqrt(var), 4).alias("z_stat"))


@query(
    "ml2_anova_f",
    oracle="""
    WITH rows_i AS (
        SELECT l_returnflag AS g,
               CAST(FLOOR(l_extendedprice * 100.0 + 0.5) AS BIGINT) AS y
        FROM lineitem
    ), per_g AS (
        SELECT g, COUNT(*) AS n,
               SUM(CAST(y AS HUGEINT)) AS sy,
               SUM(CAST(y * y AS HUGEINT)) AS syy
        FROM rows_i GROUP BY g
    ), tot AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS k,
               CAST(SUM(n) AS BIGINT) AS n,
               CAST(SUM(sy) AS DOUBLE) AS syd,
               CAST(SUM(syy) AS DOUBLE) AS syyd,
               SUM(CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)
                   / CAST(n AS DOUBLE)) AS sgm
        FROM per_g
    )
    SELECT k, n,
           ROUND((sgm - syd * syd / CAST(n AS DOUBLE)) / 10000.0, 2)
               AS ss_between,
           ROUND((syyd - sgm) / 10000.0, 2) AS ss_within,
           ROUND(((sgm - syd * syd / CAST(n AS DOUBLE))
                  / (CAST(k AS DOUBLE) - 1.0))
                 / ((syyd - sgm) / (CAST(n AS DOUBLE)
                                    - CAST(k AS DOUBLE))), 6) AS f_stat
    FROM tot
    """,
)
def ml2_anova_f(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA (SURVEY §2.9 M20 — the reference's
    ``anova_lm``): does mean price differ across return flags?
    SS_between / SS_within / F from per-group (n, Σy, Σy²) — ONE
    partial-combined aggregate over the fact table plus a 3-row
    reduction, with cents-exact integer sums converted to double
    once (order-independent at any parallelism). SS columns are
    reported in dollars² (/10000)."""
    li = load_table(spark, sf_dir, "lineitem")
    yl = F.floor(F.col("l_extendedprice") * 100.0 + 0.5)
    dec = "decimal(38,0)"
    per_g = (li.select(F.col("l_returnflag").alias("g"), yl.alias("y"))
             .groupBy("g")
             .agg(F.count(F.lit(1)).alias("n"),
                  F.sum(F.col("y").cast(dec)).alias("sy"),
                  F.sum((F.col("y") * F.col("y")).cast(dec)).alias("syy")))
    tot = per_g.agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("n").alias("n"),
        F.sum("sy").cast("double").alias("syd"),
        F.sum("syy").cast("double").alias("syyd"),
        F.sum(F.col("sy").cast("double") * F.col("sy").cast("double")
              / F.col("n").cast("double")).alias("sgm"))
    kd = F.col("k").cast("double")
    nd = F.col("n").cast("double")
    ssb = F.col("sgm") - F.col("syd") * F.col("syd") / nd
    ssw = F.col("syyd") - F.col("sgm")
    return tot.select(
        "k", "n",
        F.round(ssb / 10000.0, 2).alias("ss_between"),
        F.round(ssw / 10000.0, 2).alias("ss_within"),
        F.round((ssb / (kd - 1.0)) / (ssw / (nd - kd)), 6).alias("f_stat"))


@query(
    "st4_ks_two_sample",
    oracle="""
    WITH xs AS (
        SELECT CAST(l.l_quantity AS BIGINT) AS v,
               CASE WHEN o.o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS ia,
               CASE WHEN o.o_orderpriority = '5-LOW' THEN 1 ELSE 0 END AS ib
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        WHERE o.o_orderpriority IN ('1-URGENT', '5-LOW')
    ), pv AS (
        SELECT v, SUM(ia) AS a, SUM(ib) AS b FROM xs GROUP BY v
    ), cum AS (
        SELECT v,
               CAST(SUM(a) OVER (ORDER BY v
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND CURRENT ROW) AS BIGINT) AS ca,
               CAST(SUM(b) OVER (ORDER BY v
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND CURRENT ROW) AS BIGINT) AS cb
        FROM pv
    ), tot AS (
        SELECT MAX(ca) AS n1, MAX(cb) AS n2 FROM cum
    ), d AS (
        SELECT MAX(ABS(CAST(ca AS DOUBLE) / CAST(n1 AS DOUBLE)
                       - CAST(cb AS DOUBLE) / CAST(n2 AS DOUBLE))) AS dmax,
               MAX(n1) AS n1, MAX(n2) AS n2
        FROM cum, tot
    )
    SELECT n1, n2, ROUND(dmax, 6) AS d_stat,
           ROUND(dmax * sqrt(CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
                             / (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE))),
                 4) AS ks_z
    FROM d
    """,
)
def st4_ks_two_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov: max ECDF gap between URGENT and
    LOW-priority quantity distributions, plus the scaled KS statistic
    D·√(n1n2/(n1+n2)).

    Same scale discipline as st3: the ECDFs come from the per-value
    histogram (one hash aggregate), cumulated over |distinct values|
    rows — integer counts until the two final divisions, so both
    engines compute identical doubles."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", F.col("l_quantity").cast("long").alias("v"))
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority")
    xs = (li.join(o, "l_orderkey")
          .filter(F.col("o_orderpriority").isin("1-URGENT", "5-LOW"))
          .select(
              "v",
              F.when(F.col("o_orderpriority") == "1-URGENT", 1)
              .otherwise(0).alias("ia"),
              F.when(F.col("o_orderpriority") == "5-LOW", 1)
              .otherwise(0).alias("ib")))
    pv = xs.groupBy("v").agg(F.sum("ia").alias("a"), F.sum("ib").alias("b"))
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    cum = pv.select(F.sum("a").over(w).alias("ca"),
                    F.sum("b").over(w).alias("cb"))
    wall = Window.rowsBetween(Window.unboundedPreceding,
                              Window.unboundedFollowing)
    cum2 = cum.select(
        "ca", "cb",
        F.max("ca").over(wall).alias("n1"),
        F.max("cb").over(wall).alias("n2"))
    d = cum2.agg(
        F.max("n1").alias("n1"), F.max("n2").alias("n2"),
        F.max(F.abs(F.col("ca").cast("double")
                    / F.col("n1").cast("double")
                    - F.col("cb").cast("double")
                    / F.col("n2").cast("double"))).alias("dmax"))
    n1d = F.col("n1").cast("double")
    n2d = F.col("n2").cast("double")
    return d.select(
        "n1", "n2",
        F.round(F.col("dmax"), 6).alias("d_stat"),
        F.round(F.col("dmax") * F.sqrt(n1d * n2d / (n1d + n2d)), 4)
        .alias("ks_z"))


@query(
    "ml3_ols_multiple",
    oracle="""
    WITH rows_i AS (
        SELECT CAST(l_quantity AS BIGINT) AS x1,
               CAST(FLOOR(l_discount * 100.0 + 0.5) AS BIGINT) AS x2,
               CAST(FLOOR(l_extendedprice * 100.0 + 0.5) AS BIGINT) AS y
        FROM lineitem
    ), s AS (
        SELECT COUNT(*) AS n,
               SUM(CAST(x1 AS HUGEINT)) AS s1,
               SUM(CAST(x2 AS HUGEINT)) AS s2,
               SUM(CAST(x1 * x1 AS HUGEINT)) AS s11,
               SUM(CAST(x2 * x2 AS HUGEINT)) AS s22,
               SUM(CAST(x1 * x2 AS HUGEINT)) AS s12,
               SUM(CAST(y AS HUGEINT)) AS sy,
               SUM(CAST(x1 * y AS HUGEINT)) AS s1y,
               SUM(CAST(x2 * y AS HUGEINT)) AS s2y,
               SUM(CAST(y * y AS HUGEINT)) AS syy
        FROM rows_i
    ), d AS (
        SELECT CAST(n AS DOUBLE) AS nd,
               CAST(s1 AS DOUBLE) AS a12, CAST(s2 AS DOUBLE) AS a13,
               CAST(s11 AS DOUBLE) AS a22, CAST(s12 AS DOUBLE) AS a23,
               CAST(s22 AS DOUBLE) AS a33,
               CAST(sy AS DOUBLE) AS b1, CAST(s1y AS DOUBLE) AS b2,
               CAST(s2y AS DOUBLE) AS b3,
               CAST(syy AS DOUBLE) AS syyd, n
        FROM s
    ), det AS (
        SELECT *,
               nd * (a22 * a33 - a23 * a23)
               - a12 * (a12 * a33 - a23 * a13)
               + a13 * (a12 * a23 - a22 * a13) AS dd
        FROM d
    ), coef AS (
        SELECT *,
               (b1 * (a22 * a33 - a23 * a23)
                - a12 * (b2 * a33 - a23 * b3)
                + a13 * (b2 * a23 - a22 * b3)) / dd AS b0,
               (nd * (b2 * a33 - a23 * b3)
                - b1 * (a12 * a33 - a23 * a13)
                + a13 * (a12 * b3 - b2 * a13)) / dd AS bq,
               (nd * (a22 * b3 - b2 * a23)
                - a12 * (a12 * b3 - b2 * a13)
                + b1 * (a12 * a23 - a22 * a13)) / dd AS bd
        FROM det
    )
    SELECT n,
           ROUND(b0 / 100.0, 4) AS intercept,
           ROUND(bq / 100.0, 6) AS coef_quantity,
           ROUND(bd / 100.0, 6) AS coef_discount_pct,
           ROUND(1.0 - (syyd - b0 * b1 - bq * b2 - bd * b3)
                       / (syyd - b1 * b1 / nd), 6) AS r2
    FROM coef
    """,
)
def ml3_ols_multiple(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MULTIPLE linear regression, driver-graded (SURVEY §2.9 M1's
    general form): price ~ quantity + discount via the 3×3 normal
    equations solved in closed form (Cramer's rule spelled out
    identically on both engines). All ten sufficient statistics are
    exact integers — quantity as BIGINT, discount and price as
    integer hundredths/cents, accumulated decimal(38)/HUGEINT — so
    the normal-equation matrix is bit-identical at any parallelism;
    doubles appear only in the final solve. R² from the same sums
    (1 − SSE/SST with SSE = Σy² − βᵀXᵀy). The ml/ module's
    matrix-free ols_fit computes the same estimator iteratively;
    this pins the closed form to an independent engine."""
    li = load_table(spark, sf_dir, "lineitem")
    x1 = F.col("l_quantity").cast("long")
    x2 = F.floor(F.col("l_discount") * 100.0 + 0.5)
    y = F.floor(F.col("l_extendedprice") * 100.0 + 0.5)
    dec = "decimal(38,0)"
    rows_i = li.select(x1.alias("x1"), x2.alias("x2"), y.alias("y"))
    s = rows_i.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("x1").cast(dec)).alias("s1"),
        F.sum(F.col("x2").cast(dec)).alias("s2"),
        F.sum((F.col("x1") * F.col("x1")).cast(dec)).alias("s11"),
        F.sum((F.col("x2") * F.col("x2")).cast(dec)).alias("s22"),
        F.sum((F.col("x1") * F.col("x2")).cast(dec)).alias("s12"),
        F.sum(F.col("y").cast(dec)).alias("sy"),
        F.sum((F.col("x1") * F.col("y")).cast(dec)).alias("s1y"),
        F.sum((F.col("x2") * F.col("y")).cast(dec)).alias("s2y"),
        F.sum((F.col("y") * F.col("y")).cast(dec)).alias("syy"))
    d = s.select(
        "n",
        F.col("n").cast("double").alias("nd"),
        F.col("s1").cast("double").alias("a12"),
        F.col("s2").cast("double").alias("a13"),
        F.col("s11").cast("double").alias("a22"),
        F.col("s12").cast("double").alias("a23"),
        F.col("s22").cast("double").alias("a33"),
        F.col("sy").cast("double").alias("b1"),
        F.col("s1y").cast("double").alias("b2"),
        F.col("s2y").cast("double").alias("b3"),
        F.col("syy").cast("double").alias("syyd"))
    c = {k: F.col(k) for k in
         ("nd", "a12", "a13", "a22", "a23", "a33", "b1", "b2", "b3")}
    det = d.select("*", (
        c["nd"] * (c["a22"] * c["a33"] - c["a23"] * c["a23"])
        - c["a12"] * (c["a12"] * c["a33"] - c["a23"] * c["a13"])
        + c["a13"] * (c["a12"] * c["a23"] - c["a22"] * c["a13"])
    ).alias("dd"))
    coef = det.select("*", (
        (c["b1"] * (c["a22"] * c["a33"] - c["a23"] * c["a23"])
         - c["a12"] * (c["b2"] * c["a33"] - c["a23"] * c["b3"])
         + c["a13"] * (c["b2"] * c["a23"] - c["a22"] * c["b3"]))
        / F.col("dd")).alias("b0"), (
        (c["nd"] * (c["b2"] * c["a33"] - c["a23"] * c["b3"])
         - c["b1"] * (c["a12"] * c["a33"] - c["a23"] * c["a13"])
         + c["a13"] * (c["a12"] * c["b3"] - c["b2"] * c["a13"]))
        / F.col("dd")).alias("bq"), (
        (c["nd"] * (c["a22"] * c["b3"] - c["b2"] * c["a23"])
         - c["a12"] * (c["a12"] * c["b3"] - c["b2"] * c["a13"])
         + c["b1"] * (c["a12"] * c["a23"] - c["a22"] * c["a13"]))
        / F.col("dd")).alias("bd"))
    return coef.select(
        "n",
        F.round(F.col("b0") / 100.0, 4).alias("intercept"),
        F.round(F.col("bq") / 100.0, 6).alias("coef_quantity"),
        F.round(F.col("bd") / 100.0, 6).alias("coef_discount_pct"),
        F.round(1.0 - (F.col("syyd") - F.col("b0") * F.col("b1")
                       - F.col("bq") * F.col("b2")
                       - F.col("bd") * F.col("b3"))
                / (F.col("syyd") - F.col("b1") * F.col("b1") / F.col("nd")),
                6).alias("r2"))
