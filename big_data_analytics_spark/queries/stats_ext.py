"""Statistics breadth, wave 3: Welch's unequal-variance t-test (st5).

Same engine-portability discipline as st1-st4 (queries/robust.py):
every input to the final formula is an exact integer sum (cents
fixed-point), accumulated as decimal(38,0)/HUGEINT so the map-side
partial aggregation order cannot change the result; doubles appear
only in the last few arithmetic steps, written with identical op
order in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from big_data_analytics_spark.catalog import load_table
from big_data_analytics_spark.queries import query


@query(
    "st5_welch_t_test",
    oracle="""
    WITH v AS (
        SELECT CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS g,
               CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT) AS vc
        FROM events WHERE event_type IN ('click', 'view')
    ), s AS (
        SELECT CAST(SUM(g) AS BIGINT) AS n1,
               CAST(SUM(1 - g) AS BIGINT) AS n2,
               SUM(CAST(g * vc AS HUGEINT)) AS s1,
               SUM(CAST((1 - g) * vc AS HUGEINT)) AS s2,
               SUM(CAST(g * vc * vc AS HUGEINT)) AS q1,
               SUM(CAST((1 - g) * vc * vc AS HUGEINT)) AS q2
        FROM v
    ), d AS (
        SELECT n1, n2,
               CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE) AS m1,
               CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE) AS m2,
               (CAST(q1 AS DOUBLE)
                - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)
                  / CAST(n1 AS DOUBLE)) / (CAST(n1 AS DOUBLE) - 1.0)
                 / CAST(n1 AS DOUBLE) AS se1,
               (CAST(q2 AS DOUBLE)
                - CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE)
                  / CAST(n2 AS DOUBLE)) / (CAST(n2 AS DOUBLE) - 1.0)
                 / CAST(n2 AS DOUBLE) AS se2
        FROM s
    )
    SELECT n1, n2,
           ROUND((m1 - m2) / 100.0, 4) AS mean_diff,
           ROUND((m1 - m2) / sqrt(se1 + se2), 4) AS t_stat,
           ROUND((se1 + se2) * (se1 + se2)
                 / (se1 * se1 / (CAST(n1 AS DOUBLE) - 1.0)
                    + se2 * se2 / (CAST(n2 AS DOUBLE) - 1.0)), 2)
               AS welch_df
    FROM d
    """,
)
def st5_welch_t_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's two-sample t-test (unequal variances): does the mean
    event value differ between clicks and views? Emits group sizes,
    the dollar mean difference, the t statistic, and the
    Welch-Satterthwaite degrees of freedom.

    One conditional-sum aggregate pass produces all six sufficient
    statistics as exact integers (cents, decimal(38,0) accumulators);
    se_i = s_i^2/n_i and the t/df formulas run on identical doubles
    in both engines. The single-row final arithmetic is driver-free —
    it stays a 1-row DataFrame plan."""
    ev = load_table(spark, sf_dir, "events")
    g = (F.col("event_type") == "click").cast("long")
    vc = F.floor(F.col("value") * 100.0 + 0.5).cast("long")
    dec = "decimal(38,0)"
    v = (ev.filter(F.col("event_type").isin("click", "view"))
         .select(g.alias("g"), vc.alias("vc")))
    s = v.agg(
        F.sum("g").cast("long").alias("n1"),
        F.sum(1 - F.col("g")).cast("long").alias("n2"),
        F.sum((F.col("g") * F.col("vc")).cast(dec)).alias("s1"),
        F.sum(((1 - F.col("g")) * F.col("vc")).cast(dec)).alias("s2"),
        F.sum((F.col("g") * F.col("vc") * F.col("vc")).cast(dec))
        .alias("q1"),
        F.sum(((1 - F.col("g")) * F.col("vc") * F.col("vc")).cast(dec))
        .alias("q2"))
    n1d = F.col("n1").cast("double")
    n2d = F.col("n2").cast("double")
    m1 = F.col("s1").cast("double") / n1d
    m2 = F.col("s2").cast("double") / n2d
    se1 = ((F.col("q1").cast("double")
            - F.col("s1").cast("double") * F.col("s1").cast("double") / n1d)
           / (n1d - 1.0) / n1d)
    se2 = ((F.col("q2").cast("double")
            - F.col("s2").cast("double") * F.col("s2").cast("double") / n2d)
           / (n2d - 1.0) / n2d)
    d = s.select("n1", "n2", m1.alias("m1"), m2.alias("m2"),
                 se1.alias("se1"), se2.alias("se2"))
    se1c, se2c = F.col("se1"), F.col("se2")
    return d.select(
        "n1", "n2",
        F.round((F.col("m1") - F.col("m2")) / 100.0, 4).alias("mean_diff"),
        F.round((F.col("m1") - F.col("m2")) / F.sqrt(se1c + se2c), 4)
        .alias("t_stat"),
        F.round((se1c + se2c) * (se1c + se2c)
                / (se1c * se1c / (F.col("n1").cast("double") - 1.0)
                   + se2c * se2c / (F.col("n2").cast("double") - 1.0)), 2)
        .alias("welch_df"))


@query(
    "ml4_ridge_regression",
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
               SUM(CAST(x2 * y AS HUGEINT)) AS s2y
        FROM rows_i
    ), d AS (
        SELECT n, CAST(n AS DOUBLE) AS nd,
               CAST(s1 AS DOUBLE) AS s1d, CAST(s2 AS DOUBLE) AS s2d,
               CAST(s11 AS DOUBLE) AS s11d, CAST(s22 AS DOUBLE) AS s22d,
               CAST(s12 AS DOUBLE) AS s12d, CAST(sy AS DOUBLE) AS syd,
               CAST(s1y AS DOUBLE) AS s1yd, CAST(s2y AS DOUBLE) AS s2yd
        FROM s
    ), m AS (
        SELECT n, nd, s1d, s2d, syd,
               s11d - s1d * s1d / nd + 1000.0 AS a11,
               s22d - s2d * s2d / nd + 1000.0 AS a22,
               s12d - s1d * s2d / nd AS a12,
               s1yd - s1d * syd / nd AS c1,
               s2yd - s2d * syd / nd AS c2
        FROM d
    ), coef AS (
        SELECT n, nd, s1d, s2d, syd,
               (c1 * a22 - c2 * a12) / (a11 * a22 - a12 * a12) AS b1,
               (a11 * c2 - a12 * c1) / (a11 * a22 - a12 * a12) AS b2
        FROM m
    )
    SELECT n,
           ROUND((syd - b1 * s1d - b2 * s2d) / nd / 100.0, 4) AS intercept,
           ROUND(b1 / 100.0, 6) AS coef_quantity,
           ROUND(b2 / 100.0, 6) AS coef_discount_pct
    FROM coef
    """,
)
def ml4_ridge_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ridge (L2-penalized) regression in closed form: price ~
    quantity + discount on CENTERED predictors with lambda = 1000
    added to the centered Gram diagonal, intercept recovered
    unpenalized — the textbook ridge convention. Identical
    sufficient-stats discipline as ml3 (exact integer sums,
    decimal(38)/HUGEINT accumulators, doubles only in the 2x2
    Cramer solve written with the same op order in both engines);
    with lambda -> 0 this reproduces ml3's OLS coefficients, which
    the ml/ module's tests pin independently."""
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
        F.sum((F.col("x2") * F.col("y")).cast(dec)).alias("s2y"))
    d = s.select(
        "n", F.col("n").cast("double").alias("nd"),
        F.col("s1").cast("double").alias("s1d"),
        F.col("s2").cast("double").alias("s2d"),
        F.col("s11").cast("double").alias("s11d"),
        F.col("s22").cast("double").alias("s22d"),
        F.col("s12").cast("double").alias("s12d"),
        F.col("sy").cast("double").alias("syd"),
        F.col("s1y").cast("double").alias("s1yd"),
        F.col("s2y").cast("double").alias("s2yd"))
    nd = F.col("nd")
    m = d.select(
        "n", "nd", "s1d", "s2d", "syd",
        (F.col("s11d") - F.col("s1d") * F.col("s1d") / nd + 1000.0)
        .alias("a11"),
        (F.col("s22d") - F.col("s2d") * F.col("s2d") / nd + 1000.0)
        .alias("a22"),
        (F.col("s12d") - F.col("s1d") * F.col("s2d") / nd).alias("a12"),
        (F.col("s1yd") - F.col("s1d") * F.col("syd") / nd).alias("c1"),
        (F.col("s2yd") - F.col("s2d") * F.col("syd") / nd).alias("c2"))
    det = (F.col("a11") * F.col("a22") - F.col("a12") * F.col("a12"))
    coef = m.select(
        "n", "nd", "s1d", "s2d", "syd",
        ((F.col("c1") * F.col("a22") - F.col("c2") * F.col("a12")) / det)
        .alias("b1"),
        ((F.col("a11") * F.col("c2") - F.col("a12") * F.col("c1")) / det)
        .alias("b2"))
    return coef.select(
        "n",
        F.round((F.col("syd") - F.col("b1") * F.col("s1d")
                 - F.col("b2") * F.col("s2d")) / F.col("nd") / 100.0, 4)
        .alias("intercept"),
        F.round(F.col("b1") / 100.0, 6).alias("coef_quantity"),
        F.round(F.col("b2") / 100.0, 6).alias("coef_discount_pct"))
