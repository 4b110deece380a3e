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
