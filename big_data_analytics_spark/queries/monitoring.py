"""Model- and data-monitoring operators: calibration reliability,
population-stability drift, and concentration (Gini/Lorenz) — the
metrics a production scoring pipeline recomputes on every batch.
All exact-count based with quantized transcendental sums (the ml9
discipline), so every number is engine- and partitioning-identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from big_data_analytics_spark.catalog import load_table
from big_data_analytics_spark.queries import query

_Q = 1e12  # quantization grid for ln-term sums

# --------------------------------------------------------------------
# cal1 — calibration reliability diagram for a probabilistic score
# --------------------------------------------------------------------

_CAL_ORACLE = """
    WITH r AS (
        SELECT CAST(FLOOR(l_discount * 100.0 + 0.5) AS BIGINT) AS dc,
               CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y
        FROM lineitem
    ), probs AS (
        -- the "model": P(return | discount) estimated on the SAME
        -- relation (self-calibration audit): bin = discount cents
        SELECT dc, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(y) AS BIGINT) AS pos
        FROM r GROUP BY dc
    )
    SELECT dc AS bin,
           n AS n_rows,
           ROUND(CAST(pos AS DOUBLE) / n, 6) AS observed_rate,
           ROUND(CAST(SUM(pos) OVER () AS DOUBLE)
                 / CAST(SUM(n) OVER () AS DOUBLE), 6) AS base_rate,
           ROUND(CAST(pos AS DOUBLE) / n
                 - CAST(SUM(pos) OVER () AS DOUBLE)
                   / CAST(SUM(n) OVER () AS DOUBLE), 6) AS lift
    FROM probs ORDER BY bin
"""


@query("cal1_reliability_diagram", oracle=_CAL_ORACLE)
def cal1_reliability_diagram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calibration / reliability table for the discount→return-rate
    relationship: per score bin the observed event rate, the global
    base rate, and the lift — what a scoring pipeline recomputes per
    batch to detect mis-calibration (the diagonal-deviation plot's
    data). Exact integer counts throughout; the rates are single
    rounded divisions.

    One mergeable groupBy(bin) histogram; the global totals are
    unpartitioned window sums over the |bins| relation (11 rows) —
    histogram-first, so the audit costs one scan at any scale."""
    li = load_table(spark, sf_dir, "lineitem").select(
        F.floor(F.col("l_discount") * 100.0 + 0.5).cast("long")
        .alias("dc"),
        F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("y"))
    probs = li.groupBy("dc").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("y").cast("long").alias("pos"))
    w = Window.partitionBy()
    base = (F.sum("pos").over(w).cast("double")
            / F.sum("n").over(w).cast("double"))
    obs = F.col("pos").cast("double") / F.col("n").cast("double")
    return (probs.select(
        F.col("dc").alias("bin"), F.col("n").alias("n_rows"),
        F.round(obs, 6).alias("observed_rate"),
        F.round(base, 6).alias("base_rate"),
        F.round(obs - base, 6).alias("lift"))
        .orderBy("bin"))


# --------------------------------------------------------------------
# dr1 — population stability index between time periods
# --------------------------------------------------------------------

_PSI_ORACLE = f"""
    WITH r AS (
        SELECT CAST(l_quantity AS BIGINT) // 10 AS bin,
               CASE WHEN epoch_us(l_shipdate) <
                        (SELECT epoch_us(MIN(l_shipdate))
                             + (epoch_us(MAX(l_shipdate))
                                - epoch_us(MIN(l_shipdate))) // 2
                         FROM lineitem)
                    THEN 0 ELSE 1 END AS period
        FROM lineitem
    ), h AS (
        SELECT bin,
               CAST(SUM(CASE WHEN period = 0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS na,
               CAST(SUM(CASE WHEN period = 1 THEN 1 ELSE 0 END)
                    AS BIGINT) AS nb
        FROM r GROUP BY bin
    ), tot AS (
        SELECT CAST(SUM(na) AS BIGINT) AS ta,
               CAST(SUM(nb) AS BIGINT) AS tb FROM h
    ), terms AS (
        SELECT h.bin, h.na, h.nb,
               CAST(FLOOR((CAST(h.na AS DOUBLE) / ta
                           - CAST(h.nb AS DOUBLE) / tb)
                    * ln((CAST(h.na AS DOUBLE) / ta)
                         / (CAST(h.nb AS DOUBLE) / tb))
                    * {_Q}) AS BIGINT) AS tq
        FROM h, tot WHERE h.na > 0 AND h.nb > 0
    )
    SELECT CAST(SUM(na) AS BIGINT) AS n_baseline,
           CAST(SUM(nb) AS BIGINT) AS n_current,
           CAST(COUNT(*) AS BIGINT) AS n_bins,
           ROUND(CAST(SUM(tq) AS DOUBLE) / {_Q}, 6) AS psi
    FROM terms
"""


@query("dr1_psi_drift", oracle=_PSI_ORACLE)
def dr1_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population stability index of the quantity distribution
    between the first and second halves of the shipping-date span —
    the standard drift alarm (PSI > 0.2 conventionally triggers
    retraining). PSI = sum (p_a - p_b) ln(p_a / p_b) over bins; each
    bin's term is floor-quantized to the 1e-12 grid and summed
    exactly, so the alarm value is partitioning-independent.

    Two scans (the split point needs the date range) reducible to
    one with a known boundary; the bin histogram is one mergeable
    aggregate with conditional sums — drift monitoring at 100 TB
    costs a count(*)."""
    li = load_table(spark, sf_dir, "lineitem").select(
        (F.col("l_quantity").cast("long") / 10).cast("long")
        .alias("bin"), "l_shipdate")
    b = li.agg(F.min("l_shipdate").alias("lo"),
               F.max("l_shipdate").alias("hi"))
    # midpoint via epoch microseconds (identical to DuckDB's
    # timestamp arithmetic: lo + (hi - lo)/2 with microsecond ticks)
    mid = (F.unix_micros(F.col("lo"))
           + F.floor((F.unix_micros(F.col("hi"))
                      - F.unix_micros(F.col("lo"))) / 2).cast("long"))
    h = (li.crossJoin(F.broadcast(b.select(mid.alias("mid"))))
         .select("bin",
                 F.when(F.unix_micros(F.col("l_shipdate"))
                        < F.col("mid"), 0).otherwise(1).alias("period"))
         .groupBy("bin")
         .agg(F.sum(F.when(F.col("period") == 0, 1).otherwise(0))
              .cast("long").alias("na"),
              F.sum(F.when(F.col("period") == 1, 1).otherwise(0))
              .cast("long").alias("nb")))
    tot = h.agg(F.sum("na").cast("long").alias("ta"),
                F.sum("nb").cast("long").alias("tb"))
    pa = F.col("na").cast("double") / F.col("ta")
    pb = F.col("nb").cast("double") / F.col("tb")
    terms = (h.crossJoin(F.broadcast(tot))
             .filter((F.col("na") > 0) & (F.col("nb") > 0))
             .select("na", "nb",
                     F.floor((pa - pb) * F.log(pa / pb) * _Q)
                     .cast("long").alias("tq")))
    return terms.agg(
        F.sum("na").cast("long").alias("n_baseline"),
        F.sum("nb").cast("long").alias("n_current"),
        F.count("*").cast("long").alias("n_bins"),
        F.round(F.sum("tq").cast("double") / _Q, 6).alias("psi"))


# --------------------------------------------------------------------
# ec1 — revenue concentration: Gini coefficient + top-decile share
# --------------------------------------------------------------------

_GINI_ORACLE = """
    WITH cust AS (
        SELECT o_custkey,
               CAST(SUM(CAST(FLOOR(o_totalprice * 100.0 + 0.5)
                             AS BIGINT)) AS BIGINT) AS rev
        FROM orders GROUP BY o_custkey
    ), ranked AS (
        SELECT rev,
               ROW_NUMBER() OVER (ORDER BY rev, o_custkey) AS i,
               COUNT(*) OVER () AS n,
               CAST(SUM(rev) OVER () AS BIGINT) AS tot
        FROM cust
    )
    SELECT CAST(MAX(n) AS BIGINT) AS n_customers,
           ROUND(CAST(SUM((2 * i - n - 1) * rev) AS DOUBLE)
                 / (CAST(MAX(n) AS DOUBLE) * MAX(tot)), 6) AS gini,
           ROUND(CAST(SUM(CASE WHEN i > n - n // 10 THEN rev
                          ELSE 0 END) AS DOUBLE)
                 / MAX(tot), 6) AS top_decile_share
    FROM ranked
"""


@query("ec1_revenue_gini", oracle=_GINI_ORACLE)
def ec1_revenue_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue concentration across customers: exact Gini coefficient
    (sum (2i - n - 1) r_i / (n * total) over revenue-ranked
    customers, ties broken by key) and the top-decile revenue share —
    the whale-curve numbers every commerce dashboard carries. All
    sums are exact integer cents; the two output ratios are single
    rounded divisions.

    The total order ranks the PER-CUSTOMER aggregate, not the fact
    table — the orders scan reduces by a keyed mergeable groupBy
    first, so the window input is |customers|. At extreme customer
    cardinality the two-level stitched rank (t9/w12) replaces the
    single window; the concentration math is unchanged."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        F.floor(F.col("o_totalprice") * 100.0 + 0.5).cast("long")
        .alias("cents"))
    cust = o.groupBy("o_custkey").agg(
        F.sum("cents").cast("long").alias("rev"))
    w = Window.orderBy("rev", "o_custkey")
    wall = Window.partitionBy()
    ranked = cust.select(
        "rev",
        F.row_number().over(w).alias("i"),
        F.count("*").over(wall).alias("n"),
        F.sum("rev").over(wall).cast("long").alias("tot"))
    return ranked.agg(
        F.max("n").cast("long").alias("n_customers"),
        F.round(F.sum((2 * F.col("i") - F.col("n") - 1) * F.col("rev"))
                .cast("double")
                / (F.max("n").cast("double")
                   * F.max("tot").cast("double")), 6).alias("gini"),
        F.round(F.sum(F.when(
            F.col("i") > F.col("n") - (F.col("n") / 10).cast("long"),
            F.col("rev")).otherwise(0)).cast("double")
            / F.max("tot").cast("double"), 6)
        .alias("top_decile_share"))
