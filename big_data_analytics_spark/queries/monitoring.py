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
from big_data_analytics_spark.operators.joins import sized_side
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
    first (checkpointed once, so the rank and the totals share one
    materialization). The rank itself is the two-level stitched
    row number (operators/ranking.py): range-bucket on revenue via
    one percentile_approx pass, rank within buckets, stitch offsets
    — no single-task sort at any customer cardinality. n and total
    revenue come from a plain 1-row aggregate broadcast back, not
    from unpartitioned COUNT/SUM windows."""
    from big_data_analytics_spark.operators.ranking import (
        stitched_row_number,
    )

    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        F.floor(F.col("o_totalprice") * 100.0 + 0.5).cast("long")
        .alias("cents"))
    cust = o.groupBy("o_custkey").agg(
        F.sum("cents").cast("long").alias("rev")).localCheckpoint()
    tots = cust.agg(F.count(F.lit(1)).cast("long").alias("n"),
                    F.sum("rev").cast("long").alias("tot"))
    ranked = (stitched_row_number(cust, "rev", ["o_custkey"], out="i")
              .crossJoin(F.broadcast(tots))
              .select("rev", "i", "n", "tot"))
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


# --------------------------------------------------------------------
# seg1 — RFM customer segmentation
# --------------------------------------------------------------------

_RFM_ORACLE = """
    WITH cust AS (
        SELECT o_custkey,
               CAST(MAX(epoch_us(o_orderdate)) AS BIGINT) AS last_us,
               CAST(COUNT(*) AS BIGINT) AS freq,
               CAST(SUM(CAST(FLOOR(o_totalprice * 100.0 + 0.5)
                             AS BIGINT)) AS BIGINT) AS monetary
        FROM orders GROUP BY o_custkey
    ), scored AS (
        SELECT o_custkey,
               CAST(NTILE(5) OVER (ORDER BY last_us, o_custkey)
                    AS BIGINT) AS r,
               CAST(NTILE(5) OVER (ORDER BY freq, o_custkey)
                    AS BIGINT) AS f,
               CAST(NTILE(5) OVER (ORDER BY monetary, o_custkey)
                    AS BIGINT) AS m,
               monetary
        FROM cust
    )
    SELECT CASE
             WHEN r >= 4 AND f >= 4 AND m >= 4 THEN 'champion'
             WHEN r >= 4 AND f >= 3 THEN 'loyal'
             WHEN r >= 4 THEN 'recent'
             WHEN r <= 2 AND f >= 4 THEN 'at_risk'
             WHEN r <= 2 AND f <= 2 THEN 'hibernating'
             ELSE 'regular' END AS segment,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(SUM(monetary) AS BIGINT) AS revenue_cents
    FROM scored GROUP BY segment ORDER BY segment
"""


@query("seg1_rfm_segmentation", oracle=_RFM_ORACLE)
def seg1_rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM (recency / frequency / monetary) customer segmentation —
    the reference project's core e-commerce analytics surface
    (/root/reference/spark_processing.py's customer aggregates,
    completed into the standard marketing segmentation): per-customer
    last-order time, order count, and exact revenue cents, quintile-
    scored with NTILE (ties broken by key), mapped to the
    conventional segment rules, rolled up to segment sizes and
    revenue. Every input to the quintile windows is an exact
    integer, so segment membership is engine-identical.

    The quintiles rank the per-customer AGGREGATE (|customers| rows,
    one keyed mergeable groupBy, checkpointed once) and each runs in
    the two-level stitched NTILE form (operators/ranking.py): range-
    bucket on the score via percentile_approx, rank within buckets,
    stitch offsets, NTILE as an integer formula — three bucket-
    partitioned windows instead of three single-task global sorts.
    The three quintile relations re-join on o_custkey (co-partitioned
    shuffles); the rule map is a pure expression; the rollup is 6
    groups."""
    from big_data_analytics_spark.operators.ranking import stitched_ntile

    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        F.unix_micros(F.col("o_orderdate")).alias("us"),
        F.floor(F.col("o_totalprice") * 100.0 + 0.5).cast("long")
        .alias("cents"))
    cust = o.groupBy("o_custkey").agg(
        F.max("us").cast("long").alias("last_us"),
        F.count("*").cast("long").alias("freq"),
        F.sum("cents").cast("long").alias("monetary")).localCheckpoint()
    r = stitched_ntile(cust, 5, "last_us", ["o_custkey"], out="r") \
        .select("o_custkey", "r")
    # freq has a handful of distinct values (order counts), so its tie
    # runs would collapse into as few buckets — tie_bucket splits each
    # run into custkey sub-ranges (operators/ranking.py heavy-tie mode)
    f = stitched_ntile(cust, 5, "freq", ["o_custkey"], out="f",
                       tie_bucket=True) \
        .select("o_custkey", "f")
    m = stitched_ntile(cust, 5, "monetary", ["o_custkey"], out="m") \
        .select("o_custkey", "m")
    # customer-sized relations throughout: pin the three quintile
    # attachments on the measured aggregate count (cheap — cust is
    # checkpoint-materialized) instead of derived-relation stats,
    # which mis-broadcast the monetary projection at the 10× audit;
    # past the ceiling these become the co-partitioned merges the
    # docstring describes
    from big_data_analytics_spark.operators.joins import sized_side

    n_cust = cust.count()
    scored = (cust.select("o_custkey", "monetary")
              .join(sized_side(r, n_cust), "o_custkey")
              .join(sized_side(f, n_cust), "o_custkey")
              .join(sized_side(m, n_cust), "o_custkey"))
    seg = (F.when((F.col("r") >= 4) & (F.col("f") >= 4)
                  & (F.col("m") >= 4), "champion")
           .when((F.col("r") >= 4) & (F.col("f") >= 3), "loyal")
           .when(F.col("r") >= 4, "recent")
           .when((F.col("r") <= 2) & (F.col("f") >= 4), "at_risk")
           .when((F.col("r") <= 2) & (F.col("f") <= 2), "hibernating")
           .otherwise("regular"))
    return (scored.select(seg.alias("segment"), "monetary")
            .groupBy("segment")
            .agg(F.count("*").cast("long").alias("n_customers"),
                 F.sum("monetary").cast("long").alias("revenue_cents"))
            .orderBy("segment"))


# --------------------------------------------------------------------
# ab1 — CUPED variance reduction for experiment readouts
# --------------------------------------------------------------------

_CUPED_ORACLE = f"""
    WITH mid AS (
        SELECT CAST((SELECT epoch_us(MIN(ts))
                     + (epoch_us(MAX(ts)) - epoch_us(MIN(ts))) // 2
                     FROM events) AS BIGINT) AS mid_us
    ), u AS (
        SELECT user_id,
               ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))
                   ::BIGINT % 2 AS grp,
               CAST(SUM(CASE WHEN epoch_us(ts) < mid_us THEN
                   CAST(FLOOR(value * 10000.0 + 0.5) AS BIGINT)
                   ELSE 0 END) AS BIGINT) AS x,
               CAST(SUM(CASE WHEN epoch_us(ts) >= mid_us THEN
                   CAST(FLOOR(value * 10000.0 + 0.5) AS BIGINT)
                   ELSE 0 END) AS BIGINT) AS y
        FROM events, mid GROUP BY user_id, grp
    ), s AS (
        SELECT COUNT(*) AS n,
               CAST(SUM(x) AS BIGINT) AS sx,
               CAST(SUM(y) AS BIGINT) AS sy,
               SUM(x * x) AS sxx, SUM(x * y) AS sxy,
               CAST(SUM(CASE WHEN grp = 1 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n1,
               CAST(SUM(CASE WHEN grp = 1 THEN y ELSE 0 END)
                    AS BIGINT) AS sy1,
               CAST(SUM(CASE WHEN grp = 1 THEN x ELSE 0 END)
                    AS BIGINT) AS sx1
        FROM u
    ), th AS (
        SELECT n, sx, sy, n1, sy1, sx1,
               (CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE)
                * CAST(sy AS DOUBLE) / n)
               / (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)
                  * CAST(sx AS DOUBLE) / n) AS theta
        FROM s
    )
    SELECT n AS n_users, n1 AS n_treatment,
           ROUND(theta, 6) AS theta,
           ROUND((CAST(sy1 AS DOUBLE) / n1
                  - CAST(sy - sy1 AS DOUBLE) / (n - n1)) / 10000.0, 6)
               AS raw_diff,
           ROUND(((CAST(sy1 AS DOUBLE) / n1
                   - theta * (CAST(sx1 AS DOUBLE) / n1
                              - CAST(sx AS DOUBLE) / n))
                  - (CAST(sy - sy1 AS DOUBLE) / (n - n1)
                     - theta * (CAST(sx - sx1 AS DOUBLE) / (n - n1)
                                - CAST(sx AS DOUBLE) / n)))
                 / 10000.0, 6) AS cuped_diff
    FROM th
"""


@query("ab1_cuped_adjustment", oracle=_CUPED_ORACLE)
def ab1_cuped_adjustment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED (controlled-experiment using pre-experiment data)
    variance reduction — the industry-standard A/B readout adjuster
    (Deng et al., public; extends st2's proportion test): users hash
    50/50 into arms, the pre-period per-user value sum is the
    covariate, theta = cov(x,y)/var(x) from exact integer sums, and
    the treatment effect is read out both raw and CUPED-adjusted
    (y - theta * (x - mean(x))). Every sufficient statistic is an
    exact integer; theta and both diffs are identical-op-order
    doubles rounded at the end.

    One keyed groupBy builds the per-user (pre, post) pairs; one
    9-stat mergeable aggregate fits theta AND both arms' means — the
    whole adjusted readout is two scans of events (one to find the
    period split), driver-free."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.unix_micros(F.col("ts")).alias("us"),
        F.floor(F.col("value") * 10000.0 + 0.5).cast("long")
        .alias("vq"))
    b = ev.agg(F.min("us").alias("lo"), F.max("us").alias("hi"))
    mid = (F.col("lo") + F.floor((F.col("hi") - F.col("lo")) / 2)
           .cast("long"))
    grp = (F.conv(F.substring(F.md5(F.col("user_id").cast("string")),
                              1, 8), 16, 10).cast("long") % 2)
    u = (ev.crossJoin(F.broadcast(b.select(mid.alias("mid_us"))))
         .groupBy("user_id")
         .agg(F.sum(F.when(F.col("us") < F.col("mid_us"),
                           F.col("vq")).otherwise(0)).cast("long")
              .alias("x"),
              F.sum(F.when(F.col("us") >= F.col("mid_us"),
                           F.col("vq")).otherwise(0)).cast("long")
              .alias("y"))
         .select(grp.alias("grp"), "x", "y"))
    g1 = (F.col("grp") == 1).cast("long")
    s = u.agg(
        F.count("*").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        # decimal(38,0) accumulators: x*x / x*y sums overflow BIGINT
        # at larger SFs while the DuckDB oracle promotes to HUGEINT —
        # same guard as ml19's syy handling.
        F.sum((F.col("x") * F.col("x")).cast("decimal(38,0)"))
        .alias("sxx"),
        F.sum((F.col("x") * F.col("y")).cast("decimal(38,0)"))
        .alias("sxy"),
        F.sum(g1).cast("long").alias("n1"),
        F.sum(g1 * F.col("y")).cast("long").alias("sy1"),
        F.sum(g1 * F.col("x")).cast("long").alias("sx1"))
    nd = F.col("n").cast("double")
    theta = ((F.col("sxy").cast("double")
              - F.col("sx").cast("double") * F.col("sy").cast("double")
              / nd)
             / (F.col("sxx").cast("double")
                - F.col("sx").cast("double") * F.col("sx").cast("double")
                / nd))
    n1d = F.col("n1").cast("double")
    n0d = (F.col("n") - F.col("n1")).cast("double")
    my1 = F.col("sy1").cast("double") / n1d
    my0 = (F.col("sy") - F.col("sy1")).cast("double") / n0d
    mx1 = F.col("sx1").cast("double") / n1d
    mx0 = (F.col("sx") - F.col("sx1")).cast("double") / n0d
    mx = F.col("sx").cast("double") / nd
    return s.select(
        F.col("n").alias("n_users"), F.col("n1").alias("n_treatment"),
        F.round(theta, 6).alias("theta"),
        F.round((my1 - my0) / 10000.0, 6).alias("raw_diff"),
        F.round(((my1 - theta * (mx1 - mx))
                 - (my0 - theta * (mx0 - mx))) / 10000.0, 6)
        .alias("cuped_diff"))


# --------------------------------------------------------------------
# tp1 — classification threshold tuning from the score histogram
# --------------------------------------------------------------------

_TP_ORACLE = """
    WITH r AS (
        SELECT CAST(FLOOR(l_discount * 100.0 + 0.5) AS BIGINT) AS s,
               CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y
        FROM lineitem
    ), h AS (
        SELECT s, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(y) AS BIGINT) AS pos
        FROM r GROUP BY s
    ), cum AS (
        SELECT s,
               CAST(SUM(n) OVER w AS BIGINT) AS n_ge,
               CAST(SUM(pos) OVER w AS BIGINT) AS tp,
               CAST(SUM(pos) OVER () AS BIGINT) AS p_tot
        FROM h
        WINDOW w AS (ORDER BY s DESC
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ), scored AS (
        SELECT s AS threshold, tp, n_ge - tp AS fp, p_tot - tp AS fn,
               ROUND(2.0 * CAST(tp AS DOUBLE)
                     / (CAST(n_ge AS DOUBLE) + CAST(p_tot AS DOUBLE)),
                     6) AS f1
        FROM cum
    )
    SELECT threshold, tp, fp, fn, f1 FROM (
        SELECT *, ROW_NUMBER() OVER (ORDER BY f1 DESC, threshold) AS rn
        FROM scored) WHERE rn = 1
"""


@query("tp1_threshold_tuning", oracle=_TP_ORACLE)
def tp1_threshold_tuning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Optimal classification threshold by F1 for the
    discount-as-score classifier (completes the M19 metrics family
    alongside ml13's AUC): ALL candidate thresholds are swept from
    one descending cumulative over the score histogram — TP/FP at
    threshold t are window sums, F1 = 2TP/(predicted + actual) is a
    rounded double, the argmax tiebreaks to the lower threshold.
    Exact counts everywhere.

    The ml8/ml13 histogram-first discipline: evaluating every
    threshold costs ONE scan + an 11-row window, not a scan per
    candidate — threshold tuning at 100 TB is free once the score
    histogram exists."""
    li = load_table(spark, sf_dir, "lineitem").select(
        F.floor(F.col("l_discount") * 100.0 + 0.5).cast("long")
        .alias("s"),
        F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("y"))
    h = li.groupBy("s").agg(F.count("*").cast("long").alias("n"),
                            F.sum("y").cast("long").alias("pos"))
    wd = (Window.orderBy(F.desc("s"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    wall = Window.partitionBy()
    cum = h.select(
        "s",
        F.sum("n").over(wd).cast("long").alias("n_ge"),
        F.sum("pos").over(wd).cast("long").alias("tp"),
        F.sum("pos").over(wall).cast("long").alias("p_tot"))
    f1 = F.round(2.0 * F.col("tp").cast("double")
                 / (F.col("n_ge").cast("double")
                    + F.col("p_tot").cast("double")), 6)
    scored = cum.select(
        F.col("s").alias("threshold"), "tp",
        (F.col("n_ge") - F.col("tp")).alias("fp"),
        (F.col("p_tot") - F.col("tp")).alias("fn"),
        f1.alias("f1"))
    wb = Window.orderBy(F.desc("f1"), F.asc("threshold"))
    return (scored.withColumn("rn", F.row_number().over(wb))
            .filter(F.col("rn") == 1).drop("rn"))


# --------------------------------------------------------------------
# pp1 — bigram-LM perplexity filtering (CCNet-style corpus curation)
# --------------------------------------------------------------------

_PP_TRAIN_FRAC_DOCS = 250  # doc_id < this trains the LM
_PP_TOP = 15


def _pp_oracle() -> str:
    return f"""
    WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ), big AS (
        SELECT doc_id, t[i] AS w1, t[i + 1] AS w2
        FROM toks, unnest(generate_series(1, len(t) - 1)) AS u(i)
    ), lm AS (
        SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c2
        FROM big WHERE doc_id < {_PP_TRAIN_FRAC_DOCS}
        GROUP BY w1, w2
    ), uni AS (
        SELECT w1, CAST(SUM(c2) AS BIGINT) AS c1 FROM lm GROUP BY w1
    ), vocab AS (
        SELECT CAST(COUNT(DISTINCT w1) AS BIGINT) AS v FROM lm
    ), scored AS (
        SELECT b.doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_bigrams,
               CAST(SUM(CAST(FLOOR(ln(
                   (CAST(COALESCE(lm.c2, 0) AS DOUBLE) + 1.0)
                   / (CAST(COALESCE(uni.c1, 0) AS DOUBLE) + v))
                   * 1000000000000.0) AS BIGINT)) AS BIGINT) AS lpq
        FROM big b
        LEFT JOIN lm ON b.w1 = lm.w1 AND b.w2 = lm.w2
        LEFT JOIN uni ON b.w1 = uni.w1, vocab
        WHERE b.doc_id >= {_PP_TRAIN_FRAC_DOCS}
        GROUP BY b.doc_id
    )
    SELECT doc_id, n_bigrams,
           ROUND(exp(-(CAST(lpq AS DOUBLE) / 1000000000000.0)
                     / n_bigrams), 4) AS perplexity
    FROM scored
    ORDER BY perplexity DESC, doc_id LIMIT {_PP_TOP}
"""


@query("pp1_perplexity_filter", oracle=_pp_oracle())
def pp1_perplexity_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perplexity filtering (CCNet / the standard LLM-corpus quality
    gate, public): train an add-one-smoothed bigram language model on
    the first {TR} documents, score every other document's
    perplexity under it, and surface the {TOP} most surprising
    documents — the ones a curation pipeline would drop or
    down-weight. Per-bigram log-probabilities are floor-quantized to
    the 1e-12 grid and summed exactly per document, so the ranking is
    partitioning-independent (exp/ln follow the t12 precedent under
    ROUND).

    Plan: the trained model is two mergeable count relations that
    join into the scoring pass. The model side is vocabulary-bounded,
    never corpus-bounded — but a bigram-type table still GROWS with
    the training slice (O(V²) worst case), so both attachments are
    measured-pinned: the bigram model is checkpointed (computed once,
    reused by uni/vocab/scoring), counted, and broadcast only under
    the ceiling (operators.joins.sized_side), falling back to a
    sort-merge join on the bigram key past it. At 100 TB this is
    exactly how perplexity gates run: model state bounded and pinned,
    corpus side embarrassingly parallel, one shuffle on doc_id."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.split(F.col("text"), " ").alias("t"))
    big = docs.select(
        "doc_id",
        F.explode(F.zip_with(
            F.slice(F.col("t"), 1, F.size("t") - 1),
            F.slice(F.col("t"), 2, F.size("t") - 1),
            lambda a, b: F.struct(a.alias("w1"), b.alias("w2"))))
        .alias("bg")).select("doc_id", "bg.w1", "bg.w2")
    lm = (big.filter(F.col("doc_id") < _PP_TRAIN_FRAC_DOCS)
          .groupBy("w1", "w2").agg(F.count("*").cast("long").alias("c2"))
          .localCheckpoint())
    n_lm = lm.count()  # cheap: checkpoint-materialized
    uni = lm.groupBy("w1").agg(F.sum("c2").cast("long").alias("c1"))
    vocab = lm.agg(F.countDistinct("w1").cast("long").alias("v"))
    lp = F.floor(
        F.log((F.coalesce(F.col("c2"), F.lit(0)).cast("double") + 1.0)
              / (F.coalesce(F.col("c1"), F.lit(0)).cast("double")
                 + F.col("v")))
        * 1_000_000_000_000.0).cast("long")
    scored = (big.filter(F.col("doc_id") >= _PP_TRAIN_FRAC_DOCS)
              .join(sized_side(lm, n_lm), ["w1", "w2"], "left")
              .join(sized_side(uni, n_lm), ["w1"], "left")
              .crossJoin(F.broadcast(vocab))
              .groupBy("doc_id")
              .agg(F.count("*").cast("long").alias("n_bigrams"),
                   F.sum(lp).cast("long").alias("lpq")))
    return (scored.select(
        "doc_id", "n_bigrams",
        F.round(F.exp(-(F.col("lpq").cast("double")
                        / 1_000_000_000_000.0)
                      / F.col("n_bigrams").cast("double")), 4)
        .alias("perplexity"))
        .orderBy(F.desc("perplexity"), F.asc("doc_id"))
        .limit(_PP_TOP))


pp1_perplexity_filter.__doc__ = pp1_perplexity_filter.__doc__.format(
    TR=_PP_TRAIN_FRAC_DOCS, TOP=_PP_TOP)


# --------------------------------------------------------------------
# wp1 — weighted percentiles (revenue-weighted quantity quantiles)
# --------------------------------------------------------------------

_WP_ORACLE = """
    WITH r AS (
        SELECT CAST(l_quantity AS BIGINT) AS v,
               CAST(FLOOR(l_extendedprice * 100.0 + 0.5) AS BIGINT) AS w
        FROM lineitem
    ), h AS (
        SELECT v, CAST(SUM(w) AS BIGINT) AS wv
        FROM r GROUP BY v
    ), cum AS (
        SELECT v, wv,
               CAST(SUM(wv) OVER (ORDER BY v
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS cw,
               CAST(SUM(wv) OVER () AS BIGINT) AS tw
        FROM h
    )
    SELECT p.pct,
           CAST(MIN(cum.v) AS BIGINT) AS weighted_quantile
    FROM (SELECT 25 AS pct UNION ALL SELECT 50 UNION ALL
          SELECT 75 UNION ALL SELECT 90) p
    JOIN cum ON cum.cw * 100 >= CAST(p.pct AS BIGINT) * cum.tw
    GROUP BY p.pct ORDER BY p.pct
"""


@query("wp1_weighted_percentiles", oracle=_WP_ORACLE)
def wp1_weighted_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue-WEIGHTED quantity percentiles (p25/50/75/90): the
    smallest quantity v such that lines with quantity <= v carry at
    least p% of total revenue — the weighted order statistic that
    plain percentiles (a8) and quantile sketches (sk3) don't answer.
    The inequality cw * 100 >= pct * tw is pure exact-integer
    arithmetic — no division, no rounding, no float comparison
    anywhere.

    Histogram-first: one groupBy(value) weight histogram (50 rows),
    one cumulative window over it, and a 4-row broadcast percentile
    probe — weighted quantiles at 100 TB cost one mergeable
    aggregate."""
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_quantity").cast("long").alias("v"),
        F.floor(F.col("l_extendedprice") * 100.0 + 0.5).cast("long")
        .alias("w"))
    h = li.groupBy("v").agg(F.sum("w").cast("long").alias("wv"))
    wc = (Window.orderBy("v")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    wall = Window.partitionBy()
    cum = h.select(
        "v",
        F.sum("wv").over(wc).cast("long").alias("cw"),
        F.sum("wv").over(wall).cast("long").alias("tw"))
    pcts = li.sparkSession.createDataFrame(
        [(25,), (50,), (75,), (90,)], "pct long")
    return (cum.join(F.broadcast(pcts),
                     F.col("cw") * 100 >= F.col("pct") * F.col("tw"))
            .groupBy("pct")
            .agg(F.min("v").cast("long").alias("weighted_quantile"))
            .orderBy("pct"))


# --------------------------------------------------------------------
# oc1 — maximum concurrency via the +1/-1 interval sweep
# --------------------------------------------------------------------

_OC_ORACLE = """
    WITH ev AS (
        SELECT user_id, ts, event_id,
               epoch_us(ts) AS us,
               LAG(epoch_us(ts)) OVER (PARTITION BY user_id
                   ORDER BY ts, event_id) AS prev_us
        FROM events
    ), flagged AS (
        SELECT user_id, us, event_id,
               CASE WHEN prev_us IS NOT NULL
                         AND us - prev_us <= 30 * 60 * 1000000
                    THEN 0 ELSE 1 END AS is_new
        FROM ev
    ), sess AS (
        SELECT user_id, sid,
               CAST(MIN(us) AS BIGINT) AS s,
               CAST(MAX(us) AS BIGINT) AS e
        FROM (
            SELECT user_id, us,
                   SUM(is_new) OVER (PARTITION BY user_id
                       ORDER BY us, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING
                       AND CURRENT ROW) AS sid
            FROM flagged)
        GROUP BY user_id, sid
    ), pts AS (
        SELECT s AS t, 1 AS d FROM sess
        UNION ALL
        SELECT e + 1, -1 FROM sess
    ), sweep AS (
        SELECT t,
               CAST(SUM(d) OVER (ORDER BY t, d
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS live
        FROM pts
    )
    SELECT CAST((SELECT COUNT(*) FROM sess) AS BIGINT) AS n_sessions,
           CAST(MAX(live) AS BIGINT) AS max_concurrent,
           CAST(MIN(t) FILTER (live = (SELECT MAX(live) FROM sweep))
                AS BIGINT) AS first_peak_us
    FROM sweep
"""


@query("oc1_max_concurrency", oracle=_OC_ORACLE)
def oc1_max_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak simultaneous sessions via the classic +1/-1 interval
    sweep: sessionize (w7's exact 30-minute-gap semantics), emit a
    +1 point at each session start and a -1 just after each end,
    and the running sum's maximum is the concurrency high-water mark
    (first time it is reached reported in epoch micros). Capacity
    planning's fundamental query, all exact integers (ties in the
    sweep order resolve by (t, d) so ends-before-starts at the same
    microsecond never inflate the peak... d=-1 sorts before +1).

    The sweep's total order runs over SESSION ENDPOINTS (2 rows per
    session, ~19k at sf0.1), not events — sessionization reduces
    first (and checkpoints once, so the endpoint relation is not
    re-sessionized per consumer). The running sum itself is the
    two-level stitched cumsum (operators/ranking.py): range-bucket
    on t via one percentile_approx pass, per-bucket +1/-1 sums
    prefix-stitched over the tiny bucket relation, cumulative window
    partitioned by bucket — no single-task sweep at any session
    count; the sweep algebra (d=-1 sorts before +1 at equal t) is
    unchanged."""
    from big_data_analytics_spark.operators.ranking import stitched_cumsum

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    us = F.unix_micros(F.col("ts"))
    prev_us = F.lag(us).over(w)
    is_new = F.when(us - prev_us <= 30 * 60 * 1_000_000, 0).otherwise(1)
    sess = (ev.withColumn("us", us)
            .withColumn("is_new", is_new)
            .withColumn("sid", F.sum("is_new").over(cum))
            .groupBy("user_id", "sid")
            .agg(F.min("us").cast("long").alias("s"),
                 F.max("us").cast("long").alias("e"))).localCheckpoint()
    pts = (sess.select(F.col("s").alias("t"),
                       F.lit(1).cast("long").alias("d"))
           .unionByName(sess.select((F.col("e") + 1).alias("t"),
                                    F.lit(-1).cast("long").alias("d"))))
    sweep = (stitched_cumsum(pts, "t", ["d"], val="d", out="live")
             .select("t", "live"))
    n_sessions = sess.agg(F.count("*").cast("long").alias("n_sessions"))
    peak = sweep.agg(F.max("live").cast("long").alias("max_concurrent"))
    first = (sweep.join(F.broadcast(peak),
                        F.col("live") == F.col("max_concurrent"))
             .agg(F.min("t").cast("long").alias("first_peak_us"),
                  F.max("live").cast("long").alias("max_concurrent")))
    return (n_sessions.crossJoin(F.broadcast(first))
            .select("n_sessions", "max_concurrent", "first_peak_us"))


# --------------------------------------------------------------------
# cal2 — Brier score + Murphy decomposition (REL - RES + UNC)
# --------------------------------------------------------------------

_BRIER_Q = 1_000_000  # component micro-grid (1e-6 of a Brier unit)


@query(
    "cal2_brier_decomposition",
    oracle=f"""
    WITH r AS (
        SELECT CAST(FLOOR(l_discount * 100.0 + 0.5) AS BIGINT) AS dc,
               CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y
        FROM lineitem
    ), bins AS (
        SELECT dc, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(y) AS BIGINT) AS pos
        FROM r GROUP BY dc
    ), tot AS (
        SELECT CAST(SUM(n) AS BIGINT) AS nt,
               CAST(SUM(pos) AS BIGINT) AS post,
               CAST(FLOOR({_BRIER_Q} * SUM(pos) / SUM(n)) AS BIGINT)
                   AS obar_q
        FROM bins
    ), q AS (
        SELECT b.dc, b.n, b.pos,
               dc * 10000 AS pb_q,
               CAST(FLOOR({_BRIER_Q} * b.pos / b.n) AS BIGINT) AS ob_q
        FROM bins b
    ), terms AS (
        -- divide the squared micro-gap by the grid FIRST: n * d^2
        -- would overflow int64 past ~1e7 rows per bin
        SELECT
            CAST(SUM(n * ((pb_q - ob_q) * (pb_q - ob_q) // {_BRIER_Q})
                     // nt) AS BIGINT) AS rel_q,
            CAST(SUM(n * ((ob_q - obar_q) * (ob_q - obar_q)
                          // {_BRIER_Q}) // nt) AS BIGINT) AS res_q,
            CAST(SUM(pos * (dc - 100) * (dc - 100)
                     + (n - pos) * dc * dc) AS BIGINT) AS brier_raw
        FROM q, tot
    )
    SELECT t.nt AS n_rows, t.obar_q,
           CAST(CAST({_BRIER_Q} AS HUGEINT) * tm.brier_raw
                // (10000 * t.nt) AS BIGINT) AS brier_q,
           tm.rel_q, tm.res_q,
           CAST(t.obar_q * ({_BRIER_Q} - t.obar_q) // {_BRIER_Q}
               AS BIGINT) AS unc_q,
           CAST(CAST({_BRIER_Q} AS HUGEINT) * tm.brier_raw
                // (10000 * t.nt)
                - (tm.rel_q - tm.res_q
                   + t.obar_q * ({_BRIER_Q} - t.obar_q) // {_BRIER_Q})
               AS BIGINT) AS decomp_gap_q
    FROM tot t, terms tm
    """,
)
def cal2_brier_decomposition(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    """Brier score with the Murphy decomposition — the one-number
    upgrade over cal1's reliability diagram: treating the discount
    (in cents, an exact 1e-2-grid forecast) as the predicted return
    probability and returnflag = 'R' as the outcome, Brier =
    reliability - resolution + uncertainty, where reliability
    punishes mis-calibration, resolution rewards bins that separate
    outcomes, and uncertainty is the outcome's intrinsic variance.
    A scoring pipeline alerts on reliability drift (cal1 shows WHERE,
    cal2 gives the tracked scalar).

    Portability: per-bin rates are floor-quantized to the 1e-6 grid
    FIRST, each decomposition term is one integer floor expression
    over those quantized values (order-free sums — the ml9
    discipline), and the raw Brier is an exact integer count
    formula: sum over bins of pos*(dc-100)^2 + (n-pos)*dc^2 in
    1e-4 units. The decomposition identity then holds only up to
    quantization; decomp_gap_q REPORTS that gap explicitly (a few
    micro-units, identical on both engines) rather than hiding it.

    Scale shape: one map-side-combinable groupBy onto <= 11 discount
    bins; everything after is constant work on the bin relation. A
    single scan at any corpus size."""
    li = load_table(spark, sf_dir, "lineitem").select(
        F.floor(F.col("l_discount") * 100.0 + 0.5).cast("long")
        .alias("dc"),
        F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("y"))
    bins = (li.groupBy("dc")
            .agg(F.count(F.lit(1)).cast("long").alias("n"),
                 F.sum("y").cast("long").alias("pos")))
    tot = bins.agg(
        F.sum("n").cast("long").alias("nt"),
        F.sum("pos").cast("long").alias("post"),
        F.floor(F.lit(_BRIER_Q) * F.sum("pos") / F.sum("n"))
        .cast("long").alias("obar_q"))
    q = (bins.crossJoin(F.broadcast(tot))
         .select("dc", "n", "pos", "nt", "obar_q",
                 (F.col("dc") * 10000).alias("pb_q"),
                 F.floor(F.lit(_BRIER_Q) * F.col("pos") / F.col("n"))
                 .cast("long").alias("ob_q")))
    terms = q.agg(
        # grid-divide the squared micro-gap first (int64 headroom at
        # any bin size; mirrored in the oracle)
        F.sum(F.expr(f"n * ((pb_q - ob_q) * (pb_q - ob_q) "
                     f"div {_BRIER_Q}) div nt")).cast("long")
        .alias("rel_q"),
        F.sum(F.expr(f"n * ((ob_q - obar_q) * (ob_q - obar_q) "
                     f"div {_BRIER_Q}) div nt")).cast("long")
        .alias("res_q"),
        F.sum(F.expr("pos * (dc - 100) * (dc - 100) "
                     "+ (n - pos) * dc * dc")).cast("long")
        .alias("brier_raw"))
    brier_q = F.expr(
        f"cast({_BRIER_Q} as decimal(38,0)) * brier_raw "
        f"div (10000 * nt)")
    unc_q = F.expr(f"obar_q * ({_BRIER_Q} - obar_q) div {_BRIER_Q}")
    return (tot.crossJoin(F.broadcast(terms))
            .select(F.col("nt").alias("n_rows"), "obar_q",
                    brier_q.cast("long").alias("brier_q"),
                    "rel_q", "res_q",
                    unc_q.cast("long").alias("unc_q"),
                    (brier_q - (F.col("rel_q") - F.col("res_q") + unc_q))
                    .cast("long").alias("decomp_gap_q")))
