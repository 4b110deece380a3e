"""Data-governance checks a training-data platform runs before a
corpus or customer extract leaves the pipeline — the standard
privacy ladder over quasi-identifier classes: k-anonymity (gov1),
l-diversity (gov2), t-closeness (gov3). Reference parity: none — the
reference repo has no governance surface; this is LLM-pipeline
extension surface (privacy review of exported training extracts).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from big_data_analytics_spark.catalog import load_table
from big_data_analytics_spark.queries import query

_K_ANON = 5                  # the k in k-anonymity
_RISK_Q = 1_000_000_000      # re-identification risk grid (1/n)


@query(
    "gov1_k_anonymity",
    oracle=f"""
    SELECT c_nationkey,
           c_mktsegment,
           CAST(FLOOR(c_acctbal / 1000.0) AS BIGINT) AS bal_band,
           CAST(COUNT(*) AS BIGINT) AS n,
           COUNT(*) >= {_K_ANON} AS is_k_anonymous,
           CAST({_RISK_Q} // COUNT(*) AS BIGINT) AS risk_q
    FROM customer
    GROUP BY 1, 2, 3
    """,
)
def gov1_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit of the customer extract under the quasi-
    identifier tuple (nation, market segment, account-balance
    band-of-1000) — the standard privacy pre-flight for any table
    that leaves the platform: a record is k-anonymous iff at least k
    records share its full quasi-identifier combination, so every
    equivalence class with n < {K} marks rows an adversary could
    re-identify by joining public attributes. Emits every class with
    its size, the k={K} verdict, and the worst-case re-identification
    probability 1/n floor-quantized to the 1e-9 grid (integer
    division — no IEEE anywhere). The consumer's suppression list is
    the is_k_anonymous = false classes; generalization tuning (wider
    bands) re-runs the same query with a different band width.

    Scale shape: one map-side-combinable groupBy on three bounded-
    cardinality derived keys (|nations| x |segments| x |bands| —
    thousands of classes regardless of row count), so the exchange
    carries only partial counts: the A1 aggregation shape. At 100 TB
    this is a single scan with a constant-size shuffle; the band
    derivation is a codegen'd floor, and no join, window, or
    data-sized relation appears anywhere."""
    cust = load_table(spark, sf_dir, "customer")
    return (cust.groupBy(
        "c_nationkey", "c_mktsegment",
        F.floor(F.col("c_acctbal") / 1000.0).cast("long")
        .alias("bal_band"))
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .select("c_nationkey", "c_mktsegment", "bal_band", "n",
                (F.col("n") >= _K_ANON).alias("is_k_anonymous"),
                F.expr(f"{_RISK_Q} div n").cast("long")
                .alias("risk_q")))


gov1_k_anonymity.__doc__ = gov1_k_anonymity.__doc__.format(K=_K_ANON)


_L_DIVERSE = 3  # the l in l-diversity


@query(
    "gov2_l_diversity",
    oracle=f"""
    WITH cls AS (
        SELECT c_nationkey,
               CAST(FLOOR(c_acctbal / 1000.0) AS BIGINT) AS bal_band,
               c_mktsegment,
               CAST(COUNT(*) AS BIGINT) AS seg_n
        FROM customer GROUP BY 1, 2, 3
    )
    SELECT c_nationkey, bal_band,
           CAST(SUM(seg_n) AS BIGINT) AS n,
           CAST(COUNT(*) AS BIGINT) AS l_distinct,
           COUNT(*) >= {_L_DIVERSE} AS is_l_diverse,
           CAST(FLOOR({_RISK_Q} * MAX(seg_n) / SUM(seg_n)) AS BIGINT)
               AS max_seg_share_q
    FROM cls GROUP BY 1, 2
    """,
)
def gov2_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity audit — the standard strengthening of k-anonymity
    (Machanavajjhala et al. 2007): a quasi-identifier class can be
    large (k-anonymous) yet still leak the SENSITIVE attribute if
    every member shares one value, so each (nation, balance-band)
    class is graded on how many distinct market segments (the
    sensitive attribute here) it contains and on the dominant
    segment's share (the homogeneity-attack success probability,
    floor-quantized to the 1e-9 grid). Classes with l_distinct <
    {L} need generalization or suppression before export.

    Scale shape: two chained map-side-combinable aggregations — per
    (class, segment) counts, then the per-class rollup (COUNT = the
    distinct-segment count because the first groupBy already
    deduplicated) — over bounded-cardinality keys; no join, no
    window, no DISTINCT Expand. The gov1 shape with one extra
    combine level."""
    cust = load_table(spark, sf_dir, "customer")
    cls = (cust.groupBy(
        "c_nationkey",
        F.floor(F.col("c_acctbal") / 1000.0).cast("long")
        .alias("bal_band"),
        "c_mktsegment")
        .agg(F.count(F.lit(1)).cast("long").alias("seg_n")))
    return (cls.groupBy("c_nationkey", "bal_band")
            .agg(F.sum("seg_n").cast("long").alias("n"),
                 F.count(F.lit(1)).cast("long").alias("l_distinct"),
                 F.max("seg_n").alias("max_seg"))
            .select("c_nationkey", "bal_band", "n", "l_distinct",
                    (F.col("l_distinct") >= _L_DIVERSE)
                    .alias("is_l_diverse"),
                    F.floor(F.lit(_RISK_Q) * F.col("max_seg")
                            / F.col("n")).cast("long")
                    .alias("max_seg_share_q")))


gov2_l_diversity.__doc__ = gov2_l_diversity.__doc__.format(L=_L_DIVERSE)


_T_CLOSE_Q = 200_000_000  # t = 0.2 on the 1e-9 grid


@query(
    "gov3_t_closeness",
    oracle=f"""
    WITH cls_seg AS (
        SELECT c_nationkey,
               CAST(FLOOR(c_acctbal / 1000.0) AS BIGINT) AS bal_band,
               c_mktsegment,
               CAST(COUNT(*) AS BIGINT) AS seg_n
        FROM customer GROUP BY 1, 2, 3
    ), cls AS (
        SELECT c_nationkey, bal_band, CAST(SUM(seg_n) AS BIGINT) AS n
        FROM cls_seg GROUP BY 1, 2
    ), gseg AS (
        SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS g
        FROM customer GROUP BY 1
    ), tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS nt FROM customer),
    terms AS (
        SELECT u.c_nationkey, u.bal_band, u.n, t.nt,
               ABS(COALESCE(s.seg_n, 0) * CAST(t.nt AS HUGEINT)
                   - u.g * CAST(u.n AS HUGEINT)) AS term
        FROM (SELECT cls.*, gseg.c_mktsegment, gseg.g
              FROM cls, gseg) u
        LEFT JOIN cls_seg s
          ON s.c_nationkey = u.c_nationkey
         AND s.bal_band = u.bal_band
         AND s.c_mktsegment = u.c_mktsegment,
        tot t
    )
    SELECT c_nationkey, bal_band, n,
           CAST((CAST({_RISK_Q} AS HUGEINT) * SUM(term))
                // (2 * CAST(n AS HUGEINT) * nt) AS BIGINT) AS tvd_q,
           (CAST({_RISK_Q} AS HUGEINT) * SUM(term))
               // (2 * CAST(n AS HUGEINT) * nt) <= {_T_CLOSE_Q}
               AS is_t_close
    FROM terms GROUP BY c_nationkey, bal_band, n, nt
    """,
)
def gov3_t_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-closeness audit — the third rung of the standard privacy
    ladder (Li, Li & Venkatasubramanian 2007), completing gov1's
    k-anonymity and gov2's l-diversity: a class can be large AND
    diverse yet still leak if its sensitive-attribute DISTRIBUTION
    differs sharply from the table's (a class that is 90% one
    segment against a 20% global share tells an adversary plenty).
    Each (nation, balance-band) class is scored by the distance
    between its market-segment distribution and the global one; for
    a categorical attribute the Earth Mover's Distance of the paper
    reduces to total variation distance, TVD = (1/2) * sum_s
    |p_class(s) - p_global(s)|. Computed as ONE exact rational per
    class: sum_s |seg_n*N - g*n| / (2*n*N), floor-quantized to the
    1e-9 grid in 128-bit arithmetic END TO END (Spark DECIMAL(38,0)
    div / DuckDB HUGEINT //, the t17 discipline): the per-term
    products seg_n*N and g*n pass int64 once N exceeds ~3e9 rows,
    the scaled numerator can reach Q*N^2 far earlier, and the
    DIVISOR 2*n*N passes int64 at the same ~2.1e9-customer mark —
    so every factor, not just the Q-scaled numerator, is promoted
    before multiplication (the fs2 per-factor lesson, extended to
    the divisor per r13 ADVICE). Segments ABSENT from a
    class contribute their full global mass (the left join from the
    class x segment universe), which per-class aggregation alone
    would silently drop. Classes with tvd_q > {T} (t = 0.2) need
    generalization before export.

    Scale shape: the same bounded-cardinality aggregations as
    gov1/gov2 (classes <= |nations| x |bands|, segments fixed at a
    handful), one crossJoin against the BROADCAST fixed segment
    relation and one left join back onto the per-(class, segment)
    counts — every relation after the first scan is
    class-proportional, never row-proportional, so at 100 TB the
    plan is one scan + constant-size exchanges. The global-total and
    global-segment relations are 1-row / |segments|-row broadcast
    aggregates (the dq5 pattern — no collect, no driver round-trip)."""
    cust = load_table(spark, sf_dir, "customer")
    band = F.floor(F.col("c_acctbal") / 1000.0).cast("long")
    cls_seg = (cust.groupBy("c_nationkey", band.alias("bal_band"),
                            "c_mktsegment")
               .agg(F.count(F.lit(1)).cast("long").alias("seg_n")))
    cls = (cls_seg.groupBy("c_nationkey", "bal_band")
           .agg(F.sum("seg_n").cast("long").alias("n")))
    glob = (cust.groupBy("c_mktsegment")
            .agg(F.count(F.lit(1)).cast("long").alias("g")))
    tot = cust.agg(F.count(F.lit(1)).cast("long").alias("nt"))
    terms = (cls.crossJoin(F.broadcast(glob))
             .crossJoin(F.broadcast(tot))
             .join(cls_seg, ["c_nationkey", "bal_band", "c_mktsegment"],
                   "left")
             .select("c_nationkey", "bal_band", "n", "nt",
                     F.abs(F.coalesce("seg_n", F.lit(0))
                           * F.col("nt").cast("decimal(38,0)")
                           - F.col("g")
                           * F.col("n").cast("decimal(38,0)"))
                     .alias("term")))
    tvd = F.expr(
        f"cast((cast({_RISK_Q} as decimal(38,0)) * term_sum) "
        f"div (2 * cast(n as decimal(38,0)) * nt) as long)")
    return (terms.groupBy("c_nationkey", "bal_band", "n", "nt")
            .agg(F.sum("term").cast("decimal(38,0)").alias("term_sum"))
            .select("c_nationkey", "bal_band", "n",
                    tvd.alias("tvd_q"),
                    (tvd <= _T_CLOSE_Q).alias("is_t_close")))


gov3_t_closeness.__doc__ = gov3_t_closeness.__doc__.format(T=_T_CLOSE_Q)
