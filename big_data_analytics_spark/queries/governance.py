"""Data-governance checks a training-data platform runs before a
corpus or customer extract leaves the pipeline: k-anonymity over
quasi-identifier combinations (gov1). Reference parity: none — the
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
