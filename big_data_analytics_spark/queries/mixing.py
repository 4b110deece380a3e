"""Corpus mixing: temperature-weighted per-source budgets — the data-
mixing step of multilingual / multi-source LM training (upsample rare
sources, downsample dominant ones; the τ-temperature scheme of
multilingual BERT / XLM-R).

Integer discipline end to end: weights are floor(sqrt(n)·10⁶) (sqrt is
IEEE correctly-rounded, so both engines see identical doubles; floor
pins the result to an exact integer), the budget split is integer
largest-remainder apportionment, and ties break lexicographically —
the whole allocation is engine-exact and hash-gradeable, where a
naive share = w/Σw double pipeline would be summation-order-dependent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from big_data_analytics_spark.catalog import load_table
from big_data_analytics_spark.queries import query

#: Total document budget to apportion and the temperature (τ = 2 →
#: weight ∝ n^(1/2): rare languages upsampled relative to their share).
_BUDGET = 100_000
_SCALE = 1_000_000


@query(
    "mx1_mixture_budgets",
    oracle=f"""
    WITH counts AS (
        SELECT lang, COUNT(*) AS n_docs FROM documents GROUP BY lang
    ), weighted AS (
        SELECT lang, n_docs,
               CAST(FLOOR(SQRT(CAST(n_docs AS DOUBLE)) * {_SCALE})
                    AS BIGINT) AS w
        FROM counts
    ), totals AS (
        SELECT SUM(w) AS tw FROM weighted
    ), alloc AS (
        SELECT lang, n_docs, w,
               ({_BUDGET} * w) // tw AS base,
               ({_BUDGET} * w) % tw AS rem
        FROM weighted CROSS JOIN totals
    ), ranked AS (
        SELECT *,
               ROW_NUMBER() OVER (ORDER BY rem DESC, lang ASC) AS rk,
               {_BUDGET} - SUM(base) OVER () AS leftover
        FROM alloc
    )
    SELECT lang, n_docs, w AS weight_micro,
           CAST(base + CASE WHEN rk <= leftover THEN 1 ELSE 0 END
                AS BIGINT) AS alloc_docs
    FROM ranked
    """,
)
def mx1_mixture_budgets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language document budgets for a {_BUDGET}-doc training mix
    at temperature τ=2: weight w = floor(sqrt(n)·10⁶), base share =
    B·w div Σw, and the integer leftover goes to the largest
    remainders (ties by language) — exact largest-remainder
    apportionment, so Σ alloc_docs == B always.

    Scale shape: one partial-combined count per language (the only
    shuffle that touches data), then constant-size arithmetic: the
    language table is low-cardinality, so the totals cross join is a
    1-row broadcast and the remainder window sorts a handful of rows.
    The allocation logic itself would be identical over thousands of
    sources (domains, crawls) — still metadata-sized."""
    counts = (load_table(spark, sf_dir, "documents")
              .groupBy("lang").agg(F.count(F.lit(1)).alias("n_docs")))
    weighted = counts.select(
        "lang", "n_docs",
        F.floor(F.sqrt(F.col("n_docs").cast("double")) * _SCALE)
        .cast("long").alias("w"),
    )
    totals = weighted.agg(F.sum("w").alias("tw"))
    alloc = (weighted.crossJoin(F.broadcast(totals))
             .select("lang", "n_docs", "w",
                     F.expr(f"({_BUDGET} * w) div tw").alias("base"),
                     (F.lit(_BUDGET) * F.col("w") % F.col("tw"))
                     .alias("rem")))
    w_rank = Window.orderBy(F.col("rem").desc(), F.col("lang").asc())
    w_all = Window.partitionBy()
    ranked = (alloc
              .withColumn("rk", F.row_number().over(w_rank))
              .withColumn("leftover",
                          F.lit(_BUDGET) - F.sum("base").over(w_all)))
    return ranked.select(
        "lang", "n_docs", F.col("w").alias("weight_micro"),
        (F.col("base")
         + F.when(F.col("rk") <= F.col("leftover"), 1).otherwise(0))
        .cast("long").alias("alloc_docs"),
    )
