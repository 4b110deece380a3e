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


# --------------------------------------------------------------------
# ds1 — importance resampling (DSIR, Xie et al. 2023, public): select
# raw documents whose hashed n-gram profile best matches a target
# distribution, by exact integer log-likelihood-ratio weights.
# --------------------------------------------------------------------

_DS_BUCKETS = 256
_DS_Q = 1_000_000
_DS_TOPK = 25

_DS_ORACLE = f"""
    WITH toks AS (
        SELECT doc_id, lang,
               ('0x' || substr(md5(t.token), 1, 8))::BIGINT
                   % {_DS_BUCKETS} AS bucket
        FROM documents, UNNEST(string_split(text, ' ')) AS t(token)
    ), dist AS (
        SELECT bucket,
               CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)
                    AS BIGINT) AS ct,
               CAST(SUM(CASE WHEN lang <> 'en' THEN 1 ELSE 0 END)
                    AS BIGINT) AS cr
        FROM toks GROUP BY bucket
    ), tot AS (
        SELECT CAST(SUM(ct) AS BIGINT) AS nt,
               CAST(SUM(cr) AS BIGINT) AS nr
        FROM dist
    ), scores AS (
        SELECT bucket,
               CAST(FLOOR({_DS_Q} * ln(CAST(ct + 1 AS DOUBLE)
                    / CAST(nt + {_DS_BUCKETS} AS DOUBLE))) AS BIGINT)
             - CAST(FLOOR({_DS_Q} * ln(CAST(cr + 1 AS DOUBLE)
                    / CAST(nr + {_DS_BUCKETS} AS DOUBLE))) AS BIGINT)
                   AS s
        FROM dist CROSS JOIN tot
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           CAST(SUM(s) AS BIGINT) AS weight_q
    FROM toks JOIN scores USING (bucket)
    WHERE lang <> 'en'
    GROUP BY doc_id
    ORDER BY weight_q DESC, doc_id
    LIMIT {_DS_TOPK}
"""


@query("ds1_importance_resampling", oracle=_DS_ORACLE)
def ds1_importance_resampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data Selection via Importance Resampling (DSIR, Xie et al.
    2023, public): rank candidate documents by how much their hashed
    unigram profile looks like a target distribution — here the
    'en' documents are the target, everything else the raw pool, and
    the top-{K} candidates by importance weight are selected. The
    weight is the log-likelihood ratio sum_tokens
    [ln p_target(bucket) - ln p_raw(bucket)] over {B} md5-hashed
    token buckets with add-1 smoothing. Every term is quantized
    (floor(1e6 * ln(exact-int ratio))) BEFORE the per-document sum,
    so the weights are exact integers and the row hash-grades: ln of
    identical doubles is identical IEEE in both engines (the aa_t
    recipe), and the bucket assignment is the md5-portable fh1 hash.

    Scale shape: the token explode is paid ONCE — it partial-
    aggregates straight into per-(doc, lang, bucket) counts, which
    are localCheckpoint-materialized so BOTH consumers (the
    {B}-bucket distribution build and the candidate scoring) read the
    same computed relation — predicate pushdown makes the two
    subtrees structurally different, so ReusedExchange alone would
    not dedup them and the explode would run twice. Everything
    downstream moves counts, never token rows. (Locally the
    materialization costs ~0.4 s more than just tokenizing twice —
    the d2 trade again: at corpus scale tokenize+hash over every
    token is the dominant CPU and paying it once wins.) The {B}-row score table broadcasts; the
    candidate scoring is a map-side broadcast join + one mergeable
    per-doc aggregate; top-{K} is TakeOrderedAndProject. No
    vocabulary state, no corpus-wide window — the same properties
    that make fh1 survive 100 TB. At production scale the top-k
    becomes a threshold or Gumbel-top-k sample over the same weight
    column."""
    toks = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang",
        F.explode(F.split(F.col("text"), " ")).alias("token"))
    bucket = (F.conv(F.substring(F.md5("token"), 1, 8), 16, 10)
              .cast("long") % _DS_BUCKETS)
    counts = (toks.select("doc_id", "lang", bucket.alias("bucket"))
              .groupBy("doc_id", "lang", "bucket")
              .agg(F.count(F.lit(1)).alias("c"))
              .localCheckpoint())
    is_t = (F.col("lang") == "en").cast("long")
    dist = counts.groupBy("bucket").agg(
        F.sum(is_t * F.col("c")).alias("ct"),
        F.sum((1 - is_t) * F.col("c")).alias("cr"))
    tot = dist.agg(F.sum("ct").alias("nt"), F.sum("cr").alias("nr"))

    def logq(c, n):
        return F.floor(
            _DS_Q * F.log((c + 1).cast("double")
                          / (n + _DS_BUCKETS).cast("double"))
        ).cast("long")

    scores = (dist.crossJoin(F.broadcast(tot))
              .select("bucket",
                      (logq(F.col("ct"), F.col("nt"))
                       - logq(F.col("cr"), F.col("nr"))).alias("s")))
    return (counts.filter(F.col("lang") != "en")
            .join(F.broadcast(scores), "bucket")
            .groupBy("doc_id")
            .agg(F.sum("c").cast("long").alias("n_tokens"),
                 F.sum(F.col("c") * F.col("s")).cast("long")
                 .alias("weight_q"))
            .orderBy(F.desc("weight_q"), "doc_id")
            .limit(_DS_TOPK))


ds1_importance_resampling.__doc__ = ds1_importance_resampling.__doc__.format(
    K=_DS_TOPK, B=_DS_BUCKETS)
