"""Driver-visible query over the corpus-cleanup pipeline.

operators/corpus.py (quality filter → language filter → exact dedup —
the C4/RefinedWeb preprocessing chain) was pytest-only; cp1 gives it a
hash-graded driver row. The audit counts are the product: silently
dropping data is the cardinal sin of corpus pipelines, so the graded
artifact is exactly the per-stage survivor counts. The near-dedup
stage (xxhash LSH) stays out of the graded chain — its twin d2b/d7
queries cover that machinery portably.

Planted junk makes every stage bite: too-short docs fail the length
bound, punctuation bombs fail the density bound (while passing length
and token count), and exact copies collapse in the dedup stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from big_data_analytics_spark.catalog import load_table
from big_data_analytics_spark.operators.corpus import quality_predicate
from big_data_analytics_spark.operators.dedup import exact_dedup
from big_data_analytics_spark.queries import query


@query(
    "cp1_corpus_clean_audit",
    oracle="""
    WITH corpus AS (
        SELECT doc_id, text, lang FROM documents
        UNION ALL
        SELECT doc_id + 60000, 'tiny doc', 'en' FROM documents
        WHERE doc_id < 5
        UNION ALL
        SELECT doc_id + 65000,
               'a b c d e f g h i j ' || repeat('!?#', 30), 'en'
        FROM documents WHERE doc_id < 5
        UNION ALL
        SELECT doc_id + 70000, text, lang FROM documents
        WHERE doc_id < 10
    ), flags AS (
        SELECT doc_id, lang,
               length(text) BETWEEN 50 AND 1000000
               AND len(regexp_split_to_array(trim(text), '\\s+')) >= 10
               AND CAST(length(text) - length(regexp_replace(
                       text, '[^a-zA-Z0-9 \\t\\n]', '', 'g')) AS DOUBLE)
                   / greatest(length(text), 1) <= 0.3
               AND CAST(length(text) - length(regexp_replace(
                       text, '[0-9]', '', 'g')) AS DOUBLE)
                   / greatest(length(text), 1) <= 0.3 AS q,
               md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')))
                   AS fp
        FROM corpus
    )
    SELECT COUNT(*) AS n_input,
           COUNT(*) FILTER (WHERE q) AS n_after_quality,
           COUNT(*) FILTER (WHERE q AND lang = 'en') AS n_after_language,
           COUNT(DISTINCT CASE WHEN q AND lang = 'en' THEN fp END)
               AS n_after_exact_dedup
    FROM flags
    """,
)
def cp1_corpus_clean_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-stage survivor counts of the exact cleanup chain over the
    documents table plus planted junk (5 too-short docs, 5
    punctuation bombs, 10 exact copies): quality heuristics
    (operators/corpus.py:quality_predicate — length, token count,
    punct/digit density as pure column expressions), English filter,
    then the real exact_dedup operator (md5-fingerprint window, min
    id per normalized text). The oracle recomputes every stage
    independently; the dedup count comes from the operator's actual
    output, so the hash match certifies the full chain, not a
    re-derivation.

    Scale shape: flags are one narrow map; the three filter counts
    ride one aggregation; the dedup stage is the operator's single
    fingerprint shuffle. At 100 TB each stage's count is exactly the
    audit a production run must emit before discarding data."""
    base = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang")
    tiny = base.filter(F.col("doc_id") < 5).select(
        (F.col("doc_id") + 60000).alias("doc_id"),
        F.lit("tiny doc").alias("text"), F.lit("en").alias("lang"))
    punct = base.filter(F.col("doc_id") < 5).select(
        (F.col("doc_id") + 65000).alias("doc_id"),
        F.concat(F.lit("a b c d e f g h i j "),
                 F.repeat(F.lit("!?#"), 30)).alias("text"),
        F.lit("en").alias("lang"))
    dups = base.filter(F.col("doc_id") < 10).select(
        (F.col("doc_id") + 70000).alias("doc_id"), "text", "lang")
    corpus = base.unionByName(tiny).unionByName(punct).unionByName(dups)

    q = quality_predicate(F.col("text"))
    flagged = corpus.select("doc_id", "text", "lang", q.alias("q"))
    survivors = flagged.filter(F.col("q") & (F.col("lang") == "en"))

    counts = flagged.agg(
        F.count(F.lit(1)).alias("n_input"),
        F.count_if(F.col("q")).alias("n_after_quality"),
        F.count_if(F.col("q") & (F.col("lang") == "en"))
        .alias("n_after_language"),
    )
    deduped = exact_dedup(survivors, "text", "doc_id").agg(
        F.count(F.lit(1)).alias("n_after_exact_dedup"))
    return counts.crossJoin(deduped)
