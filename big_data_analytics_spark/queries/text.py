"""Text-analysis & deduplication queries over the ``documents`` table —
the training-data-pipeline surface (exact dedup, token counting,
quality scoring, language-ID heuristic, fingerprinting).

These generalize the reference's NLP cell (TF-IDF pipeline,
/root/reference/data_mining_Assignment1.ipynb — SURVEY §2.9 M14) into
first-class corpus operators. Everything here is built-in column
expressions (regex, split, array higher-order functions, hashes) — the
whole path stays JVM-side and scales linearly with no shuffle except
the final aggregations.

Near-duplicate detection (MinHash/SimHash/LSH) lives in
``big_data_analytics_spark.operators.dedup`` — those are multi-stage
plans, tested against brute-force oracles in tests/.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from big_data_analytics_spark.catalog import load_table
from big_data_analytics_spark.queries import query

#: Tiny stopword inventories for the language-ID heuristic. Distinct-hit
#: counting (set intersection) keeps the heuristic engine-portable.
EN_STOP = ("the", "a", "and", "of", "to", "in", "is", "on", "for", "with")
ES_STOP = ("el", "la", "de", "en", "y", "que", "los", "por", "con", "una")


def _norm(col: Column) -> Column:
    """Normalization for hashing/dedup: lowercase, collapse whitespace."""
    return F.trim(F.regexp_replace(F.lower(col), r"\s+", " "))


def _tokens(col: Column) -> Column:
    """Whitespace tokenization of trimmed text."""
    return F.split(F.trim(col), r"\s+")


# oracle-side equivalents (DuckDB regexp_replace needs the 'g' flag)
_ORACLE_NORM = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"
_ORACLE_TOKENS = "regexp_split_to_array(trim(text), '\\s+')"


# --------------------------------------------------------------------
# D1 — exact dedup by content hash: canonical-representative selection.
# --------------------------------------------------------------------
@query(
    "d1_exact_dedup",
    oracle=f"""
    SELECT fp, CAST(MIN(doc_id) AS BIGINT) AS keep_doc_id,
           COUNT(*) AS n_copies
    FROM (SELECT doc_id, md5({_ORACLE_NORM}) AS fp FROM documents)
    GROUP BY fp
    """,
)
def d1_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact deduplication: hash normalized content, keep the minimum
    doc_id per hash group. One shuffle on the 32-byte fingerprint —
    at 100 TB this is the standard first dedup pass before any
    near-dup method runs."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select("doc_id", F.md5(_norm(F.col("text"))).alias("fp"))
        .groupBy("fp")
        .agg(F.min("doc_id").alias("keep_doc_id"), F.count(F.lit(1)).alias("n_copies"))
    )


# --------------------------------------------------------------------
# T1 — token counting (whitespace tokenizer).
# --------------------------------------------------------------------
@query(
    "t1_token_counts",
    oracle=f"""
    SELECT doc_id,
           CAST(CASE WHEN length(trim(text)) = 0 THEN 0
                ELSE len({_ORACLE_TOKENS}) END AS BIGINT) AS n_tokens,
           CAST(length(text) AS BIGINT) AS n_chars_measured,
           n_chars
    FROM documents
    """,
)
def t1_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document token and character counts."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.when(F.length(F.trim(F.col("text"))) == 0, 0)
        .otherwise(F.size(_tokens(F.col("text"))))
        .cast("long").alias("n_tokens"),
        F.length("text").cast("long").alias("n_chars_measured"),
        "n_chars",
    )


# --------------------------------------------------------------------
# T2 — quality scoring: length / punctuation / digit / stopword ratios.
# --------------------------------------------------------------------
@query(
    "t2_quality_scores",
    oracle=f"""
    SELECT doc_id,
           CAST(length(text) AS BIGINT) AS n_chars_m,
           CAST(len({_ORACLE_TOKENS}) AS BIGINT) AS n_tokens,
           CAST(length(text) - length(regexp_replace(text, '[^a-zA-Z0-9 \\t\\n]', '', 'g')) AS DOUBLE)
               / length(text) AS punct_ratio,
           CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS DOUBLE)
               / length(text) AS digit_ratio,
           CAST(length(text) AS DOUBLE) / len({_ORACLE_TOKENS}) AS avg_token_len,
           CAST(len(list_intersect({_ORACLE_TOKENS},
                ['the','a','and','of','to','in','is','on','for','with'])) AS DOUBLE)
               / 10.0 AS stopword_coverage
    FROM documents
    WHERE length(text) > 0
    """,
)
def t2_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic document-quality features (the usual pre-training
    corpus filters): punctuation/digit density, mean token length,
    stopword coverage."""
    docs = load_table(spark, sf_dir, "documents").filter(F.length("text") > 0)
    text = F.col("text")
    n = F.length(text)
    toks = _tokens(text)

    def removed(pattern: str) -> Column:
        return (n - F.length(F.regexp_replace(text, pattern, ""))).cast("double") / n

    return docs.select(
        "doc_id",
        n.cast("long").alias("n_chars_m"),
        F.size(toks).cast("long").alias("n_tokens"),
        # "punctuation" = anything outside alnum/whitespace (POSIX
        # [[:punct:]] parses differently in Java regex vs RE2)
        removed(r"[^a-zA-Z0-9 \t\n]").alias("punct_ratio"),
        removed(r"[0-9]").alias("digit_ratio"),
        (n.cast("double") / F.size(toks)).alias("avg_token_len"),
        (F.size(F.array_intersect(toks, F.array([F.lit(s) for s in EN_STOP])))
         .cast("double") / 10.0).alias("stopword_coverage"),
    )


# --------------------------------------------------------------------
# T3 — language-ID heuristic: distinct-stopword hits per language.
# --------------------------------------------------------------------
@query(
    "t3_language_id",
    oracle=f"""
    WITH feat AS (
        SELECT doc_id, lang,
               len(list_intersect({_ORACLE_TOKENS},
                   ['the','a','and','of','to','in','is','on','for','with'])) AS en_raw,
               len(list_intersect({_ORACLE_TOKENS},
                   ['el','la','de','en','y','que','los','por','con','una'])) AS es_raw
        FROM documents
    )
    SELECT doc_id, lang AS labeled_lang,
           CAST(en_raw AS BIGINT) AS en_hits,
           CAST(es_raw AS BIGINT) AS es_hits,
           CASE WHEN en_raw >= es_raw AND en_raw > 0 THEN 'en'
                WHEN es_raw > en_raw THEN 'es'
                ELSE 'unknown' END AS predicted_lang
    FROM feat
    """,
)
def t3_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-intersection language scoring with a deterministic
    argmax (ties → 'en' → 'unknown'). A real deployment swaps in larger
    per-language n-gram tables — same plan shape."""
    docs = load_table(spark, sf_dir, "documents")
    toks = _tokens(F.col("text"))
    en = F.size(F.array_intersect(toks, F.array([F.lit(s) for s in EN_STOP])))
    es = F.size(F.array_intersect(toks, F.array([F.lit(s) for s in ES_STOP])))
    return (
        docs.select("doc_id", F.col("lang").alias("labeled_lang"),
                    en.cast("long").alias("en_hits"),
                    es.cast("long").alias("es_hits"))
        .withColumn(
            "predicted_lang",
            F.when((F.col("en_hits") >= F.col("es_hits")) & (F.col("en_hits") > 0), "en")
            .when(F.col("es_hits") > F.col("en_hits"), "es")
            .otherwise("unknown"),
        )
    )


# --------------------------------------------------------------------
# T4 — document fingerprinting (content-defined signature).
# --------------------------------------------------------------------
@query(
    "t4_fingerprints",
    oracle=f"""
    SELECT doc_id,
           md5({_ORACLE_NORM}) AS fp_md5,
           sha256({_ORACLE_NORM}) AS fp_sha256,
           substr(md5({_ORACLE_NORM}), 1, 8) AS fp_short
    FROM documents
    """,
)
def t4_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stable content fingerprints (md5/sha256 over normalized text) —
    the join key for cross-corpus exact matching."""
    docs = load_table(spark, sf_dir, "documents")
    norm = _norm(F.col("text"))
    return docs.select(
        "doc_id",
        F.md5(norm).alias("fp_md5"),
        F.sha2(norm, 256).alias("fp_sha256"),
        F.substring(F.md5(norm), 1, 8).alias("fp_short"),
    )


# --------------------------------------------------------------------
# T5 — corpus stats per (lang, source): the reporting rollup.
# --------------------------------------------------------------------
@query(
    "t5_corpus_stats",
    oracle=f"""
    SELECT lang, source, COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(SUM(len({_ORACLE_TOKENS})) AS BIGINT) AS total_tokens,
           ROUND(AVG(CAST(n_chars AS DOUBLE)), 6) AS avg_chars
    FROM documents
    GROUP BY lang, source
    """,
)
def t5_corpus_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus composition rollup (docs/chars/tokens by language and
    source) — the dataset-card numbers for a crawl snapshot."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.sum(F.size(_tokens(F.col("text"))).cast("long")).alias("total_tokens"),
        F.round(F.avg(F.col("n_chars").cast("double")), 6).alias("avg_chars"),
    )
