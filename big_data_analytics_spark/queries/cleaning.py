"""Corpus cleaning, wave 4: PII redaction and robust-statistics
winsorization — standard hygiene passes in an LLM training-data
pipeline (scrub before training; clip before computing summary stats
that feed quality gates).

Both are narrow per-row maps plus one aggregation: at 100 TB the
regex scan rides the parquet read (no shuffle at all for the scrub;
one partial-combined agg for the stats), so throughput is bounded by
scan bandwidth, not the engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from big_data_analytics_spark.catalog import load_table
from big_data_analytics_spark.functions.money import money_sum
from big_data_analytics_spark.queries import query

# Patterns restricted to syntax with identical semantics in Java
# regex (Spark) and RE2 (DuckDB): character classes, bounded repeats,
# and \b word boundaries only — no backrefs or lookaround.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PHONE_RE = r"\b555-\d{4}\b"


@query(
    "t10_pii_scrub",
    oracle=f"""
    WITH seeded AS (
        SELECT doc_id,
               text
               || CASE WHEN doc_id % 7 = 0
                       THEN ' contact user' || doc_id || '@example.com now'
                       ELSE '' END
               || CASE WHEN doc_id % 11 = 0
                       THEN ' from 10.' || (doc_id % 256) || '.0.1 today'
                       ELSE '' END
               || CASE WHEN doc_id % 13 = 0
                       THEN ' call 555-' || (1000 + doc_id % 9000) || ' x'
                       ELSE '' END AS text
        FROM documents
    )
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '{EMAIL_RE}')) AS BIGINT)
               AS n_emails,
           CAST(len(regexp_extract_all(text, '{IPV4_RE}')) AS BIGINT)
               AS n_ips,
           CAST(len(regexp_extract_all(text, '{PHONE_RE}')) AS BIGINT)
               AS n_phones,
           md5(regexp_replace(regexp_replace(regexp_replace(text,
               '{EMAIL_RE}', '<EMAIL>', 'g'),
               '{IPV4_RE}', '<IP>', 'g'),
               '{PHONE_RE}', '<PHONE>', 'g')) AS clean_md5
    FROM seeded
    WHERE doc_id % 7 = 0 OR doc_id % 11 = 0 OR doc_id % 13 = 0
    """,
)
def t10_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII detection + redaction over the corpus. The synthetic corpus
    carries no PII, so the query first *seeds* deterministic fake
    emails/IPs/phones (a self-oracle: every planted item must be
    found), then counts and redacts them with the shared
    Java-regex/RE2-portable patterns. Output is per-document match
    counts plus an md5 of the redacted text, so the driver hash also
    certifies the redacted bytes. Scale: pure column expressions over
    one scan — no shuffle, no UDF."""
    d = load_table(spark, sf_dir, "documents")
    seeded = d.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(F.col("doc_id") % 7 == 0,
                   F.concat(F.lit(" contact user"), F.col("doc_id"),
                            F.lit("@example.com now"))).otherwise(""),
            F.when(F.col("doc_id") % 11 == 0,
                   F.concat(F.lit(" from 10."), F.col("doc_id") % 256,
                            F.lit(".0.1 today"))).otherwise(""),
            F.when(F.col("doc_id") % 13 == 0,
                   F.concat(F.lit(" call 555-"),
                            (F.lit(1000) + F.col("doc_id") % 9000),
                            F.lit(" x"))).otherwise(""),
        ).alias("text"),
    ).where((F.col("doc_id") % 7 == 0) | (F.col("doc_id") % 11 == 0)
            | (F.col("doc_id") % 13 == 0))
    clean = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col("text"), EMAIL_RE, "<EMAIL>"),
            IPV4_RE, "<IP>"),
        PHONE_RE, "<PHONE>")
    return seeded.select(
        "doc_id",
        F.regexp_count("text", F.lit(EMAIL_RE)).cast("long")
        .alias("n_emails"),
        F.regexp_count("text", F.lit(IPV4_RE)).cast("long").alias("n_ips"),
        F.regexp_count("text", F.lit(PHONE_RE)).cast("long")
        .alias("n_phones"),
        F.md5(clean).alias("clean_md5"),
    )


@query(
    "a20_winsorized_prices",
    oracle="""
    WITH bounds AS (
        SELECT l_returnflag,
               ROUND(quantile_cont(l_extendedprice, 0.01), 4) AS lo,
               ROUND(quantile_cont(l_extendedprice, 0.99), 4) AS hi
        FROM lineitem GROUP BY l_returnflag
    )
    SELECT l.l_returnflag,
           CAST(SUM(CASE WHEN l_extendedprice < lo THEN 1 ELSE 0 END)
                AS BIGINT) AS n_clipped_low,
           CAST(SUM(CASE WHEN l_extendedprice > hi THEN 1 ELSE 0 END)
                AS BIGINT) AS n_clipped_high,
           CAST(SUM(CAST(FLOOR(LEAST(GREATEST(l_extendedprice, lo), hi)
                * 100.0 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0
               AS winsorized_sum
    FROM lineitem l JOIN bounds b USING (l_returnflag)
    GROUP BY l.l_returnflag
    """,
)
def a20_winsorized_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sided 1%/99% winsorization per return flag: exact
    interpolated bounds (round-4 — the a8-proven portable percentile
    convention), clip, integer-cents sum. Implemented with a window
    over the grouping key rather than an agg+rejoin, so the plan is
    one exchange on l_returnflag reused by both the percentile window
    and the final aggregation — no second scan, no join. At 100 TB
    the return-flag key is low-cardinality/skewed; for a
    high-cardinality grouping this same shape holds per key."""
    li = load_table(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_returnflag")
    p = F.col("l_extendedprice")
    with_bounds = li.select(
        "l_returnflag", "l_extendedprice",
        F.round(F.percentile(p, F.lit(0.01)).over(w), 4).alias("lo"),
        F.round(F.percentile(p, F.lit(0.99)).over(w), 4).alias("hi"),
    )
    clipped = F.least(F.greatest(p, F.col("lo")), F.col("hi"))
    return with_bounds.groupBy("l_returnflag").agg(
        F.sum(F.when(p < F.col("lo"), 1).otherwise(0)).cast("long")
        .alias("n_clipped_low"),
        F.sum(F.when(p > F.col("hi"), 1).otherwise(0)).cast("long")
        .alias("n_clipped_high"),
        money_sum(clipped).alias("winsorized_sum"),
    )


@query(
    "t12_token_entropy",
    oracle="""
    WITH toks AS (
        SELECT doc_id, UNNEST(string_split(text, ' ')) AS tok
        FROM documents
    ), counts AS (
        SELECT doc_id, tok, COUNT(*) AS c FROM toks GROUP BY doc_id, tok
    ), totals AS (
        SELECT doc_id, SUM(c) AS n, COUNT(*) AS n_unique
        FROM counts GROUP BY doc_id
    )
    SELECT c.doc_id,
           CAST(t.n AS BIGINT) AS n_tokens,
           CAST(t.n_unique AS BIGINT) AS n_unique,
           ROUND(-SUM((c.c / t.n) * LN(c.c / t.n)), 4) AS entropy_nats
    FROM counts c JOIN totals t USING (doc_id)
    GROUP BY c.doc_id, t.n, t.n_unique
    """,
)
def t12_token_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram token entropy per document — the standard repetition /
    degeneracy quality signal (low entropy => boilerplate or loops;
    complements the Gopher-rule fractions in t8). One explode + one
    (doc, token) count + a window total over doc_id reusing the same
    partitioning, then the entropy fold. Round-4 masks sub-ulp ln()
    differences across engines; values are O(1) nats so the rounding
    granularity dominates any libm drift."""
    d = load_table(spark, sf_dir, "documents")
    counts = (
        d.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
        .groupBy("doc_id", "tok").agg(F.count("*").alias("c"))
    )
    w = Window.partitionBy("doc_id")
    with_tot = counts.select(
        "doc_id", "c",
        F.sum("c").over(w).alias("n"),
        F.count("*").over(w).alias("n_unique"),
    )
    p = F.col("c") / F.col("n")
    return with_tot.groupBy("doc_id", "n", "n_unique").agg(
        F.round(-F.sum(p * F.log(p)), 4).alias("entropy_nats")
    ).select(
        "doc_id",
        F.col("n").cast("long").alias("n_tokens"),
        F.col("n_unique").cast("long").alias("n_unique"),
        "entropy_nats",
    )
