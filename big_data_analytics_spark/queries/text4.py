"""Text surface, wave 4: corpus-wide exact chunk deduplication (t13)
— the C4-style "drop repeated spans, keep the first occurrence" pass
that LLM corpus pipelines run between exact-doc dedup (d1) and
near-dup detection (d2/d3).

The fixture documents are single-line word streams, so the dedup unit
is the 10-token chunk rather than the newline-delimited line; the
plan shape is identical either way: explode to (chunk, doc, pos),
one shuffle on the chunk text (in production: on a 128-bit chunk
fingerprint, so the exchange carries 16-byte keys, not strings),
keep the lexicographically-first (doc_id, pos) occurrence with a
WindowGroupLimit-eligible row_number, and re-aggregate per document.
State per chunk key is O(1); nothing is quadratic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from big_data_analytics_spark.catalog import load_table
from big_data_analytics_spark.queries import query


@query(
    "t13_chunk_dedup",
    oracle="""
    WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS t FROM documents
        WHERE len(string_split(text, ' ')) >= 1
    ), idx AS (
        SELECT doc_id, t,
               unnest(range(CAST(ceil(len(t) / 10.0) AS BIGINT))) AS ci
        FROM toks
    ), chunks AS (
        SELECT doc_id, ci,
               array_to_string(t[ci * 10 + 1 : ci * 10 + 10], ' ') AS chunk
        FROM idx
    ), ranked AS (
        SELECT doc_id, ci, chunk,
               ROW_NUMBER() OVER (PARTITION BY chunk
                                  ORDER BY doc_id, ci) AS rn
        FROM chunks
    )
    SELECT doc_id,
           COUNT(*) AS n_chunks,
           CAST(SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_kept,
           CAST(SUM(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_removed
    FROM ranked GROUP BY doc_id
    """,
)
def t13_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide exact chunk dedup, keep-first: split every document
    into 10-token chunks, keep only the first (doc_id, chunk_index)
    occurrence of each distinct chunk text, and report per-document
    kept/removed counts.

    Keep-first is the C4/RefinedWeb convention — it makes the pass
    deterministic and idempotent. The row_number-over-chunk window is
    the only shuffle that carries chunk text; its ORDER BY (doc_id,
    ci) total order means ties cannot exist, so the rn=1 winner is
    unique on any engine. The explode is linear in corpus tokens and
    partial-aggregates back down to one row per document."""
    docs = load_table(spark, sf_dir, "documents")
    toks = (docs.select("doc_id", F.split("text", " ").alias("t"))
            .filter(F.size("t") >= 1))
    idx = toks.select(
        "doc_id", "t",
        F.explode(F.sequence(
            F.lit(0),
            F.ceil(F.size("t") / F.lit(10.0)).cast("long") - 1))
        .alias("ci"))
    chunks = idx.select(
        "doc_id", "ci",
        F.array_join(
            F.slice("t", F.col("ci") * 10 + 1, F.lit(10)), " ")
        .alias("chunk"))
    w = Window.partitionBy("chunk").orderBy("doc_id", "ci")
    ranked = chunks.select(
        "doc_id", F.row_number().over(w).alias("rn"))
    return ranked.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.sum((F.col("rn") == 1).cast("long")).cast("long")
        .alias("n_kept"),
        F.sum((F.col("rn") > 1).cast("long")).cast("long")
        .alias("n_removed"))
