"""Text pipeline, wave 2: document chunking and vocabulary building —
the two remaining prep steps between a cleaned corpus and a tokenizer
at 100 TB. Both are narrow maps + one aggregation; no UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from big_data_analytics_spark.catalog import load_table
from big_data_analytics_spark.queries import query

CHUNK = 32
STRIDE = 24  # 8-token overlap between consecutive chunks


@query(
    "t6_chunk_documents",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ), starts AS (
        SELECT doc_id, t, UNNEST(range(1, len(t) + 1, {STRIDE})) AS s
        FROM toks
    )
    SELECT doc_id,
           CAST((s - 1) / {STRIDE} AS BIGINT) AS chunk_id,
           array_to_string(t[s : s + {CHUNK - 1}], ' ') AS chunk_text,
           len(t[s : s + {CHUNK - 1}]) AS n_tokens
    FROM starts
    """,
)
def t6_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping token-window chunks ({CHUNK} tokens, stride
    {STRIDE}): sequence → explode → slice, all JVM expressions. The
    final partial chunk is kept (a tokenizer pads it); chunk_id is
    derivable from offset so re-chunking is idempotent."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    return (
        d.select(
            "doc_id", toks.alias("t"),
            F.explode(F.sequence(F.lit(1), F.size(toks), F.lit(STRIDE)))
            .alias("s"),
        )
        .select(
            "doc_id",
            (((F.col("s") - 1) / STRIDE).cast("long")).alias("chunk_id"),
            F.concat_ws(" ", F.slice("t", F.col("s"), CHUNK))
            .alias("chunk_text"),
            F.size(F.slice("t", F.col("s"), CHUNK)).cast("long")
            .alias("n_tokens"),
        )
    )


@query(
    "t7_vocabulary",
    oracle="""
    SELECT token,
           COUNT(*) AS tf,
           COUNT(DISTINCT doc_id) AS df
    FROM (
        SELECT doc_id, UNNEST(string_split(text, ' ')) AS token
        FROM documents
    )
    GROUP BY token
    HAVING COUNT(*) >= 5
    """,
)
def t7_vocabulary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary with term and document frequencies, min-count
    5 — the tokenizer-training input. One explode + one aggregation;
    at 100 TB the explode stays narrow and the agg partial-combines
    map-side, so the shuffle carries (token, partial counts), not
    token instances."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select("doc_id", F.explode(F.split(F.col("text"), " ")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("tf"),
             F.countDistinct("doc_id").alias("df"))
        .filter(F.col("tf") >= 5)
    )
