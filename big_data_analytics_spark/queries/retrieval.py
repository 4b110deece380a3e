"""Full-text retrieval over the documents corpus: BM25 ranking as a
pure DataFrame plan. The reference's analytics surface stops at
aggregation; a training-data platform also needs search-shaped access
to its corpus (picking exemplar documents, building eval sets,
deduplicating against a query set), and BM25 is the standard lexical
scorer.

Portability: term/document frequencies and document lengths are exact
integers; the BM25 formula runs on identical doubles in both engines
and is rounded before ranking (ties break on doc_id).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from big_data_analytics_spark.catalog import load_table
from big_data_analytics_spark.queries import query

_TERMS = ("hash", "join", "scan")
_K1 = 1.2
_B = 0.75
_TOP = 10

_TERMS_SQL = ", ".join(f"'{t}'" for t in _TERMS)

_BM25_ORACLE = f"""
    WITH docs AS (
        SELECT doc_id, string_split(text, ' ') AS toks FROM documents
    ), dl AS (SELECT doc_id, len(toks) AS dl FROM docs),
    stats AS (
        SELECT COUNT(*) AS n, CAST(SUM(dl) AS BIGINT) AS sdl FROM dl
    ), tf AS (
        SELECT doc_id, dl, token, COUNT(*) AS tf FROM (
            SELECT doc_id, len(toks) AS dl, UNNEST(toks) AS token
            FROM docs)
        WHERE token IN ({_TERMS_SQL})
        GROUP BY doc_id, dl, token
    ), df AS (
        SELECT token, COUNT(*) AS df FROM tf GROUP BY token
    ), scored AS (
        SELECT tf.doc_id,
               ROUND(CAST(SUM(CAST(FLOOR(
                   ln((CAST(n AS DOUBLE) - df + 0.5) / (df + 0.5) + 1.0)
                   * (CAST(tf AS DOUBLE) * ({_K1} + 1.0))
                   / (CAST(tf AS DOUBLE)
                      + {_K1} * (1.0 - {_B}
                                 + {_B} * CAST(dl AS DOUBLE)
                                   / (CAST(sdl AS DOUBLE)
                                      / CAST(n AS DOUBLE))))
                   * 1000000000.0) AS BIGINT)) AS DOUBLE)
                     / 1000000000.0, 6) AS bm25
        FROM tf JOIN df USING (token), stats
        GROUP BY tf.doc_id
    )
    SELECT doc_id, bm25 FROM scored
    ORDER BY bm25 DESC, doc_id LIMIT {_TOP}
"""


@query("ir1_bm25_topk", oracle=_BM25_ORACLE)
def ir1_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-{TOP} retrieval for the query {TERMS} over the
    documents corpus (k1={K1}, b={B}, Robertson idf with the +1
    floor). Term frequencies, document frequencies, document lengths,
    and the corpus length sum are all exact integers; per-(doc, term)
    partial scores are floor-quantized to a 1e-9 grid and summed
    exactly (the ml9 discipline — a 3-term double sum would be
    merge-order-dependent), then rounded to 6 decimals before the
    ranking cut.

    Plan shape — the inverted-index scoring pattern: the explode
    filters to query-term postings IMMEDIATELY (non-matching tokens
    never leave the map side), doc length rides along functionally
    (no separate doc-length join), the per-term df relation
    (|query terms| rows) and the single-row corpus stats broadcast,
    and the final cut is TakeOrderedAndProject — no global sort. At
    100 TB the shuffled state is one row per (matching doc, query
    term): proportional to the postings of the query, not the
    corpus."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.split(F.col("text"), " ").alias("toks"))
    dl = docs.select("doc_id", F.size("toks").alias("dl"))
    stats = dl.agg(F.count("*").alias("n"),
                   F.sum("dl").cast("long").alias("sdl"))
    tf = (docs.select("doc_id", F.size("toks").alias("dl"),
                      F.explode("toks").alias("token"))
          .filter(F.col("token").isin(*_TERMS))
          .groupBy("doc_id", "dl", "token")
          .agg(F.count("*").alias("tf")))
    df = tf.groupBy("token").agg(F.count("*").alias("df"))
    nd = F.col("n").cast("double")
    avgdl = F.col("sdl").cast("double") / nd
    idf = F.log((nd - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0)
    tfd = F.col("tf").cast("double")
    term_score = (idf * (tfd * (_K1 + 1.0))
                  / (tfd + _K1 * (1.0 - _B
                                  + _B * F.col("dl").cast("double")
                                  / avgdl)))
    scored = (tf.join(F.broadcast(df), "token")
              .crossJoin(F.broadcast(stats))
              .groupBy("doc_id")
              .agg(F.round(
                  F.sum(F.floor(term_score * 1_000_000_000.0)
                        .cast("long")).cast("double") / 1_000_000_000.0,
                  6).alias("bm25")))
    return scored.orderBy(F.desc("bm25"), F.asc("doc_id")).limit(_TOP)


ir1_bm25_topk.__doc__ = ir1_bm25_topk.__doc__.format(
    TOP=_TOP, TERMS=_TERMS, K1=_K1, B=_B)
