"""Driver-visible queries for the near-duplicate / similarity-search
operators (SURVEY.md §7 step 8 — the LLM-data-pipeline extension).

MinHash/SimHash signatures and LSH bucketing are engine-specific
(xxhash64 seeds, band layout), so there is no DuckDB-expressible
oracle; the driver records rows-only checks here, and the *exact*
validation lives in tests/test_dedup.py & tests/test_similarity.py
against brute-force oracles (n-gram Jaccard, exact cosine top-k).

Each query plants deterministic duplicates into the fixture corpus so
the result set is non-trivial and stable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from big_data_analytics_spark.catalog import load_table
from big_data_analytics_spark.operators.dedup import (
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_near_dup_pairs,
)
from big_data_analytics_spark.operators.similarity import (
    embedding_near_dup_pairs,
    lsh_topk,
)
from big_data_analytics_spark.queries import query


def _doc_corpus_with_dups(spark: SparkSession, sf_dir: str, n: int = 100) -> DataFrame:
    """Fixture docs + exact copies (+10000) + one-token edits (+20000)."""
    base = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < n).select("doc_id", "text")
    )
    exact = base.select((F.col("doc_id") + 10000).alias("doc_id"), "text")
    near = base.select(
        (F.col("doc_id") + 20000).alias("doc_id"),
        F.concat("text", F.lit(" appended")).alias("text"))
    return base.unionByName(exact).unionByName(near)


@query("d2_minhash_lsh_pairs")
def d2_minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(64) + 8-band LSH near-dup pairs at est-Jaccard ≥ 0.5
    over the planted-duplicate corpus (64 hashes: se ≈ 0.06, plenty at
    a 0.5 threshold and half the codegen weight of the 128-hash config
    the tests exercise). Validated against the exact n-gram-Jaccard
    oracle in tests/test_dedup.py."""
    return minhash_lsh_pairs(_doc_corpus_with_dups(spark, sf_dir),
                             num_hashes=64, bands=8,
                             threshold=0.5).orderBy("id_a", "id_b")


@query("d3_simhash_pairs")
def d3_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash-64 pairs within Hamming distance 3 (4-block pigeonhole
    LSH) over the planted-duplicate corpus."""
    return simhash_near_dup_pairs(_doc_corpus_with_dups(spark, sf_dir),
                                  max_hamming=3).orderBy("id_a", "id_b")


@query(
    "d4_ngram_jaccard_pairs",
    oracle="""
    WITH corpus AS (
        SELECT doc_id, text FROM documents WHERE doc_id < 100
        UNION ALL
        SELECT doc_id + 10000, text FROM documents WHERE doc_id < 100
        UNION ALL
        SELECT doc_id + 20000, concat(text, ' appended') FROM documents
        WHERE doc_id < 100
    ), shingled AS (
        SELECT doc_id,
               unnest(list_distinct(
                   list_transform(
                       generate_series(1, greatest(1, len(toks) - 2)),
                       i -> array_to_string(toks[i:i+2], ' ')))) AS shingle
        FROM (SELECT doc_id,
                     regexp_split_to_array(
                         trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS toks
              FROM corpus)
    ), sizes AS (
        SELECT doc_id, COUNT(*) AS n FROM shingled GROUP BY doc_id
    ), inter AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS common
        FROM shingled a JOIN shingled b USING (shingle)
        WHERE a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id
    )
    SELECT id_a, id_b,
           ROUND(CAST(common AS DOUBLE) / (sa.n + sb.n - common), 6) AS jaccard
    FROM inter
    JOIN sizes sa ON sa.doc_id = id_a
    JOIN sizes sb ON sb.doc_id = id_b
    WHERE CAST(common AS DOUBLE) / (sa.n + sb.n - common) >= 0.5
    """,
)
def d4_ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 3-word-shingle Jaccard pairs ≥ 0.5 — fully SQL-expressible,
    so this one DOES get a DuckDB oracle (the same inverted-index-join
    algorithm on both engines)."""
    pairs = ngram_jaccard_pairs(_doc_corpus_with_dups(spark, sf_dir),
                                threshold=0.5)
    return pairs.select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))


@query("v3_lsh_ann_topk")
def v3_lsh_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-hyperplane LSH approximate top-5 neighbors for the first
    3 vectors. Recall vs brute force measured in tests/test_similarity.py."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries_df = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding")
    corpus = emb.filter(F.col("vec_id") >= 3)
    return lsh_topk(corpus, queries_df, k=5, n_planes=4, n_tables=16)


@query("v4_embedding_near_dups")
def v4_embedding_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space near-duplicate pairs (cosine ≥ 0.999) with
    planted exact copies."""
    emb = load_table(spark, sf_dir, "embeddings")
    dups = emb.filter(F.col("vec_id") < 25).select(
        (F.col("vec_id") + 100000).alias("vec_id"), "embedding", "label")
    return embedding_near_dup_pairs(emb.unionByName(dups), threshold=0.999)
