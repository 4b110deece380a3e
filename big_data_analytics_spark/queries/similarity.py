"""Similarity search over the ``embeddings`` table (array<float> column).

Brute-force cosine top-k is the correctness baseline; the scale path
(LSH-bucketed / IVF-style candidate pruning) lives in
``big_data_analytics_spark.operators.similarity`` and is validated
against this baseline in tests/.

Engine-portability notes baked into the queries:
- vectors are cast FLOAT[] → DOUBLE[] before any arithmetic;
- cosine is rounded to 6 dp *before* ranking, with a neighbor-id
  tie-break, so the top-k boundary is deterministic across engines
  (dot-product fold order differs by ~1 ulp between engines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from big_data_analytics_spark.catalog import load_table
from big_data_analytics_spark.queries import query

#: vec_ids below this bound act as the "query set"; the rest are corpus.
N_QUERY_VECS = 3
TOP_K = 5


def _as_double(col):
    return F.transform(col, lambda x: x.cast("double"))


def _dot(a, b):
    """Sequential-fold dot product of two DOUBLE arrays."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


# --------------------------------------------------------------------
# V1 — brute-force cosine top-k (ANN correctness baseline).
# --------------------------------------------------------------------
@query(
    "v1_cosine_topk",
    oracle=f"""
    WITH q AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
               WHERE vec_id < {N_QUERY_VECS}),
         c AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
               WHERE vec_id >= {N_QUERY_VECS}),
         scored AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               ROUND(list_dot_product(q.v, c.v)
                     / (sqrt(list_dot_product(q.v, q.v))
                        * sqrt(list_dot_product(c.v, c.v))), 6) AS cosine
        FROM q, c
    )
    SELECT query_id, neighbor_id, cosine
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                       ORDER BY cosine DESC, neighbor_id) AS rn
          FROM scored)
    WHERE rn <= {TOP_K}
    """,
)
def v1_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k nearest neighbors by cosine: broadcast the (small) query
    set against the corpus, score with a JVM-side array fold (no Python
    UDF), rank per query. At 100 TB the corpus side stays partitioned
    and only local top-k per partition shuffles (window over the tiny
    query_id key-space after per-partition pruning by Catalyst's
    WindowGroupLimit)."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", _as_double(F.col("embedding")).alias("v")
    )
    q = emb.filter(F.col("vec_id") < N_QUERY_VECS).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    c = emb.filter(F.col("vec_id") >= N_QUERY_VECS).select(
        F.col("vec_id").alias("neighbor_id"), F.col("v").alias("cv")
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .select(
            "query_id", "neighbor_id",
            F.round(
                _dot(F.col("qv"), F.col("cv"))
                / (F.sqrt(_dot(F.col("qv"), F.col("qv")))
                   * F.sqrt(_dot(F.col("cv"), F.col("cv")))),
                6,
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= TOP_K)
        .select("query_id", "neighbor_id", "cosine")
    )


# --------------------------------------------------------------------
# V2 — pairwise label-centroid similarity: grouped vector aggregation.
# --------------------------------------------------------------------
@query(
    "v2_label_centroid_norms",
    oracle="""
    WITH per_dim AS (
        SELECT label, i AS dim,
               SUM(embedding[i]::DOUBLE) AS s,
               COUNT(*) AS n_dim
        FROM embeddings, unnest(generate_series(1, 64)) AS t(i)
        GROUP BY label, i
    )
    SELECT label, MAX(n_dim) AS n,
           ROUND(sqrt(SUM(pow(s / n_dim, 2))), 6) AS centroid_norm
    FROM per_dim GROUP BY label
    """,
)
def v2_label_centroid_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid (element-wise mean of 64-dim vectors) and its
    L2 norm — grouped vector aggregation via posexplode + pivot-free
    re-assembly. The shuffle key is (label, dim): 64× fan-out but each
    partial is a scalar sum, so it scales like any hash aggregate."""
    emb = load_table(spark, sf_dir, "embeddings")
    exploded = emb.select(
        "label", F.posexplode(_as_double(F.col("embedding"))).alias("dim", "x")
    )
    per_dim = exploded.groupBy("label", "dim").agg(
        F.sum("x").alias("s"), F.count(F.lit(1)).alias("n_dim")
    )
    return (
        per_dim.groupBy("label")
        .agg(
            F.max("n_dim").alias("n"),
            F.round(
                F.sqrt(F.sum(F.pow(F.col("s") / F.col("n_dim"), 2))), 6
            ).alias("centroid_norm"),
        )
        .select("label", "n", "centroid_norm")
    )
