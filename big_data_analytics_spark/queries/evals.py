"""Generation-eval metrics over the documents corpus: ROUGE-N overlap.

The retrieval family (ir1–ir3) grades RANKINGS; an LLM-data platform
also grades GENERATIONS against references — ROUGE-N recall (clipped
n-gram overlap / reference n-gram count) is the standard summary/
paraphrase metric, and exactly the statistic a dedup pipeline reads as
"how much of doc A is reproduced in doc B". Reference parity: none —
the reference repo has no eval surface; this is LLM-pipeline
extension surface (SURVEY.md §2.9 family).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from big_data_analytics_spark.catalog import load_table
from big_data_analytics_spark.queries import query

_ROUGE_Q = 1_000_000_000.0  # recall quantization grid


@query(
    "ev1_rouge_n",
    oracle=f"""
    WITH d AS (
        SELECT doc_id, string_split(text, ' ') AS ts FROM documents
    ), uni AS (
        SELECT doc_id, u.tok, CAST(COUNT(*) AS BIGINT) AS c
        FROM d, unnest(ts) AS u(tok) GROUP BY doc_id, u.tok
    ), bi AS (
        SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS c FROM (
            SELECT doc_id,
                   unnest(list_transform(ts[1:len(ts) - 1],
                          (x, i) -> x || ' ' || ts[i + 1])) AS tok
            FROM d WHERE len(ts) >= 2)
        GROUP BY doc_id, tok
    ), u_ov AS (
        SELECT r.doc_id AS pair_id,
               CAST(SUM(LEAST(r.c, c.c)) AS BIGINT) AS u_overlap
        FROM uni r JOIN uni c
          ON c.doc_id = r.doc_id + 1 AND c.tok = r.tok
        WHERE r.doc_id % 2 = 0
        GROUP BY r.doc_id
    ), b_ov AS (
        SELECT r.doc_id AS pair_id,
               CAST(SUM(LEAST(r.c, c.c)) AS BIGINT) AS b_overlap
        FROM bi r JOIN bi c
          ON c.doc_id = r.doc_id + 1 AND c.tok = r.tok
        WHERE r.doc_id % 2 = 0
        GROUP BY r.doc_id
    ), pairs AS (
        SELECT r.doc_id AS pair_id,
               CAST(len(r.ts) AS BIGINT) AS u_total,
               CAST(GREATEST(len(r.ts) - 1, 0) AS BIGINT) AS b_total
        FROM d r JOIN d c ON c.doc_id = r.doc_id + 1
        WHERE r.doc_id % 2 = 0
    )
    SELECT p.pair_id,
           COALESCE(u.u_overlap, 0) AS u_overlap, p.u_total,
           COALESCE(b.b_overlap, 0) AS b_overlap, p.b_total,
           CAST(FLOOR({_ROUGE_Q} * COALESCE(u.u_overlap, 0) / p.u_total)
               AS BIGINT) AS rouge1_q,
           CAST(CASE WHEN p.b_total = 0 THEN 0
                ELSE FLOOR({_ROUGE_Q} * COALESCE(b.b_overlap, 0)
                           / p.b_total) END AS BIGINT) AS rouge2_q
    FROM pairs p
    LEFT JOIN u_ov u USING (pair_id)
    LEFT JOIN b_ov b USING (pair_id)
    """,
)
def ev1_rouge_n(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROUGE-1 / ROUGE-2 recall for every (reference, candidate)
    document pair — pairing is deterministic from the corpus (each
    even doc_id is the reference, doc_id+1 its candidate), the shape a
    real eval harness produces after joining generations back to their
    prompts. Clipped-count semantics (the ROUGE paper's): overlap =
    Σ_ngram min(count_ref, count_cand); recall = overlap / |ref
    ngrams|, floor-quantized to a 1e-9 grid from exact integer counts
    (the corpus-wide ROUGE is the consumer's one average — the
    ir2/ir3 discipline). Candidates with no bigrams (single-token
    references) report rouge2_q = 0 by convention.

    Scale shape: per-doc n-gram counting is one explode (bigrams via
    the in-array transform — JVM-side, no self-join) with map-side
    combine on (doc_id, ngram); the overlap join is keyed
    (pair_id, ngram) — shuffle volume proportional to the n-gram
    postings, never |docs|² (the pairing is an id equi-join, NOT a
    similarity cross-join). The final per-pair rollup partial-
    aggregates on pair_id. At 100 TB this is two token-proportional
    exchanges plus the pair rollup — embarrassingly parallel across
    pairs."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.split(F.col("text"), " ").alias("ts"))
    uni = (docs.select("doc_id", F.explode("ts").alias("tok"))
           .groupBy("doc_id", "tok")
           .agg(F.count(F.lit(1)).cast("long").alias("c")))
    bi = (docs.filter(F.size("ts") >= 2)
          .select("doc_id", F.explode(F.expr(
              "transform(slice(ts, 1, size(ts) - 1), "
              "(x, i) -> concat(x, ' ', ts[i + 1]))")).alias("tok"))
          .groupBy("doc_id", "tok")
          .agg(F.count(F.lit(1)).cast("long").alias("c")))

    def overlap(rel: DataFrame, out: str) -> DataFrame:
        ref = (rel.filter(F.col("doc_id") % 2 == 0)
               .select(F.col("doc_id").alias("pair_id"), "tok",
                       F.col("c").alias("cr")))
        cand = (rel.filter(F.col("doc_id") % 2 == 1)
                .select((F.col("doc_id") - 1).alias("pair_id"), "tok",
                        F.col("c").alias("cc")))
        return (ref.join(cand, ["pair_id", "tok"])
                .groupBy("pair_id")
                .agg(F.sum(F.least("cr", "cc")).cast("long").alias(out)))

    pairs = (docs.filter(F.col("doc_id") % 2 == 0)
             .select(F.col("doc_id").alias("pair_id"),
                     F.size("ts").cast("long").alias("u_total"),
                     F.greatest(F.size("ts") - 1, F.lit(0)).cast("long")
                     .alias("b_total"))
             .join(docs.filter(F.col("doc_id") % 2 == 1)
                   .select((F.col("doc_id") - 1).alias("pair_id")),
                   "pair_id"))
    return (pairs
            .join(overlap(uni, "u_overlap"), "pair_id", "left")
            .join(overlap(bi, "b_overlap"), "pair_id", "left")
            .select(
                "pair_id",
                F.coalesce("u_overlap", F.lit(0)).cast("long")
                .alias("u_overlap"),
                "u_total",
                F.coalesce("b_overlap", F.lit(0)).cast("long")
                .alias("b_overlap"),
                "b_total",
                F.floor(F.lit(_ROUGE_Q)
                        * F.coalesce("u_overlap", F.lit(0))
                        / F.col("u_total")).cast("long").alias("rouge1_q"),
                F.when(F.col("b_total") == 0, F.lit(0).cast("long"))
                .otherwise(
                    F.floor(F.lit(_ROUGE_Q)
                            * F.coalesce("b_overlap", F.lit(0))
                            / F.col("b_total")).cast("long"))
                .alias("rouge2_q")))
