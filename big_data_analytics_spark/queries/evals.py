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
from big_data_analytics_spark.operators.joins import sized_side
from big_data_analytics_spark.queries import query

_ROUGE_Q = 1_000_000_000.0  # recall quantization grid


def _ngram_row_bound(docs_raw: DataFrame) -> int:
    """Measured upper bound on the per-doc n-gram COUNT relations'
    row count, from the documents table's n_chars column (verified
    n_chars == length(text) by the fixture): every token is >= 1
    char + a separator, so tokens <= (chars + 1) / 2 per doc, and
    distinct (doc, ngram) rows <= token count for unigrams AND
    bigrams. One column-pruned scan of a single int64 column — the
    cheap measurement the sized_side discipline requires for derived
    relations (operators/joins.py)."""
    row = docs_raw.agg(
        F.sum("n_chars").alias("c"), F.count("*").alias("n")).collect()[0]
    return (int(row["c"]) + int(row["n"])) // 2 + 1


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
    raw = load_table(spark, sf_dir, "documents")
    # measured pin bound for the overlap joins (sized_side class:
    # both join sides are corpus-proportional n-gram count relations,
    # and plan-time stats UNDERESTIMATE post-explode aggregates — the
    # 10x probe showed a ~4.5M-row relation still planning broadcast)
    n_bound = _ngram_row_bound(raw)
    docs = raw.select(
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
        return (cand.join(sized_side(ref, n_bound), ["pair_id", "tok"])
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


@query(
    "ev2_bleu_precision",
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
               CAST(len(r.ts) AS BIGINT) AS ref_len,
               CAST(len(c.ts) AS BIGINT) AS cand_len,
               CAST(GREATEST(len(c.ts) - 1, 0) AS BIGINT) AS cand_bi
        FROM d r JOIN d c ON c.doc_id = r.doc_id + 1
        WHERE r.doc_id % 2 = 0
    )
    SELECT p.pair_id, p.ref_len, p.cand_len,
           COALESCE(u.u_overlap, 0) AS u_overlap,
           COALESCE(b.b_overlap, 0) AS b_overlap,
           CAST(FLOOR({_ROUGE_Q} * COALESCE(u.u_overlap, 0) / p.cand_len)
               AS BIGINT) AS prec1_q,
           CAST(CASE WHEN p.cand_bi = 0 THEN 0
                ELSE FLOOR({_ROUGE_Q} * COALESCE(b.b_overlap, 0)
                           / p.cand_bi) END AS BIGINT) AS prec2_q,
           CAST(CASE WHEN p.cand_bi = 0 THEN 0
                ELSE FLOOR({_ROUGE_Q}
                           * (COALESCE(u.u_overlap, 0)
                              * COALESCE(b.b_overlap, 0))
                           / (p.cand_len * p.cand_bi)) END
               AS BIGINT) AS bleu2_core_q,
           p.cand_len >= p.ref_len AS no_brevity_penalty,
           CAST(FLOOR({_ROUGE_Q} * LEAST(p.cand_len, p.ref_len)
                      / p.ref_len) AS BIGINT) AS len_ratio_q
    FROM pairs p
    LEFT JOIN u_ov u USING (pair_id)
    LEFT JOIN b_ov b USING (pair_id)
    """,
)
def ev2_bleu_precision(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BLEU-2 modified-precision components for every (reference,
    candidate) pair — the PRECISION side of the generation-eval coin
    (ev1 is ROUGE recall; BLEU asks how much of the CANDIDATE is
    licensed by the reference, so verbose over-generation is punished
    here and under-generation there). Same deterministic pairing as
    ev1 (even doc_id = reference, +1 = candidate) and the same clipped
    counts (Papineni et al.'s modified precision: overlap =
    Σ_ngram min(count_cand, count_ref)), with candidate n-gram totals
    as the denominators. Emits p1, p2, the geometric-mean core
    p1·p2 = (o1·o2)/(t1·t2) as ONE exact rational floor-quantized to
    the 1e-9 grid (BLEU-2 = BP·sqrt of it — the sqrt and the
    exp-form brevity penalty are the consumer's two IEEE calls on an
    already-quantized scalar; keeping exp/sqrt out of the graded
    columns keeps the hash gate engine-portable), the brevity flag
    (cand_len >= ref_len ⇒ BP = 1), and the clamped length ratio BP
    feeds on. Single-token candidates report the bigram columns as 0
    by convention (matching ev1's rouge2 convention).

    Scale shape: identical to ev1 — per-doc n-gram counting is one
    explode with map-side combine, the overlap joins are keyed
    (pair_id, ngram) so shuffle volume is postings-proportional
    (never |docs|²), and the per-pair rollup partial-aggregates on
    pair_id. o1·o2 ≤ len² ≤ 2^40 at any plausible document length, so
    the rational stays in exact int64/double-integer range."""
    raw = load_table(spark, sf_dir, "documents")
    # measured pin bound for the overlap joins (sized_side class:
    # both join sides are corpus-proportional n-gram count relations,
    # and plan-time stats UNDERESTIMATE post-explode aggregates — the
    # 10x probe showed a ~4.5M-row relation still planning broadcast)
    n_bound = _ngram_row_bound(raw)
    docs = raw.select(
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
        return (cand.join(sized_side(ref, n_bound), ["pair_id", "tok"])
                .groupBy("pair_id")
                .agg(F.sum(F.least("cr", "cc")).cast("long").alias(out)))

    pairs = (docs.filter(F.col("doc_id") % 2 == 0)
             .select(F.col("doc_id").alias("pair_id"),
                     F.size("ts").cast("long").alias("ref_len"))
             .join(docs.filter(F.col("doc_id") % 2 == 1)
                   .select((F.col("doc_id") - 1).alias("pair_id"),
                           F.size("ts").cast("long").alias("cand_len"),
                           F.greatest(F.size("ts") - 1, F.lit(0))
                           .cast("long").alias("cand_bi")),
                   "pair_id"))
    o1 = F.coalesce("u_overlap", F.lit(0)).cast("long")
    o2 = F.coalesce("b_overlap", F.lit(0)).cast("long")
    return (pairs
            .join(overlap(uni, "u_overlap"), "pair_id", "left")
            .join(overlap(bi, "b_overlap"), "pair_id", "left")
            .select(
                "pair_id", "ref_len", "cand_len",
                o1.alias("u_overlap"), o2.alias("b_overlap"),
                F.floor(F.lit(_ROUGE_Q) * o1 / F.col("cand_len"))
                .cast("long").alias("prec1_q"),
                F.when(F.col("cand_bi") == 0, F.lit(0).cast("long"))
                .otherwise(F.floor(F.lit(_ROUGE_Q) * o2
                                   / F.col("cand_bi")).cast("long"))
                .alias("prec2_q"),
                F.when(F.col("cand_bi") == 0, F.lit(0).cast("long"))
                .otherwise(
                    F.floor(F.lit(_ROUGE_Q) * (o1 * o2)
                            / (F.col("cand_len") * F.col("cand_bi")))
                    .cast("long")).alias("bleu2_core_q"),
                (F.col("cand_len") >= F.col("ref_len"))
                .alias("no_brevity_penalty"),
                F.floor(F.lit(_ROUGE_Q)
                        * F.least("cand_len", "ref_len")
                        / F.col("ref_len")).cast("long")
                .alias("len_ratio_q")))
