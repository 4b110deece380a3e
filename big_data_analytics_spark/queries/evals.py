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

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from big_data_analytics_spark.catalog import load_table
from big_data_analytics_spark.queries import query
from big_data_analytics_spark.operators.partitioning import spread_if_undersplit

_ROUGE_Q = 1_000_000_000.0  # recall quantization grid

# (r15: the _BOUND_CACHE measured-pin machinery that sized the old
# (pair_id, ngram) overlap JOINS is gone with the joins themselves —
# the clipped overlap now rides one side-conditional aggregation; see
# ev1's overlap().)


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

    Scale shape: per-doc n-gram extraction is one explode (bigrams via
    the in-array transform — JVM-side, no self-join); the clipped
    overlap is ONE side-conditional aggregation keyed (pair_id, ngram)
    with map-side combine (r15 — the former per-doc count + ref/cand
    split + (pair_id, ngram) equi-join paid three postings-sized
    exchanges per n-gram level for the same numbers). Shuffle volume
    stays postings-proportional, never |docs|². The final per-pair
    rollup partial-aggregates on pair_id. At 100 TB this is one
    token-proportional exchange per n-gram level plus the pair rollup
    — embarrassingly parallel across pairs."""
    raw = load_table(spark, sf_dir, "documents")
    docs = raw.select(
        "doc_id", F.split(F.col("text"), " ").alias("ts"))
    # n-gram extraction amplifies each doc ~2x tokens; the explode
    # stages inherit the scan's split count (2 at the 10x fixture) —
    # the ev3/ev4 under-split hazard. Spread only when under-split.
    docs = spread_if_undersplit(docs)
    uni = docs.select("doc_id", F.explode("ts").alias("tok"))
    bi = (docs.filter(F.size("ts") >= 2)
          .select("doc_id", F.explode(F.expr(
              "transform(slice(ts, 1, size(ts) - 1), "
              "(x, i) -> concat(x, ' ', ts[i + 1]))")).alias("tok")))

    def overlap(rel: DataFrame, out: str) -> DataFrame:
        # clipped overlap WITHOUT the (pair_id, tok) join (r15): both
        # pair members group under pair_id = doc_id - doc_id%2 with
        # side-conditional counts, so ONE (pair_id, tok) aggregation
        # yields min(count_ref, count_cand) per n-gram. The old shape
        # counted per (doc_id, tok), split ref/cand, and re-exchanged
        # BOTH sides onto (pair_id, tok) for an equi-join — three
        # postings-sized exchanges and a measured-pin join per n-gram
        # level; now one exchange, no join, no pin. least(cr, cc) is
        # 0 whenever a token is absent from either side — exactly the
        # inner join's contribution. Unpaired docs survive to here but
        # the final pairs join (both members required) drops them,
        # as before.
        return (rel.groupBy((F.col("doc_id") - F.col("doc_id") % 2)
                            .alias("pair_id"), "tok")
                .agg(F.sum((F.col("doc_id") % 2 == 0).cast("long"))
                     .alias("cr"),
                     F.sum((F.col("doc_id") % 2 == 1).cast("long"))
                     .alias("cc"))
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

    Scale shape: identical to ev1 — one explode per n-gram level and
    the joinless side-conditional clipped-overlap aggregation (r15),
    postings-proportional shuffles (never |docs|²), per-pair rollup
    partial-aggregated on pair_id. o1·o2 ≤ len² ≤ 2^40 at any
    plausible document length, so the rational stays in exact
    int64/double-integer range."""
    raw = load_table(spark, sf_dir, "documents")
    docs = raw.select(
        "doc_id", F.split(F.col("text"), " ").alias("ts"))
    # n-gram extraction amplifies each doc ~2x tokens; the explode
    # stages inherit the scan's split count (2 at the 10x fixture) —
    # the ev3/ev4 under-split hazard. Spread only when under-split.
    docs = spread_if_undersplit(docs)
    uni = docs.select("doc_id", F.explode("ts").alias("tok"))
    bi = (docs.filter(F.size("ts") >= 2)
          .select("doc_id", F.explode(F.expr(
              "transform(slice(ts, 1, size(ts) - 1), "
              "(x, i) -> concat(x, ' ', ts[i + 1]))")).alias("tok")))

    def overlap(rel: DataFrame, out: str) -> DataFrame:
        # clipped overlap WITHOUT the (pair_id, tok) join (r15): both
        # pair members group under pair_id = doc_id - doc_id%2 with
        # side-conditional counts, so ONE (pair_id, tok) aggregation
        # yields min(count_ref, count_cand) per n-gram. The old shape
        # counted per (doc_id, tok), split ref/cand, and re-exchanged
        # BOTH sides onto (pair_id, tok) for an equi-join — three
        # postings-sized exchanges and a measured-pin join per n-gram
        # level; now one exchange, no join, no pin. least(cr, cc) is
        # 0 whenever a token is absent from either side — exactly the
        # inner join's contribution. Unpaired docs survive to here but
        # the final pairs join (both members required) drops them,
        # as before.
        return (rel.groupBy((F.col("doc_id") - F.col("doc_id") % 2)
                            .alias("pair_id"), "tok")
                .agg(F.sum((F.col("doc_id") % 2 == 0).cast("long"))
                     .alias("cr"),
                     F.sum((F.col("doc_id") % 2 == 1).cast("long"))
                     .alias("cc"))
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


def _token_lev_batches(
        batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Arrow-batched token-level Levenshtein kernel for ev3,
    vectorized along BOTH free axes of the DP: within a row the
    insertion recurrence cur[j] = min_k<=j (base[k] + j - k) becomes
    j + cummin(base - j) (removing the sequential scan), and across
    the BATCH every pair advances its DP row in the same numpy call —
    one (rows, max_m+1) matrix per token position instead of one
    ~max_m vector op per pair per position. The cross-pair form is
    what makes the kernel scale: the per-pair loop spent ~3 us of
    numpy dispatch per (pair, position) and clocked 18.9 s at the 10x
    fixture; this form runs the same fixture in ~3 s (A/B in
    SCALE.md). Tokens are batch-factorized to int codes once
    (pd.factorize over the concatenated batch vocabulary); rows
    shorter than the batch maximum freeze behind an active mask, and
    padded candidate cells never corrupt real cells because the DP
    only reads leftward/upward. Pure passthrough otherwise — every
    relational column is computed JVM-side before/after this map."""
    for pdf in batches:
        rows = len(pdf)
        if rows == 0:
            yield pdf.assign(tok_dist=np.array([], dtype=np.int64))[
                ["pair_id", "ref_len", "cand_len", "ref_chars",
                 "char_dist", "tok_dist"]]
            continue
        a_lists = [np.asarray(x, dtype=object) for x in pdf["rts"]]
        b_lists = [np.asarray(x, dtype=object) for x in pdf["cts"]]
        n_arr = np.array([len(x) for x in a_lists], dtype=np.int64)
        m_arr = np.array([len(x) for x in b_lists], dtype=np.int64)
        codes, _ = pd.factorize(np.concatenate(a_lists + b_lists))
        bounds = np.cumsum(np.concatenate([n_arr, m_arr]))
        max_n, max_m = int(n_arr.max()), int(m_arr.max())
        a_mat = np.full((rows, max_n), -1, dtype=np.int64)
        b_mat = np.full((rows, max_m), -2, dtype=np.int64)
        start = 0
        for r, end in enumerate(bounds[:rows]):
            a_mat[r, :end - start] = codes[start:end]
            start = end
        for r, end in enumerate(bounds[rows:]):
            b_mat[r, :end - start] = codes[start:end]
            start = end
        jm = np.arange(max_m + 1, dtype=np.int64)
        prev = np.broadcast_to(jm, (rows, max_m + 1)).copy()
        base = np.empty((rows, max_m + 1), dtype=np.int64)
        for i in range(1, max_n + 1):
            active = n_arr >= i
            if not active.any():
                break
            np.minimum(prev[:, :-1] + (a_mat[:, i - 1, None] != b_mat),
                       prev[:, 1:] + 1, out=base[:, 1:])
            base[:, 0] = i
            cur = jm + np.minimum.accumulate(base - jm, axis=1)
            prev = np.where(active[:, None], cur, prev)
        out = prev[np.arange(rows), m_arr]
        yield pd.DataFrame({
            "pair_id": pdf["pair_id"], "ref_len": pdf["ref_len"],
            "cand_len": pdf["cand_len"], "ref_chars": pdf["ref_chars"],
            "char_dist": pdf["char_dist"], "tok_dist": out})


@query(
    "ev3_token_edit_distance",
    oracle=f"""
    WITH d AS (
        SELECT doc_id, text, string_split(text, ' ') AS ts,
               strlen(text) <> length(text) AS non_ascii
        FROM documents
    ), tok AS (
        SELECT doc_id, (doc_id // 2) * 2 AS pair_id, u.i, ts[u.i] AS tok
        FROM d, unnest(range(1, len(ts) + 1)) AS u(i)
    ), codes AS (
        SELECT pair_id, tok,
               32 + CAST(dense_rank() OVER (PARTITION BY pair_id
                                            ORDER BY tok) AS INT) AS code
        FROM (SELECT DISTINCT pair_id, tok FROM tok)
    ), enc AS (
        SELECT t.doc_id, t.pair_id,
               string_agg(chr(c.code), '' ORDER BY t.i) AS s
        FROM tok t JOIN codes c
          ON c.pair_id = t.pair_id AND c.tok = t.tok
        GROUP BY t.doc_id, t.pair_id
    ), vocab AS (
        SELECT pair_id, MAX(code) - 32 AS v FROM codes GROUP BY pair_id
    )
    SELECT r.doc_id AS pair_id,
           CAST(len(r.ts) AS BIGINT) AS ref_len,
           CAST(len(c.ts) AS BIGINT) AS cand_len,
           CAST(length(r.text) AS BIGINT) AS ref_chars,
           CAST(CASE WHEN v.v > 94 THEN NULL
                ELSE levenshtein(er.s, ec.s) END AS BIGINT) AS tok_dist,
           CAST(CASE WHEN r.non_ascii OR c.non_ascii THEN NULL
                ELSE levenshtein(r.text, c.text) END AS BIGINT)
               AS char_dist,
           CAST(CASE WHEN v.v > 94 THEN NULL
                ELSE FLOOR({_ROUGE_Q} * levenshtein(er.s, ec.s)
                           / len(r.ts)) END AS BIGINT) AS wer_q,
           CAST(CASE WHEN r.non_ascii OR c.non_ascii THEN NULL
                ELSE FLOOR({_ROUGE_Q} * levenshtein(r.text, c.text)
                           / length(r.text)) END AS BIGINT) AS cer_q
    FROM d r
    JOIN d c ON c.doc_id = r.doc_id + 1
    JOIN enc er ON er.doc_id = r.doc_id
    JOIN enc ec ON ec.doc_id = c.doc_id
    JOIN vocab v ON v.pair_id = r.doc_id
    WHERE r.doc_id % 2 = 0
    """,
)
def ev3_token_edit_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word error rate / character error rate for every (reference,
    candidate) document pair — the EDIT-DISTANCE leg of the generation
    eval family (ev1 grades recall of n-grams, ev2 precision; WER
    grades the minimal token edit script, the standard ASR/translation
    error metric and the strictest near-duplicate signal short of
    exact match). Same deterministic pairing as ev1/ev2 (even doc_id =
    reference, +1 = candidate). WER = token-Levenshtein / ref tokens,
    CER = char-Levenshtein / ref chars, both floor-quantized to the
    1e-9 grid from exact integer distances.

    Oracle independence is by CONSTRUCTION here (the standing policy's
    strongest form): the implementation runs a numpy DP over token
    arrays; the oracle never runs a DP — it remaps each pair's tokens
    to single-byte codes (DuckDB dense_rank + chr) and calls DuckDB's
    byte-based levenshtein on the coded strings, which equals
    token-level distance exactly while per-pair vocabularies stay
    <= 94 (fixture max: 31; the oracle NULLs out past the bound, so
    misapplication fails the gate loudly). char_dist equates DuckDB's
    byte metric with Spark's codepoint metric via the ASCII guard
    column (non-ASCII text NULLs out rather than silently diverging).

    Scale shape: the pairing is a pair_id equi-join (corpus-
    proportional shuffle, never |docs|^2); char distance runs JVM-side
    (F.levenshtein inside codegen); the token DP is the one genuinely
    non-relational kernel, so it runs as an Arrow-batched mapInPandas
    over already-joined rows — O(ref_len * cand_len) per pair, bounded
    by document length, embarrassingly parallel across pairs, zero
    extra exchanges (the relational columns ride through the map). At
    100 TB the cost is the pair join plus a compute-bound scan."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", F.split(F.col("text"), " ").alias("ts"))
    ref = docs.filter(F.col("doc_id") % 2 == 0).select(
        F.col("doc_id").alias("pair_id"),
        F.col("ts").alias("rts"),
        F.size("ts").cast("long").alias("ref_len"),
        F.length("text").cast("long").alias("ref_chars"),
        F.col("text").alias("rtext"))
    cand = docs.filter(F.col("doc_id") % 2 == 1).select(
        (F.col("doc_id") - 1).alias("pair_id"),
        F.col("ts").alias("cts"),
        F.size("ts").cast("long").alias("cand_len"),
        F.col("text").alias("ctext"))
    pairs = ref.join(cand, "pair_id").select(
        "pair_id", "ref_len", "cand_len", "ref_chars",
        "rtext", "ctext", "rts", "cts")
    # the pair join is broadcast, so the compute stages inherit the
    # SCAN's split count — 2 splits at the 10x fixture, serializing
    # ~1.9e10 char-DP cells (JVM levenshtein is O(chars^2) per pair)
    # plus the token kernel onto 2 cores (es1's under-split hazard;
    # measured 16.6 s warm at 10x). The repartition must sit BELOW
    # both distance computations: Catalyst keeps the levenshtein
    # projection above the exchange only if it is added after — with
    # the guard correctly placed both distances fan out to all cores
    # (3.4 s warm at 10x, the A/B in SCALE.md). No-op whenever the
    # scan already yields >= cores splits (sf0.1 and any production
    # layout).
    pairs = spread_if_undersplit(pairs)
    pairs = (pairs
             .withColumn("char_dist",
                         F.levenshtein("rtext", "ctext").cast("long"))
             .select("pair_id", "ref_len", "cand_len", "ref_chars",
                     "char_dist", "rts", "cts"))
    dists = pairs.mapInPandas(
        _token_lev_batches,
        schema=("pair_id long, ref_len long, cand_len long, "
                "ref_chars long, char_dist long, tok_dist long"))
    return dists.select(
        "pair_id", "ref_len", "cand_len", "ref_chars", "tok_dist",
        "char_dist",
        F.floor(F.lit(_ROUGE_Q) * F.col("tok_dist")
                / F.col("ref_len")).cast("long").alias("wer_q"),
        F.floor(F.lit(_ROUGE_Q) * F.col("char_dist")
                / F.col("ref_chars")).cast("long").alias("cer_q"))


@query(
    "ev4_chrf",
    oracle=f"""
    WITH d AS (
        SELECT doc_id, replace(text, ' ', '') AS s FROM documents
    ), g2 AS (
        SELECT doc_id, gram, CAST(COUNT(*) AS BIGINT) AS c FROM (
            SELECT doc_id,
                   unnest(list_transform(range(1, len(s)), i -> s[i:i+1]))
                       AS gram
            FROM d WHERE len(s) >= 2)
        GROUP BY doc_id, gram
    ), g3 AS (
        SELECT doc_id, gram, CAST(COUNT(*) AS BIGINT) AS c FROM (
            SELECT doc_id,
                   unnest(list_transform(range(1, len(s) - 1),
                          i -> s[i:i+2])) AS gram
            FROM d WHERE len(s) >= 3)
        GROUP BY doc_id, gram
    ), ov2 AS (
        SELECT r.doc_id AS pair_id,
               CAST(SUM(LEAST(r.c, c.c)) AS BIGINT) AS o
        FROM g2 r JOIN g2 c
          ON c.doc_id = r.doc_id + 1 AND c.gram = r.gram
        WHERE r.doc_id % 2 = 0 GROUP BY r.doc_id
    ), ov3 AS (
        SELECT r.doc_id AS pair_id,
               CAST(SUM(LEAST(r.c, c.c)) AS BIGINT) AS o
        FROM g3 r JOIN g3 c
          ON c.doc_id = r.doc_id + 1 AND c.gram = r.gram
        WHERE r.doc_id % 2 = 0 GROUP BY r.doc_id
    ), pairs AS (
        SELECT r.doc_id AS pair_id,
               CAST(GREATEST(len(r.s) - 1, 0) AS BIGINT) AS tr2,
               CAST(GREATEST(len(c.s) - 1, 0) AS BIGINT) AS tc2,
               CAST(GREATEST(len(r.s) - 2, 0) AS BIGINT) AS tr3,
               CAST(GREATEST(len(c.s) - 2, 0) AS BIGINT) AS tc3
        FROM d r JOIN d c ON c.doc_id = r.doc_id + 1
        WHERE r.doc_id % 2 = 0
    )
    SELECT p.pair_id,
           COALESCE(o2.o, 0) AS o2, p.tr2, p.tc2,
           COALESCE(o3.o, 0) AS o3, p.tr3, p.tc3,
           CAST(CASE WHEN p.tr2 + p.tc2 = 0 THEN 0
                ELSE FLOOR({_ROUGE_Q} * 2 * COALESCE(o2.o, 0)
                           / (p.tr2 + p.tc2)) END AS BIGINT) AS chrf2_q,
           CAST(CASE WHEN p.tr3 + p.tc3 = 0 THEN 0
                ELSE FLOOR({_ROUGE_Q} * 2 * COALESCE(o3.o, 0)
                           / (p.tr3 + p.tc3)) END AS BIGINT) AS chrf3_q
    FROM pairs p
    LEFT JOIN ov2 o2 USING (pair_id)
    LEFT JOIN ov3 o3 USING (pair_id)
    """,
)
def ev4_chrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """chrF — character n-gram F1 (n = 2, 3) for every (reference,
    candidate) pair: the tokenization-free generation metric (Popovic
    2015's chrF with F-beta=1), robust to word-segmentation drift that
    whips ev1/ev2's token n-grams around. Standard chrF strips
    whitespace before extracting char n-grams; both engines do. With
    clipped overlap o shared by precision (o/tc) and recall (o/tr),
    F1 collapses to the exact rational 2*o/(tc+tr) — one floor-
    quantization per n, no intermediate IEEE division. Pairs too short
    for an n-gram on BOTH sides report 0 by ev1's convention.

    Scale shape: identical to ev1 — char n-gram extraction is an
    in-array transform + one explode (no self-join), and the clipped
    overlap is the joinless side-conditional (pair_id, gram)
    aggregation (r15; the former per-doc count + equi-join and its
    measured pin are gone), per-pair rollup map-side combinable.
    Postings-proportional shuffles throughout; char grams are ~5x
    token grams in row count but each row is 2-3 bytes of key."""
    raw = load_table(spark, sf_dir, "documents")
    docs = raw.select(
        "doc_id", F.regexp_replace("text", " ", "").alias("s"))
    # char-gram extraction amplifies each doc ~n_chars x 2; the
    # explode stages inherit the scan's split count (2 at the 10x
    # fixture), serializing the map side of both gram counts (es1's
    # under-split hazard). Spread only when under-split.
    docs = spread_if_undersplit(docs)

    def grams(n: int) -> DataFrame:
        return (docs.filter(F.length("s") >= n)
                .select("doc_id", F.explode(F.expr(
                    f"transform(sequence(1, length(s) - {n - 1}), "
                    f"i -> substring(s, i, {n}))")).alias("gram")))

    def overlap(rel: DataFrame, out: str) -> DataFrame:
        # joinless clipped overlap — the ev1/ev2 r15 rewrite, char
        # flavor (see ev1's overlap for the derivation)
        return (rel.groupBy((F.col("doc_id") - F.col("doc_id") % 2)
                            .alias("pair_id"), "gram")
                .agg(F.sum((F.col("doc_id") % 2 == 0).cast("long"))
                     .alias("cr"),
                     F.sum((F.col("doc_id") % 2 == 1).cast("long"))
                     .alias("cc"))
                .groupBy("pair_id")
                .agg(F.sum(F.least("cr", "cc")).cast("long").alias(out)))

    pairs = (docs.filter(F.col("doc_id") % 2 == 0)
             .select(F.col("doc_id").alias("pair_id"),
                     F.greatest(F.length("s") - 1, F.lit(0)).cast("long")
                     .alias("tr2"),
                     F.greatest(F.length("s") - 2, F.lit(0)).cast("long")
                     .alias("tr3"))
             .join(docs.filter(F.col("doc_id") % 2 == 1)
                   .select((F.col("doc_id") - 1).alias("pair_id"),
                           F.greatest(F.length("s") - 1, F.lit(0))
                           .cast("long").alias("tc2"),
                           F.greatest(F.length("s") - 2, F.lit(0))
                           .cast("long").alias("tc3")),
                   "pair_id"))

    def chrf(o: str, tr: str, tc: str):
        tot = F.col(tr) + F.col(tc)
        return (F.when(tot == 0, F.lit(0).cast("long"))
                .otherwise(F.floor(F.lit(_ROUGE_Q) * 2
                                   * F.coalesce(F.col(o), F.lit(0))
                                   / tot).cast("long")))

    return (pairs
            .join(overlap(grams(2), "o2"), "pair_id", "left")
            .join(overlap(grams(3), "o3"), "pair_id", "left")
            .select(
                "pair_id",
                F.coalesce("o2", F.lit(0)).cast("long").alias("o2"),
                "tr2", "tc2",
                F.coalesce("o3", F.lit(0)).cast("long").alias("o3"),
                "tr3", "tc3",
                chrf("o2", "tr2", "tc2").alias("chrf2_q"),
                chrf("o3", "tr3", "tc3").alias("chrf3_q")))
