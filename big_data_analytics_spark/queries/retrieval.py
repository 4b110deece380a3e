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

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from big_data_analytics_spark.catalog import load_table
from big_data_analytics_spark.operators.joins import sized_side
from big_data_analytics_spark.queries import query

_TERMS = ("hash", "join", "scan")
_K1 = 1.2
_B = 0.75
_TOP = 10

_TERMS_SQL = ", ".join(f"'{t}'" for t in _TERMS)

#: WITH-body shared by ir1 (ranking) and ir2 (NDCG eval): exact
#: integer tf/df/dl stats and the 1e-9-quantized BM25 score per doc.
_IR_CTE = f"""
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
"""

_BM25_ORACLE = _IR_CTE + f"""
    SELECT doc_id, bm25 FROM scored
    ORDER BY bm25 DESC, doc_id LIMIT {_TOP}
"""


def _tf_and_scored(spark: SparkSession, sf_dir: str):
    """The shared ir1/ir2 pipeline: (tf, scored) — per-(doc, term)
    exact term frequencies (postings of the query terms only) and the
    per-doc 1e-9-quantized BM25 score. Mirrors _IR_CTE exactly."""
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
    return tf, scored


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
    _, scored = _tf_and_scored(spark, sf_dir)
    return scored.orderBy(F.desc("bm25"), F.asc("doc_id")).limit(_TOP)


ir1_bm25_topk.__doc__ = ir1_bm25_topk.__doc__.format(
    TOP=_TOP, TERMS=_TERMS, K1=_K1, B=_B)


_NDCG_Q = 1e9  # per-rank gain quantization grid


@query(
    "ir2_ndcg_eval",
    oracle=_IR_CTE + f""", rel AS (
        SELECT doc_id, CAST(COUNT(DISTINCT token) AS BIGINT) AS rel
        FROM tf GROUP BY doc_id
    ), ranked AS (
        SELECT doc_id, bm25,
               ROW_NUMBER() OVER (ORDER BY bm25 DESC, doc_id) AS rk
        FROM scored
        ORDER BY bm25 DESC, doc_id LIMIT {_TOP}
    ), ideal AS (
        SELECT rel,
               ROW_NUMBER() OVER (ORDER BY rel DESC, doc_id) AS rk
        FROM rel WHERE rel > 0
        ORDER BY rel DESC, doc_id LIMIT {_TOP}
    )
    SELECT r.rk AS rank, r.doc_id, r.bm25, rel.rel,
           CAST(FLOOR({_NDCG_Q}
               * (CAST(2 AS DOUBLE) ^ rel.rel - 1.0)
               / (ln(CAST(r.rk + 1 AS DOUBLE)) / ln(2.0)))
               AS BIGINT) AS gain_q,
           CAST(FLOOR({_NDCG_Q}
               * (CAST(2 AS DOUBLE) ^ i.rel - 1.0)
               / (ln(CAST(i.rk + 1 AS DOUBLE)) / ln(2.0)))
               AS BIGINT) AS ideal_gain_q
    FROM ranked r
    JOIN rel ON r.doc_id = rel.doc_id
    JOIN ideal i ON i.rk = r.rk
    """,
)
def ir2_ndcg_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NDCG@{TOP} evaluation of the BM25 ranking — the retrieval-eval
    metric a corpus platform needs next to the ranker itself. Graded
    relevance is derived deterministically from the corpus: rel(doc) =
    number of DISTINCT query terms present (0–{NT}), the standard
    term-coverage grade. Per rank i: gain = (2^rel − 1)/log2(i+1) for
    the BM25 ordering, and the same for the IDEAL ordering (rel desc).
    Both are floor-quantized to a 1e-9 grid per rank and shipped as
    exact integers — NDCG = Σ gain_q / Σ ideal_gain_q is the
    consumer's one division (the ts5/ir1 discipline; a float DCG sum
    would be merge-order-dependent). The log2 is computed as
    ln(rk+1)/ln(2) with identical operation order on both engines.

    Scale shape: rides ir1's inverted-index pipeline (postings-bounded
    shuffle, broadcast df/stats); the two top-{TOP} cuts are
    TakeOrderedAndProject (per-partition heaps, no global sort), the
    relevance join broadcasts the {TOP}-row RANKED side (the
    postings-bounded rel relation is the probe side — it grows with
    the corpus), and the rank-aligned ideal join is
    {TOP}×{TOP}-bounded broadcast."""
    tf, scored = _tf_and_scored(spark, sf_dir)
    rel = (tf.groupBy("doc_id")
           .agg(F.countDistinct("token").cast("long").alias("rel")))
    from pyspark.sql import Window

    ranked = (scored.orderBy(F.desc("bm25"), F.asc("doc_id"))
              .limit(_TOP)
              .withColumn("rk", F.row_number().over(
                  Window.orderBy(F.desc("bm25"), F.asc("doc_id")))))
    ideal = (rel.filter(F.col("rel") > 0)
             .orderBy(F.desc("rel"), F.asc("doc_id"))
             .limit(_TOP)
             .withColumn("rk", F.row_number().over(
                 Window.orderBy(F.desc("rel"), F.asc("doc_id"))))
             .select("rk", F.col("rel").alias("ideal_rel")))

    def _gain(rel_col: str, rk_col: str):
        return F.expr(
            f"CAST(FLOOR({_NDCG_Q}"
            f" * (POW(CAST(2 AS DOUBLE), {rel_col}) - 1.0)"
            f" / (ln(CAST({rk_col} + 1 AS DOUBLE)) / ln(2.0)))"
            " AS BIGINT)")

    # broadcast the FIXED side: ranked is exactly TOP rows by
    # construction; rel is postings-bounded and GROWS with the corpus
    # (the round-12 audit caught the original broadcast(rel) shipping
    # the whole relevance relation to ship a 10-row join)
    return (rel
            .join(F.broadcast(ranked), "doc_id")
            .join(F.broadcast(ideal), "rk")
            .select(F.col("rk").alias("rank"), "doc_id", "bm25", "rel",
                    _gain("rel", "rk").alias("gain_q"),
                    _gain("ideal_rel", "rk").alias("ideal_gain_q")))


ir2_ndcg_eval.__doc__ = ir2_ndcg_eval.__doc__.format(
    TOP=_TOP, NT=len(_TERMS))


_MRR_TOP = 20      # ranking cut per query term
_TITLE_N = 10      # "title" = first 10 tokens; relevance ground truth
_RR_Q = 1_000_000_000.0  # reciprocal-rank / recall quantization grid


@query(
    "ir3_mrr_eval",
    oracle=f"""
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
        SELECT tf.token, tf.doc_id,
               CAST(FLOOR(
                   ln((CAST(n AS DOUBLE) - df + 0.5) / (df + 0.5) + 1.0)
                   * (CAST(tf AS DOUBLE) * ({_K1} + 1.0))
                   / (CAST(tf AS DOUBLE)
                      + {_K1} * (1.0 - {_B}
                                 + {_B} * CAST(dl AS DOUBLE)
                                   / (CAST(sdl AS DOUBLE)
                                      / CAST(n AS DOUBLE))))
                   * {_RR_Q}) AS BIGINT) AS s_q
        FROM tf JOIN df USING (token), stats
    ), ranked AS (
        SELECT token, doc_id,
               ROW_NUMBER() OVER (PARTITION BY token
                                  ORDER BY s_q DESC, doc_id) AS rk
        FROM scored
    ), rel AS (
        SELECT d.doc_id, t.token
        FROM docs d, (SELECT UNNEST([{_TERMS_SQL}]) AS token) t
        WHERE list_contains(d.toks[1:{_TITLE_N}], t.token)
    ), hits AS (
        SELECT r.token, r.rk
        FROM ranked r JOIN rel USING (token, doc_id)
        WHERE r.rk <= {_MRR_TOP}
    ), nrel AS (
        SELECT token, CAST(COUNT(*) AS BIGINT) AS n_rel
        FROM rel GROUP BY token
    )
    SELECT n.token AS term, n.n_rel,
           CAST(MIN(h.rk) AS BIGINT) AS first_rel_rank,
           CAST(COALESCE(FLOOR({_RR_Q} / MIN(h.rk)), 0) AS BIGINT) AS rr_q,
           CAST(COUNT(h.rk) AS BIGINT) AS hits_at_k,
           CAST(FLOOR({_RR_Q} * COUNT(h.rk) / n.n_rel) AS BIGINT)
               AS recall_q
    FROM nrel n LEFT JOIN hits h USING (token)
    GROUP BY n.token, n.n_rel
    """,
)
def ir3_mrr_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MRR@{TOP} / recall@{TOP} evaluation of per-term BM25 rankings —
    the third leg of the retrieval-eval family (ir1 ranks, ir2 grades
    rank quality by graded relevance, ir3 grades FIRST-HIT latency and
    coverage by binary relevance). Each query term in {TERMS} is
    evaluated as its own single-term query; binary relevance is
    derived deterministically from the corpus with a signal
    INDEPENDENT of the score being evaluated: rel(doc, term) = term
    appears in the document's first {TN} tokens (the title-match
    convention — tf-magnitude relevance would make the metric
    tautological). Per term: rank of the first relevant doc within the
    top-{TOP} cut, reciprocal rank and recall@{TOP} floor-quantized to
    a 1e-9 grid from exact integer ranks/counts (MRR = avg(rr_q)/1e9
    is the consumer's one division — the ir2 discipline).

    Scale shape: rides the ir1 inverted-index pattern (the explode
    filters to query-term postings map-side; df is |terms| rows,
    stats 1 row — both fixed-size broadcasts). The per-term ranking is
    row_number + rk<={TOP} filter, which Spark plans as
    WindowGroupLimit: each input partition keeps only its local
    top-{TOP} per term BEFORE the exchange (the o2g shape), so the
    per-term sort never sees more than |partitions|x{TOP} rows per
    term — no single-hot-partition window even though |terms| is
    tiny. The relevance relation is postings-bounded (slice + member
    test, no second tokenize), and the final per-term rollup is
    |terms| rows."""
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
    dfr = tf.groupBy("token").agg(F.count("*").alias("df"))
    nd = F.col("n").cast("double")
    idf = F.log((nd - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0)
    tfd = F.col("tf").cast("double")
    term_score = (idf * (tfd * (_K1 + 1.0))
                  / (tfd + _K1 * (1.0 - _B
                                  + _B * F.col("dl").cast("double")
                                  / (F.col("sdl").cast("double") / nd))))
    scored = (tf.join(F.broadcast(dfr), "token")
              .crossJoin(F.broadcast(stats))
              .select("token", "doc_id",
                      F.floor(term_score * _RR_Q).cast("long").alias("s_q")))
    w = Window.partitionBy("token").orderBy(F.desc("s_q"), F.asc("doc_id"))
    ranked = (scored.withColumn("rk", F.row_number().over(w))
              .filter(F.col("rk") <= _MRR_TOP))
    rel = (docs.select(
        "doc_id",
        F.explode(F.array(*[F.lit(t) for t in _TERMS])).alias("token"),
        F.slice("toks", 1, _TITLE_N).alias("title"))
        .filter(F.expr("array_contains(title, token)"))
        .select("doc_id", "token"))
    # ranked is FIXED-size by construction (<= |terms| x TOP = 60
    # rows, both constants) — broadcast it so the data-sized rel
    # relation joins map-side instead of shuffling through the SMJ
    # the post-window stats otherwise pick (round-12 plan audit)
    hits = (rel.join(F.broadcast(ranked), ["token", "doc_id"])
            .groupBy("token")
            .agg(F.min("rk").cast("long").alias("first_rel_rank"),
                 F.count("*").cast("long").alias("hits_at_k")))
    nrel = rel.groupBy("token").agg(
        F.count("*").cast("long").alias("n_rel"))
    return (nrel.join(F.broadcast(hits), "token", "left")
            .select(F.col("token").alias("term"), "n_rel",
                    "first_rel_rank",
                    F.coalesce(
                        F.floor(F.lit(_RR_Q) / F.col("first_rel_rank")),
                        F.lit(0)).cast("long").alias("rr_q"),
                    F.coalesce(F.col("hits_at_k"), F.lit(0)).cast("long")
                    .alias("hits_at_k"),
                    F.floor(F.lit(_RR_Q)
                            * F.coalesce(F.col("hits_at_k"), F.lit(0))
                            / F.col("n_rel")).cast("long")
                    .alias("recall_q")))


ir3_mrr_eval.__doc__ = ir3_mrr_eval.__doc__.format(
    TOP=_MRR_TOP, TERMS=_TERMS, TN=_TITLE_N)


@query(
    "ir4_map_eval",
    oracle=f"""
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
        SELECT tf.token, tf.doc_id,
               CAST(FLOOR(
                   ln((CAST(n AS DOUBLE) - df + 0.5) / (df + 0.5) + 1.0)
                   * (CAST(tf AS DOUBLE) * ({_K1} + 1.0))
                   / (CAST(tf AS DOUBLE)
                      + {_K1} * (1.0 - {_B}
                                 + {_B} * CAST(dl AS DOUBLE)
                                   / (CAST(sdl AS DOUBLE)
                                      / CAST(n AS DOUBLE))))
                   * {_RR_Q}) AS BIGINT) AS s_q
        FROM tf JOIN df USING (token), stats
    ), ranked AS (
        SELECT token, doc_id,
               ROW_NUMBER() OVER (PARTITION BY token
                                  ORDER BY s_q DESC, doc_id) AS rk
        FROM scored
    ), rel AS (
        SELECT d.doc_id, t.token
        FROM docs d, (SELECT UNNEST([{_TERMS_SQL}]) AS token) t
        WHERE list_contains(d.toks[1:{_TITLE_N}], t.token)
    ), hits AS (
        SELECT r.token,
               CAST(FLOOR({_RR_Q}
                    * ROW_NUMBER() OVER (PARTITION BY r.token
                                         ORDER BY r.rk)
                    / r.rk) AS BIGINT) AS p_q
        FROM ranked r JOIN rel USING (token, doc_id)
        WHERE r.rk <= {_MRR_TOP}
    ), nrel AS (
        SELECT token, CAST(COUNT(*) AS BIGINT) AS n_rel
        FROM rel GROUP BY token
    )
    SELECT n.token AS term, n.n_rel,
           CAST(COUNT(h.p_q) AS BIGINT) AS hits_at_k,
           CAST(FLOOR(COALESCE(SUM(h.p_q), 0)
                / LEAST(n.n_rel, {_MRR_TOP})) AS BIGINT) AS ap_q
    FROM nrel n LEFT JOIN hits h USING (token)
    GROUP BY n.token, n.n_rel
    """,
)
def ir4_map_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Average precision @{TOP} of per-term BM25 rankings — the fourth
    retrieval-eval leg (ir2 grades graded-relevance rank quality, ir3
    first-hit latency + coverage; AP is the order-sensitive summary a
    retrieval team actually tracks: it rewards putting EVERY relevant
    doc early, not just the first). Same deterministic binary
    relevance as ir3 (term appears in the doc's first {TN} tokens —
    independent of the score under evaluation). Per term: AP@{TOP} =
    (1 / min(n_rel, {TOP})) * sum over relevant ranks r of
    precision@r, where precision@r = (#relevant in top r) / r. Each
    precision term is floor-quantized to the 1e-9 grid from exact
    integer ranks (i-th hit at rank r contributes floor(Q*i/r); both
    operands are integers < 2^31 so the double product/quotient is
    exact to well past the floor boundary — same discipline as ir3's
    rr_q), so the quantized sum is exact and order-free; MAP =
    avg(ap_q)/1e9 is the consumer's one division.

    Scale shape: identical to ir3 up to the hits relation (postings-
    bounded explode, fixed-size df/stats broadcasts, WindowGroupLimit
    per-partition top-{TOP} before the per-term exchange). The extra
    work over ir3 is one window over the HITS relation — at most
    |terms| x {TOP} rows, constant-size — and the same |terms|-row
    rollup. Nothing new touches the corpus."""
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
    dfr = tf.groupBy("token").agg(F.count("*").alias("df"))
    nd = F.col("n").cast("double")
    idf = F.log((nd - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0)
    tfd = F.col("tf").cast("double")
    term_score = (idf * (tfd * (_K1 + 1.0))
                  / (tfd + _K1 * (1.0 - _B
                                  + _B * F.col("dl").cast("double")
                                  / (F.col("sdl").cast("double") / nd))))
    scored = (tf.join(F.broadcast(dfr), "token")
              .crossJoin(F.broadcast(stats))
              .select("token", "doc_id",
                      F.floor(term_score * _RR_Q).cast("long").alias("s_q")))
    w = Window.partitionBy("token").orderBy(F.desc("s_q"), F.asc("doc_id"))
    ranked = (scored.withColumn("rk", F.row_number().over(w))
              .filter(F.col("rk") <= _MRR_TOP))
    rel = (docs.select(
        "doc_id",
        F.explode(F.array(*[F.lit(t) for t in _TERMS])).alias("token"),
        F.slice("toks", 1, _TITLE_N).alias("title"))
        .filter(F.expr("array_contains(title, token)"))
        .select("doc_id", "token"))
    wh = Window.partitionBy("token").orderBy("rk")
    # same fixed-size broadcast as ir3's hits join (<= 60 rows)
    hits = (rel.join(F.broadcast(ranked), ["token", "doc_id"])
            .withColumn("i", F.row_number().over(wh))
            .select("token",
                    F.floor(F.lit(_RR_Q) * F.col("i") / F.col("rk"))
                    .cast("long").alias("p_q")))
    nrel = rel.groupBy("token").agg(
        F.count("*").cast("long").alias("n_rel"))
    return (nrel.join(F.broadcast(hits), "token", "left")
            .groupBy(F.col("token").alias("term"), "n_rel")
            .agg(F.count("p_q").cast("long").alias("hits_at_k"),
                 F.floor(F.coalesce(F.sum("p_q"), F.lit(0))
                         / F.least(F.col("n_rel"), F.lit(_MRR_TOP)))
                 .cast("long").alias("ap_q")))


ir4_map_eval.__doc__ = ir4_map_eval.__doc__.format(
    TOP=_MRR_TOP, TN=_TITLE_N)


_NEG_K = 10  # hard negatives mined per query term


@query(
    "ir5_hard_negatives",
    oracle=f"""
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
        SELECT tf.token, tf.doc_id,
               CAST(FLOOR(
                   ln((CAST(n AS DOUBLE) - df + 0.5) / (df + 0.5) + 1.0)
                   * (CAST(tf AS DOUBLE) * ({_K1} + 1.0))
                   / (CAST(tf AS DOUBLE)
                      + {_K1} * (1.0 - {_B}
                                 + {_B} * CAST(dl AS DOUBLE)
                                   / (CAST(sdl AS DOUBLE)
                                      / CAST(n AS DOUBLE))))
                   * {_RR_Q}) AS BIGINT) AS s_q
        FROM tf JOIN df USING (token), stats
    ), rel AS (
        SELECT d.doc_id, t.token
        FROM docs d, (SELECT UNNEST([{_TERMS_SQL}]) AS token) t
        WHERE list_contains(d.toks[1:{_TITLE_N}], t.token)
    ), neg AS (
        SELECT s.token, s.doc_id, s.s_q,
               ROW_NUMBER() OVER (PARTITION BY s.token
                                  ORDER BY s.s_q DESC, s.doc_id)
                   AS neg_rank
        FROM scored s LEFT JOIN rel r
          ON r.token = s.token AND r.doc_id = s.doc_id
        WHERE r.doc_id IS NULL
    )
    SELECT token AS term, CAST(neg_rank AS BIGINT) AS neg_rank,
           doc_id, s_q
    FROM neg WHERE neg_rank <= {_NEG_K}
    """,
)
def ir5_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining for retrieval/embedding training: per
    query term, the top-{K} HIGHEST-BM25-scoring documents that are
    NOT relevant (ir3's title-match ground truth) — exactly the
    triplet-loss negatives an embedding team mines from a lexical
    ranker ("looks right to BM25, is wrong by the labels"), and the
    fifth leg of the retrieval family (ir1 ranks, ir2/ir3/ir4 grade,
    ir5 exports training pairs). Deterministic output: score
    quantized on the 1e-9 grid, ties break on doc_id, binary
    relevance identical to ir3/ir4 so the family shares one ground
    truth.

    Scale shape: rides the ir1 inverted-index pattern (postings-only
    explode, |terms|-row df + 1-row stats broadcasts). The relevance
    EXCLUSION is a left-anti join keyed (token, doc_id) with the rel
    side measured-pinned (bound = |terms| x docs metadata count —
    rel is corpus-proportional, the audited class); the per-term
    top-{K} is row_number + filter, planned as WindowGroupLimit
    (per-partition local top-{K} before the per-term exchange — the
    o2g/ir3 shape). Nothing touches the corpus after the postings
    explode."""
    raw = load_table(spark, sf_dir, "documents")
    ndocs = raw.count()  # parquet metadata count — the cheap measure
    docs = raw.select(
        "doc_id", F.split(F.col("text"), " ").alias("toks"))
    dl = docs.select("doc_id", F.size("toks").alias("dl"))
    stats = dl.agg(F.count("*").alias("n"),
                   F.sum("dl").cast("long").alias("sdl"))
    tf = (docs.select("doc_id", F.size("toks").alias("dl"),
                      F.explode("toks").alias("token"))
          .filter(F.col("token").isin(*_TERMS))
          .groupBy("doc_id", "dl", "token")
          .agg(F.count("*").alias("tf")))
    dfr = tf.groupBy("token").agg(F.count("*").alias("df"))
    nd = F.col("n").cast("double")
    idf = F.log((nd - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0)
    tfd = F.col("tf").cast("double")
    term_score = (idf * (tfd * (_K1 + 1.0))
                  / (tfd + _K1 * (1.0 - _B
                                  + _B * F.col("dl").cast("double")
                                  / (F.col("sdl").cast("double") / nd))))
    scored = (tf.join(F.broadcast(dfr), "token")
              .crossJoin(F.broadcast(stats))
              .select("token", "doc_id",
                      F.floor(term_score * _RR_Q).cast("long").alias("s_q")))
    rel = (docs.select(
        "doc_id",
        F.explode(F.array(*[F.lit(t) for t in _TERMS])).alias("token"),
        F.slice("toks", 1, _TITLE_N).alias("title"))
        .filter(F.expr("array_contains(title, token)"))
        .select("doc_id", "token"))
    neg = scored.join(sized_side(rel, len(_TERMS) * ndocs),
                      ["token", "doc_id"], "left_anti")
    w = Window.partitionBy("token").orderBy(F.desc("s_q"), F.asc("doc_id"))
    return (neg.withColumn("neg_rank", F.row_number().over(w))
            .filter(F.col("neg_rank") <= _NEG_K)
            .select(F.col("token").alias("term"),
                    F.col("neg_rank").cast("long").alias("neg_rank"),
                    "doc_id", "s_q"))


ir5_hard_negatives.__doc__ = ir5_hard_negatives.__doc__.format(K=_NEG_K)
