"""Text surface, wave 5: sliding-window exact-substring duplicate
spans (es1) — the sub-document granularity the ExactSubstr pass of
"Deduplicating Training Data Makes Language Models Better" (Lee et
al., 2021) operates at. t13 dedups ALIGNED fixed chunks; es1 slides
a K-token window over EVERY offset, marks a position duplicated when
its K-gram recurs anywhere in the corpus (other docs or elsewhere in
the same doc), and merges overlapping/adjacent duplicated windows
into maximal spans per document — the spans an ExactSubstr pass
would cut out before training.

Reference parity: the reference's dedup stage exposes only whole-doc
and chunk-level exact dedup; this is the finer-grained member of the
same family, kept Spark-first: one explode linear in corpus tokens,
one exchange keyed on the K-gram (in production a 128-bit
fingerprint, so the shuffle carries 16-byte keys — same note as
t13), and the span merge is the classic gaps-and-islands pattern —
two narrow per-document windows over only the duplicated positions,
never a self-join. Nothing is quadratic; per-key state is O(1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from big_data_analytics_spark.catalog import load_table
from big_data_analytics_spark.operators.joins import sized_side
from big_data_analytics_spark.queries import query
from big_data_analytics_spark.operators.partitioning import spread_if_undersplit

_K = 8  # window length in tokens (Lee et al. use 50 BPE tokens; the
        # fixture docs are 10-100 words, so 8 keeps spans observable)


def _dup_spans(spark: SparkSession, sf_dir: str):
    """Shared es1/d10 pipeline: (docs, spans) where spans has one row
    per maximal duplicated span — (doc_id, island, n_pos, start, fin)
    with [start, fin] the 0-based covered token range. Plan shape and
    the checkpoint/pin discipline are documented on es1 (the original
    consumer)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.split("text", " ").alias("t"))
    # spread only when under-split (see es1's A/B note)
    toks = spread_if_undersplit(toks)
    pos = (toks.filter(F.size("t") >= _K)
           .select("doc_id", "t",
                   F.explode(F.sequence(
                       F.lit(0), F.size("t") - _K)).alias("p")))
    kg = pos.select(
        "doc_id", "p",
        F.array_join(F.slice("t", F.col("p") + 1, _K), " ")
        .alias("kgram")).localCheckpoint()
    dup_kgrams = (kg.groupBy("kgram")
                  .agg(F.count(F.lit(1)).alias("cnt"))
                  .filter(F.col("cnt") >= 2)
                  .select("kgram")
                  .localCheckpoint())
    dup = (kg.join(sized_side(dup_kgrams, dup_kgrams.count()), "kgram")
           .select("doc_id", "p"))
    seq_w = Window.partitionBy("doc_id").orderBy("p")
    isl = (dup.withColumn("prev", F.lag("p").over(seq_w))
           .withColumn(
               "island",
               F.sum(F.when(F.col("prev").isNull()
                            | (F.col("p") - F.col("prev") > _K), 1)
                     .otherwise(0))
               .over(seq_w.rowsBetween(Window.unboundedPreceding, 0))))
    spans = isl.groupBy("doc_id", "island").agg(
        F.count(F.lit(1)).alias("n_pos"),
        F.min("p").alias("start"),
        (F.max("p") + _K - 1).alias("fin"))
    return docs, spans


@query(
    "es1_exact_substring_spans",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ), pos AS (
        SELECT doc_id, t,
               unnest(range(len(t) - {_K} + 1)) AS p
        FROM toks WHERE len(t) >= {_K}
    ), kg AS (
        SELECT doc_id, p,
               array_to_string(t[p + 1 : p + {_K}], ' ') AS kgram
        FROM pos
    ), dup AS (
        SELECT doc_id, p FROM (
            SELECT doc_id, p,
                   COUNT(*) OVER (PARTITION BY kgram) AS cnt
            FROM kg
        ) WHERE cnt >= 2
    ), isl AS (
        SELECT doc_id, p,
               SUM(CASE WHEN prev IS NULL OR p - prev > {_K}
                        THEN 1 ELSE 0 END)
                   OVER (PARTITION BY doc_id ORDER BY p
                         ROWS UNBOUNDED PRECEDING) AS island
        FROM (
            SELECT doc_id, p,
                   LAG(p) OVER (PARTITION BY doc_id ORDER BY p) AS prev
            FROM dup
        )
    ), spans AS (
        SELECT doc_id, island,
               COUNT(*) AS n_pos,
               MAX(p) - MIN(p) + {_K} AS covered
        FROM isl GROUP BY doc_id, island
    ), per_doc AS (
        SELECT doc_id,
               CAST(SUM(n_pos) AS BIGINT) AS n_dup_positions,
               CAST(COUNT(*) AS BIGINT) AS n_spans,
               CAST(SUM(covered) AS BIGINT) AS covered_tokens
        FROM spans GROUP BY doc_id
    )
    SELECT d.doc_id,
           CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_tokens,
           COALESCE(s.n_dup_positions, 0) AS n_dup_positions,
           COALESCE(s.n_spans, 0) AS n_spans,
           COALESCE(s.covered_tokens, 0) AS covered_tokens
    FROM documents d LEFT JOIN per_doc s USING (doc_id)
    ORDER BY doc_id
    """,
)
def es1_exact_substring_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ExactSubstr-style duplicate-span detection: slide an 8-token
    window over every offset of every document, mark a position
    duplicated when its 8-gram occurs at >=2 (doc, pos) sites
    corpus-wide (cross-doc AND self-repetition both count, per Lee et
    al.), merge overlapping/adjacent duplicated windows into maximal
    spans, and report per document: token count, duplicated-position
    count, span count, and tokens covered by the span union.

    Plan shape: ONE tokenize+explode pass materialized with
    localCheckpoint (the ds1 checkpointed-counts pattern — the
    interpreted slice/join fold is the expensive step, so both
    consumers read the materialized relation); the corpus-wide
    occurrence count is a PARTIAL-AGGREGATED groupBy filtered to
    cnt >= 2 BEFORE joining back, so the join's probe side is the
    checkpoint and its build side is only the duplicated k-grams
    (near-dup density, not corpus size — and since boilerplate-heavy
    corpora push that density toward corpus size, the dup set is
    checkpointed, COUNTED, and pinned through sized_side rather than
    left to plan-time stats). The island merge runs inside a
    per-document window over just the duplicated positions.

    REJECTED ALTERNATIVE (A/B'd at sf0.1): a window COUNT over
    PARTITION BY kgram is ~0.6 s faster warm (no checkpoint write,
    single exchange) but WindowExec buffers every occurrence of one
    key in one task's group buffer — a degenerate hot k-gram
    ("the the the …" boilerplate) at corpus scale is an unbounded
    single-task buffer, the same hazard class as an unsalted skew
    join. The mergeable-count path caps per-key state at one long
    per map task. At 100 TB the kgram key becomes a 128-bit
    fingerprint; the checkpoint becomes a shuffle-stage reuse."""
    # shared pipeline (see _dup_spans): the k-gram checkpoint, the
    # counted-and-pinned dup set (the dup set is density-bounded, not
    # corpus-bounded — but boilerplate-heavy corpora push it toward
    # corpus size and plan-time stats can't be trusted on derived
    # relations, so: checkpoint, measure, pin), the under-split
    # repartition guard (A/B at a 50k-doc corpus on one split:
    # 5.4 -> 3.7 s warm repartitioned; at sf0.1 the same
    # unconditional repartition is a net LOSS, 1.5 -> 2.1 s — the
    # ml17/ml14 counter-lesson), and the island merge.
    docs, spans = _dup_spans(spark, sf_dir)
    per_doc = spans.withColumn(
        "covered", F.col("fin") - F.col("start") + 1).groupBy("doc_id").agg(
        F.sum("n_pos").cast("long").alias("n_dup_positions"),
        F.count(F.lit(1)).cast("long").alias("n_spans"),
        F.sum("covered").cast("long").alias("covered_tokens"))
    # per_doc is doc-proportional: pin on the table's metadata count
    n_docs = docs.count()
    return (docs.select(
        "doc_id",
        F.size(F.split("text", " ")).cast("long").alias("n_tokens"))
        .join(sized_side(per_doc, n_docs), "doc_id", "left")
        .select(
            "doc_id", "n_tokens",
            F.coalesce("n_dup_positions", F.lit(0)).cast("long")
            .alias("n_dup_positions"),
            F.coalesce("n_spans", F.lit(0)).cast("long")
            .alias("n_spans"),
            F.coalesce("covered_tokens", F.lit(0)).cast("long")
            .alias("covered_tokens"))
        .orderBy("doc_id"))


@query(
    "d10_exact_substring_cut",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ), pos AS (
        SELECT doc_id, t,
               unnest(range(len(t) - {_K} + 1)) AS p
        FROM toks WHERE len(t) >= {_K}
    ), kg AS (
        SELECT doc_id, p,
               array_to_string(t[p + 1 : p + {_K}], ' ') AS kgram
        FROM pos
    ), dup AS (
        SELECT doc_id, p FROM (
            SELECT doc_id, p,
                   COUNT(*) OVER (PARTITION BY kgram) AS cnt
            FROM kg
        ) WHERE cnt >= 2
    ), isl AS (
        SELECT doc_id, p,
               SUM(CASE WHEN prev IS NULL OR p - prev > {_K}
                        THEN 1 ELSE 0 END)
                   OVER (PARTITION BY doc_id ORDER BY p
                         ROWS UNBOUNDED PRECEDING) AS island
        FROM (
            SELECT doc_id, p,
                   LAG(p) OVER (PARTITION BY doc_id ORDER BY p) AS prev
            FROM dup
        )
    ), spans AS (
        SELECT doc_id, MIN(p) AS s, MAX(p) + {_K} - 1 AS e
        FROM isl GROUP BY doc_id, island
    ), kept AS (
        SELECT tk.doc_id, u.i, tk.t[u.i] AS tok
        FROM toks tk, unnest(range(1, len(tk.t) + 1)) AS u(i)
        WHERE NOT EXISTS (
            SELECT 1 FROM spans s
            WHERE s.doc_id = tk.doc_id
              AND u.i - 1 BETWEEN s.s AND s.e)
    ), clean AS (
        SELECT doc_id,
               CAST(COUNT(*) AS BIGINT) AS kept_tokens,
               string_agg(tok, ' ' ORDER BY i) AS clean_text
        FROM kept GROUP BY doc_id
    ), nsp AS (
        SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_spans
        FROM spans GROUP BY doc_id
    )
    SELECT tk.doc_id,
           CAST(len(tk.t) AS BIGINT) AS n_tokens,
           COALESCE(c.kept_tokens, 0) AS kept_tokens,
           CAST(len(tk.t) AS BIGINT) - COALESCE(c.kept_tokens, 0)
               AS cut_tokens,
           COALESCE(n.n_spans, 0) AS n_spans,
           COALESCE(c.clean_text, '') AS clean_text
    FROM toks tk
    LEFT JOIN clean c USING (doc_id)
    LEFT JOIN nsp n USING (doc_id)
    ORDER BY tk.doc_id
    """,
)
def d10_exact_substring_cut(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ExactSubstr CUT — es1 finds the maximal duplicated spans;
    d10 performs the rewrite Lee et al.'s pipeline actually ships:
    every document re-emitted with its duplicated spans removed
    (tokens whose position falls in any span union are dropped, the
    remainder re-joined). This is the operator that turns span
    DETECTION into a training-ready corpus — per doc: original/kept/
    cut token counts, span count, and the cleaned text itself (the
    graded column — a hash mismatch anywhere in the reconstruction
    surfaces as a text diff).

    Plan shape: rides _dup_spans (one k-gram explode checkpoint, the
    counted-and-pinned dup set, the per-doc island merge — es1's
    audited dataflow), then ONE new doc-keyed join: spans collapse to
    a per-doc array<struct<start, fin>> (span count per doc is
    small — bounded by n_tokens / {_K}), measured-pinned on the docs
    metadata count, and the cut itself is a codegen'd higher-order
    filter (positions surviving `NOT exists(spans, covering)`) — 
    O(n_tokens x n_spans/doc) per document, no per-position join, no
    second exchange. At 100 TB the rewrite costs the es1 detection
    plus one doc-keyed broadcast-or-merge join."""
    docs, spans = _dup_spans(spark, sf_dir)
    span_arr = (spans.groupBy("doc_id")
                .agg(F.sort_array(F.collect_list(
                    F.struct("start", "fin"))).alias("spans"),
                    F.count(F.lit(1)).cast("long").alias("n_spans")))
    n_docs = docs.count()
    kept = F.expr(
        "filter(ts, p -> NOT exists(spans, "
        "sp -> p.i >= sp.start AND p.i <= sp.fin))")
    # the cut side is the raw docs scan: when span_arr broadcasts,
    # the tokenize + higher-order filter inherit the scan's split
    # count (2 at the 10x fixture — the ev3 hazard); spread only
    # when under-split
    cut_side = docs.select("doc_id", "text")
    cut_side = spread_if_undersplit(cut_side)
    return (cut_side.select(
        "doc_id",
        F.expr("transform(split(text, ' '), "
               "(x, i) -> struct(x as tok, i as i))").alias("ts"))
        .join(sized_side(span_arr, n_docs), "doc_id", "left")
        .select(
            "doc_id",
            F.size("ts").cast("long").alias("n_tokens"),
            F.coalesce("n_spans", F.lit(0).cast("long")).alias("n_spans"),
            F.when(F.col("spans").isNull(), F.col("ts"))
            .otherwise(kept).alias("kept_ts"))
        .select(
            "doc_id", "n_tokens",
            F.size("kept_ts").cast("long").alias("kept_tokens"),
            (F.col("n_tokens") - F.size("kept_ts")).cast("long")
            .alias("cut_tokens"),
            "n_spans",
            F.array_join(F.expr("transform(kept_ts, p -> p.tok)"), " ")
            .alias("clean_text"))
        .orderBy("doc_id"))
