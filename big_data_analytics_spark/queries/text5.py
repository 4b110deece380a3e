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

_K = 8  # window length in tokens (Lee et al. use 50 BPE tokens; the
        # fixture docs are 10-100 words, so 8 keeps spans observable)


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
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.split("text", " ").alias("t"))
    # The k-gram build (array_join over an interpreted slice, after a
    # ~tokens-per-doc explode) inherits the SCAN's split count; when
    # the corpus arrives as fewer splits than cores the whole
    # amplified stage serializes (A/B at a 50k-doc corpus on one
    # split: 5.4 -> 3.7 s warm repartitioned; at sf0.1 the same
    # unconditional repartition is a net LOSS, 1.5 -> 2.1 s — the
    # ml17/ml14 counter-lesson). Spread only when under-split: at
    # production scale the scan yields >= cores splits and this is a
    # no-op.
    para = spark.sparkContext.defaultParallelism
    if toks.rdd.getNumPartitions() < para:
        toks = toks.repartition(para)
    pos = (toks.filter(F.size("t") >= _K)
           .select("doc_id", "t",
                   F.explode(F.sequence(
                       F.lit(0), F.size("t") - _K)).alias("p")))
    kg = pos.select(
        "doc_id", "p",
        F.array_join(F.slice("t", F.col("p") + 1, _K), " ")
        .alias("kgram")).localCheckpoint()
    # the dup set is density-bounded, not corpus-bounded — but on
    # boilerplate-heavy corpora it can approach corpus size, and the
    # round-12 implicit-broadcast audit showed plan-time stats can't
    # be trusted on derived relations: checkpoint (the join reuses the
    # aggregation anyway), measure, pin (broadcast below the ceiling,
    # sort-merge past it)
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
        (F.max("p") - F.min("p") + _K).alias("covered"))
    per_doc = spans.groupBy("doc_id").agg(
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
