"""Transitive near-duplicate clustering as a graded query.

``operators/graph.py:connected_components`` (the transitive-dedup
engine behind ``dedup_by_components``) was previously validated only
in tests — its label-propagation fixed point has no single-pass SQL
form. It IS expressible as a recursive transitive closure, and DuckDB
supports ``WITH RECURSIVE``, so this module grades the full pipeline
pairs → components → per-doc cluster label against an independent
engine: the oracle re-derives the same exact-Jaccard pairs
(d4 machinery) and closes them with a recursive CTE, taking MIN over
the reachable set — exactly the operator's min-reachable-label
contract.

The planted corpus creates chain-shaped clusters on purpose: exact
copies (+10000), one-token edits (+20000), and two-token edits
(+30000). For short documents the +30000 variant falls below the 0.5
Jaccard threshold against the base text while staying above it
against +20000 — a transitive A~B~C, A≁C case that pairwise loser
removal would split and only true connected components merge.

Scale notes: the closure runs over *pairs* (near-dup output), never
the corpus; label propagation is one hash-join + min-agg per hop with
checkpointed lineage (operators/graph.py). The recursive-CTE oracle
is the small-scale truth, not the production algorithm.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from big_data_analytics_spark.catalog import load_table
from big_data_analytics_spark.operators.dedup import ngram_jaccard_pairs
from big_data_analytics_spark.operators.graph import connected_components
from big_data_analytics_spark.queries import query

_N_DOCS = 80

_CC1_ORACLE = f"""
    WITH RECURSIVE corpus AS (
        SELECT doc_id, text FROM documents WHERE doc_id < {_N_DOCS}
        UNION ALL
        SELECT doc_id + 10000, text FROM documents WHERE doc_id < {_N_DOCS}
        UNION ALL
        SELECT doc_id + 20000, concat(text, ' appended') FROM documents
        WHERE doc_id < {_N_DOCS}
        UNION ALL
        SELECT doc_id + 30000, concat(text, ' appended more') FROM documents
        WHERE doc_id < {_N_DOCS}
    ), shingled AS (
        SELECT doc_id,
               unnest(list_distinct(
                   list_transform(
                       generate_series(1, greatest(1, len(toks) - 2)),
                       i -> array_to_string(toks[i:i+2], ' ')))) AS shingle
        FROM (SELECT doc_id,
                     regexp_split_to_array(
                         trim(regexp_replace(lower(text), '\\s+', ' ', 'g')),
                         ' ') AS toks
              FROM corpus)
    ), sizes AS (
        SELECT doc_id, COUNT(*) AS n FROM shingled GROUP BY doc_id
    ), inter AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS common
        FROM shingled a JOIN shingled b USING (shingle)
        WHERE a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id
    ), pairs AS (
        SELECT id_a, id_b
        FROM inter
        JOIN sizes sa ON sa.doc_id = id_a
        JOIN sizes sb ON sb.doc_id = id_b
        WHERE CAST(common AS DOUBLE) / (sa.n + sb.n - common) >= 0.5
    ), edges AS (
        SELECT id_a AS u, id_b AS v FROM pairs
        UNION
        SELECT id_b AS u, id_a AS v FROM pairs
    ), reach AS (
        SELECT u AS node, u AS r FROM (SELECT DISTINCT u FROM edges)
        UNION
        SELECT reach.node, e.v FROM reach JOIN edges e ON reach.r = e.u
    )
    SELECT node AS doc_id, MIN(r) AS component
    FROM reach GROUP BY node
"""


def _cc_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    base = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < _N_DOCS).select("doc_id", "text")
    )
    exact = base.select((F.col("doc_id") + 10000).alias("doc_id"), "text")
    edit1 = base.select(
        (F.col("doc_id") + 20000).alias("doc_id"),
        F.concat("text", F.lit(" appended")).alias("text"))
    edit2 = base.select(
        (F.col("doc_id") + 30000).alias("doc_id"),
        F.concat("text", F.lit(" appended more")).alias("text"))
    return base.unionByName(exact).unionByName(edit1).unionByName(edit2)


@query("cc1_dedup_clusters", oracle=_CC1_ORACLE)
def cc1_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate cluster label (min reachable doc_id) for every
    document that participates in an exact-Jaccard ≥ 0.5 pair, via
    label-propagation connected components over the pair list — the
    transitive step of corpus dedup (keep one representative per
    cluster even when the cluster is a chain, not a clique).

    Reference parity: the reference dedups only by exact key
    (dataset_generator.py:269 set() construction); transitive
    near-dup clustering is the LLM-pipeline extension surface."""
    pairs = ngram_jaccard_pairs(_cc_corpus(spark, sf_dir), threshold=0.5)
    comp = connected_components(pairs, max_iter=12)
    return comp.select(F.col("node").alias("doc_id"), "component")


# cc2 shares cc1's entire corpus -> pairs -> recursive-closure prefix;
# only the final SELECT changes (the component labeling is demoted to
# a CTE and the canonical argmax layered on top).
_CC2_ORACLE = _CC1_ORACLE[:_CC1_ORACLE.rindex("    SELECT node AS doc_id")] + """
    , comp AS (
        SELECT node AS doc_id, MIN(r) AS component FROM reach GROUP BY node
    ), toks AS (
        SELECT doc_id, len(string_split(text, ' ')) AS n_toks FROM corpus
    ), ranked AS (
        SELECT c.component, c.doc_id, t.n_toks,
               ROW_NUMBER() OVER (PARTITION BY c.component
                                  ORDER BY t.n_toks DESC, c.doc_id) AS rn,
               SUM(t.n_toks) OVER (PARTITION BY c.component) AS tot,
               COUNT(*) OVER (PARTITION BY c.component) AS sz
        FROM comp c JOIN toks t USING (doc_id)
    )
    SELECT component,
           CAST(sz AS BIGINT) AS cluster_size,
           doc_id AS canonical_doc,
           CAST(n_toks AS BIGINT) AS canonical_toks,
           CAST(tot - n_toks AS BIGINT) AS toks_removed
    FROM ranked WHERE rn = 1 ORDER BY component
"""


@query("cc2_canonical_selection", oracle=_CC2_ORACLE)
def cc2_canonical_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep-BEST-per-cluster canonical selection — the step after
    transitive clustering in a real dedup pipeline: within each
    near-dup cluster keep the highest-quality variant (here: most
    tokens, doc_id tiebreak — prefer the longest surviving edit) and
    report the per-cluster reclaim manifest (size, canonical doc,
    canonical length, tokens removed). Keep-FIRST (t13/d1) is an
    arbitrary survivor; keep-best is what corpus curation actually
    ships. The argmax is a single min-over-struct aggregate
    ((-n_toks, doc_id) — no per-cluster window), so the whole
    post-clustering step is one mergeable aggregate.

    Scale shape: clustering is cc1's pair-list label propagation
    (never corpus-quadratic); the quality join touches each clustered
    doc once; the manifest aggregate partial-combines on the cluster
    label."""
    corpus = _cc_corpus(spark, sf_dir)
    pairs = ngram_jaccard_pairs(corpus, threshold=0.5)
    comp = connected_components(pairs, max_iter=12)
    toks = corpus.select(
        "doc_id", F.size(F.split("text", " ")).alias("n_toks"))
    labeled = (comp.select(F.col("node").alias("doc_id"), "component")
               .join(toks, "doc_id"))
    per = labeled.groupBy("component").agg(
        F.count(F.lit(1)).cast("long").alias("cluster_size"),
        F.min(F.struct((-F.col("n_toks")).alias("neg"),
                       F.col("doc_id").alias("d"))).alias("best"),
        F.sum("n_toks").alias("tot"))
    return (per.select(
        "component", "cluster_size",
        F.col("best.d").alias("canonical_doc"),
        (-F.col("best.neg")).cast("long").alias("canonical_toks"),
        (F.col("tot") + F.col("best.neg")).cast("long")
        .alias("toks_removed"))
        .orderBy("component"))
