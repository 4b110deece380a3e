"""Graph analytics over relational data: PageRank on the part
co-purchase graph.

Parts that appear in the same order are linked; PageRank over that
graph surfaces "hub" parts the way it surfaces hub pages — a classic
iterative-dataflow workload the reference's pandas surface cannot
express at scale. The operator (operators/graph.py:pagerank) runs
integer micro-unit arithmetic so the fixed-point result is
bit-identical across engines, which lets an *iterative* algorithm be
hash-verified against an unrolled-CTE DuckDB oracle — rare for graph
workloads, where floating-point drift usually forces tolerance
checks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from big_data_analytics_spark.catalog import load_table
from big_data_analytics_spark.operators.graph import pagerank
from big_data_analytics_spark.queries import query

_ITER = 5
_TOPK = 20


def _oracle() -> str:
    body = """
    WITH edges AS (
        SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
        FROM lineitem a
        JOIN lineitem b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
    ), deg AS (
        SELECT src, COUNT(*) AS outdeg FROM edges GROUP BY src
    ), edeg AS (
        SELECT e.src, e.dst, d.outdeg FROM edges e JOIN deg d USING (src)
    ), nodes AS (
        SELECT src AS node FROM edges
        UNION SELECT dst AS node FROM edges
    ), r0 AS (
        SELECT node, CAST(1000000 AS BIGINT) AS rank FROM nodes
    )"""
    prev = "r0"
    for i in range(1, _ITER + 1):
        body += f""", r{i} AS (
        SELECT nodes.node,
               CAST(150000 + ((85 * COALESCE(inf.inflow, 0)) // 100)
                    AS BIGINT) AS rank
        FROM nodes LEFT JOIN (
            SELECT e.dst AS node, SUM(r.rank // e.outdeg) AS inflow
            FROM edeg e JOIN {prev} r ON e.src = r.node
            GROUP BY e.dst
        ) inf USING (node)
    )"""
        prev = f"r{i}"
    body += f"""
    SELECT node AS l_partkey, rank AS rank_micro
    FROM {prev}
    ORDER BY rank DESC, node ASC
    LIMIT {_TOPK}
    """
    return body


@query("gr1_part_pagerank", oracle=_oracle())
def gr1_part_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{_TOPK} parts by PageRank over the co-purchase graph
    ({_ITER} fixed iterations, damping 0.85, integer micro-units —
    operators/graph.py:pagerank). Edge build is one self-join of
    lineitem on the order key (distinct directed pairs); the graph is
    symmetric, so no dangling-mass correction is needed.

    Scale: each iteration is a hash join on src + one partial-combined
    sum on dst over the *edge list*, never the fact table; lineage is
    checkpoint-truncated per round. The edge build's self-join
    shuffles lineitem once on l_orderkey — at 100 TB pre-bucket
    lineitem by order key and the build is exchange-free."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey")
    right = li.select(F.col("l_orderkey"),
                      F.col("l_partkey").alias("dst_part"))
    edges = (
        li.join(right, "l_orderkey")
        .where(F.col("l_partkey") != F.col("dst_part"))
        .select(F.col("l_partkey").alias("src"),
                F.col("dst_part").alias("dst"))
        .distinct()
    )
    ranks = pagerank(edges, iterations=_ITER)
    return (
        ranks.orderBy(F.col("rank").desc(), F.col("node").asc())
        .limit(_TOPK)
        .select(F.col("node").alias("l_partkey"),
                F.col("rank").alias("rank_micro"))
    )


_LPA_ITER = 4


def _lpa_oracle() -> str:
    body = """
    WITH edges AS (
        SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
        FROM lineitem a
        JOIN lineitem b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
    ), l0 AS (
        SELECT DISTINCT src AS node, src AS label FROM edges
    )"""
    prev = "l0"
    for i in range(1, _LPA_ITER + 1):
        body += f""", l{i} AS (
        SELECT node, label FROM (
            SELECT e.dst AS node, l.label,
                   ROW_NUMBER() OVER (
                       PARTITION BY e.dst
                       ORDER BY COUNT(*) DESC, l.label ASC) AS rn
            FROM edges e JOIN {prev} l ON e.src = l.node
            GROUP BY e.dst, l.label
        ) WHERE rn = 1
    )"""
        prev = f"l{i}"
    body += f"""
    SELECT label AS community, COUNT(*) AS n_parts
    FROM {prev}
    GROUP BY label
    HAVING COUNT(*) >= 2
    """
    return body


@query("lp1_part_communities", oracle=_lpa_oracle())
def lp1_part_communities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synchronous label propagation ({_LPA_ITER} fixed iterations)
    over the part co-purchase graph; communities of size ≥ 2 with
    their member counts. The mode-of-neighbor-labels step breaks ties
    deterministically by (count DESC, label ASC) — a window
    row_number, not SQL mode(), whose tie order is engine-defined —
    so the fixed-iteration result is engine-exact and hash-gradeable
    like gr1.

    Scale: per iteration one join on src + one (dst,label) count +
    one WindowGroupLimit-shaped pick per dst; all three stages share
    the dst hash partitioning. Labels are node ids (integers), so no
    per-iteration state beyond (node, label)."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey")
    right = li.select(F.col("l_orderkey"),
                      F.col("l_partkey").alias("dst_part"))
    edges = (
        li.join(right, "l_orderkey")
        .where(F.col("l_partkey") != F.col("dst_part"))
        .select(F.col("l_partkey").alias("src"),
                F.col("dst_part").alias("dst"))
        .distinct()
    )
    edges = edges.localCheckpoint()
    labels = edges.select(F.col("src").alias("node")).distinct().select(
        "node", F.col("node").alias("label"))
    for _ in range(_LPA_ITER):
        counted = (
            edges.join(labels, edges.src == labels.node)
            .groupBy(F.col("dst").alias("node2"), "label")
            .agg(F.count("*").alias("n"))
        )
        w = Window.partitionBy("node2").orderBy(
            F.col("n").desc(), F.col("label").asc())
        labels = (
            counted.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1)
            .select(F.col("node2").alias("node"), "label")
            .localCheckpoint()
        )
    return (
        labels.groupBy(F.col("label").alias("community"))
        .agg(F.count("*").alias("n_parts"))
        .where(F.col("n_parts") >= 2)
    )
