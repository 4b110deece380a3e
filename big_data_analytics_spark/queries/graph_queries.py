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

from pyspark.sql import DataFrame, SparkSession
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
