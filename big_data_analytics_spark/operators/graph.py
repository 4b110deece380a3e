"""Connected components over an edge list — the cluster step of
near-duplicate detection.

``lsh_dedup`` (operators/dedup.py) removes the non-minimal member of
every *pair*, which over-keeps on chains: A~B, B~C with A≁C keeps A
and C even though all three are one duplicate cluster. Connected
components closes the transitive chain so each cluster keeps exactly
one representative.

Algorithm: iterative min-label propagation. Each iteration is one
hash join + a min-aggregate, converging in O(graph diameter)
iterations — duplicate clusters are near-cliques (diameter ≤ 3), so
2-3 rounds in practice. (For adversarially long-chain graphs the
known upgrade is alternating large-star/small-star contraction,
Kiveris et al. "Connected Components in MapReduce and Beyond"
SoCC'14, which converges in O(log² n); not needed for dup graphs.)
Every iteration localCheckpoints the label table —
truncating lineage so the plan doesn't grow exponentially and
executors don't recompute the whole history each round.

At 100 TB the edge list (near-dup pairs) is orders of magnitude
smaller than the corpus — this runs over pairs only; the final
component map is joined back to the corpus with one shuffle (or a
broadcast when the dup set is small, the common case).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 20,
) -> DataFrame:
    """(node, component) for every node in the edge list; component is
    the minimum node id reachable from the node. Nodes with no edges
    are absent (callers union isolated nodes as self-components if
    needed)."""
    sym = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .unionByName(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .distinct()
        .localCheckpoint()
    )
    # label(u) starts as min(u, min neighbor)
    labels = (
        sym.groupBy("u")
        .agg(F.min("v").alias("mv"))
        .select(
            F.col("u").alias("node"),
            F.least(F.col("mv"), F.col("u")).alias("label"),
        )
        .localCheckpoint()
    )
    for _ in range(max_iter):
        # propagate: candidate label for u = min over neighbors v of
        # label(v), then take min with own label
        neighbor_min = (
            sym.join(labels, sym.v == labels.node)
            .groupBy("u")
            .agg(F.min("label").alias("nbr_label"))
        )
        new_labels = (
            labels.join(neighbor_min, labels.node == neighbor_min.u, "left")
            .select(
                "node",
                F.least(
                    F.col("label"),
                    F.coalesce(F.col("nbr_label"), F.col("label")),
                ).alias("label"),
            )
            .localCheckpoint()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.label") != F.col("o.label"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels.select("node", F.col("label").alias("component"))


def dedup_by_components(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    src: str = "id_a",
    dst: str = "id_b",
) -> DataFrame:
    """Keep one representative (the min id) per duplicate cluster.

    Transitively correct (unlike pair-wise loser removal): A~B~C keeps
    only min(A,B,C) even when A≁C directly."""
    comp = connected_components(pairs, src, dst)
    losers = comp.filter(F.col("node") != F.col("component")).select(
        F.col("node").alias(id_col)
    )
    return df.join(losers, id_col, "left_anti")
