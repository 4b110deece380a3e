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
Every iteration checkpoints the label table — truncating lineage so
the plan doesn't grow exponentially and executors don't recompute the
whole history each round. ``checkpoint="local"`` (default) uses
executor-local blocks: fastest, but lost with an executor, so a lost
executor fails the job and it restarts from the edges.
``checkpoint="reliable"`` writes to the session's checkpoint dir
(``sparkContext.setCheckpointDir`` — HDFS/S3 on a cluster) so the
iteration survives executor loss; the right choice when the pair
list itself took hours to produce.

At 100 TB the edge list (near-dup pairs) is orders of magnitude
smaller than the corpus — this runs over pairs only; the final
component map is joined back to the corpus with one shuffle (or a
broadcast when the dup set is small, the common case).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class ConvergenceError(RuntimeError):
    """min-label propagation exhausted max_iter without converging —
    returned labels would silently under-merge components."""


def _ckpt(df: DataFrame, mode: str) -> DataFrame:
    if mode == "local":
        return df.localCheckpoint()
    if mode == "reliable":
        # requires sparkContext.setCheckpointDir; eager so the lineage
        # truncation actually happens before the next iteration builds
        # on it
        return df.checkpoint(eager=True)
    raise ValueError(f"checkpoint must be 'local' or 'reliable', got {mode!r}")


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 20,
    checkpoint: str = "local",
) -> DataFrame:
    """(node, component) for every node in the edge list; component is
    the minimum node id reachable from the node. Nodes with no edges
    are absent (callers union isolated nodes as self-components if
    needed).

    Raises :class:`ConvergenceError` if ``max_iter`` rounds pass
    without reaching a fixed point (one propagation hop per round —
    a chain longer than max_iter hops needs a higher limit), rather
    than silently returning under-merged labels.
    """
    sym = _ckpt(
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .unionByName(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .distinct(),
        checkpoint,
    )
    # label(u) starts as min(u, min neighbor)
    labels = _ckpt(
        sym.groupBy("u")
        .agg(F.min("v").alias("mv"))
        .select(
            F.col("u").alias("node"),
            F.least(F.col("mv"), F.col("u")).alias("label"),
        ),
        checkpoint,
    )
    converged = False
    for _ in range(max_iter):
        # propagate: candidate label for u = min over neighbors v of
        # label(v), then take min with own label
        neighbor_min = (
            sym.join(labels, sym.v == labels.node)
            .groupBy("u")
            .agg(F.min("label").alias("nbr_label"))
        )
        new_labels = _ckpt(
            labels.join(neighbor_min, labels.node == neighbor_min.u, "left")
            .select(
                "node",
                F.least(
                    F.col("label"),
                    F.coalesce(F.col("nbr_label"), F.col("label")),
                ).alias("label"),
            ),
            checkpoint,
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
            converged = True
            break
    if not converged:
        raise ConvergenceError(
            f"connected_components did not converge in {max_iter} iterations; "
            "raise max_iter (chains propagate one hop per iteration)"
        )
    return labels.select("node", F.col("label").alias("component"))


def dedup_by_components(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 20,
    checkpoint: str = "local",
) -> DataFrame:
    """Keep one representative (the min id) per duplicate cluster.

    Transitively correct (unlike pair-wise loser removal): A~B~C keeps
    only min(A,B,C) even when A≁C directly."""
    comp = connected_components(pairs, src, dst, max_iter, checkpoint)
    losers = comp.filter(F.col("node") != F.col("component")).select(
        F.col("node").alias(id_col)
    )
    return df.join(losers, id_col, "left_anti")
