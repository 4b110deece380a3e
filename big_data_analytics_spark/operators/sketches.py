"""Count-min sketch as a relation: the frequency twin of the HLL
cardinality sketch (queries/sketches.py). A CMS is a d×w counter
matrix; here it's the sparse relation (j, bucket, cnt) — built with
one explode + one partial+final aggregate, merged with a union +
re-aggregate, probed with a broadcast join. Nothing is ever wider
than d·w rows (d=4, w=4096 → ≤16K rows regardless of input size),
which is the whole point: at 100 TB the sketch is the only thing
that moves between stages, days, or tables.

Determinism: bucket hashes are xxhash64(value, j) — fixed seeds, no
RNG — so the same input always yields byte-identical sketches, and
the CMS overestimate property (est ≥ true count, always) is testable
as a hard invariant rather than a probabilistic one.

Reference parity: the reference's counter rollups (load_hbase.py
ProductMetrics counters) are exact per-key counts; this is the
bounded-memory path for when the key domain itself is too large to
materialize.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CMS_DEPTH = 4
CMS_WIDTH = 4096


def _probe_entries(value_col, depth: int, width: int):
    """Array of (j, bucket_j) structs for one value."""
    return F.array(*[
        F.struct(
            F.lit(j).alias("j"),
            F.pmod(F.xxhash64(value_col, F.lit(j)), F.lit(width))
            .alias("bucket"),
        )
        for j in range(depth)
    ])


def cms_build(df: DataFrame, col: str,
              depth: int = CMS_DEPTH, width: int = CMS_WIDTH) -> DataFrame:
    """Build a count-min sketch over ``df[col]`` as the sparse relation
    (j, bucket, cnt). One narrow explode (×depth) feeding a
    partial+final aggregate: the shuffle carries at most d·w rows per
    map task, never the raw values."""
    entries = df.select(
        F.explode(_probe_entries(F.col(col), depth, width)).alias("e"))
    return (
        entries.groupBy(F.col("e.j").alias("j"),
                        F.col("e.bucket").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Merge sketches built with identical (depth, width): cell-wise
    sum. CMS merge is exact — merge(build(A), build(B)) is
    byte-identical to build(A ∪ B) — which is what lets partial
    sketches roll up across partitions/days without rescanning."""
    unioned = reduce(lambda a, b: a.unionByName(b), sketches)
    return unioned.groupBy("j", "bucket").agg(
        F.sum("cnt").alias("cnt"))


def cms_estimate(sketch: DataFrame, keys: DataFrame, col: str,
                 depth: int = CMS_DEPTH, width: int = CMS_WIDTH) -> DataFrame:
    """Point-frequency estimates: min over the key's d cells.
    ``keys`` keeps all its columns; the estimate is appended as
    ``cms_est``. The sketch side is ≤ d·w rows → broadcast join, so
    probing any number of keys is one map-side pass."""
    probes = keys.withColumn(
        "__e", F.explode(_probe_entries(F.col(col), depth, width)))
    joined = probes.join(
        F.broadcast(sketch),
        (probes["__e.j"] == sketch["j"])
        & (probes["__e.bucket"] == sketch["bucket"]),
        "left",
    )
    return (
        joined.groupBy(*[keys[c] for c in keys.columns])
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("cms_est"))
    )
