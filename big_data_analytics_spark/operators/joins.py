"""Join-strategy pinning for measured-small relations.

The repo-wide rule (learned three times over — gr4, gr5, gr6 driver
OOMs at probe steps): a relation whose row count grows with a fixture
dimension (a base table like part/supplier/customer, a vocabulary, a
per-key summary) must never be broadcast UNCONDITIONALLY, and the
choice must never be left to plan-time statistics — a localCheckpoint
scan's size estimate once misled the optimizer into broadcasting a
24M-row edge relation. Measure the row count (cheap for parquet base
tables: a metadata count; for derived relations: count after a
localCheckpoint so the computation is reused), then pin.

Fixed-cardinality dims (nation/region/p_type buckets/a 7-row seasonal
table), 1-row aggregates, and query sets bounded by a constant keep
their unconditional ``F.broadcast`` — see the classification table in
SCALE.md (round 10 broadcast audit).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

#: Default ceiling: 5M rows of scalar keys ≈ low hundreds of MB
#: broadcast — safe on the 128 GiB local harness and on any executor
#: profile with >=4 GiB heap; past it, sort-merge. Callers measuring
#: payload-heavy rows (arrays) should pass the PAYLOAD entry count as
#: ``n_rows`` instead of the row count (gr7's adjacency relation).
BROADCAST_MAX_ROWS = 5_000_000


def sized_side(small: DataFrame, n_rows: int,
               broadcast_max_rows: int = BROADCAST_MAX_ROWS) -> DataFrame:
    """Pin the join strategy for a MEASURED-small relation joined into
    a bigger one: broadcast when the measured count allows, else force
    sort-merge (never plan-time stats)."""
    if n_rows <= broadcast_max_rows:
        return F.broadcast(small)
    return small.hint("merge")
