"""Shared under-split spread guard.

A scan of a small-file corpus (the 1-file sf0.1 test fixture; 2
splits at the 10x fixture) hands every downstream narrow stage its
partition count, and AQE cannot widen it because AQE sizes by INPUT
bytes while an amplifying expression (token explode, n-gram
transform, per-row DP) is priced by OUTPUT work. The fix is a
conditional round-robin repartition to the session's default
parallelism, applied BELOW the expensive projection — but only for
query classes where the per-row work is heavy enough to repay the
extra exchange.

Opt-in rule, per query class, with the round-13 measured datapoints
(SCALE.md round-13 "under-split spread" section):

- POSITIVE (use the guard): heavy per-row work downstream of the
  scan — ev3/ev4's token-edit-distance DP and n-gram folds, fs2's
  wide chi-square projection, es1/d10's suffix spans, gm1's
  gram-matrix fold, v11's vector arithmetic. Cost on the 1-file
  sf0.1 fixture: ~+0.4 s per explode branch; payoff at the 10x
  fixture: 4-7x wall-clock (dq4: 30.5 -> 6.8 s; v3-class: 104 s ->
  ~7 s for the fan-out case).
- NEGATIVE (do NOT use it): cheap per-row explode feeding a
  map-side combine — t20's bigram count. Measured: +3.3 s at sf0.1
  against a 0.35 s gain at 10x, REVERTED in round 13. The map-side
  combine into a vocabulary-keyed count already parallelizes the
  stage that matters.

The guard is a no-op whenever the scan is already split at least to
``defaultParallelism`` — i.e. on any real multi-file/cluster layout,
where ``files.maxPartitionBytes`` sizing provides the splits — so at
100 TB this never adds an exchange; it exists for the
pathologically-few-input-splits shape.

Checking ``df.rdd.getNumPartitions()`` forces RDD-lineage
materialization (cheap: plan-only, no job), which is why callers on
the hot path call this once on the scanned relation, not per branch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread_if_undersplit(df: DataFrame) -> DataFrame:
    """Round-robin ``df`` to the session default parallelism iff its
    current partition count is below it. Explicit OPT-IN per query —
    see the module docstring for the measured per-query-class rule
    (heavy per-row work: yes; cheap explode + map-side combine: no).
    """
    sc = df.sparkSession.sparkContext
    para = sc.defaultParallelism
    if df.rdd.getNumPartitions() < para:
        df = df.repartition(para)
    return df
