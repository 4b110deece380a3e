"""Temporal join operators: as-of (point-in-time) join and banded
range join.

The as-of join answers "for each left row, the most recent right row
at-or-before its timestamp, per key" — the backbone of point-in-time
feature joins (no leakage from the future) and slowly-changing
-dimension lookups. The reference has no such operator (its per-row
Python lookups over ``price_history`` in dataset_generator.py:208-215
are the sequential analogue); here it is one shuffle.

Scale design — why union + window, not a join:

The naive plan (`left JOIN right ON key AND r.ts <= l.ts`, then
argmax per left row) materializes every (left, right) pair satisfying
the inequality — quadratic in per-key history length, ruinous at
100 TB. Instead both sides are unioned into one stream, shuffled ONCE
on the key, sorted by time within partitions, and the right payload is
propagated with ``last(..., ignorenulls=True)`` over an
unbounded-preceding running window. Cost: one shuffle + one sort,
linear in rows — the same plan as any running aggregate; AQE handles
skewed keys.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_SIDE = "__asof_side"  # 0 = right (payload carrier), 1 = left (probe)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: list[str] | str,
    right_cols: list[str] | None = None,
    direction: str = "backward",
    allow_exact_matches: bool = True,
    tolerance_micros: int | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """Point-in-time join (pandas ``merge_asof`` semantics, distributed).

    For each left row, attach the payload of the single right row with
    the same ``by`` key and the largest ``on`` <= left.on (direction
    'backward') or smallest ``on`` >= left.on ('forward'). Left rows
    with no match keep nulls; ``tolerance_micros`` additionally nulls
    matches farther than the bound (timestamp columns only).

    The right side must be unique per (by, on) — pre-aggregate it if
    not; a deterministic result requires a deterministic right row.
    """
    if isinstance(by, str):
        by = [by]
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in by and c != on]

    ltypes, rtypes = dict(left.dtypes), dict(right.dtypes)
    on_r = f"{on}{suffix}"
    payload = [f"{c}{suffix}" for c in right_cols] + [on_r]
    left_extra = [c for c in left.columns if c not in by and c != on]

    l2 = left.select(
        *by, F.col(on), *left_extra,
        F.lit(1).alias(_SIDE),
        *[F.lit(None).cast(rtypes[c]).alias(f"{c}{suffix}") for c in right_cols],
        F.lit(None).cast(rtypes[on]).alias(on_r),
    )
    r2 = right.select(
        *by, F.col(on),
        *[F.lit(None).cast(ltypes[c]).alias(c) for c in left_extra],
        F.lit(0).alias(_SIDE),
        *[F.col(c).alias(f"{c}{suffix}") for c in right_cols],
        F.col(on).alias(on_r),
    )

    t_order = F.col(on).asc() if direction == "backward" else F.col(on).desc()
    # at equal timestamps the right row must sort before the left row
    # iff exact matches are allowed, so the running `last` can see it
    side_order = F.col(_SIDE).asc() if allow_exact_matches else F.col(_SIDE).desc()
    w = (
        Window.partitionBy(*by)
        .orderBy(t_order, side_order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )

    filled = l2.unionByName(r2).select(
        *by, on, *left_extra, _SIDE,
        *[F.last(c, ignorenulls=True).over(w).alias(c) for c in payload],
    )
    out = filled.filter(F.col(_SIDE) == 1).drop(_SIDE)
    if tolerance_micros is not None:
        gap = F.abs(F.unix_micros(F.col(on)) - F.unix_micros(F.col(on_r)))
        keep = [c for c in out.columns if c not in payload]
        out = out.select(
            *keep,
            *[F.when(gap <= F.lit(tolerance_micros), F.col(c)).alias(c)
              for c in payload],
        )
    return out


def range_band_join(
    facts: DataFrame,
    bands: DataFrame,
    value_col: str,
    lo_col: str = "lo",
    hi_col: str = "hi",
) -> DataFrame:
    """Assign each fact row to the band with lo <= value < hi.

    Bands are a small static table → explicit broadcast, so the plan is
    a BroadcastNestedLoopJoin evaluating only the range predicate per
    (row, band): linear in facts, never a shuffle. With many bands,
    bucketize instead (width_bucket-style) — this operator is for
    irregular, hand-authored bands."""
    pred = (F.col(value_col) >= F.col(lo_col)) & (F.col(value_col) < F.col(hi_col))
    return facts.join(F.broadcast(bands), pred, "left")


def scd2_history(changelog: DataFrame, entity_col: str, attr_cols: list[str],
                 order_cols: list[str]) -> DataFrame:
    """Build a type-2 slowly-changing-dimension history from a change
    log: collapse consecutive rows with identical tracked attributes,
    then assign [valid_from, valid_to) intervals and a version number
    per entity (the warehouse MERGE ... WHEN MATCHED pattern, derived
    declaratively instead of row-at-a-time).

    Plan shape: one shuffle on the entity key; every window
    (change-detection lag, version row_number, interval lead) shares
    that partitioning, so Spark plans a single Exchange followed by
    sorts — no second shuffle at any scale. ``order_cols`` must be a
    deterministic total order within an entity (e.g. ts + a tie-break
    id) or versions are nondeterministic across runs.

    Returns entity, attrs, the order columns of the version's first
    row, version (1-based), and is_current.
    """
    w = Window.partitionBy(entity_col).orderBy(*order_cols)
    changed = F.lit(False)
    for c in attr_cols:
        prev = F.lag(c).over(w)
        # NULL-safe inequality: a NULL attr starting/ending a run
        changed = changed | ~F.col(c).eqNullSafe(prev)
    first_row = F.row_number().over(w) == 1
    marks = changelog.withColumn(
        "__is_change", first_row | changed)
    versions = marks.filter(F.col("__is_change")).drop("__is_change")
    wv = Window.partitionBy(entity_col).orderBy(*order_cols)
    out = versions.select(
        entity_col, *attr_cols, *order_cols,
        F.row_number().over(wv).alias("version"),
        F.lead(order_cols[0]).over(wv).alias("valid_to"),
    )
    return out.withColumn("is_current", F.col("valid_to").isNull())
