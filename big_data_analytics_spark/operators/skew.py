"""Skew-mitigation operators (SCALE.md): salted two-phase aggregation
and a skewed-join salting helper.

AQE's skew-join splitting handles most cases automatically; these are
for the cases it can't see — a groupBy where one key holds a double-
digit percentage of all rows (the celebrity-user problem), and joins
against a skewed build side. Both decompose the hot key's work across
``n_salts`` partial groups, then merge. Correctness is algebraic:
the aggregate must be decomposable (sum/count/min/max — mean via
sum+count), which is exactly what partial aggregation already assumes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_sum_count(df: DataFrame, key_cols: list[str],
                     value_col: str, n_salts: int = 32) -> DataFrame:
    """Two-phase salted aggregation: group on (key, salt) first —
    spreading any hot key over ``n_salts`` reducers — then merge the
    partials per key. Output: key_cols, ``sum_<value>``, ``count``.

    The salt is a hash of random-free row identity pieces when
    available; here a uniform random int is fine because the salt never
    affects the *result*, only the partition assignment — the merge
    phase is exact regardless of how rows were salted."""
    salted = df.withColumn("__salt", (F.rand(seed=0) * n_salts).cast("int"))
    partial = (
        salted.groupBy(*key_cols, "__salt")
        .agg(
            F.sum(F.col(value_col)).alias("__psum"),
            F.count(F.lit(1)).alias("__pcnt"),
        )
    )
    return (
        partial.groupBy(*key_cols)
        .agg(
            F.sum("__psum").alias(f"sum_{value_col}"),
            F.sum("__pcnt").alias("count"),
        )
    )


def replicate_for_skew_join(small: DataFrame, n_salts: int,
                            salt_col: str = "__salt") -> DataFrame:
    """Replicate the small side of a skewed join ``n_salts`` times with
    an explicit salt column. The big side adds a uniform salt in
    [0, n_salts); joining on (key, salt) then spreads each hot key over
    ``n_salts`` tasks. Use only when AQE skew-splitting can't (e.g.
    aggregation-after-join pins the partitioning)."""
    salts = F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    return small.withColumn(salt_col, salts)


def with_join_salt(big: DataFrame, n_salts: int,
                   salt_col: str = "__salt") -> DataFrame:
    """Uniform salt for the big side of a salted join."""
    return big.withColumn(salt_col, (F.rand(seed=0) * n_salts).cast("int"))
