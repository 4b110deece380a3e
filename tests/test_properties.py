"""Property-based checks (SURVEY.md §5 item 5, via hypothesis):
partition-count invariance of the money convention, aggregate-vs-
explode equivalence, LSH banding soundness on controlled inputs."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from big_data_analytics_spark.functions.money import money_sum

MONEY = st.floats(min_value=0.0, max_value=1e6, allow_nan=False,
                  allow_infinity=False)


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(MONEY, min_size=1, max_size=60), st.integers(1, 7))
def test_money_sum_partition_invariant(spark, values, n_parts):
    """The whole point of the cents convention: the total is identical
    under any partitioning (a raw double SUM is not)."""
    df1 = spark.createDataFrame([(v,) for v in values], ["x"]).coalesce(1)
    dfn = spark.createDataFrame([(v,) for v in values], ["x"]).repartition(n_parts)
    a = df1.agg(money_sum("x").alias("s")).first().s
    b = dfn.agg(money_sum("x").alias("s")).first().s
    assert a == b  # bit-exact, not approx


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(st.lists(st.integers(0, 1000), min_size=0, max_size=8),
                min_size=1, max_size=15))
def test_array_fold_equals_explode_sum(spark, arrays):
    """A13: aggregate() over an array column == explode + groupBy sum."""
    # explicit schema: inference fails when every array is empty
    df = spark.createDataFrame(
        [(i, arr) for i, arr in enumerate(arrays)],
        "id long, arr array<long>").cache()
    folded = {
        r.id: r.s for r in df.select(
            "id", F.aggregate("arr", F.lit(0).cast("long"),
                              lambda acc, x: acc + x).alias("s")).collect()
    }
    exploded = {
        r.id: r.s for r in
        df.select("id", F.explode_outer("arr").alias("v"))
        .groupBy("id").agg(F.sum("v").alias("s")).collect()
    }
    for i, arr in enumerate(arrays):
        assert folded[i] == sum(arr)
        # explode_outer of [] gives one null row → sum null; fold gives 0
        if arr:
            assert exploded[i] == folded[i]
        else:
            assert exploded[i] is None


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.integers(2, 30))
def test_left_join_count_conservation(spark, n_right):
    """J2 property: a left join on a unique right key preserves the
    left row count exactly."""
    left = spark.range(50).select(F.col("id").alias("k"))
    right = spark.range(n_right).select(F.col("id").alias("k"),
                                        F.lit(1).alias("v"))
    joined = left.join(right, "k", "left")
    assert joined.count() == 50


def test_minhash_signature_identical_for_identical_sets(spark):
    """Identical shingle sets ⇒ identical signatures, regardless of
    the order tokens appear in the text."""
    from big_data_analytics_spark.operators.dedup import minhash_signatures
    df = spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, "alpha beta gamma delta")],
        ["doc_id", "text"])
    sigs = [r.signature for r in
            minhash_signatures(df, num_hashes=32).collect()]
    assert sigs[0] == sigs[1]


def test_hash_split_stable_and_exhaustive(spark):
    """train_test_split membership is a pure function of the key:
    identical under repartitioning (randomSplit is not), disjoint, and
    exhaustive."""
    from big_data_analytics_spark.queries.sampling import train_test_split

    df = spark.range(0, 5000).withColumnRenamed("id", "k")
    tr1, te1 = train_test_split(df.coalesce(1), "k")
    tr8, te8 = train_test_split(df.repartition(8), "k")
    ids = lambda d: {r.k for r in d.collect()}  # noqa: E731
    assert ids(tr1) == ids(tr8)
    assert ids(te1) == ids(te8)
    assert ids(tr1) & ids(te1) == set()
    assert len(ids(tr1)) + len(ids(te1)) == 5000
    # the multiplicative hash actually scrambles: split ratio near 80/20
    assert abs(len(ids(tr1)) / 5000 - 0.8) < 0.05


@given(
    st.integers(min_value=1, max_value=12),   # width
    st.integers(min_value=1, max_value=10),   # height
    st.integers(min_value=0, max_value=4),    # scanline filter
    st.integers(min_value=0, max_value=2**31 - 1),  # pixel seed
)
@settings(max_examples=60, deadline=None)
def test_png_roundtrip_property(w, h, ft, seed):
    """encode_png -> _png_pixels is the identity for ANY 8-bit RGB
    image under ANY scanline filter — pixel content derived from an
    LCG over the seed so every byte value (0..255) and every
    filter-prediction pattern gets exercised."""
    from big_data_analytics_spark.multimodal.binary_ops import (
        _png_pixels,
        encode_png,
    )

    x = seed
    px = []
    for _ in range(h):
        row = []
        for _ in range(w):
            x = (x * 1103515245 + 12345) & 0x7FFFFFFF
            row.append(((x >> 16) & 0xFF, (x >> 8) & 0xFF, x & 0xFF))
        px.append(row)
    assert _png_pixels(encode_png(px, filter_type=ft)) == px
