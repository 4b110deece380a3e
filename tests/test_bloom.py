"""Bloom semi-join: exact equivalence with the plain semi join, zero
false negatives by construction, and a real pruning ratio on
non-matching keys."""

from __future__ import annotations

from pyspark.sql import functions as F

from big_data_analytics_spark.operators.bloom import (
    bloom_build,
    bloom_might_contain,
    bloom_semi_join,
)


def test_bloom_semi_join_equals_exact_semi_join(spark):
    big = spark.range(0, 20_000).select(
        (F.col("id") * 7 % 9973).alias("k"), F.col("id").alias("payload"))
    small = spark.range(0, 150).select((F.col("id") * 131).alias("k"))
    got = bloom_semi_join(big, small, "k", num_bits=1 << 16)
    want = big.join(small.select("k").distinct(), "k", "left_semi")
    assert sorted(got.collect()) == sorted(want.collect())


def test_no_false_negatives(spark):
    small = spark.range(0, 1000).select((F.col("id") * 997).alias("k"))
    bitmap = bloom_build(small, "k", num_bits=1 << 16)
    misses = small.where(
        ~bloom_might_contain(F.col("k"), bitmap)).count()
    assert misses == 0


def test_prefilter_prunes_most_nonmembers(spark):
    # members: 0..99; probes: 100_000..119_999 (disjoint)
    small = spark.range(0, 100).select(F.col("id").alias("k"))
    probes = spark.range(100_000, 120_000).select(F.col("id").alias("k"))
    bitmap = bloom_build(small, "k", num_bits=1 << 16)
    survivors = probes.where(
        bloom_might_contain(F.col("k"), bitmap)).count()
    # m=65536, k=5, n=100 → fpr ~ 1e-10; allow generous slack
    assert survivors < 20_000 * 0.01


def test_rejects_non_multiple_of_64_bits(spark):
    import pytest
    small = spark.range(0, 10).select(F.col("id").alias("k"))
    with pytest.raises(ValueError, match="multiple of 64"):
        bloom_build(small, "k", num_bits=1000)
    with pytest.raises(ValueError, match="multiple of 64"):
        bloom_build(small, "k", num_bits=0)
