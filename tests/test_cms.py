"""Count-min sketch invariants (operators/sketches.py).

CMS is deterministic here (fixed xxhash64 seeds), so its two defining
properties are testable as hard equalities/inequalities:

- merge(build(A), build(B)) == build(A ∪ B), cell for cell — the
  roll-up property that lets daily sketches sum over date ranges;
- estimate(k) >= true_count(k) for EVERY key — CMS never undercounts.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from big_data_analytics_spark.catalog import load_table
from big_data_analytics_spark.operators.sketches import (
    cms_build,
    cms_estimate,
    cms_merge,
)
from tests.conftest import SF_SMOKE


def _tokens(spark):
    d = load_table(spark, SF_SMOKE, "documents")
    return d.select("doc_id",
                    F.explode(F.split("text", " ")).alias("token"))


def test_cms_merge_equals_whole_build(spark):
    toks = _tokens(spark)
    half_a = toks.filter(F.col("doc_id") % 2 == 0)
    half_b = toks.filter(F.col("doc_id") % 2 == 1)
    merged = cms_merge(cms_build(half_a, "token"),
                       cms_build(half_b, "token"))
    whole = cms_build(toks, "token")
    as_set = lambda df: {tuple(r) for r in df.collect()}  # noqa: E731
    assert as_set(merged) == as_set(whole)


def test_cms_never_undercounts(spark):
    toks = _tokens(spark).select("token")
    exact = toks.groupBy("token").agg(F.count(F.lit(1)).alias("tf"))
    est = cms_estimate(cms_build(toks, "token"), exact, "token")
    bad = est.filter(F.col("cms_est") < F.col("tf")).count()
    assert bad == 0


def test_cms_total_mass_conserved(spark):
    """Each of the d rows of the sketch holds every occurrence exactly
    once, so per-j cell sums all equal the token count."""
    toks = _tokens(spark).select("token")
    n = toks.count()
    sums = (cms_build(toks, "token").groupBy("j")
            .agg(F.sum("cnt").alias("mass")).collect())
    assert len(sums) == 4
    assert all(r["mass"] == n for r in sums)
