"""Invariants of the round-4 pipeline queries beyond the oracle gate:
budget conservation for the mixture apportionment, and the
incremental-dedup ≡ restricted-full-recompute equivalence.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from big_data_analytics_spark.queries import load_all
from tests.conftest import SF_CORRECT, SF_SMOKE

REGISTRY = load_all()


def test_mx1_allocation_conserves_budget(spark):
    """Largest-remainder apportionment must hand out EXACTLY the
    budget — no rounding drift, whatever the language distribution."""
    from big_data_analytics_spark.queries.mixing import _BUDGET
    rows = REGISTRY["mx1_mixture_budgets"].spark_fn(
        spark, SF_CORRECT).collect()
    assert sum(r["alloc_docs"] for r in rows) == _BUDGET
    # monotone: a source with more docs never gets a smaller weight
    by_docs = sorted(rows, key=lambda r: r["n_docs"])
    weights = [r["weight_micro"] for r in by_docs]
    assert weights == sorted(weights)


def test_d7_incremental_equals_restricted_full(spark):
    """The incremental band probe must find exactly the pairs a FULL
    band self-join over base ∪ delta finds, restricted to pairs
    touching the delta — no pair lost by probing instead of
    re-pairing."""
    from big_data_analytics_spark.catalog import load_table
    from big_data_analytics_spark.queries.dedup_queries import (
        _portable_sigs, _sig_bands, _verified_pairs)

    base = (load_table(spark, SF_CORRECT, "documents")
            .filter(F.col("doc_id") < 100).select("doc_id", "text"))
    fresh = (load_table(spark, SF_CORRECT, "documents")
             .filter((F.col("doc_id") >= 100) & (F.col("doc_id") < 120))
             .select((F.col("doc_id") + 50000).alias("doc_id"), "text"))
    near = base.filter(F.col("doc_id") < 10).select(
        (F.col("doc_id") + 40000).alias("doc_id"),
        F.concat("text", F.lit(" tail")).alias("text"))
    sig = _portable_sigs(base.unionByName(near).unionByName(fresh))
    bands = _sig_bands(sig)
    full_pairs = (
        bands.alias("a")
        .join(bands.alias("b"),
              (F.col("a.band") == F.col("b.band"))
              & (F.col("a.key") == F.col("b.key"))
              & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(F.col("a.doc_id").alias("id_a"),
                F.col("b.doc_id").alias("id_b"))
        .distinct()
    )
    full = {
        (r["id_a"], r["id_b"], r["n_match"])
        for r in _verified_pairs(full_pairs, sig)
        .filter(F.col("id_b") >= 40000).collect()
    }
    incremental = {
        (r["id_a"], r["id_b"], r["n_match"])
        for r in REGISTRY["d7_incremental_dedup"].spark_fn(
            spark, SF_CORRECT).collect()
    }
    assert incremental == full
    assert incremental, "planted near-copies must surface"


def test_cp1_stages_monotone(spark):
    """Each cleanup stage can only shrink the corpus."""
    row = REGISTRY["cp1_corpus_clean_audit"].spark_fn(
        spark, SF_CORRECT).collect()[0]
    assert (row["n_input"] >= row["n_after_quality"]
            >= row["n_after_language"] >= row["n_after_exact_dedup"] > 0)
    # the planted junk must actually bite each stage
    assert row["n_input"] - row["n_after_quality"] >= 10
    assert row["n_after_language"] - row["n_after_exact_dedup"] >= 1


def test_qn1_histogram_cardinality_guard(spark, monkeypatch):
    """qn1's in-plan assert_true must actually fire when the
    normalized key's distinct-value count exceeds the bound (the
    unbounded-broadcast failure mode it exists to catch)."""
    import pyspark.errors

    from big_data_analytics_spark.queries import normalize

    monkeypatch.setattr(normalize, "_QN_MAX_HIST", 5)
    df = normalize.qn1_quantile_normalize(spark, SF_SMOKE)
    with pytest.raises(pyspark.errors.PySparkException,
                       match="histogram cardinality"):
        df.collect()
