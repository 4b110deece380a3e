"""Compaction and schema-evolution reads."""

from __future__ import annotations

from pyspark.sql import functions as F

from big_data_analytics_spark.sources.maintenance import (
    _list_parquet,
    compact_parquet,
    read_evolved,
)


def test_compaction_reduces_file_count_preserves_rows(spark, tmp_path):
    src = str(tmp_path / "many")
    # simulate a streaming sink: 64 tiny files
    spark.range(0, 10_000).repartition(64).write.parquet(src)
    assert len(_list_parquet(src)) == 64
    dest = str(tmp_path / "compacted")
    n = compact_parquet(spark, src, target_file_bytes=1 << 20,
                        out_path=dest)
    assert n < 64
    assert spark.read.parquet(dest).count() == 10_000


def test_read_evolved_merges_schemas_and_backfills(spark, tmp_path):
    v1 = str(tmp_path / "v1")
    v2 = str(tmp_path / "v2")
    spark.range(0, 100).select(
        F.col("id"), F.lit("a").alias("source")).write.parquet(v1)
    spark.range(100, 200).select(
        F.col("id"), F.lit("b").alias("source"),
        F.lit(0.9).alias("quality")).write.parquet(v2)
    df = read_evolved(spark, v1, v2, fill_missing={"quality": 0.0})
    assert df.count() == 200
    assert set(df.columns) == {"id", "source", "quality"}
    # v1 rows backfilled, v2 rows untouched
    assert df.where((F.col("id") < 100)
                    & (F.col("quality") == 0.0)).count() == 100
    assert df.where((F.col("id") >= 100)
                    & (F.col("quality") == 0.9)).count() == 100


def test_ivm1_retraction_drops_zeroed_groups(spark):
    """The Z-set maintenance path must DROP groups whose multiplicity
    reaches zero — and the sf0.01 CDC partition actually produces such
    groups, so the retraction branch is exercised by data."""
    from tests.conftest import SF_CORRECT
    from big_data_analytics_spark.catalog import load_table
    from big_data_analytics_spark.queries.cdc import ivm1_retractable_view

    orders = load_table(spark, SF_CORRECT, "orders")
    r = F.col("o_orderkey") % 11
    per = (orders.where(r != 0)
           .groupBy("o_custkey")
           .agg(F.count(F.lit(1)).alias("n"),
                F.sum(r.isin(2, 3, 4).cast("long")).alias("nd")))
    zeroed = [row.o_custkey
              for row in per.where(F.col("n") == F.col("nd")).collect()]
    assert zeroed, "CDC partition no longer zeroes any customer"
    view = ivm1_retractable_view(spark, SF_CORRECT)
    present = {row.c_custkey for row in view.collect()}
    for ck in zeroed:
        assert ck not in present


def test_cm1_fixture_actually_compacts(spark):
    """The cm1 graded row certifies VALUES through the compacted
    store; this guard certifies the layout work happened — the
    compacted directory must hold strictly fewer data files than the
    64-file small-files store it was rewritten from (file counts stay
    out of the graded columns because they track compression ratios,
    not semantics)."""
    from tests.conftest import SF_CORRECT
    from big_data_analytics_spark.queries.layout import _compacted_events

    compacted = _compacted_events(spark, SF_CORRECT)
    small = compacted.parent / "small"

    def n_files(p):
        return sum(1 for f in p.rglob("*.parquet"))

    assert n_files(small) == 64
    assert 0 < n_files(compacted) < 64


def test_se1_fixture_v1_lacks_the_column(spark):
    """The evolution fixture must be REAL: the v1 directory's physical
    schema has no ``value`` column (mergeSchema is what reintroduces
    it as NULL), otherwise se1 would grade a plain union."""
    from tests.conftest import SF_CORRECT
    from big_data_analytics_spark.queries.layout import _evolved_events

    v1, v2 = _evolved_events(spark, SF_CORRECT)
    assert "value" not in spark.read.parquet(str(v1)).columns
    assert "value" in spark.read.parquet(str(v2)).columns
