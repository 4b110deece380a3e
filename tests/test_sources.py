"""Sources: JSON/CSV round-trips with explicit schemas — including the
cart_contents MapType-vs-inference hard part (SURVEY.md §7)."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from big_data_analytics_spark.datagen import gen_all
from big_data_analytics_spark.sources.readers import (
    SESSION_SCHEMA,
    TRANSACTION_SCHEMA,
    infer_then_assert,
    read_csv,
    read_json,
)
from big_data_analytics_spark.sources.writers import (
    write_csv,
    write_json,
    write_parquet,
)


@pytest.fixture(scope="module")
def data(spark):
    return gen_all(spark, n_users=50, n_products=30, n_categories=5,
                   n_sessions=300)


@pytest.fixture(scope="module")
def tmp():
    d = tempfile.mkdtemp(prefix="sources_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_session_json_roundtrip_preserves_map(data, spark, tmp):
    """Write sessions as JSONL, read back with the explicit schema:
    cart_contents must come back as MapType with identical entries."""
    path = f"{tmp}/sessions_json"
    write_json(data["sessions"], path)
    back = read_json(spark, path, SESSION_SCHEMA)
    assert isinstance(back.schema["cart_contents"].dataType, T.MapType)
    a = data["sessions"].select(
        "session_id", F.map_entries("cart_contents").alias("e"))
    b = back.select("session_id", F.map_entries("cart_contents").alias("e"))
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    assert back.count() == 300


def test_inference_mangles_map_column(data, spark, tmp):
    """The documented failure mode: inference turns the map into a
    struct keyed by observed product ids (or drops it when sparse) —
    proof the explicit schema is load-bearing."""
    path = f"{tmp}/sessions_json"
    inferred = spark.read.json(path)
    dt = inferred.schema["cart_contents"].dataType
    assert not isinstance(dt, T.MapType)


def test_transactions_json_roundtrip(data, spark, tmp):
    path = f"{tmp}/txn_json"
    write_json(data["transactions"], path, max_records_per_file=100)
    back = read_json(spark, path, TRANSACTION_SCHEMA)
    assert back.count() == data["transactions"].count()
    # money survives the text round-trip exactly
    a = data["transactions"].agg(F.sum("total")).first()[0]
    b = back.agg(F.sum("total")).first()[0]
    assert a == pytest.approx(b, abs=1e-9)


def test_append_mode_replaces_rewrite(data, spark, tmp):
    """The reference's O(n²) read-extend-rewrite, restated as append
    (U1): two appends == one union."""
    path = f"{tmp}/txn_append"
    half1 = data["transactions"].filter(F.col("user_id") < "user_000025")
    half2 = data["transactions"].filter(F.col("user_id") >= "user_000025")
    write_json(half1, path, mode="append")
    write_json(half2, path, mode="append")
    back = read_json(spark, path, TRANSACTION_SCHEMA)
    assert back.count() == data["transactions"].count()


def test_csv_null_token_and_sep(spark, tmp):
    """na_values='?' + custom delimiter (S3/S4)."""
    path = f"{tmp}/auto.csv"
    with open(f"{tmp}/auto.csv", "w") as f:
        f.write("mpg|horsepower|name\n18.0|130|chevy\n15.0|?|buick\n")
    schema = T.StructType([
        T.StructField("mpg", T.DoubleType()),
        T.StructField("horsepower", T.IntegerType()),
        T.StructField("name", T.StringType()),
    ])
    df = read_csv(spark, path, schema, null_value="?", sep="|")
    rows = {r.name: r for r in df.collect()}
    assert rows["buick"].horsepower is None
    assert rows["chevy"].horsepower == 130


def test_single_file_csv_report(data, spark, tmp):
    """The reference's coalesce(1) CLV artifact shape (S5)."""
    import glob
    path = f"{tmp}/report_csv"
    write_csv(data["users"].select("user_id", "registration_date"), path,
              single_file=True)
    parts = glob.glob(f"{path}/part-*")
    assert len(parts) == 1
    back = read_csv(spark, path)
    assert back.count() == 50


def test_partitioned_parquet_prunes(data, spark, tmp):
    """partitionBy(date) → reading one day scans one directory
    (PartitionFilters, the HBase row-key-prefix role)."""
    path = f"{tmp}/txn_parquet"
    txns = data["transactions"].withColumn(
        "day", F.to_date(F.to_timestamp("timestamp")))
    write_parquet(txns, path, partition_by=["day"], sort_within=["user_id"])
    back = spark.read.parquet(path)
    one_day = back.select("day").distinct().first().day
    q = back.filter(F.col("day") == F.lit(one_day))
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(day" in plan
    assert q.count() > 0


def test_infer_then_assert_detects_drift(data, spark, tmp):
    path = f"{tmp}/txn_json"
    ok = infer_then_assert(spark, path, TRANSACTION_SCHEMA)
    assert ok.count() == data["transactions"].count()
    bad_schema = T.StructType(TRANSACTION_SCHEMA.fields + [
        T.StructField("not_there", T.StringType())])
    with pytest.raises(ValueError, match="schema drift"):
        infer_then_assert(spark, path, bad_schema)


def test_report_collect_bound(spark, data):
    """Plot sinks only accept small aggregates — unbounded collect is
    refused (S11 contract)."""
    import pytest as _pytest
    from big_data_analytics_spark.pipelines.reports import (
        collect_for_report, save_line_chart)
    from big_data_analytics_spark.pipelines import monthly_sales

    small = monthly_sales(data["transactions"])
    pdf = collect_for_report(small)
    assert len(pdf) <= 12
    big = spark.range(20_001)
    with _pytest.raises(ValueError, match="aggregate it first"):
        collect_for_report(big, max_rows=20_000)
    # matplotlib absent in this container → clean gated error; if it
    # ever appears, the chart must render
    try:
        import matplotlib  # noqa: F401
        import tempfile, os
        out = save_line_chart(small, "month", "total",
                              tempfile.mktemp(suffix=".png"))
        assert os.path.exists(out)
    except ImportError:
        with _pytest.raises(ImportError, match="matplotlib"):
            save_line_chart(small, "month", "total", "/tmp/x.png")


def test_orc_roundtrip_with_pruning(data, spark, tmp):
    """ORC round-trip preserves the nested session schema (map column
    included), and a partition-filtered read prunes to the matching
    partition directory only."""
    from big_data_analytics_spark.sources.readers import read_orc
    from big_data_analytics_spark.sources.writers import write_orc

    sessions = data["sessions"]
    path = f"{tmp}/sessions_orc"
    write_orc(sessions, path, partition_by=["conversion_status"],
              sort_within=["session_id"])
    back = read_orc(spark, path)
    assert back.count() == sessions.count()
    # map column survives (the schema-inference hard part)
    cart_total = back.select(
        F.explode("cart_contents")).count()
    assert cart_total == sessions.select(F.explode("cart_contents")).count()
    # partition pruning: the scan carries a partition filter (so only
    # the matching partition directory is listed/read)
    one = back.filter(F.col("conversion_status") == "converted")
    scan = one._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in scan and "converted" in scan
    assert 0 < one.count() < sessions.count()


def test_corrupt_json_quarantined(spark, tmp):
    """Malformed JSONL lines land in the corrupt column with schema
    fields null — never silently dropped or nulled without trace."""
    import os

    path = f"{tmp}/dirty.jsonl"
    with open(path, "w") as f:
        f.write('{"a": 1, "b": "x"}\n')
        f.write('{"a": 2, "b": "y"}\n')
        f.write('{"a": 3, "b": BROKEN\n')
    schema = T.StructType([
        T.StructField("a", T.LongType()), T.StructField("b", T.StringType())])
    df = read_json(spark, path, schema, corrupt_col="_rejected").cache()
    assert df.count() == 3
    bad = df.filter(F.col("_rejected").isNotNull())
    assert bad.count() == 1
    row = bad.first()
    assert "BROKEN" in row._rejected and row.a is None
    # clean rows parse normally, reject column null
    assert df.filter(F.col("_rejected").isNull()).count() == 2
    os.remove(path)
