"""Readers (SURVEY.md §2.1 S1-S4, S10): JSON / CSV / Parquet with
explicit schemas.

The reference relies on schema inference and eyeballs the result
(``spark.read.json`` + logged printSchema, spark_processing.py:31-38).
Inference is wrong twice over at scale: it costs a full extra pass,
and it *mis-types* this data model — a string-keyed map column
(``cart_contents``) infers as a sparse struct with one field per key
observed anywhere in the data (SURVEY.md §7 "hard parts"). Every
reader here takes the explicit StructType; inference survives only in
``infer_then_assert`` as an ingestion-time validator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

#: Explicit schemas for the e-commerce JSON documents (the docstring
#: contracts of /root/reference/load_mongo.py:17-120, FIXTURES.md §1-5).
CART_ENTRY = T.StructType([
    T.StructField("quantity", T.IntegerType()),
    T.StructField("price", T.DoubleType()),
])

SESSION_SCHEMA = T.StructType([
    T.StructField("session_id", T.StringType()),
    T.StructField("user_id", T.StringType()),
    T.StructField("start_time", T.StringType()),
    T.StructField("end_time", T.StringType()),
    T.StructField("duration_seconds", T.IntegerType()),
    T.StructField("geo_data", T.StructType([
        T.StructField("city", T.StringType()),
        T.StructField("state", T.StringType()),
        T.StructField("country", T.StringType()),
        T.StructField("ip_address", T.StringType()),
    ])),
    T.StructField("device_profile", T.StructType([
        T.StructField("type", T.StringType()),
        T.StructField("os", T.StringType()),
        T.StructField("browser", T.StringType()),
    ])),
    T.StructField("viewed_products", T.ArrayType(T.StringType())),
    T.StructField("page_views", T.ArrayType(T.StructType([
        T.StructField("timestamp", T.StringType()),
        T.StructField("page_type", T.StringType()),
        T.StructField("product_id", T.StringType()),
        T.StructField("category_id", T.StringType()),
        T.StructField("view_duration", T.IntegerType()),
    ]))),
    # THE map column: explicit MapType, never inferred
    T.StructField("cart_contents", T.MapType(T.StringType(), CART_ENTRY)),
    T.StructField("conversion_status", T.StringType()),
    T.StructField("referrer", T.StringType()),
])

TRANSACTION_SCHEMA = T.StructType([
    T.StructField("transaction_id", T.StringType()),
    T.StructField("session_id", T.StringType()),
    T.StructField("user_id", T.StringType()),
    T.StructField("timestamp", T.StringType()),
    T.StructField("items", T.ArrayType(T.StructType([
        T.StructField("product_id", T.StringType()),
        T.StructField("quantity", T.IntegerType()),
        T.StructField("unit_price", T.DoubleType()),
        T.StructField("subtotal", T.DoubleType()),
    ]))),
    T.StructField("subtotal", T.DoubleType()),
    T.StructField("discount", T.DoubleType()),
    T.StructField("total", T.DoubleType()),
    T.StructField("payment_method", T.StringType()),
    T.StructField("status", T.StringType()),
])


def read_json(spark: SparkSession, path: str, schema: T.StructType,
              multi_line: bool = False,
              corrupt_col: str | None = None) -> DataFrame:
    """JSON scan with an explicit schema (S1). ``multi_line=True`` for
    the reference's whole-file JSON arrays (dataset_generator.py:156-164)
    — note multiLine files are not splittable, so production data
    should be JSONL (the default here).

    ``corrupt_col`` quarantines malformed lines instead of silently
    nulling them: the raw text of any unparseable record lands in that
    column (all schema fields null), so ingest can route rejects to a
    dead-letter sink and alert on the reject rate — at 100 TB a parse
    regression upstream must be a metric, not a silent null flood."""
    if corrupt_col is not None:
        schema = T.StructType(
            list(schema.fields) + [T.StructField(corrupt_col, T.StringType())])
    r = (
        spark.read.schema(schema)
        .option("multiLine", multi_line)
        .option("mode", "PERMISSIVE")
    )
    if corrupt_col is not None:
        r = r.option("columnNameOfCorruptRecord", corrupt_col)
    return r.json(path)


def read_csv(spark: SparkSession, path: str, schema: T.StructType | None = None,
             header: bool = True, null_value: str | None = None,
             sep: str = ",") -> DataFrame:
    """CSV scan (S3/S4): header, custom delimiter, null token
    (the notebooks' ``na_values='?'``)."""
    r = spark.read.option("header", header).option("sep", sep)
    if null_value is not None:
        r = r.option("nullValue", null_value)
    if schema is not None:
        r = r.schema(schema)
    else:
        r = r.option("inferSchema", True)  # convenience path only
    return r.csv(path)


def infer_then_assert(spark: SparkSession, path: str,
                      expected: T.StructType, fmt: str = "json") -> DataFrame:
    """Ingestion validator: infer, compare against the contract,
    fail fast on drift (replaces the reference's log-and-eyeball,
    spark_processing.py:34-38), then re-read with the explicit schema."""
    inferred = getattr(spark.read, fmt)(path).schema
    expected_names = {f.name for f in expected.fields}
    inferred_names = set(inferred.names)
    missing = expected_names - inferred_names
    extra = inferred_names - expected_names
    if missing or extra:
        raise ValueError(
            f"schema drift at {path}: missing={sorted(missing)} "
            f"extra={sorted(extra)}")
    reader = spark.read.schema(expected)
    return getattr(reader, fmt)(path)


def read_orc(spark: SparkSession, path: str,
             schema: T.StructType | None = None) -> DataFrame:
    """ORC scan — same columnar pushdown/pruning contract as Parquet
    (predicate pushdown + column pruning reach the stripe reader), for
    interchange with Hive/Trino estates that standardized on ORC."""
    r = spark.read
    if schema is not None:
        r = r.schema(schema)
    return r.orc(path)
