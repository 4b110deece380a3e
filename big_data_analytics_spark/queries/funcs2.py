"""Scalar-function and grouping extensions: edit distance, regex
multi-extraction, and explicit GROUPING SETS with grouping ids.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from big_data_analytics_spark.catalog import load_table
from big_data_analytics_spark.queries import query


@query(
    "f22_edit_distance",
    oracle="""
    SELECT c_custkey, c_name,
           levenshtein(c_name, regexp_replace(c_name, '[aeiou]', '', 'g'))
               AS dist_devoweled,
           levenshtein(c_name, c_mktsegment) AS dist_segment
    FROM customer
    """,
)
def f22_edit_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Levenshtein distances: name vs its devoweled form (== number of
    vowels removed, a self-consistency the oracle re-derives) and name
    vs an unrelated string. JVM-side, no UDF."""
    c = load_table(spark, sf_dir, "customer")
    devoweled = F.regexp_replace(F.col("c_name"), "[aeiou]", "")
    return c.select(
        "c_custkey", "c_name",
        F.levenshtein(F.col("c_name"), devoweled).alias("dist_devoweled"),
        F.levenshtein(F.col("c_name"), F.col("c_mktsegment"))
        .alias("dist_segment"),
    )


@query(
    "f23_regexp_extract_all",
    oracle="""
    SELECT doc_id,
           coalesce(array_to_string(regexp_extract_all(text, '[a-z]{6,}'),
                                    ','), '') AS long_words,
           len(regexp_extract_all(text, '[a-z]{6,}')) AS n_long_words
    FROM documents
    """,
)
def f23_regexp_extract_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All ≥6-letter words per document (joined to one string — the
    value-hash comparators don't canonicalize array cells) plus the
    match count, including the empty (not NULL) no-match case."""
    d = load_table(spark, sf_dir, "documents")
    # idx 0 = whole match (Spark defaults to capture group 1; DuckDB
    # defaults to group 0)
    words = F.regexp_extract_all(F.col("text"), F.lit("[a-z]{6,}"), 0)
    return d.select(
        "doc_id",
        F.array_join(words, ",").alias("long_words"),
        F.size(words).cast("long").alias("n_long_words"),
    )


@query(
    "h1_value_histogram",
    oracle="""
    SELECT event_type,
           CAST(FLOOR(value / 25.0) AS BIGINT) AS bucket,
           COUNT(*) AS n
    FROM events
    WHERE value IS NOT NULL
    GROUP BY event_type, CAST(FLOOR(value / 25.0) AS BIGINT)
    """,
)
def h1_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram per event type via floor-bucketing — one
    partial-aggregating pass; the scale-safe alternative to exact
    percentiles when the distribution shape is the question."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    bucket = F.floor(F.col("value") / 25.0).cast("long")
    return (
        ev.groupBy("event_type", bucket.alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "sa1_ordered_string_agg",
    oracle="""
    SELECT n.n_name,
           string_agg(s.s_name, ',' ORDER BY s.s_name) AS suppliers,
           COUNT(*) AS n_suppliers
    FROM supplier s JOIN nation n ON n.n_nationkey = s.s_nationkey
    GROUP BY n.n_name
    """,
)
def sa1_ordered_string_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic string aggregation: collect_list is
    arrival-ordered (nondeterministic under parallelism), so sort the
    array before joining — the engine-portable ORDER BY inside an
    aggregate."""
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    return (
        s.join(F.broadcast(n), n.n_nationkey == s.s_nationkey)
        .groupBy("n_name")
        .agg(
            F.array_join(F.array_sort(F.collect_list("s_name")), ",")
            .alias("suppliers"),
            F.count(F.lit(1)).alias("n_suppliers"),
        )
    )


@query(
    "g3_grouping_sets",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           GROUPING(o_orderstatus, o_orderpriority) AS gid,
           COUNT(*) AS n,
           CAST(SUM(CAST(FLOOR(o_totalprice*100.0+0.5) AS BIGINT))
                AS DOUBLE)/100.0 AS revenue
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                            (o_orderstatus), ())
    """,
)
def g3_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (finer than rollup/cube: exactly the
    three requested sets) with the grouping-id bitmask — both engines
    emit NULL for grouped-away columns and the same (status, priority)
    bit order."""
    o = load_table(spark, sf_dir, "orders")
    o.createOrReplaceTempView("__g3_orders")
    return o.sparkSession.sql("""
        SELECT o_orderstatus, o_orderpriority,
               grouping_id() AS gid,
               COUNT(*) AS n,
               CAST(SUM(CAST(FLOOR(o_totalprice*100.0+0.5) AS BIGINT))
                    AS DOUBLE)/100.0 AS revenue
        FROM __g3_orders
        GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                                (o_orderstatus), ())
    """)
