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
