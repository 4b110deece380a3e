"""Fuzzy string joins: edit-distance-1 entity matching at scale.

The brute-force form is an all-pairs cross join with a Levenshtein
filter — quadratic in the corpus and impossible at 100 TB. The scale
shape here is the FastSS / deletion-neighborhood scheme (public
algorithm, Bocek et al. 2007): two strings are within edit distance 1
iff one's single-character-deletion neighborhood (plus the string
itself) intersects the other's. Generating |s|+1 variant keys per
string turns the problem into an *equality* join on variant — linear
explode, hash-partitioned shuffle, candidate dedup, then an exact
Levenshtein verification on the (tiny) candidate set. The same
pattern extends to distance k with k-deletion neighborhoods.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from big_data_analytics_spark.catalog import load_table
from big_data_analytics_spark.queries import query


def _variants(col: str) -> F.Column:
    """The string plus every single-character deletion of it."""
    s = F.col(col)
    deletions = F.transform(
        F.sequence(F.lit(1), F.length(s)),
        lambda i: F.concat(F.substring(s, F.lit(1), i - 1),
                           s.substr(i + 1, F.length(s))),
    )
    return F.array_distinct(F.concat(F.array(s), deletions))


@query(
    "fj1_fuzzy_supplier_names",
    oracle="""
    SELECT a.s_suppkey AS left_key,
           b.s_suppkey AS right_key,
           a.s_name AS left_name,
           b.s_name AS right_name,
           CAST(levenshtein(a.s_name, b.s_name) AS INTEGER) AS dist
    FROM supplier a
    JOIN supplier b ON a.s_suppkey < b.s_suppkey
    WHERE levenshtein(a.s_name, b.s_name) <= 1
    """,
)
def fj1_fuzzy_supplier_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All supplier-name pairs within edit distance 1, via the
    deletion-neighborhood equality join (complete for distance ≤ 1:
    a substitution at position i makes the i-th deletions equal; an
    insert/delete makes the shorter string a deletion variant of the
    longer). The oracle is the brute-force quadratic definition —
    equality of the two proves the blocking loses no pairs.

    Scale: |s|+1 variant rows per string shuffle on the variant hash;
    candidate pairs are deduped *before* the Levenshtein verify, and
    the quadratic step only ever happens within one variant bucket
    (names sharing a variant), never across the corpus."""
    sup = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    keyed = sup.select(
        "s_suppkey", "s_name", F.explode(_variants("s_name")).alias("v")
    )
    right = (keyed.withColumnRenamed("s_suppkey", "right_key")
             .withColumnRenamed("s_name", "right_name"))
    cand = (
        keyed.alias("l")
        .join(right.alias("r"), "v")
        .where(F.col("s_suppkey") < F.col("right_key"))
        .select(F.col("s_suppkey").alias("left_key"), "right_key",
                F.col("s_name").alias("left_name"), "right_name")
        .distinct()
    )
    return cand.where(
        F.levenshtein("left_name", "right_name") <= 1
    ).withColumn(
        "dist", F.levenshtein("left_name", "right_name").cast("int")
    )
