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

    Scale: the variant join and Levenshtein verify run over DISTINCT
    names, never raw rows — exact-duplicate collapse before fuzzy
    matching, the same ordering the dedup family uses (exact_dedup
    before LSH). Raw-keyed FastSS is quadratic in identical-string
    multiplicity at every stage (m copies of a name put m rows in
    every variant bucket: m² candidate pairs generated, deduped, and
    verified — measured ×14 per data decade on a 10×-multiplicity
    corpus, vs ×2.2 collapsed, 21.8 → 5.4 s warm). After the
    distinct-name pairs verify, key pairs expand by two array joins
    (cross-name) and one i<j combination generator (same-name,
    dist 0) — output-bound work, since the result set itself is
    quadratic in multiplicity. On an all-unique corpus the collapse
    is pure overhead (~2× at sf0.1, traded and kept); |s|+1 variant
    rows per distinct string shuffle on the variant hash, and the
    quadratic step only ever happens within one variant bucket."""
    from big_data_analytics_spark.operators.joins import sized_side

    sup = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    n_sup = sup.count()  # metadata count; bounds every ks payload
    names = (sup.groupBy("s_name")
             .agg(F.sort_array(F.collect_list("s_suppkey")).alias("ks"))
             .localCheckpoint())
    # measured pins (round-12 implicit-broadcast audit: name/variant
    # relations grow with the supplier dimension, and derived-relation
    # stats mis-broadcast): variant rows = Σ(len+1), one cheap agg
    # over the checkpointed names
    n_var = int(names.agg(
        F.sum(F.length("s_name") + 1).alias("v")).collect()[0]["v"] or 0)
    keyed = names.select("s_name", F.explode(_variants("s_name")).alias("v"))
    right = keyed.withColumnRenamed("s_name", "r_name")
    npairs = (keyed.join(sized_side(right, n_var), "v")
              .where(F.col("s_name") < F.col("r_name"))
              .select("s_name", "r_name").distinct()
              .where(F.levenshtein("s_name", "r_name") <= 1))
    cross = (npairs
             .join(sized_side(
                 names.select("s_name", F.col("ks").alias("ka")), n_sup),
                   "s_name")
             .join(sized_side(
                 names.select(F.col("s_name").alias("r_name"),
                              F.col("ks").alias("kb")), n_sup), "r_name")
             .select("s_name", "r_name",
                     F.explode("ka").alias("k_a"), "kb")
             .select("s_name", "r_name", "k_a",
                     F.explode("kb").alias("k_b")))
    cross_pairs = cross.select(
        F.least("k_a", "k_b").alias("left_key"),
        F.greatest("k_a", "k_b").alias("right_key"),
        F.when(F.col("k_a") < F.col("k_b"), F.col("s_name"))
        .otherwise(F.col("r_name")).alias("left_name"),
        F.when(F.col("k_a") < F.col("k_b"), F.col("r_name"))
        .otherwise(F.col("s_name")).alias("right_name"),
        F.levenshtein("s_name", "r_name").cast("int").alias("dist"))
    # identical-name groups: every i<j key pair is a dist-0 match;
    # the sorted array + combination generator (the gr5 pair shape)
    # emits exactly C(m, 2) ordered pairs per group
    same = (names.where(F.size("ks") >= 2)
            .select("s_name",
                    F.explode(F.expr(
                        "flatten(transform(ks, (x, i) -> "
                        "transform(slice(ks, i + 2, size(ks) - i - 1), "
                        "y -> struct(x AS a, y AS b))))")).alias("p"))
            .select(F.col("p.a").alias("left_key"),
                    F.col("p.b").alias("right_key"),
                    F.col("s_name").alias("left_name"),
                    F.col("s_name").alias("right_name"),
                    F.lit(0).cast("int").alias("dist")))
    return cross_pairs.unionByName(same)
