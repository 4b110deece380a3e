"""Deletion-neighborhood fuzzy join: completeness vs brute force on
adversarial edit positions (start/middle/end, insert/delete/swap)."""

from __future__ import annotations

import itertools

from pyspark.sql import functions as F

from big_data_analytics_spark.queries.fuzzy import _variants


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


WORDS = [
    "abcde", "xbcde", "bcde", "abcd", "aabcde", "abcdef", "abcde ",
    " abcde", "abde", "abcfe", "edcba", "a", "", "ab", "ba",
]


def test_deletion_neighborhood_complete_for_distance_1(spark):
    df = spark.createDataFrame(
        [(i, w) for i, w in enumerate(WORDS)], ["k", "s"])
    keyed = df.select("k", "s", F.explode(_variants("s")).alias("v"))
    right = (keyed.withColumnRenamed("k", "k2")
             .withColumnRenamed("s", "s2"))
    cand = (keyed.join(right, "v").where(F.col("k") < F.col("k2"))
            .select("k", "k2").distinct())
    got = {(r["k"], r["k2"]) for r in cand.collect()}
    want = {(i, j) for (i, a), (j, b)
            in itertools.combinations(enumerate(WORDS), 2)
            if _lev(a, b) <= 1}
    # every true distance<=1 pair must be a candidate (no false negatives)
    assert want <= got
