"""ANN quality certification: recall of the approximate index against
the exact baseline, as a GRADED number.

v1 (brute-force cosine top-k) is the correctness baseline and v3
(random-hyperplane LSH) the scale path; tests/test_similarity.py
checks their agreement, but a pytest assertion is not driver
evidence. This module grades the recall itself: both pipelines run
in one plan, join on (query, neighbor), and the per-query hit count
is hash-checked against a DuckDB oracle that recomputes BOTH
pipelines (the v1/v3 oracles composed as CTEs — possible because v3's
hyperplanes are plan-time constants shared verbatim with SQL). This
is the dq3 move (certify the *guarantee*, not just the output)
applied to similarity search: the graded row pins the exact
recall@5 the LSH parameterization (16 tables x 4 planes) achieves on
this corpus, so any regression in bucketing, hashing, or rerank
shows up as a value mismatch, not a silent quality drop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from big_data_analytics_spark.queries import REGISTRY, query

# import for the registration side effect: v7's oracle embeds the v1
# and v3 oracle texts, and its plan calls their query functions
from big_data_analytics_spark.queries import dedup_queries as _dd  # noqa: F401
from big_data_analytics_spark.queries import similarity as _sim  # noqa: F401

_K = 5

_V7_ORACLE = f"""
    WITH brute AS ({REGISTRY['v1_cosine_topk'].oracle}
    ), ann AS ({REGISTRY['v3_lsh_ann_topk'].oracle}
    )
    SELECT b.query_id,
           CAST(COUNT(a.neighbor_id) AS BIGINT) AS n_hits,
           CAST(COUNT(a.neighbor_id) AS DOUBLE) / {_K} AS recall_at_5
    FROM brute b LEFT JOIN ann a
      ON b.query_id = a.query_id AND b.neighbor_id = a.neighbor_id
    GROUP BY b.query_id ORDER BY b.query_id
"""


@query("v7_ann_recall", oracle=_V7_ORACLE)
def v7_ann_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@5 of the LSH index (v3: 16 tables x 4 hyperplanes,
    candidate-bucket join + exact rerank) against the brute-force
    baseline (v1), per query vector: how many of the TRUE top-5 the
    approximate index returned. Both sides and the join run in one
    Spark job; the oracle recomputes both pipelines independently in
    DuckDB from the shared plane constants.

    Scale: the baseline side is the only O(n) stage and exists to
    certify quality offline on a sample — production serves from the
    LSH side alone; the certification join is |queries| x k rows."""
    brute = (REGISTRY["v1_cosine_topk"].spark_fn(spark, sf_dir)
             .select("query_id", "neighbor_id"))
    ann = (REGISTRY["v3_lsh_ann_topk"].spark_fn(spark, sf_dir)
           .select("query_id", "neighbor_id")
           .withColumn("_hit", F.lit(1)))
    j = brute.join(ann, ["query_id", "neighbor_id"], "left")
    return (j.groupBy("query_id")
            .agg(F.count("_hit").cast("long").alias("n_hits"),
                 (F.count("_hit").cast("double") / _K)
                 .alias("recall_at_5"))
            .orderBy("query_id"))
