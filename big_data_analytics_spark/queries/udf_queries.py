"""Driver-graded certification of the Python UDF tiers (SURVEY.md
§2.11). Everything else in the registry is deliberately JVM-only —
the plan audit enforces "no Python eval in oracled queries" — but the
Arrow tiers themselves are first-class engine surface and deserve
hash-graded rows, not just unit tests. These queries are the
sanctioned exceptions (exempted by name in tests/test_plans.py):

- x11: grouped ``applyInPandas`` (tier 3) — an imperative per-group
  scan over BOUNDED groups (one user's events), the shape where the
  pandas tier is legitimately needed. The oracle proves the same
  semantics are SQL-expressible here (gaps-and-islands), which is
  exactly what makes it hash-gradable; real tier-3 payloads (model
  refits per group) are certified by the same plumbing.
- x12: scalar ``pandas_udf`` (tier 2) — an Arrow-batched vectorized
  transform whose arithmetic is pinned to the engine-portable
  fixed-point convention, proving the Python⇄JVM Arrow boundary
  neither reorders nor perturbs values.

- x13: Python UDTF (tier 4) — an Arrow-batched TABLE function
  (one row in, many out) through a LATERAL join, proving row
  multiplicity and values survive the boundary.

All keep the Python work integer-exact, so cross-engine hash parity
holds bit-for-bit despite the round trip through numpy.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import LongType

from big_data_analytics_spark.catalog import load_table
from big_data_analytics_spark.queries import query


@query(
    "x11_grouped_streaks",
    oracle="""
    WITH v AS (
        SELECT user_id, ts, event_id,
               CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT) AS vc
        FROM events
    ), flagged AS (
        SELECT user_id, ts, event_id,
               CASE WHEN vc > LAG(vc) OVER (
                        PARTITION BY user_id ORDER BY ts, event_id)
                    THEN 0 ELSE 1 END AS brk
        FROM v
    ), runs AS (
        SELECT user_id,
               SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW) AS run_id
        FROM flagged
    ), lens AS (
        SELECT user_id, run_id, COUNT(*) AS run_len
        FROM runs GROUP BY user_id, run_id
    )
    SELECT user_id,
           CAST(SUM(run_len) AS BIGINT) AS n_events,
           CAST(MAX(run_len) AS BIGINT) AS max_streak
    FROM lens GROUP BY user_id
    """,
)
def x11_grouped_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest strictly-increasing value streak per user, computed by
    an imperative pandas scan inside ``applyInPandas`` (tier 3).

    Each group is ONE USER's events — bounded state (the gi1/w7
    partitioning argument), so the Arrow transfer per group is small
    and the shuffle is the same single user_id exchange every window
    query pays; this is the legitimate tier-3 shape, unlike a
    whole-column group. Values are compared as integer cents so the
    Python path is bit-exact against the oracle's gaps-and-islands
    SQL (streak breaks where value fails to strictly increase;
    max run length per user)."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id",
        F.floor(F.col("value") * 100.0 + 0.5).cast("long").alias("vc"))

    def streaks(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["ts", "event_id"])
        vc = pdf["vc"].to_numpy()
        best = cur = 1 if len(vc) else 0
        for i in range(1, len(vc)):
            cur = cur + 1 if vc[i] > vc[i - 1] else 1
            if cur > best:
                best = cur
        return pd.DataFrame([{"user_id": int(pdf["user_id"].iloc[0]),
                              "n_events": len(vc),
                              "max_streak": best}])

    return ev.groupBy("user_id").applyInPandas(
        streaks, schema="user_id bigint, n_events bigint, max_streak bigint")


@query(
    "x12_arrow_cents_buckets",
    oracle="""
    SELECT CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT) % 7 AS bucket,
           COUNT(*) AS n,
           CAST(SUM(CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
               AS cents_sum
    FROM events
    GROUP BY 1
    """,
)
def x12_arrow_cents_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched scalar ``pandas_udf`` (tier 2): fixed-point cents
    conversion runs in numpy, everything around it (scan, grouping,
    counting) stays JVM-side — certifying that values survive the
    Python⇄JVM Arrow round trip bit-exactly. floor(v*100+0.5) is the
    same IEEE double op in numpy as in Spark/DuckDB, so the int64
    cents — and therefore the bucket histogram — hash-match the pure
    SQL oracle. Production code uses the tier-1 expression
    (functions/money.py); this query exists to certify the tier."""

    @pandas_udf(LongType())
    def cents(v: pd.Series) -> pd.Series:
        import numpy as np
        return pd.Series(np.floor(v.to_numpy() * 100.0 + 0.5)
                         .astype("int64"))

    ev = load_table(spark, sf_dir, "events")
    return (ev.select(cents(F.col("value")).alias("c"))
            .groupBy((F.col("c") % 7).alias("bucket"))
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum("c").cast("long").alias("cents_sum")))


@query(
    "x13_udtf_chunk_profile",
    oracle="""
    WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ), idx AS (
        SELECT doc_id, t,
               unnest(range(CAST(ceil(len(t) / 16.0) AS BIGINT))) AS ci
        FROM toks
    ), chunks AS (
        SELECT CAST(ci AS INTEGER) AS ci,
               len(t[ci * 16 + 1 : ci * 16 + 16]) AS n_toks,
               len(list_distinct(t[ci * 16 + 1 : ci * 16 + 16]))
                   AS n_distinct
        FROM idx
    )
    SELECT ci,
           CAST(COUNT(*) AS BIGINT) AS n_chunks,
           CAST(SUM(n_toks) AS BIGINT) AS sum_toks,
           CAST(SUM(n_distinct) AS BIGINT) AS sum_distinct
    FROM chunks GROUP BY ci ORDER BY ci
    """,
)
def x13_udtf_chunk_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (tier 4, table-valued: one row in → many rows out)
    certified like x11/x12 certify tiers 2-3: a chunk profiler UDTF
    emits (chunk_index, token_count, distinct_token_count) per
    16-token chunk of each document through a LATERAL join, then a
    plain JVM aggregate rolls the corpus up by chunk index. Arrow
    transfer is asserted in the plan (ArrowEvalPythonUDTF — the
    session enables spark.sql.execution.pythonUDTF.arrow.enabled);
    all UDTF outputs are exact integers, so the hash proves the
    Python⇄JVM table-function boundary preserves row multiplicity
    and values bit-for-bit.

    Scale: the UDTF runs embarrassingly parallel over document
    partitions (no shuffle until the final bounded rollup); the
    fan-out is linear in corpus tokens. Real tier-4 payloads —
    sentence splitters, parser emissions, per-doc candidate
    generators — ride the identical plumbing."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="ci int, n_toks int, n_distinct int")
    class ChunkProfile:
        def eval(self, text: str):
            toks = text.split(" ")
            for ci in range(0, (len(toks) + 15) // 16):
                ch = toks[ci * 16:(ci + 1) * 16]
                yield ci, len(ch), len(set(ch))

    spark.conf.set("spark.sql.execution.pythonUDTF.arrow.enabled",
                   "true")
    spark.udtf.register("x13_chunk_profile", ChunkProfile)
    load_table(spark, sf_dir, "documents").createOrReplaceTempView(
        "x13_docs")
    chunks = spark.sql(
        "SELECT f.ci, f.n_toks, f.n_distinct "
        "FROM x13_docs d, LATERAL x13_chunk_profile(d.text) f")
    return (chunks.groupBy("ci")
            .agg(F.count(F.lit(1)).cast("long").alias("n_chunks"),
                 F.sum("n_toks").cast("long").alias("sum_toks"),
                 F.sum("n_distinct").cast("long").alias("sum_distinct"))
            .orderBy("ci"))
