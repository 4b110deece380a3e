"""Scale-behavior tests for the round-5 surface — the properties the
sf0.01 oracle gate can't see: fan-out caps engaging on adversarial
(power-user) inputs, bracket invariants of the gap-fill windows, and
the integer headroom of the rolling-zscore test.
"""

from __future__ import annotations

from pyspark.sql import Row, functions as F

from big_data_analytics_spark.queries import load_all

REGISTRY = load_all()
SF = "/root/testdata/sf0.01"


def test_cf1_cap_bounds_power_user_fanout(spark):
    """The per-user top-20 item cap must bound pair fan-out per user
    at C(20,2)=190 no matter how heavy the user's history is —
    replay the cf1 pair pipeline over a planted 200-item power user
    and assert the cap engages (the uncapped form would emit
    C(200,2)=19900 pairs for that user)."""
    from pyspark.sql import Window
    rows = [Row(u=1, i=i, q=i + 1) for i in range(200)]
    rows += [Row(u=2, i=i, q=5) for i in range(10)]
    ratings_all = spark.createDataFrame(rows)
    wu = Window.partitionBy("u").orderBy(F.desc("q"), "i")
    ratings = (ratings_all.withColumn("rn", F.row_number().over(wu))
               .filter(F.col("rn") <= 20).drop("rn"))
    a, b = ratings.alias("a"), ratings.alias("b")
    pairs = a.join(b, (F.col("a.u") == F.col("b.u"))
                   & (F.col("a.i") < F.col("b.i")))
    per_user = {r["u"]: r["n"] for r in
                pairs.groupBy(F.col("a.u").alias("u"))
                .agg(F.count(F.lit(1)).alias("n")).collect()}
    assert per_user[1] == 190  # capped, not 19900
    assert per_user[2] == 45   # under the cap: untouched


def test_ts2_interior_gaps_always_bracketed(spark):
    """The per-user grid spans exactly [min, max] observed hours, so
    every interpolated hour must have both brackets — no NULL
    total_value can ever appear, and per user:
    n_hours == n_observed + n_gap_filled == span_hours + 1."""
    out = REGISTRY["ts2_hourly_gap_fill"].spark_fn(spark, SF)
    bad = out.filter(
        F.col("total_value").isNull()
        | (F.col("n_hours")
           != F.col("n_observed") + F.col("n_gap_filled"))).count()
    assert bad == 0
    assert out.count() > 0


def test_ts3_integer_test_has_headroom(spark):
    """The cleared-of-divisions 3-sigma inequality must stay inside
    int64 at the engine's documented value bound (cents <= 10^7,
    frame n <= 21): recompute the worst-case magnitudes."""
    vc, n = 10**7, 21
    s, s2 = n * vc, n * vc * vc
    left = (n - 1) * (n * vc - (-s)) ** 2  # widest deviation
    right = 9 * n * (n * s2 - 0)
    assert max(left, right) < 2**63 - 1


def test_ts3_flags_planted_outlier(spark):
    """A constant series with one spike must flag exactly the spike
    (and nothing else) once the 10-row history exists."""
    rows = [Row(user_id=1, ts=f"2024-01-01 00:{m:02d}:00",
                event_id=m, value=10.0 if m != 40 else 500.0)
            for m in range(50)]
    df = spark.createDataFrame(rows).withColumn(
        "ts", F.to_timestamp("ts"))
    from pyspark.sql import Window
    v = df.select("user_id", "ts", "event_id",
                  F.floor(F.col("value") * 100.0 + 0.5).cast("long")
                  .alias("vc"))
    w = (Window.partitionBy("user_id").orderBy("ts", "event_id")
         .rowsBetween(-20, -1))
    fr = v.select(
        "vc",
        F.count("vc").over(w).alias("n"),
        F.sum("vc").over(w).alias("s"),
        F.sum(F.col("vc") * F.col("vc")).over(w).alias("s2"))
    n, s, s2, vc = (F.col(c) for c in ("n", "s", "s2", "vc"))
    dev = n * vc - s
    flagged = fr.filter(
        (n >= 10) & ((n - 1) * dev * dev > 9 * n * (n * s2 - s * s)))
    got = [r["vc"] for r in flagged.collect()]
    assert got == [50000]


def test_mb1_deterministic_across_runs(spark):
    """Top-100 selection uses a strict total order (pair_n DESC,
    part_a, part_b): two executions must return identical rows."""
    q = REGISTRY["mb1_association_rules"]
    a = [tuple(r) for r in q.spark_fn(spark, SF).collect()]
    b = [tuple(r) for r in q.spark_fn(spark, SF).collect()]
    assert a == b and len(a) > 0


def test_t13_chunk_counts_conserved(spark):
    """Keep-first dedup conserves chunks: per doc n_chunks ==
    n_kept + n_removed, global kept == number of DISTINCT chunks,
    and doc_ids are exactly the corpus's."""
    out = REGISTRY["t13_chunk_dedup"].spark_fn(spark, SF)
    bad = out.filter(F.col("n_chunks")
                     != F.col("n_kept") + F.col("n_removed")).count()
    assert bad == 0
    tot = out.agg(F.sum("n_chunks").alias("c"),
                  F.sum("n_kept").alias("k")).collect()[0]
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    distinct_chunks = (
        docs.select("doc_id", F.split("text", " ").alias("t"))
        .select(F.explode(F.sequence(
            F.lit(0),
            F.ceil(F.size("t") / F.lit(10.0)).cast("long") - 1))
            .alias("ci"), "t")
        .select(F.array_join(
            F.slice("t", F.col("ci") * 10 + 1, F.lit(10)), " ")
            .alias("chunk"))
        .distinct().count())
    assert tot["k"] == distinct_chunks
    assert out.count() == docs.count()
