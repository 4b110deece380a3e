"""Distribution alignment and export sharding for training corpora:
quantile normalization (map each source's value distribution onto the
global quantiles — the standard cross-source drift corrector) and
balanced shard assignment (equal-count output shards with verifiable
balance — what a training-data exporter needs before writing).

Both follow the st3/st4 histogram-first discipline: nothing ever
needs a corpus-wide total-order window; ranks come from per-source
(keyed) windows and the global distribution is carried as a
|distinct values|-row cumulative histogram that broadcasts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from big_data_analytics_spark.catalog import load_table
from big_data_analytics_spark.queries import query

_QN_MAX_HIST = 1_000_000
_QN_BLOCK = 1024

_QN_ORACLE = """
    WITH r AS (
        SELECT doc_id, source, n_chars FROM documents
    ), ranked AS (
        SELECT doc_id, source, n_chars,
               ROW_NUMBER() OVER (PARTITION BY source
                                  ORDER BY n_chars, doc_id) AS rk,
               COUNT(*) OVER (PARTITION BY source) AS ns
        FROM r
    ), hist AS (
        SELECT n_chars AS v, COUNT(*) AS cnt,
               CAST(SUM(COUNT(*)) OVER (ORDER BY n_chars
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS epos
        FROM r GROUP BY n_chars
    ), n AS (SELECT COUNT(*) AS nt FROM r),
    mapped AS (
        SELECT ranked.source, ranked.doc_id,
               h.v AS normalized
        FROM ranked, n,
             LATERAL (
                 SELECT v FROM hist
                 WHERE epos >= CAST(FLOOR((CAST(ranked.rk AS DOUBLE)
                         * nt + ranked.ns - 1) / ranked.ns) AS BIGINT)
                 ORDER BY epos LIMIT 1) h
    )
    SELECT source, COUNT(*) AS n_docs,
           CAST(SUM(normalized) AS BIGINT) AS norm_sum,
           MIN(normalized) AS norm_min, MAX(normalized) AS norm_max
    FROM mapped GROUP BY source ORDER BY source
"""


@query("qn1_quantile_normalize", oracle=_QN_ORACLE)
def qn1_quantile_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile normalization of per-source document lengths onto the
    GLOBAL length distribution: each document's within-source rank r
    (of n_s) maps to the global value at nearest-rank position
    ceil(r * N / n_s) — the standard cross-source distribution
    aligner (e.g. before mixing corpora whose length profiles
    differ). Emits per-source count, exact sum, and min/max of the
    normalized values. All positions are exact integers; ties are
    broken by doc_id so ranks are engine-identical.

    The scale discipline: within-source ranks are KEYED windows
    (partition by source — parallel at any scale), and the global
    distribution is not a corpus-wide row_number but a |distinct
    value|-row cumulative histogram that BROADCASTS; the position
    lookup is a broadcast backward as-of join (first histogram
    interval whose end position covers the target). No corpus-sized
    relation is ever totally ordered — the same reason st3/st4
    aggregate before their windows."""
    r = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars")
    ws = Window.partitionBy("source").orderBy("n_chars", "doc_id")
    ranked = r.select(
        "doc_id", "source", "n_chars",
        F.row_number().over(ws).alias("rk"),
        F.count("*").over(Window.partitionBy("source")).alias("ns"))
    hist = (r.groupBy(F.col("n_chars").alias("v"))
            .agg(F.count("*").alias("cnt"))
            .select("v", F.sum("cnt").over(
                Window.orderBy("v").rowsBetween(
                    Window.unboundedPreceding, Window.currentRow))
                .cast("long").alias("epos")))
    nt = r.agg(F.count("*").alias("nt"))
    pos = F.floor((F.col("rk").cast("double") * F.col("nt")
                   + F.col("ns") - 1) / F.col("ns")).cast("long")
    # forward as-of (smallest epos >= pos) as a MAP-ONLY two-level
    # probe over the broadcast sorted histogram: a `>=` range join
    # would emit every qualifying interval per document
    # (O(rows x |hist|) amplification) before a rank filter — this
    # shape touches each document exactly once. The histogram is
    # pre-chunked into _QN_BLOCK-element blocks; each row scans the
    # block-ends array (|hist|/_QN_BLOCK elements) then ONE block, so
    # the per-row cost is O(|hist|/B + B), not O(|hist|). The
    # assert_true guard bounds the broadcast itself: a normalized key
    # with more than _QN_MAX_HIST distinct values fails loudly at run
    # time (quantize the key first) instead of silently materializing
    # an unbounded single-row histogram; tying `blocks` to the guard
    # keeps Catalyst from pruning it.
    harr = hist.agg(
        F.array_sort(F.collect_list(F.struct("epos", "v"))).alias("h"))
    blocked = harr.select(
        F.expr(
            f"if(isnull(assert_true(size(h) <= {_QN_MAX_HIST}, "
            f"'qn1: histogram cardinality exceeds {_QN_MAX_HIST} — "
            f"quantize the normalized key')), "
            f"transform(sequence(0, (size(h) - 1) DIV {_QN_BLOCK}), "
            f"i -> slice(h, i * {_QN_BLOCK} + 1, {_QN_BLOCK})), "
            f"null)").alias("blocks"))
    blocked = blocked.select(
        "blocks",
        F.expr("transform(blocks, b -> element_at(b, -1).epos)")
        .alias("ends"))
    # pos <= N (the last epos) by construction, so a covering block
    # always exists: its index is the count of blocks ending below pos
    blk = F.element_at(
        F.col("blocks"),
        (F.size(F.filter("ends", lambda e: e < F.col("pos"))) + 1)
        .cast("int"))
    lookup = F.element_at(
        F.filter(blk, lambda s: s["epos"] >= F.col("pos")), 1)["v"]
    cand = (ranked.crossJoin(F.broadcast(nt))
            .withColumn("pos", pos)
            .crossJoin(F.broadcast(blocked))
            .select("source", "doc_id", lookup.alias("normalized")))
    return (cand.groupBy("source")
            .agg(F.count("*").alias("n_docs"),
                 F.sum("normalized").cast("long").alias("norm_sum"),
                 F.min("normalized").alias("norm_min"),
                 F.max("normalized").alias("norm_max"))
            .orderBy("source"))


_SH_N = 8

_SH_ORACLE = f"""
    WITH r AS (
        SELECT doc_id, n_chars,
               ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
                   AS h
        FROM documents
    ), sharded AS (
        SELECT doc_id, n_chars,
               CAST(NTILE({_SH_N}) OVER (ORDER BY h, doc_id) AS BIGINT)
                   - 1 AS shard
        FROM r
    )
    SELECT shard, COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS bytes_proxy,
           MIN(doc_id) AS min_doc, MAX(doc_id) AS max_doc
    FROM sharded GROUP BY shard ORDER BY shard
"""


@query("sh1_balanced_shards", oracle=_SH_ORACLE)
def sh1_balanced_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Balanced export sharding: assign every document to one of
    {N} equal-count shards by NTILE over a portable md5 hash of the
    id (hash order ~ random order, so shards are also statistically
    balanced in bytes), and emit the per-shard manifest a training
    exporter checks before writing (row count, byte proxy, id range).
    Counts differ by at most 1 BY CONSTRUCTION — that is NTILE's
    contract, unlike modulo sharding, which inherits whatever
    imbalance the id distribution has.

    Scale shape: the NTILE runs in the two-level stitched form
    (operators/ranking.py) — the md5 hash is uniform in [0, 2^32),
    so 64 equal-width hash ranges are balanced by construction and
    the bucket assignment is a pure expression (no bounds pass);
    per-range counts stitch into exact global row numbers and the
    NTILE is an integer formula over them. No stage orders more than
    one hash-range of documents; the only total-order window in the
    plan runs over the 64-row bucket-totals relation."""
    from big_data_analytics_spark.operators.ranking import stitched_ntile

    r = load_table(spark, sf_dir, "documents").select(
        "doc_id", "n_chars",
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8),
               16, 10).cast("long").alias("h"))
    # h is uniform in [0, 2^32): 64 equal-width ranges, no bounds scan
    sharded = stitched_ntile(
        r, _SH_N, "h", ["doc_id"], out="tile",
        bucket_expr=F.expr(f"h DIV {(1 << 32) // 64}"))
    sharded = sharded.select(
        "doc_id", "n_chars", (F.col("tile") - 1).alias("shard"))
    return (sharded.groupBy("shard")
            .agg(F.count("*").alias("n_docs"),
                 F.sum("n_chars").cast("long").alias("bytes_proxy"),
                 F.min("doc_id").alias("min_doc"),
                 F.max("doc_id").alias("max_doc"))
            .orderBy("shard"))


sh1_balanced_shards.__doc__ = sh1_balanced_shards.__doc__.format(N=_SH_N)
