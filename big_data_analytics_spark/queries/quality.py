"""Data-quality surface: one-pass column profiling and referential-
integrity checks — the guardrails that gate a 100 TB ingest before
anything downstream trains on it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from big_data_analytics_spark.catalog import load_table
from big_data_analytics_spark.queries import query


def profile_columns(df: DataFrame, cols: list[str],
                    exact: bool = False) -> DataFrame:
    """Per-column profile: rows, nulls, distincts, min/max as strings.
    One row per column via an unpivoted struct array.

    Distinct counts are ``approx_count_distinct`` (HLL++) by default:
    N simultaneous *exact* ``countDistinct`` aggregates plan through
    Spark's ``Expand``, multiplying every scanned row ×(N+1) before
    the shuffle — a 5-6× hidden read amplification on the gate that is
    supposed to be cheap at 100 TB. HLL sketches are plain (mergeable,
    fixed-size) aggregates: one pass, no Expand.

    ``exact=True`` keeps exact distincts without the Expand: the
    rows/nulls/min/max aggregate stays a single pass, and distincts
    come from a second pass that unpivots to (column, value) pairs and
    counts groups — map-side partial aggregation bounds the shuffle by
    the number of *distinct* values per partition, never rows ×(N+1).
    Values are compared through their string cast, which is injective
    on doubles/longs/strings (Spark renders the shortest decimal
    repr, distinct doubles never collide)."""
    aggs = [F.count(F.lit(1)).alias("__rows")]
    for c in cols:
        aggs += [
            F.sum(F.col(c).isNull().cast("long")).alias(f"__nulls_{c}"),
            F.min(c).cast("string").alias(f"__min_{c}"),
            F.max(c).cast("string").alias(f"__max_{c}"),
        ]
        if not exact:
            aggs.append(F.approx_count_distinct(c).alias(f"__nd_{c}"))
    row = df.agg(*aggs)
    pairs = F.array(*[
        F.struct(
            F.lit(c).alias("column"),
            F.col("__rows").alias("n_rows"),
            F.col(f"__nulls_{c}").alias("n_nulls"),
            *([] if exact else [F.col(f"__nd_{c}").alias("n_distinct")]),
            F.col(f"__min_{c}").alias("min_value"),
            F.col(f"__max_{c}").alias("max_value"),
        ) for c in cols
    ])
    prof = row.select(F.explode(pairs).alias("p")).select("p.*")
    if not exact:
        return prof
    unpivoted = df.select(F.explode(F.array(*[
        F.struct(F.lit(c).alias("column"),
                 F.col(c).cast("string").alias("v"))
        for c in cols
    ])).alias("p")).select("p.*").filter(F.col("v").isNotNull())
    nd = (unpivoted.distinct()          # partial+final hash agg, no Expand
          .groupBy("column").agg(F.count(F.lit(1)).alias("n_distinct")))
    return (prof.join(nd, "column", "left")
            .na.fill({"n_distinct": 0})  # all-null column has 0 distincts
            .select("column", "n_rows", "n_nulls", "n_distinct",
                    "min_value", "max_value"))


@query(
    "dq1_profile_lineitem",
    oracle="""
    WITH t AS (SELECT COUNT(*) AS n_rows FROM lineitem)
    SELECT col AS column, n_rows, n_nulls, n_distinct, min_value, max_value
    FROM (
      SELECT 'l_quantity' AS col, t.n_rows,
             (SELECT COUNT(*) FROM lineitem WHERE l_quantity IS NULL) AS n_nulls,
             (SELECT COUNT(DISTINCT l_quantity) FROM lineitem) AS n_distinct,
             (SELECT CAST(MIN(l_quantity) AS VARCHAR) FROM lineitem) AS min_value,
             (SELECT CAST(MAX(l_quantity) AS VARCHAR) FROM lineitem) AS max_value
      FROM t
      UNION ALL
      SELECT 'l_returnflag', t.n_rows,
             (SELECT COUNT(*) FROM lineitem WHERE l_returnflag IS NULL),
             (SELECT COUNT(DISTINCT l_returnflag) FROM lineitem),
             (SELECT MIN(l_returnflag) FROM lineitem),
             (SELECT MAX(l_returnflag) FROM lineitem)
      FROM t
      UNION ALL
      SELECT 'l_orderkey', t.n_rows,
             (SELECT COUNT(*) FROM lineitem WHERE l_orderkey IS NULL),
             (SELECT COUNT(DISTINCT l_orderkey) FROM lineitem),
             (SELECT CAST(MIN(l_orderkey) AS VARCHAR) FROM lineitem),
             (SELECT CAST(MAX(l_orderkey) AS VARCHAR) FROM lineitem)
      FROM t
    )
    """,
)
def dq1_profile_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Profile of three lineitem columns — the ingest health report.
    Uses the exact-distinct path (engine-portable values for the
    oracle) in its Expand-free two-pass form; the one-pass
    approx_count_distinct default is the 100 TB configuration."""
    l = load_table(spark, sf_dir, "lineitem")
    return profile_columns(l, ["l_quantity", "l_returnflag", "l_orderkey"],
                           exact=True)


@query(
    "dq2_referential_integrity",
    oracle="""
    SELECT
      (SELECT COUNT(*) FROM orders o
       WHERE NOT EXISTS (SELECT 1 FROM customer c
                         WHERE c.c_custkey = o.o_custkey))
          AS orphan_orders,
      (SELECT COUNT(*) FROM lineitem l
       WHERE NOT EXISTS (SELECT 1 FROM orders o
                         WHERE o.o_orderkey = l.l_orderkey))
          AS orphan_lineitems,
      (SELECT COUNT(*) FROM lineitem l
       WHERE NOT EXISTS (SELECT 1 FROM part p
                         WHERE p.p_partkey = l.l_partkey))
          AS orphan_partrefs
    """,
)
def dq2_referential_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Foreign-key violation counts via left-anti joins (the
    distributed NOT EXISTS): all zero on healthy data, and the query
    is the production gate when they are not."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    # one plan, one action: each check is a 1-row aggregate over a
    # left-anti join, cross-joined into the single report row
    orders_chk = (o.join(c, o.o_custkey == c.c_custkey, "left_anti")
                  .agg(F.count(F.lit(1)).alias("orphan_orders")))
    line_chk = (l.join(o, l.l_orderkey == o.o_orderkey, "left_anti")
                .agg(F.count(F.lit(1)).alias("orphan_lineitems")))
    part_chk = (l.join(p, l.l_partkey == p.p_partkey, "left_anti")
                .agg(F.count(F.lit(1)).alias("orphan_partrefs")))
    return orders_chk.crossJoin(line_chk).crossJoin(part_chk)


@query(
    "dq3_contamination_check",
    oracle="""
    WITH train AS (
      SELECT doc_id, text FROM documents
      WHERE (doc_id * 2654435761) % 2147483648 % 100 < 90
    ), src AS (
      SELECT doc_id, text FROM train ORDER BY doc_id LIMIT 10
    ), pairs AS (
      SELECT doc_id AS left_id, doc_id + 1000000 AS right_id,
             regexp_split_to_array(
                 trim(regexp_replace(lower(text), '\\s+', ' ', 'g')),
                 ' ') AS ta,
             regexp_split_to_array(
                 trim(regexp_replace(lower(text || ' tail'), '\\s+', ' ', 'g')),
                 ' ') AS tb
      FROM src
    ), sh AS (
      SELECT left_id, right_id,
             list_distinct(list_transform(
                 generate_series(1, greatest(1, len(ta) - 2)),
                 i -> array_to_string(ta[i:i+2], ' '))) AS sa,
             list_distinct(list_transform(
                 generate_series(1, greatest(1, len(tb) - 2)),
                 i -> array_to_string(tb[i:i+2], ' '))) AS sb
      FROM pairs
    )
    SELECT left_id, right_id FROM sh
    WHERE CAST(len(list_intersect(sa, sb)) AS DOUBLE)
          / (len(sa) + len(sb) - len(list_intersect(sa, sb))) >= 0.5
    """,
)
def dq3_contamination_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/eval contamination gate, hash-graded as a *recall
    certification*: documents hash-split 90/10 into pseudo train/eval,
    10 train docs planted into eval as near-copies (one appended
    token), and the cross-corpus MinHash-LSH check must recover every
    planted (source, leak) pair. The oracle is the exact 3-shingle
    Jaccard ground truth over the planted pairs (all ≥ 0.5 by
    construction — J = (n-2)/(n-1) for an n-token doc); the Spark side
    is the LSH detector's output restricted to the planted id space.
    A hash match therefore asserts LSH recall = 100% on the known
    positives — the "found-pair superset" relation made gradeable.
    (The corpus-wide fuzzy sweep stays available via
    cross_corpus_lsh_pairs directly; its est_jaccard values are
    xxhash-specific and remain oracle-free by nature. dq4 is the
    corpus-wide *exact* complement.)"""
    from big_data_analytics_spark.operators.dedup import (
        cross_corpus_lsh_pairs,
    )
    from big_data_analytics_spark.queries.sampling import hash_bucket

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    b = hash_bucket(F.col("doc_id"))
    train, eval_set = d.filter(b < 90), d.filter(b >= 90)
    # plant leakage: 10 train docs near-copied into eval
    leaked = (train.orderBy("doc_id").limit(10)
              .select((F.col("doc_id") + 1_000_000).alias("doc_id"),
                      F.concat("text", F.lit(" tail")).alias("text")))
    pairs = cross_corpus_lsh_pairs(
        train, eval_set.unionByName(leaked), threshold=0.5)
    return (
        pairs.filter(
            (F.col("right_id") >= 1_000_000)
            & (F.col("left_id") == F.col("right_id") - 1_000_000))
        .select("left_id", "right_id")
    )


@query(
    "dq4_ngram_contamination",
    oracle="""
    WITH train AS (
      SELECT doc_id, text FROM documents
      WHERE (doc_id * 2654435761) % 2147483648 % 100 < 90
    ), leaked AS (
      SELECT doc_id + 1000000 AS doc_id, text || ' tail' AS text
      FROM (SELECT doc_id, text FROM train ORDER BY doc_id LIMIT 10)
    ), evalset AS (
      SELECT doc_id, text FROM documents
      WHERE (doc_id * 2654435761) % 2147483648 % 100 >= 90
      UNION ALL SELECT doc_id, text FROM leaked
    ), lng AS (
      SELECT doc_id AS left_id,
             UNNEST(list_distinct(list_transform(
                 range(1, len(t) - 6),
                 i -> array_to_string(t[i : i + 7], ' ')))) AS ng
      FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS t
            FROM train)
      WHERE len(t) >= 8
    ), rng AS (
      SELECT doc_id AS right_id,
             UNNEST(list_distinct(list_transform(
                 range(1, len(t) - 6),
                 i -> array_to_string(t[i : i + 7], ' ')))) AS ng
      FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS t
            FROM evalset)
      WHERE len(t) >= 8
    ), keep AS (
      SELECT ng FROM (SELECT ng FROM lng UNION ALL SELECT ng FROM rng)
      GROUP BY ng HAVING COUNT(*) <= 100
    )
    SELECT l.left_id, r.right_id,
           CAST(COUNT(*) AS BIGINT) AS n_shared_ngrams
    FROM (SELECT * FROM lng WHERE ng IN (SELECT ng FROM keep)) l
    JOIN rng r ON l.ng = r.ng
    GROUP BY l.left_id, r.right_id
    """,
)
def dq4_ngram_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact n-gram eval-decontamination (8-gram verbatim overlap, the
    GPT-3-style exact complement to dq3's fuzzy MinHash check) — and
    unlike MinHash, fully SQL-expressible, so this one carries a hard
    value-hash oracle. Same fixture construction as dq3: documents
    hash-split 90/10 into pseudo train/eval, 10 train docs planted
    into eval with one appended token; every leaked pair must surface
    with a high shared-n-gram count."""
    from big_data_analytics_spark.operators.dedup import (
        exact_ngram_contamination,
    )
    from big_data_analytics_spark.queries.sampling import hash_bucket

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    b = hash_bucket(F.col("doc_id"))
    train, eval_set = d.filter(b < 90), d.filter(b >= 90)
    leaked = (train.orderBy("doc_id").limit(10)
              .select((F.col("doc_id") + 1_000_000).alias("doc_id"),
                      F.concat("text", F.lit(" tail")).alias("text")))
    return exact_ngram_contamination(
        train, eval_set.unionByName(leaked), n=8, max_doc_freq=100)


@query(
    "d6_decontaminate_train",
    oracle="""
    WITH train AS (
      SELECT doc_id, text FROM documents
      WHERE (doc_id * 2654435761) % 2147483648 % 100 < 90
    ), leaked AS (
      SELECT doc_id + 1000000 AS doc_id, text || ' tail' AS text
      FROM (SELECT doc_id, text FROM train ORDER BY doc_id LIMIT 10)
    ), evalset AS (
      SELECT doc_id, text FROM documents
      WHERE (doc_id * 2654435761) % 2147483648 % 100 >= 90
      UNION ALL SELECT doc_id, text FROM leaked
    ), lng AS (
      SELECT doc_id AS left_id,
             UNNEST(list_distinct(list_transform(
                 range(1, len(t) - 6),
                 i -> array_to_string(t[i : i + 7], ' ')))) AS ng
      FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS t
            FROM train)
      WHERE len(t) >= 8
    ), rng AS (
      SELECT doc_id AS right_id,
             UNNEST(list_distinct(list_transform(
                 range(1, len(t) - 6),
                 i -> array_to_string(t[i : i + 7], ' ')))) AS ng
      FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS t
            FROM evalset)
      WHERE len(t) >= 8
    ), keep AS (
      SELECT ng FROM (SELECT ng FROM lng UNION ALL SELECT ng FROM rng)
      GROUP BY ng HAVING COUNT(*) <= 100
    ), implicated AS (
      SELECT DISTINCT l.left_id
      FROM (SELECT * FROM lng WHERE ng IN (SELECT ng FROM keep)) l
      JOIN rng r ON l.ng = r.ng
    )
    SELECT (SELECT COUNT(*) FROM train) AS n_train,
           (SELECT COUNT(*) FROM implicated) AS n_removed,
           (SELECT COUNT(*) FROM train
            WHERE doc_id NOT IN (SELECT left_id FROM implicated))
               AS n_clean
    """,
)
def d6_decontaminate_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decontamination end-to-end: dq4 *detects* eval leakage; this
    query *removes* it — the implicated train docs anti-join out of
    the training corpus, and the counts certify before/removed/after.
    The anti-join is the removal primitive for every dedup family here
    (pairs → losers → left_anti); at 100 TB the implicated set is
    tiny, so the anti-join broadcasts."""
    from big_data_analytics_spark.operators.dedup import (
        exact_ngram_contamination,
    )
    from big_data_analytics_spark.queries.sampling import hash_bucket

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    b = hash_bucket(F.col("doc_id"))
    train, eval_set = d.filter(b < 90), d.filter(b >= 90)
    leaked = (train.orderBy("doc_id").limit(10)
              .select((F.col("doc_id") + 1_000_000).alias("doc_id"),
                      F.concat("text", F.lit(" tail")).alias("text")))
    pairs = exact_ngram_contamination(
        train, eval_set.unionByName(leaked), n=8, max_doc_freq=100)
    # ONE execution of the contamination join: the implicated set is
    # tiny, so checkpoint it before counting; implicated doc_ids are
    # distinct train keys, so n_clean = n_train - n_removed without a
    # third full-corpus anti-join scan. (The anti-join itself stays
    # the removal primitive for callers that want the cleaned rows —
    # this query certifies the counts.)
    implicated = (pairs.select(F.col("left_id").alias("doc_id"))
                  .distinct().localCheckpoint())
    n_train = train.count()
    n_removed = implicated.count()
    n_clean = n_train - n_removed
    return spark.createDataFrame(
        [(n_train, n_removed, n_clean)],
        "n_train long, n_removed long, n_clean long")


_BENF_Q = 1_000_000_000  # share quantization grid
# floor(Q * log10(1 + 1/d)) for d = 1..9, precomputed ONCE in Python
# and emitted as integer literals into BOTH engines' SQL — the
# Benford shares are compile-time constants, so neither engine's
# libm (JVM Math.log vs DuckDB's) is ever consulted at run time and
# a 1-ulp ln() divergence at a floor boundary can't flip the grid.
_BENF_TABLE = {
    1: 301029995, 2: 176091259, 3: 124938736, 4: 96910013,
    5: 79181246, 6: 66946789, 7: 57991946, 8: 51152522, 9: 45757490,
}
_BENF_CASE_SQL = ("CASE d " + " ".join(
    f"WHEN {d} THEN {v}" for d, v in _BENF_TABLE.items())
    + " ELSE 0 END")


@query(
    "dq5_benford_audit",
    oracle=f"""
    WITH cents AS (
        SELECT CAST(l_extendedprice * 100 AS BIGINT) AS c FROM lineitem
    ), digits AS (
        SELECT CAST(substr(CAST(c AS VARCHAR), 1, 1) AS BIGINT) AS d,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM cents GROUP BY 1
    ), tot AS (SELECT CAST(SUM(n) AS BIGINT) AS t FROM digits)
    SELECT d AS first_digit, n,
           CAST(FLOOR({_BENF_Q} * n / t) AS BIGINT) AS share_q,
           CAST({_BENF_CASE_SQL} AS BIGINT) AS benford_q,
           CAST(FLOOR({_BENF_Q} * n / t)
                - ({_BENF_CASE_SQL}) AS BIGINT) AS dev_q
    FROM digits, tot
    """,
)
def dq5_benford_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit audit over extended prices — the
    classic fraud / synthetic-data / unit-mixup detector the data-
    quality family (dq1–dq4) lacks: naturally occurring multi-scale
    amounts follow P(d) = log10(1 + 1/d), and a slice whose leading-
    digit distribution deviates hard was truncated, generated, or
    re-scaled. Emits per digit the observed count, the observed and
    Benford-expected shares floor-quantized to the 1e-9 grid, and the
    signed deviation. The digit is extracted from the integer-cents
    string (the money.py convention), so both engines see identical
    text — no float formatting anywhere, and the nine Benford shares
    are Python-precomputed integer literals (_BENF_TABLE) so neither
    engine evaluates ln() at run time.

    Scale shape: one map-side-combinable groupBy onto <= 9 rows; the
    expected-share column is a constant expression per digit. A
    single scan, constant exchange — runs at any corpus size for the
    cost of reading one column."""
    li = load_table(spark, sf_dir, "lineitem").select(
        (F.col("l_extendedprice") * 100).cast("long").alias("c"))
    digits = (li.select(F.substring(F.col("c").cast("string"), 1, 1)
                        .cast("long").alias("d"))
              .groupBy("d")
              .agg(F.count(F.lit(1)).cast("long").alias("n")))
    tot = digits.agg(F.sum("n").cast("long").alias("t"))
    benford = F.expr(_BENF_CASE_SQL).cast("long")
    share = F.floor(F.lit(_BENF_Q) * F.col("n") / F.col("t")).cast("long")
    return (digits.crossJoin(F.broadcast(tot))
            .select(F.col("d").alias("first_digit"), "n",
                    share.alias("share_q"),
                    benford.alias("benford_q"),
                    (share - benford).alias("dev_q")))
