"""Feature-engineering operators for training pipelines: smoothed /
leave-one-out target encoding and the feature-hashing trick. Both are
standard large-scale ML preprocessing steps (the reference's notebook
surface does categorical encoding by hand via pandas maps; these are
the distributed, leakage-aware equivalents).

Portability: target sums are exact integer cents; hash buckets come
from md5 hex (the d2b/d3b portable-hash technique), so every value is
engine-identical before the final rounded division.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from big_data_analytics_spark.catalog import load_table
from big_data_analytics_spark.queries import query

_TE_PRIOR = 10.0  # smoothing pseudo-count

_TE_ORACLE = f"""
    WITH r AS (
        SELECT o_orderpriority AS category,
               CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT) AS y
        FROM orders
    ), g AS (
        SELECT category, COUNT(*) AS n,
               CAST(SUM(y) AS BIGINT) AS s,
               MIN(y) AS y_min, MAX(y) AS y_max
        FROM r GROUP BY category
    ), tot AS (
        SELECT CAST(SUM(n) AS BIGINT) AS nt, CAST(SUM(s) AS BIGINT) AS st
        FROM g
    )
    SELECT category, n,
           ROUND((CAST(s AS DOUBLE)
                  + {_TE_PRIOR} * (CAST(st AS DOUBLE) / nt))
                 / (n + {_TE_PRIOR}) / 100.0, 6) AS smoothed_encoding,
           ROUND(CAST(s - y_min AS DOUBLE) / (n - 1) / 100.0, 6)
               AS loo_at_min,
           ROUND(CAST(s - y_max AS DOUBLE) / (n - 1) / 100.0, 6)
               AS loo_at_max
    FROM g, tot
    ORDER BY category
"""


@query("te1_target_encoding", oracle=_TE_ORACLE)
def te1_target_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Target encoding of order priority against order price with the two
    leakage defenses used in production feature pipelines: additive
    smoothing toward the global mean (pseudo-count {P}) and
    leave-one-out exclusion of the row's own target (shown at each
    category's extreme rows: encode(x_i) = (S_c - y_i)/(n_c - 1)).
    Sums are exact integer cents; the encodings are rounded dollar
    doubles.

    One mergeable groupBy(category) pass carries every statistic the
    encoder needs (n, sum, min, max); the global prior is a broadcast
    scalar. Applying the encoding to a 100 TB training set is then a
    broadcast map-only join of the |categories|-row code table — the
    fit NEVER rescans, and the LOO correction is per-row arithmetic
    against the same broadcast sums."""
    li = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("category"),
        F.floor(F.col("o_totalprice") * 100.0 + 0.5).cast("long")
        .alias("y"))
    g = li.groupBy("category").agg(
        F.count("*").alias("n"), F.sum("y").cast("long").alias("s"),
        F.min("y").alias("y_min"), F.max("y").alias("y_max"))
    tot = g.agg(F.sum("n").cast("long").alias("nt"),
                F.sum("s").cast("long").alias("st"))
    nd = F.col("n").cast("double")
    return (g.crossJoin(F.broadcast(tot))
            .select(
                "category", "n",
                F.round((F.col("s").cast("double")
                         + _TE_PRIOR * (F.col("st").cast("double")
                                        / F.col("nt").cast("double")))
                        / (nd + _TE_PRIOR) / 100.0, 6)
                .alias("smoothed_encoding"),
                F.round((F.col("s") - F.col("y_min")).cast("double")
                        / (nd - 1) / 100.0, 6).alias("loo_at_min"),
                F.round((F.col("s") - F.col("y_max")).cast("double")
                        / (nd - 1) / 100.0, 6).alias("loo_at_max"))
            .orderBy("category"))


te1_target_encoding.__doc__ = te1_target_encoding.__doc__.format(
    P=_TE_PRIOR)


_FH_BUCKETS = 32

_FH_ORACLE = f"""
    WITH toks AS (
        SELECT doc_id, UNNEST(string_split(text, ' ')) AS token
        FROM documents
    ), hashed AS (
        SELECT doc_id, token,
               ('0x' || substr(md5(token), 1, 8))::BIGINT AS h
        FROM toks
    )
    SELECT h % {_FH_BUCKETS} AS bucket,
           COUNT(*) AS n_tokens,
           CAST(SUM(CASE WHEN (h // {_FH_BUCKETS}) % 2 = 0
                         THEN 1 ELSE -1 END) AS BIGINT) AS signed_sum,
           COUNT(DISTINCT token) AS n_distinct_tokens
    FROM hashed
    GROUP BY bucket
    ORDER BY bucket
"""


@query("fh1_feature_hashing", oracle=_FH_ORACLE)
def fh1_feature_hashing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The hashing trick (Weinberger et al., public): project the
    unbounded token vocabulary into {B} fixed buckets with an
    md5-derived 32-bit hash; the sign bit (the hash bit above the
    bucket index) gives the unbiased signed variant. Emits the
    corpus-level hashed-feature summary per bucket: token
    occurrences, signed sum (what a hashed count-vectorizer would
    accumulate), and distinct source tokens (the collision load).

    This is how vocabulary-free vectorization survives 100 TB: no
    vocabulary build pass, no dictionary state, one mergeable
    {B}-group aggregate; per-document sparse vectors are a pure
    map-side expression over the same hash. md5 makes the bucket
    assignment engine-portable (the d2b technique), unlike
    xxhash64-based `F.hash`."""
    toks = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("token"))
    h = F.conv(F.substring(F.md5("token"), 1, 8), 16, 10).cast("long")
    hashed = toks.select("doc_id", "token", h.alias("h"))
    sign = F.when((F.col("h") / _FH_BUCKETS).cast("long") % 2 == 0, 1) \
        .otherwise(-1)
    return (hashed
            .groupBy((F.col("h") % _FH_BUCKETS).alias("bucket"))
            .agg(F.count("*").alias("n_tokens"),
                 F.sum(sign).cast("long").alias("signed_sum"),
                 F.countDistinct("token").alias("n_distinct_tokens"))
            .orderBy("bucket"))


fh1_feature_hashing.__doc__ = fh1_feature_hashing.__doc__.format(
    B=_FH_BUCKETS)


# --------------------------------------------------------------------
# ml14 — K-fold cross-validated ridge grid (M17/M18): one stats scan,
# train-on-complement via subtraction, exact quantized eval
# --------------------------------------------------------------------

_CV_FOLDS = 3
_CV_LAMBDAS = (0.0, 100.0, 10000.0)  # per-train-row ridge strengths


def _cv_fold_sql() -> str:
    return (f"('0x' || substr(md5(CAST(l_orderkey AS VARCHAR) || '-' "
            f"|| CAST(l_linenumber AS VARCHAR)), 1, 8))::BIGINT "
            f"% {_CV_FOLDS}")


def _cv_ridge_oracle() -> str:
    lam_rows = " UNION ALL ".join(
        f"SELECT {lam} AS lam" for lam in _CV_LAMBDAS)
    return f"""
    WITH r AS (
        SELECT {_cv_fold_sql()} AS fold,
               CAST(l_quantity AS BIGINT) AS x1,
               CAST(FLOOR(l_discount * 100.0 + 0.5) AS BIGINT) AS x2,
               CAST(FLOOR(l_extendedprice * 100.0 + 0.5) AS BIGINT) AS y
        FROM lineitem
    ), fs AS (
        SELECT fold, COUNT(*) AS n,
               CAST(SUM(x1) AS BIGINT) AS s1,
               CAST(SUM(x2) AS BIGINT) AS s2,
               CAST(SUM(y) AS BIGINT) AS sy,
               CAST(SUM(x1 * x1) AS BIGINT) AS q11,
               CAST(SUM(x2 * x2) AS BIGINT) AS q22,
               CAST(SUM(x1 * x2) AS BIGINT) AS q12,
               CAST(SUM(x1 * y) AS BIGINT) AS q1y,
               CAST(SUM(x2 * y) AS BIGINT) AS q2y
        FROM r GROUP BY fold
    ), tot AS (
        SELECT CAST(SUM(n) AS BIGINT) AS n, CAST(SUM(s1) AS BIGINT) AS s1,
               CAST(SUM(s2) AS BIGINT) AS s2, CAST(SUM(sy) AS BIGINT) AS sy,
               CAST(SUM(q11) AS BIGINT) AS q11,
               CAST(SUM(q22) AS BIGINT) AS q22,
               CAST(SUM(q12) AS BIGINT) AS q12,
               CAST(SUM(q1y) AS BIGINT) AS q1y,
               CAST(SUM(q2y) AS BIGINT) AS q2y
        FROM fs
    ), trains AS (
        SELECT fs.fold, lam.lam,
               tot.n - fs.n AS n, tot.s1 - fs.s1 AS s1,
               tot.s2 - fs.s2 AS s2, tot.sy - fs.sy AS sy,
               tot.q11 - fs.q11 AS q11, tot.q22 - fs.q22 AS q22,
               tot.q12 - fs.q12 AS q12, tot.q1y - fs.q1y AS q1y,
               tot.q2y - fs.q2y AS q2y
        FROM fs, tot, ({lam_rows}) lam
    ), betas AS (
        SELECT fold, lam, w1, w2,
               (CAST(sy AS DOUBLE) - w1 * s1 - w2 * s2)
                   / CAST(n AS DOUBLE) AS b0
        FROM (
            SELECT fold, lam, n, s1, s2, sy,
                   ((CAST(q1y AS DOUBLE) - CAST(s1 AS DOUBLE)
                     * CAST(sy AS DOUBLE) / n)
                    * (CAST(q22 AS DOUBLE) - CAST(s2 AS DOUBLE)
                       * CAST(s2 AS DOUBLE) / n + lam * n)
                    - (CAST(q12 AS DOUBLE) - CAST(s1 AS DOUBLE)
                       * CAST(s2 AS DOUBLE) / n)
                      * (CAST(q2y AS DOUBLE) - CAST(s2 AS DOUBLE)
                         * CAST(sy AS DOUBLE) / n))
                   / ((CAST(q11 AS DOUBLE) - CAST(s1 AS DOUBLE)
                       * CAST(s1 AS DOUBLE) / n + lam * n)
                      * (CAST(q22 AS DOUBLE) - CAST(s2 AS DOUBLE)
                         * CAST(s2 AS DOUBLE) / n + lam * n)
                      - (CAST(q12 AS DOUBLE) - CAST(s1 AS DOUBLE)
                         * CAST(s2 AS DOUBLE) / n)
                        * (CAST(q12 AS DOUBLE) - CAST(s1 AS DOUBLE)
                           * CAST(s2 AS DOUBLE) / n)) AS w1,
                   ((CAST(q11 AS DOUBLE) - CAST(s1 AS DOUBLE)
                     * CAST(s1 AS DOUBLE) / n + lam * n)
                    * (CAST(q2y AS DOUBLE) - CAST(s2 AS DOUBLE)
                       * CAST(sy AS DOUBLE) / n)
                    - (CAST(q12 AS DOUBLE) - CAST(s1 AS DOUBLE)
                       * CAST(s2 AS DOUBLE) / n)
                      * (CAST(q1y AS DOUBLE) - CAST(s1 AS DOUBLE)
                         * CAST(sy AS DOUBLE) / n))
                   / ((CAST(q11 AS DOUBLE) - CAST(s1 AS DOUBLE)
                       * CAST(s1 AS DOUBLE) / n + lam * n)
                      * (CAST(q22 AS DOUBLE) - CAST(s2 AS DOUBLE)
                         * CAST(s2 AS DOUBLE) / n + lam * n)
                      - (CAST(q12 AS DOUBLE) - CAST(s1 AS DOUBLE)
                         * CAST(s2 AS DOUBLE) / n)
                        * (CAST(q12 AS DOUBLE) - CAST(s1 AS DOUBLE)
                           * CAST(s2 AS DOUBLE) / n)) AS w2
            FROM trains)
    ), errs AS (
        SELECT b.lam,
               CAST(SUM(CAST(FLOOR(
                   ((r.y - (b.b0 + b.w1 * r.x1 + b.w2 * r.x2)) / 100.0)
                   * ((r.y - (b.b0 + b.w1 * r.x1 + b.w2 * r.x2)) / 100.0))
                   AS BIGINT)) AS BIGINT) AS sse_q,
               COUNT(*) AS n
        FROM r JOIN betas b ON r.fold = b.fold
        GROUP BY b.lam
    )
    SELECT lam AS lambda_per_row,
           ROUND(CAST(sse_q AS DOUBLE) / n, 4) AS cv_mse_dollars2,
           CASE WHEN sse_q = (SELECT MIN(sse_q) FROM errs)
                THEN 1 ELSE 0 END AS is_best
    FROM errs ORDER BY lam
"""


@query("ml14_cv_ridge", oracle=_cv_ridge_oracle())
def ml14_cv_ridge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """{K}-fold cross-validated ridge-regression grid search (SURVEY §2.9 M17;
    /root/reference/data_mining_Assignment1.ipynb cross_val_score —
    the distributed form of ml/trees.grid_search_cv):
    folds come from a portable md5 row hash, each fold's model trains
    on the complement BY SUBTRACTION (total sufficient statistics
    minus the fold's — one stats scan serves all {K} folds and all
    {L} lambda values; no per-fold rescans), and held-out squared
    errors are floor-quantized to dollars^2 and summed exactly, so
    the winning lambda is partitioning-independent.

    Two scans total at any scale: one mergeable {K}-group stats
    aggregate, one eval pass joining the broadcast ({K} x {L})-row
    beta table on fold id. This subtraction trick is why K-fold CV of
    a sufficient-statistics model costs O(2 scans), not O(K scans) —
    the 100 TB shape for model selection."""
    li = load_table(spark, sf_dir, "lineitem").select(
        (F.conv(F.substring(F.md5(F.concat_ws(
            "-", F.col("l_orderkey"), F.col("l_linenumber"))), 1, 8),
            16, 10).cast("long") % _CV_FOLDS).alias("fold"),
        F.col("l_quantity").cast("long").alias("x1"),
        F.floor(F.col("l_discount") * 100.0 + 0.5).cast("long")
        .alias("x2"),
        F.floor(F.col("l_extendedprice") * 100.0 + 0.5).cast("long")
        .alias("y"))
    x1, x2, y = F.col("x1"), F.col("x2"), F.col("y")
    fs = li.groupBy("fold").agg(
        F.count("*").alias("n"),
        F.sum(x1).alias("s1"), F.sum(x2).alias("s2"),
        F.sum(y).alias("sy"),
        F.sum(x1 * x1).alias("q11"), F.sum(x2 * x2).alias("q22"),
        F.sum(x1 * x2).alias("q12"),
        F.sum(x1 * y).alias("q1y"), F.sum(x2 * y).alias("q2y"))
    # K rows of 9 stats: checkpoint so the stats scan runs once, not
    # once per lineage branch (tot, trains, and the final join all
    # read fs)
    fs = fs.localCheckpoint()
    stat_cols = ["n", "s1", "s2", "sy", "q11", "q22", "q12", "q1y", "q2y"]
    tot = fs.agg(*[F.sum(c).cast("long").alias(c) for c in stat_cols])
    lams = li.sparkSession.createDataFrame(
        [(lam,) for lam in _CV_LAMBDAS], "lam double")
    trains = (fs.crossJoin(F.broadcast(tot.select(
        *[F.col(c).alias(f"t_{c}") for c in stat_cols])))
        .crossJoin(F.broadcast(lams))
        .select("fold", "lam",
                *[(F.col(f"t_{c}") - F.col(c)).alias(c)
                  for c in stat_cols]))
    nd = F.col("n").cast("double")
    a11 = (F.col("q11").cast("double")
           - F.col("s1").cast("double") * F.col("s1").cast("double") / nd
           + F.col("lam") * nd)
    a22 = (F.col("q22").cast("double")
           - F.col("s2").cast("double") * F.col("s2").cast("double") / nd
           + F.col("lam") * nd)
    a12 = (F.col("q12").cast("double")
           - F.col("s1").cast("double") * F.col("s2").cast("double") / nd)
    b1 = (F.col("q1y").cast("double")
          - F.col("s1").cast("double") * F.col("sy").cast("double") / nd)
    b2 = (F.col("q2y").cast("double")
          - F.col("s2").cast("double") * F.col("sy").cast("double") / nd)
    det = a11 * a22 - a12 * a12
    w1 = (b1 * a22 - a12 * b2) / det
    w2 = (a11 * b2 - a12 * b1) / det
    betas = trains.select(
        "fold", "lam", w1.alias("w1"), w2.alias("w2"),
        ((F.col("sy").cast("double") - w1 * F.col("s1")
          - w2 * F.col("s2")) / nd).alias("b0"))
    errd = (y - (F.col("b0") + F.col("w1") * x1 + F.col("w2") * x2)) \
        / 100.0
    errs = (li.join(F.broadcast(betas), "fold")
            .groupBy("lam")
            .agg(F.sum(F.floor(errd * errd).cast("long")).alias("sse_q"),
                 F.count("*").alias("n")))
    best = errs.agg(F.min("sse_q").alias("min_sse"))
    return (errs.crossJoin(F.broadcast(best))
            .select(F.col("lam").alias("lambda_per_row"),
                    F.round(F.col("sse_q").cast("double")
                            / F.col("n").cast("double"), 4)
                    .alias("cv_mse_dollars2"),
                    F.when(F.col("sse_q") == F.col("min_sse"), 1)
                    .otherwise(0).alias("is_best"))
            .orderBy("lambda_per_row"))


ml14_cv_ridge.__doc__ = ml14_cv_ridge.__doc__.format(
    K=_CV_FOLDS, L=len(_CV_LAMBDAS))


# --------------------------------------------------------------------
# ml15 — gradient-boosted stumps (M9): histogram split search per
# round, quantized residual carry
# --------------------------------------------------------------------

_GBT_ROUNDS = 2
_GBT_LR = 0.5
#: residual quantization: 1 unit = 0.01 cent = 1e-4 dollar
_GBT_RQ = 100.0


def _gbt_oracle() -> str:
    # round-1 residual = y cents scaled into rq units so both rounds
    # share the same histogram/gain/leaf machinery
    sql = f"""
    WITH rows_0 AS (
        SELECT CAST(l_quantity AS BIGINT) AS x1,
               CAST(FLOOR(l_discount * 100.0 + 0.5) AS BIGINT) AS x2,
               CAST(FLOOR(l_extendedprice * 100.0 + 0.5) AS BIGINT)
                   * CAST({int(_GBT_RQ)} AS BIGINT) AS rq
        FROM lineitem
    )"""
    for m in range(1, _GBT_ROUNDS + 1):
        prev = f"rows_{m - 1}"
        sql += f""",
    f{m} AS (
        SELECT 'quantity' AS feature, x1 AS val, rq FROM {prev}
        UNION ALL
        SELECT 'discount_cents', x2, rq FROM {prev}
    ), h{m} AS (
        SELECT feature, val, COUNT(*) AS n,
               CAST(SUM(rq) AS BIGINT) AS s
        FROM f{m} GROUP BY feature, val
    ), c{m} AS (
        SELECT feature, val,
               CAST(SUM(n) OVER w AS BIGINT) AS nl,
               CAST(SUM(s) OVER w AS BIGINT) AS sl,
               CAST(SUM(n) OVER (PARTITION BY feature) AS BIGINT) AS nt,
               CAST(SUM(s) OVER (PARTITION BY feature) AS BIGINT) AS st,
               MAX(val) OVER (PARTITION BY feature) AS vmax
        FROM h{m}
        WINDOW w AS (PARTITION BY feature ORDER BY val
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ), b{m} AS (
        SELECT feature, val AS thr, nl, nt - nl AS nr,
               CAST(sl AS DOUBLE) / nl AS vl,
               CAST(st - sl AS DOUBLE) / (nt - nl) AS vr
        FROM (
            SELECT *, ROW_NUMBER() OVER (ORDER BY
                       CAST(sl AS DOUBLE) * CAST(sl AS DOUBLE)
                           / CAST(nl AS DOUBLE)
                       + CAST(st - sl AS DOUBLE)
                         * CAST(st - sl AS DOUBLE)
                           / CAST(nt - nl AS DOUBLE) DESC,
                       feature, val) AS rn
            FROM c{m} WHERE val < vmax) WHERE rn = 1
    ), rows_{m} AS (
        SELECT r.x1, r.x2,
               CAST(FLOOR(CAST(r.rq AS DOUBLE)
                    - {_GBT_LR} * (CASE
                        WHEN b.feature = 'quantity' THEN
                            CASE WHEN r.x1 <= b.thr THEN b.vl
                                 ELSE b.vr END
                        ELSE
                            CASE WHEN r.x2 <= b.thr THEN b.vl
                                 ELSE b.vr END END)) AS BIGINT) AS rq
        FROM {prev} r, b{m} b
    )"""
    outs = " UNION ALL ".join(
        f"""SELECT {m} AS round, feature, thr AS threshold,
                   nl AS n_left, nr AS n_right,
                   ROUND(vl / {_GBT_RQ} / 100.0, 6) AS left_leaf_dollars,
                   ROUND(vr / {_GBT_RQ} / 100.0, 6) AS right_leaf_dollars
            FROM b{m}""" for m in range(1, _GBT_ROUNDS + 1))
    return sql + f" {outs} ORDER BY round"


@query("ml15_gbt_stumps", oracle=_gbt_oracle())
def ml15_gbt_stumps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """{R} rounds of gradient boosting with depth-1 regression trees
    on line price (SURVEY §2.9 M9,
    /root/reference/BasicsDecisionTree.ipynb
    GradientBoostingClassifier; the MLlib
    GBTRegressor inner loop made oracle-checkable): each round
    histograms the current residual per (feature, value), picks the
    variance-reduction-maximizing split (gain = S_L^2/n_L +
    S_R^2/n_R, exact-integer sums, deterministic (feature, value)
    tiebreak), and carries residual minus {LR} x leaf-mean forward
    floor-quantized to a 1e-4-dollar grid — so the entire boosting
    trajectory is identical under any partitioning.

    Per round: one scan (in-plan explode serves both features' <60-row
    histograms in a single mergeable agg), a window over the tiny
    histogram, and a single-row broadcast of the chosen split for the
    residual update — the same cost anatomy MLlib uses, where
    per-level histograms are THE reason distributed GBT scales. No
    row-level state persists between rounds except the quantized
    residual column, recomputed in-plan."""
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_quantity").cast("long").alias("x1"),
        F.floor(F.col("l_discount") * 100.0 + 0.5).cast("long")
        .alias("x2"),
        (F.floor(F.col("l_extendedprice") * 100.0 + 0.5).cast("long")
         * int(_GBT_RQ)).alias("rq"))
    rows = li
    out_rounds = []
    for m in range(1, _GBT_ROUNDS + 1):
        f = rows.select(F.explode(F.array(
            F.struct(F.lit("quantity").alias("feature"),
                     F.col("x1").alias("val")),
            F.struct(F.lit("discount_cents").alias("feature"),
                     F.col("x2").alias("val")),
        )).alias("fv"), "rq").select("fv.feature", "fv.val", "rq")
        h = f.groupBy("feature", "val").agg(
            F.count("*").alias("n"), F.sum("rq").cast("long").alias("s"))
        wcum = (Window.partitionBy("feature").orderBy("val")
                .rowsBetween(Window.unboundedPreceding, Window.currentRow))
        wtot = Window.partitionBy("feature")
        c = h.select(
            "feature", "val",
            F.sum("n").over(wcum).cast("long").alias("nl"),
            F.sum("s").over(wcum).cast("long").alias("sl"),
            F.sum("n").over(wtot).cast("long").alias("nt"),
            F.sum("s").over(wtot).cast("long").alias("st"),
            F.max("val").over(wtot).alias("vmax"))
        nld = F.col("nl").cast("double")
        nrd = (F.col("nt") - F.col("nl")).cast("double")
        sld = F.col("sl").cast("double")
        srd = (F.col("st") - F.col("sl")).cast("double")
        gain = sld * sld / nld + srd * srd / nrd
        wb = Window.orderBy(F.desc("gain"), F.asc("feature"),
                            F.asc("thr"))
        b = (c.filter(F.col("val") < F.col("vmax"))
             .select("feature", F.col("val").alias("thr"),
                     F.col("nl"), (F.col("nt") - F.col("nl")).alias("nr"),
                     (sld / nld).alias("vl"), (srd / nrd).alias("vr"),
                     gain.alias("gain"))
             .withColumn("rn", F.row_number().over(wb))
             .filter(F.col("rn") == 1)
             .drop("rn", "gain"))
        out_rounds.append(b.select(
            F.lit(m).alias("round"), "feature",
            F.col("thr").alias("threshold"),
            F.col("nl").alias("n_left"), F.col("nr").alias("n_right"),
            F.round(F.col("vl") / _GBT_RQ / 100.0, 6)
            .alias("left_leaf_dollars"),
            F.round(F.col("vr") / _GBT_RQ / 100.0, 6)
            .alias("right_leaf_dollars")))
        pred = F.when(
            F.col("feature") == "quantity",
            F.when(F.col("x1") <= F.col("thr"), F.col("vl"))
            .otherwise(F.col("vr"))
        ).otherwise(
            F.when(F.col("x2") <= F.col("thr"), F.col("vl"))
            .otherwise(F.col("vr")))
        rows = (rows.crossJoin(F.broadcast(b))
                .select("x1", "x2",
                        F.floor(F.col("rq").cast("double")
                                - _GBT_LR * pred).cast("long")
                        .alias("rq")))
    out = out_rounds[0]
    for b in out_rounds[1:]:
        out = out.unionByName(b)
    return out.orderBy("round")


ml15_gbt_stumps.__doc__ = ml15_gbt_stumps.__doc__.format(
    R=_GBT_ROUNDS, LR=_GBT_LR)


# --------------------------------------------------------------------
# ml17 — Poisson bootstrap standard error (M18): deterministic
# resampling via md5-derived multiplicities
# --------------------------------------------------------------------

_BOOT_B = 20

def _poisson1_cdf() -> list[float]:
    """Cumulative Poisson(1) probabilities F(0..6); multiplicities are
    capped at 7 (tail mass < 1e-7). Computed once here and embedded
    as identical literals in both engines."""
    import math
    e = math.exp(-1.0)
    out, term, acc = [], e, 0.0
    for k in range(7):
        acc += term
        out.append(acc)
        term /= (k + 1)
    return out


_BOOT_CDF = _poisson1_cdf()


def _boot_count_sql(u: str) -> str:
    branches = " ".join(
        f"WHEN {u} < {c!r} THEN {k}" for k, c in enumerate(_BOOT_CDF))
    return f"CASE {branches} ELSE 7 END"


_BOOT_ORACLE = f"""
    WITH r AS (
        SELECT l_orderkey, l_linenumber,
               CAST(l_quantity AS BIGINT) AS y
        FROM lineitem
    ), e AS (
        SELECT y, b,
               CAST(('0x' || substr(md5(CAST(l_orderkey AS VARCHAR)
                   || '-' || CAST(l_linenumber AS VARCHAR)
                   || '-' || CAST(b AS VARCHAR)), 1, 8))::BIGINT
                   AS DOUBLE) / 4294967296.0 AS u
        FROM r, unnest(generate_series(0, {_BOOT_B - 1})) AS t(b)
    ), c AS (
        SELECT b, y, {_boot_count_sql('u')} AS c FROM e
    ), rep AS (
        SELECT b, CAST(SUM(c) AS BIGINT) AS cnt,
               CAST(SUM(c * y) AS BIGINT) AS s
        FROM c GROUP BY b
    ), mns AS (
        SELECT b, CAST(s AS DOUBLE) / cnt AS m FROM rep
    ), agg AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS bb,
               SUM(m) AS sm, SUM(m * m) AS sq
        FROM mns
    )
    SELECT bb AS n_replicates,
           ROUND(sm / bb, 6) AS boot_mean,
           ROUND(sqrt((sq - sm * sm / bb) / (bb - 1)), 6) AS boot_se
    FROM agg
"""


@query("ml17_poisson_bootstrap", oracle=_BOOT_ORACLE)
def ml17_poisson_bootstrap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson bootstrap of the mean quantity (SURVEY §2.9 M18;
    the deterministic distributed form of ml/regression.bootstrap_se):
    replicate b resamples each row with multiplicity ~ Poisson(1),
    realized by inverting the Poisson CDF at an md5-derived uniform —
    so the entire resampling plan is a pure expression, reproducible
    across engines and partitionings, with no RNG state. {B}
    replicate (count, weighted-sum) pairs are exact integers; the
    replicate-mean spread gives the bootstrap SE.

    This is THE bootstrap that scales: classical resampling needs n
    draws per replicate coordinated globally, while the Poisson
    approximation makes each row's multiplicity independent — one
    map-side expression, one {B}-group mergeable aggregate, zero
    shuffled rows beyond {B} partial sums per task. (Chamandy et al.,
    "Estimating Uncertainty for Massive Data Streams", public.)"""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber",
        F.col("l_quantity").cast("long").alias("y"))
    # the 20x replicate explode amplifies whatever input parallelism
    # the scan has; a single small parquet file would serialize 12M+
    # hash evaluations onto one task — spread the source first (at
    # cluster scale the scan is already wide and this is a no-op
    # round-robin of the narrow 3-column relation)
    li = li.repartition(spark.sparkContext.defaultParallelism)
    e = li.select(
        "y", F.explode(F.sequence(F.lit(0), F.lit(_BOOT_B - 1)))
        .alias("b"),
        "l_orderkey", "l_linenumber")
    u = (F.conv(F.substring(F.md5(F.concat_ws(
        "-", F.col("l_orderkey"), F.col("l_linenumber"), F.col("b"))),
        1, 8), 16, 10).cast("long").cast("double") / 4294967296.0)
    cnt = F.lit(7)
    for k, c in reversed(list(enumerate(_BOOT_CDF))):
        cnt = F.when(u < F.lit(c), k).otherwise(cnt)
    rep = (e.select("b", "y", cnt.alias("c"))
           .groupBy("b")
           .agg(F.sum("c").cast("long").alias("cnt"),
                F.sum(F.col("c") * F.col("y")).cast("long").alias("s")))
    mns = rep.select("b", (F.col("s").cast("double")
                           / F.col("cnt")).alias("m"))
    agg = mns.agg(F.count("*").cast("long").alias("bb"),
                  F.sum("m").alias("sm"),
                  F.sum(F.col("m") * F.col("m")).alias("sq"))
    bbd = F.col("bb").cast("double")
    return agg.select(
        F.col("bb").alias("n_replicates"),
        F.round(F.col("sm") / bbd, 6).alias("boot_mean"),
        F.round(F.sqrt((F.col("sq") - F.col("sm") * F.col("sm") / bbd)
                       / (bbd - 1)), 6).alias("boot_se"))


ml17_poisson_bootstrap.__doc__ = ml17_poisson_bootstrap.__doc__.format(
    B=_BOOT_B)


# --------------------------------------------------------------------
# ml18 — split-conformal prediction interval (M1/M21 extension):
# exact distributed order statistic via two-phase bucket quantile
# --------------------------------------------------------------------

_CONF_LEVEL = 0.9
_CONF_BUCKET = 10_000  # cents per quantile bucket ($100)


def _conformal_oracle() -> str:
    return f"""
    WITH r AS (
        SELECT ('0x' || substr(md5(CAST(l_orderkey AS VARCHAR) || '-'
                   || CAST(l_linenumber AS VARCHAR)), 1, 8))::BIGINT
                   % 10 AS fold,
               CAST(l_quantity AS BIGINT) AS x1,
               CAST(FLOOR(l_discount * 100.0 + 0.5) AS BIGINT) AS x2,
               CAST(FLOOR(l_extendedprice * 100.0 + 0.5) AS BIGINT) AS y
        FROM lineitem
    ), s AS (
        SELECT COUNT(*) AS n,
               CAST(SUM(x1) AS BIGINT) AS s1,
               CAST(SUM(x2) AS BIGINT) AS s2,
               CAST(SUM(y) AS BIGINT) AS sy,
               CAST(SUM(x1 * x1) AS BIGINT) AS q11,
               CAST(SUM(x2 * x2) AS BIGINT) AS q22,
               CAST(SUM(x1 * x2) AS BIGINT) AS q12,
               CAST(SUM(x1 * y) AS BIGINT) AS q1y,
               CAST(SUM(x2 * y) AS BIGINT) AS q2y
        FROM r WHERE fold <= 7
    ), beta AS (
        SELECT w1, w2,
               (CAST(sy AS DOUBLE) - w1 * s1 - w2 * s2)
                   / CAST(n AS DOUBLE) AS b0
        FROM (
            SELECT n, s1, s2, sy,
                   (b1 * a22 - a12 * b2) / (a11 * a22 - a12 * a12) AS w1,
                   (a11 * b2 - a12 * b1) / (a11 * a22 - a12 * a12) AS w2
            FROM (
                SELECT n, s1, s2, sy,
                       CAST(q11 AS DOUBLE) - CAST(s1 AS DOUBLE)
                           * CAST(s1 AS DOUBLE) / n AS a11,
                       CAST(q22 AS DOUBLE) - CAST(s2 AS DOUBLE)
                           * CAST(s2 AS DOUBLE) / n AS a22,
                       CAST(q12 AS DOUBLE) - CAST(s1 AS DOUBLE)
                           * CAST(s2 AS DOUBLE) / n AS a12,
                       CAST(q1y AS DOUBLE) - CAST(s1 AS DOUBLE)
                           * CAST(sy AS DOUBLE) / n AS b1,
                       CAST(q2y AS DOUBLE) - CAST(s2 AS DOUBLE)
                           * CAST(sy AS DOUBLE) / n AS b2
                FROM s))
    ), scored AS (
        SELECT r.fold,
               CAST(FLOOR(ABS(CAST(r.y AS DOUBLE)
                   - (beta.b0 + beta.w1 * r.x1 + beta.w2 * r.x2)))
                   AS BIGINT) AS rq
        FROM r, beta WHERE r.fold >= 8
    ), counts AS (
        SELECT CAST(COUNT(*) FILTER (fold = 8) AS BIGINT) AS ncal,
               CAST(COUNT(*) FILTER (fold = 9) AS BIGINT) AS ntest
        FROM scored
    ), k AS (
        SELECT CAST(CEIL({_CONF_LEVEL} * (ncal + 1)) AS BIGINT) AS k
        FROM counts
    ), bh AS (
        SELECT rq // {_CONF_BUCKET} AS bucket, COUNT(*) AS cnt
        FROM scored WHERE fold = 8 GROUP BY bucket
    ), bc AS (
        SELECT bucket,
               CAST(SUM(cnt) OVER (ORDER BY bucket
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS cend,
               CAST(COALESCE(SUM(cnt) OVER (ORDER BY bucket
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                   0) AS BIGINT) AS cstart
        FROM bh
    ), tb AS (
        SELECT bc.bucket, bc.cstart FROM bc, k
        WHERE bc.cstart < k.k AND k.k <= bc.cend
    ), q AS (
        SELECT rq AS q_cents FROM (
            SELECT s2.rq, ROW_NUMBER() OVER (ORDER BY s2.rq) AS rn,
                   k.k - tb.cstart AS off
            FROM scored s2, tb, k
            WHERE s2.fold = 8 AND s2.rq // {_CONF_BUCKET} = tb.bucket)
        WHERE rn = off
    )
    SELECT (SELECT n FROM s) AS n_train, counts.ncal AS n_cal,
           counts.ntest AS n_test,
           ROUND(CAST(q.q_cents AS DOUBLE) / 100.0, 2)
               AS interval_halfwidth_dollars,
           CAST((SELECT COUNT(*) FROM scored, q
                 WHERE fold = 9 AND rq <= q.q_cents) AS BIGINT)
               AS n_covered,
           ROUND(CAST((SELECT COUNT(*) FROM scored, q
                       WHERE fold = 9 AND rq <= q.q_cents) AS DOUBLE)
                 / counts.ntest, 6) AS coverage_rate
    FROM counts, q
"""


@query("ml18_conformal_interval", oracle=_conformal_oracle())
def ml18_conformal_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-conformal prediction interval (Vovk et al., public;
    extends SURVEY §2.9 M1/M21's parametric intervals with the
    distribution-free guarantee): md5-hash folds split the data
    80/10/10 into train/calibration/test, an exact-stats OLS fits on
    train, and the interval half-width is the ceil({L}*(n+1))-th
    smallest calibration |residual| — so P(test point covered) >=
    {L} with NO distributional assumptions. Coverage is then
    certified on the held-out test fold with exact counts.

    The scale move is the exact ORDER STATISTIC without a global
    sort: quantize residuals to cents, histogram $100 buckets
    (mergeable agg), locate the k-th value's bucket via a cumsum
    over the tiny bucket relation, then rank ONLY inside that one
    bucket — the classic two-phase distributed quantile (same
    family as t9/w12's stitched cumsums). Every count is exact, the
    residual grid is part of the semantics, and the chosen order
    statistic is engine-identical."""
    li = load_table(spark, sf_dir, "lineitem").select(
        (F.conv(F.substring(F.md5(F.concat_ws(
            "-", F.col("l_orderkey"), F.col("l_linenumber"))), 1, 8),
            16, 10).cast("long") % 10).alias("fold"),
        F.col("l_quantity").cast("long").alias("x1"),
        F.floor(F.col("l_discount") * 100.0 + 0.5).cast("long")
        .alias("x2"),
        F.floor(F.col("l_extendedprice") * 100.0 + 0.5).cast("long")
        .alias("y"))
    x1, x2, y = F.col("x1"), F.col("x2"), F.col("y")
    tr = li.filter(F.col("fold") <= 7)
    s = tr.agg(
        F.count("*").alias("n"),
        F.sum(x1).alias("s1"), F.sum(x2).alias("s2"),
        F.sum(y).alias("sy"),
        F.sum(x1 * x1).alias("q11"), F.sum(x2 * x2).alias("q22"),
        F.sum(x1 * x2).alias("q12"),
        F.sum(x1 * y).alias("q1y"), F.sum(x2 * y).alias("q2y"))
    nd = F.col("n").cast("double")
    a11 = F.col("q11").cast("double") \
        - F.col("s1").cast("double") * F.col("s1").cast("double") / nd
    a22 = F.col("q22").cast("double") \
        - F.col("s2").cast("double") * F.col("s2").cast("double") / nd
    a12 = F.col("q12").cast("double") \
        - F.col("s1").cast("double") * F.col("s2").cast("double") / nd
    b1 = F.col("q1y").cast("double") \
        - F.col("s1").cast("double") * F.col("sy").cast("double") / nd
    b2 = F.col("q2y").cast("double") \
        - F.col("s2").cast("double") * F.col("sy").cast("double") / nd
    det = a11 * a22 - a12 * a12
    w1 = (b1 * a22 - a12 * b2) / det
    w2 = (a11 * b2 - a12 * b1) / det
    beta = s.select(
        F.col("n").alias("n_train"), w1.alias("w1"), w2.alias("w2"),
        ((F.col("sy").cast("double") - w1 * F.col("s1")
          - w2 * F.col("s2")) / nd).alias("b0"))
    scored = (li.filter(F.col("fold") >= 8)
              .crossJoin(F.broadcast(beta))
              .select("fold", "n_train",
                      F.floor(F.abs(
                          y.cast("double")
                          - (F.col("b0") + F.col("w1") * x1
                             + F.col("w2") * x2))).cast("long")
                      .alias("rq"))
              .localCheckpoint())
    counts = scored.agg(
        F.max("n_train").alias("n_train"),
        F.sum(F.when(F.col("fold") == 8, 1).otherwise(0)).cast("long")
        .alias("ncal"),
        F.sum(F.when(F.col("fold") == 9, 1).otherwise(0)).cast("long")
        .alias("ntest"))
    k = counts.select(
        "n_train", "ncal", "ntest",
        F.ceil(_CONF_LEVEL * (F.col("ncal") + 1)).cast("long")
        .alias("k"))
    cal = scored.filter(F.col("fold") == 8)
    bh = (cal.groupBy((F.col("rq") / _CONF_BUCKET).cast("long")
                      .alias("bucket"))
          .agg(F.count("*").alias("cnt")))
    wb = Window.orderBy("bucket")
    bc = bh.select(
        "bucket",
        F.sum("cnt").over(wb.rowsBetween(
            Window.unboundedPreceding, Window.currentRow))
        .cast("long").alias("cend"),
        F.coalesce(F.sum("cnt").over(wb.rowsBetween(
            Window.unboundedPreceding, -1)), F.lit(0))
        .cast("long").alias("cstart"))
    tb = (bc.crossJoin(F.broadcast(k))
          .filter((F.col("cstart") < F.col("k"))
                  & (F.col("k") <= F.col("cend")))
          .select("bucket", "cstart", "k", "n_train", "ncal", "ntest"))
    q = (cal.select("rq").join(F.broadcast(tb),
                  (F.col("rq") / _CONF_BUCKET).cast("long")
                  == F.col("bucket"))
         .withColumn("rn", F.row_number().over(
             Window.partitionBy("bucket").orderBy("rq")))
         .filter(F.col("rn") == F.col("k") - F.col("cstart"))
         .select(F.col("rq").alias("q_cents"),
                 F.col("n_train").alias("n_train"),
                 "ncal", "ntest"))
    cov = (scored.filter(F.col("fold") == 9)
           .crossJoin(F.broadcast(q.select("q_cents")))
           .agg(F.sum(F.when(F.col("rq") <= F.col("q_cents"), 1)
                      .otherwise(0)).cast("long").alias("n_covered")))
    return (q.crossJoin(F.broadcast(cov))
            .select(F.col("n_train"), F.col("ncal").alias("n_cal"),
                    F.col("ntest").alias("n_test"),
                    F.round(F.col("q_cents").cast("double") / 100.0, 2)
                    .alias("interval_halfwidth_dollars"),
                    "n_covered",
                    F.round(F.col("n_covered").cast("double")
                            / F.col("ntest").cast("double"), 6)
                    .alias("coverage_rate")))


ml18_conformal_interval.__doc__ = ml18_conformal_interval.__doc__.format(
    L=_CONF_LEVEL)


# --------------------------------------------------------------------
# fs1 — mutual-information feature scoring (feature selection)
# --------------------------------------------------------------------

_MI_Q = 1e12  # per-cell term quantization grid (nats * 1e12)


def _mi_oracle() -> str:
    return f"""
    WITH r AS (
        SELECT CAST(l_quantity AS BIGINT) // 10 AS a, l_returnflag AS b
        FROM lineitem
    ), cells AS (
        SELECT a, b, CAST(COUNT(*) AS BIGINT) AS nab FROM r GROUP BY a, b
    ), ma AS (
        SELECT a, CAST(SUM(nab) AS BIGINT) AS na FROM cells GROUP BY a
    ), mb AS (
        SELECT b, CAST(SUM(nab) AS BIGINT) AS nb FROM cells GROUP BY b
    ), n AS (SELECT CAST(SUM(nab) AS BIGINT) AS nt FROM cells),
    mi AS (
        SELECT CAST(SUM(CAST(FLOOR(
                   (CAST(nab AS DOUBLE) / nt)
                   * ln(CAST(nab AS DOUBLE) * nt
                        / (CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)))
                   * {_MI_Q}) AS BIGINT)) AS BIGINT) AS mi_q
        FROM cells JOIN ma USING (a) JOIN mb USING (b), n
    ), ha AS (
        SELECT CAST(SUM(CAST(FLOOR(
                   -(CAST(na AS DOUBLE) / nt)
                   * ln(CAST(na AS DOUBLE) / nt) * {_MI_Q})
                   AS BIGINT)) AS BIGINT) AS ha_q
        FROM ma, n
    ), hb AS (
        SELECT CAST(SUM(CAST(FLOOR(
                   -(CAST(nb AS DOUBLE) / nt)
                   * ln(CAST(nb AS DOUBLE) / nt) * {_MI_Q})
                   AS BIGINT)) AS BIGINT) AS hb_q
        FROM mb, n
    )
    SELECT (SELECT nt FROM n) AS n_rows,
           ROUND(CAST(mi_q AS DOUBLE) / {_MI_Q}, 6) AS mi_nats,
           ROUND(CAST(ha_q AS DOUBLE) / {_MI_Q}, 6) AS h_feature,
           ROUND(CAST(hb_q AS DOUBLE) / {_MI_Q}, 6) AS h_target,
           ROUND(CAST(mi_q AS DOUBLE)
                 / CAST(LEAST(ha_q, hb_q) AS DOUBLE), 6)
               AS normalized_mi
    FROM mi, ha, hb
"""


@query("fs1_mutual_information", oracle=_mi_oracle())
def fs1_mutual_information(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual information between the bucketed quantity feature and
    the return flag — the model-free feature-selection score (what
    sklearn's mutual_info_classif estimates; here the discrete MI is
    EXACT). All cell/marginal counts are exact integers; each cell's
    p*ln(...) term is floor-quantized to a 1e-12 grid and summed
    exactly (the ml9 discipline — a float sum over cells would be
    grouping-order-dependent), as are the marginal entropies that
    normalize it.

    One groupBy(cell) mergeable aggregate — |buckets| x |classes|
    groups — then arithmetic over the tiny cell relation with
    broadcast marginals. Scoring p features against a target at
    100 TB is p such histograms from ONE scan (explode the feature
    axis like ml8 does); no per-feature rescans, no model fits."""
    li = load_table(spark, sf_dir, "lineitem").select(
        (F.col("l_quantity").cast("long") / 10).cast("long").alias("a"),
        F.col("l_returnflag").alias("b"))
    cells = li.groupBy("a", "b").agg(F.count("*").cast("long")
                                     .alias("nab"))
    ma = cells.groupBy("a").agg(F.sum("nab").cast("long").alias("na"))
    mb = cells.groupBy("b").agg(F.sum("nab").cast("long").alias("nb"))
    n = cells.agg(F.sum("nab").cast("long").alias("nt"))
    ntd = F.col("nt").cast("double")
    joined = (cells.join(F.broadcast(ma), "a")
              .join(F.broadcast(mb), "b")
              .crossJoin(F.broadcast(n)))
    mi_term = ((F.col("nab").cast("double") / ntd)
               * F.log(F.col("nab").cast("double") * F.col("nt")
                       / (F.col("na").cast("double")
                          * F.col("nb").cast("double"))))
    mi = joined.agg(F.sum(F.floor(mi_term * _MI_Q).cast("long"))
                    .cast("long").alias("mi_q"))
    ha = (ma.crossJoin(F.broadcast(n))
          .agg(F.sum(F.floor(
              -(F.col("na").cast("double") / ntd)
              * F.log(F.col("na").cast("double") / ntd) * _MI_Q)
              .cast("long")).cast("long").alias("ha_q")))
    hb = (mb.crossJoin(F.broadcast(n))
          .agg(F.sum(F.floor(
              -(F.col("nb").cast("double") / ntd)
              * F.log(F.col("nb").cast("double") / ntd) * _MI_Q)
              .cast("long")).cast("long").alias("hb_q")))
    return (n.crossJoin(F.broadcast(mi)).crossJoin(F.broadcast(ha))
            .crossJoin(F.broadcast(hb))
            .select(
                F.col("nt").alias("n_rows"),
                F.round(F.col("mi_q").cast("double") / _MI_Q, 6)
                .alias("mi_nats"),
                F.round(F.col("ha_q").cast("double") / _MI_Q, 6)
                .alias("h_feature"),
                F.round(F.col("hb_q").cast("double") / _MI_Q, 6)
                .alias("h_target"),
                F.round(F.col("mi_q").cast("double")
                        / F.least(F.col("ha_q"), F.col("hb_q"))
                        .cast("double"), 6)
                .alias("normalized_mi")))
