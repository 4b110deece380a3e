"""Text surface, wave 6: corpus distribution diagnostics — the Zipf
rank-frequency fit (t16).

A training-corpus health check LLM data teams actually run: natural
language follows Zipf's law (frequency ∝ rank^-s with s ≈ 1); heavily
templated, machine-generated, or boilerplate-polluted slices deviate
hard (flat head = deduplicated boilerplate, steep tail = token
explosion), so the per-language fitted exponent is a one-number drift
detector for corpus composition. Reference parity: none — the
reference repo has no corpus-statistics surface; this is LLM-pipeline
extension surface (SURVEY.md §2 text-analysis family).

Portability discipline: each (ln rank, ln freq) point is floor-
quantized to a 1e-6 grid at the element level (the ir3 s_q pattern —
one libm call per element, then pure integer sums, so aggregation
order can never move the hash); the OLS slope over the quantized
points is the closed-form Sxy/Sxx rational, evaluated as ONE
double division on two exact int64 sums in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from big_data_analytics_spark.catalog import load_table
from big_data_analytics_spark.operators.joins import sized_side
from big_data_analytics_spark.queries import query

_ZIPF_TOP = 64          # fit over the top-R tokens per language
_ZIPF_Q = 1_000_000.0   # element-level ln() quantization grid


@query(
    "t16_zipf_fit",
    oracle=f"""
    WITH toks AS (
        SELECT lang, u.tok
        FROM (SELECT lang, string_split(text, ' ') AS ts
              FROM documents) d, unnest(d.ts) AS u(tok)
    ), freq AS (
        SELECT lang, tok, CAST(COUNT(*) AS BIGINT) AS f
        FROM toks GROUP BY lang, tok
    ), ranked AS (
        SELECT lang, tok, f,
               ROW_NUMBER() OVER (PARTITION BY lang
                                  ORDER BY f DESC, tok) AS rk
        FROM freq
    ), pts AS (
        SELECT lang, f, rk,
               CAST(FLOOR(ln(CAST(rk AS DOUBLE)) * {_ZIPF_Q})
                    AS BIGINT) AS x,
               CAST(FLOOR(ln(CAST(f AS DOUBLE)) * {_ZIPF_Q})
                    AS BIGINT) AS y
        FROM ranked WHERE rk <= {_ZIPF_TOP}
    ), s AS (
        SELECT lang, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(x) AS BIGINT) AS sx,
               CAST(SUM(y) AS BIGINT) AS sy,
               CAST(SUM(x * x) AS BIGINT) AS sxx,
               CAST(SUM(x * y) AS BIGINT) AS sxy,
               CAST(MAX(CASE WHEN rk = 1 THEN f END) AS BIGINT)
                   AS top_freq
        FROM pts GROUP BY lang
    )
    SELECT lang, n AS n_terms, top_freq,
           CAST(CASE WHEN n * sxx - sx * sx = 0 THEN 0
                ELSE FLOOR({_ZIPF_Q}
                           * (CAST(n * sxy - sx * sy AS DOUBLE)
                              / CAST(n * sxx - sx * sx AS DOUBLE)))
                END AS BIGINT) AS slope_q
    FROM s
    """,
)
def t16_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language Zipf exponent: OLS slope of ln(freq) on ln(rank)
    over each language's top-{R} tokens (rank ties break on token
    text). slope_q is the slope on a 1e-6 grid — a healthy natural-
    language slice fits s ≈ -1e6; the consumer divides once. Also
    emits the fitted point count and the top token's frequency (the
    Zipf intercept anchor).

    Scale shape: one token explode with map-side combine on
    (lang, token) — the t7 vocabulary exchange; the per-language
    top-{R} cut is row_number + rk <= {R}, which Spark plans as
    WindowGroupLimit (each input partition keeps its local top-{R}
    BEFORE the exchange, so the per-language sort never sees more
    than |partitions| x {R} rows — the o2g shape). Everything after
    the cut is a fixed {R}-row-per-language relation: the ln
    quantization, the five integer sums, and the closed-form slope
    are constant work per language. At 100 TB the only data-sized
    stage is the vocabulary count itself."""
    docs = load_table(spark, sf_dir, "documents").select(
        "lang", F.explode(F.split(F.col("text"), " ")).alias("tok"))
    freq = (docs.groupBy("lang", "tok")
            .agg(F.count(F.lit(1)).cast("long").alias("f")))
    w = Window.partitionBy("lang").orderBy(F.desc("f"), F.asc("tok"))
    pts = (freq.withColumn("rk", F.row_number().over(w))
           .filter(F.col("rk") <= _ZIPF_TOP)
           .select("lang", "f", "rk",
                   F.floor(F.log(F.col("rk").cast("double")) * _ZIPF_Q)
                   .cast("long").alias("x"),
                   F.floor(F.log(F.col("f").cast("double")) * _ZIPF_Q)
                   .cast("long").alias("y")))
    s = (pts.groupBy("lang")
         .agg(F.count(F.lit(1)).cast("long").alias("n"),
              F.sum("x").cast("long").alias("sx"),
              F.sum("y").cast("long").alias("sy"),
              F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
              F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
              F.max(F.when(F.col("rk") == 1, F.col("f"))).cast("long")
              .alias("top_freq")))
    den = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    return s.select(
        "lang", F.col("n").alias("n_terms"), "top_freq",
        F.when(den == 0, F.lit(0).cast("long"))
        .otherwise(F.floor(F.lit(_ZIPF_Q)
                           * (num.cast("double") / den.cast("double")))
                   .cast("long")).alias("slope_q"))


t16_zipf_fit.__doc__ = t16_zipf_fit.__doc__.format(R=_ZIPF_TOP)


_KN_Q = 1_000_000_000  # probability quantization grid
_KN_D4 = 3             # discount d = _KN_D4 / 4 = 0.75 (Chen & Goodman)


@query(
    "t17_kneser_ney_bigram",
    oracle=f"""
    WITH d AS (
        SELECT string_split(text, ' ') AS ts FROM documents
    ), p AS (
        SELECT ts[u.i] AS w1, ts[u.i + 1] AS w2
        FROM d, unnest(range(1, len(ts))) AS u(i)
    ), big AS (
        SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c12
        FROM p GROUP BY w1, w2
    ), l AS (
        SELECT w1, CAST(SUM(c12) AS BIGINT) AS c1,
               CAST(COUNT(*) AS BIGINT) AS n_fw1
        FROM big GROUP BY w1
    ), r AS (
        SELECT w2, CAST(COUNT(*) AS BIGINT) AS n_pw2
        FROM big GROUP BY w2
    ), s AS (SELECT CAST(COUNT(*) AS HUGEINT) AS b FROM big)
    SELECT big.w1, big.w2, big.c12, l.c1, l.n_fw1, r.n_pw2,
           CAST((CAST({_KN_Q} AS HUGEINT)
                 * (GREATEST(4 * CAST(big.c12 AS HUGEINT) - {_KN_D4}, 0)
                    * s.b
                    + {_KN_D4} * CAST(l.n_fw1 AS HUGEINT) * r.n_pw2))
                // (4 * CAST(l.c1 AS HUGEINT) * s.b) AS BIGINT) AS pkn_q
    FROM big JOIN l USING (w1) JOIN r ON r.w2 = big.w2, s
    """,
)
def t17_kneser_ney_bigram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated Kneser–Ney bigram probabilities for every observed
    bigram in the corpus — the LM-quality upgrade over t15's add-k
    bigram model and the smoothing every serious n-gram pipeline
    (perplexity filtering, contamination scoring, data mixing by
    LM-fit) actually uses. Chen & Goodman's interpolated form with
    absolute discount d = 3/4:

        P_KN(w2 | w1) = max(c(w1 w2) - d, 0) / c(w1 ·)
                        + d * N1+(w1 ·) / c(w1 ·) * N1+(· w2) / B

    where c(w1 ·) = Σ_w2 c(w1 w2) (occurrences of w1 as a left
    context — doc-final tokens never open a bigram), N1+(w1 ·) /
    N1+(· w2) are distinct right/left continuation counts, and B is
    the total distinct-bigram count (so the continuation distribution
    Σ_w2 N1+(· w2)/B = 1). With d = 3/4 the whole probability is ONE
    exact rational: pkn = (max(4*c12 - 3, 0)*B + 3*N1+(w1 ·)*N1+(· w2))
    / (4*c(w1 ·)*B), floor-quantized to the 1e-9 grid in 128-bit
    integer arithmetic on BOTH engines (Spark DECIMAL(38,0) integral
    `div`, DuckDB HUGEINT `//`) — no IEEE division anywhere, so the
    hash gate is exact at any count magnitude (int64 would overflow
    Q*num past ~4e9 corpus bigrams; the audited ts7 lesson applied
    up front).

    Scale shape: the bigram relation is ev1's in-array transform +
    one explode with map-side combine on (w1, w2), localCheckpoint-
    materialized ONCE to serve all three aggregates, the B count, and
    the measured pin bounds (the t15/mb1 checkpoint-count pattern).
    The per-w1 and per-w2 attachments are vocabulary-proportional
    derived aggregates — exactly the class whose plan-time stats
    mis-broadcast at 10x (round-12 audit), so both ride sized_side
    with the measured B as the bound (|w1 rows| <= B by definition).
    At 100 TB: one token-proportional exchange to build counts, two
    vocab-keyed joins, nothing corpus-squared, no driver
    materialization beyond three scalar counts."""
    docs = load_table(spark, sf_dir, "documents").select(
        F.split(F.col("text"), " ").alias("ts"))
    pairs = (docs.filter(F.size("ts") >= 2)
             .select(F.explode(F.expr(
                 "transform(slice(ts, 1, size(ts) - 1), "
                 "(x, i) -> struct(x as w1, ts[i + 1] as w2))"))
                 .alias("p"))
             .select("p.w1", "p.w2"))
    big = (pairs.groupBy("w1", "w2")
           .agg(F.count(F.lit(1)).cast("long").alias("c12"))
           .localCheckpoint())
    n_types = big.count()  # materializes the checkpoint; exact B
    left = big.groupBy("w1").agg(
        F.sum("c12").cast("long").alias("c1"),
        F.count(F.lit(1)).cast("long").alias("n_fw1"))
    right = big.groupBy("w2").agg(
        F.count(F.lit(1)).cast("long").alias("n_pw2"))
    joined = (big
              .join(sized_side(left, n_types), "w1")
              .join(sized_side(right, n_types), "w2"))
    pkn = F.expr(
        f"cast((cast({_KN_Q} as decimal(38,0))"
        f" * (greatest(4 * cast(c12 as decimal(38,0)) - {_KN_D4}, 0)"
        f"    * cast({n_types} as decimal(38,0))"
        f"    + cast({_KN_D4} as decimal(38,0)) * n_fw1 * n_pw2))"
        f" div (cast(4 as decimal(38,0)) * c1"
        f"      * cast({n_types} as decimal(38,0))) as long)")
    return joined.select("w1", "w2", "c12", "c1", "n_fw1", "n_pw2",
                         pkn.alias("pkn_q"))
