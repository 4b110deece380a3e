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
