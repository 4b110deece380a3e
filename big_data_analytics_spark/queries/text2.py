"""Text pipeline, wave 2: document chunking and vocabulary building —
the two remaining prep steps between a cleaned corpus and a tokenizer
at 100 TB. Both are narrow maps + one aggregation; no UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from big_data_analytics_spark.catalog import load_table
from big_data_analytics_spark.operators.joins import sized_side
from big_data_analytics_spark.queries import query

CHUNK = 32
STRIDE = 24  # 8-token overlap between consecutive chunks
SEQ_LEN = 512  # training-sequence token budget for t9
PACK_BUCKET = 1024  # docs per offset bucket in the two-level cumsum


@query(
    "t6_chunk_documents",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ), starts AS (
        SELECT doc_id, t, UNNEST(range(1, len(t) + 1, {STRIDE})) AS s
        FROM toks
    )
    SELECT doc_id,
           CAST((s - 1) / {STRIDE} AS BIGINT) AS chunk_id,
           array_to_string(t[s : s + {CHUNK - 1}], ' ') AS chunk_text,
           len(t[s : s + {CHUNK - 1}]) AS n_tokens
    FROM starts
    """,
)
def t6_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping token-window chunks ({CHUNK} tokens, stride
    {STRIDE}): sequence → explode → slice, all JVM expressions. The
    final partial chunk is kept (a tokenizer pads it); chunk_id is
    derivable from offset so re-chunking is idempotent."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    return (
        d.select(
            "doc_id", toks.alias("t"),
            F.explode(F.sequence(F.lit(1), F.size(toks), F.lit(STRIDE)))
            .alias("s"),
        )
        .select(
            "doc_id",
            (((F.col("s") - 1) / STRIDE).cast("long")).alias("chunk_id"),
            F.concat_ws(" ", F.slice("t", F.col("s"), CHUNK))
            .alias("chunk_text"),
            F.size(F.slice("t", F.col("s"), CHUNK)).cast("long")
            .alias("n_tokens"),
        )
    )


@query(
    "t7_vocabulary",
    oracle="""
    SELECT token,
           COUNT(*) AS tf,
           COUNT(DISTINCT doc_id) AS df
    FROM (
        SELECT doc_id, UNNEST(string_split(text, ' ')) AS token
        FROM documents
    )
    GROUP BY token
    HAVING COUNT(*) >= 5
    """,
)
def t7_vocabulary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary with term and document frequencies, min-count
    5 — the tokenizer-training input. One explode + one aggregation;
    at 100 TB the explode stays narrow and the agg partial-combines
    map-side, so the shuffle carries (token, partial counts), not
    token instances."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select("doc_id", F.explode(F.split(F.col("text"), " ")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("tf"),
             F.countDistinct("doc_id").alias("df"))
        .filter(F.col("tf") >= 5)
    )


@query(
    "t8_repetition_signals",
    oracle="""
    WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ), base AS (
        SELECT doc_id,
               CAST(len(t) AS BIGINT) AS n_tokens,
               1.0 - len(list_distinct(t)) / len(t) AS dup_word_frac
        FROM toks
    ), bi AS (
        SELECT doc_id,
               UNNEST(list_transform(range(1, len(t)),
                                     i -> t[i] || ' ' || t[i+1])) AS bigram
        FROM toks WHERE len(t) >= 2
    ), bc AS (
        SELECT doc_id, bigram, COUNT(*) AS c FROM bi GROUP BY 1, 2
    ), top AS (
        SELECT doc_id, CAST(MAX(c) AS BIGINT) AS top_bigram_count
        FROM bc GROUP BY 1
    ), joined AS (
        SELECT b.doc_id, b.n_tokens, b.dup_word_frac,
               COALESCE(top.top_bigram_count, 0) AS top_bigram_count,
               CASE WHEN b.n_tokens >= 2
                    THEN top.top_bigram_count / (b.n_tokens - 1)
                    ELSE 0.0 END AS top_bigram_frac
        FROM base b LEFT JOIN top USING (doc_id)
    )
    SELECT doc_id, n_tokens, dup_word_frac, top_bigram_count,
           top_bigram_frac,
           (dup_word_frac <= 0.5 AND top_bigram_frac <= 0.2)
               AS passes_quality
    FROM joined
    """,
)
def t8_repetition_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document repetition quality signals (the Gopher-rule family:
    Rae et al. 2021 §A1.1 filter on duplicate-word and top-n-gram
    fractions): duplicate-word fraction, the most frequent bigram's
    share of all bigrams, and a pass/fail gate.

    Plan shape: the word-level signal is a pure row expression
    (array_distinct — no shuffle); the bigram mode is explode →
    (doc, bigram) partial+final count → per-doc max — shuffle volume
    is bounded by *distinct* bigrams per partition, and every stage
    partial-aggregates map-side. No UDFs anywhere."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    base = d.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_tokens"),
        (F.lit(1.0) - F.size(F.array_distinct(toks)) / F.size(toks))
        .alias("dup_word_frac"),
    )
    bigrams = (
        d.select("doc_id", toks.alias("t"))
        .filter(F.size("t") >= 2)
        .select(
            "doc_id",
            # arrays_zip of shifted slices: codegen'd, where a
            # transform(sequence) build is interpreted (SCALE.md
            # "Interpreted vs codegen array shapes")
            F.explode(F.arrays_zip(
                F.slice("t", 1, F.size("t") - 1),
                F.slice("t", 2, F.size("t") - 1))).alias("p"),
        )
        .select("doc_id",
                F.concat_ws(" ", "p.0", "p.1").alias("bigram"))
    )
    top = (
        bigrams.groupBy("doc_id", "bigram")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").alias("top_bigram_count"))
    )
    # per-doc aggregate grows with the corpus; post-agg stats
    # mis-broadcast (round-12 audit) — pin on the table metadata count
    joined = (
        base.join(sized_side(top, d.count()), "doc_id", "left")
        .na.fill({"top_bigram_count": 0})
        .withColumn(
            "top_bigram_frac",
            F.when(F.col("n_tokens") >= 2,
                   F.col("top_bigram_count") / (F.col("n_tokens") - 1))
            .otherwise(F.lit(0.0)),
        )
    )
    return joined.select(
        "doc_id", "n_tokens", "dup_word_frac", "top_bigram_count",
        "top_bigram_frac",
        ((F.col("dup_word_frac") <= 0.5) & (F.col("top_bigram_frac") <= 0.2))
        .alias("passes_quality"),
    )


@query(
    "t9_sequence_packing",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        FROM documents
    ), off AS (
        SELECT doc_id, n_tokens,
               CAST(COALESCE(SUM(n_tokens) OVER (
                   ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS BIGINT) AS tok_offset
        FROM toks
    )
    SELECT doc_id, n_tokens, tok_offset,
           tok_offset // {SEQ_LEN} AS first_seq,
           (tok_offset + n_tokens - 1) // {SEQ_LEN} AS last_seq,
           (tok_offset + n_tokens - 1) // {SEQ_LEN}
               - tok_offset // {SEQ_LEN} + 1 AS n_seqs
    FROM off
    """,
)
def t9_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-cut sequence packing: the corpus is laid out as one
    token stream in doc_id order and cut into fixed {SEQ_LEN}-token
    training sequences (the standard GPT-style pretraining pack; a doc
    may span several sequences). Output per document: its global token
    offset and the first/last sequence ids it lands in.

    Scale shape: a naive global cumsum is a single-partition window.
    Instead the offsets are two-level — per-bucket token totals (a
    partial+final agg), a prefix sum over the *bucket totals* (a tiny
    frame, thousands of rows at 100 TB, where a driver-sized window is
    fine), broadcast back, plus a within-bucket cumsum window
    partitioned by bucket. No stage ever orders more than one bucket
    of rows; the same stitching trick as operators/timeseries.py.
    """
    d = load_table(spark, sf_dir, "documents")
    nt = d.select(
        "doc_id",
        F.size(F.split(F.col("text"), " ")).cast("long").alias("n_tokens"),
        F.floor(F.col("doc_id") / PACK_BUCKET).alias("bkt"),
    )
    btot = nt.groupBy("bkt").agg(F.sum("n_tokens").alias("btok"))
    wb = (Window.orderBy("bkt")
          .rowsBetween(Window.unboundedPreceding, -1))
    boff = btot.select(
        "bkt", F.coalesce(F.sum("btok").over(wb), F.lit(0)).alias("bucket_off"))
    ww = (Window.partitionBy("bkt").orderBy("doc_id")
          .rowsBetween(Window.unboundedPreceding, -1))
    packed = (
        nt.join(F.broadcast(boff), "bkt")
        .withColumn(
            "tok_offset",
            (F.col("bucket_off")
             + F.coalesce(F.sum("n_tokens").over(ww), F.lit(0))).cast("long"))
        .withColumn("first_seq", F.expr(f"tok_offset DIV {SEQ_LEN}"))
        .withColumn(
            "last_seq",
            F.expr(f"(tok_offset + n_tokens - 1) DIV {SEQ_LEN}"))
    )
    return packed.select(
        "doc_id", "n_tokens", "tok_offset", "first_seq", "last_seq",
        (F.col("last_seq") - F.col("first_seq") + 1).alias("n_seqs"),
    )


_PMI_MIN_PAIRS = 10
_PMI_Q = 1e6  # PMI quantization grid (nats * 1e6)


@query(
    "t14_pmi_cooccurrence",
    oracle=f"""
    WITH d AS (
        SELECT doc_id, string_split(text, ' ') AS ts FROM documents
    ), bigrams AS (
        SELECT s.a, s.b FROM (
            SELECT unnest(list_transform(ts[1:len(ts) - 1],
                   (x, i) -> {{'a': x, 'b': ts[i + 1]}})) AS s
            FROM d WHERE len(ts) >= 2)
    ), pairs AS (
        SELECT a, b, CAST(COUNT(*) AS BIGINT) AS c_ab
        FROM bigrams GROUP BY a, b
    ), uni AS (
        SELECT u.tok, CAST(COUNT(*) AS BIGINT) AS c_t
        FROM d, unnest(ts) AS u(tok) GROUP BY 1
    ), tot AS (
        SELECT CAST(SUM(c_t) AS BIGINT) AS nt FROM uni
    ), btot AS (
        SELECT CAST(SUM(c_ab) AS BIGINT) AS nb FROM pairs
    )
    SELECT p.a, p.b, p.c_ab, ua.c_t AS c_a, ub.c_t AS c_b,
           CAST(FLOOR({_PMI_Q} * ln(
               (CAST(p.c_ab AS DOUBLE) / nb)
               / ((CAST(ua.c_t AS DOUBLE) / nt)
                  * (CAST(ub.c_t AS DOUBLE) / nt))))
               AS BIGINT) AS pmi_micro
    FROM pairs p
    JOIN uni ua ON p.a = ua.tok
    JOIN uni ub ON p.b = ub.tok
    CROSS JOIN tot CROSS JOIN btot
    WHERE p.c_ab >= {_PMI_MIN_PAIRS}
    """,
)
def t14_pmi_cooccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pointwise mutual information of adjacent token pairs over the
    corpus — the collocation / phrase-mining statistic (and the
    word-embedding precursor: word2vec SGNS factorizes a shifted PMI
    matrix). PMI(a,b) = ln[ (c_ab/N_b) / ((c_a/N_t)(c_b/N_t)) ],
    floor-quantized to a 1e-6-nat grid from exact integer counts (the
    fs1/ds1 convention: the one ln is computed from the same int64
    inputs with the same operation order on both engines, then floored
    — never a parallel float accumulation). Pairs below {MIN}
    occurrences are dropped — the standard PMI small-count guard (PMI
    of rare pairs is maximal noise).

    Scale shape: one explode pass builds the bigram relation (the
    in-array transform keeps pair construction JVM-side — no
    self-join, no window), one for unigrams; both aggregate with
    map-side combine on token keys. The two corpus totals ride as
    broadcast 1-row aggregates, and the unigram table joins back
    token-keyed — the unigram relation is vocabulary-sized
    (Zipf-bounded, but it GROWS with the corpus), so the two
    attachments are measured-pinned: the relation is checkpointed
    (computed once, reused by ua/ub/tot), counted, and broadcast only
    under the ceiling (operators.joins.sized_side) — sort-merge past
    it."""
    docs = (load_table(spark, sf_dir, "documents")
            .select(F.split("text", " ").alias("ts")))
    bigrams = (docs.filter(F.size("ts") >= 2)
               .select(F.explode(F.expr(
                   "transform(slice(ts, 1, size(ts) - 1), "
                   "(x, i) -> struct(x AS a, ts[i + 1] AS b))"))
                   .alias("p"))
               .select("p.a", "p.b"))
    pairs = (bigrams.groupBy("a", "b")
             .agg(F.count(F.lit(1)).cast("long").alias("c_ab"))
             .filter(F.col("c_ab") >= _PMI_MIN_PAIRS))
    uni = (docs.select(F.explode("ts").alias("tok"))
           .groupBy("tok")
           .agg(F.count(F.lit(1)).cast("long").alias("c_t"))
           .localCheckpoint())
    n_vocab = uni.count()  # cheap: checkpoint-materialized
    tot = uni.agg(F.sum("c_t").cast("long").alias("nt"))
    btot = (bigrams.agg(F.count(F.lit(1)).cast("long").alias("nb")))
    ua = uni.select(F.col("tok").alias("a"), F.col("c_t").alias("c_a"))
    ub = uni.select(F.col("tok").alias("b"), F.col("c_t").alias("c_b"))
    return (pairs
            .join(sized_side(ua, n_vocab), "a")
            .join(sized_side(ub, n_vocab), "b")
            .crossJoin(F.broadcast(tot))
            .crossJoin(F.broadcast(btot))
            .select("a", "b", "c_ab", "c_a", "c_b",
                    F.expr(
                        f"CAST(FLOOR({_PMI_Q} * ln("
                        "(CAST(c_ab AS DOUBLE) / nb)"
                        " / ((CAST(c_a AS DOUBLE) / nt)"
                        " * (CAST(c_b AS DOUBLE) / nt))))"
                        " AS BIGINT)").alias("pmi_micro")))


t14_pmi_cooccurrence.__doc__ = t14_pmi_cooccurrence.__doc__.format(
    MIN=_PMI_MIN_PAIRS)


_LM_Q = 1e6  # log-prob quantization grid (nats * 1e6)


@query(
    "t15_bigram_lm_scores",
    oracle=f"""
    WITH d AS (
        SELECT doc_id, string_split(text, ' ') AS ts FROM documents
    ), bg AS (
        SELECT doc_id, s.a, s.b FROM (
            SELECT doc_id, unnest(list_transform(ts[1:len(ts) - 1],
                   (x, i) -> {{'a': x, 'b': ts[i + 1]}})) AS s
            FROM d WHERE len(ts) >= 2)
    ), docpairs AS (
        SELECT doc_id, a, b, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM bg GROUP BY 1, 2, 3
    ), pairs AS (
        SELECT a, b, CAST(SUM(cnt) AS BIGINT) AS c_ab
        FROM docpairs GROUP BY 1, 2
    ), uni AS (
        SELECT u.tok, CAST(COUNT(*) AS BIGINT) AS c_t
        FROM d, unnest(ts) AS u(tok) GROUP BY 1
    ), vsz AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS v FROM uni
    ), lp AS (
        SELECT p.a, p.b,
               CAST(FLOOR({_LM_Q} * ln(
                   (p.c_ab + 1.0) / (ua.c_t + vsz.v))) AS BIGINT)
                   AS lp_micro
        FROM pairs p JOIN uni ua ON p.a = ua.tok CROSS JOIN vsz
    )
    SELECT dp.doc_id,
           CAST(SUM(dp.cnt) AS BIGINT) AS n_bigrams,
           CAST(SUM(dp.cnt * lp.lp_micro) AS BIGINT) AS sum_lp_micro,
           CAST((-SUM(dp.cnt * lp.lp_micro)) // SUM(dp.cnt) AS BIGINT)
               AS avg_surprisal_micro
    FROM docpairs dp JOIN lp ON dp.a = lp.a AND dp.b = lp.b
    GROUP BY dp.doc_id
    """,
)
def t15_bigram_lm_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram language-model scoring of every document against a model
    trained on the corpus itself — the CCNet/Gopher-style perplexity
    proxy used to quality-filter web text before LLM training (docs
    whose token transitions are improbable under the corpus LM are
    boilerplate, gibberish, or foreign). Add-one smoothing over the
    full unigram vocabulary: lp(a,b) = ln[(c_ab + 1) / (c_a + V)].
    Per-document output is the exact int64 sum of per-PAIR-TYPE
    quantized log-probs (floor to a 1e-6-nat grid, the t14/fs1
    convention: ONE ln from identical int64 inputs on each engine,
    never a float accumulation) weighted by the doc's pair count, plus
    avg_surprisal_micro = (-sum) div n — negated FIRST so the floor
    division happens on non-negative integers, where Spark's ``div``
    (truncating) and DuckDB's ``//`` agree; on negatives they round in
    different directions.

    Scale shape: one explode pass builds the (doc, a, b, cnt) relation
    — and the whole train+score chain is FUSED onto one partitioning
    (the lp1 trick, round 10): ONE repartition(a, b) of the raw bigram
    relation satisfies the (doc_id, a, b) per-doc count (hash(a,b)
    clusters every (doc_id, a, b) group), the (a, b) pair-table
    re-aggregation, AND the (a, b) score join — three exchanges of
    pair-keyed data collapse into one. The trade is losing map-side
    combine on the first aggregation (raw bigram occurrences shuffle
    instead of per-doc-combined counts — a small shrink on this
    corpus); measured A/B: sf0.1 1.65 -> 1.71 s (wash, inside drift),
    10x 10.5 -> 5.9 s best-of-3 (1.8x win) — the decade ratio drops
    from x7.1 to ~x3.5 (SCALE.md round 10). Unigram counts are
    vocabulary-sized — GROWING with the corpus — so that attachment is
    measured-pinned (checkpoint, count, sized_side); V rides as a
    1-row aggregate. Regroup on doc_id is the final exchange.
    Nothing is proportional to corpus length except the two narrow
    explode passes."""
    raw = load_table(spark, sf_dir, "documents")
    # measured bound for the score join's docpairs side (round-12
    # implicit-broadcast audit: the 10× plan broadcast the CORPUS-
    # sized per-doc pair relation, BuildLeft, on underestimated
    # post-explode stats): tokens <= (chars+1)/2 per doc bounds the
    # bigram relation; one column-pruned scan of n_chars
    row = raw.agg(F.sum("n_chars").alias("c"),
                  F.count("*").alias("n")).collect()[0]
    pair_bound = (int(row["c"]) + int(row["n"])) // 2 + 1
    docs = raw.select("doc_id", F.split("text", " ").alias("ts"))
    bg = (docs.filter(F.size("ts") >= 2)
          .select("doc_id", F.explode(F.expr(
              "transform(slice(ts, 1, size(ts) - 1), "
              "(x, i) -> struct(x AS a, ts[i + 1] AS b))")).alias("p"))
          .select("doc_id", "p.a", "p.b")
          .repartition("a", "b"))
    docpairs = (bg.groupBy("doc_id", "a", "b")
                .agg(F.count(F.lit(1)).cast("long").alias("cnt")))
    pairs = (docpairs.groupBy("a", "b")
             .agg(F.sum("cnt").cast("long").alias("c_ab")))
    uni = (docs.select(F.explode("ts").alias("tok"))
           .groupBy("tok")
           .agg(F.count(F.lit(1)).cast("long").alias("c_t"))
           .localCheckpoint())
    n_vocab = uni.count()  # cheap: checkpoint-materialized
    vsz = uni.agg(F.count(F.lit(1)).cast("long").alias("v"))
    lp = (pairs
          .join(sized_side(uni.select(F.col("tok").alias("a"),
                                      F.col("c_t").alias("c_a")),
                           n_vocab), "a")
          .crossJoin(F.broadcast(vsz))
          .select("a", "b", F.expr(
              f"CAST(FLOOR({_LM_Q} * ln("
              "(c_ab + 1.0) / (c_a + v))) AS BIGINT)").alias("lp_micro")))
    return (sized_side(docpairs, pair_bound).join(lp, ["a", "b"])
            .groupBy("doc_id")
            .agg(F.sum("cnt").cast("long").alias("n_bigrams"),
                 F.sum(F.col("cnt") * F.col("lp_micro")).cast("long")
                 .alias("sum_lp_micro"))
            .select("doc_id", "n_bigrams", "sum_lp_micro",
                    F.expr("CAST((-sum_lp_micro) div n_bigrams AS BIGINT)")
                    .alias("avg_surprisal_micro")))
