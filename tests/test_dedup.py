"""Dedup operators: LSH paths validated against exact oracles.

Corpus construction: the driver's ``documents`` table (all-unique
texts) plus controlled mutations — exact copies, one-token edits,
half-rewrites — so expected (near-)duplicate pairs are known.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from big_data_analytics_spark.catalog import load_table
from big_data_analytics_spark.operators.dedup import (
    exact_dedup,
    lsh_dedup,
    minhash_lsh_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash_near_dup_pairs,
    word_shingles,
)
from tests.conftest import SF_CORRECT

N_BASE = 120


@pytest.fixture(scope="module")
def corpus(spark):
    """base docs 0..N | exact copies +1000 | near copies (one token
    appended) +2000 | unrelated shuffled tails stay unique."""
    base = (
        load_table(spark, SF_CORRECT, "documents")
        .filter(F.col("doc_id") < N_BASE)
        .select("doc_id", "text")
    )
    exact = base.select((F.col("doc_id") + 1000).alias("doc_id"), "text")
    near = base.select(
        (F.col("doc_id") + 2000).alias("doc_id"),
        F.concat("text", F.lit(" extra")).alias("text"),
    )
    return base.unionByName(exact).unionByName(near).cache()


def test_exact_dedup(corpus):
    kept = exact_dedup(corpus)
    assert kept.count() == 2 * N_BASE  # copies removed, near-dups kept
    assert kept.filter(F.col("doc_id").between(1000, 1999)).count() == 0


def test_exact_dedup_normalization(spark):
    df = spark.createDataFrame(
        [(1, "Hello  World"), (2, "hello world"), (3, "HELLO\tWORLD"), (4, "other")],
        ["doc_id", "text"],
    )
    kept = exact_dedup(df)
    assert sorted(r.doc_id for r in kept.collect()) == [1, 4]


def test_minhash_estimates_jaccard(corpus):
    """Signature agreement ≈ true Jaccard within MinHash sampling error."""
    sigs = minhash_signatures(corpus, num_hashes=128).cache()
    a = sigs.filter(F.col("doc_id") < N_BASE).select(
        F.col("doc_id").alias("id_a"), F.col("signature").alias("sig_a"))
    b = sigs.filter(F.col("doc_id") >= 2000).select(
        (F.col("doc_id") - 2000).alias("id_a"), F.col("signature").alias("sig_b"))
    est = a.join(b, "id_a").select(
        "id_a",
        (F.size(F.filter(F.zip_with("sig_a", "sig_b", lambda x, y: x == y),
                         lambda e: e)) / F.lit(128.0)).alias("est"),
    )
    true = ngram_jaccard_pairs(
        corpus.filter((F.col("doc_id") < N_BASE) | (F.col("doc_id") >= 2000)),
        threshold=0.0,
    ).filter(F.col("id_b") - F.col("id_a") == 2000).select(
        F.col("id_a"), F.col("jaccard"))
    joined = est.join(true, "id_a").toPandas()
    assert len(joined) == N_BASE
    # 128 hashes → se ≈ sqrt(j(1-j)/128) ≤ 0.045; allow 4σ
    assert (abs(joined.est - joined.jaccard) < 0.18).all()


def test_minhash_lsh_finds_near_dups(corpus):
    pairs = minhash_lsh_pairs(corpus, threshold=0.5).cache()
    found = {(r.id_a, r.id_b) for r in pairs.collect()}
    # every exact copy pair found with est≈1
    exact_pairs = {(i, i + 1000) for i in range(N_BASE)}
    assert exact_pairs <= found
    # near-dup pairs (one appended token, long docs → high jaccard):
    # recall against the exact-jaccard oracle at the same threshold
    oracle = ngram_jaccard_pairs(corpus, threshold=0.75)
    oracle_pairs = {(r.id_a, r.id_b) for r in oracle.collect()}
    recall = len(found & oracle_pairs) / max(1, len(oracle_pairs))
    assert recall > 0.9, f"LSH recall {recall}"


def test_lsh_dedup_keeps_minimal_ids(corpus):
    kept = lsh_dedup(corpus, threshold=0.5)
    ids = {r.doc_id for r in kept.select("doc_id").collect()}
    assert not any(1000 <= i < 2000 for i in ids)  # exact copies gone
    assert all(i in ids for i in range(N_BASE))    # originals kept


def test_simhash_near_dup(corpus):
    pairs = simhash_near_dup_pairs(corpus, max_hamming=3).cache()
    found = {(r.id_a, r.id_b) for r in pairs.collect()}
    exact_pairs = {(i, i + 1000) for i in range(N_BASE)}
    assert exact_pairs <= found  # identical docs: hamming 0
    # hamming values are symmetric-correct
    assert pairs.filter(F.col("hamming") < 0).count() == 0


def test_ngram_jaccard_exact_values(spark):
    df = spark.createDataFrame(
        [(1, "a b c d e"), (2, "a b c d e"), (3, "a b c d x"), (4, "p q r s t")],
        ["doc_id", "text"],
    )
    pairs = {(r.id_a, r.id_b): r.jaccard
             for r in ngram_jaccard_pairs(df, shingle_k=2, threshold=0.0).collect()}
    assert pairs[(1, 2)] == pytest.approx(1.0)
    # shingles(1)={ab,bc,cd,de}, shingles(3)={ab,bc,cd,dx}: 3/5
    assert pairs[(1, 3)] == pytest.approx(0.6)
    assert (1, 4) not in pairs or pairs[(1, 4)] == 0.0


def test_word_shingles_short_doc(spark):
    df = spark.createDataFrame([(1, "hello world")], ["doc_id", "text"])
    row = df.select(word_shingles(F.col("text"), 3).alias("s")).first()
    assert row.s == ["hello world"]  # shorter than k → whole doc


def test_clean_corpus_pipeline(spark):
    """The composed cleanup chain: every stage removes exactly what its
    predicate says, and the report accounts for every document."""
    from pyspark.sql import functions as F
    from big_data_analytics_spark.catalog import load_table
    from big_data_analytics_spark.operators.corpus import clean_corpus

    base = load_table(spark, SF_CORRECT, "documents").filter(
        F.col("doc_id") < 100)
    # plant: one exact copy, one junk doc (all digits), one short doc
    extra = spark.createDataFrame(
        [(5000, base.filter(F.col("doc_id") == 0).first().text, "en", "x", 1),
         (5001, "1234567890 " * 20, "en", "x", 1),
         (5002, "too short", "en", "x", 1),
         (5003, "ein deutscher text " * 20, "de", "x", 1)],
        base.schema.names)
    corpus = base.unionByName(extra)
    cleaned, report = clean_corpus(corpus, languages=("en", "es", "zh", "fr"))
    # independently recompute each stage's expectation
    from big_data_analytics_spark.operators.corpus import quality_predicate
    langs = ("en", "es", "zh", "fr")
    exp_quality = corpus.filter(quality_predicate(F.col("text"))).count()
    exp_lang = corpus.filter(
        quality_predicate(F.col("text")) & F.col("lang").isin(*langs)).count()
    assert report.n_input == 104
    assert report.n_after_quality == exp_quality
    assert exp_quality <= 102                   # junk + short dropped at least
    assert report.n_after_language == exp_lang  # fixture 'de'/other + planted de
    assert report.n_after_exact_dedup == exp_lang - 1  # planted copy dropped
    assert report.n_after_near_dedup <= report.n_after_exact_dedup
    ids = {r.doc_id for r in cleaned.select("doc_id").collect()}
    assert 5000 not in ids and 5001 not in ids and 5002 not in ids and 5003 not in ids
    assert 0 in ids


def test_minhash_lsh_bucket_cap_bounds_mega_bucket(spark):
    """A planted boilerplate mega-bucket (300 identical docs → every
    band bucket holds all 300) stays bounded under max_bucket_size:
    the capped run produces zero within-boilerplate pairs while normal
    near-dup pairs are found identically to the uncapped run."""
    base = (
        load_table(spark, SF_CORRECT, "documents")
        .filter(F.col("doc_id") < 30)
        .select("doc_id", "text")
    )
    copies = base.select((F.col("doc_id") + 1000).alias("doc_id"), "text")
    boiler = spark.range(10_000, 10_300).select(
        F.col("id").alias("doc_id"),
        F.lit("lorem ipsum boilerplate navigation footer " * 8).alias("text"),
    )
    corpus = base.unionByName(copies).unionByName(boiler)

    capped = minhash_lsh_pairs(corpus, threshold=0.5, max_bucket_size=100)
    capped_pairs = {(r.id_a, r.id_b) for r in capped.collect()}
    boiler_pairs_capped = {p for p in capped_pairs if p[0] >= 10_000}
    assert boiler_pairs_capped == set()  # mega-bucket dropped per band
    normal_capped = capped_pairs - boiler_pairs_capped

    uncapped = minhash_lsh_pairs(corpus, threshold=0.5, max_bucket_size=None)
    uncapped_pairs = {(r.id_a, r.id_b) for r in uncapped.collect()}
    boiler_pairs_uncapped = {p for p in uncapped_pairs if p[0] >= 10_000}
    assert len(boiler_pairs_uncapped) == 300 * 299 // 2  # the quadratic blow-up
    # recall on non-degenerate pairs is unchanged by the cap
    assert normal_capped == uncapped_pairs - boiler_pairs_uncapped
    assert {(i, i + 1000) for i in range(30)} <= normal_capped


def test_lsh_dedup_with_exact_verify(corpus):
    """verify=True re-scores candidates with true Jaccard: exact copies
    still removed, and no document is removed for a pair whose true
    Jaccard is below the verify threshold."""
    kept = lsh_dedup(corpus, threshold=0.5, verify=True, verify_threshold=0.9)
    ids = {r.doc_id for r in kept.select("doc_id").collect()}
    assert not any(1000 <= i < 2000 for i in ids)   # exact copies (j=1.0) gone
    assert all(i in ids for i in range(N_BASE))     # originals kept
    # stricter than plain LSH: pairs with true jaccard in [0.5, 0.9)
    # survive the verified dedup
    plain = lsh_dedup(corpus, threshold=0.5)
    assert kept.count() >= plain.count()


def test_cross_corpus_contamination(spark):
    """Train/eval contamination: planted near-copies across the two
    corpora are found, within-corpus duplicates are NOT reported, and
    anti-joining the pairs decontaminates the training side."""
    from big_data_analytics_spark.operators.dedup import (
        cross_corpus_lsh_pairs,
    )

    docs = (
        load_table(spark, SF_CORRECT, "documents")
        .filter(F.col("doc_id") < 80)
        .select("doc_id", "text")
    )
    base = docs.filter(F.col("doc_id") < 60)
    # train = docs 0-59 plus an internal dup pair (1000 copies 0)
    train = base.unionByName(
        base.filter(F.col("doc_id") == 0)
        .select((F.col("doc_id") + 1000).alias("doc_id"), "text"))
    # eval = near-copies of train docs 10-19 (one token appended),
    # plus genuinely clean docs 60-79 that are NOT in train
    contaminated = base.filter(F.col("doc_id").between(10, 19)).select(
        (F.col("doc_id") + 5000).alias("doc_id"),
        F.concat("text", F.lit(" tail")).alias("text"))
    clean = docs.filter(F.col("doc_id") >= 60).select(
        (F.col("doc_id") + 9000).alias("doc_id"), "text")
    eval_set = contaminated.unionByName(clean)

    pairs = cross_corpus_lsh_pairs(train, eval_set, threshold=0.5).cache()
    found = {(r.left_id, r.right_id) for r in pairs.collect()}
    # every contaminated eval doc is linked to its train source
    assert {(i, i + 5000) for i in range(10, 20)} <= found
    # clean eval docs match nothing; train-internal dup not reported
    assert all(rid < 9000 for _, rid in found)
    # pairs are strictly cross-corpus: left ids come from train
    # (0-59, 1000), right ids from eval (5000s/9000s) — the train-
    # internal dup (0, 1000) must never surface as a pair either way
    assert all(lid < 5000 <= rid for lid, rid in found)
    assert not any({lid, rid} == {0, 1000} for lid, rid in found)

    decontaminated = train.join(
        pairs.select(F.col("left_id").alias("doc_id")).distinct(),
        "doc_id", "left_anti")
    kept = {r.doc_id for r in decontaminated.collect()}
    assert not (set(range(10, 20)) & kept)   # leaked docs removed
    assert set(range(0, 10)) <= kept         # clean train docs kept


def test_exact_ngram_contamination(spark):
    """Exact 8-gram decontamination: planted near-copies (one appended
    token) share almost all n-grams with their source; clean docs from
    outside the training set share none (word-soup corpus — chance
    verbatim 8-grams across distinct docs are filtered by requiring
    the planted pairs' high counts, not assumed absent)."""
    from big_data_analytics_spark.operators.dedup import (
        exact_ngram_contamination,
    )

    docs = (
        load_table(spark, SF_CORRECT, "documents")
        .filter(F.col("doc_id") < 80)
        .select("doc_id", "text")
    )
    train = docs.filter(F.col("doc_id") < 60)
    contaminated = train.filter(F.col("doc_id").between(10, 19)).select(
        (F.col("doc_id") + 5000).alias("doc_id"),
        F.concat("text", F.lit(" tail")).alias("text"))
    clean = docs.filter(F.col("doc_id") >= 60).select(
        (F.col("doc_id") + 9000).alias("doc_id"), "text")
    eval_set = contaminated.unionByName(clean)

    pairs = exact_ngram_contamination(train, eval_set, n=8).toPandas()
    got = {(r.left_id, r.right_id): r.n_shared_ngrams
           for r in pairs.itertuples()}
    # appending one token removes no original 8-gram, so each planted
    # pair shares EXACTLY its source doc's distinct-8-gram count
    toks = F.split(F.trim(F.col("text")), r"\s+")
    ngs = F.transform(F.sequence(F.lit(1), F.size(toks) - 7),
                      lambda i: F.concat_ws(" ", F.slice(toks, i, 8)))
    expected = {
        r.doc_id: r.n for r in train.filter(F.col("doc_id").between(10, 19))
        .select("doc_id", F.size(F.array_distinct(ngs)).alias("n")).collect()
    }
    for i in range(10, 20):
        assert got.get((i, i + 5000), 0) == expected[i], (i, got.get((i, i + 5000)), expected[i])


def test_prefix_filter_candidates_shrink_vs_full_index(spark):
    """d9's efficiency claim, measured: the prefix join must generate
    strictly fewer distinct candidate pairs than the full inverted
    index (pairs sharing ANY shingle), while the verified output
    equals the brute-force pairs exactly (the oracle hash also pins
    this; here we pin the candidate REDUCTION, which the hash
    cannot see)."""
    from pyspark.sql import functions as F

    from big_data_analytics_spark.operators.dedup import (
        prefix_filtered_jaccard_pairs,
        word_shingles,
    )
    from big_data_analytics_spark.queries.dedup_queries import (
        _doc_corpus_with_dups,
    )
    from tests.conftest import SF_CORRECT

    corpus = _doc_corpus_with_dups(spark, SF_CORRECT)
    sh = corpus.select(
        "doc_id", F.explode(word_shingles(F.col("text"))).alias("shingle"))
    a = sh.select(F.col("doc_id").alias("id_a"), "shingle")
    b = sh.select(F.col("doc_id").alias("id_b"), "shingle")
    full_pairs = (a.join(b, "shingle")
                  .filter(F.col("id_a") < F.col("id_b"))
                  .select("id_a", "id_b").distinct().count())

    # re-derive the prefix candidate relation the operator joins on
    from pyspark.sql import Window
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    freq = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("freq"))
    ranked = (sh.join(freq, "shingle").join(sizes, "doc_id")
              .withColumn("r", F.row_number().over(
                  Window.partitionBy("doc_id").orderBy("freq", "shingle")))
              .withColumn("p", F.col("n") - F.ceil(0.5 * F.col("n")) + 1))
    prefix = ranked.filter(F.col("r") <= F.col("p"))
    pa = prefix.select(F.col("doc_id").alias("id_a"), "shingle")
    pb = prefix.select(F.col("doc_id").alias("id_b"), "shingle")
    prefix_pairs = (pa.join(pb, "shingle")
                    .filter(F.col("id_a") < F.col("id_b"))
                    .select("id_a", "id_b").distinct().count())
    assert prefix_pairs < full_pairs
    # and completeness: every >=0.5 pair the full index finds, the
    # prefix path finds too
    from big_data_analytics_spark.operators.dedup import ngram_jaccard_pairs
    brute = {(r.id_a, r.id_b) for r in
             ngram_jaccard_pairs(corpus, threshold=0.5).collect()}
    fast = {(r.id_a, r.id_b) for r in
            prefix_filtered_jaccard_pairs(corpus, threshold=0.5).collect()}
    assert fast == brute
