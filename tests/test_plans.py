"""Physical-plan regression tests — the 100 TB guardrails.

Correctness tests prove the queries compute the right rows; these
prove they compute them with the right *plan*: filters pushed into the
Parquet scan, projections pruned, dims broadcast (no fact-side
shuffle), top-k via TakeOrderedAndProject (no global sort), and no
Python evaluation anywhere in the hot path. A regression here is a
performance bug that sf0.01 timings would never catch.
"""

from __future__ import annotations

import pytest

from big_data_analytics_spark.queries import load_all
from tests.conftest import SF_CORRECT

REGISTRY = load_all()


def _plan(spark, name: str) -> str:
    df = REGISTRY[name].spark_fn(spark, SF_CORRECT)
    return df._jdf.queryExecution().executedPlan().toString()


def _optimized(spark, name: str) -> str:
    df = REGISTRY[name].spark_fn(spark, SF_CORRECT)
    return df._jdf.queryExecution().optimizedPlan().toString()


def test_filter_pushdown_reaches_scan(spark):
    """a1's shipdate filter must appear as a pushed Parquet filter."""
    plan = _plan(spark, "a1_pricing_summary")
    assert "PushedFilters: [" in plan
    assert "l_shipdate" in plan.split("PushedFilters:")[1][:200]


def test_column_pruning(spark):
    """a1 touches 7 of 11 lineitem columns; ReadSchema must not include
    the unused ones (l_partkey/l_suppkey/l_orderkey/l_linenumber)."""
    plan = _plan(spark, "a1_pricing_summary")
    read = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "l_partkey" not in read and "l_suppkey" not in read
    assert "l_quantity" in read


def test_dim_joins_broadcast(spark):
    """j1: both dim joins must be broadcast — a shuffled/sort-merge
    join on nation or customer means the fact table shuffles for
    nothing."""
    plan = _plan(spark, "j1_revenue_by_nation")
    assert plan.count("BroadcastHashJoin") >= 2
    assert "SortMergeJoin" not in plan


def test_five_way_join_broadcasts_dims(spark):
    plan = _plan(spark, "j7_regional_supplier_volume")
    assert plan.count("BroadcastHashJoin") >= 3


def test_topk_avoids_global_sort(spark):
    """o1: ORDER BY + LIMIT must plan as TakeOrderedAndProject."""
    plan = _plan(spark, "o1_top_orders_by_revenue")
    assert "TakeOrderedAndProject" in plan


def test_partial_aggregation_present(spark):
    """Grouped aggregates must be partial+final (map-side combine) —
    two HashAggregate nodes around the exchange."""
    plan = _plan(spark, "a1_pricing_summary")
    assert plan.count("HashAggregate") >= 2


def test_no_python_udfs_in_hot_paths(spark):
    """Every oracle-backed query must stay JVM-side: no Python row/
    Arrow evaluation nodes in any executed plan. The x11/x12 UDF-tier
    certification queries (queries/udf_queries.py) are the sanctioned
    exceptions — they exist precisely to grade the Arrow tiers and
    are asserted to use them (ArrowEval/FlatMapGroupsInPandas),
    never row-at-a-time BatchEvalPython."""
    offenders = []
    for name, q in REGISTRY.items():
        if not q.oracle:
            continue
        if name.startswith("x1"):
            plan = _plan(spark, name)
            assert "BatchEvalPython" not in plan, name
            assert ("ArrowEvalPython" in plan
                    or "FlatMapGroupsInPandas" in plan), name
            continue
        plan = _plan(spark, name)
        if "BatchEvalPython" in plan or "ArrowEvalPython" in plan:
            offenders.append(name)
    assert not offenders, f"Python eval in: {offenders}"


def test_semi_join_planned(spark):
    plan = _plan(spark, "j5_customers_with_urgent_orders")
    assert "LeftSemi" in plan or "left_semi" in plan.lower()


def test_exact_dedup_shuffles_hash_not_text(spark):
    """d1 groups by the md5 fingerprint, never the raw text: the
    optimized plan's exchange key must be the fingerprint."""
    plan = _optimized(spark, "d1_exact_dedup")
    assert "md5" in plan.lower()


def test_whole_stage_codegen_active(spark):
    """Inspect the AQE *final* plan (pre-execution it's unresolved):
    run the query, then check codegen stages span the aggregate."""
    df = REGISTRY["a1_pricing_summary"].spark_fn(spark, SF_CORRECT)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in plan
    # codegen stages render as "*(n) " prefixes in the tree string
    assert "*(1) " in plan and "*(2) " in plan


def test_q3_pushes_both_fact_filters(spark):
    """q3: the date filters on orders and lineitem must both reach
    their Parquet scans, and the customer-segment filter its scan."""
    plan = _plan(spark, "q3_shipping_priority")
    pushed = [seg[:200] for seg in plan.split("PushedFilters:")[1:]]
    assert any("o_orderdate" in s for s in pushed)
    assert any("l_shipdate" in s for s in pushed)
    assert any("c_mktsegment" in s for s in pushed)


def test_q5_broadcasts_all_dims(spark):
    """q5: region/nation/supplier ride broadcast joins; the only
    sort-merge-eligible joins are the fact-fact ones."""
    plan = _plan(spark, "q5_local_supplier_volume")
    assert plan.count("BroadcastHashJoin") >= 3


def test_q10_topk_no_global_sort(spark):
    plan = _plan(spark, "q10_returned_items")
    assert "TakeOrderedAndProject" in plan


def test_w8_single_shuffle_per_user(spark):
    """w8: the range-frame window needs exactly one exchange (by
    user_id) — no extra sorts or shuffles beyond the window's own."""
    plan = _plan(spark, "w8_moving_hour_stats")
    assert plan.count("Exchange hashpartitioning(user_id") == 1


def test_t7_vocabulary_partial_aggregates(spark):
    """t7: the token count must partial-aggregate map-side so the
    shuffle carries (token, count) pairs, not token instances."""
    plan = _plan(spark, "t7_vocabulary")
    assert plan.count("HashAggregate") >= 2


def test_ivf_probe_stays_in_plan(spark):
    """v3_ivf: probe-cell selection must appear as a broadcast join +
    window in the plan (no driver-side loop shrinks the plan to a
    bare candidate join)."""
    plan = _plan(spark, "v3_ivf_topk")
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "RunningWindowFunction" in plan or "Window" in plan


def test_o2g_window_group_limit(spark):
    """o2g: per-group top-k must plan as WindowGroupLimit so each
    partition prunes to its local top-3 before the shuffle."""
    plan = _plan(spark, "o2g_topk_per_group")
    assert "WindowGroupLimit" in plan


def test_dq1_profile_no_expand(spark):
    """dq1: neither the approx default nor the exact two-pass path may
    plan through Expand (N simultaneous exact distincts multiply every
    scanned row x(N+1) before the shuffle — the round-2 scale defect)."""
    from big_data_analytics_spark.catalog import load_table
    from big_data_analytics_spark.queries.quality import profile_columns

    plan = _plan(spark, "dq1_profile_lineitem")
    assert "Expand" not in plan
    l = load_table(spark, SF_CORRECT, "lineitem")
    approx = profile_columns(l, ["l_quantity", "l_returnflag"])
    approx_plan = approx._jdf.queryExecution().executedPlan().toString()
    assert "Expand" not in approx_plan


def test_dq4_ngram_join_shape(spark):
    """dq4: the contamination join must shuffle md5 fingerprints with
    partial-aggregated pair counts — no Python eval, no global sort."""
    plan = _plan(spark, "dq4_ngram_contamination")
    assert "BatchEvalPython" not in plan and "Sort " not in plan.split("\n")[0]
    assert plan.count("HashAggregate") >= 2  # partial+final pair counts


def test_t8_bigram_mode_partial_aggregates(spark):
    """t8: the bigram mode must partial-aggregate map-side, so the
    shuffle carries (doc, bigram, partial count), not bigram rows."""
    plan = _plan(spark, "t8_repetition_signals")
    assert plan.count("HashAggregate") >= 4
    assert "BatchEvalPython" not in plan


def test_inventory_windows_partitioned(spark):
    """ecom_inventory_levels: both Lindley windows run under the same
    per-product partitioning (one exchange feeds both), and the
    initial-stock dim broadcasts."""
    plan = _plan(spark, "ecom_inventory_levels")
    assert "BroadcastHashJoin" in plan
    assert plan.count("Window") == 2
    # exactly one shuffle for the window partitioning + the fixture scan
    assert "SortMergeJoin" not in plan


def test_scd2_single_exchange(spark):
    """scd1: change-lag, version row_number, and interval lead must all
    reuse one hashpartitioning(user_id) exchange — a second shuffle
    means the windows disagree on partitioning."""
    plan = _plan(spark, "scd1_user_state_history")
    assert plan.count("Exchange hashpartitioning(user_id") == 1


def test_t9_packing_no_global_window(spark):
    """t9: offsets must come from the bucket-stitched two-level cumsum;
    a window partitioned only by ORDER BY (empty partition spec over
    the full corpus) would single-thread the whole table."""
    plan = _plan(spark, "t9_sequence_packing")
    assert "Exchange hashpartitioning(bkt" in plan
    assert "Exchange SinglePartition" in plan  # the tiny bucket-totals frame only
    assert plan.count("Exchange SinglePartition") == 1


def test_ij1_equi_join_with_residual(spark):
    """ij1: the interval join must hash on user_id with the time bounds
    as residual predicates — a nested-loop cross product over events
    would be quadratic."""
    plan = _plan(spark, "ij1_view_purchase_pairs")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_t10_pii_scrub_no_shuffle(spark):
    """PII scrubbing is a pure per-row map — any Exchange means the
    plan is routing text through a shuffle for nothing."""
    plan = _plan(spark, "t10_pii_scrub")
    assert "Exchange" not in plan


def test_fj1_no_cartesian(spark):
    """The deletion-neighborhood join must plan as an equality join on
    the variant key — a cartesian/broadcast-nested-loop product is the
    quadratic blow-up the scheme exists to avoid."""
    plan = _plan(spark, "fj1_fuzzy_supplier_names")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_a20_winsorize_single_exchange(spark):
    """Percentile window + final agg share the l_returnflag hash
    partitioning: exactly one exchange over lineitem."""
    plan = _plan(spark, "a20_winsorized_prices")
    assert plan.count("Exchange hashpartitioning") == 1


def test_gr1_iterations_broadcast_ranks(spark):
    """The broadcast strategy must join ranks into edges as a
    BroadcastHashJoin every iteration — a SortMergeJoin would shuffle
    the edge list five times. The graded query materializes through a
    checkpoint (opaque plan), so inspect the operator's lazy form."""
    from big_data_analytics_spark.catalog import load_table
    from big_data_analytics_spark.operators.graph import pagerank
    from big_data_analytics_spark.queries.graph_queries import (
        _copurchase_edges)
    li = load_table(spark, SF_CORRECT, "lineitem").select(
        "l_orderkey", "l_partkey")
    ranks = pagerank(_copurchase_edges(li), iterations=5,
                     assume_distinct=True, materialize=False)
    plan = ranks._jdf.queryExecution().executedPlan().toString()
    assert plan.count("BroadcastHashJoin") >= 5
    assert "SortMergeJoin" not in plan


def test_rc1_closure_is_single_aggregation(spark):
    """Ancestor-closure expansion: one generate (explode) + one
    aggregate; no joins, no iteration."""
    plan = _plan(spark, "rc1_hierarchy_rollup")
    assert "Generate explode" in plan
    assert "Join" not in plan


def test_up1_full_outer_on_key(spark):
    plan = _plan(spark, "up1_orders_upsert")
    assert "FullOuter" in plan


def test_gi1_single_exchange_on_user(spark):
    """distinct + window + two aggs all ride one user_id exchange
    (plus AQE reads); a second hashpartitioning on a different key
    would mean the islands trick lost its partitioning reuse."""
    plan = _plan(spark, "gi1_activity_islands")
    # allow the AQE-inserted reuse markers; count real exchanges
    assert plan.count("Exchange hashpartitioning") <= 2


def test_a22_corr_matrix_single_pass(spark):
    """All pairwise correlations from one aggregation: no joins, and
    exactly one scan of lineitem feeding one agg."""
    plan = _plan(spark, "a22_corr_matrix")
    assert "Join" not in plan
    assert plan.count("Scan parquet") == 1


def test_t11_grouped_topk_window_limit(spark):
    plan = _plan(spark, "t11_top_bigrams_per_lang")
    assert "WindowGroupLimit" in plan


def test_inc1_merge_is_full_outer(spark):
    plan = _plan(spark, "inc1_incremental_rollup")
    assert "FullOuter" in plan


def test_d5_containment_no_cartesian(spark):
    plan = _plan(spark, "d5_containment_pairs")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_rt1_retention_exchange_budget(spark):
    """Cohort assignment + dedup + final count: the user_id exchange
    is shared; the only other exchange is the matrix-sized final
    (cohort, offset) count."""
    plan = _plan(spark, "rt1_weekly_retention")
    assert plan.count("Exchange hashpartitioning") <= 3


def test_at1_equi_join_with_time_residual(spark):
    """Attribution joins views to purchases on user_id with the time
    window as a residual predicate — never a time-only theta join."""
    plan = _plan(spark, "at1_time_decay_attribution")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_z1_single_exchange_no_python(spark):
    """The Morton encode is pure shift/AND column math: one hash
    aggregation exchange, no Python eval, no joins."""
    plan = _plan(spark, "z1_zorder_keys")
    assert plan.count("Exchange hashpartitioning") == 1
    assert "EvalPython" not in plan
    assert "Join" not in plan


def test_d3b_no_sort_merge_join(spark):
    """Fingerprints are doc-count-sized; the planted-pair joins must
    broadcast, never sort-merge."""
    plan = _plan(spark, "d3b_simhash_portable")
    assert "SortMergeJoin" not in plan
    assert "EvalPython" not in plan


def test_d7_delta_side_broadcasts(spark):
    """Incremental dedup's band join must broadcast the delta side —
    a sort-merge join would shuffle the full band index per batch."""
    plan = _plan(spark, "d7_incremental_dedup")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_v5_sq_quantize_broadcasts(spark):
    """SQ8 ANN: the 1-row codebook and the query set ride broadcasts;
    the corpus is never shuffled for ranking (WindowGroupLimit prunes
    per partition) and nothing falls back to Python or sort-merge."""
    plan = _plan(spark, "v5_sq_topk")
    assert "SortMergeJoin" not in plan
    assert "EvalPython" not in plan
    assert "WindowGroupLimit" in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_cc1_components_checkpointed(spark):
    """Transitive dedup clusters: the label-propagation fixed point is
    consumed from checkpointed lineage (no re-derivation of the pair
    join per downstream action) and stays JVM-side."""
    plan = _plan(spark, "cc1_dedup_clusters")
    assert "EvalPython" not in plan
    assert "ExistingRDD" in plan or "LocalTableScan" in plan


def test_bpe2_rule_broadcasts(spark):
    """BPE encode: each merge rule is a 1-row broadcast into a string
    map over the corpus — never a shuffle of the text."""
    plan = _plan(spark, "bpe2_encode")
    assert "SortMergeJoin" not in plan
    assert "EvalPython" not in plan
    assert "BroadcastNestedLoopJoin" in plan


def test_ml1_single_pass_sufficient_stats(spark):
    """OLS inference: six sufficient statistics in ONE partial+final
    aggregation — exactly one exchange, no joins, no Python."""
    plan = _plan(spark, "ml1_ols_inference")
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Join" not in plan
    assert "EvalPython" not in plan


def test_ml2_ml3_single_exchange_no_join(spark):
    """ANOVA and multiple regression: one partial+final aggregation
    over the fact table (plus scalar reductions) — no joins, no
    Python, at most two exchanges end-to-end."""
    for name in ("ml2_anova_f", "ml3_ols_multiple"):
        plan = _plan(spark, name)
        assert "EvalPython" not in plan, name
        assert "SortMergeJoin" not in plan, name
        assert plan.count("Exchange hashpartitioning") <= 2, name


def test_st3_st4_histogram_before_window(spark):
    """Rank statistics must aggregate to the per-value histogram
    BEFORE any unpartitioned window: the window input is |distinct
    values| rows, never the fact table. Guard: the orders join
    broadcasts and no global sort precedes the aggregation."""
    for name in ("st3_mann_whitney_u", "st4_ks_two_sample"):
        plan = _plan(spark, name)
        assert "EvalPython" not in plan, name
        assert "SortMergeJoin" not in plan, name
        assert "BroadcastHashJoin" in plan, name


def test_gr4_bfs_checkpointed_frontier(spark):
    """BFS consumes checkpointed per-hop frontiers (flat lineage) and
    stays JVM-side."""
    plan = _plan(spark, "gr4_bfs_hops")
    assert "EvalPython" not in plan
    assert "ExistingRDD" in plan or "LocalTableScan" in plan


def test_v6_pq_codebook_broadcasts(spark):
    """PQ ADC: the codebook and per-query distance tables ride
    broadcasts; vectors are never shuffled for scoring and nothing
    falls back to Python or sort-merge."""
    plan = _plan(spark, "v6_pq_adc_topk")
    assert "SortMergeJoin" not in plan
    assert "EvalPython" not in plan
    assert "BroadcastHashJoin" in plan


def test_mb1_pair_join_no_cartesian(spark):
    """Association rules: the basket self-join is an equi-join on the
    order key (quadratic only per basket), the one-row totals ride a
    broadcast, and the pair counts partial-aggregate. No cartesian
    product, no Python, top-k without a global sort."""
    plan = _plan(spark, "mb1_association_rules")
    assert "CartesianProduct" not in plan
    assert "EvalPython" not in plan
    assert "TakeOrderedAndProject" in plan
    assert plan.count("HashAggregate") >= 2


def test_cf1_pair_join_no_cartesian(spark):
    """Item-item CF: same co-occurrence shape as mb1 — equi self-join
    on the customer key, never a cross product; norms join the pruned
    pair relation."""
    plan = _plan(spark, "cf1_item_item_cosine")
    assert "CartesianProduct" not in plan
    assert "EvalPython" not in plan
    assert "TakeOrderedAndProject" in plan


def test_ts2_grid_is_generated_not_joined(spark):
    """Gap fill: the hour grid comes from sequence()+explode
    (Generate) inside the plan — no driver loop, no cartesian against
    a calendar table — and both bracketing windows share the user
    partitioning."""
    plan = _plan(spark, "ts2_hourly_gap_fill")
    assert "Generate explode" in plan
    assert "CartesianProduct" not in plan
    assert "EvalPython" not in plan


def test_ts3_single_exchange_integer_frame(spark):
    """Rolling z-score: one user_id exchange feeds the frame window
    and the final per-user aggregate; the 3-sigma test stays in
    integer arithmetic (no Python, no join)."""
    plan = _plan(spark, "ts3_rolling_zscore")
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Join" not in plan
    assert "EvalPython" not in plan


def test_st5_single_pass_sufficient_stats(spark):
    """Welch t: all six sufficient statistics in ONE aggregation over
    one scan — no join, no window, no second pass."""
    plan = _plan(spark, "st5_welch_t_test")
    assert "Join" not in plan
    assert plan.count("Scan parquet") == 1
    assert plan.count("HashAggregate") >= 2


def test_t13_chunk_window_total_order(spark):
    """Chunk dedup: explode is linear (Generate), the only wide
    shuffle carries (chunk, doc_id, ci), and keep-first is a window
    row_number — no self-join, no cartesian."""
    plan = _plan(spark, "t13_chunk_dedup")
    assert "Generate explode" in plan
    assert "CartesianProduct" not in plan
    assert "Join" not in plan
    assert "EvalPython" not in plan


def test_ml5_kmeans_broadcast_centroids_no_python(spark):
    """k-means: every ASSIGN step must broadcast the single-row
    centroid array (BroadcastNestedLoopJoin per iteration) — a
    shuffled join of the corpus against centroids would shuffle the
    fact side per iteration. Argmin is a per-row fold: no Python, no
    sort-merge join anywhere."""
    plan = _plan(spark, "ml5_kmeans")
    assert plan.count("BroadcastNestedLoopJoin") >= 3
    assert "SortMergeJoin" not in plan
    assert "EvalPython" not in plan


def test_ml6_knn_broadcast_queries_group_limit(spark):
    """kNN: the query side broadcasts against the corpus scan and the
    per-query top-k must be a WindowGroupLimit (rank pushed down), not
    a global sort."""
    plan = _plan(spark, "ml6_knn_classify")
    assert "BroadcastNestedLoopJoin" in plan
    assert "WindowGroupLimit" in plan
    assert "SortMergeJoin" not in plan
    assert "EvalPython" not in plan


def test_ml7_nb_broadcast_model(spark):
    """Gaussian NB: the fitted model (|labels| rows of arrays) must
    broadcast to the scoring pass; training is mergeable aggregation —
    no sort-merge join, no Python."""
    plan = _plan(spark, "ml7_gaussian_nb")
    assert "BroadcastNestedLoopJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "EvalPython" not in plan


def test_ml8_stump_single_scan_histogram(spark):
    """Decision stump: both features' histograms come from ONE scan of
    lineitem (in-plan explode, not a self-union of two scans), and the
    split search runs over the tiny histogram relation."""
    plan = _plan(spark, "ml8_decision_stump")
    assert plan.count("Scan parquet") == 1
    assert "SortMergeJoin" not in plan
    assert "EvalPython" not in plan


def test_ml9_logreg_broadcast_model_no_shuffle_join(spark):
    """Logistic GD: each iteration is scan + 3-value aggregate with
    the single-row model broadcast back — no shuffled joins, no
    Python, and no hash-partition exchange at all (scalar aggregates
    only)."""
    plan = _plan(spark, "ml9_logistic_gd")
    assert "SortMergeJoin" not in plan
    assert "EvalPython" not in plan
    assert plan.count("Exchange hashpartitioning") == 0


def test_ml10_pca_single_pass(spark):
    """2-feature PCA: one scan, one partial+final 6-stat aggregate,
    closed-form tail — no joins, no Python."""
    plan = _plan(spark, "ml10_pca_2feature")
    assert "Join" not in plan
    assert "EvalPython" not in plan
    assert plan.count("Scan parquet") == 1


def test_ir1_bm25_postings_filter_and_topk(spark):
    """BM25: the term filter must prune postings before any shuffle,
    the df/stats relations broadcast, and the final cut must be
    TakeOrderedAndProject — no global sort, no Python."""
    plan = _plan(spark, "ir1_bm25_topk")
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "EvalPython" not in plan


def test_d8_semantic_dedup_no_cartesian(spark):
    """Semantic dedup: the pair join must be an equi-join on
    cluster_id (cluster-partitioned pairwise), never a cartesian
    product over the corpus; no Python anywhere."""
    plan = _plan(spark, "d8_semantic_dedup")
    assert "CartesianProduct" not in plan
    assert "EvalPython" not in plan


def test_ml11_lda_single_pass_training(spark):
    """LDA: all 12 sufficient statistics in one scalar aggregation —
    no per-class scans, no shuffled joins, no hash exchange."""
    plan = _plan(spark, "ml11_lda_2feature")
    assert plan.count("Exchange hashpartitioning") == 0
    assert "SortMergeJoin" not in plan
    assert "EvalPython" not in plan


def test_ml12_svm_broadcast_model(spark):
    """SVM subgradient: iteration = scan + 3-value scalar aggregate
    with the single-row model broadcast back; zero hash exchanges."""
    plan = _plan(spark, "ml12_svm_subgradient")
    assert plan.count("Exchange hashpartitioning") == 0
    assert "SortMergeJoin" not in plan
    assert "EvalPython" not in plan


def test_ml13_auc_histogram_before_window(spark):
    """AUC: aggregate to the |distinct score| histogram before the
    unpartitioned rank window — exactly one hash exchange (the
    histogram groupBy); the window sees ~11 rows."""
    plan = _plan(spark, "ml13_roc_auc")
    assert plan.count("Exchange hashpartitioning") == 1
    assert "EvalPython" not in plan


def test_te1_single_stats_pass(spark):
    """Target encoding: the groupBy(category) exchange carries every
    encoder statistic (two plan branches share it — at most 2 hash
    exchanges appear pre-AQE-reuse); the global prior is a broadcast
    scalar, never a shuffled join."""
    plan = _plan(spark, "te1_target_encoding")
    assert plan.count("Exchange hashpartitioning") <= 2
    assert "SortMergeJoin" not in plan
    assert "EvalPython" not in plan


def test_fh1_no_vocabulary_state(spark):
    """Feature hashing: no join against any vocabulary relation —
    bucket assignment is a pure map expression; the only exchanges
    belong to the 32-group (+ distinct-expand) aggregate."""
    plan = _plan(spark, "fh1_feature_hashing")
    assert "Join" not in plan
    assert "EvalPython" not in plan


def test_ml14_two_scans_broadcast_betas(spark):
    """CV ridge: the (fold x lambda) beta table must broadcast-join
    the eval scan (a shuffled join on the 3-value fold key would
    shuffle the fact side); no Python anywhere."""
    plan = _plan(spark, "ml14_cv_ridge")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "EvalPython" not in plan


def test_ml15_gbt_broadcast_splits(spark):
    """Boosted stumps: the chosen split is a single-row broadcast
    back into the residual update (BroadcastNestedLoopJoin);
    histograms aggregate before any window; no Python."""
    plan = _plan(spark, "ml15_gbt_stumps")
    assert plan.count("BroadcastNestedLoopJoin") >= 1
    assert "SortMergeJoin" not in plan
    assert "EvalPython" not in plan


def test_qn1_histogram_broadcasts(spark):
    """Quantile normalization: the global distribution must travel as
    a broadcast histogram array (map-only fold lookup), never a
    shuffled join against a corpus-wide ranked relation; no Python."""
    plan = _plan(spark, "qn1_quantile_normalize")
    assert "BroadcastNestedLoopJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "EvalPython" not in plan


def test_sh1_stitched_shape(spark):
    """Shard assignment in the stitched two-level form: two pruned
    scans (bucket totals + main), the 64-row offsets relation joins
    back as a BROADCAST (never a shuffled join of the corpus), no
    single-task window over documents, no Python."""
    plan = _plan(spark, "sh1_balanced_shards")
    assert plan.count("Scan parquet") == 2
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "EvalPython" not in plan


def test_ml16_qda_single_pass_training(spark):
    """QDA: both classes' 12 moment statistics in one conditional
    scalar aggregation; scoring is broadcast-model map-only — zero
    hash exchanges, no shuffled joins, no Python."""
    plan = _plan(spark, "ml16_qda_2feature")
    assert plan.count("Exchange hashpartitioning") == 0
    assert "SortMergeJoin" not in plan
    assert "EvalPython" not in plan


def test_ml17_bootstrap_pure_expression(spark):
    """Poisson bootstrap: multiplicities are pure expressions (no RNG
    exchange, no join against a resample relation); the only hash
    exchange is the B-group replicate aggregate."""
    plan = _plan(spark, "ml17_poisson_bootstrap")
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Join" not in plan
    assert "EvalPython" not in plan


def test_ml18_conformal_bucketed_order_statistic(spark):
    """Conformal interval: the k-th calibration residual must come
    from the two-phase bucket quantile — a keyed within-bucket window
    after a mergeable bucket histogram, with the target bucket and
    model broadcast — never a global sort of the calibration set; no
    Python."""
    plan = _plan(spark, "ml18_conformal_interval")
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "EvalPython" not in plan


def test_ml19_poly_single_pass_moments(spark):
    """Polynomial regression: the degree-2 fit is one scan of power
    moments — no joins, no feature-matrix materialization, no
    Python."""
    plan = _plan(spark, "ml19_poly_regression")
    assert "Join" not in plan
    assert "EvalPython" not in plan
    assert plan.count("Scan parquet") == 1


def test_ml20_vif_no_per_feature_scans(spark):
    """VIF: all three auxiliary regressions come from one moment
    matrix — no shuffled joins, no hash exchange, no Python."""
    plan = _plan(spark, "ml20_vif")
    assert plan.count("Exchange hashpartitioning") == 0
    assert "SortMergeJoin" not in plan
    assert "EvalPython" not in plan


def test_fs1_mi_broadcast_marginals(spark):
    """Mutual information: marginals broadcast back onto the cell
    histogram — no shuffled joins beyond the cell groupBy, no
    Python."""
    plan = _plan(spark, "fs1_mutual_information")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "EvalPython" not in plan


def test_ml21_grouped_ols_broadcast_dims(spark):
    """Grouped OLS: the nation/supplier dims broadcast into the fact
    scan (j1's shape); |groups| models come from ONE keyed stats
    exchange — no sort-merge join, no Python."""
    plan = _plan(spark, "ml21_grouped_ols")
    assert plan.count("BroadcastHashJoin") >= 2
    assert "SortMergeJoin" not in plan
    assert "EvalPython" not in plan


def test_km1_histogram_before_windows(spark):
    """Kaplan-Meier: the event table aggregates to |distinct days|
    BEFORE the at-risk / log-survival windows; the order join
    broadcasts; no Python."""
    plan = _plan(spark, "km1_survival_curve")
    assert "SortMergeJoin" not in plan
    assert "EvalPython" not in plan


def test_ml22_cp_single_pass(spark):
    """Mallows Cp: the whole nested-model lattice scores from one
    scalar moment aggregate — zero hash exchanges, no shuffled
    joins, no Python."""
    plan = _plan(spark, "ml22_mallows_cp")
    assert plan.count("Exchange hashpartitioning") == 0
    assert "SortMergeJoin" not in plan
    assert "EvalPython" not in plan


def test_gm1_gram_partial_aggregation(spark):
    """Gram matrix: one scan, in-plan pair expansion, partial+final
    aggregation over d(d+1)/2 groups — no joins, no Python."""
    plan = _plan(spark, "gm1_gram_matrix")
    assert plan.count("Scan parquet") == 1
    assert "Join" not in plan
    assert "EvalPython" not in plan
    assert plan.count("HashAggregate") >= 2


def test_cal1_histogram_first(spark):
    """Calibration table: one scan, one groupBy(bin) exchange; the
    global totals are windows over the 11-row histogram."""
    plan = _plan(spark, "cal1_reliability_diagram")
    assert plan.count("Scan parquet") == 1
    assert "Join" not in plan
    assert "EvalPython" not in plan


def test_dr1_psi_conditional_histogram(spark):
    """PSI: both periods' bin counts come from ONE conditional-sum
    histogram (no per-period scans or self-union of the fact table
    beyond the split-point reduction); no shuffled joins."""
    plan = _plan(spark, "dr1_psi_drift")
    assert "SortMergeJoin" not in plan
    assert "EvalPython" not in plan


def test_ec1_gini_ranks_aggregate_not_facts(spark):
    """Gini: the total-order window ranks the per-customer AGGREGATE
    (|customers| rows), never the orders fact table — the groupBy
    exchange precedes the window in the plan."""
    plan = _plan(spark, "ec1_revenue_gini")
    assert plan.count("Exchange hashpartitioning") >= 1
    assert "SortMergeJoin" not in plan
    assert "EvalPython" not in plan


def test_seg1_rfm_ranks_aggregate(spark):
    """RFM: the quintile windows rank the per-customer aggregate
    (groupBy exchange precedes the NTILEs); no shuffled joins, no
    Python."""
    plan = _plan(spark, "seg1_rfm_segmentation")
    assert plan.count("Exchange hashpartitioning") >= 1
    assert "SortMergeJoin" not in plan
    assert "EvalPython" not in plan


def test_ab1_cuped_single_stats_pass(spark):
    """CUPED: theta and both arms' means come from ONE 9-stat
    aggregate over the per-user relation; no shuffled joins, no
    Python."""
    plan = _plan(spark, "ab1_cuped_adjustment")
    assert "SortMergeJoin" not in plan
    assert "EvalPython" not in plan


def test_tp1_threshold_sweep_histogram(spark):
    """Threshold tuning: every candidate threshold evaluates from one
    descending cumulative over the score histogram — one scan, no
    joins, no Python."""
    plan = _plan(spark, "tp1_threshold_tuning")
    assert plan.count("Scan parquet") == 1
    assert "Join" not in plan
    assert "EvalPython" not in plan


def test_pp1_lm_broadcasts(spark):
    """Perplexity filter: the trained bigram/unigram model relations
    must broadcast into the scoring pass (vocabulary-bounded model
    state, corpus side never shuffles for the joins); no Python."""
    plan = _plan(spark, "pp1_perplexity_filter")
    assert plan.count("BroadcastHashJoin") >= 2
    assert "SortMergeJoin" not in plan
    assert "EvalPython" not in plan


def test_wp1_weighted_quantile_histogram(spark):
    """Weighted percentiles: one weight-histogram exchange, the
    percentile probe broadcasts — no fact-table total order, no
    Python."""
    plan = _plan(spark, "wp1_weighted_percentiles")
    assert plan.count("Scan parquet") == 1
    assert "SortMergeJoin" not in plan
    assert "EvalPython" not in plan


def test_oc1_sweep_over_sessions_not_events(spark):
    """Max concurrency: the +1/-1 sweep's total-order window runs
    over session endpoints (sessionization aggregates first); no
    shuffled joins, no Python."""
    plan = _plan(spark, "oc1_max_concurrency")
    assert "SortMergeJoin" not in plan
    assert "EvalPython" not in plan


# ------------------------------------------------------------------
# Stitched ranked-window guards: no total-order window may run over
# an unbounded relation. operators/ranking.py replaces the naive
# Window.orderBy(...) (Exchange SinglePartition over the data) with
# bucket-partitioned windows + one ordering-only window over the
# <= num_buckets bucket-totals relation. These guards parse every
# Window node: a windowspecdefinition with no partition column is
# only allowed over the stitched bucket-totals inputs (__srk_b*).
# ------------------------------------------------------------------

import re as _re

_ORDER_ONLY_SPEC = _re.compile(
    r"windowspecdefinition\(\w+#\d+L? (?:ASC|DESC)")


def _assert_windows_stitched(plan: str, min_bucket_windows: int) -> None:
    nodes = _re.findall(r"Window \[[^\n]+", plan)
    bucket_partitioned = [n for n in nodes
                          if "windowspecdefinition(__srk_bkt#" in n]
    assert len(bucket_partitioned) >= min_bucket_windows, plan
    for n in nodes:
        if _ORDER_ONLY_SPEC.search(n):
            assert "__srk_b" in n, (
                "ordering-only window over a non-bucket-totals relation "
                "(single-task total order at scale): " + n)


def test_sh1_stitched_ntile(spark):
    """Balanced shards: the corpus-wide NTILE must be two-level — a
    hash-range-partitioned rank window plus the tiny bucket-totals
    frame; never a single-task window over all documents."""
    _assert_windows_stitched(_plan(spark, "sh1_balanced_shards"), 1)


def test_ec1_stitched_rank(spark):
    """Gini rank over per-customer revenue: stitched row_number; the
    n/total statistics come from a broadcast 1-row aggregate, not
    unpartitioned COUNT/SUM windows."""
    _assert_windows_stitched(_plan(spark, "ec1_revenue_gini"), 1)


def test_seg1_stitched_quintiles(spark):
    """RFM: all three quintile NTILEs stitched (three bucket-
    partitioned rank windows), no global sorts."""
    _assert_windows_stitched(_plan(spark, "seg1_rfm_segmentation"), 3)


def test_oc1_stitched_sweep(spark):
    """Concurrency sweep: the +1/-1 running sum over session
    endpoints is a stitched cumsum, not a single-task window."""
    _assert_windows_stitched(_plan(spark, "oc1_max_concurrency"), 1)


def test_w10_stitched_relative_ranks(spark):
    """percent_rank/cume_dist over all suppliers: stitched row number
    (supplier grows with SF — the naive form is a single-task global
    sort)."""
    _assert_windows_stitched(_plan(spark, "w10_percent_rank_cume"), 1)


def test_plans_md_covers_headline():
    """Freshness guard for the machine plan audit: PLANS.md must have a
    row for every bench.py headline query, so the audit can never go
    stale when a query is added to the bench (the round-5 gr5 gap).
    Regenerate with `python -m big_data_analytics_spark.tools.plan_report`."""
    import os
    import re
    import bench

    plans = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "PLANS.md")
    rows = set(re.findall(r"^\| (\w+) \|", open(plans).read(), re.M))
    missing = [n for n in bench.HEADLINE + bench.FIXED if n not in rows]
    assert not missing, (
        f"PLANS.md is stale — headline queries without an audit row: "
        f"{missing}. Run python -m big_data_analytics_spark.tools.plan_report")


def test_gr5_anti_join_is_shuffled_hash(spark):
    """gr5's existing-edge anti-join must be a shuffled-hash join on
    (a, b) — the edge relation grows with the data, so a broadcast
    build is a scale-killer (and measured 2x slower at sf0.1); the
    scored side reuses the pair-aggregate partitioning."""
    plan = _plan(spark, "gr5_link_prediction")
    assert "ShuffledHashJoin" in plan, plan
    assert "BroadcastHashJoin" not in plan, plan


def test_gr4_frontier_join_is_shuffled_hash(spark):
    """gr4's per-hop frontier expansion must be a shuffled-hash join
    building the frontier side. Left to statistics, Catalyst
    broadcast the EDGE relation into every hop (the checkpoint's
    propagated estimate slid under the 64 MB threshold; real size
    57 MB at sf0.1, 570 MB at 10x edges — driver OOM). The hop plan
    is asserted directly because the graded query checkpoints each
    hop eagerly, erasing the join from the final plan."""
    from pyspark.sql import functions as F

    from big_data_analytics_spark.queries.graph_queries import (
        _bfs_hop, _edges_by_src)

    edges = _edges_by_src(spark, SF_CORRECT)
    seed = (edges.select(F.col("src").alias("node")).distinct()
            .filter(F.col("node") < 10))
    known = seed.select("node", F.lit(0).alias("hops"))
    hop = _bfs_hop(edges, known.select("node"), known, 1)
    plan = hop._jdf.queryExecution().executedPlan().toString()
    assert "ShuffledHashJoin" in plan, plan
    # the inner frontier join must not broadcast either side; the
    # node-sized anti-join may do as it likes
    inner = plan.split("LeftAnti")[-1]
    assert "BroadcastHashJoin" not in inner, plan
    # r15: the edge side rides the session's src-hash-partitioned
    # cached relation, so the planner must not insert a NEW exchange
    # on src anywhere in the hop (the cached relation's own
    # REPARTITION_BY_NUM lives inside the InMemoryRelation text and
    # does not match the live ENSURE_REQUIREMENTS tag)
    import re
    live_src_ex = re.findall(
        r"Exchange hashpartitioning\(src#[^\n]*ENSURE_REQUIREMENTS", plan)
    assert not live_src_ex, plan


def test_cf1_pair_stage_is_joinless(spark):
    """cf1's pair generation must be the in-basket combination
    generator (one Generate/explode), not a ratings self-join: the
    only joins left in the plan are the two broadcast norm joins on
    the HAVING-pruned pair relation."""
    plan = _plan(spark, "cf1_item_item_cosine")
    assert "Generate explode" in plan, plan
    # the two norm joins only (AQE converts them to broadcast at
    # runtime from actual sizes; the pre-execution plan says SMJ) —
    # a third join would mean the pair self-join came back
    n_joins = (plan.count("SortMergeJoin")
               + plan.count("BroadcastHashJoin")
               + plan.count("ShuffledHashJoin"))
    assert n_joins <= 2, plan


def test_ds1_scoring_is_broadcast_mapside(spark):
    """DSIR candidate scoring: the 256-row bucket score table joins
    broadcast (map-side), the top-k is TakeOrderedAndProject, and no
    Python eval appears anywhere."""
    plan = _plan(spark, "ds1_importance_resampling")
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan
    assert "TakeOrderedAndProject" in plan, plan
    assert "EvalPython" not in plan, plan


def test_bj1_bucketed_join_no_exchange(spark):
    """bj1: both sides of the SortMergeJoin come from bucketed+sorted
    tables on the join key — the plan must contain ZERO exchanges on
    either key (the one-time bucketed write IS the shuffle) and no
    per-task Sort for the join beyond the bucket sort order."""
    plan = _plan(spark, "bj1_bucketed_colocated_join")
    assert "SortMergeJoin" in plan
    assert plan.count("Exchange hashpartitioning(o_custkey") == 0, plan
    assert plan.count("Exchange hashpartitioning(c_custkey") == 0, plan
    assert "SelectedBucketsCount: 8 out of 8" in plan


def test_pr1_scan_prunes_partitions(spark):
    """pr1: the 7-day range must prune at the DIRECTORY level — the
    scan shows PartitionFilters on d and selects only the 7 matching
    of ~30 date partitions (PartitionCount in the FileIndex)."""
    df = REGISTRY["pr1_partition_pruned_scan"].spark_fn(spark, SF_CORRECT)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan
    pf = plan.split("PartitionFilters:")[1][:200]
    assert "d#" in pf or "(d" in pf
    # post-pruning, the FileSourceScan selects exactly the 7 matching
    # date partitions out of the ~30-day span (inputFiles() lists the
    # relation pre-pruning, so go to the scan node itself)
    aqe = df._jdf.queryExecution().executedPlan().collectLeaves().apply(0)
    scan = aqe.initialPlan().collectLeaves().apply(0)
    assert scan.selectedPartitions().partitionCount() == 7


def test_dsk1_reads_minority_of_files(spark):
    """dsk1: the manifest consult must select only the files whose
    min/max shipdate band intersects the 2-month range — ≤3 of the 16
    range-clustered files — and the scan must read exactly those."""
    from big_data_analytics_spark.queries.layout import (
        _SKIP_HI,
        _SKIP_LO,
        _range_clustered_lineitem,
        skip_files_for_range,
    )

    root = _range_clustered_lineitem(spark, SF_CORRECT)
    files = skip_files_for_range(spark, root, _SKIP_LO, _SKIP_HI)
    total = len(list((root / "data").glob("*.parquet")))
    assert total == 16
    assert 1 <= len(files) <= 3, files
    df = REGISTRY["dsk1_minmax_file_skipping"].spark_fn(spark, SF_CORRECT)
    read = {f.removeprefix("file:") for f in df.inputFiles()}
    assert read == set(files)


def test_bp1_pruned_and_exchange_free(spark):
    """The composed layout (date-partitioned + user-bucketed events)
    must show BOTH levers in ONE plan: the 7-day filter prunes to 7
    date directories (PartitionFilters + 7-path file index) and the
    per-user aggregate rides the 8-bucket hash layout with ZERO
    exchanges (partial and final HashAggregate both bucket-local)."""
    import re

    plan = _plan(spark, "bp1_partitioned_bucketed_rollup")
    assert "Exchange" not in plan, plan
    assert "Bucketed: true" in plan, plan
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and ">=" in m.group(1) and "<" in m.group(1), plan
    assert "InMemoryFileIndex(7 paths)" in plan, plan
    assert "SelectedBucketsCount: 8 out of 8" in plan, plan


def test_lp1_fused_step_single_exchange(spark):
    """The broadcast-path LPA round must carry exactly ONE exchange
    (the dst repartition of the joined rows): HashPartitioning(dst)
    satisfies the clustering requirement of both the (dst, label)
    count and the per-dst argmax, so neither aggregation may insert
    its own shuffle. Guards the round-9 fusion (sf0.1 4.78 -> 3.32 s,
    10x 16.51 -> 14.00 s) against an optimizer or refactor silently
    reintroducing the second exchange."""
    from pyspark.sql import functions as F

    from big_data_analytics_spark.operators.graph import _lpa_step
    from big_data_analytics_spark.queries.graph_queries import (
        _weighted_edges)

    edges = _weighted_edges(spark, SF_CORRECT).select("src", "dst")
    # localCheckpoint the label init so its own distinct-exchange does
    # not appear in the inspected round plan
    labels = (edges.select(F.col("src").alias("node")).distinct()
              .select("node", F.col("node").alias("label"))
              .localCheckpoint())
    out = _lpa_step(edges, labels, F.broadcast, fuse=True)
    plan = out._jdf.queryExecution().executedPlan().toString()
    n_ex = plan.count("Exchange hashpartitioning")
    assert n_ex == 1, f"expected 1 hash exchange in the fused round:\n{plan}"
    # and the unfused round really does carry two — the guard is
    # meaningful only if the property distinguishes the variants
    plan0 = (_lpa_step(edges, labels, F.broadcast, fuse=False)
             ._jdf.queryExecution().executedPlan().toString())
    assert plan0.count("Exchange hashpartitioning") == 2, plan0


def test_t15_fused_chain_no_docpair_exchange(spark):
    """t15's fusion property: the explicit repartition(a, b) of the
    bigram relation satisfies the (doc_id, a, b) per-doc count, the
    (a, b) pair re-aggregation, AND the (a, b) score join (the lp1
    subset-key trick), so NO exchange keyed on (doc_id, a, b) — the
    pre-fusion first shuffle — may appear anywhere in the plan, and
    the only doc_id-keyed exchange is the final rollup. (The (a, b)
    exchange prints twice because the docpairs subtree is referenced
    on both sides of the score join; the canonicalized plans are
    identical, so AQE's ReuseExchange serves both from one shuffle.)
    Guards the round-10 fusion (10x best-of-3 10.5 -> 5.9 s) against
    an optimizer or refactor reintroducing the per-stage shuffles."""
    import re

    from big_data_analytics_spark.queries import REGISTRY

    df = REGISTRY["t15_bigram_lm_scores"].spark_fn(spark, SF_CORRECT)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert not re.search(r"hashpartitioning\(doc_id#\d+L?, a#", plan), plan
    n_doc = len(re.findall(r"hashpartitioning\(doc_id#\d+L?,", plan))
    assert n_doc == 1, f"expected only the final doc_id rollup:\n{plan}"


def test_ir3_ir4_no_sortmergejoin(spark):
    """ir3/ir4: the ranked relation is FIXED-size by construction
    (<= |terms| x TOP rows, both constants) and must join broadcast —
    an SMJ here means the data-sized relevance relation is being
    shuffled against a 60-row table (the round-12 plan-audit fix)."""
    for name in ("ir3_mrr_eval", "ir4_map_eval"):
        plan = _plan(spark, name)
        assert "SortMergeJoin" not in plan, name
        assert "ShuffledHashJoin" not in plan, name


def test_t16_window_group_limit_no_joins(spark):
    """t16: the per-language top-64 cut must plan as WindowGroupLimit
    (partition-local pruning before the vocabulary exchange), and the
    whole query is one aggregation chain — any join in the plan means
    the closed-form slope regressed to a self-join formulation."""
    plan = _plan(spark, "t16_zipf_fit")
    assert "WindowGroupLimit" in plan
    assert "Join" not in plan


def test_v10_window_group_limit_stages(spark):
    """v10: both ranking stages must prune partition-locally
    (WindowGroupLimit), and the only join is the broadcast-scalar
    query-set cross — a sort-merge or shuffled-hash join would mean
    the corpus is being exchanged for ranking."""
    plan = _plan(spark, "v10_two_stage_rerank")
    assert "WindowGroupLimit" in plan
    assert "BroadcastNestedLoopJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "ShuffledHashJoin" not in plan


def test_w15_two_phase_distinct_no_expand(spark):
    """w15: both COUNT DISTINCTs must plan two-phase (partial dedup
    before the exchange) and never through Expand; the only join is
    the day-axis DAU/WAU merge (bounded by calendar length)."""
    plan = _plan(spark, "w15_rolling_7d_distinct_users")
    assert plan.count("partial_count(distinct") == 2
    assert "Expand" not in plan
    assert "SortMergeJoin" not in plan


def test_ev3_arrow_kernel_and_jvm_levenshtein(spark):
    """ev3: exactly ONE Arrow-batched python stage (the token-DP
    kernel, MapInPandas) — the char distance and every quantized
    column must stay JVM-side, so a second python eval node means a
    relational column leaked into the kernel. The pair join sides are
    filtered base-scan projections (the stats-reliable class), so no
    pin is asserted."""
    plan = _plan(spark, "ev3_token_edit_distance")
    assert plan.count("MapInPandas") == 1
    assert "levenshtein" in plan  # JVM-side char distance
    assert "BatchEvalPython" not in plan  # no row-at-a-time tier


def test_ev4_overlap_joins_pinned_broadcast(spark):
    """ev4: both char-gram overlap joins ride the measured pin
    (sized_side on the char-count bound) — below the ceiling at the
    plan fixture they must be broadcast, never stats-planned SMJ (the
    audited post-explode underestimate class)."""
    plan = _plan(spark, "ev4_chrf")
    assert "SortMergeJoin" not in plan
    assert "ShuffledHashJoin" not in plan


def test_t17_single_bigram_materialization(spark):
    """t17: the bigram relation is checkpoint-materialized ONCE (all
    three aggregates and the B count read the checkpoint scan — a
    second explode in the plan means the reuse regressed), and both
    vocab-keyed attachments ride the measured pin (broadcast below
    the ceiling)."""
    plan = _plan(spark, "t17_kneser_ney_bigram")
    assert plan.count("Generate explode") == 0  # reads the checkpoint
    assert "SortMergeJoin" not in plan
    assert "ShuffledHashJoin" not in plan


def test_ir5_window_group_limit_and_pinned_anti_join(spark):
    """ir5: the per-term top-K must prune partition-locally
    (WindowGroupLimit — the ir3/o2g shape) and the relevance
    exclusion must plan as a broadcast anti-join at the plan fixture
    (the rel side is measured-pinned on |terms| x docs)."""
    plan = _plan(spark, "ir5_hard_negatives")
    assert "WindowGroupLimit" in plan
    assert "LeftAnti, BuildRight" in plan
    assert "SortMergeJoin" not in plan


def test_gov1_single_aggregation_no_join(spark):
    """gov1: one map-side-combinable aggregation over bounded-
    cardinality derived keys — any join or window in the plan means
    the audit regressed to a per-row formulation."""
    plan = _plan(spark, "gov1_k_anonymity")
    assert plan.count("Exchange") == 1
    assert "Join" not in plan
    assert "Window" not in plan


def test_d10_single_doc_keyed_cut_join(spark):
    """d10: the rewrite adds exactly ONE doc-keyed join over es1's
    detection dataflow (the span-array attachment, measured-pinned)
    and performs the cut as a codegen'd higher-order filter — a
    python eval node or a per-position join means the cut regressed
    out of the JVM."""
    plan = _plan(spark, "d10_exact_substring_cut")
    assert "InPandas" not in plan and "EvalPython" not in plan
    assert "SortMergeJoin" not in plan


def test_t18_in_array_pair_build_no_self_join(spark):
    """t18: the co-occurrence edge build must be the in-array
    window-pair transform (Generate explodes), never a positional
    self-join of the token relation. The pagerank operator
    materializes its rounds, so the RESULT plan only shows the
    rank scan + top-K cut (asserted TakeOrderedAndProject — no
    global sort); the edge-build shape is asserted on the
    pre-pagerank relation, rebuilt here exactly as the query builds
    it."""
    from pyspark.sql import functions as F

    from big_data_analytics_spark.catalog import load_table

    plan = _plan(spark, "t18_textrank_keywords")
    assert "TakeOrderedAndProject" in plan
    assert "InPandas" not in plan and "EvalPython" not in plan

    docs = load_table(spark, SF_CORRECT, "documents").select(
        F.split(F.col("text"), " ").alias("ts"))

    def offs(o):
        return (docs.filter(F.size("ts") > o)
                .select(F.explode(F.expr(
                    f"transform(slice(ts, 1, size(ts) - {o}), "
                    f"(x, i) -> struct(x as a, ts[i + {o}] as b))"))
                    .alias("p"))
                .select("p.a", "p.b"))

    prs = offs(1).union(offs(2))
    edges = (prs.select(F.col("a").alias("src"), F.col("b").alias("dst"))
             .union(prs.select(F.col("b").alias("src"),
                               F.col("a").alias("dst")))
             .groupBy("src", "dst").count())
    eplan = edges._jdf.queryExecution().executedPlan().toString()
    assert "Generate explode" in eplan
    assert "Join" not in eplan  # in-array build, no token self-join


def test_fs2_window_group_limit_pinned_vocab_join(spark):
    """fs2: the per-language top-K must prune partition-locally
    (WindowGroupLimit); the vocab-keyed per-token-totals join rides
    the checkpoint-count pin (broadcast at the fixture, never a
    stats-planned SMJ); per-doc dedup is in-array array_distinct
    (no Expand)."""
    plan = _plan(spark, "fs2_chi2_token_selection")
    assert "WindowGroupLimit" in plan
    assert "SortMergeJoin" not in plan
    assert "Expand" not in plan


def test_gov2_two_level_aggregate_no_expand(spark):
    """gov2: distinct-segment counting must ride the two-level
    groupBy (the first aggregate dedups), never a COUNT DISTINCT
    Expand; no joins anywhere."""
    plan = _plan(spark, "gov2_l_diversity")
    assert "Expand" not in plan
    assert "Join" not in plan
    assert plan.count("Exchange") == 2


def test_v11_unrolled_greedy_no_corpus_recompute(spark):
    """v11: the greedy rounds must read the two localCheckpoint pins
    (candidate + pairwise-sim relations) — a crossJoin or Window over
    the corpus appearing more than once in the final plan means a
    round re-derived the scoring pass. The result plan unions the
    k picks; no python eval."""
    plan = _plan(spark, "v11_mmr_diversified")
    assert "BroadcastNestedLoopJoin" not in plan  # corpus cross not re-run
    assert "InPandas" not in plan and "EvalPython" not in plan
    assert "SortMergeJoin" not in plan


def test_sk7_ksets_take_ordered(spark):
    """sk7: every k-set must cut via TakeOrderedAndProject (no global
    sort of the hash sets) and the sketch-membership joins must
    broadcast the K-row sides."""
    plan = _plan(spark, "sk7_kmv_theta_ops")
    assert "ExistingRDD" in plan or "LocalTableScan" in plan
    # plan of the RESULT is a local relation; assert the k-set shape
    # on the sketch relation built the same way
    from pyspark.sql import functions as F

    from big_data_analytics_spark.catalog import load_table
    from big_data_analytics_spark.queries.sketches import _KMV_K

    ev = load_table(spark, SF_CORRECT, "events")
    h = (F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 12),
                16, 10).cast("long"))
    ks = (ev.filter(F.col("event_type") == "view")
          .select(h.alias("h")).distinct()
          .orderBy(F.asc("h")).limit(_KMV_K))
    kplan = ks._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in kplan
    assert "Sort " not in kplan.replace("TakeOrderedAndProject", "")


def test_dq5_single_aggregate_constant_output(spark):
    """dq5: one combiner aggregation onto <= 9 digit rows; the totals
    attach via a broadcast-scalar cross, never a shuffle join."""
    plan = _plan(spark, "dq5_benford_audit")
    assert "BroadcastNestedLoopJoin" in plan
    assert "SortMergeJoin" not in plan
    assert plan.count("Exchange") <= 4


def test_at2_transition_count_combines_mapside(spark):
    """at2: the one data-sized stage (LEAD + transition count) must
    partial-aggregate; the driver-side solve reads only the bounded
    matrix (result plan is a local relation)."""
    from pyspark.sql import Window, functions as F

    from big_data_analytics_spark.catalog import load_table

    plan = _plan(spark, "at2_markov_journey")
    assert "ExistingRDD" in plan or "LocalTableScan" in plan
    ev = load_table(spark, SF_CORRECT, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    trans = (ev.select("user_id", "event_type", "ts", "event_id")
             .withColumn("d", F.lead("event_type").over(w))
             .filter(F.col("d").isNotNull()
                     & (F.col("event_type") != "purchase"))
             .groupBy(F.col("event_type").alias("s"), "d").count())
    tplan = trans._jdf.queryExecution().executedPlan().toString()
    assert tplan.count("HashAggregate") >= 2


def test_cal2_single_bin_aggregate(spark):
    """cal2: one combiner aggregation onto <= 11 bins; totals and
    terms attach broadcast-scalar; no shuffle joins."""
    plan = _plan(spark, "cal2_brier_decomposition")
    assert "SortMergeJoin" not in plan
    assert "BroadcastNestedLoopJoin" in plan


def test_ts8_pairs_on_daily_rollup_not_events(spark):
    """ts8: the pair self-join must expand the DAILY rollup (bounded
    by calendar length per user), never raw events — the join inputs
    must both be aggregates (partial+final around the rollup), and
    the median is one per-user window."""
    plan = _plan(spark, "ts8_theil_sen_trend")
    assert plan.count("HashAggregate") >= 2
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan \
        or "BroadcastHashJoin" in plan
    assert "InPandas" not in plan and "EvalPython" not in plan


def test_gr10_frontier_join_is_shuffled_hash(spark):
    """gr10: every hop's frontier join must build the bounded
    (seed, node) frontier side via shuffled-hash — a broadcast of the
    growing edge relation is the gr4 failure class. The final plan
    reads the per-hop checkpoints, so the hop shape is asserted on a
    rebuilt first hop."""
    from pyspark.sql import functions as F

    from big_data_analytics_spark.queries.graph_queries import (
        _weighted_edges,
    )

    plan = _plan(spark, "gr10_harmonic_centrality")
    assert "InPandas" not in plan and "EvalPython" not in plan
    edges = _weighted_edges(spark, SF_CORRECT).select("src", "dst")
    seeds = (edges.select(F.col("src").alias("seed")).distinct()
             .filter(F.col("seed") < 10))
    frontier = seeds.select("seed", F.col("seed").alias("src"))
    hop = edges.join(frontier.hint("SHUFFLE_HASH"), "src")
    hplan = hop._jdf.queryExecution().executedPlan().toString()
    assert "ShuffledHashJoin" in hplan
    assert "BuildRight" in hplan


def test_z2_encode_stays_codegen_single_aggregate(spark):
    """z2: the 16-stage Hilbert encode must stay a pure codegen map
    (no python eval, no join, no window) feeding one partial-combined
    aggregation."""
    plan = _plan(spark, "z2_hilbert_keys")
    assert "InPandas" not in plan and "EvalPython" not in plan
    assert "Join" not in plan
    assert plan.count("HashAggregate") >= 2


def test_gov3_broadcast_universe_no_smj(spark):
    """gov3: every relation after the scan is class-proportional; the
    segment universe and the global total must arrive as BROADCAST
    joins (fixed-cardinality sides) and the class x segment left join
    must never fall back to sort-merge — an SMJ here means a
    corpus-proportional shuffle was planned for a bounded relation."""
    plan = _plan(spark, "gov3_t_closeness")
    assert "SortMergeJoin" not in plan
    assert plan.count("BroadcastExchange") >= 2
    assert "Window" not in plan
    assert "InPandas" not in plan and "EvalPython" not in plan


def test_t19_single_explode_broadcast_only(spark):
    """t19: the token explode must run ONCE — the per-(lang, decile,
    token) count relation is localCheckpoint-materialized, so the
    final plan reads an ExistingRDD scan and contains NO Generate at
    all (a Generate here means a rollup re-derived the explode); the
    decile series join is decile-cardinality, never sort-merge."""
    plan = _plan(spark, "t19_heaps_law")
    assert "SortMergeJoin" not in plan
    assert "Generate" not in plan
    assert "ExistingRDD" in plan
    assert "InPandas" not in plan and "EvalPython" not in plan


def test_t20_takeordered_pinned_joins_no_smj_fallback(spark):
    """t20: the global top-K must plan as TakeOrderedAndProject (no
    full sort), the checkpointed unigram relation must arrive via the
    measured pin (ExistingRDD scan), and the scored relation's two
    unigram joins must never fall to an unpinned sort-merge at the
    small fixture."""
    plan = _plan(spark, "t20_pmi_collocations")
    assert "TakeOrderedAndProject" in plan
    assert "ExistingRDD" in plan
    assert "InPandas" not in plan and "EvalPython" not in plan


def test_t20_no_spread_repartition_below_scan(spark):
    """t20 is the measured NEGATIVE datapoint for the under-split
    spread guard (operators/partitioning.py: +3.3 s at sf0.1 for a
    0.35 s 10x gain — cheap per-row explode feeding a map-side
    combine does not qualify), so its plan must contain NO
    round-robin repartition anywhere below the scan. A
    RoundRobinPartitioning exchange appearing here means someone
    re-applied the guard that round 13 measured and reverted."""
    plan = _plan(spark, "t20_pmi_collocations")
    assert "RoundRobinPartitioning" not in plan


def test_spread_guard_fires_where_opted_in(spark):
    """The flip side of the t20 guard: ev3 is the measured POSITIVE
    datapoint (heavy per-row token-edit-distance work; 4-7x at the
    10x fixture), so on the single-file test fixture — where the scan
    arrives under-split — the shared spread_if_undersplit helper must
    still plan its round-robin exchange. Guards the helper migration:
    a silent no-op regression in the shared helper would pass every
    correctness test and only show up as a 10x-fixture slowdown."""
    plan = _plan(spark, "ev3_token_edit_distance")
    assert "RoundRobinPartitioning" in plan


def test_pr_shuffle_step_no_node_broadcast(spark):
    """The SMJ-side guard for the graph iterators (VERDICT r13 task
    4): past the 5M-node broadcast ceiling the shuffle strategy owns
    the plan, and with auto-broadcast disabled (the at-scale stats
    shape) ONE raw PageRank round must contain no BroadcastExchange
    at all — a lingering broadcast of the node universe here is
    exactly the OOM that kills a 1e9-node deployment. Also pins that
    the rank/inflow joins really are shuffled joins, so the guard
    distinguishes the paths rather than passing vacuously."""
    from pyspark.sql import functions as F

    from big_data_analytics_spark.operators.graph import (
        _lpa_step,
        _pr_shuffle_step,
    )
    from big_data_analytics_spark.queries.graph_queries import (
        _weighted_edges)

    edges = _weighted_edges(spark, SF_CORRECT).select("src", "dst")
    deg = edges.groupBy("src").agg(F.count("*").alias("wsum"))
    # checkpoint the inputs so the inspected plan is ONE raw round
    e_deg = edges.join(deg, "src").localCheckpoint()
    nodes_c = (edges.select(F.col("src").alias("node")).distinct()
               .localCheckpoint())
    ranks = nodes_c.select(
        "node", F.lit(1_000_000).cast("long").alias("rank")
    ).localCheckpoint()
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        pr_plan = (_pr_shuffle_step(e_deg, ranks, nodes_c,
                                    "rank div wsum")
                   ._jdf.queryExecution().executedPlan().toString())
        labels = ranks.select("node", F.col("node").alias("label"))
        lpa_plan = (_lpa_step(e_deg, labels, lambda d: d, fuse=False)
                    ._jdf.queryExecution().executedPlan().toString())
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    for tag, plan in (("pagerank", pr_plan), ("lpa", lpa_plan)):
        assert "BroadcastExchange" not in plan, (
            f"{tag} shuffle-path round still broadcasts:\n{plan}")
        assert ("SortMergeJoin" in plan or "ShuffledHashJoin" in plan), (
            f"{tag} shuffle-path round plans no shuffled join — the "
            f"guard would be vacuous:\n{plan}")


def test_gov4_single_aggregate_no_python(spark):
    """gov4 must keep gov1's shape — ONE map-side-combinable
    aggregation over bounded-cardinality class keys, then per-class
    constant work (Knuth hash + the precomputed CASE ladder, all
    codegen'd integer arithmetic): no join, no Expand, no window, no
    Python evaluation, exactly one hash exchange."""
    plan = _plan(spark, "gov4_dp_noisy_counts")
    assert plan.count("Exchange hashpartitioning") == 1, plan
    for bad in ("Join", "Expand", "Window", "InPandas", "EvalPython",
                "Generate"):
        assert bad not in plan, f"unexpected {bad} in gov4 plan:\n{plan}"
