"""Query registry: every implemented operator from SURVEY.md §2 gets a
named entry pairing a Spark DataFrame implementation with (where
SQL-expressible) an equivalent DuckDB oracle SQL string.

The driver harness (__spark_entry__.py) exposes this registry through
``queries()`` / ``oracle_sql()``; tests/test_queries_vs_duckdb.py runs
the same comparison locally.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class Query:
    name: str
    spark_fn: Callable[[SparkSession, str], DataFrame]
    oracle: Optional[str]  # DuckDB SQL, or None for non-SQL-expressible ops
    doc: str


REGISTRY: dict[str, Query] = {}  # insertion-ordered; see load_all


def query(name: str, oracle: Optional[str] = None):
    """Register a (spark_fn, oracle_sql) pair under ``name``."""
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = Query(name, fn, oracle, (fn.__doc__ or "").strip())
        return fn
    return deco


#: PRE-COMMIT GATE (standing rule, encoded after the round-7 unrun
#: test and round-8 unrun oracle-gate incidents): before ANY commit
#: that touches a module under ``queries/`` — adding a query, editing
#: one, or changing a shared helper it calls — run that module's full
#: oracle gate, not just the new query's test:
#:     pytest tests/test_queries_vs_duckdb.py -k <module-stem> -q
#: (~1 min/module). A new query exercised only by its own ``-k name``
#: run can still break a sibling in the same module (the mm9 commit
#: rebound mm2's module constant: oracle f-strings bind constants at
#: decoration time, bodies read them at call time — see
#: tests/test_module_constant_guard.py). Shared-helper edits gate
#: every consumer module.
#: ADDITIONALLY (round-11 lesson, the gr9/README incident): any commit
#: that ADDS or REMOVES a registry entry must also run the repo-level
#: guard tests — ``pytest tests/test_bench_output.py -q`` (~2 s) —
#: because README.md advertises the registry/oracle counts and
#: test_readme_registry_counts_match fails the suite when they drift.
#: The oracle gate alone does not cover these guards.
#:
#: ORACLE INDEPENDENCE (round-9 lesson, the gr7 incident): when an
#: oracle restates the implementation's ALGORITHM rather than the
#: problem, a shared bug passes the hash gate — gr7's first wedge
#: formulation dropped half of all triangles on BOTH sides (an
#: id-order corner filter against a (degree, id)-oriented closing
#: edge) and hash-matched green. Any query whose oracle mirrors a
#: non-trivial derivation (an orientation, an index, a closed form)
#: needs ONE independent check that states the problem differently —
#: gr7's is a pure id-canonical recount with no orientation at all
#: (tests/test_graph.py::test_gr7_matches_id_canonical_ground_truth);
#: sm11's closed-form oracle is independent of the streamed recursion
#: by construction; the codec queries' closed-form generation
#: formulas are the same idea. Round-9 audit of the other mirrored
#: oracles added imperative third implementations for es1
#: (tests/test_text5_groundtruth.py), gr5 and ts2
#: (tests/test_graph.py, tests/test_ts2_groundtruth.py), and gi1
#: (tests/test_gi1_groundtruth.py); fj1/d9
#: already oracle against the brute-force definition, ivm1 against a
#: full recompute, and the iterative graph ops against pure-python
#: references in tests/test_graph.py. Round-10 additions recount in
#: tests/test_r10_groundtruth.py; round-12 (ir4/ev2/t16/v10/w15) in
#: tests/test_r12_groundtruth.py (mm11's oracle is independent by
#: construction — closed-form generation schedule vs real decode);
#: the round-12 late batch (ev3/ev4/t17/ir5/gov1/gov2/d10/t18/fs2)
#: and v11 in tests/test_r12b_groundtruth.py — ev3's oracle is additionally
#: independent by construction (coded-string byte levenshtein vs
#: numpy DP), as is sm12's (batch SQL restatement vs the engine's
#: chained incremental execution, the sm2/sm11 class). Round-13
#: additions (gov3 exact-Fraction TVD, t19 literal cumulative
#: vocabulary scan, t20 Counter-based PMI) recount in
#: tests/test_r13_groundtruth.py.
#:
#: The driver harness grades registry entries head-first (exactly the
#: first 50 each round), so ordering is the grading policy. With the
#: never-graded backlog cleared in round 5, the STANDING ROTATION RULE
#: from round 6 on is: (a) the two canaries, (b) every query written
#: or whose implementation changed this round (graded immediately),
#: (c) the remaining slots filled OLDEST-FIRST — the registered
#: queries whose most recent driver row is the most rounds stale, in
#: registry order, skipping the four declared no-oracle queries
#: (d2/d3/p19/f17 — each already has a green graded deterministic
#: twin; a head slot on a rows-only check refreshes nothing).
#: Round-13 head-50 (THE BACKLOG-BURN ROUND, per VERDICT r12 task 1):
#: 2 canaries + 3 new (gov3 t-closeness, t19 Heaps-law fit, t20 PMI
#: collocations) + 2
#: changed (fs2 per-factor guard, dq5 Benford integer literals — the
#: two r12 ADVICE items) + the deferred backlog: all 7 r3-vintage
#: rows (sk6, t12, inc1, df1, rc1, at1, bpe1), all 5 pin-only
#: re-grades (j2, t8, ivm1, ts2, d3b), and 32 of the 34 r4-vintage
#: rows (v5 .. ml4; t13/x11/x12 displaced by the three new queries,
#: lead the round-14 oldest-first fill). New-query count was kept
#: small by design so the burn completes; after this round the
#: oldest driver-row vintage on the tree is r4 (three rows), then
#: r5.
GRADE_HEAD = [
    # (a) standing canaries — driver-green every round since r1
    "a1_pricing_summary",
    "w7_sessionize_events",
    # (b) round-13 new/changed: gov3 completes the k/l/t privacy
    # trio; fs2/dq5 are the two ADVICE hardening fixes (fs2's
    # per-factor zero-margin guard replaces an int64 margin product
    # that overflowed past ~1e5 docs; dq5's Benford shares are now
    # Python-precomputed integer literals on both engines) — graded
    # immediately per policy
    "gov3_t_closeness",
    "t19_heaps_law",
    "t20_pmi_collocations",
    "fs2_chi2_token_selection",
    "dq5_benford_audit",
    # (c) THE BACKLOG BURN — round 13 adds few queries by design so
    # the freshness debt actually clears (VERDICT r12 task 1).
    # First the 7 r3-vintage rows (oldest driver evidence on the
    # tree):
    "sk6_hll_intersection",
    "t12_token_entropy",
    "inc1_incremental_rollup",
    "df1_snapshot_diff",
    "rc1_hierarchy_rollup",
    "at1_time_decay_attribution",
    "bpe1_merge_steps",
    # then the 5 pin-only re-grades (plan changed in r12's broadcast
    # audit, results identical, locally gate-verified — now getting
    # their post-pin driver row):
    "j2_customer_order_stats",
    "t8_repetition_signals",
    "ivm1_retractable_view",
    "ts2_hourly_gap_fill",
    "d3b_simhash_portable",
    # then the r4-vintage rows, oldest-first in registry order
    # (31 slots — the r12 deferral note's r4 list minus t13/x11/x12,
    # displaced by the three round-13 additions):
    "v5_sq_topk",
    "v6_pq_adc_topk",
    "sql1_revenue_by_state_sqlapi",
    "w11_session_duration_percentiles",
    "w12_cumulative_distinct_users",
    "bm1_bitmap_segment_intersect",
    "ws2_reservoir_per_group",
    "gr2_triangle_count",
    "gr3_weighted_pagerank",
    "a22_corr_matrix",
    "st1_chi_square_independence",
    "st2_ab_test_proportions",
    "ml1_ols_inference",
    "st3_mann_whitney_u",
    "ml2_anova_f",
    "st4_ks_two_sample",
    "ml3_ols_multiple",
    "bpe2_encode",
    "mm1_media_stats",
    "z1_zorder_keys",
    "mx1_mixture_budgets",
    "sj1_salted_skew_join",
    "cp1_corpus_clean_audit",
    "bl1_bloom_semi_join",
    "sm1_stream_daily_metrics",
    "sm2_stream_sessions",
    "sm3_stream_dedup_ingest",
    "sm4_stream_stream_join",
    "ts3_rolling_zscore",
    "st5_welch_t_test",
    "ml4_ridge_regression",
    # (t13, x11 and x12, the youngest r4 rows, are displaced by the
    # three round-13 additions per the rotation note above and lead
    # the round-14 oldest-first fill)
]


def load_all() -> dict[str, Query]:
    """Import all query modules, then return the registry reordered so
    the graded head-50 (``GRADE_HEAD``) comes first; everything else
    keeps registration order below the fold."""
    from big_data_analytics_spark.queries import (  # noqa: F401
        text,
        similarity,
        ecommerce_shaped,
        dedup_queries,
        temporal,
        sampling,
        scalar_funcs2,
        tpch_extra2,
        windows2,
        funcs2,
        sketches,
        text2,
        scalar_funcs,
        relational,
        windows,
        relational2,
        tpch_extra,
        tpch_extra3,
        timeseries_queries,
        quality,
        reshape,
        funnels,
        sampling2,
        cleaning,
        fuzzy,
        cdc,
        graph_queries,
        robust,
        text3,
        multimodal_queries,
        zorder_queries,
        mixing,
        skew_queries,
        corpus_queries,
        bloom_queries,
        clustering_queries,
        streaming_queries,
        market,
        timeseries2,
        stats_ext,
        text4,
        text5,
        text6,
        layout,
        udf_queries,
        ml_queries,
        retrieval,
        semantic_dedup,
        ml_prep,
        normalize,
        monitoring,
        ann_eval,
        evals,
        governance,
    )
    missing = [n for n in GRADE_HEAD if n not in REGISTRY]
    if missing:
        raise KeyError(f"GRADE_HEAD names not registered: {missing}")
    ordered = {n: REGISTRY[n] for n in GRADE_HEAD}
    ordered.update((n, q) for n, q in REGISTRY.items() if n not in ordered)
    return ordered
