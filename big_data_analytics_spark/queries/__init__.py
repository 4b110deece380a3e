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
#: references in tests/test_graph.py.
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
#: Round-10 head-50: 2 canaries + round-10 new/changed (the three new
#: queries ir3 MRR/recall eval, gr8 bounded k-core, ev1 ROUGE-N; gr7
#: whose node/edge-sized attachments gained measured pins; ts7 which
#: gained the int64 headroom guard; and the broadcast-audit pin
#: conversions: q14/q16/q19, q5/q7/q8/q9/q21, q20p, ml21, t14, t15,
#: pp1, sm5, ecom_revenue_by_state / ecom_top_products /
#: ecom_inventory_levels) + the 26 oldest r3-vintage rows in registry
#: order (v9 and mm10, late round-10 additions, displaced inc1 and
#: t12 to keep the head at 50). Remaining r3 backlog for round 11:
#: t12, inc1, df1, bpe1, sk6, rc1, at1 — then r4 vintage.
#: Everything below the fold re-verifies locally every pytest run via
#: tests/test_queries_vs_duckdb.py.
GRADE_HEAD = [
    # (a) standing canaries — driver-green every round since r1
    "a1_pricing_summary",
    "w7_sessionize_events",
    # (b) round-10 new
    "ir3_mrr_eval",
    "gr8_kcore",
    "ev1_rouge_n",
    "v9_kcenter_coreset",
    "mm10_scene_cuts",
    # (b cont.) round-10 changed (measured-pin conversions + guards)
    "gr7_triangle_counts",
    "ts7_cusum_changepoint",
    "q14_brand_revenue_share",
    "q19_or_of_ands",
    "q16_supplier_variety",
    "q5_local_supplier_volume",
    "q7_nation_trade_volume",
    "q8_market_share",
    "q9_product_profit",
    "q21_sole_late_supplier",
    "q20p_dominant_part_suppliers",
    "ml21_grouped_ols",
    "t14_pmi_cooccurrence",
    "t15_bigram_lm_scores",
    "pp1_perplexity_filter",
    "sm5_stream_static_enrich",
    "ecom_revenue_by_state",
    "ecom_top_products",
    "ecom_inventory_levels",
    # (c) oldest-first: the 26 oldest r3-vintage rows, registry order
    # (q20p already above with the changed set)
    "p20b_stratified_sample",
    "p19b_hash_split",
    "sk1_hll_distinct_users",
    "sk2_hll_mergeable",
    "t7_vocabulary",
    "ts1_ema_user_value",
    "dq1_profile_lineitem",
    "dq2_referential_integrity",
    "t8_repetition_signals",
    "pv2_unpivot_metrics",
    "o2g_topk_per_group",
    "ws1_weighted_doc_sample",
    "sk4_heavy_hitters",
    "sk5_count_min_tokens",
    "q2p_min_price_per_type",
    "q11p_supplier_revenue_share",
    "t9_sequence_packing",
    "t10_pii_scrub",
    "a20_winsorized_prices",
    "up1_orders_upsert",
    "gi1_activity_islands",
    "gr1_part_pagerank",
    "a21_robust_price_stats",
    "t11_top_bigrams_per_lang",
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
    )
    missing = [n for n in GRADE_HEAD if n not in REGISTRY]
    if missing:
        raise KeyError(f"GRADE_HEAD names not registered: {missing}")
    ordered = {n: REGISTRY[n] for n in GRADE_HEAD}
    ordered.update((n, q) for n, q in REGISTRY.items() if n not in ordered)
    return ordered
