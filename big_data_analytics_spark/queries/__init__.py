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
#: Round-9 head-50: 2 canaries + round-9 new/changed (mm2 whose
#: corpus size was silently rebound by mm9's constant — now fixed and
#: AST-guarded; mm9 whose AVI demux gained the vids-stream pin; mm8
#: whose JPEG marker loop gained fill-byte skipping; sm10 whose
#: scratch dirs gained cleanup; lp1 whose LPA rounds fused two
#: aggregation exchanges into one; and the seven new queries gr6
#: modularity, ir2 NDCG, t14 PMI, ts6 seasonal decomposition, t15
#: bigram-LM scoring, gr7 degree-oriented triangles, ts7 CUSUM, sm11
#: streaming CUSUM) + the entire 24-row r2-vintage backlog (burned
#: this round) + the 11 oldest r3-vintage rows in registry order. The
#: round-10 backlog under the standing rule: the 32 remaining
#: r3-vintage rows (next up in registry order: p20b, p19b, sk1, sk2,
#: t7_vocabulary, ts1, dq1, dq2, t8, pv2, o2g, ws1, sk4, sk5, q2p,
#: q11p, q20p, t9, t10, a20, up1, gi1, gr1, a21, t11, t12, inc1, df1,
#: bpe1, sk6, rc1, at1), then r4 vintage.
#: Everything below the fold re-verifies locally every pytest run via
#: tests/test_queries_vs_duckdb.py.
GRADE_HEAD = [
    # (a) standing canaries — driver-green every round since r1
    "a1_pricing_summary",
    "w7_sessionize_events",
    # (b) round-9 new/changed
    "mm2_frame_samples",
    "mm9_video_frame_sample",
    "mm8_jpeg_roundtrip",
    "sm10_stream_crash_recovery",
    "lp1_part_communities",
    "gr6_modularity",
    "ir2_ndcg_eval",
    "t14_pmi_cooccurrence",
    "ts6_seasonal_decompose",
    "t15_bigram_lm_scores",
    "gr7_triangle_counts",
    "ts7_cusum_changepoint",
    "sm11_stream_cusum",
    # (c) oldest-first: the full 24-row r2-vintage backlog (last
    # driver row in round 2), registry order, no-oracle d2/d3 skipped
    "d4_ngram_jaccard_pairs",
    "aj1_asof_purchase_view",
    "aj2_forward_asof_tolerance",
    "rj1_value_band_join",
    "f13_math_functions",
    "f20_json_extract",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q7_nation_trade_volume",
    "q8_market_share",
    "q9_product_profit",
    "q10_returned_items",
    "q13_order_distribution",
    "q18_large_volume_customers",
    "q21_sole_late_supplier",
    "w8_moving_hour_stats",
    "w9_first_last_nth_order",
    "f22_edit_distance",
    "f23_regexp_extract_all",
    "h1_value_histogram",
    "sa1_ordered_string_agg",
    "g3_grouping_sets",
    "sk3_approx_quantiles",
    "t6_chunk_documents",
    # (c cont.) the 11 oldest r3-vintage rows, registry order
    "ecom_revenue_by_state",
    "ecom_top_products",
    "ecom_clv",
    "ecom_product_daily_metrics",
    "ecom_monthly_sales",
    "ecom_products_enriched",
    "ecom_dwell_times",
    "ecom_page_transitions",
    "ecom_inventory_levels",
    "ij1_view_purchase_pairs",
    "scd1_user_state_history",
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
    )
    missing = [n for n in GRADE_HEAD if n not in REGISTRY]
    if missing:
        raise KeyError(f"GRADE_HEAD names not registered: {missing}")
    ordered = {n: REGISTRY[n] for n in GRADE_HEAD}
    ordered.update((n, q) for n, q in REGISTRY.items() if n not in ordered)
    return ordered
