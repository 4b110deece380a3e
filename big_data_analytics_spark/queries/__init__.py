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
#: Round-6 head-50: 2 canaries + 22 round-6 entries + the 26 oldest
#: r1-vintage rows. The round-7 backlog under this rule: the 20
#: remaining r1 rows (a8, p8, p13, f18, a15, f19, p6, u3, u3b,
#: f11, j5b, a19, q4, q12, q14, q19, q16, q17, q15, q22) then the
#: 35 r2 rows.
#: Everything below the fold re-verifies locally every pytest run via
#: tests/test_queries_vs_duckdb.py.
GRADE_HEAD = [
    # (a) standing canaries — driver-green every round since r1
    "a1_pricing_summary",
    "w7_sessionize_events",
    # (b) round-6 new/changed: the stdlib-zlib PNG round-trip (new);
    # fn1 rewritten onto the exchange-free aggregate; gr5's pair
    # stage rewritten (in-place neighbor arrays + shuffled-hash
    # anti-join); qn1's two-level bounded histogram probe; w10's
    # single-row percent_rank guard; sm6's double-rounding-order fix;
    # oc1 re-graded over the integral-guarded stitched cumsum; cf1's
    # pair stage rewritten onto the same generator shape as gr5.
    # Late round-6 additions: es1 sliding-window exact-substring
    # spans, ivm1 retraction-capable view maintenance, mm7 dHash
    # near-dup banding, sm9 watermark late-data accounting
    "mm5_png_roundtrip",
    "fn1_session_funnel",
    "gr5_link_prediction",
    "qn1_quantile_normalize",
    "w10_percent_rank_cume",
    "sm6_stream_stateful_user_totals",
    "oc1_max_concurrency",
    "cf1_item_item_cosine",
    "ds1_importance_resampling",
    "cc2_canonical_selection",
    "mm6_audio_resample",
    "ts5_acf",
    "es1_exact_substring_spans",
    "ivm1_retractable_view",
    "mm7_dhash_neardup",
    "sm9_stream_late_data_accounting",
    "bj1_bucketed_colocated_join",
    "pr1_partition_pruned_scan",
    "dsk1_minmax_file_skipping",
    "w14_session_window_batch",
    "x13_udtf_chunk_profile",
    "d9_prefix_filter_jaccard",
    # (c) oldest-first: 26 r1-vintage rows (last driver row 5 rounds
    # ago), registry order, no-oracle entries skipped
    "f1_string_functions",
    "f8_date_functions",
    "j1_revenue_by_nation",
    "o1_top_orders_by_revenue",
    "j2_customer_order_stats",
    "j5_customers_with_urgent_orders",
    "j6_customers_without_orders",
    "p4_filter_compound",
    "p11_part_size_buckets",
    "a5_monthly_revenue",
    "a7_order_priority_counts",
    "a9_quantity_moments",
    "a10_corr_regression",
    "a12_event_daily_metrics",
    "u1_union_distinct",
    "p16_ordered_limit",
    "w1_event_lag_delta",
    "w5_customer_running_spend",
    "w4_latest_order_per_customer",
    "wr_rank_functions",
    "j7_regional_supplier_volume",
    "a6_forecast_revenue",
    "a18_large_orders_having",
    "g1_rollup_revenue",
    "g2_cube_counts",
    "pv1_status_pivot",
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
