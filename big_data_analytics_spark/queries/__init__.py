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
#: Round-8 head-50: 2 canaries + round-8 new/changed (mm8 JPEG,
#: sm10 crash-recovery, bp1 partitioned+bucketed, bj1 whose fixture
#: gained the legacy-dir cleanup, mm4/mm5/mm7 for the pixel
#: dispatcher, the ANN trio v3_ivf / v3_lsh / v7 whose one-off
#: index builds gained the fan-out repartition, gr5 whose pair
#: stage gained the volume-sized exchange, es1 whose k-gram
#: build gained the under-split spread, gr4 whose frontier join
#: is now pinned shuffled-hash, v4 whose signature relation is
#: now built once and spread, fj1 which now collapses to
#: distinct names before the variant join, dq4/d6 whose shared
#: n-gram operator gained the checkpoint+spread, the new cm1/se1
#: storage-maintenance read-backs, and the new mm9 MJPEG-AVI
#: frame-sample row) + the 20 remaining
#: r1-vintage rows + the oldest r2 rows in registry order. The
#: round-9 backlog under the standing rule: the 24 remaining r2 rows
#: (d4, aj1, aj2, rj1, f13, f20, q3, q5, q7, q8, q9, q10, q13, q18,
#: q21, w8, w9, f22, f23, h1, sa1, g3, sk3, t6), then r3 vintage.
#: Everything below the fold re-verifies locally every pytest run via
#: tests/test_queries_vs_duckdb.py.
GRADE_HEAD = [
    # (a) standing canaries — driver-green every round since r1
    "a1_pricing_summary",
    "w7_sessionize_events",
    # (b) round-8 new/changed (mm4/mm5/mm7 re-graded because the
    # resize/dHash pixel path gained the shared JPEG dispatcher)
    "mm8_jpeg_roundtrip",
    "sm10_stream_crash_recovery",
    "bp1_partitioned_bucketed_rollup",
    "bj1_bucketed_colocated_join",
    "mm4_resize_pipeline",
    "mm5_png_roundtrip",
    "mm7_dhash_neardup",
    "v3_lsh_ann_topk",
    "v7_ann_recall",
    "gr5_link_prediction",
    "es1_exact_substring_spans",
    "gr4_bfs_hops",
    "v4_embedding_near_dups",
    "fj1_fuzzy_supplier_names",
    "dq4_ngram_contamination",
    "d6_decontaminate_train",
    "cm1_compaction_rollup",
    "se1_schema_evolution_rollup",
    "mm9_video_frame_sample",
    # (c) oldest-first: the 20 r1-vintage rows (last driver row in
    # round 1), registry order, no-oracle entries (p19/f17) skipped
    "a8_percentiles",
    "p8_null_handling",
    "p13_cast_coercion",
    "f18_array_ops",
    "a15_exists_over_array",
    "f19_map_ops",
    "p6_membership_and_regex",
    "u3_intersect_except",
    "u3b_intersect_all",
    "f11_date_sequence",
    "j5b_rowkey_decompose_join",
    "a19_median_mode",
    "q4_priority_with_late_items",
    "q12_priority_shipping",
    "q14_brand_revenue_share",
    "q19_or_of_ands",
    "q16_supplier_variety",
    "q17_below_avg_quantity",
    "q15_top_suppliers",
    "q22_idle_rich_customers",
    # (c cont.) the 24 oldest r2-vintage rows, registry order,
    # no-oracle entries (d2/d3) skipped
    "d1_exact_dedup",
    "t1_token_counts",
    "t2_quality_scores",
    "t3_language_id",
    "t4_fingerprints",
    "t5_corpus_stats",
    "v1_cosine_topk",
    "v2_label_centroid_norms",
    "v3_ivf_topk",
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
