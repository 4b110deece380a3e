"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
one JSON line with per-query wall-clock seconds.

Each query executes end-to-end into the no-op sink (full plan runs
JVM-side; nothing is collected to the driver beyond metrics).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from big_data_analytics_spark.queries import load_all
from big_data_analytics_spark.session import get_spark

#: Headline queries: one per major plan shape (scan-agg, join-agg,
#: top-k, outer join, window, sessionization, text, vector search).
HEADLINE = [
    "a1_pricing_summary",
    "j1_revenue_by_nation",
    "o1_top_orders_by_revenue",
    "j2_customer_order_stats",
    "a12_event_daily_metrics",
    "w5_customer_running_spend",
    "w7_sessionize_events",
    "j7_regional_supplier_volume",
    "d1_exact_dedup",
    "d2_minhash_lsh_pairs",
    "d3_simhash_pairs",
    "t5_corpus_stats",
    "v1_cosine_topk",
    "v3_ivf_topk",
    "aj1_asof_purchase_view",
    "fn1_session_funnel",
    "t7_vocabulary",
    "ecom_clv",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")
    # warm up the JVM/codegen/parquet-reader paths so per-query numbers
    # measure the queries, not session startup (region = 5 rows; does
    # not pre-cache any fact-table data)
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.read.parquet(os.path.join(sf_dir, "region.parquet")).collect()

    registry = load_all()
    timings: dict[str, float] = {}
    for name in HEADLINE:
        q = registry[name]
        # best of 2: the first run pays one-off costs (file listing,
        # codegen compile, fixture generation) that aren't the query
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            q.spark_fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)

    total = round(sum(timings.values()), 3)
    print(json.dumps({
        "metric": "headline_queries_total_wall_clock",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }))


if __name__ == "__main__":
    main()
