"""Broadcast-vs-shuffle A/B for the graph iterators (VERDICT r13 task 4).

The r13 30x probes established (after the ce73ee0 correction) that
gr1/lp1 had only ever EXECUTED their broadcast paths — the 600k-node
10x/30x universes sit far under the 5M-node ceiling, so the flip
would arrive around x250 on this fixture and the SMJ-side iteration
loops had zero measured datapoints. Building a x250 lineitem to flip
the guard naturally would cost GBs for one number; this tool shrinks
the CEILING instead of growing the DATA: it runs the identical
iteration loops with ``strategy="shuffle"`` (the past-the-ceiling
code path) under ``spark.sql.autoBroadcastJoinThreshold=-1`` (so
neither the planner nor AQE can sneak the node-sized relations back
to broadcast — the at-scale stats shape), asserts the plans actually
flipped, asserts output equality against the broadcast run, and
reports per-round cost.

Run on a QUIET box (the round-13 lesson — concurrent work voids the
timings):

    python -m big_data_analytics_spark.tools.graph_smj_ab \
        [--sf-dir /root/testdata/sf0.1 | --ten-x] [--iterations N]

Results land in SCALE.md's round-14 table.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def _flip_asserted_shuffle_run(spark, fn, edges, iterations, **kw):
    """Run ``fn`` on the shuffle strategy with auto-broadcast disabled;
    returns (result_df, seconds). The per-round plans are checkpointed
    inside the operators, so the flip assertion lives in the raw-round
    plan guard (tests/test_plans.py::test_pr_shuffle_step_no_node
    _broadcast); here we assert the conf actually held for the run."""
    key = "spark.sql.autoBroadcastJoinThreshold"
    old = spark.conf.get(key)
    spark.conf.set(key, "-1")
    try:
        t0 = time.perf_counter()
        out = fn(edges, iterations=iterations, strategy="shuffle", **kw)
        out.write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        assert spark.conf.get(key) == "-1"
    finally:
        spark.conf.set(key, old)
    return out, dt


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--ten-x", action="store_true",
                    help="synthesize/use the 10x lineitem fixture")
    ap.add_argument("--iterations", type=int, default=None,
                    help="rounds per operator (default: gr1/lp1's own)")
    args = ap.parse_args(argv)

    from big_data_analytics_spark.operators.graph import (
        label_propagation,
        pagerank,
    )
    from big_data_analytics_spark.queries.graph_queries import (
        _ITER,
        _LPA_ITER,
        _weighted_edges,
    )
    from big_data_analytics_spark.session import get_spark
    from big_data_analytics_spark.tools.scale_probe import (
        DEFAULT_CACHE,
        BASE_SF,
        synthesize,
    )

    sf_dir = args.sf_dir
    if args.ten_x:
        sf_dir = synthesize(BASE_SF, DEFAULT_CACHE)

    spark = get_spark("graph-smj-ab")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # JVM warm-up

    # edge build (shared cached relation) paid once, outside timings
    edges = _weighted_edges(spark, sf_dir).select("src", "dst")
    n_edges = edges.count()

    rows = []
    for name, fn, iters, kw in (
            ("pagerank", pagerank, args.iterations or _ITER,
             {"assume_distinct": True}),
            ("label_propagation", label_propagation,
             args.iterations or _LPA_ITER, {"assume_distinct": True})):
        # broadcast path first (the graded/benched shape), warm best-of-2
        tb = []
        for _ in range(2):
            t0 = time.perf_counter()
            b_out = fn(edges, iterations=iters, strategy="broadcast", **kw)
            b_out.write.format("noop").mode("overwrite").save()
            tb.append(time.perf_counter() - t0)
        t_b = min(tb)
        ts = []
        for _ in range(2):
            s_out, dt = _flip_asserted_shuffle_run(
                spark, fn, edges, iters, **kw)
            ts.append(dt)
        t_s = min(ts)
        # values must be strategy-invariant — a divergence here means
        # one path computes a different fixed point, not "noise"
        diff = (b_out.exceptAll(s_out).count()
                + s_out.exceptAll(b_out).count())
        rows.append({"op": name, "iterations": iters,
                     "broadcast_s": round(t_b, 2),
                     "shuffle_s": round(t_s, 2),
                     "per_round_delta_s":
                         round((t_s - t_b) / iters, 2),
                     "values_equal": diff == 0})
        print(f"{name}: broadcast {t_b:.2f}s shuffle {t_s:.2f}s "
              f"({iters} rounds, delta {(t_s - t_b) / iters:+.2f}s/round, "
              f"equal={diff == 0})", file=sys.stderr, flush=True)

    print(json.dumps({"sf_dir": sf_dir, "n_edges": n_edges,
                      "results": rows}))
    return 0 if all(r["values_equal"] for r in rows) else 1


if __name__ == "__main__":
    sys.exit(main())
