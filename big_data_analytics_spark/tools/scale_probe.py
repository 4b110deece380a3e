"""Reproducible x10/x100 scale probe (the round-8 audit gate, committed).

Round 8 ran a systematic sf0.01 -> sf0.1 -> 10x-sf0.1 scaling audit
(SCALE.md, "Measured x100 scaling curve") that caught 8 genuine scale
defects, but its fixtures and probe script lived under /tmp.  This module
makes the whole protocol reproducible from a fresh checkout:

    # synthesize the combined 10x fixture set (once; ~1 min, ~200 MB)
    python -m big_data_analytics_spark.tools.scale_probe --synth

    # probe one query at the three scales of the audit curve
    python -m big_data_analytics_spark.tools.scale_probe \
        --query gr4_bfs_hops --scale sf0.01 --scale sf0.1 --scale 10x

Fixture protocol (PERF-ONLY data -- never used in any correctness gate):
ten disjoint copies of every sf0.1 table, with per-copy key offsets of
``copy * (max_key + 1)`` so every FK join fans in realistically instead
of colliding across copies (an offset of ``max_key`` would alias the
last key of copy k with the first of copy k+1):

- customer/orders/lineitem/part/supplier: consistent orderkey / custkey /
  partkey / suppkey offsets, so the join graph is 10 disjoint TPC-H
  instances (6M lineitem, 1.5M orders, 150k customer, 200k part).
- events: per-copy event_id/user_id offsets plus deterministic +-1 s
  timestamp jitter (copy 0 verbatim), preserving the temporal/session
  profile while scaling per-user operator state 10x.
- documents: per-copy doc_id offsets plus a per-copy text suffix, so
  exact-dup cluster structure is preserved *within* copies instead of
  exploding across them.
- embeddings: copy 0 verbatim (the ANN query vectors are unchanged);
  copies 1-9 get vec_id offsets and deterministic per-element jitter,
  planting genuine ~0.999-cosine near-dup pairs for v4/d8 to find.
- nation/region: fixed-cardinality dims, copied unchanged.

Probe protocol: fresh Spark session per invocation, a warm-up job, then
4 timed runs of the registry query's plan into the noop sink -- run 1 is
the cold/index-build cost, warm = best of the remaining 3 (the SCALE.md
convention).  Compare decade ratios (sf0.01 -> sf0.1 -> 10x); a ratio
bending upward across the second decade is the local-mode signature of
a plan that will serialize on a real cluster.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

COPIES = 10
BASE_SF = "/root/testdata/sf0.1"
SCALES = {"sf0.001": "/root/testdata/sf0.001",
          "sf0.01": "/root/testdata/sf0.01",
          "sf0.1": "/root/testdata/sf0.1"}
DEFAULT_CACHE = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), ".scale_cache", "x10")

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def _synth_sql(base: str, copies: int = COPIES) -> dict[str, str]:
    """Per-table DuckDB SELECT producing the 10-copy scaled relation.

    ``c.copy`` ranges over 0..9; offsets are ``copy * (max+1)`` computed
    in a scalar subquery per key domain.  hash() is UINT64 in DuckDB, so
    every jitter expression reduces modulo first and only then casts to
    BIGINT for signed arithmetic (a direct CAST overflows).
    """
    def src(t: str) -> str:
        return f"read_parquet('{base}/{t}.parquet')"

    offs = {
        "order": f"(SELECT max(o_orderkey)+1 FROM {src('orders')})",
        "cust": f"(SELECT max(c_custkey)+1 FROM {src('customer')})",
        "part": f"(SELECT max(p_partkey)+1 FROM {src('part')})",
        "supp": f"(SELECT max(s_suppkey)+1 FROM {src('supplier')})",
        "event": f"(SELECT max(event_id)+1 FROM {src('events')})",
        "user": f"(SELECT max(user_id)+1 FROM {src('events')})",
        "doc": f"(SELECT max(doc_id)+1 FROM {src('documents')})",
        "vec": f"(SELECT max(vec_id)+1 FROM {src('embeddings')})",
    }
    copies_rel = f"(SELECT unnest(range({copies})) AS copy) c"
    return {
        "region": f"SELECT * FROM {src('region')}",
        "nation": f"SELECT * FROM {src('nation')}",
        "customer": f"""
            SELECT c_custkey + c.copy * {offs['cust']} AS c_custkey,
                   c_name, c_nationkey, c_acctbal, c_mktsegment
            FROM {src('customer')}, {copies_rel}""",
        "supplier": f"""
            SELECT s_suppkey + c.copy * {offs['supp']} AS s_suppkey,
                   s_name, s_nationkey, s_acctbal
            FROM {src('supplier')}, {copies_rel}""",
        "part": f"""
            SELECT p_partkey + c.copy * {offs['part']} AS p_partkey,
                   p_name, p_brand, p_type, p_size, p_retailprice
            FROM {src('part')}, {copies_rel}""",
        "orders": f"""
            SELECT o_orderkey + c.copy * {offs['order']} AS o_orderkey,
                   o_custkey + c.copy * {offs['cust']} AS o_custkey,
                   o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
            FROM {src('orders')}, {copies_rel}""",
        "lineitem": f"""
            SELECT l_orderkey + c.copy * {offs['order']} AS l_orderkey,
                   l_partkey + c.copy * {offs['part']} AS l_partkey,
                   l_suppkey + c.copy * {offs['supp']} AS l_suppkey,
                   l_linenumber, l_quantity, l_extendedprice, l_discount,
                   l_tax, l_returnflag, l_linestatus, l_shipdate
            FROM {src('lineitem')}, {copies_rel}""",
        "events": f"""
            SELECT event_id + c.copy * {offs['event']} AS event_id,
                   CASE WHEN c.copy = 0 THEN ts
                        ELSE ts + to_milliseconds(
                            CAST(hash(event_id * 31 + c.copy) % 2001
                                 AS BIGINT) - 1000)
                   END AS ts,
                   user_id + c.copy * {offs['user']} AS user_id,
                   event_type, value, props
            FROM {src('events')}, {copies_rel}""",
        "documents": f"""
            SELECT doc_id + c.copy * {offs['doc']} AS doc_id,
                   CASE WHEN c.copy = 0 THEN text
                        ELSE text || ' #c' || c.copy END AS text,
                   lang, source,
                   CASE WHEN c.copy = 0 THEN n_chars
                        ELSE n_chars + 3 + length(CAST(c.copy AS VARCHAR))
                   END AS n_chars
            FROM {src('documents')}, {copies_rel}""",
        "embeddings": f"""
            SELECT vec_id + c.copy * {offs['vec']} AS vec_id,
                   CASE WHEN c.copy = 0 THEN embedding
                        ELSE CAST(list_transform(embedding, x ->
                            x + (CAST(hash(vec_id * 1000003 + c.copy) % 1000
                                 AS BIGINT) - 500) * 1e-6)
                            AS FLOAT[]) END AS embedding,
                   label
            FROM {src('embeddings')}, {copies_rel}""",
    }


def synthesize(base: str, out_dir: str, force: bool = False,
               copies: int = COPIES,
               tables: list[str] | None = None) -> str:
    """Write the combined ``copies``-copy fixture set under ``out_dir``
    (idempotent; the marker records the exact config). ``tables``
    restricts synthesis to a subset — the ceiling probes only need
    lineitem, and a 30-copy full set costs GBs for nothing."""
    import duckdb

    wanted = TABLES if tables is None else [t for t in TABLES
                                            if t in set(tables)]
    marker = os.path.join(out_dir, ".complete")
    config = f"base={base} copies={copies} tables={','.join(wanted)}\n"
    if (os.path.exists(marker) and not force
            and open(marker).read() == config):
        return out_dir
    os.makedirs(out_dir, exist_ok=True)
    con = duckdb.connect()
    sqls = _synth_sql(base, copies)
    for t in wanted:
        dest = os.path.join(out_dir, f"{t}.parquet")
        con.execute(
            f"COPY ({sqls[t]}) TO '{dest}' (FORMAT PARQUET, "
            f"COMPRESSION SNAPPY)")
        n = con.execute(f"SELECT count(*) FROM '{dest}'").fetchone()[0]
        print(f"  {t}: {n:,} rows -> {dest}", file=sys.stderr)
    with open(marker, "w") as f:
        f.write(config)
    return out_dir


def sweep(sf_dir: str) -> int:
    """Completion sweep: run EVERY registered query end-to-end once at
    ``sf_dir`` in one shared session (the round-8/round-9 '257/257
    zero failures' gate). Not a timing record — one cold run each, in
    registry order; use --query for best-of-N timings. Returns the
    number of failures (process exit code)."""
    from big_data_analytics_spark.queries import load_all
    from big_data_analytics_spark.session import get_spark

    spark = get_spark("scale-sweep")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    reg = load_all()
    failures = []
    t_start = time.time()
    for i, (name, q) in enumerate(reg.items()):
        t0 = time.perf_counter()
        try:
            (q.spark_fn(spark, sf_dir)
             .write.format("noop").mode("overwrite").save())
            print(f"[{i + 1}/{len(reg)}] OK   {name} "
                  f"{time.perf_counter() - t0:.2f}s", flush=True)
        except Exception as e:  # noqa: BLE001 — report and continue
            failures.append(name)
            print(f"[{i + 1}/{len(reg)}] FAIL {name}: "
                  f"{type(e).__name__}: {str(e)[:300]}", flush=True)
    print(f"SWEEP DONE: {len(reg) - len(failures)} ok, "
          f"{len(failures)} fail, {time.time() - t_start:.0f}s total",
          flush=True)
    if failures:
        print("failed:", ", ".join(failures), flush=True)
    return len(failures)


def probe(name: str, sf_dir: str, runs: int = 4) -> dict:
    """Time one registry query against ``sf_dir``; cold + warm best-of-3."""
    from big_data_analytics_spark.session import get_spark
    from big_data_analytics_spark.queries import load_all

    spark = get_spark("scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # JVM warm-up
    q = load_all()[name]
    times = []
    for _ in range(runs):
        t0 = time.perf_counter()
        q.spark_fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        times.append(round(time.perf_counter() - t0, 3))
    return {"query": name, "sf_dir": sf_dir, "cold": times[0],
            "warm": min(times[1:]) if len(times) > 1 else None, "all": times}


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--query", action="append", default=[],
                    help="registry query name (repeatable)")
    ap.add_argument("--scale", action="append", default=[],
                    choices=list(SCALES) + ["10x"],
                    help="scale(s) to probe (default: 10x)")
    ap.add_argument("--base", default=BASE_SF,
                    help="sf dir the 10x fixtures are synthesized from")
    ap.add_argument("--cache", default=DEFAULT_CACHE,
                    help="fixture cache dir (gitignored)")
    ap.add_argument("--runs", type=int, default=4)
    ap.add_argument("--synth", action="store_true",
                    help="only synthesize the 10x fixtures, then exit")
    ap.add_argument("--copies", type=int, default=COPIES,
                    help="fixture copy count (default 10; e.g. 30 pushes "
                         "the part-node universe past the 5M broadcast "
                         "ceiling for the graph-family flip probe)")
    ap.add_argument("--tables", action="append", default=[],
                    help="restrict synthesis to these tables (repeatable)")
    ap.add_argument("--force", action="store_true",
                    help="re-synthesize fixtures even if cached")
    ap.add_argument("--sweep", action="store_true",
                    help="run EVERY registry query once at the first "
                         "--scale (default 10x); exit code = #failures")
    args = ap.parse_args(argv)

    scales = args.scale or ["10x"]
    if args.cache == DEFAULT_CACHE and args.copies != COPIES:
        args.cache = os.path.join(os.path.dirname(DEFAULT_CACHE),
                                  f"x{args.copies}")
    if args.synth or "10x" in scales:
        synthesize(args.base, args.cache, force=args.force,
                   copies=args.copies, tables=args.tables or None)
    if args.synth and not args.query:
        return 0
    if args.sweep:
        sc = scales[0]
        return sweep(args.cache if sc == "10x" else SCALES[sc])
    if not args.query:
        ap.error("--query is required unless --synth or --sweep")
    for name in args.query:
        for sc in scales:
            sf_dir = args.cache if sc == "10x" else SCALES[sc]
            r = probe(name, sf_dir, runs=args.runs)
            print(f"{r['query']} @ {sc}: cold={r['cold']} "
                  f"warm_best3={r['warm']} all={r['all']}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
