"""Compaction-layout A/B: Morton (z1) vs Hilbert (z2) on the SAME
size-targeted write job — the missing half of the round-12 locality
argument (VERDICT r12 task 6).

Round 12 established (SCALE.md) that z2's encode costs ~16x z1's and
that Hilbert's pruning advantage appears exactly at non-power-of-4
bucket sizes. This tool closes the loop with one realistic job: write
lineitem clustered by (l_partkey, l_suppkey) both ways at a fixed
file-size target, then run an identical panel of box predicates
against both stores, measuring

- write cost: wall-clock of each full compaction write (encode +
  range shuffle + sort + parquet write), and
- read benefit: files whose parquet FOOTER stats intersect each box
  (the exact planning-time pruning signal, read via pyarrow), plus
  the wall-clock of the predicated Spark scans.

Usage::

    python -m big_data_analytics_spark.tools.layout_ab \
        --sf-dir /root/testdata/sf0.1 --num-files 24

The box panel is deterministic (fixed stride over the key space, 5%
edge per dimension) so runs are comparable across rounds.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import shutil
import tempfile
import time

from pyspark.sql import functions as F

from big_data_analytics_spark.catalog import load_table
from big_data_analytics_spark.operators.zorder import (
    hilbert_write,
    zorder_write,
)
from big_data_analytics_spark.session import get_spark


def _key_ranges(li):
    row = li.agg(
        F.min("l_partkey"), F.max("l_partkey"),
        F.min("l_suppkey"), F.max("l_suppkey")).collect()[0]
    return (row[0], row[1]), (row[2], row[3])


def _boxes(a_range, b_range, n=25, frac=0.05):
    """n deterministic boxes, frac-of-range edge per dimension, lower
    corners strided by coprime multipliers so they spread over the
    space without clustering."""
    (alo, ahi), (blo, bhi) = a_range, b_range
    aw, bw = (ahi - alo) * frac, (bhi - blo) * frac
    out = []
    for i in range(n):
        ax = alo + ((i * 48271) % 1000) / 1000.0 * (ahi - alo - aw)
        bx = blo + ((i * 16807) % 1000) / 1000.0 * (bhi - blo - bw)
        out.append((ax, ax + aw, bx, bx + bw))
    return out


def _stats_boxes(path):
    """(file_box, [row_group_boxes]) per file, where a box is the
    footer (min, max) on both keys — the planning-time pruning signal
    at file granularity (task listing) and row-group granularity
    (parquet reader)."""
    import pyarrow.parquet as pq

    out = []
    for f in sorted(glob.glob(os.path.join(path, "*.parquet"))):
        md = pq.read_metadata(f)
        rgs = []
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            b = {}
            for ci in range(g.num_columns):
                col = g.column(ci)
                st = col.statistics
                if st is None or not st.has_min_max:
                    continue
                if col.path_in_schema in ("l_partkey", "l_suppkey"):
                    b[col.path_in_schema] = (st.min, st.max)
            rgs.append(b)
        out.append(rgs)
    return out


def _hits(stats, box):
    """(files_hit, row_groups_hit) for one box."""
    alo, ahi, blo, bhi = box

    def _isect(b):
        if "l_partkey" not in b or "l_suppkey" not in b:
            return True  # no stats: cannot prune
        (pmin, pmax) = b["l_partkey"]
        (smin, smax) = b["l_suppkey"]
        return pmin <= ahi and pmax >= alo and smin <= bhi and smax >= blo

    fh = rh = 0
    for rgs in stats:
        hit_rgs = sum(1 for b in rgs if _isect(b))
        rh += hit_rgs
        if hit_rgs:
            fh += 1
    return fh, rh


def _scan_time(spark, path, boxes, runs=2):
    best = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        total = 0
        for alo, ahi, blo, bhi in boxes:
            total += (spark.read.parquet(path)
                      .where(F.col("l_partkey").between(alo, ahi)
                             & F.col("l_suppkey").between(blo, bhi))
                      .count())
        best = min(best, time.perf_counter() - t0)
    return best, total


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--num-files", type=int, default=24)
    ap.add_argument("--boxes", type=int, default=25)
    ap.add_argument("--out-dir", default=None,
                    help="scratch dir (default: a TemporaryDirectory)")
    args = ap.parse_args()

    spark = get_spark("layout_ab")
    spark.sparkContext.setLogLevel("ERROR")
    li = load_table(spark, args.sf_dir, "lineitem")
    a_range, b_range = _key_ranges(li)
    boxes = _boxes(a_range, b_range, n=args.boxes)

    scratch = args.out_dir or tempfile.mkdtemp(prefix="layout_ab_")
    zpath = os.path.join(scratch, "z1_morton")
    hpath = os.path.join(scratch, "z2_hilbert")
    try:
        # write A/B — identical job shape, only the curve differs
        t0 = time.perf_counter()
        zorder_write(li, zpath, "l_partkey", "l_suppkey",
                     a_range, b_range, num_files=args.num_files)
        z_write = time.perf_counter() - t0
        t0 = time.perf_counter()
        hilbert_write(li, hpath, "l_partkey", "l_suppkey",
                      a_range, b_range, num_files=args.num_files)
        h_write = time.perf_counter() - t0

        z_stats, h_stats = _stats_boxes(zpath), _stats_boxes(hpath)
        z_fh = z_rh = h_fh = h_rh = 0
        for b in boxes:
            fh, rh = _hits(z_stats, b)
            z_fh, z_rh = z_fh + fh, z_rh + rh
            fh, rh = _hits(h_stats, b)
            h_fh, h_rh = h_fh + fh, h_rh + rh
        z_scan, z_rows = _scan_time(spark, zpath, boxes, runs=3)
        h_scan, h_rows = _scan_time(spark, hpath, boxes, runs=3)
        assert z_rows == h_rows, (z_rows, h_rows)

        print(json.dumps({
            "sf_dir": args.sf_dir,
            "num_files": args.num_files,
            "n_boxes": len(boxes),
            "rows": li.count(),
            "row_groups": [sum(len(r) for r in z_stats),
                           sum(len(r) for r in h_stats)],
            "z1_write_sec": round(z_write, 3),
            "z2_write_sec": round(h_write, 3),
            "z1_hits_files_rowgroups": [z_fh, z_rh],
            "z2_hits_files_rowgroups": [h_fh, h_rh],
            "z1_scan_sec": round(z_scan, 3),
            "z2_scan_sec": round(h_scan, 3),
            "box_rows": z_rows,
        }))
    finally:
        if args.out_dir is None:
            shutil.rmtree(scratch, ignore_errors=True)


if __name__ == "__main__":
    main()
