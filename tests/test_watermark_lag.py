"""Pins Spark's empirical two-batch watermark lag DIRECTLY, via
StreamingQueryProgress, on a tiny hand-built fixture.

sm9's oracle (queries/streaming_queries.py) encodes two engine
internals measured empirically on pyspark 4.x:

- the LATE-ROW FILTER in micro-batch k uses the watermark computed
  from event-time stats through batch k-2 (the watermark in effect at
  batch start was advanced using the PREVIOUS batch's commit, which
  itself saw stats through k-2), and
- EMISSION (append-mode window finalization) at the end of batch k
  uses stats through batch k-1 — and with no batch after the last
  file, the final batch's own stats never finalize anything.

A Spark minor-version bump can legally change either lag and would
flip sm9's hash with no code change and no diagnosis. This test
asserts the lag on a 4-row-per-batch synthetic stream so a behavior
change fails HERE, with a message naming the pin, instead of as an
opaque sm9 mismatch.

Fixture (epoch-second event times, 60 s windows, 25 s delay):
  batch0: ts 100, 130          -> max 130
  batch1: ts 260               -> max 260
  batch2: ts 400, 70, 200      -> max 400   (70 and 200 are LATE)
  batch3: ts 520               -> max 520

Filter watermark at batch k  (max ts through k-2, minus 25):
  [none, none, 105, 235]
Emission watermark at batch k (max ts through k-1, minus 25):
  [none, 105, 235, 375]

The discriminator is ts=70 in batch2 (window [60,120), end 120):
under the two-batch filter lag (wm 105 < 120) it is ACCEPTED and
window-60 emits with count 2; under a one-batch lag (wm 235) it
would be dropped and the count would be 1.
"""

from __future__ import annotations

import datetime as dt
import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

DELAY_S = 25
BATCHES = [[100, 130], [260], [400, 70, 200], [520]]


def _iso_to_epoch(s: str) -> float:
    return dt.datetime.fromisoformat(s.replace("Z", "+00:00")).timestamp()


@pytest.fixture(scope="module")
def lag_probe(spark):
    data = tempfile.mkdtemp(prefix="wmlag_data_")
    ckpt = tempfile.mkdtemp(prefix="wmlag_ckpt_")
    try:
        base = 1_700_000_000
        for step, tss in enumerate(BATCHES):
            df = spark.createDataFrame(
                [(t,) for t in tss], "sec bigint"
            ).select(F.timestamp_seconds("sec").alias("ts"))
            df.coalesce(1).write.mode("append").parquet(data)
            # one file per batch, strictly increasing mtimes
            files = sorted(
                f for f in os.listdir(data) if f.endswith(".parquet"))
            for f in files:
                p = os.path.join(data, f)
                if os.path.getmtime(p) > base:
                    os.utime(p, (base + step, base + step))

        schema = spark.read.parquet(data).schema
        src = (spark.readStream.schema(schema)
               .option("maxFilesPerTrigger", 1).parquet(data))
        agg = (src.withWatermark("ts", f"{DELAY_S} seconds")
               .groupBy(F.window("ts", "60 seconds").alias("w"))
               .agg(F.count(F.lit(1)).alias("n")))
        q = (agg.select(F.unix_timestamp("w.start").alias("wstart"), "n")
             .writeStream.format("memory").queryName("wmlag")
             .outputMode("append")
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination()
        progress = [p for p in q.recentProgress]
        rows = {r.wstart: r.n for r in spark.table("wmlag").collect()}
        yield progress, rows
    finally:
        shutil.rmtree(data, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)


def test_filter_watermark_lags_two_batches(lag_probe):
    """progress[k].eventTime.watermark (the value rows are filtered
    against during batch k) must equal max-event-time through batch
    k-2 minus the delay."""
    progress, _ = lag_probe
    data_batches = [p for p in progress
                    if p.numInputRows > 0 or p.batchId < len(BATCHES)]
    assert len(data_batches) >= len(BATCHES)
    expected = [None, None, 130 - DELAY_S, 260 - DELAY_S]
    got = []
    for p in data_batches[: len(BATCHES)]:
        wm = (p.eventTime or {}).get("watermark")
        got.append(None if wm is None or wm.startswith("1970")
                   else _iso_to_epoch(wm))
    assert got == expected, (
        f"watermark-in-effect per batch changed: got {got}, expected "
        f"{expected} (max event time through batch k-2, minus "
        f"{DELAY_S}s). Spark's two-batch late-filter watermark lag "
        "has changed — update sm9's oracle pin in "
        "queries/streaming_queries.py accordingly.")


def test_emission_watermark_lags_one_batch(lag_probe):
    """Append-mode finalization at batch k uses stats through k-1:
    window [60,120) and [120,180) emit in batch 2 (wm 235), windows
    [180,240) and [240,300) in batch 3 (wm 375); the final batch's
    own stats finalize nothing (no batch after the last file)."""
    progress, rows = lag_probe
    emitted = [p.sink.numOutputRows
               for p in progress[: len(BATCHES)]]
    assert emitted == [0, 0, 2, 2], (
        f"per-batch append emissions changed: got {emitted}, expected "
        "[0, 0, 2, 2] (finalization watermark = stats through batch "
        "k-1). Spark's emission watermark lag has changed — update "
        "sm9's oracle pin in queries/streaming_queries.py.")
    # windows [360,420) and [480,540) must NOT have been finalized
    assert set(rows) == {60, 120, 180, 240}, rows


def test_late_row_admitted_under_two_batch_lag(lag_probe):
    """The ts=70 row arriving in batch 2 (window end 120 > filter wm
    105) must be COUNTED: window-60 emits n=2. Under a one-batch
    filter lag (wm 235) it would be dropped (n=1)."""
    _, rows = lag_probe
    assert rows[60] == 2, (
        f"window [60,120) count {rows[60]} != 2: the late ts=70 row "
        "was dropped, i.e. the late filter no longer lags two "
        "batches — sm9's oracle pin must be updated.")
    assert rows == {60: 2, 120: 1, 180: 1, 240: 1}, rows
