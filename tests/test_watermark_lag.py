"""Pins Spark's empirical watermark lags DIRECTLY, via
StreamingQueryProgress, on a tiny hand-built fixture.

sm9's oracle (queries/streaming_queries.py) encodes engine
internals measured empirically on pyspark 4.x. Probed 3x on a
4-batch file stream (this fixture), the behavior is:

- `progress[k].eventTime.watermark` REPORTS the watermark computed
  from event-time stats through batch k-1, minus the delay (a
  one-batch lag in the reported value; batch 0 reports epoch zero).
- The LATE-ROW FILTER in micro-batch k uses the watermark reported
  in progress[k-1] — i.e. stats through batch k-2 (the watermark in
  effect at batch start was advanced using the PREVIOUS batch's
  commit, which itself saw stats through k-2).
- EMISSION (append-mode window finalization) at the end of batch k
  uses the value reported in progress[k] — stats through batch k-1.
- `trigger(availableNow=True)` runs one trailing NO-INPUT batch
  after the last file, whose watermark (stats through the final
  file) finalizes one more round of windows.

A Spark minor-version bump can legally change any of these and
would flip sm9's hash with no code change and no diagnosis. This
test asserts the lags on a 7-row synthetic stream so a behavior
change fails HERE, with a message naming the pin, instead of as an
opaque sm9 mismatch.

Fixture (event times EVBASE + t seconds, 60 s windows, 25 s delay;
EVBASE is a multiple of 60 so windows align at EVBASE + k*60):
  batch0: t 100, 130          -> max 130
  batch1: t 260               -> max 260
  batch2: t 400, 70, 200      -> max 400   (70 and 200 are LATE)
  batch3: t 520               -> max 520
  batch4: (trailing availableNow finalization batch, no input)

Reported watermark at batch k (max t through k-1, minus 25):
  [epoch0, 105, 235, 375, 495]
Emissions per batch (windows with end <= reported wm, new only):
  [0, 0, 2, 2, 1]   -> windows 60,120 | 180,240 | 360

The discriminator is t=70 in batch2 (window [60,120), end 120):
under the two-batch FILTER lag (wm 105 < 120) it is ACCEPTED and
window-60 emits with count 2; if the filter used the value reported
for batch2 itself (235 > 120) it would be dropped and the count
would be 1. Window [480,540) (end 540 > 495) never finalizes.
"""

from __future__ import annotations

import datetime as dt
import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

DELAY_S = 25
# multiple of 60 so 60 s windows start at EVBASE + k*60
EVBASE = 1_699_999_980
BATCHES = [[100, 130], [260], [400, 70, 200], [520]]
N_PROGRESS = len(BATCHES) + 1  # + trailing availableNow batch


def _iso_to_epoch(s: str) -> float:
    return dt.datetime.fromisoformat(s.replace("Z", "+00:00")).timestamp()


@pytest.fixture(scope="module")
def lag_probe(spark):
    data = tempfile.mkdtemp(prefix="wmlag_data_")
    ckpt = tempfile.mkdtemp(prefix="wmlag_ckpt_")
    try:
        # one file per batch, strictly increasing mtimes: stamp ONLY
        # files not yet seen (seen-set pattern, as
        # _events_stream_dir_redelivery in streaming_queries.py does
        # — re-stamping everything would collapse the mtimes and let
        # the file source replay batches in random part-file order)
        seen: set[str] = set()
        mtbase = 1_800_000_000
        for step, tss in enumerate(BATCHES):
            df = spark.createDataFrame(
                [(EVBASE + t,) for t in tss], "sec bigint"
            ).select(F.timestamp_seconds("sec").alias("ts"))
            df.coalesce(1).write.mode("append").parquet(data)
            now = {f for f in os.listdir(data) if f.endswith(".parquet")}
            for f in now - seen:
                p = os.path.join(data, f)
                os.utime(p, (mtbase + step, mtbase + step))
            seen = now

        schema = spark.read.parquet(data).schema
        src = (spark.readStream.schema(schema)
               .option("maxFilesPerTrigger", 1).parquet(data))
        agg = (src.withWatermark("ts", f"{DELAY_S} seconds")
               .groupBy(F.window("ts", "60 seconds").alias("w"))
               .agg(F.count(F.lit(1)).alias("n")))
        q = (agg.select(
                (F.unix_timestamp("w.start") - EVBASE).alias("wstart"), "n")
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


def test_reported_watermark_lags_one_batch(lag_probe):
    """progress[k].eventTime.watermark must equal max event time
    through batch k-1 minus the delay (epoch zero before any commit).
    The late-row FILTER of batch k uses progress[k-1]'s value — i.e.
    stats through k-2 — which test_late_row_admitted pins below."""
    progress, _ = lag_probe
    assert len(progress) == N_PROGRESS, (
        f"expected {N_PROGRESS} micro-batches ({len(BATCHES)} files + "
        f"1 trailing availableNow finalization batch), got "
        f"{len(progress)} — Spark's availableNow batching has changed; "
        "re-derive sm9's oracle pin in queries/streaming_queries.py.")
    expected = [None, 130 - DELAY_S, 260 - DELAY_S,
                400 - DELAY_S, 520 - DELAY_S]
    got = []
    for p in progress[:N_PROGRESS]:
        wm = (p.eventTime or {}).get("watermark")
        got.append(None if wm is None or wm == "1970-01-01T00:00:00.000Z"
                   else _iso_to_epoch(wm) - EVBASE)
    assert got == expected, (
        f"reported watermark per batch changed: got {got}, expected "
        f"{expected} (max event time through batch k-1, minus "
        f"{DELAY_S}s). Spark's watermark reporting lag has changed — "
        "update sm9's oracle pin in queries/streaming_queries.py.")


def test_emission_watermark_lags_one_batch(lag_probe):
    """Append-mode finalization at batch k uses the watermark
    reported in progress[k] (stats through k-1): windows [60,120)
    and [120,180) emit in batch 2 (wm 235), [180,240) and [240,300)
    in batch 3 (wm 375), and the trailing no-input batch 4 (wm 495)
    finalizes [360,420). [480,540) (end 540 > 495) never emits."""
    progress, rows = lag_probe
    emitted = [p.sink.numOutputRows for p in progress[:N_PROGRESS]]
    assert emitted == [0, 0, 2, 2, 1], (
        f"per-batch append emissions changed: got {emitted}, expected "
        "[0, 0, 2, 2, 1] (finalization watermark = stats through batch "
        "k-1, plus one trailing availableNow batch). Spark's emission "
        "watermark lag has changed — update sm9's oracle pin in "
        "queries/streaming_queries.py.")
    assert set(rows) == {60, 120, 180, 240, 360}, rows


def test_late_row_admitted_under_two_batch_filter_lag(lag_probe):
    """The t=70 row arriving in batch 2 (window end 120 > filter wm
    105 = stats through batch 0) must be COUNTED: window-60 emits
    n=2. If the filter used batch 2's own reported watermark (235)
    it would be dropped (n=1)."""
    _, rows = lag_probe
    assert rows[60] == 2, (
        f"window [60,120) count {rows[60]} != 2: the late t=70 row "
        "was dropped, i.e. the late filter no longer lags two "
        "batches behind event-time stats — sm9's oracle pin in "
        "queries/streaming_queries.py must be updated.")
    assert rows == {60: 2, 120: 1, 180: 1, 240: 1, 360: 1}, rows
