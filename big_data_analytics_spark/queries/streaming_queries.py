"""Structured Streaming, driver-graded.

The streaming surface (streaming/events.py) was validated only by
stream==batch pytest equivalences; this module gives it a driver row.
``sm1`` runs a REAL incremental execution — file source over a
multi-file copy of the events table, ``maxFilesPerTrigger=1`` so the
aggregation genuinely accumulates state across several micro-batches,
``trigger(availableNow)`` to completion, memory sink — and returns the
final result as a batch DataFrame. Because Structured Streaming's
contract is incrementalized-batch equivalence, the finished stream
must hash-match the plain batch SQL over the same rows, which is
exactly what the DuckDB oracle states.

Scale: the same plan runs unbounded with a Kafka source — the
watermark bounds the aggregation state (late events beyond 1 day are
dropped), partial aggregation happens per micro-batch, and the memory
sink swaps for a Parquet/Delta upsert sink (streaming/events.py:
start_upsert_metrics_sink). availableNow + file-listing is the
backfill mode of the identical query.
"""

from __future__ import annotations

import itertools
import tempfile
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from big_data_analytics_spark.catalog import load_table
from big_data_analytics_spark.queries import query
from big_data_analytics_spark.streaming.events import daily_event_counts

_FIXTURE_ROOT = Path(__file__).resolve().parents[2] / ".fixtures"
_QNAME = itertools.count()


def _events_stream_dir(spark: SparkSession, sf_dir: str) -> Path:
    """A multi-file Parquet copy of the (normalized) events table —
    the replayable file-source directory. Built once per scale; the
    4-way split makes maxFilesPerTrigger=1 produce 4 real
    micro-batches instead of one."""
    root = _FIXTURE_ROOT / f"events_stream_{Path(sf_dir).name}"
    if not (root / "_DONE").exists():
        ev = load_table(spark, sf_dir, "events")
        ev.repartition(4).write.mode("overwrite").parquet(str(root / "data"))
        for crc in root.rglob("*.crc"):
            crc.unlink()
        (root / "_DONE").touch()
    return root


@query(
    "sm1_stream_daily_metrics",
    oracle="""
    SELECT strftime(date_trunc('day', ts), '%Y-%m-%d %H:%M:%S') AS day,
           event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(FLOOR(value * 10000.0 + 0.5) AS BIGINT)) AS DOUBLE)
               / 10000.0 AS value_sum
    FROM events
    GROUP BY 1, 2
    """,
)
def sm1_stream_daily_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-day window × event_type counters computed BY THE
    STREAMING ENGINE: file source (1 file per micro-batch), watermarked
    stateful aggregation accumulating across batches, availableNow to
    completion, memory sink. The returned table is the stream's final
    state and must equal the batch aggregate — the incrementalized-
    batch contract, graded by hash against DuckDB.

    Streaming restatement of the reference's cross-batch Python
    accumulator (/root/reference/load_hbase.py:127-134,191-211), with
    state in the engine and progress in the checkpoint instead of
    driver dicts."""
    root = _events_stream_dir(spark, sf_dir)
    schema = spark.read.parquet(str(root / "data")).schema
    src = (spark.readStream.schema(schema)
           .option("maxFilesPerTrigger", 1)
           .parquet(str(root / "data")))
    qname = f"sm1_mem_{next(_QNAME)}"
    ckpt = tempfile.mkdtemp(prefix="sm1_ckpt_")
    # complete mode: availableNow's final watermark sits 1 day behind
    # max(ts), so append mode would hold back the last open window;
    # complete emits every window's final state.
    q = (daily_event_counts(src).writeStream
         .format("memory").queryName(qname)
         .outputMode("complete")
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()
    return spark.table(qname).select(
        F.date_format("day", "yyyy-MM-dd HH:mm:ss").alias("day"),
        "event_type", "n_events", "value_sum")
