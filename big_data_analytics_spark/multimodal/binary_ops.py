"""Multimodal columns: images/audio/video as opaque ``binary`` columns
with typed metadata, processed via Arrow-batched ``mapInPandas``.

Design (the part that matters at 100 TB):

- **Schema**: ``content BINARY`` + ``media_type STRING`` + a typed
  metadata struct. Binary payloads ride along in Parquet; metadata
  columns support pruning/filtering WITHOUT touching payload bytes
  (column pruning means a metadata-only query never reads the blobs).
- **Partitioning**: decode work is CPU-bound per row with wildly
  variable cost, so operators repartition by a content-hash bucket to
  spread skew before the mapInPandas stage.
- **UDF shape**: ``mapInPandas`` (iterator of record batches), not a
  row UDF — one Arrow transfer per batch, bounded memory via
  ``spark.sql.execution.arrow.maxRecordsPerBatch``.

The actual codecs (PIL/ffmpeg/torchaudio) are NOT installed in this
environment; ``decode_image``'s pixel path raises NotImplementedError
unless given ``fake=True``, which runs a deterministic stand-in
(hash-derived dimensions/features) so the Spark-side plumbing —
schemas, batching, partitioning, UDF signatures — is fully real and
tested. Swapping in a real codec changes only the inner function.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: Canonical multimodal table schema.
MEDIA_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("media_type", StringType()),      # image|audio|video
    StructField("content", BinaryType()),          # opaque payload
    StructField("meta", StructType([
        StructField("source", StringType()),
        StructField("byte_size", LongType()),
        StructField("mime", StringType()),
    ])),
])

DECODED_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("n_channels", IntegerType()),
    StructField("features", ArrayType(DoubleType())),
])


def synthetic_media(spark, n: int = 100) -> DataFrame:
    """Deterministic fake media table (payload = hash-stretched bytes)
    for plumbing tests; real pipelines read hive-partitioned Parquet
    with the same schema."""
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["id"]
            rows = {
                "media_id": ids,
                "media_type": [("image", "audio", "video")[i % 3] for i in ids],
                "content": [
                    hashlib.sha256(f"media{i}".encode()).digest() * (1 + i % 7)
                    for i in ids
                ],
            }
            out = pd.DataFrame(rows)
            out["meta"] = [
                {"source": f"src{i % 5}", "byte_size": len(c), "mime": f"{t}/x-fake"}
                for i, c, t in zip(ids, out.content, out.media_type)
            ]
            yield out

    return spark.range(n).mapInPandas(gen, MEDIA_SCHEMA)


def with_skew_bucket(df: DataFrame, buckets: int = 1024) -> DataFrame:
    """Content-hash bucket for decode-stage repartitioning: decode cost
    varies per item, so shuffle by hash bucket (not source/partition
    order) to level the work across executors."""
    return df.withColumn("__bucket", F.pmod(F.xxhash64("media_id"), F.lit(buckets)))


def decode_image(df: DataFrame, fake: bool = False,
                 feature_dim: int = 8) -> DataFrame:
    """Decode image payloads → (dims, channels, feature vector).

    Arrow-batched mapInPandas over skew-bucketed partitions. With
    ``fake=False`` this raises NotImplementedError at execution time
    (no image codec in this container — STUB, see module docstring);
    ``fake=True`` derives deterministic pseudo-decodes from the
    payload hash, exercising the identical plan.
    """
    imgs = with_skew_bucket(df.filter(F.col("media_type") == "image"))
    imgs = imgs.repartition(F.col("__bucket")).drop("__bucket")

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "image codec not available in this environment; "
                    "install PIL and replace this branch with "
                    "Image.open(io.BytesIO(content))")
            out = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                h = hashlib.sha256(bytes(content)).digest()
                out.append({
                    "media_id": mid,
                    "width": 64 + h[0],
                    "height": 64 + h[1],
                    "n_channels": 1 + h[2] % 4,
                    "features": [b / 255.0 for b in h[:feature_dim]],
                })
            yield pd.DataFrame(out)

    return imgs.mapInPandas(decode, DECODED_SCHEMA)


def frame_sample_plan(df: DataFrame, every_n: int = 30) -> DataFrame:
    """Video frame-sampling *plan*: explode a frame-index sequence per
    video (metadata-only — the decode of each sampled frame is the
    stubbed stage). Shows the fan-out shape: one row per sampled frame,
    partitionable downstream."""
    vids = df.filter(F.col("media_type") == "video")
    # fake per-video frame count derived from payload size
    n_frames = (F.length("content") % 300 + 30).cast("int")
    return (
        vids.withColumn("n_frames", n_frames)
        .withColumn("frame_idx",
                    F.explode(F.sequence(F.lit(0), F.col("n_frames") - 1,
                                         F.lit(every_n))))
        .select("media_id", "n_frames", "frame_idx")
    )


def media_stats(df: DataFrame) -> DataFrame:
    """Metadata-only rollup — must not read payload bytes (Parquet
    column pruning): counts and total bytes per media_type/source."""
    return (
        df.groupBy("media_type", F.col("meta.source").alias("source"))
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum("meta.byte_size").alias("total_bytes"),
        )
    )
