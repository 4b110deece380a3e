"""Driver-visible query over the multimodal decode path.

The multimodal operators (multimodal/binary_ops.py) were previously
pytest-only; mm1 gives the component a driver row. The fixture is
generated *distributed* (mapInPandas encodes real uncompressed-BMP and
PCM16-WAV payloads from the row id — no driver-side blob building),
then decoded by the real operators (decode_image / decode_audio: skew-
bucket repartition + Arrow-batched mapInPandas), and rolled up to
per-format stats.

Oracle strategy: every payload is a deterministic function of its id
(uniform-color BMP of w×h, constant-amplitude WAV of n samples), so
DuckDB can recompute the decoded stats from the generation formula
without ever seeing a byte. All aggregates are integer-exact
(dimensions, channel byte values, sample counts, floor-microsecond
durations, round-tripped amplitudes) — the decode → aggregate pipeline
is hash-graded end to end, and a mismatch means the codec plumbing
corrupted real bytes somewhere.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from big_data_analytics_spark.multimodal.binary_ops import (
    MEDIA_SCHEMA,
    decode_audio,
    decode_image,
    encode_bmp,
    encode_wav,
)
from big_data_analytics_spark.queries import query

_N_IMG = 40
_N_AUD = 40


def _media_fixture(spark: SparkSession) -> DataFrame:
    """80 real payloads, executor-side encoded: ids 0..39 are uniform
    (id%256, 3id%256, 7id%256)-colored BMPs of (4+id%5)×(3+id%4); ids
    40..79 are constant-amplitude (1000+id) PCM16 WAVs of 100+50·(id%7)
    samples at 8000+1000·(id%4) Hz."""
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                if i < _N_IMG:
                    w, h = 4 + i % 5, 3 + i % 4
                    color = (i % 256, (3 * i) % 256, (7 * i) % 256)
                    content = encode_bmp([[color] * w for _ in range(h)])
                    mt, mime = "image", "image/bmp"
                else:
                    rate = 8000 + 1000 * (i % 4)
                    n = 100 + 50 * (i % 7)
                    content = encode_wav([1000 + i] * n, sample_rate=rate)
                    mt, mime = "audio", "audio/wav"
                rows.append({
                    "media_id": i, "media_type": mt, "content": content,
                    "meta": {"source": f"src{i % 5}",
                             "byte_size": len(content), "mime": mime},
                })
            yield pd.DataFrame(rows)

    return spark.range(_N_IMG + _N_AUD).mapInPandas(gen, MEDIA_SCHEMA)


@query(
    "mm1_media_stats",
    oracle=f"""
    WITH imgs AS (
        SELECT i, 4 + i % 5 AS w, 3 + i % 4 AS h
        FROM range(0, {_N_IMG}) t(i)
    ), auds AS (
        SELECT i, 8000 + 1000 * (i % 4) AS rate,
               100 + 50 * (i % 7) AS n, 1000 + i AS amp
        FROM range({_N_IMG}, {_N_IMG + _N_AUD}) t(i)
    )
    SELECT 'image' AS media_type,
           COUNT(*)::BIGINT AS n_items,
           SUM(w)::BIGINT AS sum_width,
           SUM(h)::BIGINT AS sum_height,
           SUM(i % 256)::BIGINT AS sum_red,
           SUM((3 * i) % 256)::BIGINT AS sum_green,
           SUM((7 * i) % 256)::BIGINT AS sum_blue,
           CAST(-1 AS BIGINT) AS total_samples,
           CAST(-1 AS BIGINT) AS total_duration_us,
           CAST(-1 AS BIGINT) AS sum_amp
    FROM imgs
    UNION ALL
    SELECT 'audio',
           COUNT(*)::BIGINT,
           CAST(-1 AS BIGINT), CAST(-1 AS BIGINT),
           CAST(-1 AS BIGINT), CAST(-1 AS BIGINT),
           CAST(-1 AS BIGINT),
           SUM(n)::BIGINT,
           SUM(CAST(FLOOR(1000000.0 * (n / CAST(rate AS DOUBLE)))
                    AS BIGINT))::BIGINT,
           SUM(amp)::BIGINT
    FROM auds
    """,
)
def mm1_media_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-format decode rollup over real encoded payloads: BMP → dims
    + channel means (uniform color, so round(mean·255) recovers the
    exact byte), WAV → samples + floor-microsecond duration + the
    amplitude round-tripped through the RMS (constant signal, so
    round(rms·32768) recovers the exact int16). Every aggregate is a
    BIGINT — no float reduction crosses engines, and the per-row
    doubles (n/rate, ·10⁶) are computed in the same IEEE op order as
    the oracle.

    Scale shape: generation, decode, and partial aggregation are all
    narrow or map-side-combined; the only shuffles are the decode
    stages' skew-bucket repartitions (how a real 100 TB media corpus
    levels variable decode cost) and two single-row final aggs.
    ``sf_dir`` is unused — the corpus is synthesized, the operators
    are the thing under test."""
    media = _media_fixture(spark)
    img = decode_image(media)
    aud = decode_audio(media)
    # -1 sentinel, not NULL: graded outputs stay NULL-free so the
    # result canonicalizer never sees a nullable-int column (the scd1
    # convention)
    nil = F.lit(-1).cast("long")

    def ch(idx: int) -> Column:
        return F.round(F.element_at("features", idx) * 255).cast("long")

    img_stats = img.agg(
        F.count(F.lit(1)).cast("long").alias("n_items"),
        F.sum("width").cast("long").alias("sum_width"),
        F.sum("height").cast("long").alias("sum_height"),
        F.sum(ch(1)).cast("long").alias("sum_red"),
        F.sum(ch(2)).cast("long").alias("sum_green"),
        F.sum(ch(3)).cast("long").alias("sum_blue"),
    ).select(
        F.lit("image").alias("media_type"),
        "n_items", "sum_width", "sum_height",
        "sum_red", "sum_green", "sum_blue",
        nil.alias("total_samples"),
        nil.alias("total_duration_us"),
        nil.alias("sum_amp"),
    )
    aud_stats = aud.agg(
        F.count(F.lit(1)).cast("long").alias("n_items"),
        F.sum("n_samples").cast("long").alias("total_samples"),
        F.sum(F.floor(F.lit(1000000.0) * F.col("duration_s"))
              .cast("long")).cast("long").alias("total_duration_us"),
        F.sum(F.round(F.col("rms") * 32768).cast("long"))
        .cast("long").alias("sum_amp"),
    ).select(
        F.lit("audio").alias("media_type"),
        "n_items",
        nil.alias("sum_width"), nil.alias("sum_height"),
        nil.alias("sum_red"), nil.alias("sum_green"), nil.alias("sum_blue"),
        "total_samples", "total_duration_us", "sum_amp",
    )
    return img_stats.unionByName(aud_stats)


_N_VID = 100


@query(
    "mm2_frame_samples",
    oracle=f"""
    WITH vids AS (
        SELECT i,
               (500 + 137 * (i % 11)) % 300 + 30 AS n_frames
        FROM range(0, {_N_VID}) t(i)
    )
    SELECT i AS media_id,
           CAST(n_frames AS BIGINT) AS n_frames,
           CAST((n_frames - 1) // 30 + 1 AS BIGINT) AS n_sampled,
           CAST(30 * ((n_frames - 1) // 30) AS BIGINT)
               AS last_sampled_idx
    FROM vids
    """,
)
def mm2_frame_samples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame-sampling fan-out, certified exactly: 100 synthetic
    "videos" (opaque byte payloads of deterministic length — the
    codec stage is the honestly-stubbed boundary, no ffmpeg in this
    environment), frame_sample_plan explodes every-30th frame
    indexes per video, and the per-video rollup (frame count, sampled
    count, last sampled index) must hash-match the closed form DuckDB
    computes from the generation formula. This pins the Spark-side
    plumbing the prompt-level operator needs at 100 TB: metadata-only
    fan-out (payload bytes never shuffled — one row per SAMPLED frame,
    not per frame), partitionable downstream by (media_id, frame_idx)
    for the real decode stage."""
    from big_data_analytics_spark.multimodal.binary_ops import (
        frame_sample_plan,
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                content = b"\x00" * (500 + 137 * (i % 11))
                rows.append({
                    "media_id": i, "media_type": "video",
                    "content": content,
                    "meta": {"source": f"src{i % 5}",
                             "byte_size": len(content),
                             "mime": "video/x-synthetic"},
                })
            yield pd.DataFrame(rows)

    vids = spark.range(_N_VID).mapInPandas(gen, MEDIA_SCHEMA)
    sampled = frame_sample_plan(vids, every_n=30)
    return (sampled.groupBy("media_id")
            .agg(F.max("n_frames").cast("long").alias("n_frames"),
                 F.count(F.lit(1)).cast("long").alias("n_sampled"),
                 F.max("frame_idx").cast("long")
                 .alias("last_sampled_idx")))


_DUP_N = 10  # ids 0..9 (BMPs) and 40..49 (WAVs) get planted copies


@query(
    "mm3_binary_dedup",
    oracle=f"""
    WITH imgs AS (
        SELECT i, 4 + i % 5 AS w, 3 + i % 4 AS h
        FROM range(0, {_N_IMG}) t(i)
    ), auds AS (
        SELECT i, 100 + 50 * (i % 7) AS n
        FROM range({_N_IMG}, {_N_IMG + _N_AUD}) t(i)
    ), isz AS (
        SELECT i, 54 + h * (3 * w + (4 - (3 * w) % 4) % 4) AS bs
        FROM imgs
    ), asz AS (SELECT i, 44 + 2 * n AS bs FROM auds)
    SELECT 'audio' AS media_type,
           CAST({_N_AUD} + {_DUP_N} AS BIGINT) AS n_items,
           CAST({_N_AUD} AS BIGINT) AS n_groups,
           CAST({_DUP_N} AS BIGINT) AS n_dup_groups,
           CAST({_DUP_N} AS BIGINT) AS n_redundant,
           (SELECT CAST(SUM(bs) AS BIGINT) FROM asz
            WHERE i < {_N_IMG} + {_DUP_N}) AS bytes_reclaimable
    UNION ALL
    SELECT 'image',
           CAST({_N_IMG} + {_DUP_N} AS BIGINT),
           CAST({_N_IMG} AS BIGINT),
           CAST({_DUP_N} AS BIGINT),
           CAST({_DUP_N} AS BIGINT),
           (SELECT CAST(SUM(bs) AS BIGINT) FROM isz WHERE i < {_DUP_N})
    ORDER BY media_type
    """,
)
def mm3_binary_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact deduplication over OPAQUE BINARY media columns — the
    multimodal twin of d1: content-hash (sha256 of the raw payload
    bytes) group-by finds every byte-identical duplicate without
    decoding anything, and the per-format audit reports group counts
    and the exact bytes a keep-one-per-group pass reclaims. Planted
    copies (ids 0..9 / 40..49 re-emitted under media_id+1000) are the
    ground truth; the oracle computes the expected audit in closed
    form from the generation formulas, including the BMP
    (54 + h*(3w+pad4)) and WAV (44 + 2n) byte sizes — so a hash
    mismatch means either the dedup or the encoders corrupted real
    bytes.

    Scale shape: the shuffle carries 32-byte digests + row ids, never
    payloads (the d1 hash-first discipline applied to blobs); the
    payload column is only scanned, once, map-side. ``sf_dir`` is
    unused — the corpus is synthesized executor-side."""
    media = _media_fixture(spark)
    dups = (media.filter(
        (F.col("media_id") < _DUP_N)
        | ((F.col("media_id") >= _N_IMG)
           & (F.col("media_id") < _N_IMG + _DUP_N)))
        .withColumn("media_id", F.col("media_id") + 1000))
    corpus = media.unionByName(dups)
    groups = (corpus.select(
        "media_type",
        F.sha2(F.col("content"), 256).alias("h"),
        F.length(F.col("content")).cast("long").alias("bs"))
        .groupBy("media_type", "h")
        .agg(F.count(F.lit(1)).alias("sz"),
             F.first("bs").alias("bs")))
    return (groups.groupBy("media_type")
            .agg(F.sum("sz").cast("long").alias("n_items"),
                 F.count(F.lit(1)).cast("long").alias("n_groups"),
                 F.sum((F.col("sz") > 1).cast("long")).cast("long")
                 .alias("n_dup_groups"),
                 F.sum(F.col("sz") - 1).cast("long").alias("n_redundant"),
                 F.sum((F.col("sz") - 1) * F.col("bs")).cast("long")
                 .alias("bytes_reclaimable"))
            .orderBy("media_type"))


_N_GRAD = 30
_RW, _RH = 4, 3


def _gradient_fixture(spark: SparkSession) -> DataFrame:
    """30 executor-encoded GRADIENT BMPs (pixel (x, y) of image i:
    r=(37x+i)%256, g=(53y+i)%256, b=(x+7y+i)%256; sizes 5..10 x 4..8)
    — non-uniform content, so a wrong resample coordinate produces
    wrong channel sums (uniform-color fixtures cannot catch that)."""
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                w, h = 5 + i % 6, 4 + i % 5
                px = [[((x * 37 + i) % 256, (y * 53 + i) % 256,
                        (x + y * 7 + i) % 256) for x in range(w)]
                      for y in range(h)]
                content = encode_bmp(px)
                rows.append({
                    "media_id": i, "media_type": "image",
                    "content": content,
                    "meta": {"source": "grad",
                             "byte_size": len(content),
                             "mime": "image/bmp"},
                })
            yield pd.DataFrame(rows)

    return spark.range(_N_GRAD).mapInPandas(gen, MEDIA_SCHEMA)


@query(
    "mm4_resize_pipeline",
    oracle=f"""
    WITH imgs AS (
        SELECT i, 5 + i % 6 AS w, 4 + i % 5 AS h
        FROM range(0, {_N_GRAD}) t(i)
    ), px AS (
        SELECT i,
               CAST(FLOOR((x.x + 0.5) * w / {_RW}) AS BIGINT) AS sx,
               CAST(FLOOR((y.y + 0.5) * h / {_RH}) AS BIGINT) AS sy
        FROM imgs, range(0, {_RW}) AS x(x), range(0, {_RH}) AS y(y)
    )
    SELECT i AS media_id,
           CAST(SUM((sx * 37 + i) % 256) AS BIGINT) AS sum_r,
           CAST(SUM((sy * 53 + i) % 256) AS BIGINT) AS sum_g,
           CAST(SUM((sx + sy * 7 + i) % 256) AS BIGINT) AS sum_b
    FROM px GROUP BY i ORDER BY media_id
    """,
)
def mm4_resize_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The image RESIZE path graded end-to-end: encode 30 gradient
    BMPs executor-side, nearest-neighbor-resize to {RW}x{RH} (real
    bytes through multimodal/binary_ops.resize_image), re-decode the
    resized payloads, and emit per-image exact channel sums. The
    oracle recomputes the expected sums from the generation formulas
    AND the resampling convention (src = floor((dst+0.5)*src_dim/
    dst_dim) — OpenCV INTER_NEAREST, identical IEEE ops in both
    engines), so a hash mismatch pinpoints wrong pixel coordinates,
    wrong orientation, or byte corruption anywhere in the
    encode -> resize -> re-encode -> decode loop. Gradient content is
    the point: mm1's uniform colors certify decode plumbing, but only
    non-uniform pixels certify WHICH pixels a resample picked.

    Scale shape: generation, resize, and decode are all Arrow-batched
    mapInPandas over skew-bucketed partitions; the final rollup is
    one mergeable aggregate. ``sf_dir`` unused (synthesized corpus)."""
    from big_data_analytics_spark.multimodal.binary_ops import (
        resize_image,
    )

    media = _gradient_fixture(spark)
    resized = resize_image(media, out_w=_RW, out_h=_RH)
    frame = resized.select(
        "media_id", F.lit("image").alias("media_type"),
        F.col("resized").alias("content"))
    decoded = decode_image(frame)
    n_px = F.col("width") * F.col("height")

    def ch(idx: int) -> Column:
        return (F.round(F.element_at("features", idx) * 255 * n_px)
                .cast("long"))

    return (decoded.select(
        "media_id", ch(1).alias("sum_r"), ch(2).alias("sum_g"),
        ch(3).alias("sum_b"))
        .orderBy("media_id"))


mm4_resize_pipeline.__doc__ = mm4_resize_pipeline.__doc__.format(
    RW=_RW, RH=_RH)


_N_PNG = 25


def _png_gradient_fixture(spark: SparkSession) -> DataFrame:
    """25 executor-encoded gradient PNGs (pixel (x, y) of image i:
    r=(29x+i)%256, g=(47y+i)%256, b=(5x+3y+i)%256; sizes 6..10 x
    5..8), with image i written under PNG filter type i % 5 — every
    one of the five scanline filters (None/Sub/Up/Average/Paeth)
    appears in the graded corpus, so a wrong unfilter path in the
    stdlib-zlib decoder corrupts some image's channel sums."""
    from big_data_analytics_spark.multimodal.binary_ops import encode_png

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                w, h = 6 + i % 5, 5 + i % 4
                px = [[((x * 29 + i) % 256, (y * 47 + i) % 256,
                        (x * 5 + y * 3 + i) % 256) for x in range(w)]
                      for y in range(h)]
                content = encode_png(px, filter_type=i % 5)
                rows.append({
                    "media_id": i, "media_type": "image",
                    "content": content,
                    "meta": {"source": "png_grad",
                             "byte_size": len(content),
                             "mime": "image/png"},
                })
            yield pd.DataFrame(rows)

    return spark.range(_N_PNG).mapInPandas(gen, MEDIA_SCHEMA)


@query(
    "mm5_png_roundtrip",
    oracle=f"""
    WITH imgs AS (
        SELECT i, 6 + i % 5 AS w, 5 + i % 4 AS h
        FROM range(0, {_N_PNG}) t(i)
    ), px AS (
        SELECT i,
               CAST(FLOOR((x.x + 0.5) * w / {_RW}) AS BIGINT) AS sx,
               CAST(FLOOR((y.y + 0.5) * h / {_RH}) AS BIGINT) AS sy
        FROM imgs, range(0, {_RW}) AS x(x), range(0, {_RH}) AS y(y)
    )
    SELECT i AS media_id,
           CAST(SUM((sx * 29 + i) % 256) AS BIGINT) AS sum_r,
           CAST(SUM((sy * 47 + i) % 256) AS BIGINT) AS sum_g,
           CAST(SUM((sx * 5 + sy * 3 + i) % 256) AS BIGINT) AS sum_b
    FROM px GROUP BY i ORDER BY media_id
    """,
)
def mm5_png_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The stdlib-zlib PNG codec graded end-to-end: encode 25 gradient
    PNGs executor-side — one of the five scanline filters per image —
    then run the SAME certified loop as mm4 (nearest-neighbor resize
    of the real bytes, re-decode, exact channel sums). The oracle
    recomputes the sums from the generation formulas and the
    INTER_NEAREST coordinate convention, so a hash mismatch pinpoints
    a wrong unfilter path (Sub/Up/Average/Paeth), wrong pixel
    coordinates, or byte corruption anywhere in the
    PNG-encode -> inflate/unfilter -> resize -> decode loop. With
    this row green, the NotImplementedError codec boundary covers
    only formats that genuinely need an external library (JPEG DCT,
    ffmpeg containers).

    Scale shape: identical to mm4 — generation, resize, decode are
    Arrow-batched mapInPandas over skew-bucketed partitions; final
    rollup is one mergeable aggregate. ``sf_dir`` unused (synthesized
    corpus)."""
    from big_data_analytics_spark.multimodal.binary_ops import (
        resize_image,
    )

    media = _png_gradient_fixture(spark)
    resized = resize_image(media, out_w=_RW, out_h=_RH)
    frame = resized.select(
        "media_id", F.lit("image").alias("media_type"),
        F.col("resized").alias("content"))
    decoded = decode_image(frame)
    n_px = F.col("width") * F.col("height")

    def ch(idx: int) -> Column:
        return (F.round(F.element_at("features", idx) * 255 * n_px)
                .cast("long"))

    return (decoded.select(
        "media_id", ch(1).alias("sum_r"), ch(2).alias("sum_g"),
        ch(3).alias("sum_b"))
        .orderBy("media_id"))


_N_WAV = 25
_IN_RATE, _OUT_RATE = 16_000, 8_000


def _pcm_fixture(spark: SparkSession) -> DataFrame:
    """25 executor-encoded mono PCM16 WAVs with closed-form samples
    (sample k of clip i = ((7919 i + 104729 k) mod 65536) - 32768,
    lengths 120..280) — full-range non-uniform content, so a wrong
    resample index produces wrong sample sums, exactly like mm4's
    gradient pixels."""
    import struct

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                n = 120 + 40 * (i % 5)
                samples = [((i * 7919 + k * 104729) % 65536) - 32768
                           for k in range(n)]
                content = encode_wav(samples, _IN_RATE)
                rows.append({
                    "media_id": i, "media_type": "audio",
                    "content": content,
                    "meta": {"source": "pcm_lcg",
                             "byte_size": len(content),
                             "mime": "audio/wav"},
                })
            yield pd.DataFrame(rows)

    return spark.range(_N_WAV).mapInPandas(gen, MEDIA_SCHEMA)


@query(
    "mm6_audio_resample",
    oracle=f"""
    WITH auds AS (
        SELECT i, 120 + 40 * (i % 5) AS n_in FROM range(0, {_N_WAV}) t(i)
    ), picked AS (
        SELECT i,
               ((i * 7919 + CAST(FLOOR((j.j + 0.5) * n_in
                    / (n_in * {_OUT_RATE} // {_IN_RATE})) AS BIGINT)
                 * 104729) % 65536) - 32768 AS s
        FROM auds, range(0, 300) j(j)
        WHERE j.j < n_in * {_OUT_RATE} // {_IN_RATE}
    )
    SELECT i AS media_id,
           CAST(COUNT(*) AS BIGINT) AS n_samples,
           CAST(SUM(s) AS BIGINT) AS sample_sum,
           CAST(SUM(s * s) AS BIGINT) AS energy
    FROM picked GROUP BY i ORDER BY media_id
    """,
)
def mm6_audio_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The audio RESAMPLE path graded end-to-end — the WAV twin of
    mm4: encode 25 closed-form PCM16 clips executor-side, zero-order-
    hold resample 16 kHz -> 8 kHz through
    multimodal/binary_ops.resample_audio (real bytes), re-decode the
    resampled payloads, and emit exact integer sample sums and
    energy. The oracle recomputes WHICH samples the resampler must
    pick (src = floor((j+0.5) * n_in / n_out), the same convention
    as the image path) from the generation formula, so a hash
    mismatch pinpoints off-by-one sample indexing, byte corruption,
    or header drift anywhere in the encode -> resample -> re-encode
    -> decode loop.

    Scale shape: identical to mm4/mm5 — generation, resample, decode
    are Arrow-batched mapInPandas over skew-bucketed partitions; the
    rollup is one mergeable aggregate. ``sf_dir`` unused."""
    import struct

    from big_data_analytics_spark.multimodal.binary_ops import (
        _wav_pcm,
        resample_audio,
    )

    media = _pcm_fixture(spark)
    resampled = resample_audio(media, out_rate=_OUT_RATE)

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, content in zip(pdf["media_id"], pdf["resampled"]):
                pcm = _wav_pcm(bytes(content))
                samples = struct.unpack(f"<{len(pcm) // 2}h", pcm)
                out.append({"media_id": mid,
                            "n_samples": len(samples),
                            "sample_sum": sum(samples),
                            "energy": sum(s * s for s in samples)})
            yield pd.DataFrame(out)

    schema = ("media_id long, n_samples long, sample_sum long, "
              "energy long")
    return (resampled.mapInPandas(decode, schema)
            .orderBy("media_id"))


_N_DH = 30  # 15 content classes x 2: image i and i+15 share a class


def _dhash_fixture(spark: SparkSession) -> DataFrame:
    """30 executor-encoded grayscale BMPs in 15 content classes
    (j = i % 15): pixel (x, y) of class j has r=g=b =
    (23x^2 + 31y^2 + 17xy + 41j + 13jx + 7jy) % 256, size
    (9 + j%4) x (8 + j%3). The second copy of each class (i >= 15)
    perturbs ONLY source pixel (0, 0) by +50 mod 256 — a small local
    edit that flips at most one dHash bit, so every (i, i+15) pair is
    a planted near-duplicate at Hamming distance <= 1."""
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                j = i % 15
                w, h = 9 + j % 4, 8 + j % 3
                px = []
                for y in range(h):
                    row = []
                    for x in range(w):
                        g = (23 * x * x + 31 * y * y + 17 * x * y
                             + 41 * j + 13 * j * x + 7 * j * y) % 256
                        if i >= 15 and x == 0 and y == 0:
                            g = (g + 50) % 256
                        row.append((g, g, g))
                    px.append(row)
                content = encode_bmp(px)
                rows.append({
                    "media_id": i, "media_type": "image",
                    "content": content,
                    "meta": {"source": "dhash_grad",
                             "byte_size": len(content),
                             "mime": "image/bmp"},
                })
            yield pd.DataFrame(rows)

    return spark.range(_N_DH).mapInPandas(gen, MEDIA_SCHEMA)


@query(
    "mm7_dhash_neardup",
    oracle=f"""
    WITH imgs AS (
        SELECT i, i % 15 AS j,
               9 + (i % 15) % 4 AS w, 8 + (i % 15) % 3 AS h
        FROM range(0, {_N_DH}) t(i)
    ), cells AS (
        SELECT i, j, gx.x AS gx, gy.y AS gy,
               CAST(FLOOR((gx.x + 0.5) * w / 9) AS BIGINT) AS sx,
               CAST(FLOOR((gy.y + 0.5) * h / 8) AS BIGINT) AS sy
        FROM imgs, range(0, 9) gx(x), range(0, 8) gy(y)
    ), gray AS (
        SELECT i, gx, gy,
               ((23 * sx * sx + 31 * sy * sy + 17 * sx * sy
                 + 41 * j + 13 * j * sx + 7 * j * sy)
                + CASE WHEN i >= 15 AND sx = 0 AND sy = 0
                       THEN 50 ELSE 0 END) % 256 AS g
        FROM cells
    ), bits AS (
        SELECT a.i, a.gy * 8 + a.gx AS idx,
               CASE WHEN b.g > a.g THEN 1 ELSE 0 END AS bit
        FROM gray a JOIN gray b
          ON b.i = a.i AND b.gy = a.gy AND b.gx = a.gx + 1
        WHERE a.gx < 8
    ), hashes AS (
        SELECT i,
               CAST(SUM(CASE WHEN idx >= 32
                             THEN bit::BIGINT << (idx - 32)
                             ELSE 0 END) AS BIGINT) AS h_hi,
               CAST(SUM(CASE WHEN idx < 32
                             THEN bit::BIGINT << idx
                             ELSE 0 END) AS BIGINT) AS h_lo
        FROM bits GROUP BY i
    )
    SELECT x.i AS media_id_a, y.i AS media_id_b,
           CAST(bit_count(xor(x.h_lo, y.h_lo))
                + bit_count(xor(x.h_hi, y.h_hi)) AS BIGINT) AS hamming
    FROM hashes x JOIN hashes y ON x.i < y.i
    WHERE bit_count(xor(x.h_lo, y.h_lo))
          + bit_count(xor(x.h_hi, y.h_hi)) <= 3
    ORDER BY media_id_a, media_id_b
    """,
)
def mm7_dhash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash image near-dup detection, the multimodal twin
    of d2's MinHash-LSH: dHash every image (real bytes through the
    decode -> 9x8 resize -> difference-bit loop in
    multimodal/binary_ops.dhash_image), generate candidate pairs with
    a 4x16-bit BAND-EQUALITY join (pigeonhole: Hamming <= 3 over 64
    bits forces at least one of 4 bands equal, so the banded join
    provably misses nothing), verify exact Hamming distance on
    candidates, and emit pairs at distance <= 3. The fixture plants
    15 near-dup pairs (same gradient content, one +50 pixel edit);
    the oracle recomputes hashes from the generation formulas and the
    INTER_NEAREST convention and brute-forces all pairs — equality
    proves both the codec-to-bits loop AND that banding lost no pair.

    Scale shape: hashing is scan-bound mapInPandas; the band join
    shuffles four 16-bit keys per image instead of comparing all
    pairs — at N images, candidate cost tracks true near-dup density,
    not N^2. ``sf_dir`` unused (synthesized corpus)."""
    from big_data_analytics_spark.multimodal.binary_ops import dhash_image

    hashes = dhash_image(_dhash_fixture(spark))
    bands = hashes.select(
        "media_id", "h_hi", "h_lo",
        F.posexplode(F.array(
            F.col("h_lo").bitwiseAND(F.lit(0xFFFF)),
            F.shiftright("h_lo", 16),
            F.col("h_hi").bitwiseAND(F.lit(0xFFFF)),
            F.shiftright("h_hi", 16),
        )).alias("band", "band_val"))
    a, b = bands.alias("a"), bands.alias("b")
    cand = (a.join(b, (F.col("a.band") == F.col("b.band"))
                   & (F.col("a.band_val") == F.col("b.band_val"))
                   & (F.col("a.media_id") < F.col("b.media_id")))
            .select(F.col("a.media_id").alias("media_id_a"),
                    F.col("b.media_id").alias("media_id_b"),
                    F.col("a.h_hi").alias("a_hi"),
                    F.col("a.h_lo").alias("a_lo"),
                    F.col("b.h_hi").alias("b_hi"),
                    F.col("b.h_lo").alias("b_lo"))
            .distinct())
    ham = (F.bit_count(F.col("a_lo").bitwiseXOR(F.col("b_lo")))
           + F.bit_count(F.col("a_hi").bitwiseXOR(F.col("b_hi"))))
    return (cand.select(
        "media_id_a", "media_id_b",
        ham.cast("long").alias("hamming"))
        .where(F.col("hamming") <= 3)
        .orderBy("media_id_a", "media_id_b"))


_N_JPG = 24


def _jpeg_block_fixture(spark: SparkSession) -> DataFrame:
    """24 executor-encoded grayscale baseline JPEGs (SOF0) whose
    content is piecewise-constant 8x8 blocks: image i is (2 + i%3) x
    (2 + i%2) blocks, block (bx, by) holds pixel value
    (23i + 11bx + 17by) % 256. Encoded with DC quant step 8, the
    round-trip is BIT-LOSSLESS (DCT of a constant block is the single
    coefficient 8*(v-128); 8s/8 = s needs no rounding — see
    multimodal/jpeg.py), so the decoded sums have a closed form the
    SQL oracle recomputes. Block values vary across blocks, so the
    Huffman DC-difference chain (category + magnitude bits per block,
    EOB per block) is exercised for real on every image. ODD images
    are written PROGRESSIVE (SOF2 — DC bit-plane + refinement, AC
    spectral bands, successive approximation): the quantized
    coefficients are identical, so the lossless contract carries
    over verbatim and the driver's hash gate covers BOTH entropy
    layouts through one oracle."""
    from big_data_analytics_spark.multimodal.jpeg import (
        encode_jpeg,
        encode_jpeg_progressive,
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                bw, bh = 2 + i % 3, 2 + i % 2
                px = [[(23 * i + 11 * (x // 8) + 17 * (y // 8)) % 256
                       for x in range(bw * 8)] for y in range(bh * 8)]
                enc = encode_jpeg_progressive if i % 2 else encode_jpeg
                content = enc(px, qdc=8, qac=16)
                rows.append({
                    "media_id": i, "media_type": "image",
                    "content": content,
                    "meta": {"source": "jpeg_blocks",
                             "byte_size": len(content),
                             "mime": "image/jpeg"},
                })
            yield pd.DataFrame(rows)

    return spark.range(_N_JPG).mapInPandas(gen, MEDIA_SCHEMA)


@query(
    "mm8_jpeg_roundtrip",
    oracle=f"""
    WITH imgs AS (
        SELECT i, 2 + i % 3 AS bw, 2 + i % 2 AS bh
        FROM range(0, {_N_JPG}) t(i)
    ), blk AS (
        SELECT i, bw, bh, bx.x AS bx, by.y AS by
        FROM imgs, range(0, 4) bx(x), range(0, 3) by(y)
        WHERE bx.x < bw AND by.y < bh
    )
    SELECT i AS media_id,
           CAST(MAX(bw) * 8 AS INT) AS width,
           CAST(MAX(bh) * 8 AS INT) AS height,
           CAST(SUM(64 * ((23 * i + 11 * bx + 17 * by) % 256))
                AS BIGINT) AS pix_sum
    FROM blk GROUP BY i ORDER BY media_id
    """,
)
def mm8_jpeg_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The JPEG codec graded end-to-end: encode 24 block-constant
    grayscale JPEGs executor-side (even ids baseline SOF0, odd ids
    progressive SOF2 — same quantized coefficients, same lossless
    contract), decode them through
    the SAME decode_image operator every image payload rides (which
    dispatches JPEG bytes to the stdlib+numpy Huffman/dequant/IDCT
    pipeline in multimodal/jpeg.py), and emit exact per-image pixel
    sums. The fixture is constructed to round-trip bit-losslessly
    (DC quant step 8 on piecewise-constant blocks — the proof is in
    the codec's module doc), so the oracle recomputes width, height,
    and pixel sum in closed form from the generation formulas: a hash
    mismatch pinpoints a marker-parse, Huffman, DC-prediction,
    dequant, IDCT, or clamp bug. The lossy AC path (zigzag,
    run/length, EOB/ZRL) is certified against a numpy DCT reference
    in tests/test_multimodal.py. With this row green the codec
    boundary shrinks to progressive/subsampled JPEG and ffmpeg video.

    Scale shape: identical to mm5 — generation and decode are
    Arrow-batched mapInPandas over skew-bucketed partitions; the
    final projection is per-row arithmetic on the decoded stats.
    ``sf_dir`` unused (synthesized corpus)."""
    media = _jpeg_block_fixture(spark)
    decoded = decode_image(media)
    n_px = F.col("width") * F.col("height")
    return (decoded.select(
        "media_id", "width", "height",
        F.round(F.element_at("features", 1) * 255 * n_px)
         .cast("long").alias("pix_sum"))
        .orderBy("media_id"))


_N_MJPEG_VID = 10


def _mjpeg_video_fixture(spark: SparkSession) -> DataFrame:
    """10 executor-muxed MJPEG-AVI videos: video v is (4 + v%4)
    frames of (2 + v%2)x2 blocks, frame f's block (bx, by) holding
    gray (31v + 7f + 11bx + 17by) % 256 — block-constant frames at DC
    quant 8, so every frame round-trips the JPEG codec bit-losslessly
    (the mm8 contract) and per-frame pixel sums have a closed form
    the SQL oracle recomputes. The container is a spec-conformant
    RIFF AVI written by multimodal/avi.py (hdrl/strl headers, movi
    00dc chunks, idx1), so the demux side exercises real chunk
    walking, not a private framing."""
    from big_data_analytics_spark.multimodal.avi import encode_avi_mjpeg
    from big_data_analytics_spark.multimodal.jpeg import encode_jpeg

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for v in pdf["id"]:
                v = int(v)
                nf, bw, bh = 4 + v % 4, 2 + v % 2, 2
                frames = []
                for f in range(nf):
                    px = [[(31 * v + 7 * f + 11 * (x // 8)
                            + 17 * (y // 8)) % 256
                           for x in range(bw * 8)] for y in range(bh * 8)]
                    frames.append(encode_jpeg(px, qdc=8, qac=16))
                content = encode_avi_mjpeg(frames, bw * 8, bh * 8, fps=10)
                rows.append({
                    "media_id": v, "media_type": "video",
                    "content": content,
                    "meta": {"source": "mjpeg_avi",
                             "byte_size": len(content),
                             "mime": "video/x-msvideo"},
                })
            yield pd.DataFrame(rows)

    return spark.range(_N_MJPEG_VID).mapInPandas(gen, MEDIA_SCHEMA)


@query(
    "mm9_video_frame_sample",
    oracle=f"""
    WITH vids AS (
        SELECT v, 4 + v % 4 AS nf, 2 + v % 2 AS bw
        FROM range(0, {_N_MJPEG_VID}) t(v)
    ), sampled AS (
        SELECT v, nf, bw, f.f AS f
        FROM vids, range(0, 7) f(f)
        WHERE f.f < nf AND f.f % 2 = 0
    ), blk AS (
        SELECT v, nf, bw, f, bx.x AS bx, by.y AS by
        FROM sampled, range(0, 3) bx(x), range(0, 2) by(y)
        WHERE bx.x < bw
    )
    SELECT v AS media_id,
           CAST(MAX(nf) AS INT) AS n_frames,
           CAST(COUNT(DISTINCT f) AS INT) AS n_sampled,
           CAST(MAX(bw) * 8 AS INT) AS width,
           CAST(16 AS INT) AS height,
           CAST(SUM(64 * ((31 * v + 7 * f + 11 * bx + 17 * by) % 256))
                AS BIGINT) AS pix_sum
    FROM blk GROUP BY v ORDER BY media_id
    """,
)
def mm9_video_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame sampling, graded end-to-end: demux each MJPEG-AVI
    payload (multimodal/avi.py — real RIFF chunk walking with a
    FourCC guard that raises on inter-frame codecs), keep every 2nd
    frame (the canonical stride sample a training pipeline takes
    before per-frame feature extraction), decode the kept frames
    through the SAME stdlib+numpy JPEG pipeline every image payload
    rides, and emit per-video frame counts, geometry, and the exact
    pixel sum over sampled frames. Fixture frames are block-constant
    at DC quant 8 (bit-lossless round trip — the mm8 contract), so
    the oracle recomputes everything in closed form: a hash mismatch
    pinpoints a RIFF-walk, chunk-alignment, frame-order, stride, or
    JPEG-decode bug. With this row green the multimodal boundary is
    inter-frame video codecs (H.264 etc.) and arithmetic-coded JPEG
    only.

    Scale shape: demux+decode is one Arrow-batched mapInPandas over
    the (binary content) column — embarrassingly parallel, scan-bound
    like every codec stage; sampling at the container level means
    unsampled frames are never entropy-decoded (with an index the
    production form also skips READING them). ``sf_dir`` unused
    (synthesized corpus)."""
    from big_data_analytics_spark.multimodal.avi import demux_avi_mjpeg
    from big_data_analytics_spark.multimodal.jpeg import jpeg_planes

    media = _mjpeg_video_fixture(spark)

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                frames = demux_avi_mjpeg(bytes(r["content"]))
                kept = frames[::2]
                planes = [jpeg_planes(f)[0] for f in kept]
                rows.append({
                    "media_id": int(r["media_id"]),
                    "n_frames": len(frames),
                    "n_sampled": len(kept),
                    "width": int(planes[0].shape[1]),
                    "height": int(planes[0].shape[0]),
                    "pix_sum": int(sum(int(p.sum()) for p in planes)),
                })
            yield pd.DataFrame(rows)

    out_schema = ("media_id long, n_frames int, n_sampled int, "
                  "width int, height int, pix_sum long")
    return (media.select("media_id", "content")
            .mapInPandas(sample, out_schema)
            .orderBy("media_id"))


_N_SCENE_VID = 12   # scene-cut fixture videos (fixed-size corpus)
_SC_FRAMES = 8      # frames per video
_SC_JUMP = 60       # per-pixel gray jump at a scene boundary
_SC_THRESH = 16     # per-pixel cut threshold (within-scene drift <= 3)


def _scene_video_fixture(spark: SparkSession) -> DataFrame:
    """12 executor-muxed MJPEG-AVIs with PLANTED scene boundaries:
    video v is 8 frames of (2 + v%2)x2 blocks; scene(f) = f // seg
    with seg = 2 + v%3, and frame f's block (bx, by) holds gray
    40 + {J}*scene + (f % seg) + 2*bx + 3*by — within a scene the
    per-pixel drift is <= 3 gray levels/frame, across a boundary it
    jumps {J}±3. Values stay < 256 (no wrap), frames are
    block-constant at DC quant 8, so every frame round-trips the JPEG
    codec bit-losslessly (the mm8 contract) and per-frame pixel sums
    have a closed form the SQL oracle recomputes."""
    from big_data_analytics_spark.multimodal.avi import encode_avi_mjpeg
    from big_data_analytics_spark.multimodal.jpeg import encode_jpeg

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for v in pdf["id"]:
                v = int(v)
                seg, bw, bh = 2 + v % 3, 2 + v % 2, 2
                frames = []
                for f in range(_SC_FRAMES):
                    px = [[(40 + _SC_JUMP * (f // seg) + (f % seg)
                            + 2 * (x // 8) + 3 * (y // 8))
                           for x in range(bw * 8)] for y in range(bh * 8)]
                    frames.append(encode_jpeg(px, qdc=8, qac=16))
                content = encode_avi_mjpeg(frames, bw * 8, bh * 8, fps=10)
                rows.append({
                    "media_id": v, "media_type": "video",
                    "content": content,
                    "meta": {"source": "mjpeg_avi_scenes",
                             "byte_size": len(content),
                             "mime": "video/x-msvideo"},
                })
            yield pd.DataFrame(rows)

    return spark.range(_N_SCENE_VID).mapInPandas(gen, MEDIA_SCHEMA)


_scene_video_fixture.__doc__ = _scene_video_fixture.__doc__.format(
    J=_SC_JUMP)


@query(
    "mm10_scene_cuts",
    oracle=f"""
    WITH vids AS (
        SELECT v, 2 + v % 3 AS seg, 2 + v % 2 AS bw
        FROM range(0, {_N_SCENE_VID}) t(v)
    ), blk AS (
        SELECT v, seg, bw, f.f AS f, bx.x AS bx, by.y AS by
        FROM vids, range(0, {_SC_FRAMES}) f(f),
             range(0, 3) bx(x), range(0, 2) by(y)
        WHERE bx.x < bw
    ), fs AS (
        SELECT v, f,
               CAST(SUM(64 * (40 + {_SC_JUMP} * (f // seg) + (f % seg)
                              + 2 * bx + 3 * by)) AS BIGINT) AS s,
               CAST(MAX(bw) * 8 * 16 AS BIGINT) AS npx
        FROM blk GROUP BY v, f
    ), d AS (
        SELECT v, f, npx,
               s - LAG(s) OVER (PARTITION BY v ORDER BY f) AS ds
        FROM fs
    )
    SELECT v AS media_id,
           CAST({_SC_FRAMES} AS INT) AS n_frames,
           CAST(SUM(CASE WHEN ds > {_SC_THRESH} * npx THEN 1 ELSE 0 END)
                AS INT) AS n_cuts,
           CAST(MIN(CASE WHEN ds > {_SC_THRESH} * npx THEN f END)
                AS INT) AS first_cut_frame,
           CAST(SUM(CASE WHEN ds > {_SC_THRESH} * npx THEN f ELSE 0 END)
                AS BIGINT) AS cut_frame_sum
    FROM d GROUP BY v ORDER BY media_id
    """,
)
def mm10_scene_cuts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scene-cut detection over MJPEG video — the shot-segmentation
    step a video-training pipeline runs before per-scene sampling or
    captioning: demux every frame (multimodal/avi.py RIFF walking),
    decode each through the SAME stdlib+numpy JPEG pipeline every
    image payload rides, and mark frame f a CUT when its mean-luma
    jump over frame f−1 exceeds {T} gray levels/pixel (planted
    boundaries jump {J}; within-scene drift is <= 3 — the margin makes
    the decision integer-exact: the comparison is on raw pixel SUMS
    vs {T}·npx, no float mean). Per video: frame count, cut count,
    first cut frame, and the cut-index sum. The fixture frames
    round-trip the codec bit-losslessly (mm8 contract), so the oracle
    recomputes every sum in closed form from the generation formulas —
    a hash mismatch pinpoints a demux-order, decode, lag, or
    threshold bug.

    Scale shape: the UDF stage emits one narrow row PER FRAME
    (media_id, frame_idx, pix_sum, npx) from Arrow-batched
    mapInPandas — scan-bound, embarrassingly parallel; the temporal
    logic (lag over (video, frame), threshold, per-video rollup) is
    JVM-side window + aggregate on the frame-count-sized relation,
    all sharing one exchange on media_id. At 100 TB the frame
    relation is the thing you'd persist; the cut logic reruns in
    seconds without touching a byte of video."""
    from pyspark.sql import Window

    from big_data_analytics_spark.multimodal.avi import demux_avi_mjpeg
    from big_data_analytics_spark.multimodal.jpeg import jpeg_planes

    media = _scene_video_fixture(spark)

    def frame_sums(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                for f, jpg in enumerate(demux_avi_mjpeg(bytes(r["content"]))):
                    p = jpeg_planes(jpg)[0]
                    rows.append({
                        "media_id": int(r["media_id"]), "f": f,
                        "s": int(p.sum()),
                        "npx": int(p.shape[0] * p.shape[1]),
                    })
            yield pd.DataFrame(rows)

    fs = (media.select("media_id", "content")
          .mapInPandas(frame_sums, "media_id long, f int, s long, npx long"))
    w = Window.partitionBy("media_id").orderBy("f")
    is_cut = (F.col("s") - F.lag("s").over(w)
              > F.lit(_SC_THRESH) * F.col("npx"))
    return (fs.withColumn("cut", is_cut)
            .groupBy("media_id")
            .agg(F.count(F.lit(1)).cast("int").alias("n_frames"),
                 F.sum(F.coalesce(F.col("cut").cast("int"), F.lit(0)))
                 .cast("int").alias("n_cuts"),
                 F.min(F.when(F.col("cut"), F.col("f"))).cast("int")
                 .alias("first_cut_frame"),
                 F.sum(F.when(F.col("cut"), F.col("f")).otherwise(0))
                 .cast("long").alias("cut_frame_sum")))


mm10_scene_cuts.__doc__ = mm10_scene_cuts.__doc__.format(
    T=_SC_THRESH, J=_SC_JUMP)


_N_VAD = 24         # VAD clips
_VAD_L = 160        # samples per frame (10 ms at 16 kHz)
_VAD_TH = 40_000_000  # frame-energy threshold: quiet max 4e5, loud min 1.6e8


def _vad_fixture(spark: SparkSession) -> DataFrame:
    """{n} executor-encoded PCM16 WAV clips with PLANTED speech/silence
    structure: clip i has nf = 8 + i%5 frames of {L} samples; frame k
    is LOUD iff (k // sl) % 2 == 1 with sl = 2 + i%3 (alternating
    silence/speech runs of sl frames). Sample t of a loud frame is
    1000 + lcg(i,t) % 1000 (|s| >= 1000), of a quiet frame
    lcg(i,t) % 101 - 50 (|s| <= 50), lcg(i,t) = i*7919 + t*104729 —
    per-frame energy is separated by 400x across the threshold, so
    the VAD decision is integer-exact."""
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                nf, sl = 8 + i % 5, 2 + i % 3
                samples = []
                for t in range(nf * _VAD_L):
                    r = i * 7919 + t * 104729
                    if ((t // _VAD_L) // sl) % 2 == 1:
                        samples.append(1000 + r % 1000)
                    else:
                        samples.append(r % 101 - 50)
                content = encode_wav(samples, 16_000)
                rows.append({
                    "media_id": i, "media_type": "audio",
                    "content": content,
                    "meta": {"source": "vad_planted",
                             "byte_size": len(content),
                             "mime": "audio/wav"},
                })
            yield pd.DataFrame(rows)

    return spark.range(_N_VAD).mapInPandas(gen, MEDIA_SCHEMA)


_vad_fixture.__doc__ = _vad_fixture.__doc__.format(n=_N_VAD, L=_VAD_L)


@query(
    "mm11_audio_vad",
    oracle=f"""
    WITH clips AS (
        SELECT i, 8 + i % 5 AS nf, 2 + i % 3 AS sl
        FROM range(0, {_N_VAD}) t(i)
    ), samp AS (
        SELECT c.i, s.t // {_VAD_L} AS k,
               CASE WHEN ((s.t // {_VAD_L}) // c.sl) % 2 = 1
                    THEN 1000 + (c.i * 7919 + s.t * 104729) % 1000
                    ELSE (c.i * 7919 + s.t * 104729) % 101 - 50
               END AS s
        FROM clips c, range(0, {_VAD_L} * 12) s(t)
        WHERE s.t < c.nf * {_VAD_L}
    ), fr AS (
        SELECT i, k, CAST(SUM(s * s) AS BIGINT) AS e
        FROM samp GROUP BY i, k
    ), fl AS (
        SELECT i, k, e, e > {_VAD_TH} AS act,
               LAG(e > {_VAD_TH}) OVER (PARTITION BY i ORDER BY k)
                   AS pact
        FROM fr
    )
    SELECT i AS media_id,
           CAST(COUNT(*) AS INT) AS n_frames,
           CAST(SUM(CASE WHEN act THEN 1 ELSE 0 END) AS INT)
               AS n_active,
           CAST(SUM(CASE WHEN act AND (pact IS NULL OR NOT pact)
                    THEN 1 ELSE 0 END) AS INT) AS n_segments,
           CAST(MIN(CASE WHEN act THEN k END) AS INT)
               AS first_active_frame,
           CAST(SUM(CASE WHEN act THEN k ELSE 0 END) AS BIGINT)
               AS active_frame_sum,
           CAST(SUM(e) AS BIGINT) AS energy
    FROM fl GROUP BY i
    """,
)
def mm11_audio_vad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Energy-threshold voice-activity segmentation over real WAV
    payloads — the audio twin of mm10's scene cuts, and the first step
    an audio-training pipeline runs before transcription or per-
    segment sampling: decode PCM16 bytes (the same stdlib struct path
    mm6 grades), frame into {L}-sample windows, mark a frame ACTIVE
    when its energy Σs² exceeds {TH} (planted loud frames sit 4x
    above, quiet 100x below — the decision is integer-exact), and
    merge consecutive active frames into segments with the
    gaps-and-islands lag trick (gi1's shape, on frames instead of
    days). Per clip: frame/active counts, SEGMENT count, first active
    frame, active-frame index sum, and the exact total energy (byte-
    level corruption anywhere in encode → decode flips it even when
    the threshold decision survives). The oracle recomputes everything
    from the planted generation schedule without seeing a byte — a
    mismatch pinpoints codec, framing, threshold, or lag bugs.

    Scale shape: the UDF stage emits one narrow row PER FRAME
    (media_id, k, e) from Arrow-batched mapInPandas — scan-bound,
    embarrassingly parallel, ~1/{L}00th of the input bytes; the
    temporal logic (lag over (clip, frame), threshold, rollup) is
    JVM-side window + aggregate sharing one exchange on media_id. At
    100 TB of audio the frame-energy relation is what you'd persist;
    re-segmenting at a new threshold never touches a byte of audio."""
    import struct

    import numpy as np
    from pyspark.sql import Window

    from big_data_analytics_spark.multimodal.binary_ops import _wav_pcm

    media = _vad_fixture(spark)

    def frame_energy(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                pcm = _wav_pcm(bytes(content))
                s = np.array(struct.unpack(f"<{len(pcm) // 2}h", pcm),
                             dtype=np.int64)
                e = (s * s).reshape(-1, _VAD_L).sum(axis=1)
                for k, ek in enumerate(e):
                    rows.append({"media_id": int(mid), "k": k,
                                 "e": int(ek)})
            yield pd.DataFrame(rows)

    fr = (media.select("media_id", "content")
          .mapInPandas(frame_energy, "media_id long, k int, e long"))
    w = Window.partitionBy("media_id").orderBy("k")
    act = F.col("e") > _VAD_TH
    fl = (fr.withColumn("act", act)
          .withColumn("pact", F.lag("act").over(w)))
    return (fl.groupBy("media_id")
            .agg(F.count(F.lit(1)).cast("int").alias("n_frames"),
                 F.sum(F.col("act").cast("int")).cast("int")
                 .alias("n_active"),
                 F.sum((F.col("act")
                        & F.coalesce(~F.col("pact"), F.lit(True)))
                       .cast("int")).cast("int").alias("n_segments"),
                 F.min(F.when(F.col("act"), F.col("k"))).cast("int")
                 .alias("first_active_frame"),
                 F.sum(F.when(F.col("act"), F.col("k")).otherwise(0))
                 .cast("long").alias("active_frame_sum"),
                 F.sum("e").cast("long").alias("energy")))


mm11_audio_vad.__doc__ = mm11_audio_vad.__doc__.format(
    L=_VAD_L, TH=_VAD_TH)
