"""Multimodal plumbing: schemas, Arrow batching, partitioning, and the
stub contract (real decode raises NotImplementedError; fake decode is
deterministic)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from big_data_analytics_spark.multimodal.binary_ops import (
    DECODED_SCHEMA,
    decode_image,
    encode_bmp,
    frame_sample_plan,
    media_stats,
    synthetic_media,
)


@pytest.fixture(scope="module")
def media(spark):
    return synthetic_media(spark, 120).cache()


def test_media_schema(media):
    assert dict(media.dtypes)["content"] == "binary"
    assert media.count() == 120
    assert media.filter(F.col("meta.byte_size") != F.length("content")).count() == 0


def test_fake_decode_deterministic(media):
    a = decode_image(media, fake=True)
    assert a.schema == DECODED_SCHEMA
    rows1 = sorted(tuple(r) for r in a.collect())
    rows2 = sorted(tuple(r) for r in decode_image(media, fake=True).collect())
    assert rows1 == rows2
    assert len(rows1) == media.filter(F.col("media_type") == "image").count()
    feat = a.first().features
    assert len(feat) == 8 and all(0 <= x <= 1 for x in feat)


def test_real_decode_is_stubbed(media):
    """Without a codec, non-BMP payloads must fail loudly, not
    silently fake data."""
    with pytest.raises(Exception) as ei:
        decode_image(media, fake=False).collect()
    assert "NotImplementedError" in str(ei.value) or isinstance(
        ei.value, NotImplementedError)


def test_real_bmp_decode_end_to_end(spark):
    """Planted uncompressed BMPs decode for real through the
    mapInPandas plan: exact dimensions, 3 channels, and per-channel
    mean features (solid-red 4x3 → means (1, 0, 0); 5-wide rows also
    exercise the 4-byte row padding)."""
    red_4x3 = encode_bmp([[(255, 0, 0)] * 4 for _ in range(3)])
    grad_5x2 = encode_bmp(
        [[(0, 51, 102)] * 5, [(204, 153, 102)] * 5])  # means .4,.4,.4
    df = spark.createDataFrame(
        [(1, "image", red_4x3, ("s", len(red_4x3), "image/bmp")),
         (2, "image", grad_5x2, ("s", len(grad_5x2), "image/bmp"))],
        synthetic_media(spark, 1).schema,
    )
    got = {r.media_id: r for r in decode_image(df, fake=False).collect()}
    assert (got[1].width, got[1].height, got[1].n_channels) == (4, 3, 3)
    assert got[1].features[:3] == pytest.approx([1.0, 0.0, 0.0])
    assert (got[2].width, got[2].height) == (5, 2)
    assert got[2].features[:3] == pytest.approx([0.4, 0.4, 0.4])
    assert got[2].features[3:] == [0.0] * 5


def test_frame_sampling_fanout(media):
    plan = frame_sample_plan(media, every_n=30)
    pdf = plan.toPandas()
    n_videos = media.filter(F.col("media_type") == "video").count()
    assert pdf.media_id.nunique() == n_videos
    # every sampled index is a multiple of the stride and in range
    assert ((pdf.frame_idx % 30) == 0).all()
    assert (pdf.frame_idx < pdf.n_frames).all()


def test_media_stats_prunes_payload(media):
    stats = media_stats(media)
    got = stats.agg(F.sum("n_items")).first()[0]
    assert got == 120
    # payload column must be pruned from the scan plan
    plan = stats._jdf.queryExecution().optimizedPlan().toString()
    assert "content" not in plan or "byte_size" in plan


def test_real_wav_decode_end_to_end(spark):
    """Planted PCM16 WAVs decode through the mapInPandas plan: exact
    rate/channels/length/duration and the RMS of a known square wave
    (amplitude a → RMS a)."""
    from big_data_analytics_spark.multimodal.binary_ops import (
        decode_audio,
        encode_wav,
    )

    square = [16384, -16384] * 800  # 0.5 amplitude, 1600 samples
    silent = [0] * 320
    wav1 = encode_wav(square, sample_rate=16_000)
    wav2 = encode_wav(silent, sample_rate=8_000)
    df = spark.createDataFrame(
        [(1, "audio", wav1, ("s", len(wav1), "audio/wav")),
         (2, "audio", wav2, ("s", len(wav2), "audio/wav"))],
        synthetic_media(spark, 1).schema,
    )
    got = {r.media_id: r for r in decode_audio(df).collect()}
    assert (got[1].sample_rate, got[1].n_channels, got[1].n_samples) == \
        (16_000, 1, 1600)
    assert got[1].duration_s == pytest.approx(0.1)
    assert got[1].rms == pytest.approx(0.5)
    assert got[2].n_samples == 320 and got[2].rms == 0.0
    assert got[2].duration_s == pytest.approx(0.04)


def test_non_wav_audio_fails_loudly(spark):
    from big_data_analytics_spark.multimodal.binary_ops import decode_audio

    df = spark.createDataFrame(
        [(1, "audio", b"\x00" * 64, ("s", 64, "audio/mp3"))],
        synthetic_media(spark, 1).schema,
    )
    with pytest.raises(Exception) as ei:
        decode_audio(df).collect()
    assert "NotImplementedError" in str(ei.value) or isinstance(
        ei.value, NotImplementedError)


def test_resize_image_nearest_neighbor_exact(spark):
    from big_data_analytics_spark.multimodal.binary_ops import (
        _bmp_pixels,
        encode_bmp,
        resize_image,
    )
    # 4x4 quadrant image: TL red, TR green, BL blue, BR white
    R, G, B, W = (255, 0, 0), (0, 255, 0), (0, 0, 255), (255, 255, 255)
    px = [[R, R, G, G],
          [R, R, G, G],
          [B, B, W, W],
          [B, B, W, W]]
    payload = encode_bmp(px)
    df = spark.createDataFrame(
        [(1, "image", bytearray(payload))],
        "media_id long, media_type string, content binary")
    out = resize_image(df, out_w=2, out_h=2).collect()
    assert len(out) == 1 and out[0]["width"] == 2
    resized = _bmp_pixels(bytes(out[0]["resized"]))
    # nearest-neighbor of each 2x2 quadrant keeps its color
    assert resized == [[R, G], [B, W]]


def test_png_roundtrip_all_filters():
    """encode -> decode identity for every scanline filter type; the
    filters change the on-disk bytes but never the pixels."""
    from big_data_analytics_spark.multimodal.binary_ops import (
        _png_pixels,
        encode_png,
    )

    px = [[((x * 37 + 5) % 256, (y * 53 + 5) % 256, (x + y * 7) % 256)
           for x in range(7)] for y in range(5)]
    payloads = {ft: encode_png(px, filter_type=ft) for ft in range(5)}
    for ft, data in payloads.items():
        assert _png_pixels(data) == px, f"filter {ft}"
    # filters actually produce different bytes (the test would be
    # vacuous if encode ignored filter_type)
    assert len({p for p in payloads.values()}) == 5


def test_png_rgba_stats_decode():
    """Color type 6 (RGBA): _parse_png reports 4 channels and exact
    per-channel means; built via a hand-rolled RGBA encoder using the
    same chunk writer conventions."""
    import struct
    import zlib

    from big_data_analytics_spark.multimodal.binary_ops import (
        _PNG_SIG,
        _parse_png,
    )

    w, h = 4, 3
    rows = bytearray()
    for y in range(h):
        rows.append(0)  # filter None
        for x in range(w):
            rows += bytes(((x * 11) % 256, (y * 13) % 256,
                           (x + y) % 256, 200))

    def chunk(typ, body):
        c = typ + body
        return (struct.pack(">I", len(body)) + c
                + struct.pack(">I", zlib.crc32(c)))

    data = (_PNG_SIG
            + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 6, 0, 0, 0))
            + chunk(b"IDAT", zlib.compress(bytes(rows)))
            + chunk(b"IEND", b""))
    st = _parse_png(data, feature_dim=8)
    assert (st["width"], st["height"], st["n_channels"]) == (w, h, 4)
    exp_r = sum((x * 11) % 256 for x in range(w)) * h / (w * h) / 255.0
    assert abs(st["features"][0] - exp_r) < 1e-12
    assert abs(st["features"][3] - 200 / 255.0) < 1e-12


def test_png_boundaries_raise():
    """Interlaced / 16-bit / palette PNGs stay behind the honest
    NotImplementedError boundary; truncated payloads too."""
    import struct
    import zlib

    from big_data_analytics_spark.multimodal.binary_ops import (
        _PNG_SIG,
        _png_scanlines,
        encode_png,
    )

    def chunk(typ, body):
        c = typ + body
        return (struct.pack(">I", len(body)) + c
                + struct.pack(">I", zlib.crc32(c)))

    for depth, ctype, interlace in ((16, 2, 0), (8, 3, 0), (8, 2, 1)):
        data = (_PNG_SIG + chunk(b"IHDR", struct.pack(
            ">IIBBBBB", 2, 2, depth, ctype, 0, 0, interlace))
            + chunk(b"IDAT", zlib.compress(b"\x00" * 16))
            + chunk(b"IEND", b""))
        with pytest.raises(NotImplementedError):
            _png_scanlines(data)
    with pytest.raises(NotImplementedError):
        _png_scanlines(b"not a png at all")
    with pytest.raises(ValueError):
        encode_png([[(0, 0, 0)]], filter_type=7)


def test_png_decode_through_spark_operator(spark):
    """decode_image routes PNG payloads through _parse_png inside the
    Arrow mapInPandas plan (format sniffing by signature, BMP and PNG
    in the same batch)."""
    from big_data_analytics_spark.multimodal.binary_ops import (
        decode_image,
        encode_bmp,
        encode_png,
    )

    px = [[(10, 20, 30)] * 4] * 3
    df = spark.createDataFrame(
        [(1, "image", bytearray(encode_png(px, filter_type=4))),
         (2, "image", bytearray(encode_bmp(px)))],
        "media_id long, media_type string, content binary")
    out = {r["media_id"]: r for r in decode_image(df).collect()}
    for mid in (1, 2):
        r = out[mid]
        assert (r["width"], r["height"], r["n_channels"]) == (4, 3, 3)
        assert abs(r["features"][0] - 10 / 255.0) < 1e-12
        assert abs(r["features"][2] - 30 / 255.0) < 1e-12


def test_resample_audio_exact_picks(spark):
    """Zero-order-hold resample must pick exactly
    samples[floor((j+0.5)*n_in/n_out)] — verified on a ramp where
    every sample equals its own index (any wrong pick shifts the
    value)."""
    import struct

    from big_data_analytics_spark.multimodal.binary_ops import (
        encode_wav,
        resample_audio,
    )

    n_in = 64
    payload = encode_wav(list(range(n_in)), 16_000)
    df = spark.createDataFrame(
        [(1, "audio", bytearray(payload))],
        "media_id long, media_type string, content binary")
    out = resample_audio(df, out_rate=4_000).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["sample_rate"], r["n_samples"]) == (4_000, 16)
    pcm_off = bytes(r["resampled"]).index(b"data") + 8
    got = struct.unpack("<16h", bytes(r["resampled"])[pcm_off:pcm_off + 32])
    assert list(got) == [int((j + 0.5) * 64 / 16) for j in range(16)]


def test_dhash_bit_layout_and_invariance(spark):
    """dHash packs bit gy*8+gx into lo (idx<32) / hi halves; a flat
    image hashes to zero, a strictly right-increasing image sets all
    64 comparison bits, and rescaling the same content leaves the
    hash unchanged (the property that makes dHash a near-dup key)."""
    from big_data_analytics_spark.multimodal.binary_ops import (
        dhash_image,
        encode_bmp,
    )

    def img(mid, w, h, fn):
        px = [[(fn(x, y),) * 3 for x in range(w)] for y in range(h)]
        return (mid, "image", bytearray(encode_bmp(px)))

    rows = [
        img(0, 9, 8, lambda x, y: 7),            # flat -> 0
        img(1, 9, 8, lambda x, y: x * 20),       # increasing -> all bits
        img(2, 18, 16, lambda x, y: (x // 2) * 20),  # 2x upscale of #1
    ]
    df = spark.createDataFrame(
        rows, "media_id long, media_type string, content binary")
    got = {r["media_id"]: (r["h_hi"], r["h_lo"])
           for r in dhash_image(df).collect()}
    assert got[0] == (0, 0)
    assert got[1] == (0xFFFFFFFF, 0xFFFFFFFF)
    assert got[2] == got[1]
