"""Minimal AVI (RIFF) container muxer/demuxer for MJPEG video —
dependency-free (stdlib ``struct`` only), closing the video half of
the multimodal boundary at the CONTAINER level.

MJPEG-in-AVI is the one mainstream video format whose frames are
independently decodable stills: every ``00dc`` chunk in the ``movi``
list is a complete baseline JPEG, so the existing stdlib+numpy JPEG
codec (multimodal/jpeg.py) decodes each frame and the container work
reduces to RIFF chunk walking. Inter-frame codecs (H.264/VP9/AV1)
need a real motion-compensation decoder and stay behind the
documented ``NotImplementedError`` boundary — the demuxer checks the
stream's FourCC and refuses anything but MJPG explicitly rather than
emitting garbage.

Layout written (and accepted) here, per the AVI 1.0 spec:

    RIFF 'AVI '
      LIST 'hdrl'
        'avih' MainAVIHeader (56 bytes)
        LIST 'strl'
          'strh' AVIStreamHeader (56 bytes, fccType='vids', handler='MJPG')
          'strf' BITMAPINFOHEADER (40 bytes, biCompression='MJPG')
      LIST 'movi'
        '00dc' <jpeg bytes> (word-aligned)
        ...
      'idx1' index entries (16 bytes per frame)

Reference scope note: the reference project has no video handling at
all; this module exists for the training-data-pipeline surface
(frame sampling / per-frame feature extraction over video columns).
"""

from __future__ import annotations

import struct

_AVIF_HASINDEX = 0x00000010


def _chunk(fourcc: bytes, body: bytes) -> bytes:
    pad = b"\x00" if len(body) % 2 else b""
    return fourcc + struct.pack("<I", len(body)) + body + pad


def _list(fourcc: bytes, body: bytes) -> bytes:
    return _chunk(b"LIST", fourcc + body)


def encode_avi_mjpeg(frames: list[bytes], width: int, height: int,
                     fps: int = 10) -> bytes:
    """Mux independently-encoded JPEG frames into a spec-conformant
    single-stream MJPEG AVI. Frames must share one geometry (that is
    the container's contract, not a simplification)."""
    if not frames:
        raise ValueError("an AVI needs at least one frame")
    n = len(frames)
    max_bytes = max(len(f) for f in frames)
    avih = struct.pack(
        "<IIIIIIIIIIIIII",
        1_000_000 // fps,      # dwMicroSecPerFrame
        max_bytes * fps,       # dwMaxBytesPerSec
        0,                     # dwPaddingGranularity
        _AVIF_HASINDEX,        # dwFlags
        n,                     # dwTotalFrames
        0,                     # dwInitialFrames
        1,                     # dwStreams
        max_bytes,             # dwSuggestedBufferSize
        width, height,
        0, 0, 0, 0)            # dwReserved[4]
    strh = (b"vids" + b"MJPG"
            + struct.pack("<IHHIIIIIIIII",
                          0,        # dwFlags
                          0, 0,     # wPriority, wLanguage
                          0,        # dwInitialFrames
                          1, fps,   # dwScale, dwRate -> fps
                          0,        # dwStart
                          n,        # dwLength (frames)
                          max_bytes,  # dwSuggestedBufferSize
                          0,        # dwQuality
                          0,        # dwSampleSize (0: varying)
                          0)        # rcFrame (packed as one dword pair)
            + struct.pack("<HH", width, height))
    strf = struct.pack("<IiiHHIIiiII",
                       40, width, height, 1, 24, 0x47504A4D,  # 'MJPG'
                       width * height * 3, 0, 0, 0, 0)
    hdrl = _list(b"hdrl",
                 _chunk(b"avih", avih)
                 + _list(b"strl",
                         _chunk(b"strh", strh) + _chunk(b"strf", strf)))
    movi_items, idx, off = [], [], 4  # offsets count from 'movi' fourcc
    for f in frames:
        item = _chunk(b"00dc", f)
        movi_items.append(item)
        idx.append(struct.pack("<4sIII", b"00dc", 0x10, off, len(f)))
        off += len(item)
    movi = _list(b"movi", b"".join(movi_items))
    idx1 = _chunk(b"idx1", b"".join(idx))
    riff_body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


def _walk(data: bytes, pos: int, end: int):
    """Yield (fourcc, body_start, body_len) for each chunk in
    data[pos:end], honoring word alignment."""
    while pos + 8 <= end:
        fourcc = data[pos:pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        yield fourcc, pos + 8, size
        pos += 8 + size + (size % 2)


def demux_avi_mjpeg(data: bytes) -> list[bytes]:
    """Extract the JPEG payload of every video-stream frame, in order.

    Walks the RIFF structure (never trusts idx1 — indexes are
    optional and routinely wrong in the wild). Streams are numbered by
    ``strl`` position in ``hdrl``; the FIRST stream whose ``strh``
    fccType is ``vids`` is the video stream: its ``strf``
    biCompression must be MJPG, and only ITS ``NNdc``/``NNdb`` chunks
    are collected from the ``movi`` list (including inside ``rec ``
    groups). A multi-stream file (e.g. audio-first) therefore neither
    mis-reads an audio ``strf``'s bytes 16:20 as a compression FourCC
    nor merges chunks across streams. Any non-MJPG video compression
    raises ``NotImplementedError`` — the honest inter-frame-codec
    boundary."""
    if data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI payload")
    end = min(len(data), 8 + struct.unpack_from("<I", data, 4)[0])
    frames: list[bytes] = []
    compression = None
    vid_prefix = None  # b"NN" chunk-id prefix of the first vids stream

    def _movi_chunks(pos: int, stop: int):
        for f2, b2, s2 in _walk(data, pos, stop):
            if f2 == b"LIST" and data[b2:b2 + 4] == b"rec ":
                yield from _movi_chunks(b2 + 4, b2 + s2)
            else:
                yield f2, b2, s2

    for fourcc, body, size in _walk(data, 12, end):
        if fourcc != b"LIST":
            continue
        kind = data[body:body + 4]
        if kind == b"hdrl":
            stream_no = 0
            for f2, b2, s2 in _walk(data, body + 4, body + size):
                if not (f2 == b"LIST" and data[b2:b2 + 4] == b"strl"):
                    continue
                is_vids = False
                for f3, b3, s3 in _walk(data, b2 + 4, b2 + s2):
                    if f3 == b"strh" and s3 >= 4:
                        is_vids = data[b3:b3 + 4] == b"vids"
                    elif (f3 == b"strf" and s3 >= 20 and is_vids
                          and vid_prefix is None):
                        compression = data[b3 + 16:b3 + 20]
                        vid_prefix = b"%02d" % stream_no
                stream_no += 1
        elif kind == b"movi":
            if vid_prefix is None or compression != b"MJPG":
                raise NotImplementedError(
                    f"only MJPG AVI video streams are decodable here; "
                    f"video compression is "
                    f"{(compression or b'?').decode('latin1')!r} — "
                    "inter-frame codecs need a motion-compensation "
                    "decoder (documented boundary)")
            for f2, b2, s2 in _movi_chunks(body + 4, body + size):
                if (len(f2) == 4 and f2[:2] == vid_prefix
                        and f2[2:4] in (b"dc", b"db")):
                    frames.append(bytes(data[b2:b2 + s2]))
    return frames
