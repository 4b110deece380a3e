"""JPEG codec (baseline SOF0 + progressive SOF2) — stdlib + numpy only.

Closes the last closable codec gap in the multimodal boundary: with
BMP, PNG, and WAV already decoding natively, JPEG's DCT pipeline was
the one image format still behind ``NotImplementedError``. This
module implements the baseline path end-to-end:

- **Decoder** (`jpeg_pixels` / `parse_jpeg`): marker parse
  (DQT/SOF0/DHT/SOS, APPn/COM skipped), canonical Huffman table
  build from the stream's own DHT segments, entropy decode with
  0xFF00 byte-unstuffing, DC differential + AC run/length decode,
  dequantize, 8x8 IDCT (numpy, separable orthonormal basis), level
  shift + clamp, replication upsampling for subsampled chroma
  (4:2:0 / 4:2:2), restart-interval resync (DRI/RSTn with DC
  prediction reset and modulo-8 sequence verification), and
  YCbCr->RGB for 3-component scans. Progressive streams decode
  through the same unified coefficient store: any number of
  spectral-selection / successive-approximation scans (DC bit-plane
  + refinement, AC band scans, the EOBRUN + correction-bit
  refinement protocol). The honest ``NotImplementedError`` boundary
  is now: arithmetic-coded and lossless JPEG — plus ffmpeg video
  containers.
- **Encoder** (`encode_jpeg`): the inverse pipeline (level shift,
  FDCT, quantize, zigzag, DC-diff + run/length Huffman with the
  Annex-K-style tables below, byte stuffing). The encoder exists for
  fixtures and tests: the decoder never assumes the encoder's
  tables — it builds its Huffman/quant tables from the DHT/DQT
  segments in the byte stream, exactly as for a foreign JPEG.

Exactness contract used by the graded query (mm8): a piecewise-
constant 8x8-block grayscale image encoded with a DC quant step of 8
round-trips BIT-LOSSLESSLY — the DCT of a constant block is a single
DC coefficient 8*(v-128) (AC terms quantize to zero from ~1e-13
float residue), 8s/8 = s needs no rounding, and the DC-only IDCT is
s to within 3e-14 before the final round. So the DuckDB oracle can
recompute the decoded pixel sums in closed form from the fixture
formulas. The lossy AC path (zigzag, run/length, EOB/ZRL, full
IDCT) is certified separately in tests/test_multimodal.py against a
direct numpy DCT reference and a coefficient-level Huffman
round-trip.

Reference parity: the reference handles images only as pre-decoded
MNIST-style arrays (data_mining_Assignment1.ipynb, PCA section); a
100 TB training-data pipeline ingests raw bytes, so the decode stage
itself must be a first-class distributed operator — see
binary_ops.decode_image for the mapInPandas plumbing this plugs
into.
"""

from __future__ import annotations

import struct

import numpy as np

# --------------------------------------------------------------------
# Tables
# --------------------------------------------------------------------

#: Zigzag scan order: position k in the scan reads raster index
#: ZIGZAG[k]. Shared by encoder and decoder (self-consistent).
ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
]

#: Annex-K-style luminance Huffman tables (BITS = #codes per length
#: 1..16, HUFFVAL = symbols in canonical order). Correctness does not
#: depend on matching the standard byte-for-byte: the tables are
#: embedded in the DHT segment and the decoder rebuilds them from the
#: stream, so encoder and decoder agree by construction.
DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_VALS = list(range(12))

AC_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125]
AC_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]


def _dct_matrix() -> np.ndarray:
    """Orthonormal 8-point DCT-II basis M: FDCT = M X M^T (after the
    -128 level shift), IDCT = M^T C M. M[0,:] = 1/(2*sqrt(2)), so a
    constant block s has the single coefficient C[0,0] = 8s."""
    m = np.zeros((8, 8))
    for u in range(8):
        c = np.sqrt(0.5) if u == 0 else 1.0
        for x in range(8):
            m[u, x] = 0.5 * c * np.cos((2 * x + 1) * u * np.pi / 16)
    return m


_M = _dct_matrix()


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) per the canonical JPEG assignment
    (codes of each length are consecutive, doubling between lengths)."""
    if len(vals) != sum(bits):
        raise ValueError("HUFFVAL length does not match BITS")
    codes: dict[int, tuple[int, int]] = {}
    code, k = 0, 0
    for length in range(1, 17):
        n = bits[length - 1]
        if code + n > (1 << length):  # Kraft violation
            raise ValueError(f"invalid Huffman BITS at length {length}")
        for _ in range(n):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


def _decode_table(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol, for the bit-serial decoder."""
    return {(ln, c): s for s, (c, ln) in _canonical_codes(bits, vals).items()}


# --------------------------------------------------------------------
# Bit I/O with JPEG byte stuffing
# --------------------------------------------------------------------

class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self._acc = 0
        self._n = 0

    def put(self, code: int, length: int) -> None:
        self._acc = (self._acc << length) | (code & ((1 << length) - 1))
        self._n += length
        while self._n >= 8:
            b = (self._acc >> (self._n - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self._n -= 8
        self._acc &= (1 << self._n) - 1

    def align(self) -> None:
        """Pad to a byte boundary with 1-bits (spec); a pad byte that
        comes out 0xFF gets stuffed like any other entropy byte."""
        if self._n:
            pad = 8 - self._n
            self.put((1 << pad) - 1, pad)

    def raw(self, data: bytes) -> None:
        """Append marker bytes verbatim (no stuffing) — caller must
        have aligned first."""
        assert self._n == 0
        self.out += data

    def flush(self) -> bytes:
        self.align()
        return bytes(self.out)


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self._acc = 0
        self._n = 0

    def bit(self) -> int:
        if self._n == 0:
            if self.pos >= len(self.data):
                raise NotImplementedError("JPEG scan data truncated")
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                if self.pos >= len(self.data):
                    raise NotImplementedError("JPEG scan data truncated")
                nxt = self.data[self.pos]
                if nxt == 0x00:
                    self.pos += 1  # stuffed byte
                else:
                    raise NotImplementedError(
                        "unexpected marker inside entropy data (only "
                        "RSTn at declared restart boundaries is "
                        "handled; the stream is corrupt or uses a "
                        "feature this baseline decoder lacks)")
            self._acc = b
            self._n = 8
        self._n -= 1
        return (self._acc >> self._n) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def sync_restart(self, expect: int) -> None:
        """Consume an RSTn marker at a declared restart boundary:
        discard the current byte's leftover pad bits (the encoder's
        1-bit padding lives in the partially-read final entropy byte,
        so dropping the bit buffer IS the byte-align) and verify the
        modulo-8 marker sequence number."""
        self._n = 0
        if (self.pos + 2 > len(self.data)
                or self.data[self.pos] != 0xFF
                or not 0xD0 <= self.data[self.pos + 1] <= 0xD7):
            raise NotImplementedError(
                "missing RSTn marker at a declared restart interval "
                "boundary — corrupt stream or wrong DRI")
        got = self.data[self.pos + 1] - 0xD0
        if got != expect % 8:
            raise NotImplementedError(
                f"RST sequence error: got RST{got}, "
                f"expected RST{expect % 8}")
        self.pos += 2


def _extend(bits: int, size: int) -> int:
    """T.81 EXTEND: map a magnitude-coded value to its signed value."""
    if size == 0:
        return 0
    if bits < (1 << (size - 1)):
        return bits - (1 << size) + 1
    return bits


def _size_of(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


# --------------------------------------------------------------------
# Encoder
# --------------------------------------------------------------------

def _quantize(coef: np.ndarray, q: np.ndarray) -> np.ndarray:
    """Round-half-up quantization (our fixed convention; the decoder
    only multiplies back, so any consistent rule is valid JPEG)."""
    return np.floor(coef / q + 0.5).astype(np.int64)


def _encode_blocks(mcu_blocks: list[list[tuple[int, list[int]]]],
                   dc_codes, ac_codes, n_comp: int,
                   restart_interval: int = 0) -> bytes:
    """Entropy-encode interleaved MCUs of already-quantized blocks
    (64 zigzag-order coefficients each). ``mcu_blocks[m]`` is the
    MCU's (component-index, block) sequence in scan order — one
    block per component at 1x1 sampling, hi*vi luma blocks first
    under subsampling. DC prediction chains per component, reset at
    every restart boundary (an RST(n mod 8) marker after each
    ``restart_interval`` MCUs)."""
    w = _BitWriter()
    pred = [0] * n_comp
    for m, mcu in enumerate(mcu_blocks):
        if restart_interval and m and m % restart_interval == 0:
            w.align()
            w.raw(bytes([0xFF, 0xD0 + (m // restart_interval - 1) % 8]))
            pred = [0] * n_comp
        for ci, zz in mcu:
            diff = zz[0] - pred[ci]
            pred[ci] = zz[0]
            s = _size_of(diff)
            code, ln = dc_codes[s]
            w.put(code, ln)
            if s:
                w.put(diff if diff > 0 else diff + (1 << s) - 1, s)
            run = 0
            last_nz = max((k for k in range(1, 64) if zz[k]), default=0)
            for k in range(1, 64):
                v = zz[k]
                if v == 0:
                    if k > last_nz:
                        code, ln = ac_codes[0x00]  # EOB
                        w.put(code, ln)
                        break
                    run += 1
                    continue
                while run > 15:
                    code, ln = ac_codes[0xF0]  # ZRL
                    w.put(code, ln)
                    run -= 16
                s = _size_of(v)
                code, ln = ac_codes[(run << 4) | s]
                w.put(code, ln)
                w.put(v if v > 0 else v + (1 << s) - 1, s)
                run = 0
    return w.flush()


def _seg(marker: int, body: bytes) -> bytes:
    return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body


def _quantized_components(pixels, qdc: int, qac: int, color: bool,
                          subsample: bool):
    """Shared encoder front half: color transform, optional 4:2:0
    chroma box-downsample, per-block FDCT + quantize. Returns
    (samp, q, comps) where comps[ci][by][bx] is the block's 64
    quantized coefficients in ZIGZAG order at the component's own
    resolution."""
    h = len(pixels)
    wd = len(pixels[0])
    mod = 16 if (color and subsample) else 8
    if h % mod or wd % mod:
        raise ValueError(
            f"encoder requires dimensions that are multiples of {mod}")
    if subsample and not color:
        raise ValueError("subsample applies to color encoding only")

    if color:
        rgb = np.array(pixels, dtype=np.float64)  # h x w x 3
        r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
        planes = [
            0.299 * r + 0.587 * g + 0.114 * b,
            128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b,
            128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b,
        ]
        if subsample:
            # 2x2 box average halves the chroma planes (the standard
            # 4:2:0 downsample); luma stays full resolution
            planes[1:] = [
                (p[0::2, 0::2] + p[0::2, 1::2]
                 + p[1::2, 0::2] + p[1::2, 1::2]) / 4.0
                for p in planes[1:]
            ]
            samp = [(2, 2), (1, 1), (1, 1)]
        else:
            samp = [(1, 1)] * 3
    else:
        planes = [np.array(pixels, dtype=np.float64)]
        samp = [(1, 1)]

    q = np.full((8, 8), float(qac))
    q[0, 0] = float(qdc)
    comps = []
    for plane in planes:
        bh_, bw_ = plane.shape[0] // 8, plane.shape[1] // 8
        grid = []
        for by in range(bh_):
            row = []
            for bx in range(bw_):
                blk = plane[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8] - 128.0
                c = _quantize(_M @ blk @ _M.T, q)
                row.append([int(c.flat[ZIGZAG[k]]) for k in range(64)])
            grid.append(row)
        comps.append(grid)
    return samp, q, comps


def _jpeg_headers(h: int, wd: int, samp, q, sof_marker: int,
                  dht: list[tuple[int, list[int], list[int]]],
                  restart_interval: int = 0) -> bytearray:
    """SOI + DQT (+DRI) + SOFn + DHT segments shared by the baseline
    and progressive writers. ``dht``: (class<<4|id, BITS, VALS)."""
    ncomp = len(samp)
    zz_q = bytes(int(q.flat[ZIGZAG[k]]) for k in range(64))
    out = bytearray(b"\xff\xd8")  # SOI
    out += _seg(0xDB, bytes([0x00]) + zz_q)  # DQT, 8-bit, table 0
    if restart_interval:
        out += _seg(0xDD, struct.pack(">H", restart_interval))  # DRI
    sof = bytearray([8]) + struct.pack(">HH", h, wd) + bytes([ncomp])
    for ci in range(ncomp):
        hi, vi = samp[ci]
        sof += bytes([ci + 1, (hi << 4) | vi, 0])  # id, sampling, qtbl
    out += _seg(sof_marker, bytes(sof))
    for cls_id, bits, vals in dht:
        out += _seg(0xC4, bytes([cls_id] + bits) + bytes(vals))
    return out


def encode_jpeg(pixels, qdc: int = 8, qac: int = 16,
                color: bool = False, subsample: bool = False,
                restart_interval: int = 0) -> bytes:
    """Baseline sequential JPEG writer. ``pixels`` is rows of ints
    0..255 (grayscale, ``color=False``) or rows of (r, g, b) tuples
    (``color=True``; 4:4:4, or 4:2:0 with ``subsample=True`` — luma
    sampling 2x2, chroma 2x2-box-averaged to half resolution).
    Dimensions must be multiples of 8 (16 for 4:2:0; this is a
    fixture/test encoder, not a general image library). DC/AC quant
    steps are uniform (``qdc`` for the DC term, ``qac`` for all 63 AC
    terms): qdc=8 makes piecewise-constant-block images round-trip
    losslessly (see module doc)."""
    h = len(pixels)
    wd = len(pixels[0])
    samp, q, comps = _quantized_components(pixels, qdc, qac, color,
                                           subsample)
    hmax = max(hi for hi, _ in samp)
    vmax = max(vi for _, vi in samp)
    mcux, mcuy = wd // (8 * hmax), h // (8 * vmax)
    mcu_blocks: list[list[tuple[int, list[int]]]] = []
    for my in range(mcuy):
        for mx in range(mcux):
            mcu: list[tuple[int, list[int]]] = []
            for ci, (hi, vi) in enumerate(samp):
                for byi in range(vi):
                    for bxi in range(hi):
                        mcu.append((ci, comps[ci][my * vi + byi]
                                    [mx * hi + bxi]))
            mcu_blocks.append(mcu)

    dc_codes = _canonical_codes(DC_BITS, DC_VALS)
    ac_codes = _canonical_codes(AC_BITS, AC_VALS)
    scan = _encode_blocks(mcu_blocks, dc_codes, ac_codes, len(samp),
                          restart_interval)

    ncomp = len(samp)
    out = _jpeg_headers(h, wd, samp, q, 0xC0,
                        [(0x00, DC_BITS, DC_VALS),
                         (0x10, AC_BITS, AC_VALS)],
                        restart_interval)
    sos = bytearray([ncomp])
    for ci in range(ncomp):
        sos += bytes([ci + 1, 0x00])  # DC table 0, AC table 0
    sos += bytes([0, 63, 0])  # Ss, Se, Ah/Al
    out += _seg(0xDA, bytes(sos))
    out += scan
    out += b"\xff\xd9"  # EOI
    return bytes(out)


#: Uniform 8-bit AC table for progressive scans: all (run, size)
#: symbols with size <= 10 plus every EOBn (run<<4) and ZRL — 176
#: symbols, Kraft 176/256. Progressive needs EOBn symbols the
#: Annex-K baseline table lacks; uniform lengths keep it trivially
#: canonical (compression is irrelevant for fixtures).
PROG_AC_BITS = [0, 0, 0, 0, 0, 0, 0, 176, 0, 0, 0, 0, 0, 0, 0, 0]
PROG_AC_VALS = [(r << 4) | s for r in range(16) for s in range(11)]


def _put_mag(w: _BitWriter, v: int, nbits: int) -> None:
    """Magnitude-code a nonzero value (baseline/first-scan coding)."""
    w.put(v if v > 0 else v + (1 << nbits) - 1, nbits)


class _ProgACState:
    """Cross-block state for one progressive AC scan: the EOB run
    counter plus the correction bits that ride with it (refinement
    scans only)."""

    def __init__(self, w: _BitWriter, ac_codes) -> None:
        self.w = w
        self.ac = ac_codes
        self.eobrun = 0
        self.bb: list[int] = []  # correction bits buffered with the run

    def sym(self, s: int) -> None:
        code, ln = self.ac[s]
        self.w.put(code, ln)

    def flush_eobrun(self) -> None:
        if self.eobrun > 0:
            nbits = self.eobrun.bit_length() - 1
            self.sym(nbits << 4)
            if nbits:
                self.w.put(self.eobrun - (1 << nbits), nbits)
            self.eobrun = 0
        for bit in self.bb:
            self.w.put(bit, 1)
        self.bb = []


def _prog_ac_first_block(st: _ProgACState, zz, ss: int, se: int,
                         al: int) -> None:
    """Encode one block of a first (Ah=0) AC scan (T.81 G.1.2.2 /
    libjpeg encode_mcu_AC_first): run/size over point-transformed
    magnitudes, trailing zeros folded into the cross-block EOB run."""
    r = 0
    for k in range(ss, se + 1):
        v = zz[k]
        mag = (-v if v < 0 else v) >> al
        if mag == 0:
            r += 1
            continue
        st.flush_eobrun()
        while r > 15:
            st.sym(0xF0)  # ZRL
            r -= 16
        nbits = mag.bit_length()
        st.sym((r << 4) | nbits)
        _put_mag(st.w, mag if v > 0 else -mag, nbits)
        r = 0
    if r > 0:
        st.eobrun += 1
        if st.eobrun == 0x7FFF:
            st.flush_eobrun()


def _prog_ac_refine_block(st: _ProgACState, zz, ss: int, se: int,
                          al: int) -> None:
    """Encode one block of a successive-approximation (Ah=Al+1) AC
    refinement scan — the libjpeg encode_mcu_AC_refine control flow:
    newly-significant coefficients emit (run, 1) + sign, previously-
    significant ones emit one buffered correction bit, ZRLs are only
    emitted when a significant coefficient still follows (otherwise
    everything folds into the EOB run and its buffered bits)."""
    mags = [((-zz[k] if zz[k] < 0 else zz[k]) >> al)
            for k in range(ss, se + 1)]
    eob = 0  # band position AFTER the last newly-significant coeff
    for i, m in enumerate(mags):
        if m == 1:
            eob = ss + i
    r = 0
    br: list[int] = []  # this block's pending correction bits
    for k in range(ss, se + 1):
        m = mags[k - ss]
        if m == 0:
            r += 1
            continue
        while r > 15 and k <= eob:
            st.flush_eobrun()
            st.sym(0xF0)  # ZRL
            r -= 16
            for bit in br:
                st.w.put(bit, 1)
            br = []
        if m > 1:
            br.append(m & 1)
            continue
        st.flush_eobrun()
        st.sym((r << 4) | 1)
        st.w.put(1 if zz[k] > 0 else 0, 1)
        for bit in br:
            st.w.put(bit, 1)
        br = []
        r = 0
    if r > 0 or br:
        st.eobrun += 1
        st.bb.extend(br)
        if st.eobrun == 0x7FFF:
            st.flush_eobrun()


def encode_jpeg_progressive(pixels, qdc: int = 8, qac: int = 16,
                            color: bool = False,
                            subsample: bool = False) -> bytes:
    """Progressive (SOF2, Huffman) JPEG writer over the same quantized
    coefficients as ``encode_jpeg`` — so for any input,
    decode(progressive) must equal decode(baseline) bit-for-bit,
    which is exactly what the round-trip tests assert. The
    progression exercises every scan type the format allows:

    1. DC, all components interleaved, successive approximation
       Ah=0/Al=1 (coarse bit-plane);
    2. DC refinement, Ah=1/Al=0 (one raw bit per block);
    3. per component: AC spectral band 1-5 then 6-63, Ah=0/Al=1;
    4. per component: AC refinement 1-63, Ah=1/Al=0 (the EOBRUN +
       correction-bit path).
    """
    h = len(pixels)
    wd = len(pixels[0])
    samp, q, comps = _quantized_components(pixels, qdc, qac, color,
                                           subsample)
    ncomp = len(samp)
    hmax = max(hi for hi, _ in samp)
    vmax = max(vi for _, vi in samp)
    mcux, mcuy = wd // (8 * hmax), h // (8 * vmax)
    dc_codes = _canonical_codes(DC_BITS, DC_VALS)
    ac_codes = _canonical_codes(PROG_AC_BITS, PROG_AC_VALS)

    out = _jpeg_headers(h, wd, samp, q, 0xC2,
                        [(0x00, DC_BITS, DC_VALS),
                         (0x10, PROG_AC_BITS, PROG_AC_VALS)])

    def sos(comp_ids, ss, se, ah, al, scan_bytes):
        body = bytearray([len(comp_ids)])
        for cid in comp_ids:
            body += bytes([cid, 0x00])
        body += bytes([ss, se, (ah << 4) | al])
        return _seg(0xDA, bytes(body)) + scan_bytes

    def mcu_block_coords():
        for my in range(mcuy):
            for mx in range(mcux):
                for ci, (hi, vi) in enumerate(samp):
                    for byi in range(vi):
                        for bxi in range(hi):
                            yield ci, my * vi + byi, mx * hi + bxi

    # scan 1: interleaved DC first, Al=1 (values arithmetic-shifted)
    w1 = _BitWriter()
    pred = [0] * ncomp
    for ci, by, bx in mcu_block_coords():
        v = comps[ci][by][bx][0] >> 1
        diff = v - pred[ci]
        pred[ci] = v
        s = _size_of(diff)
        code, ln = dc_codes[s]
        w1.put(code, ln)
        if s:
            _put_mag(w1, diff, s)
    out += sos(list(range(1, ncomp + 1)), 0, 0, 0, 1, w1.flush())

    # scan 2: DC refinement, one raw bit per block (Ah=1, Al=0)
    w2 = _BitWriter()
    for ci, by, bx in mcu_block_coords():
        w2.put(comps[ci][by][bx][0] & 1, 1)
    out += sos(list(range(1, ncomp + 1)), 0, 0, 1, 0, w2.flush())

    # per component: AC first scans (two spectral bands, Al=1), then
    # one refinement scan over the full band (Ah=1 -> Al=0)
    for ci in range(ncomp):
        grid = comps[ci]
        blocks = [grid[by][bx] for by in range(len(grid))
                  for bx in range(len(grid[0]))]
        for ss, se in ((1, 5), (6, 63)):
            w3 = _BitWriter()
            st = _ProgACState(w3, ac_codes)
            for zz in blocks:
                _prog_ac_first_block(st, zz, ss, se, 1)
            st.flush_eobrun()
            out += sos([ci + 1], ss, se, 0, 1, w3.flush())
        w4 = _BitWriter()
        st = _ProgACState(w4, ac_codes)
        for zz in blocks:
            _prog_ac_refine_block(st, zz, 1, 63, 0)
        st.flush_eobrun()
        out += sos([ci + 1], 1, 63, 1, 0, w4.flush())

    out += b"\xff\xd9"  # EOI
    return bytes(out)


# --------------------------------------------------------------------
# Decoder — unified coefficient-store architecture. Every scan
# (baseline's single full-band scan, or progressive's DC/AC spectral
# + successive-approximation scans) deposits quantized zigzag-order
# coefficients into a per-component store; dequantize + IDCT +
# upsample + color-transform run once at EOI. Baseline is simply the
# one-scan special case (Ss=0, Se=63, Ah=Al=0, interleaved).
# --------------------------------------------------------------------

def _ac_first(rd, read_symbol, tab, zz, ss: int, se: int, al: int,
              eobrun: int) -> int:
    """First (Ah=0) AC decode for one block's band [ss, se] at point
    transform al, with cross-block EOB-run state. Returns the
    remaining EOB run. Baseline AC is the ss=1, se=63, al=0 case
    (where EOB symbols always carry r=0 -> eobrun stays 0)."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = read_symbol(tab)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r == 15:  # ZRL
                k += 16
                continue
            eobrun = (1 << r) - 1
            if r:
                eobrun += rd.receive(r)
            break
        k += r
        if k > se:
            raise NotImplementedError("AC run past band end")
        zz[k] = _extend(rd.receive(s), s) << al
        k += 1
    return eobrun


def _ac_refine(rd, read_symbol, tab, zz, ss: int, se: int, al: int,
               eobrun: int) -> int:
    """Successive-approximation (Ah=Al+1) AC refinement for one
    block's band: newly-significant coefficients arrive as
    (run, size=1) symbols with a sign bit, previously-significant
    ones as one correction bit each (T.81 G.2 semantics, the
    libjpeg-compatible control flow). Returns remaining EOB run."""
    p1 = 1 << al
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = read_symbol(tab)
            r, s = rs >> 4, rs & 0x0F
            val = 0
            if s == 0:
                if r != 15:
                    eobrun = 1 << r
                    if r:
                        eobrun += rd.receive(r)
                    break
                # r == 15: ZRL — skip 16 zero-history positions
            else:
                if s != 1:
                    raise NotImplementedError(
                        "invalid coefficient size in AC refinement")
                val = p1 if rd.bit() else -p1
            while k <= se:
                if zz[k] != 0:
                    if rd.bit() and (abs(int(zz[k])) & p1) == 0:
                        zz[k] += p1 if zz[k] > 0 else -p1
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if val and k <= se:
                zz[k] = val
            k += 1
    if eobrun > 0:
        while k <= se:
            if zz[k] != 0:
                if rd.bit() and (abs(int(zz[k])) & p1) == 0:
                    zz[k] += p1 if zz[k] > 0 else -p1
            k += 1
        eobrun -= 1
    return eobrun


def _decode_scan_into(store, data: bytes, scan_comps, sof, htables,
                      dri: int, ss: int, se: int, ah: int,
                      al: int) -> int:
    """Decode one entropy-coded scan into the coefficient store and
    return the number of scan bytes consumed (the next marker starts
    there — the encoder's 1-bit padding lives inside the final
    partially-read byte, so rd.pos is already aligned).

    ``scan_comps``: (cid, dc_table, ac_table) in scan order;
    ``sof``: (w, h, [(cid, hi, vi, qid), ...]).
    """
    w, h, sof_comps = sof
    by_id = {c[0]: c for c in sof_comps}
    hmax = max(c[1] for c in sof_comps)
    vmax = max(c[2] for c in sof_comps)
    rd = _BitReader(data)

    def read_symbol(tab):
        code, ln = 0, 0
        while True:
            code = (code << 1) | rd.bit()
            ln += 1
            if (ln, code) in tab:
                return tab[(ln, code)]
            if ln > 16:
                raise NotImplementedError("invalid Huffman code in scan")

    interleaved = len(scan_comps) > 1
    if interleaved:
        mcux = (w + 8 * hmax - 1) // (8 * hmax)
        mcuy = (h + 8 * vmax - 1) // (8 * vmax)
        n_units = mcux * mcuy
    else:
        cid0 = scan_comps[0][0]
        _, hi0, vi0, _ = by_id[cid0]
        cw = (w * hi0 + hmax - 1) // hmax
        ch = (h * vi0 + vmax - 1) // vmax
        bw_c, bh_c = (cw + 7) // 8, (ch + 7) // 8
        n_units = bw_c * bh_c

    pred = {c[0]: 0 for c in scan_comps}
    eobrun = 0
    for u in range(n_units):
        if dri and u and u % dri == 0:
            rd.sync_restart(u // dri - 1)
            pred = {c[0]: 0 for c in scan_comps}
            eobrun = 0
        if interleaved:
            my, mx = divmod(u, mcux)
            blocks = []
            for cid, dc_t, ac_t in scan_comps:
                _, hi, vi, _ = by_id[cid]
                for byi in range(vi):
                    for bxi in range(hi):
                        blocks.append((cid, dc_t, ac_t,
                                       my * vi + byi, mx * hi + bxi))
        else:
            cid, dc_t, ac_t = scan_comps[0]
            by, bx = divmod(u, bw_c)
            blocks = [(cid, dc_t, ac_t, by, bx)]
        for cid, dc_t, ac_t, by, bx in blocks:
            zz = store[cid][by, bx]
            if ss == 0:  # scan carries DC (baseline also carries AC)
                if ah == 0:
                    s = read_symbol(htables[(0, dc_t)])
                    pred[cid] += _extend(rd.receive(s), s)
                    zz[0] = pred[cid] << al
                elif rd.bit():  # DC refinement: one raw bit
                    zz[0] |= 1 << al
                if se > 0:
                    eobrun = _ac_first(rd, read_symbol,
                                       htables[(1, ac_t)], zz,
                                       1, se, al, eobrun)
            elif ah == 0:
                eobrun = _ac_first(rd, read_symbol, htables[(1, ac_t)],
                                   zz, ss, se, al, eobrun)
            else:
                eobrun = _ac_refine(rd, read_symbol,
                                    htables[(1, ac_t)], zz,
                                    ss, se, al, eobrun)
    return rd.pos


def _render(store, sof, qtables) -> list[np.ndarray]:
    """Coefficient store -> per-component full-resolution pixel
    planes (dequantize, IDCT, round/clamp, replication upsample,
    crop)."""
    w, h, sof_comps = sof
    hmax = max(c[1] for c in sof_comps)
    vmax = max(c[2] for c in sof_comps)
    out = []
    for cid, hi, vi, qid in sof_comps:
        grid = store[cid]
        bh_, bw_ = grid.shape[0], grid.shape[1]
        plane = np.zeros((bh_ * 8, bw_ * 8))
        q = qtables[qid]
        for by in range(bh_):
            for bx in range(bw_):
                zz = grid[by, bx]
                coef = np.zeros(64)
                for k in range(64):
                    coef[ZIGZAG[k]] = zz[k] * q[k]
                plane[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8] = (
                    _M.T @ coef.reshape(8, 8) @ _M + 128.0)
        p = np.clip(np.floor(plane + 0.5), 0, 255)
        if hi < hmax or vi < vmax:
            p = np.repeat(np.repeat(p, vmax // vi, axis=0),
                          hmax // hi, axis=1)
        out.append(p[:h, :w])
    return out


def jpeg_planes(data: bytes) -> list[np.ndarray]:
    """Decode a baseline (SOF0) or progressive (SOF2, Huffman) JPEG
    byte stream to per-channel uint8-valued planes (1 plane
    grayscale, 3 planes RGB). All tables come from the stream's own
    DQT/DHT segments; progressive streams may carry any number of
    spectral-selection / successive-approximation scans."""
    if data[:2] != b"\xff\xd8":
        raise NotImplementedError("not a JPEG payload (missing SOI)")
    pos = 2
    qtables: dict[int, list[int]] = {}
    htables: dict[tuple[int, int], dict] = {}
    sof = None
    store = None
    dri = 0
    saw_scan = False
    while pos + 2 <= len(data):
        if data[pos] != 0xFF:
            raise NotImplementedError("JPEG marker stream desynchronized")
        # T.81 B.1.1.2: any number of 0xFF fill bytes may pad before a
        # marker id — skip them so a foreign encoder's padding doesn't
        # desynchronize the parse (0xFF is never itself a marker id).
        while pos + 1 < len(data) and data[pos + 1] == 0xFF:
            pos += 1
        marker = data[pos + 1]
        if marker == 0xD9:  # EOI
            break
        ln = struct.unpack(">H", data[pos + 2:pos + 4])[0]
        body = data[pos + 4:pos + 2 + ln]
        pos += 2 + ln
        if marker == 0xDB:  # DQT (possibly several tables)
            p = 0
            while p < len(body):
                prec, tid = body[p] >> 4, body[p] & 0x0F
                if prec != 0:
                    raise NotImplementedError("16-bit quant tables")
                qtables[tid] = list(body[p + 1:p + 65])
                p += 65
        elif marker == 0xC4:  # DHT (possibly several tables)
            p = 0
            while p < len(body):
                cls, tid = body[p] >> 4, body[p] & 0x0F
                bits = list(body[p + 1:p + 17])
                n = sum(bits)
                vals = list(body[p + 17:p + 17 + n])
                htables[(cls, tid)] = _decode_table(bits, vals)
                p += 17 + n
        elif marker in (0xC0, 0xC2):  # SOF0 baseline / SOF2 progressive
            prec, h, w, nc = body[0], *struct.unpack(">HH", body[1:5]), body[5]
            if prec != 8:
                raise NotImplementedError("only 8-bit precision JPEG")
            comps_sof = []
            for ci in range(nc):
                cid, samp, qid = body[6 + 3 * ci:9 + 3 * ci]
                hi, vi = samp >> 4, samp & 0x0F
                if hi not in (1, 2, 4) or vi not in (1, 2, 4):
                    raise NotImplementedError(
                        f"unsupported sampling factor {hi}x{vi}")
                comps_sof.append((cid, hi, vi, qid))
            hmax = max(c[1] for c in comps_sof)
            vmax = max(c[2] for c in comps_sof)
            if any(hmax % c[1] or vmax % c[2] for c in comps_sof):
                raise NotImplementedError(
                    "non-integral sampling ratios need a fractional "
                    "upsampler this decoder does not implement")
            sof = (w, h, comps_sof)
            mcux = (w + 8 * hmax - 1) // (8 * hmax)
            mcuy = (h + 8 * vmax - 1) // (8 * vmax)
            store = {cid: np.zeros((mcuy * vi, mcux * hi, 64),
                                   dtype=np.int64)
                     for cid, hi, vi, _ in comps_sof}
        elif marker in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                "only baseline (SOF0) and Huffman progressive (SOF2) "
                "JPEG decode here (arithmetic coding / lossless need "
                "an external codec)")
        elif marker == 0xDD:  # DRI — MCUs per restart interval
            dri = struct.unpack(">H", body[:2])[0]
        elif marker == 0xDA:  # SOS — entropy data follows
            if sof is None:
                raise NotImplementedError("SOS before SOF")
            nc = body[0]
            scan_comps = []
            for ci in range(nc):
                cid, tids = body[1 + 2 * ci], body[2 + 2 * ci]
                scan_comps.append((cid, tids >> 4, tids & 0x0F))
            ss, se = body[1 + 2 * nc], body[2 + 2 * nc]
            ahal = body[3 + 2 * nc]
            ah, al = ahal >> 4, ahal & 0x0F
            consumed = _decode_scan_into(store, data[pos:], scan_comps,
                                         sof, htables, dri, ss, se,
                                         ah, al)
            pos += consumed
            saw_scan = True
    if not saw_scan:
        raise NotImplementedError("JPEG stream ended before SOS")
    planes = _render(store, sof, qtables)
    if len(planes) == 1:
        return planes
    if len(planes) == 3:
        y, cb, cr = planes
        r = y + 1.402 * (cr - 128.0)
        g = (y - 0.344136 * (cb - 128.0)
             - 0.714136 * (cr - 128.0))
        b = y + 1.772 * (cb - 128.0)
        return [np.clip(np.floor(p + 0.5), 0, 255)
                for p in (r, g, b)]
    raise NotImplementedError(f"{len(planes)}-component JPEG")


def jpeg_pixels(data: bytes):
    """Decode to rows of (r, g, b) tuples (grayscale replicated) —
    the JPEG twin of binary_ops._png_pixels, for the resize/dhash
    paths."""
    planes = jpeg_planes(data)
    if len(planes) == 1:
        g = planes[0].astype(np.int64)
        return [[(int(v), int(v), int(v)) for v in row] for row in g]
    r, g, b = (p.astype(np.int64) for p in planes)
    hh, ww = r.shape
    return [[(int(r[y, x]), int(g[y, x]), int(b[y, x]))
             for x in range(ww)] for y in range(hh)]


def parse_jpeg(data: bytes, feature_dim: int) -> dict:
    """JPEG → the DECODED_SCHEMA stats (dims, channels, per-channel
    mean intensities padded to ``feature_dim``), same contract as
    binary_ops._parse_bmp/_parse_png."""
    planes = jpeg_planes(data)
    h, w = planes[0].shape
    means = [float(p.mean()) / 255.0 for p in planes]
    return {"width": int(w), "height": int(h),
            "n_channels": len(planes),
            "features": (means + [0.0] * feature_dim)[:feature_dim]}
