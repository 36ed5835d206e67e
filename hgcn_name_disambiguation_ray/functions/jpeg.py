"""Baseline + progressive JPEG (ITU-T T.81) codec in pure numpy + stdlib.

The container ships no imaging library, but DCT JPEG needs none: the
format is canonical Huffman coding + an 8x8 DCT, both implementable with
`struct` and numpy. `decode_jpeg` handles the overwhelming majority of
web JPEGs — baseline (SOF0), extended-sequential (SOF1) AND progressive
(SOF2, spectral selection + successive approximation + EOB runs) 8-bit
scans, grayscale or YCbCr, any sampling factors up to 2x2 (4:4:4 /
4:2:2 / 4:2:0), restart intervals — and raises ValueError on anything
else (arithmetic coding, 12-bit, hierarchical). `synth_jpeg` writes a
spec-compliant baseline file (Annex K quant + Huffman tables) — or,
with `progressive=True`, a multi-scan progressive file using the
standard IJG scan script — so tests can round-trip without external
fixtures; any standard viewer opens its output.

Reference parity note: the reference repo has no imaging code either —
this module exists for the engine's multimodal-column surface
(stages/multimodal.py), where image decode is an actor-pool map_batches
stage. Entropy decode is inherently sequential per block (each Huffman
code's length is only known after decoding it), so that part walks
coefficients in Python; everything block-parallel — level shift, DCT /
IDCT, quantization, zigzag, color transform, upsampling — is vectorized
numpy over ALL blocks of a component at once.
"""

from __future__ import annotations

import struct

import numpy as np

# -- constants (ITU-T T.81 Annex K) -----------------------------------------

# zigzag position -> row-major index inside an 8x8 block
ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10,
        17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34,
        27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36,
        29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46,
        53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

_QUANT_LUMA = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int64,
)

_QUANT_CHROMA = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.int64,
)

# (bits-per-length[1..16], symbol values) per Annex K table
_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125],
    [
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
    ],
)
_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
        0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
        0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
        0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
        0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
        0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
        0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
        0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
        0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
        0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
        0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
        0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
        0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
        0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
        0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
        0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)


# AC table for progressive scans. The Annex K sequential tables lack the
# EOBn symbols (r<<4 | 0 for r = 1..14) that progressive end-of-band run
# coding emits, so the progressive encoder uses this uniform table: all
# 176 legal AC symbols — (run, size) for size 1..10, EOB0..EOB14, ZRL —
# at code length 8. Kraft sum 176/256 < 1 and the all-ones 8-bit code
# stays unused, so the table is spec-valid (suboptimal compression is
# fine for synthesized fixtures; the decoder handles any valid table).
_AC_PROG = (
    [0, 0, 0, 0, 0, 0, 0, 176, 0, 0, 0, 0, 0, 0, 0, 0],
    [(r << 4) | s for r in range(16) for s in range(11)],
)


def _dct_matrix() -> np.ndarray:
    """Orthonormal 8-point DCT-II matrix T: forward F = T B T', inverse
    B = T' F T (T.81 A.3.3 with the 1/2 C(u) normalization folded in)."""
    n = np.arange(8, dtype=np.float64)
    k = n.reshape(-1, 1)
    t = 0.5 * np.cos((2.0 * n + 1.0) * k * np.pi / 16.0)
    t[0, :] = 0.5 / np.sqrt(2.0)
    return t


_DCT = _dct_matrix()


def _scale_quant(table: np.ndarray, quality: int) -> np.ndarray:
    """IJG quality scaling: 1..100 -> scaled Annex-K table, clipped to
    [1, 255] (8-bit Pq)."""
    q = int(min(100, max(1, quality)))
    scale = 5000 // q if q < 50 else 200 - 2 * q
    return np.clip((table * scale + 50) // 100, 1, 255).astype(np.int64)


# -- canonical Huffman -------------------------------------------------------


def _huff_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) for the encoder (T.81 C.2 code assignment)."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _huff_lut(bits: list[int], vals: list[int]) -> tuple[np.ndarray, np.ndarray]:
    """Flat 16-bit-prefix lookup for the decoder: peek 16 bits, index the
    LUT, get (symbol, code length) in O(1). length 0 marks an invalid
    prefix (corrupt stream)."""
    sym = np.full(1 << 16, -1, dtype=np.int16)
    ln = np.zeros(1 << 16, dtype=np.uint8)
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            lo = code << (16 - length)
            span = 1 << (16 - length)
            sym[lo : lo + span] = vals[k]
            ln[lo : lo + span] = length
            code += 1
            k += 1
        if code > (1 << length) - 1 + 1:
            raise ValueError("invalid Huffman table (overfull)")
        code <<= 1
    return sym, ln


class _BitWriter:
    """MSB-first bit accumulator with 0xFF byte stuffing (T.81 F.1.2.3)."""

    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        if length == 0:
            return
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            byte = (self.acc >> (self.n - 8)) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:
                self.buf.append(0x00)
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def flush(self) -> None:
        if self.n:
            pad = 8 - self.n
            byte = ((self.acc << pad) | ((1 << pad) - 1)) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:
                self.buf.append(0x00)
            self.acc = 0
            self.n = 0


class _BitReader:
    """MSB-first reader over an already-destuffed entropy segment; reads
    past the end return zero bits (the spec pads the final byte)."""

    __slots__ = ("data", "pos", "nbits")

    def __init__(self, data: bytes) -> None:
        self.data = data + b"\x00\x00\x00"
        self.pos = 0
        self.nbits = len(data) * 8

    def peek16(self) -> int:
        if self.pos > self.nbits + 7:
            raise ValueError("truncated JPEG entropy stream")
        byte = self.pos >> 3
        d = self.data
        v = (d[byte] << 16) | (d[byte + 1] << 8) | d[byte + 2]
        return (v >> (8 - (self.pos & 7))) & 0xFFFF

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        if self.pos + n > self.nbits + 7:
            raise ValueError("truncated JPEG entropy stream")
        v = self.peek16() >> (16 - n)
        self.pos += n
        return v


def _extend(v: int, s: int) -> int:
    """T.81 F.2.2.1 EXTEND: map an s-bit magnitude to its signed value."""
    return v - (1 << s) + 1 if v < (1 << (s - 1)) else v


def _category(v: int) -> int:
    return int(abs(v)).bit_length()


# -- encoder ------------------------------------------------------------------


def _to_blocks(plane: np.ndarray, by: int, bx: int) -> np.ndarray:
    """Pad a 2-D plane (edge-replicate) to (by*8, bx*8) and return the
    (by, bx, 8, 8) block view."""
    h, w = plane.shape
    padded = np.pad(plane, ((0, by * 8 - h), (0, bx * 8 - w)), mode="edge")
    return padded.reshape(by, 8, bx, 8).transpose(0, 2, 1, 3)


def _fdct_quant(blocks: np.ndarray, qtab64: np.ndarray) -> np.ndarray:
    """(by, bx, 8, 8) spatial -> (by, bx, 64) quantized coefs in zigzag
    order, all blocks at once."""
    f = np.einsum("ij,abjk,lk->abil", _DCT, blocks - 128.0, _DCT, optimize=True)
    q = np.round(f / qtab64.reshape(8, 8)).astype(np.int64)
    return q.reshape(q.shape[0], q.shape[1], 64)[..., ZIGZAG]


def _encode_block(
    bw: _BitWriter,
    coefs: np.ndarray,
    pred: int,
    dc_codes: dict[int, tuple[int, int]],
    ac_codes: dict[int, tuple[int, int]],
) -> int:
    dc = int(coefs[0])
    diff = dc - pred
    s = _category(diff)
    code, length = dc_codes[s]
    bw.write(code, length)
    if s:
        bw.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
    nz = np.flatnonzero(coefs[1:])
    last = int(nz[-1]) + 1 if nz.size else 0
    run = 0
    for k in range(1, last + 1):
        v = int(coefs[k])
        if v == 0:
            run += 1
            continue
        while run >= 16:
            code, length = ac_codes[0xF0]  # ZRL
            bw.write(code, length)
            run -= 16
        s = _category(v)
        code, length = ac_codes[(run << 4) | s]
        bw.write(code, length)
        bw.write(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    if last < 63:
        code, length = ac_codes[0x00]  # EOB
        bw.write(code, length)
    return dc


def synth_jpeg(
    pixels: np.ndarray,
    quality: int = 90,
    subsample: bool = False,
    gray: bool = False,
    restart_interval: int = 0,
    progressive: bool = False,
) -> bytes:
    """(h, w, 3) uint8 RGB -> a real baseline JPEG payload. 4:4:4 by
    default; `subsample=True` writes 4:2:0 (2x2 luma sampling) to
    exercise the decoder's chroma upsampling; `gray=True` writes a
    1-component luminance-only file; `restart_interval` emits DRI + RSTn
    markers every that many MCUs (baseline) / restart units (progressive).
    `progressive=True` writes a multi-scan SOF2 file following the IJG
    default scan script (DC first + refine, spectral AC bands, two
    successive-approximation AC refinement passes) — the quantized
    coefficients after all scans equal the baseline encoding exactly, so
    a progressive round-trip decodes byte-identically to the baseline
    file of the same pixels. Annex-K tables at the IJG quality scaling;
    any standard viewer opens the output."""
    if pixels.ndim != 3 or pixels.shape[2] != 3:
        raise ValueError("synth_jpeg needs (h, w, 3) uint8 RGB")
    h, w = pixels.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("empty image")
    rgb = pixels.astype(np.float64)
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    q_luma = _scale_quant(_QUANT_LUMA, quality)
    q_chroma = _scale_quant(_QUANT_CHROMA, quality)

    if gray:
        hmax = vmax = 1
        comps = [(y, q_luma, 1, 1, 0)]
    elif subsample:
        hmax = vmax = 2
        # 2x2 box-mean chroma (pad odd dims by edge replication first)
        cbp = np.pad(cb, ((0, h % 2), (0, w % 2)), mode="edge")
        crp = np.pad(cr, ((0, h % 2), (0, w % 2)), mode="edge")
        ch, cw = cbp.shape[0] // 2, cbp.shape[1] // 2
        cb_s = cbp.reshape(ch, 2, cw, 2).mean(axis=(1, 3))
        cr_s = crp.reshape(ch, 2, cw, 2).mean(axis=(1, 3))
        comps = [(y, q_luma, 2, 2, 0), (cb_s, q_chroma, 1, 1, 1), (cr_s, q_chroma, 1, 1, 1)]
    else:
        hmax = vmax = 1
        comps = [(y, q_luma, 1, 1, 0), (cb, q_chroma, 1, 1, 1), (cr, q_chroma, 1, 1, 1)]

    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    coef_grids = []
    for plane, qtab, hi, vi, _qid in comps:
        by, bx = mcuy * vi, mcux * hi
        coef_grids.append(_fdct_quant(_to_blocks(plane, by, bx), qtab))

    out = bytearray(b"\xff\xd8")  # SOI

    def seg(marker: int, body: bytes) -> None:
        out.extend(struct.pack(">BBH", 0xFF, marker, len(body) + 2))
        out.extend(body)

    seg(0xDB, bytes([0x00]) + bytes(q_luma[ZIGZAG].astype(np.uint8)))
    if not gray:
        seg(0xDB, bytes([0x01]) + bytes(q_chroma[ZIGZAG].astype(np.uint8)))
    sof = struct.pack(">BHHB", 8, h, w, len(comps))
    for cid, (_p, _q, hi, vi, qid) in enumerate(comps, start=1):
        sof += struct.pack(">BBB", cid, (hi << 4) | vi, qid)
    seg(0xC2 if progressive else 0xC0, sof)
    tables = [(0, 0, _DC_LUMA)]
    tables += [(1, 0, _AC_PROG)] if progressive else [(1, 0, _AC_LUMA)]
    if not gray:
        tables += [(0, 1, _DC_CHROMA)]
        if not progressive:
            tables += [(1, 1, _AC_CHROMA)]
    for cls, tid, (bits, vals) in tables:
        seg(0xC4, bytes([(cls << 4) | tid]) + bytes(bits) + bytes(vals))
    if restart_interval:
        seg(0xDD, struct.pack(">H", restart_interval))

    if progressive:
        _write_progressive_scans(
            out, seg, coef_grids, comps, h, w, hmax, vmax, mcux, mcuy,
            restart_interval, gray,
        )
        out.extend(b"\xff\xd9")  # EOI
        return bytes(out)

    dc_l = _huff_codes(*_DC_LUMA)
    ac_l = _huff_codes(*_AC_LUMA)
    dc_c = _huff_codes(*_DC_CHROMA)
    ac_c = _huff_codes(*_AC_CHROMA)
    huff = [(dc_l, ac_l), (dc_c, ac_c), (dc_c, ac_c)]

    bw = _BitWriter()
    preds = [0] * len(comps)
    done = 0
    rst = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and done and done % restart_interval == 0:
                bw.flush()
                bw.buf.extend((0xFF, 0xD0 + rst))
                rst = (rst + 1) % 8
                preds = [0] * len(comps)
            for ci, (_plane, _qtab, hi, vi, _qid) in enumerate(comps):
                for dy in range(vi):
                    for dx in range(hi):
                        coefs = coef_grids[ci][my * vi + dy, mx * hi + dx]
                        preds[ci] = _encode_block(
                            bw, coefs, preds[ci], huff[ci][0], huff[ci][1]
                        )
            done += 1
    bw.flush()
    sos = bytes([len(comps)])
    for cid in range(1, len(comps) + 1):
        tid = 0 if cid == 1 else 1
        sos += struct.pack(">BB", cid, (tid << 4) | tid)
    sos += bytes([0, 63, 0])
    seg(0xDA, sos)
    out.extend(bw.buf)
    out.extend(b"\xff\xd9")  # EOI
    return bytes(out)


# -- progressive encoder (T.81 Annex G, encode side) -------------------------
#
# Scan script = the IJG default: an approximated DC scan, spectral AC
# bands at reduced precision, then successive-approximation refinement
# passes down to full precision. After the last scan every quantized
# coefficient equals the sequential encoding exactly.


def _emit_restart(bw: _BitWriter, rst: int) -> int:
    bw.flush()
    bw.buf.extend((0xFF, 0xD0 + rst))
    return (rst + 1) % 8


def _enc_dc_scan(
    bw: _BitWriter,
    coef_grids: list[np.ndarray],
    comps: list,
    mcux: int,
    mcuy: int,
    ah: int,
    al: int,
    restart_interval: int,
) -> None:
    """Interleaved DC scan: first pass (ah == 0) Huffman-codes diffs of
    the point-transformed DC (arithmetic shift right by al, G.1.2.1);
    refinement (ah > 0) emits one raw bit (dc >> al) & 1 per block."""
    dc_tabs = [_huff_codes(*(_DC_LUMA if ci == 0 else _DC_CHROMA)) for ci in range(len(comps))]
    preds = [0] * len(comps)
    done = 0
    rst = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and done and done % restart_interval == 0:
                rst = _emit_restart(bw, rst)
                preds = [0] * len(comps)
            for ci, (_plane, _qtab, hi, vi, _qid) in enumerate(comps):
                for dy in range(vi):
                    for dx in range(hi):
                        dc = int(coef_grids[ci][my * vi + dy, mx * hi + dx][0])
                        if ah == 0:
                            v = dc >> al
                            diff = v - preds[ci]
                            preds[ci] = v
                            s = _category(diff)
                            code, length = dc_tabs[ci][s]
                            bw.write(code, length)
                            if s:
                                bw.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
                        else:
                            bw.write((dc >> al) & 1, 1)
            done += 1
    bw.flush()


class _EobState:
    """Pending end-of-band run + the correction bits it owns (G.1.2.3 /
    the IJG encoder's EOBRUN + BE buffer)."""

    __slots__ = ("run", "bits")

    def __init__(self) -> None:
        self.run = 0
        self.bits: list[int] = []

    def flush(self, bw: _BitWriter, ac_codes: dict[int, tuple[int, int]]) -> None:
        if self.run > 0:
            nb = self.run.bit_length() - 1
            code, length = ac_codes[nb << 4]
            bw.write(code, length)
            if nb:
                bw.write(self.run - (1 << nb), nb)
            self.run = 0
            for b in self.bits:
                bw.write(b, 1)
            self.bits = []


def _enc_ac_first_scan(
    bw: _BitWriter,
    grid: np.ndarray,
    hb: int,
    wb: int,
    ss: int,
    se: int,
    al: int,
    ac_codes: dict[int, tuple[int, int]],
    restart_interval: int,
) -> None:
    """Non-interleaved AC first scan over one component's block grid:
    run/size coding of the point-transformed band (magnitude truncated
    by al) with EOBn end-of-band run accumulation."""
    st = _EobState()
    done = 0
    rst = 0
    for y in range(hb):
        for x in range(wb):
            if restart_interval and done and done % restart_interval == 0:
                st.flush(bw, ac_codes)
                rst = _emit_restart(bw, rst)
            band = grid[y, x][ss : se + 1]
            t = np.sign(band) * (np.abs(band) >> al)
            nz = np.flatnonzero(t)
            if nz.size == 0:
                st.run += 1
                if st.run == 0x7FFF:
                    st.flush(bw, ac_codes)
            else:
                st.flush(bw, ac_codes)
                run = 0
                last = int(nz[-1])
                for k in range(last + 1):
                    v = int(t[k])
                    if v == 0:
                        run += 1
                        continue
                    while run >= 16:
                        code, length = ac_codes[0xF0]  # ZRL
                        bw.write(code, length)
                        run -= 16
                    s = _category(v)
                    code, length = ac_codes[(run << 4) | s]
                    bw.write(code, length)
                    bw.write(v if v >= 0 else v + (1 << s) - 1, s)
                    run = 0
                if last < se - ss:
                    st.run = 1  # trailing zeros open a new EOB run
            done += 1
    st.flush(bw, ac_codes)
    bw.flush()


def _enc_ac_refine_scan(
    bw: _BitWriter,
    grid: np.ndarray,
    hb: int,
    wb: int,
    ss: int,
    se: int,
    al: int,
    ac_codes: dict[int, tuple[int, int]],
    restart_interval: int,
) -> None:
    """Non-interleaved AC refinement scan (G.1.2.3): newly-significant
    coefficients code as (run<<4)|1 + sign bit; previously-nonzero ones
    contribute buffered correction bits emitted after the next symbol
    (or after the EOBn that closes their run)."""
    st = _EobState()
    done = 0
    rst = 0
    for y in range(hb):
        for x in range(wb):
            if restart_interval and done and done % restart_interval == 0:
                st.flush(bw, ac_codes)
                rst = _emit_restart(bw, rst)
            band = grid[y, x][ss : se + 1]
            absv = np.abs(band) >> al
            ones = np.flatnonzero(absv == 1)
            eob = int(ones[-1]) if ones.size else -1
            run = 0
            br_bits: list[int] = []
            for k in range(se - ss + 1):
                t = int(absv[k])
                if t == 0:
                    run += 1
                    continue
                while run > 15 and k <= eob:
                    st.flush(bw, ac_codes)
                    code, length = ac_codes[0xF0]
                    bw.write(code, length)
                    run -= 16
                    for b in br_bits:
                        bw.write(b, 1)
                    br_bits = []
                if t > 1:
                    br_bits.append(t & 1)
                    continue
                st.flush(bw, ac_codes)
                code, length = ac_codes[(run << 4) | 1]
                bw.write(code, length)
                bw.write(1 if int(band[k]) >= 0 else 0, 1)
                for b in br_bits:
                    bw.write(b, 1)
                br_bits = []
                run = 0
            if run > 0 or br_bits:
                st.run += 1
                st.bits.extend(br_bits)
                # bound the pending run / bit buffer like the IJG encoder
                if st.run == 0x7FFF or len(st.bits) > 937:
                    st.flush(bw, ac_codes)
            done += 1
    st.flush(bw, ac_codes)
    bw.flush()


def _write_progressive_scans(
    out: bytearray,
    seg,
    coef_grids: list[np.ndarray],
    comps: list,
    h: int,
    w: int,
    hmax: int,
    vmax: int,
    mcux: int,
    mcuy: int,
    restart_interval: int,
    gray: bool,
) -> None:
    ac_codes = _huff_codes(*_AC_PROG)
    if gray:
        script = [
            ("dc", None, 0, 0, 0, 1),
            ("ac", 0, 1, 63, 0, 1),
            ("dc", None, 0, 0, 1, 0),
            ("ac", 0, 1, 63, 1, 0),
        ]
    else:
        # IJG default scan script (jcparam.c jpeg_simple_progression)
        script = [
            ("dc", None, 0, 0, 0, 1),
            ("ac", 0, 1, 5, 0, 2),
            ("ac", 2, 1, 63, 0, 1),
            ("ac", 1, 1, 63, 0, 1),
            ("ac", 0, 6, 63, 0, 2),
            ("ac", 0, 1, 63, 2, 1),
            ("dc", None, 0, 0, 1, 0),
            ("ac", 2, 1, 63, 1, 0),
            ("ac", 1, 1, 63, 1, 0),
            ("ac", 0, 1, 63, 1, 0),
        ]
    for kind, ci, ss, se, ah, al in script:
        bw = _BitWriter()
        if kind == "dc":
            sos = bytes([len(comps)])
            for cid in range(1, len(comps) + 1):
                dc_tid = 0 if cid == 1 else 1
                sos += struct.pack(">BB", cid, dc_tid << 4)
            sos += bytes([ss, se, (ah << 4) | al])
            _enc_dc_scan(
                bw, coef_grids, comps, mcux, mcuy, ah, al, restart_interval
            )
        else:
            _plane, _qtab, hi, vi, _qid = comps[ci]
            wb = -(-(-(-w * hi // hmax)) // 8)
            hb = -(-(-(-h * vi // vmax)) // 8)
            sos = bytes([1]) + struct.pack(">BB", ci + 1, 0)
            sos += bytes([ss, se, (ah << 4) | al])
            if ah == 0:
                _enc_ac_first_scan(
                    bw, coef_grids[ci], hb, wb, ss, se, al, ac_codes,
                    restart_interval,
                )
            else:
                _enc_ac_refine_scan(
                    bw, coef_grids[ci], hb, wb, ss, se, al, ac_codes,
                    restart_interval,
                )
        seg(0xDA, sos)
        out.extend(bw.buf)


# -- decoder ------------------------------------------------------------------


def _decode_block(
    br: _BitReader,
    dc_lut: tuple[np.ndarray, np.ndarray],
    ac_lut: tuple[np.ndarray, np.ndarray],
    pred: int,
) -> tuple[np.ndarray, int]:
    """One block of entropy decode -> (64 quantized coefs in zigzag order,
    new DC predictor)."""
    out = np.zeros(64, dtype=np.int64)
    s = _read_huff(br, dc_lut)
    if s > 15:
        raise ValueError("corrupt JPEG (DC category > 15)")
    dc = pred + (_extend(br.read(s), s) if s else 0)
    out[0] = dc
    k = 1
    while k < 64:
        rs = _read_huff(br, ac_lut)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r == 15:  # ZRL
                k += 16
                continue
            break  # EOB
        k += r
        if k > 63:
            raise ValueError("corrupt JPEG (AC run past block end)")
        out[k] = _extend(br.read(s), s)
        k += 1
    return out, dc


def _idct_all(coefs: np.ndarray) -> np.ndarray:
    """(by, bx, 8, 8) dequantized natural-order coefs -> spatial samples,
    all blocks at once."""
    return (
        np.einsum("ji,abjk,kl->abil", _DCT, coefs, _DCT, optimize=True) + 128.0
    )


def _read_huff(br: _BitReader, lut: tuple[np.ndarray, np.ndarray]) -> int:
    """Decode one Huffman symbol via the 16-bit-prefix LUT."""
    sym_t, len_t = lut
    v = br.peek16()
    length = int(len_t[v])
    if length == 0:
        raise ValueError("corrupt JPEG (invalid Huffman code)")
    br.pos += length
    return int(sym_t[v])


def _split_restart_segments(entropy: bytes) -> list[bytes]:
    """Split a scan's entropy data at RSTn markers, destuffing 0xFF00."""
    segments: list[bytes] = []
    cur = bytearray()
    i = 0
    m = len(entropy)
    while i < m:
        byte = entropy[i]
        if byte == 0xFF and i + 1 < m:
            nxt = entropy[i + 1]
            if nxt == 0x00:
                cur.append(0xFF)
                i += 2
                continue
            if 0xD0 <= nxt <= 0xD7:
                segments.append(bytes(cur))
                cur = bytearray()
                i += 2
                continue
        cur.append(byte)
        i += 1
    segments.append(bytes(cur))
    return segments


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline / extended-sequential / progressive JPEG -> (h, w, 3)
    uint8 RGB. Grayscale expands to RGB; 4:2:0 / 4:2:2 chroma upsamples
    by sample replication (nearest), matching the spec's minimum
    decoder. Progressive (SOF2) accumulates coefficients across scans —
    spectral selection, successive approximation (DC and AC refinement),
    EOB runs and restart markers all per T.81 Annex G. Raises ValueError
    on arithmetic-coded, 12-bit, hierarchical, or corrupt input —
    ALWAYS ValueError: malformed headers that would surface as
    struct.error / IndexError are converted so callers'
    on_error=\"skip\" / fake-mode fallthroughs (which catch ValueError)
    hold for arbitrary corrupt payloads."""
    try:
        return _decode_jpeg_impl(payload)
    except (struct.error, IndexError, ZeroDivisionError) as e:
        raise ValueError(f"corrupt JPEG ({type(e).__name__}: {e})") from e


def _decode_sequential_scan(
    entropy: bytes,
    sel: list[tuple[int, int, int]],
    comps: list[tuple[int, int, int, int]],
    grids: list[np.ndarray],
    hufs: dict,
    restart_interval: int,
    mcux: int,
    mcuy: int,
) -> None:
    segments = _split_restart_segments(entropy)
    mcus_per_seg = restart_interval if restart_interval else mcuy * mcux
    seg_idx = 0
    br = _BitReader(segments[0])
    preds = [0] * len(comps)
    done = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if done and done % mcus_per_seg == 0:
                seg_idx += 1
                if seg_idx >= len(segments):
                    raise ValueError("truncated JPEG (missing restart segment)")
                br = _BitReader(segments[seg_idx])
                preds = [0] * len(comps)
            for comp_idx, dc_tid, ac_tid in sel:
                _cid, hi, vi, _qid = comps[comp_idx]
                dc_lut = hufs.get((0, dc_tid))
                ac_lut = hufs.get((1, ac_tid))
                if dc_lut is None or ac_lut is None:
                    raise ValueError("JPEG scan references missing Huffman table")
                for dy in range(vi):
                    for dx in range(hi):
                        coefs, preds[comp_idx] = _decode_block(
                            br, dc_lut, ac_lut, preds[comp_idx]
                        )
                        grids[comp_idx][my * vi + dy, mx * hi + dx] = coefs
            done += 1


def _dec_ac_first(
    br: _BitReader,
    ac_lut: tuple[np.ndarray, np.ndarray],
    block: np.ndarray,
    ss: int,
    se: int,
    al: int,
    eobrun: int,
) -> int:
    """AC first scan, one block (T.81 G.2 / IJG decode_mcu_AC_first).
    Returns the remaining end-of-band run."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = _read_huff(br, ac_lut)
        r, s = rs >> 4, rs & 0x0F
        if s:
            k += r
            if k > se:
                raise ValueError("corrupt JPEG (AC run past band end)")
            block[k] = _extend(br.read(s), s) << al
            k += 1
        else:
            if r != 15:  # EOBn: run = 2^r + extra bits, this block included
                eobrun = (1 << r) - 1
                if r:
                    eobrun += br.read(r)
                return eobrun
            k += 16  # ZRL
    return 0


def _dec_ac_refine(
    br: _BitReader,
    ac_lut: tuple[np.ndarray, np.ndarray],
    block: np.ndarray,
    ss: int,
    se: int,
    al: int,
    eobrun: int,
) -> int:
    """AC successive-approximation refinement, one block (T.81 G.1.2.3 /
    IJG decode_mcu_AC_refine): newly-significant coefficients arrive as
    (run<<4)|1 + sign bit; every already-nonzero coefficient passed over
    (including the whole band during an EOB run) reads one correction
    bit. Returns the remaining end-of-band run."""
    p1 = 1 << al
    m1 = -p1
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = _read_huff(br, ac_lut)
            r, s = rs >> 4, rs & 0x0F
            newval = 0
            if s:
                if s != 1:
                    raise ValueError("corrupt JPEG (AC refine category != 1)")
                newval = p1 if br.read(1) else m1
            elif r != 15:
                eobrun = 1 << r
                if r:
                    eobrun += br.read(r)
                break
            # advance over r newly-zero coefficients (16 for ZRL), refining
            # existing nonzeros along the way
            while k <= se:
                c = int(block[k])
                if c != 0:
                    if br.read(1) and (c & p1) == 0:
                        block[k] = c + (p1 if c >= 0 else m1)
                else:
                    r -= 1
                    if r < 0:
                        break
                k += 1
            if newval:
                if k > se:
                    raise ValueError("corrupt JPEG (AC refine past band end)")
                block[k] = newval
            k += 1
    if eobrun > 0:
        while k <= se:
            c = int(block[k])
            if c != 0:
                if br.read(1) and (c & p1) == 0:
                    block[k] = c + (p1 if c >= 0 else m1)
            k += 1
        eobrun -= 1
    return eobrun


def _decode_progressive_scan(
    entropy: bytes,
    sel: list[tuple[int, int, int]],
    ss: int,
    se: int,
    ah: int,
    al: int,
    frame: tuple,
    grids: list[np.ndarray],
    hufs: dict,
    restart_interval: int,
) -> None:
    """One progressive scan: DC (interleaved or single-component) or AC
    (always single-component) band, first pass or refinement, restart
    intervals resetting predictors and EOB runs."""
    fh, fw, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = -(-fw // (8 * hmax))
    mcuy = -(-fh // (8 * vmax))
    is_dc = ss == 0
    if is_dc and se != 0:
        raise ValueError("corrupt JPEG (progressive DC scan with Se != 0)")
    if not is_dc and len(sel) != 1:
        raise ValueError("corrupt JPEG (interleaved progressive AC scan)")
    if se > 63 or ss > se or ah > 13 or al > 13:
        raise ValueError("corrupt JPEG (bad progressive scan header)")

    # restart units: MCUs when interleaved, single blocks when not
    units: list[list[tuple[int, int, int]]] = []
    if len(sel) > 1:
        for my in range(mcuy):
            for mx in range(mcux):
                unit = []
                for comp_idx, _dt, _at in sel:
                    _cid, hi, vi, _qid = comps[comp_idx]
                    for dy in range(vi):
                        for dx in range(hi):
                            unit.append((comp_idx, my * vi + dy, mx * hi + dx))
                units.append(unit)
    else:
        comp_idx = sel[0][0]
        _cid, hi, vi, _qid = comps[comp_idx]
        wb = -(-(-(-fw * hi // hmax)) // 8)
        hb = -(-(-(-fh * vi // vmax)) // 8)
        units = [[(comp_idx, y, x)] for y in range(hb) for x in range(wb)]

    luts = {}
    for comp_idx, dc_tid, ac_tid in sel:
        if is_dc and ah == 0:
            lut = hufs.get((0, dc_tid))
        elif not is_dc:
            lut = hufs.get((1, ac_tid))
        else:
            lut = True  # DC refinement reads raw bits, no table needed
        if lut is None:
            raise ValueError("JPEG scan references missing Huffman table")
        luts[comp_idx] = lut

    segments = _split_restart_segments(entropy)
    mcus_per_seg = restart_interval if restart_interval else len(units)
    seg_idx = 0
    br = _BitReader(segments[0])
    preds = [0] * len(comps)
    eobrun = 0
    done = 0
    p1 = 1 << al
    for unit in units:
        if done and done % mcus_per_seg == 0:
            seg_idx += 1
            if seg_idx >= len(segments):
                raise ValueError("truncated JPEG (missing restart segment)")
            br = _BitReader(segments[seg_idx])
            preds = [0] * len(comps)
            eobrun = 0
        for comp_idx, by, bx in unit:
            block = grids[comp_idx][by, bx]
            if is_dc:
                if ah == 0:
                    s = _read_huff(br, luts[comp_idx])
                    if s > 15:
                        raise ValueError("corrupt JPEG (DC category > 15)")
                    diff = _extend(br.read(s), s) if s else 0
                    preds[comp_idx] += diff
                    block[0] = preds[comp_idx] << al
                else:
                    if br.read(1):
                        block[0] = int(block[0]) | p1
            elif ah == 0:
                eobrun = _dec_ac_first(br, luts[comp_idx], block, ss, se, al, eobrun)
            else:
                eobrun = _dec_ac_refine(br, luts[comp_idx], block, ss, se, al, eobrun)
        done += 1


def _decode_jpeg_impl(payload: bytes) -> np.ndarray:
    if not payload.startswith(b"\xff\xd8"):
        raise ValueError("not a JPEG (missing SOI)")
    qtabs: dict[int, np.ndarray] = {}
    hufs: dict[tuple[int, int], tuple[np.ndarray, np.ndarray]] = {}
    frame = None  # (h, w, [(cid, hi, vi, qid)])
    progressive = False
    restart_interval = 0
    grids: list[np.ndarray] | None = None
    geo = None  # (hmax, vmax, mcux, mcuy)
    n_scans = 0
    pos = 2
    n = len(payload)
    while pos + 4 <= n:
        if payload[pos] != 0xFF:
            raise ValueError("corrupt JPEG (expected marker)")
        # any number of 0xFF fill bytes may precede a marker code
        # (T.81 B.1.1.2) — encoders that pad with them are spec-valid
        while pos + 1 < n and payload[pos + 1] == 0xFF:
            pos += 1
        marker = payload[pos + 1]
        if marker == 0xD9:  # EOI
            break
        if pos + 4 > n:
            raise ValueError("truncated JPEG segment")
        (length,) = struct.unpack_from(">H", payload, pos + 2)
        body = payload[pos + 4 : pos + 2 + length]
        if len(body) < length - 2:
            raise ValueError("truncated JPEG segment")
        pos += 2 + length
        if marker == 0xDB:  # DQT (possibly several tables)
            b = body
            while b:
                pq, tq = b[0] >> 4, b[0] & 0x0F
                if pq != 0:
                    raise ValueError("unsupported JPEG (16-bit quant table)")
                if len(b) < 65:
                    raise ValueError("truncated DQT")
                zz = np.frombuffer(b[1:65], dtype=np.uint8).astype(np.int64)
                nat = np.zeros(64, dtype=np.int64)
                nat[ZIGZAG] = zz
                qtabs[tq] = nat
                b = b[65:]
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/SOF1/SOF2
            prec, fh, fw, nc = struct.unpack_from(">BHHB", body, 0)
            if prec != 8:
                raise ValueError("unsupported JPEG (12-bit precision)")
            comps = []
            for i in range(nc):
                cid, samp, qid = struct.unpack_from(">BBB", body, 6 + 3 * i)
                comps.append((cid, samp >> 4, samp & 0x0F, qid))
            frame = (fh, fw, comps)
            progressive = marker == 0xC2
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError("unsupported JPEG (non-DCT or arithmetic SOF)")
        elif marker == 0xC4:  # DHT (possibly several tables)
            b = body
            while b:
                cls, tid = b[0] >> 4, b[0] & 0x0F
                bits = list(b[1:17])
                count = sum(bits)
                vals = list(b[17 : 17 + count])
                if len(vals) < count:
                    raise ValueError("truncated DHT")
                hufs[(cls, tid)] = _huff_lut(bits, vals)
                b = b[17 + count :]
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("JPEG scan before frame header")
            fh, fw, comps = frame
            ns = body[0]
            if len(body) < 4 + 2 * ns:
                raise ValueError("truncated JPEG scan header")
            sel = []
            cid_to_idx = {c[0]: i for i, c in enumerate(comps)}
            for i in range(ns):
                cid, tids = body[1 + 2 * i], body[2 + 2 * i]
                if cid not in cid_to_idx:
                    raise ValueError("JPEG scan references unknown component")
                sel.append((cid_to_idx[cid], tids >> 4, tids & 0x0F))
            ss, se, ahal = body[1 + 2 * ns], body[2 + 2 * ns], body[3 + 2 * ns]
            ah, al = ahal >> 4, ahal & 0x0F
            # entropy data runs to the next non-RST, non-stuffed marker
            end = pos
            while end + 1 < n:
                if payload[end] == 0xFF and payload[end + 1] not in (0x00,) and not (
                    0xD0 <= payload[end + 1] <= 0xD7
                ):
                    break
                end += 1
            entropy = payload[pos:end]
            pos = end
            if grids is None:
                if fh == 0 or fw == 0:
                    raise ValueError("empty JPEG")
                hmax = max(c[1] for c in comps)
                vmax = max(c[2] for c in comps)
                if hmax < 1 or vmax < 1 or hmax > 2 or vmax > 2:
                    raise ValueError("unsupported JPEG (sampling factor > 2)")
                mcux = -(-fw // (8 * hmax))
                mcuy = -(-fh // (8 * vmax))
                geo = (hmax, vmax, mcux, mcuy)
                grids = [
                    np.zeros((mcuy * vi, mcux * hi, 64), dtype=np.int64)
                    for _cid, hi, vi, _qid in comps
                ]
            n_scans += 1
            if progressive:
                _decode_progressive_scan(
                    entropy, sel, ss, se, ah, al, frame, grids, hufs,
                    restart_interval,
                )
            else:
                if len(sel) != len(comps):
                    raise ValueError("unsupported JPEG (multi-scan sequential)")
                _decode_sequential_scan(
                    entropy, sel, comps, grids, hufs, restart_interval,
                    geo[2], geo[3],
                )
                break  # sequential: single scan carries the whole image
        # APPn / COM / anything else: skipped via its length
    if frame is None or grids is None or n_scans == 0:
        raise ValueError("missing JPEG frame or scan")
    fh, fw, comps = frame
    hmax, vmax, mcux, mcuy = geo
    for _cid, _hi, _vi, qid in comps:
        if qid not in qtabs:
            raise ValueError("JPEG component references missing quant table")

    planes = []
    for (grid, (_cid, hi, vi, qid)) in zip(grids, comps):
        by, bx = grid.shape[0], grid.shape[1]
        # grid holds coefs in ZIGZAG order, qtabs in natural order: permute
        # the table into zigzag order before the elementwise dequant (the
        # scatter below then maps both back to natural together)
        deq = (grid * qtabs[qid][ZIGZAG][None, None, :]).astype(np.float64)
        nat = np.zeros((by, bx, 64), dtype=np.float64)
        nat[..., ZIGZAG] = deq
        spatial = _idct_all(nat.reshape(by, bx, 8, 8))
        plane = spatial.transpose(0, 2, 1, 3).reshape(by * 8, bx * 8)
        # upsample to full resolution by sample replication, then crop
        plane = np.repeat(np.repeat(plane, vmax // vi, axis=0), hmax // hi, axis=1)
        planes.append(plane[:fh, :fw])

    if len(planes) == 1:
        # round like the 3-component path below — a bare uint8 cast would
        # truncate and bias gray decodes down by up to 1 LSB vs color
        ych = np.clip(planes[0], 0, 255).round()
        return np.repeat(ych[..., None], 3, axis=2).astype(np.uint8)
    if len(planes) != 3:
        raise ValueError(f"unsupported JPEG ({len(planes)} components)")
    y, cb, cr = planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(np.stack([r, g, b], axis=-1), 0, 255).round().astype(np.uint8)
