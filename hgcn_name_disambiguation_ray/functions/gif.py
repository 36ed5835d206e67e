"""GIF87a/89a codec in pure numpy + stdlib (no imaging library).

Animated GIF is the one inter-frame video format a container without
codec libraries can still decode for real: frames are LZW-compressed
palette rasters composited onto a shared canvas with per-frame disposal
semantics (GIF89a Graphic Control Extension), i.e. genuine temporal
delta coding. `decode_gif` yields every composited full-canvas RGB
frame plus its delay; `synth_gif` writes a spec-compliant file —
including interlaced first frames, transparency, and true inter-frame
DELTA encoding (each subsequent frame stores only the bounding
rectangle of changed pixels) — so round-trip tests can pin exact
equality (GIF is lossless) without external fixtures.

Reference parity note: the reference repo has no imaging code; this
module extends the engine's multimodal-column surface
(stages/multimodal.py) where image decode / frame sampling run as
actor-pool map_batches stages. LZW entropy decode is inherently
sequential (each code's meaning depends on the table built so far), so
that part is a Python loop over codes; everything raster-wide — palette
lookup, interlace reorder, compositing, transparency masking — is
vectorized numpy.
"""

from __future__ import annotations

import struct

import numpy as np

_GIF_MAGICS = (b"GIF87a", b"GIF89a")


def is_gif(payload: bytes) -> bool:
    return payload[:6] in _GIF_MAGICS


# -- LZW ---------------------------------------------------------------------


def _lzw_decode(min_code_size: int, data: bytes, n_pixels: int) -> np.ndarray:
    """GIF-flavor LZW (LSB-first variable-width codes, CLEAR/EOI,
    12-bit max) -> uint8 index array of exactly n_pixels."""
    if not (2 <= min_code_size <= 8):
        raise ValueError("corrupt GIF (bad LZW minimum code size)")
    clear = 1 << min_code_size
    eoi = clear + 1
    base = [bytes([i]) for i in range(clear)] + [b"", b""]

    out = bytearray()
    table = list(base)
    code_size = min_code_size + 1
    prev = -1
    acc = 0
    nbits = 0
    pos = 0
    n = len(data)
    while len(out) < n_pixels:
        while nbits < code_size:
            if pos >= n:
                raise ValueError("truncated GIF LZW stream")
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << code_size) - 1)
        acc >>= code_size
        nbits -= code_size
        if code == clear:
            table = list(base)
            code_size = min_code_size + 1
            prev = -1
            continue
        if code == eoi:
            break
        if prev < 0:
            if code >= len(table):
                raise ValueError("corrupt GIF (first LZW code not in table)")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            if len(table) < 4096:  # table caps at 12-bit codes (deferred clear)
                table.append(table[prev] + entry[:1])
        elif code == len(table) and len(table) < 4096:
            entry = table[prev] + table[prev][:1]
            table.append(entry)
        else:
            raise ValueError("corrupt GIF (LZW code beyond table)")
        out += entry
        prev = code
        if len(table) == (1 << code_size) and code_size < 12:
            code_size += 1
    if len(out) < n_pixels:
        raise ValueError("truncated GIF (not enough pixels)")
    return np.frombuffer(bytes(out[:n_pixels]), dtype=np.uint8)


def _lzw_encode(min_code_size: int, indices: np.ndarray) -> bytes:
    """uint8 index array -> GIF LZW bytes (emits CLEAR at table-full,
    matching the decoder's 4096-entry cap)."""
    clear = 1 << min_code_size
    eoi = clear + 1

    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, size: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += size
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    code_size = min_code_size + 1
    next_code = eoi + 1
    emit(clear, code_size)
    w = b""
    # tobytes() on a wider dtype would silently emit per-byte garbage
    indices = np.ascontiguousarray(indices, dtype=np.uint8)
    for c in indices.tobytes():
        wc = w + bytes([c])
        if wc in table:
            w = wc
            continue
        emit(table[w], code_size)
        table[wc] = next_code
        next_code += 1
        # the decoder's table lags one entry behind, so the width grows
        # only once next_code EXCEEDS 2^size; at 4096 the table is full
        # and a CLEAR resets both sides
        if next_code > 4095:
            emit(clear, code_size)
            table = {bytes([i]): i for i in range(clear)}
            code_size = min_code_size + 1
            next_code = eoi + 1
        elif next_code > (1 << code_size) and code_size < 12:
            code_size += 1
        w = bytes([c])
    if w:
        emit(table[w], code_size)
    emit(eoi, code_size)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


# -- decoder -----------------------------------------------------------------

_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _deinterlace(rows: np.ndarray) -> np.ndarray:
    """(h, w) raster stored in GIF 4-pass interlace order -> display order."""
    h = rows.shape[0]
    order = np.concatenate(
        [np.arange(start, h, step) for start, step in _INTERLACE_PASSES]
    )
    out = np.empty_like(rows)
    out[order] = rows
    return out


def _read_subblocks(payload: bytes, pos: int) -> tuple[bytes, int]:
    chunks = []
    n = len(payload)
    while True:
        if pos >= n:
            raise ValueError("truncated GIF (unterminated sub-blocks)")
        size = payload[pos]
        pos += 1
        if size == 0:
            break
        if pos + size > n:
            raise ValueError("truncated GIF sub-block")
        chunks.append(payload[pos : pos + size])
        pos += size
    return b"".join(chunks), pos


def decode_gif(payload: bytes, max_frames: int | None = None) -> dict:
    """GIF -> {"frames": (n, h, w, 3) uint8 composited full-canvas RGB,
    "delays_ms": (n,) int64}. Disposal methods 0/1 (leave), 2 (restore
    to background) and 3 (restore to previous) and per-frame
    transparency are applied per GIF89a, so each output frame is what a
    viewer would display. Raises ValueError on corrupt input."""
    try:
        return _decode_gif_impl(payload, max_frames)
    except (struct.error, IndexError) as e:
        raise ValueError(f"corrupt GIF ({type(e).__name__}: {e})") from e


def _decode_gif_impl(payload: bytes, max_frames: int | None) -> dict:
    if not is_gif(payload):
        raise ValueError("not a GIF (missing magic)")
    if len(payload) < 13:
        raise ValueError("truncated GIF header")
    w, h, flags, bg_idx, _aspect = struct.unpack_from("<HHBBB", payload, 6)
    if w == 0 or h == 0:
        raise ValueError("empty GIF")
    pos = 13
    gct = None
    if flags & 0x80:
        n_colors = 2 << (flags & 0x07)
        gct = np.frombuffer(payload, dtype=np.uint8, count=3 * n_colors, offset=pos)
        gct = gct.reshape(n_colors, 3)
        pos += 3 * n_colors

    canvas = np.zeros((h, w, 3), dtype=np.uint8)
    if gct is not None and bg_idx < len(gct):
        canvas[:] = gct[bg_idx]
    bg_fill = canvas[0, 0].copy()

    frames: list[np.ndarray] = []
    delays: list[int] = []
    # pending graphic control state for the NEXT image
    disposal = 0
    transparent = -1
    delay_cs = 0
    n = len(payload)
    while pos < n:
        block = payload[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            if pos >= n:
                raise ValueError("truncated GIF extension")
            label = payload[pos]
            pos += 1
            if label == 0xF9:  # graphic control
                size = payload[pos]
                if size != 4:
                    raise ValueError("corrupt GIF (GCE size != 4)")
                gflags, delay_cs, tidx = struct.unpack_from("<BHB", payload, pos + 1)
                disposal = (gflags >> 2) & 0x07
                transparent = tidx if (gflags & 0x01) else -1
                pos += 1 + size
                if payload[pos] != 0:
                    raise ValueError("corrupt GIF (GCE not terminated)")
                pos += 1
            else:  # application / comment / plain text: skip sub-blocks
                _data, pos = _read_subblocks(payload, pos)
        elif block == 0x2C:  # image descriptor
            ix, iy, iw, ih, iflags = struct.unpack_from("<HHHHB", payload, pos)
            pos += 9
            if iw == 0 or ih == 0 or ix + iw > w or iy + ih > h:
                raise ValueError("corrupt GIF (image rect outside canvas)")
            lct = gct
            if iflags & 0x80:
                n_colors = 2 << (iflags & 0x07)
                lct = np.frombuffer(
                    payload, dtype=np.uint8, count=3 * n_colors, offset=pos
                ).reshape(n_colors, 3)
                pos += 3 * n_colors
            if lct is None:
                raise ValueError("corrupt GIF (no color table)")
            min_code = payload[pos]
            pos += 1
            data, pos = _read_subblocks(payload, pos)
            idx = _lzw_decode(min_code, data, iw * ih).reshape(ih, iw)
            if iflags & 0x40:
                idx = _deinterlace(idx)
            if int(idx.max()) >= len(lct):
                raise ValueError("corrupt GIF (pixel index beyond color table)")

            if disposal == 3:
                saved = canvas[iy : iy + ih, ix : ix + iw].copy()
            rgb = lct[idx]  # (ih, iw, 3)
            region = canvas[iy : iy + ih, ix : ix + iw]
            if transparent >= 0:
                mask = idx != transparent
                region[mask] = rgb[mask]
            else:
                region[:] = rgb
            frames.append(canvas.copy())
            delays.append(delay_cs * 10)
            if disposal == 2:
                canvas[iy : iy + ih, ix : ix + iw] = bg_fill
            elif disposal == 3:
                canvas[iy : iy + ih, ix : ix + iw] = saved
            disposal = 0
            transparent = -1
            delay_cs = 0
            if max_frames is not None and len(frames) >= max_frames:
                break
        else:
            raise ValueError(f"corrupt GIF (unknown block 0x{block:02x})")
    if not frames:
        raise ValueError("GIF contains no image")
    return {
        "frames": np.stack(frames),
        "delays_ms": np.asarray(delays, dtype=np.int64),
    }


def decode_gif_first(payload: bytes) -> np.ndarray:
    """First composited frame as (h, w, 3) uint8 — the still-image view."""
    return decode_gif(payload, max_frames=1)["frames"][0]


# -- encoder -----------------------------------------------------------------


def _interlace_rows(h: int) -> np.ndarray:
    return np.concatenate([np.arange(s, h, p) for s, p in _INTERLACE_PASSES])


def synth_gif(
    frames: np.ndarray,
    delays_ms: list[int] | None = None,
    interlace: bool = False,
    delta: bool = True,
    loop: bool = True,
) -> bytes:
    """(n, h, w, 3) uint8 RGB -> a real GIF payload. All frames must draw
    from one palette of <= 256 distinct colors (GIF is palettized —
    callers quantize first). `delta=True` stores each frame after the
    first as only the bounding rectangle of changed pixels (disposal 1,
    true inter-frame coding); `interlace` stores the first frame in
    4-pass interlace order. Lossless: decode_gif returns the input
    frames exactly."""
    frames = np.asarray(frames, dtype=np.uint8)
    if frames.ndim == 3:
        frames = frames[None]
    if frames.ndim != 4 or frames.shape[3] != 3:
        raise ValueError("synth_gif needs (n, h, w, 3) uint8 RGB")
    n_frames, h, w = frames.shape[:3]
    if n_frames == 0 or h == 0 or w == 0:
        raise ValueError("empty GIF input")
    if delays_ms is None:
        delays_ms = [100] * n_frames

    # build the shared palette
    flat = frames.reshape(-1, 3)
    colors, inverse = np.unique(flat, axis=0, return_inverse=True)
    if len(colors) > 256:
        raise ValueError(
            f"synth_gif needs <= 256 distinct colors, got {len(colors)} "
            "(quantize first)"
        )
    index_frames = inverse.reshape(n_frames, h, w).astype(np.uint8)
    # palette size = power of two >= max(2, n_colors)
    depth = max(1, int(len(colors) - 1).bit_length())
    pal = np.zeros((1 << depth, 3), dtype=np.uint8)
    pal[: len(colors)] = colors
    min_code = max(2, depth)

    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | ((depth - 1) & 0x07), 0, 0)
    out += pal.tobytes()
    if loop and n_frames > 1:
        # NETSCAPE2.0 looping application extension
        out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00"

    for fi in range(n_frames):
        idx = index_frames[fi]
        ix = iy = 0
        iw, ih = w, h
        if delta and fi > 0:
            diff = index_frames[fi] != index_frames[fi - 1]
            ys, xs = np.nonzero(diff)
            if len(ys) == 0:
                ix = iy = 0
                iw = ih = 1  # spec requires a non-empty image; store 1 px
            else:
                iy, ix = int(ys.min()), int(xs.min())
                ih, iw = int(ys.max()) - iy + 1, int(xs.max()) - ix + 1
            idx = index_frames[fi, iy : iy + ih, ix : ix + iw]
        # graphic control: disposal 1 (leave in place), no transparency
        out += b"\x21\xf9\x04" + struct.pack(
            "<BHB", 0x04, max(0, int(delays_ms[fi])) // 10, 0
        ) + b"\x00"
        use_il = interlace and fi == 0 and ih == h
        out += b"\x2c" + struct.pack(
            "<HHHHB", ix, iy, iw, ih, 0x40 if use_il else 0x00
        )
        rast = idx[_interlace_rows(ih)] if use_il else idx
        out.append(min_code)
        lzw = _lzw_encode(min_code, rast.reshape(-1))
        for off in range(0, len(lzw), 255):
            chunk = lzw[off : off + 255]
            out.append(len(chunk))
            out += chunk
        out.append(0)  # sub-block terminator
    out.append(0x3B)  # trailer
    return bytes(out)
