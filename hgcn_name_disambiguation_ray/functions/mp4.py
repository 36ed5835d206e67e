"""Minimal ISO BMFF (MP4) video demuxer + muxer — pure stdlib/numpy.

Reproduces the reference's "video column" surface for real: the
reference treats video as an opaque payload (it ships no video code at
all), but a training-data engine claiming multimodal columns should at
least DEMUX the container. ISO BMFF box structure is plain length-tagged
records, so parsing the sample tables (stsd/stts/stsc/stsz/stco) needs
no codec library; with the in-repo baseline JPEG codec
(`functions/jpeg.py`) this makes MJPEG-in-MP4 frame sampling fully real.
Compressed inter-frame codecs (H.264/H.265/VP9) stay out of scope — the
demuxer surfaces their codec fourcc so callers can route or raise.

`synth_mp4` writes a minimal spec-conformant single-video-track file
(ftyp + mdat + moov) that any standards-compliant demuxer can read; it
exists so tests and fixtures exercise the REAL parse path end-to-end.

Layout references: ISO/IEC 14496-12 (public spec structure; boxes are
[u32 size][4cc type][payload], full boxes add [u8 version][u24 flags]).
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["demux_mp4", "mp4_sample_bytes", "synth_mp4", "is_mp4"]


def is_mp4(payload: bytes) -> bool:
    """ISO BMFF files start with an `ftyp` box."""
    return len(payload) >= 12 and payload[4:8] == b"ftyp"


# --------------------------------------------------------------------------
# box walking
# --------------------------------------------------------------------------

def _boxes(buf: bytes, start: int, end: int):
    """Yield (fourcc, payload_start, payload_end) for each box in
    buf[start:end]. Handles 64-bit `largesize` boxes and size==0
    (extends to end); malformed sizes raise ValueError."""
    pos = start
    while pos + 8 <= end:
        size = struct.unpack_from(">I", buf, pos)[0]
        tag = buf[pos + 4 : pos + 8]
        hdr = 8
        if size == 1:
            if pos + 16 > end:
                raise ValueError("truncated largesize box")
            size = struct.unpack_from(">Q", buf, pos + 8)[0]
            hdr = 16
        elif size == 0:
            size = end - pos
        if size < hdr or pos + size > end:
            raise ValueError(f"malformed box size {size} at offset {pos}")
        yield tag, pos + hdr, pos + size
        pos += size


def _find(buf: bytes, start: int, end: int, tag: bytes):
    """First child box with the given fourcc, as (payload_start, payload_end)."""
    for t, s, e in _boxes(buf, start, end):
        if t == tag:
            return s, e
    return None


def _u32s(buf: bytes, start: int, count: int) -> np.ndarray:
    return np.frombuffer(buf, dtype=">u4", count=count, offset=start).astype(np.int64)


# --------------------------------------------------------------------------
# demux
# --------------------------------------------------------------------------

def demux_mp4(payload: bytes) -> dict:
    """Parse the first VIDEO track's sample tables.

    Returns a dict with:
      codec      sample-entry fourcc (e.g. 'jpeg', 'avc1', 'mp4v')
      width/height   from the stsd VisualSampleEntry
      timescale  media timescale (ticks/second)
      duration   media duration in timescale ticks
      sizes      int64[n_samples]  per-sample byte sizes
      offsets    int64[n_samples]  absolute file offsets (stsc x stco join,
                 vectorized — no per-sample Python loop)
      ts         int64[n_samples]  decode timestamps in timescale ticks
    """
    if not is_mp4(payload):
        raise ValueError("not an ISO BMFF payload (no ftyp box)")
    moov = _find(payload, 0, len(payload), b"moov")
    if moov is None:
        raise ValueError("no moov box")

    for tag, ts_, te in _boxes(payload, *moov):
        if tag != b"trak":
            continue
        mdia = _find(payload, ts_, te, b"mdia")
        if mdia is None:
            continue
        hdlr = _find(payload, *mdia, b"hdlr")
        if hdlr is None or payload[hdlr[0] + 8 : hdlr[0] + 12] != b"vide":
            continue
        return _parse_video_mdia(payload, mdia)
    raise ValueError("no video track")


def _parse_video_mdia(payload: bytes, mdia: tuple[int, int]) -> dict:
    mdhd = _find(payload, *mdia, b"mdhd")
    if mdhd is None:
        raise ValueError("no mdhd box")
    version = payload[mdhd[0]]
    if version == 1:
        timescale = struct.unpack_from(">I", payload, mdhd[0] + 20)[0]
        duration = struct.unpack_from(">Q", payload, mdhd[0] + 24)[0]
    else:
        timescale = struct.unpack_from(">I", payload, mdhd[0] + 12)[0]
        duration = struct.unpack_from(">I", payload, mdhd[0] + 16)[0]

    minf = _find(payload, *mdia, b"minf")
    stbl = _find(payload, *minf, b"stbl") if minf else None
    if stbl is None:
        raise ValueError("no stbl box")

    # stsd: first sample entry carries the codec fourcc and pixel dims.
    stsd = _find(payload, *stbl, b"stsd")
    if stsd is None:
        raise ValueError("no stsd box")
    entry = stsd[0] + 8  # fullbox header (4) + entry_count (4)
    codec = payload[entry + 4 : entry + 8].decode("latin-1").strip()
    # VisualSampleEntry: width/height at entry offsets +32 / +34
    width, height = struct.unpack_from(">HH", payload, entry + 32)

    # stts: (count, delta) runs -> per-sample decode timestamps.
    stts = _find(payload, *stbl, b"stts")
    if stts is None:
        raise ValueError("no stts box")
    n_runs = struct.unpack_from(">I", payload, stts[0] + 4)[0]
    runs = _u32s(payload, stts[0] + 8, 2 * n_runs).reshape(n_runs, 2)
    deltas = np.repeat(runs[:, 1], runs[:, 0])
    ts = np.concatenate([[0], np.cumsum(deltas[:-1])]) if len(deltas) else np.zeros(0, np.int64)

    # stsz: per-sample sizes (or one uniform size).
    stsz = _find(payload, *stbl, b"stsz")
    if stsz is None:
        raise ValueError("no stsz box")
    uniform = struct.unpack_from(">I", payload, stsz[0] + 4)[0]
    n_samples = struct.unpack_from(">I", payload, stsz[0] + 8)[0]
    if uniform:
        sizes = np.full(n_samples, uniform, dtype=np.int64)
    else:
        sizes = _u32s(payload, stsz[0] + 12, n_samples)

    # stco / co64: chunk start offsets.
    stco = _find(payload, *stbl, b"stco")
    if stco is not None:
        n_chunks = struct.unpack_from(">I", payload, stco[0] + 4)[0]
        chunk_off = _u32s(payload, stco[0] + 8, n_chunks)
    else:
        co64 = _find(payload, *stbl, b"co64")
        if co64 is None:
            raise ValueError("no stco/co64 box")
        n_chunks = struct.unpack_from(">I", payload, co64[0] + 4)[0]
        chunk_off = np.frombuffer(
            payload, dtype=">u8", count=n_chunks, offset=co64[0] + 8
        ).astype(np.int64)

    # stsc: (first_chunk, samples_per_chunk, _) runs -> samples per chunk.
    stsc = _find(payload, *stbl, b"stsc")
    if stsc is None:
        raise ValueError("no stsc box")
    n_ent = struct.unpack_from(">I", payload, stsc[0] + 4)[0]
    ent = _u32s(payload, stsc[0] + 8, 3 * n_ent).reshape(n_ent, 3)
    run_len = np.diff(np.concatenate([ent[:, 0], [n_chunks + 1]]))  # chunks per run
    if np.any(run_len < 0) or (n_ent and ent[0, 0] != 1):
        raise ValueError("malformed stsc")
    spc = np.repeat(ent[:, 1], run_len)  # samples per chunk, len n_chunks

    # Vectorized sample -> absolute offset: chunk id per sample, then
    # within-chunk byte prefix from the global size cumsum.
    chunk_of = np.repeat(np.arange(n_chunks, dtype=np.int64), spc)[:n_samples]
    if len(chunk_of) < n_samples:
        raise ValueError("stsc/stsz disagree on sample count")
    csum = np.concatenate([[0], np.cumsum(sizes)])
    first_sample_of_chunk = np.concatenate([[0], np.cumsum(spc)])[:-1]
    within = csum[:-1] - csum[first_sample_of_chunk[chunk_of]]
    offsets = chunk_off[chunk_of] + within

    if len(ts) != n_samples:
        raise ValueError("stts/stsz disagree on sample count")
    if n_samples and int(offsets[-1] + sizes[-1]) > len(payload):
        raise ValueError("sample table points past end of file")
    return {
        "codec": codec,
        "width": int(width),
        "height": int(height),
        "timescale": int(timescale),
        "duration": int(duration),
        "sizes": sizes,
        "offsets": offsets,
        "ts": ts,
    }


def mp4_sample_bytes(payload: bytes, track: dict, idx: int) -> bytes:
    """Raw encoded bytes of sample `idx` (zero-copy slice of the payload)."""
    off = int(track["offsets"][idx])
    return payload[off : off + int(track["sizes"][idx])]


# --------------------------------------------------------------------------
# mux (for tests / fixtures: a real, standards-shaped writer)
# --------------------------------------------------------------------------

def _box(tag: bytes, *parts: bytes) -> bytes:
    body = b"".join(parts)
    return struct.pack(">I", 8 + len(body)) + tag + body


def _full(tag: bytes, version: int, flags: int, *parts: bytes) -> bytes:
    return _box(tag, struct.pack(">I", (version << 24) | flags), *parts)


_MATRIX = struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)


def synth_mp4(
    frames: list[bytes],
    width: int,
    height: int,
    fps: int = 10,
    timescale: int = 1000,
    codec: bytes = b"jpeg",
    frames_per_chunk: int = 0,
) -> bytes:
    """Encoded frame payloads -> a minimal single-video-track MP4.

    `frames_per_chunk` > 0 splits the mdat into multiple chunks (multiple
    stsc/stco entries) so the demuxer's vectorized stsc x stco join is
    exercised; 0 writes one chunk. Frame i gets timestamp
    i * timescale // fps ticks.
    """
    n = len(frames)
    if n == 0:
        raise ValueError("need at least one frame")
    if fps <= 0 or timescale < fps:
        # timescale // fps == 0 would stamp every sample at tick 0 and
        # write duration 0 — reject instead of emitting a degenerate file
        raise ValueError("timescale must be >= fps (sample delta >= 1 tick)")
    delta = timescale // fps
    duration = n * delta
    # a chunk may not claim more samples than exist: clamp so the stsc
    # sample count stays consistent with stsz for strict demuxers
    fpc = min(frames_per_chunk, n) if frames_per_chunk > 0 else n

    ftyp = _box(b"ftyp", b"isom", struct.pack(">I", 0x200), b"isom", b"iso2", b"mp41")
    mdat = _box(b"mdat", *frames)

    # chunk offsets: mdat payload starts 8 bytes into the mdat box
    sizes = np.array([len(f) for f in frames], dtype=np.int64)
    csum = np.concatenate([[0], np.cumsum(sizes)])
    first = np.arange(0, n, fpc)  # first sample index of each chunk
    chunk_offsets = len(ftyp) + 8 + csum[first]
    n_chunks = len(first)
    spc_last = n - int(first[-1])

    stsd_entry = (
        struct.pack(">I", 86)  # VisualSampleEntry fixed size
        + codec.ljust(4)[:4]
        + b"\x00" * 6
        + struct.pack(">H", 1)  # data_reference_index
        + b"\x00" * 16  # pre_defined / reserved
        + struct.pack(">HH", width, height)
        + struct.pack(">II", 0x480000, 0x480000)  # 72 dpi
        + b"\x00" * 4
        + struct.pack(">H", 1)  # frame_count
        + b"\x00" * 32  # compressorname
        + struct.pack(">Hh", 24, -1)  # depth, pre_defined
    )
    # stsc runs: one entry if uniform, else a run for the full chunks and
    # a final entry for the short tail chunk
    stsc_entries = [(1, fpc, 1)]
    if spc_last != fpc and n_chunks > 1:
        stsc_entries.append((n_chunks, spc_last, 1))
    stbl = _box(
        b"stbl",
        _full(b"stsd", 0, 0, struct.pack(">I", 1), stsd_entry),
        _full(b"stts", 0, 0, struct.pack(">III", 1, n, delta)),
        _full(
            b"stsc", 0, 0,
            struct.pack(">I", len(stsc_entries)),
            b"".join(struct.pack(">III", *e) for e in stsc_entries),
        ),
        _full(
            b"stsz", 0, 0,
            struct.pack(">II", 0, n),
            sizes.astype(">u4").tobytes(),
        ),
        _full(
            b"stco", 0, 0,
            struct.pack(">I", n_chunks),
            chunk_offsets.astype(">u4").tobytes(),
        ),
    )
    minf = _box(
        b"minf",
        _full(b"vmhd", 0, 1, struct.pack(">HHHH", 0, 0, 0, 0)),
        _box(b"dinf", _full(b"dref", 0, 0, struct.pack(">I", 1), _full(b"url ", 0, 1))),
        stbl,
    )
    mdia = _box(
        b"mdia",
        _full(b"mdhd", 0, 0, struct.pack(">IIIIHH", 0, 0, timescale, duration, 0x55C4, 0)),
        _full(b"hdlr", 0, 0, struct.pack(">I", 0), b"vide", b"\x00" * 12, b"VideoHandler\x00"),
        minf,
    )
    tkhd = _full(
        b"tkhd", 0, 7,
        struct.pack(">IIII", 0, 0, 1, 0),  # times, track_id, reserved
        struct.pack(">I", duration),
        b"\x00" * 8,
        struct.pack(">HHHH", 0, 0, 0, 0),  # layer, group, volume, reserved
        _MATRIX,
        struct.pack(">II", width << 16, height << 16),
    )
    mvhd = _full(
        b"mvhd", 0, 0,
        struct.pack(">IIII", 0, 0, timescale, duration),
        struct.pack(">IHH", 0x10000, 0x100, 0),  # rate, volume, reserved
        b"\x00" * 8,
        _MATRIX,
        b"\x00" * 24,  # pre_defined
        struct.pack(">I", 2),  # next_track_id
    )
    moov = _box(b"moov", mvhd, _box(b"trak", tkhd, mdia))
    return ftyp + mdat + moov
