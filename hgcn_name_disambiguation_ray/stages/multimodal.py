"""Multimodal columns: binary payloads + typed metadata, actor-pool stages.

Images / audio / video are opaque `binary` columns with sidecar metadata
(mime, width/height or duration). The Ray-side plumbing — schemas, small
batch sizes for wide rows, actor-pool stage shape, output layout — is
real and tested. IMAGE/VIDEO codec calls are STUBBED (this container
ships no image/video libraries): `DecodeImage` raises NotImplementedError
unless `fake=True`, in which case a clearly-marked deterministic fake
derives pseudo pixels from the payload hash so downstream stages
(resize / feature-extract / frame-sample) can be exercised end-to-end.
AUDIO decode is REAL: RIFF/WAV PCM parses with the stdlib `wave` module
(`DecodeAudio`), and `AudioFeatures` computes genuine DSP (RMS,
zero-crossing rate, FFT spectral centroid) — no stub on that path.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from ray.data import Dataset

from hgcn_name_disambiguation_ray.functions.hashing import stable_hash64

def _u8_list(rows: list[np.ndarray]) -> pa.ListArray:
    """Variable-length uint8 rows -> list<uint8> via one flat buffer."""
    lens = np.array([len(r) for r in rows], dtype=np.int64)
    offsets = np.zeros(len(rows) + 1, dtype=np.int64)
    np.cumsum(lens, out=offsets[1:])
    flat = np.concatenate(rows) if rows else np.zeros(0, dtype=np.uint8)
    return pa.ListArray.from_arrays(pa.array(offsets), pa.array(flat, type=pa.uint8()))


def _flat_pixels(col: pa.Array | pa.ChunkedArray) -> tuple[np.ndarray, np.ndarray]:
    """list<uint8> / fixed_size_list<uint8> column -> (flat values, offsets)."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    if pa.types.is_fixed_size_list(arr.type):
        d = arr.type.list_size
        vals = arr.values.to_numpy(zero_copy_only=False).astype(np.uint8)
        base = arr.offset * d
        offsets = np.arange(0, (len(arr) + 1) * d, d, dtype=np.int64)
        return vals[base : base + len(arr) * d], offsets
    offsets = arr.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    flat = arr.values.to_numpy(zero_copy_only=False).astype(np.uint8)
    base = offsets[0]
    return flat[base:] if base else flat, offsets - base


IMAGE_SCHEMA = pa.schema(
    [
        ("item_id", pa.string()),
        ("payload", pa.binary()),
        ("mime", pa.string()),
        ("width", pa.int32()),
        ("height", pa.int32()),
    ]
)


class DecodeImage:
    """Actor-pool stage: payload -> decoded pixel tensor (flattened).

    Real decode requires an imaging library that is not available here;
    `fake=True` produces a DETERMINISTIC FAKE decode (seeded by the
    payload hash) with the declared width/height so the pipeline shape
    is testable. Swap `_decode` for a real codec in production.
    """

    def __init__(self, fake: bool = False, channels: int = 3):
        self.fake = fake
        self.channels = channels

    def _decode(self, payload: bytes, width: int, height: int) -> np.ndarray:
        if not self.fake:
            raise NotImplementedError(
                "image codecs not available in this environment; "
                "construct DecodeImage(fake=True) for the deterministic stub"
            )
        rng = np.random.default_rng(stable_hash64(payload.hex() if payload else ""))
        return rng.integers(0, 256, size=(height, width, self.channels), dtype=np.uint8)

    def __call__(self, t: pa.Table) -> pa.Table:
        payloads = t["payload"].to_pylist()
        ws = t["width"].to_pylist()
        hs = t["height"].to_pylist()
        # decode is inherently per-item (a real codec call per payload);
        # assembly is one flat buffer + offsets, no Python list roundtrip
        pixels = [
            self._decode(p or b"", int(w), int(h)).reshape(-1)
            for p, w, h in zip(payloads, ws, hs)
        ]
        return pa.table(
            {
                "item_id": t["item_id"],
                "width": t["width"],
                "height": t["height"],
                "pixels": _u8_list(pixels),
            }
        )


class ResizeImage:
    """Nearest-neighbor resize over decoded pixel tensors (pure numpy —
    this part is real, not stubbed)."""

    def __init__(self, out_w: int, out_h: int, channels: int = 3):
        self.out_w = out_w
        self.out_h = out_h
        self.channels = channels

    def __call__(self, t: pa.Table) -> pa.Table:
        n = t.num_rows
        ws = t["width"].to_pylist()
        hs = t["height"].to_pylist()
        flat, offsets = _flat_pixels(t["pixels"])
        # per-row gather (input dims vary row to row); output assembled flat
        out = np.empty(n * self.out_h * self.out_w * self.channels, dtype=np.uint8)
        stride = self.out_h * self.out_w * self.channels
        for i, (w, h) in enumerate(zip(ws, hs)):
            img = flat[offsets[i] : offsets[i + 1]].reshape(int(h), int(w), self.channels)
            yi = (np.arange(self.out_h) * h // self.out_h).astype(np.int64)
            xi = (np.arange(self.out_w) * w // self.out_w).astype(np.int64)
            out[i * stride : (i + 1) * stride] = img[yi][:, xi].reshape(-1)
        # post-resize rows share one constant shape: FixedSizeList lets every
        # downstream batch reshape (n, h*w*c) zero-copy, no offsets walk
        return pa.table(
            {
                "item_id": t["item_id"],
                "width": pa.array([self.out_w] * n, type=pa.int32()),
                "height": pa.array([self.out_h] * n, type=pa.int32()),
                "pixels": pa.FixedSizeListArray.from_arrays(
                    pa.array(out, type=pa.uint8()), stride
                ),
            }
        )


class ImageFeatures:
    """Mean/std per channel — a stand-in feature extractor (real numpy)."""

    def __init__(self, channels: int = 3):
        self.channels = channels

    def __call__(self, t: pa.Table) -> pa.Table:
        n = t.num_rows
        flat, offsets = _flat_pixels(t["pixels"])
        lens = np.diff(offsets)
        if n and lens.min() == lens.max():
            # post-resize rows share one shape: fully vectorized across rows
            a = flat.astype(np.float64).reshape(n, -1, self.channels)
            feats = np.concatenate([a.mean(1), a.std(1)], axis=1)
        else:
            feats = np.empty((n, 2 * self.channels))
            for i in range(n):
                a = flat[offsets[i] : offsets[i + 1]].astype(np.float64).reshape(-1, self.channels)
                feats[i] = np.concatenate([a.mean(0), a.std(0)])
        d = 2 * self.channels
        return pa.table(
            {
                "item_id": t["item_id"],
                "features": pa.FixedSizeListArray.from_arrays(
                    pa.array(feats.reshape(-1), type=pa.float64()), d
                ),
            }
        )


def decode_resize_featurize(
    ds: Dataset, out_w: int = 8, out_h: int = 8, fake: bool = True,
    batch_size: int = 64, concurrency=(1, 4),
) -> Dataset:
    """The composed multimodal pipeline. Small batch_size on purpose:
    binary payload rows are wide; batch x concurrency must fit the heap."""
    decoded = ds.map_batches(
        DecodeImage, fn_constructor_args=(fake,), batch_format="pyarrow",
        batch_size=batch_size, concurrency=concurrency,
    )
    resized = decoded.map_batches(
        ResizeImage, fn_constructor_args=(out_w, out_h), batch_format="pyarrow",
        batch_size=batch_size, concurrency=concurrency,
    )
    return resized.map_batches(
        ImageFeatures, batch_format="pyarrow",
        batch_size=batch_size, concurrency=concurrency,
    )


VIDEO_SCHEMA = pa.schema(
    [
        ("item_id", pa.string()),
        ("payload", pa.binary()),
        ("mime", pa.string()),
        ("duration_ms", pa.int32()),
        ("width", pa.int32()),
        ("height", pa.int32()),
    ]
)


class SampleFrames:
    """Actor-pool stage: video payload -> n evenly-spaced frames, one
    output row PER FRAME (item_id, frame_idx, ts_ms, width, height,
    pixels) — the fan-out sampling step of a video-training pipeline.

    Like DecodeImage, the codec call is STUBBED (no video libraries in
    this container): `fake=True` derives each frame deterministically
    from (payload hash, frame index), so frame identity and ordering are
    testable; swap `_decode_frame` for a real demuxer in production. The
    1-to-n row fan-out, per-frame timestamps, and FixedSizeList pixel
    layout are the real plumbing under either decoder."""

    def __init__(self, n_frames: int = 4, fake: bool = False, channels: int = 3):
        self.n_frames = n_frames
        self.fake = fake
        self.channels = channels

    def _decode_frame(self, payload: bytes, ts_ms: int, width: int, height: int) -> np.ndarray:
        if not self.fake:
            raise NotImplementedError(
                "video codecs not available in this environment; "
                "construct SampleFrames(fake=True) for the deterministic stub"
            )
        seed = stable_hash64(f"{payload.hex() if payload else ''}:{ts_ms}")
        rng = np.random.default_rng(seed)
        return rng.integers(0, 256, size=(height, width, self.channels), dtype=np.uint8)

    def __call__(self, t: pa.Table) -> pa.Table:
        k = self.n_frames
        n = t.num_rows
        payloads = t["payload"].to_pylist()
        dur = np.asarray(t["duration_ms"].to_pylist(), dtype=np.int64)
        ws = t["width"].to_pylist()
        hs = t["height"].to_pylist()
        # evenly spaced sample times: ts_j = floor(dur * (j + 0.5) / k),
        # in exact integer arithmetic
        j = np.arange(k, dtype=np.int64)
        ts = (dur[:, None] * (2 * j + 1)[None, :]) // (2 * k)  # (n, k)
        frames = [
            self._decode_frame(payloads[i] or b"", int(ts[i, jj]), int(ws[i]), int(hs[i])).reshape(-1)
            for i in range(n)
            for jj in range(k)
        ]
        return pa.table(
            {
                "item_id": pa.array(np.repeat(np.asarray(t["item_id"].to_pylist(), dtype=object), k)),
                "frame_idx": pa.array(np.tile(j, n)),
                "ts_ms": pa.array(ts.reshape(-1)),
                "width": pa.array(np.repeat(ws, k), type=pa.int32()),
                "height": pa.array(np.repeat(hs, k), type=pa.int32()),
                "pixels": _u8_list(frames),
            }
        )


def sample_frames(
    ds: Dataset, n_frames: int = 4, fake: bool = True,
    batch_size: int = 16, concurrency=(1, 4),
) -> Dataset:
    """Frame sampling as an actor-pool map_batches: batch_size stays
    small because every input row fans out n_frames wide pixel rows."""
    return ds.map_batches(
        SampleFrames, fn_constructor_args=(n_frames, fake),
        batch_format="pyarrow", batch_size=batch_size, concurrency=concurrency,
    )


# --------------------------------------------------------------------------
# audio: REAL decode (stdlib WAV), real DSP features
# --------------------------------------------------------------------------

AUDIO_SCHEMA = pa.schema(
    [
        ("item_id", pa.string()),
        ("payload", pa.binary()),
        ("mime", pa.string()),
    ]
)


def synth_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """int16 PCM samples -> a real RIFF/WAV byte payload (stdlib wave
    writer — used by tests and fixtures; any standard player reads it)."""
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(np.asarray(samples, dtype="<i2").tobytes())
    return buf.getvalue()


class DecodeAudio:
    """Actor-pool stage: WAV payload -> mono float64 samples in [-1, 1].

    Unlike the image/video stages, this decode is REAL: RIFF/WAV PCM is
    parsed with the stdlib `wave` module (16-bit PCM, any channel count;
    multi-channel downmixes by mean). `on_error="skip"` drops undecodable
    rows (the web-crawl reality: truncated/corrupt files must not kill
    the pipeline); `"raise"` propagates for curated corpora."""

    def __init__(self, on_error: str = "raise"):
        if on_error not in ("raise", "skip"):
            raise ValueError("on_error must be 'raise' or 'skip'")
        self.on_error = on_error

    def _decode(self, payload: bytes) -> tuple[np.ndarray, int]:
        import io
        import wave

        with wave.open(io.BytesIO(payload), "rb") as w:
            if w.getsampwidth() != 2:
                raise ValueError("only 16-bit PCM WAV supported")
            sr = w.getframerate()
            nch = w.getnchannels()
            raw = w.readframes(w.getnframes())
        x = np.frombuffer(raw, dtype="<i2").astype(np.float64)
        if nch > 1:
            x = x.reshape(-1, nch).mean(axis=1)
        return x / 32768.0, sr

    def __call__(self, t: pa.Table) -> pa.Table:
        ids, rates, rows = [], [], []
        for item_id, payload in zip(t["item_id"].to_pylist(), t["payload"].to_pylist()):
            try:
                x, sr = self._decode(payload or b"")
            except Exception:
                if self.on_error == "skip":
                    continue
                raise
            ids.append(item_id)
            rates.append(sr)
            rows.append(x)
        lens = np.array([len(r) for r in rows], dtype=np.int64)
        offsets = np.zeros(len(rows) + 1, dtype=np.int64)
        np.cumsum(lens, out=offsets[1:])
        flat = np.concatenate(rows) if rows else np.zeros(0, dtype=np.float64)
        return pa.table(
            {
                "item_id": pa.array(ids, type=pa.string()),
                "sample_rate": pa.array(rates, type=pa.int32()),
                "samples": pa.ListArray.from_arrays(
                    pa.array(offsets), pa.array(flat, type=pa.float64())
                ),
            }
        )


class AudioFeatures:
    """Real DSP per clip (numpy only): RMS, zero-crossing rate, spectral
    centroid via rfft. Per-row loop is inherent (ragged clip lengths,
    one FFT per clip); everything inside a row is vectorized."""

    def __call__(self, t: pa.Table) -> pa.Table:
        col = t["samples"]
        arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        offsets = arr.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        flat = arr.values.to_numpy(zero_copy_only=False)
        base = offsets[0]
        offsets = offsets - base
        flat = flat[base:]
        srs = np.asarray(t["sample_rate"].to_pylist(), dtype=np.int64)
        n = t.num_rows
        n_samples = np.diff(offsets)
        rms = np.zeros(n)
        zcr = np.zeros(n)
        centroid = np.zeros(n)
        for i in range(n):
            x = flat[offsets[i] : offsets[i + 1]]
            if len(x) == 0:
                continue
            rms[i] = np.sqrt(np.mean(x * x))
            zcr[i] = np.mean(np.signbit(x[1:]) != np.signbit(x[:-1])) if len(x) > 1 else 0.0
            mag = np.abs(np.fft.rfft(x))
            freqs = np.fft.rfftfreq(len(x), d=1.0 / srs[i])
            tot = mag.sum()
            centroid[i] = float((freqs * mag).sum() / tot) if tot > 0 else 0.0
        return pa.table(
            {
                "item_id": t["item_id"],
                "n_samples": pa.array(n_samples, type=pa.int64()),
                "sample_rate": t["sample_rate"],
                "duration_ms": pa.array(n_samples * 1000 // np.maximum(srs, 1), type=pa.int64()),
                "rms_milli": pa.array(np.round(rms * 1e3).astype(np.int64)),
                "zcr_milli": pa.array(np.round(zcr * 1e3).astype(np.int64)),
                "centroid_hz": pa.array(np.round(centroid).astype(np.int64)),
            }
        )


def decode_audio_features(
    ds: Dataset, batch_size: int = 64, concurrency=(1, 4), on_error: str = "raise"
) -> Dataset:
    """WAV payload column -> per-clip DSP features. Decode is real
    (stdlib); features quantized to integers for cross-run stability."""
    decoded = ds.map_batches(
        DecodeAudio, fn_constructor_args=(on_error,), batch_format="pyarrow",
        batch_size=batch_size, concurrency=concurrency,
    )
    return decoded.map_batches(
        AudioFeatures, batch_format="pyarrow",
        batch_size=batch_size, concurrency=concurrency,
    )
