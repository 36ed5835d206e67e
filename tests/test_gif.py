"""GIF codec (functions/gif.py): lossless round trips, LZW paths,
disposal/transparency compositing, error handling, and the multimodal
stage dispatch (DecodeImage still view + SampleFrames real inter-frame
sampling)."""

import struct

import numpy as np
import pytest

from hgcn_name_disambiguation_ray.functions.gif import (
    _lzw_encode,
    decode_gif,
    decode_gif_first,
    is_gif,
    synth_gif,
)


def _animation(n: int = 6, h: int = 24, w: int = 32) -> np.ndarray:
    base = (np.indices((h, w)).sum(axis=0) % 8 * 16).astype(np.uint8)
    frames = []
    for i in range(n):
        f = np.stack([base, base // 2, np.full_like(base, 40)], axis=-1)
        f[4 + i : 10 + i, 3 * i : 3 * i + 6] = [200, 30, 30]
        frames.append(f)
    return np.stack(frames)


def test_animated_delta_roundtrip_exact():
    """GIF is lossless: the delta-encoded animation must decode to the
    exact input frames, with delays preserved."""
    frames = _animation()
    payload = synth_gif(frames, delays_ms=[40] * len(frames))
    assert is_gif(payload)
    out = decode_gif(payload)
    assert np.array_equal(out["frames"], frames)
    assert list(out["delays_ms"]) == [40] * len(frames)


def test_delta_encoding_is_smaller_and_equal():
    frames = _animation()
    delta = synth_gif(frames, delta=True)
    full = synth_gif(frames, delta=False)
    assert len(delta) < len(full)
    assert np.array_equal(decode_gif(delta)["frames"], decode_gif(full)["frames"])


def test_interlaced_first_frame_roundtrip():
    frames = _animation(3)
    payload = synth_gif(frames, interlace=True, delta=False)
    assert np.array_equal(decode_gif(payload)["frames"], frames)


def test_still_frame_and_first_frame_view():
    img = _animation(1)[0]
    payload = synth_gif(img)
    assert np.array_equal(decode_gif_first(payload), img)


def test_full_256_color_palette_and_lzw_width_growth():
    rng = np.random.default_rng(1)
    g = rng.integers(0, 256, (2, 40, 48), dtype=np.uint8)
    rgb = np.stack([g, g, g], axis=-1)  # 256 distinct grays
    assert np.array_equal(decode_gif(synth_gif(rgb))["frames"], rgb)


def test_lzw_table_overflow_clear_code_path():
    """A big noisy raster overflows the 4096-entry LZW table, forcing the
    encoder's mid-stream CLEAR and the decoder's table reset."""
    rng = np.random.default_rng(2)
    g = np.repeat(rng.integers(0, 256, (1, 120, 150, 1), dtype=np.uint8), 3, axis=3)
    assert np.array_equal(decode_gif(synth_gif(g))["frames"], g)


def test_too_many_colors_rejected():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (1, 30, 30, 3), dtype=np.uint8)
    with pytest.raises(ValueError, match="256 distinct colors"):
        synth_gif(img)


def _handmade_disposal_gif() -> bytes:
    """4x4 canvas, palette [black, red, green, blue]: full red frame;
    green 2x2 patch at (1,1) with disposal 2 (restore background); blue
    diagonal 2x2 at (0,0) with transparency on index 0."""
    pal = bytes([0, 0, 0, 200, 0, 0, 0, 200, 0, 0, 0, 200])
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", 4, 4, 0x80 | 0x01, 0, 0)
    out += pal

    def img(ix, iy, iw, ih, indices, disposal, transp=-1):
        b = bytearray()
        gflags = (disposal << 2) | (0x01 if transp >= 0 else 0)
        b += b"\x21\xf9\x04" + struct.pack("<BHB", gflags, 5, max(transp, 0)) + b"\x00"
        b += b"\x2c" + struct.pack("<HHHHB", ix, iy, iw, ih, 0)
        b.append(2)
        lzw = _lzw_encode(2, np.array(indices, dtype=np.uint8))
        for off in range(0, len(lzw), 255):
            c = lzw[off : off + 255]
            b.append(len(c))
            b += c
        b.append(0)
        return b

    out += img(0, 0, 4, 4, [1] * 16, disposal=0)
    out += img(1, 1, 2, 2, [2] * 4, disposal=2)
    out += img(0, 0, 2, 2, [3, 0, 0, 3], disposal=0, transp=0)
    out.append(0x3B)
    return bytes(out)


def test_disposal_restore_background_and_transparency():
    f = decode_gif(_handmade_disposal_gif())["frames"]
    red, green, blue, black = [200, 0, 0], [0, 200, 0], [0, 0, 200], [0, 0, 0]
    assert (f[0] == red).all()
    assert (f[1][1:3, 1:3] == green).all() and (f[1][0] == red).all()
    # disposal 2 restored the green patch to background before frame 3
    assert (f[2][1, 2] == black).all() and (f[2][2, 1] == black).all()
    # blue diagonal drawn, transparent pixels keep what was underneath
    assert (f[2][0, 0] == blue).all() and (f[2][1, 1] == blue).all()
    assert (f[2][0, 1] == red).all() and (f[2][1, 0] == red).all()


def test_truncation_and_garbage_raise_valueerror():
    payload = synth_gif(_animation(3))
    for cut in (4, 10, 14, len(payload) // 2, len(payload) - 2):
        with pytest.raises(ValueError):
            decode_gif(payload[:cut])
    for bad in (b"", b"GIF89a", b"NOTAGIF", b"GIF89a" + b"\x00" * 20):
        with pytest.raises(ValueError):
            decode_gif(bad)


def test_byte_mutations_never_escape_valueerror():
    payload = synth_gif(_animation(2))
    for i in range(8, len(payload), 17):
        mut = bytearray(payload)
        mut[i] ^= 0xFF
        try:
            decode_gif(bytes(mut))
        except ValueError:
            pass  # only ValueError (or a clean decode of a still-valid file)


def test_decode_image_dispatches_gif(ray_session):
    import pyarrow as pa

    from hgcn_name_disambiguation_ray.stages.multimodal import DecodeImage

    img = _animation(1)[0]
    t = pa.table(
        {
            "item_id": pa.array(["g1"]),
            "payload": pa.array([synth_gif(img)], type=pa.binary()),
            "mime": pa.array(["image/gif"]),
            "width": pa.array([img.shape[1]], type=pa.int32()),
            "height": pa.array([img.shape[0]], type=pa.int32()),
        }
    )
    out = DecodeImage(fake=False)(t)
    assert out.num_rows == 1
    got = np.asarray(out["pixels"][0].as_py(), dtype=np.uint8).reshape(img.shape)
    assert np.array_equal(got, img)


def _vid_table(payload: bytes):
    import pyarrow as pa

    return pa.table(
        {
            "item_id": pa.array(["v1"]),
            "payload": pa.array([payload], type=pa.binary()),
            "mime": pa.array(["image/gif"]),
            "duration_ms": pa.array([600], type=pa.int64()),
            "width": pa.array([32], type=pa.int32()),
            "height": pa.array([24], type=pa.int32()),
        }
    )


def test_sample_frames_gif_real_interframe(ray_session):
    """Animated GIF samples REAL composited frames (fake=False) with
    timestamps from the cumulative frame delays."""
    from hgcn_name_disambiguation_ray.stages.multimodal import SampleFrames

    frames = _animation(6)
    payload = synth_gif(frames, delays_ms=[40] * 6)
    out = SampleFrames(n_frames=3, fake=False)(_vid_table(payload))
    assert out.num_rows == 3
    # evenly spaced sample indices over 6 frames at k=3 -> 1, 3, 5
    assert list(out["ts_ms"].to_pylist()) == [40, 120, 200]
    for row, src in zip(range(3), (1, 3, 5)):
        got = np.asarray(out["pixels"][row].as_py(), dtype=np.uint8).reshape(
            frames.shape[1:]
        )
        assert np.array_equal(got, frames[src])


def test_sample_frames_corrupt_gif_respects_fake_contract(ray_session):
    from hgcn_name_disambiguation_ray.stages.multimodal import SampleFrames

    bad = b"GIF89a" + b"\x07" * 40  # GIF magic, garbage body
    t = _vid_table(bad)
    out = SampleFrames(n_frames=2, fake=True)(t)  # stub, no raise
    assert out.num_rows == 2
    with pytest.raises(ValueError):
        SampleFrames(n_frames=2, fake=False)(t)
