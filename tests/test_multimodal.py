"""Multimodal plumbing: schema, actor stages, stub behavior."""

import numpy as np
import pandas as pd
import pytest


@pytest.fixture(scope="module")
def image_ds(ray_session):
    import ray.data as rd

    rows = []
    rng = np.random.default_rng(4)
    for i in range(6):
        w, h = int(rng.integers(4, 10)), int(rng.integers(4, 10))
        rows.append(
            {
                "item_id": f"img{i}",
                "payload": rng.bytes(64),
                "mime": "image/x-fake",
                "width": w,
                "height": h,
            }
        )
    return rd.from_pandas(pd.DataFrame(rows))


def test_decode_stub_raises_without_fake():
    from hgcn_name_disambiguation_ray.stages.multimodal import DecodeImage

    with pytest.raises(NotImplementedError):
        DecodeImage(fake=False)._decode(b"xx", 4, 4)


def test_decode_resize_featurize_pipeline(image_ds):
    from hgcn_name_disambiguation_ray.stages.multimodal import decode_resize_featurize

    out = decode_resize_featurize(image_ds, out_w=4, out_h=4, fake=True).to_pandas()
    assert len(out) == 6
    assert set(out.columns) == {"item_id", "features"}
    feats = np.array(out["features"].tolist())
    assert feats.shape == (6, 6)  # mean+std per 3 channels
    assert (feats[:, :3] >= 0).all() and (feats[:, :3] <= 255).all()


def test_fake_decode_deterministic(image_ds):
    from hgcn_name_disambiguation_ray.stages.multimodal import decode_resize_featurize

    a = decode_resize_featurize(image_ds, out_w=4, out_h=4, fake=True).to_pandas()
    b = decode_resize_featurize(image_ds, out_w=4, out_h=4, fake=True).to_pandas()
    a = a.sort_values("item_id").reset_index(drop=True)
    b = b.sort_values("item_id").reset_index(drop=True)
    assert np.array_equal(
        np.array([np.asarray(x) for x in a["features"]]),
        np.array([np.asarray(x) for x in b["features"]]),
    )


def test_sample_frames_fanout_and_determinism(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from hgcn_name_disambiguation_ray.stages.multimodal import SampleFrames, sample_frames

    rows = [
        {"item_id": "v0", "payload": b"\x01\x02", "mime": "video/x-fake",
         "duration_ms": 10_000, "width": 4, "height": 4},
        {"item_id": "v1", "payload": b"\x03", "mime": "video/x-fake",
         "duration_ms": 500, "width": 3, "height": 5},
    ]
    ds = rd.from_pandas(pd.DataFrame(rows))
    out = sample_frames(ds, n_frames=4, fake=True).to_pandas()
    assert len(out) == 8  # 2 videos x 4 frames
    v0 = out[out["item_id"] == "v0"].sort_values("frame_idx")
    # evenly spaced midpoints of 4 segments over 10s
    assert v0["ts_ms"].tolist() == [1250, 3750, 6250, 8750]
    assert all(len(p) == 4 * 4 * 3 for p in v0["pixels"])
    # distinct frames of one video differ; same call is deterministic
    out2 = sample_frames(ds, n_frames=4, fake=True).to_pandas()
    p1 = v0["pixels"].tolist()
    assert not np.array_equal(np.asarray(p1[0]), np.asarray(p1[1]))
    v0b = out2[out2["item_id"] == "v0"].sort_values("frame_idx")
    assert all(np.array_equal(np.asarray(a), np.asarray(b))
               for a, b in zip(p1, v0b["pixels"].tolist()))


def test_sample_frames_stub_raises_without_fake():
    import pyarrow as pa

    from hgcn_name_disambiguation_ray.stages.multimodal import SampleFrames

    t = pa.table(
        {"item_id": ["v"], "payload": [b"x"], "mime": ["video/x-fake"],
         "duration_ms": pa.array([100], type=pa.int32()),
         "width": pa.array([2], type=pa.int32()),
         "height": pa.array([2], type=pa.int32())}
    )
    with pytest.raises(NotImplementedError):
        SampleFrames(n_frames=2, fake=False)(t)


# ---------------------------------------------------------------------------
# audio: REAL stdlib-WAV decode + DSP features
# ---------------------------------------------------------------------------

def _sine_wav(freq: float, sr: int = 8000, ms: int = 250, amp: float = 0.5) -> bytes:
    from hgcn_name_disambiguation_ray.stages.multimodal import synth_wav

    n = sr * ms // 1000
    t = np.arange(n) / sr
    return synth_wav(np.round(np.sin(2 * np.pi * freq * t) * amp * 32767), sr)


def test_decode_audio_roundtrip_exact():
    from hgcn_name_disambiguation_ray.stages.multimodal import DecodeAudio, synth_wav

    samples = np.array([0, 1000, -1000, 32767, -32768, 17], dtype=np.int16)
    x, sr = DecodeAudio()._decode(synth_wav(samples, 16000))
    assert sr == 16000
    np.testing.assert_array_equal(x, samples.astype(np.float64) / 32768.0)


def test_decode_audio_stereo_downmix():
    import io
    import wave

    from hgcn_name_disambiguation_ray.stages.multimodal import DecodeAudio

    left = np.array([1000, 2000, -4000], dtype=np.int16)
    right = np.array([3000, 0, -2000], dtype=np.int16)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes(np.column_stack([left, right]).astype("<i2").tobytes())
    x, sr = DecodeAudio()._decode(buf.getvalue())
    np.testing.assert_allclose(x, (left + right) / 2.0 / 32768.0)


@pytest.mark.usefixtures("ray_session")
def test_audio_features_track_known_signal():
    import ray.data as rd

    from hgcn_name_disambiguation_ray.stages.multimodal import decode_audio_features

    freqs = [220.0, 440.0, 880.0, 1760.0]
    df = pd.DataFrame(
        {
            "item_id": [f"clip-{int(f)}" for f in freqs],
            "payload": [_sine_wav(f) for f in freqs],
            "mime": ["audio/wav"] * len(freqs),
        }
    )
    out = (
        decode_audio_features(rd.from_pandas(df))
        .to_pandas()
        .set_index("item_id")
        .loc[[f"clip-{int(f)}" for f in freqs]]
    )
    assert (out["sample_rate"] == 8000).all()
    assert (out["duration_ms"] == 250).all()
    for f, (_, row) in zip(freqs, out.iterrows()):
        # pure sine: centroid sits on the tone, zcr = 2f/sr, rms = amp/sqrt(2)
        assert abs(row["centroid_hz"] - f) < 0.05 * f + 5
        assert abs(row["zcr_milli"] - 1000 * 2 * f / 8000) < 25
        assert abs(row["rms_milli"] - 1000 * 0.5 / np.sqrt(2)) < 10


@pytest.mark.usefixtures("ray_session")
def test_decode_audio_skip_vs_raise_on_corrupt_payload():
    import ray.data as rd

    from hgcn_name_disambiguation_ray.stages.multimodal import decode_audio_features

    df = pd.DataFrame(
        {
            "item_id": ["good", "corrupt", "empty"],
            "payload": [_sine_wav(440.0), b"\xff\xfenot a wav", b""],
            "mime": ["audio/wav"] * 3,
        }
    )
    out = decode_audio_features(rd.from_pandas(df), on_error="skip").to_pandas()
    assert out["item_id"].tolist() == ["good"]
    with pytest.raises(Exception):
        decode_audio_features(rd.from_pandas(df), on_error="raise").to_pandas()


@pytest.mark.usefixtures("ray_session")
def test_audio_features_query_centroid_tracks_tone():
    """The audio_features query's integral signal: measured spectral
    centroid tracks the known synthesized tone on EVERY row."""
    import __ray_entry__ as entrymod

    out = entrymod.queries()["audio_features"]("/root/testdata/sf0.001")
    df = out.to_pandas() if hasattr(out, "to_pandas") else out
    assert len(df) > 0
    err = (df["centroid_hz"] - df["freq_hz"]).abs() / df["freq_hz"]
    assert (err < 0.05).all()


# ---------------------------------------------------------------------------
# image: REAL decode for uncompressed formats (BMP / binary PPM)
# ---------------------------------------------------------------------------

def _gradient(h, w):
    y, x = np.mgrid[0:h, 0:w]
    return np.stack([(x * 7) % 256, (y * 11) % 256, (x + y) % 256], axis=-1).astype(
        np.uint8
    )


def test_ppm_and_bmp_roundtrip_exact():
    from hgcn_name_disambiguation_ray.stages.multimodal import (
        decode_bmp,
        decode_ppm,
        synth_bmp,
        synth_ppm,
    )

    img = _gradient(13, 10)  # odd width exercises BMP row padding
    np.testing.assert_array_equal(decode_ppm(synth_ppm(img)), img)
    np.testing.assert_array_equal(decode_bmp(synth_bmp(img)), img)


def test_decode_image_real_formats_without_fake():
    from hgcn_name_disambiguation_ray.stages.multimodal import (
        DecodeImage,
        synth_bmp,
        synth_ppm,
    )
    import pyarrow as pa

    img = _gradient(6, 9)
    t = pa.table(
        {
            "item_id": ["ppm", "bmp"],
            "payload": [synth_ppm(img), synth_bmp(img)],
            # declared metadata deliberately WRONG: parsed dims must win
            "mime": ["image/x-portable-pixmap", "image/bmp"],
            "width": pa.array([1, 1], type=pa.int32()),
            "height": pa.array([1, 1], type=pa.int32()),
        }
    )
    out = DecodeImage(fake=False)(t)
    assert out["width"].to_pylist() == [9, 9]
    assert out["height"].to_pylist() == [6, 6]
    for row in out["pixels"].to_pylist():
        np.testing.assert_array_equal(
            np.asarray(row, dtype=np.uint8).reshape(6, 9, 3), img
        )


def test_decode_image_compressed_still_raises_without_fake():
    from hgcn_name_disambiguation_ray.stages.multimodal import DecodeImage

    # a JPEG-signature payload with garbage segments is a DECODE error
    # (the baseline codec is real now), not a missing-codec error
    with pytest.raises(ValueError):
        DecodeImage(fake=False)._decode(b"\xff\xd8\xff\xe0 not a real jpeg", 4, 4)
    # a real-PNG-signature payload with garbage chunks likewise
    with pytest.raises(ValueError):
        DecodeImage(fake=False)._decode(b"\x89PNG\r\n\x1a\n" + b"junk" * 4, 4, 4)
    # an unrecognized format is the missing-codec error
    with pytest.raises(NotImplementedError):
        DecodeImage(fake=False)._decode(b"\x00\x00\x00\x18ftypmp42 video", 4, 4)


def test_png_roundtrip_exact_all_filters():
    """synth_png/decode_png round-trip bit-exactly under every scanline
    filter type (0-4), including width-1 images where left/upper-left
    neighbors are always absent."""
    from hgcn_name_disambiguation_ray.stages.multimodal import decode_png, synth_png

    rng = np.random.default_rng(9)
    for w, h in [(1, 7), (5, 5), (16, 11), (3, 1)]:
        img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        for f in range(5):
            payload = synth_png(img, filters=[f] * h)
            np.testing.assert_array_equal(decode_png(payload), img)
        # mixed filters (the default cycles all five)
        np.testing.assert_array_equal(decode_png(synth_png(img)), img)


def test_decode_png_color_types_and_errors():
    """Gray/gray+alpha/RGBA/palette color types all land as RGB; bad
    payloads raise ValueError (never a wrong image)."""
    import struct
    import zlib

    from hgcn_name_disambiguation_ray.stages.multimodal import decode_png

    def chunk(typ, data):
        return (
            struct.pack(">I", len(data))
            + typ
            + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    sig = b"\x89PNG\r\n\x1a\n"

    def make(w, h, ctype, rows, extra=b""):
        ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
        return sig + chunk(b"IHDR", ihdr) + extra + chunk(
            b"IDAT", zlib.compress(rows)
        ) + chunk(b"IEND", b"")

    # gray (ctype 0), filter 0 rows
    g = make(2, 2, 0, b"\x00\x0a\x14\x00\x1e\x28")
    np.testing.assert_array_equal(
        decode_png(g),
        np.array([[[10] * 3, [20] * 3], [[30] * 3, [40] * 3]], dtype=np.uint8),
    )
    # gray+alpha (ctype 4): alpha dropped
    ga = make(1, 2, 4, b"\x00\x0a\xff\x00\x14\x80")
    np.testing.assert_array_equal(
        decode_png(ga), np.array([[[10] * 3], [[20] * 3]], dtype=np.uint8)
    )
    # RGBA (ctype 6): alpha dropped
    rgba = make(1, 1, 6, b"\x00\x01\x02\x03\xff")
    np.testing.assert_array_equal(
        decode_png(rgba), np.array([[[1, 2, 3]]], dtype=np.uint8)
    )
    # palette (ctype 3)
    plte = chunk(b"PLTE", bytes([255, 0, 0, 0, 255, 0]))
    pal = make(2, 1, 3, b"\x00\x01\x00", extra=plte)
    np.testing.assert_array_equal(
        decode_png(pal), np.array([[[0, 255, 0], [255, 0, 0]]], dtype=np.uint8)
    )
    # palette index out of range raises
    with pytest.raises(ValueError):
        decode_png(make(1, 1, 3, b"\x00\x05", extra=plte))
    # truncated raster raises
    with pytest.raises(ValueError):
        decode_png(make(4, 4, 2, b"\x00\x01\x02"))
    # corrupt deflate stream raises ValueError (not zlib.error)
    bad = sig + chunk(b"IHDR", struct.pack(">IIBBBBB", 1, 1, 8, 2, 0, 0, 0)) + chunk(
        b"IDAT", b"notdeflate"
    ) + chunk(b"IEND", b"")
    with pytest.raises(ValueError):
        decode_png(bad)
    # interlaced declared unsupported, loudly
    inter = sig + chunk(
        b"IHDR", struct.pack(">IIBBBBB", 1, 1, 8, 2, 0, 0, 1)
    ) + chunk(b"IDAT", zlib.compress(b"\x00\x01\x02\x03")) + chunk(b"IEND", b"")
    with pytest.raises(ValueError):
        decode_png(inter)


@pytest.mark.usefixtures("ray_session")
def test_decode_image_real_png_through_pipeline():
    """PNG payloads flow through decode_resize_featurize with fake=False
    — the real-codec path, parsed dims override declared metadata."""
    import ray.data as rd

    from hgcn_name_disambiguation_ray.stages.multimodal import (
        DecodeImage,
        decode_resize_featurize,
        synth_png,
    )

    rng = np.random.default_rng(3)
    rows = []
    imgs = []
    for i in range(4):
        w, h = 4 + i, 6 + (i % 2)
        img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        imgs.append(img)
        rows.append(
            {
                "item_id": f"png{i}",
                "payload": synth_png(img),
                "mime": "image/png",
                "width": 999,  # deliberately wrong: parser must win
                "height": 999,
            }
        )
    ds = rd.from_pandas(pd.DataFrame(rows))
    decoded = ds.map_batches(
        DecodeImage, fn_constructor_args=(False,), batch_format="pyarrow",
        concurrency=1,
    ).to_pandas().set_index("item_id")
    for i, img in enumerate(imgs):
        r = decoded.loc[f"png{i}"]
        assert (r["width"], r["height"]) == (img.shape[1], img.shape[0])
        np.testing.assert_array_equal(
            np.asarray(r["pixels"], dtype=np.uint8).reshape(img.shape), img
        )
    feats = decode_resize_featurize(ds, out_w=3, out_h=3, fake=False).to_pandas()
    assert len(feats) == 4 and set(feats.columns) == {"item_id", "features"}


@pytest.mark.usefixtures("ray_session")
def test_real_image_pipeline_end_to_end():
    import ray.data as rd

    from hgcn_name_disambiguation_ray.stages.multimodal import (
        decode_resize_featurize,
        synth_ppm,
    )

    # constant-color image: features = (mean per channel, std 0) exactly,
    # surviving decode + nearest-neighbor resize untouched
    solid = np.full((12, 8, 3), [10, 200, 30], dtype=np.uint8)
    df = pd.DataFrame(
        {
            "item_id": ["solid"],
            "payload": [synth_ppm(solid)],
            "mime": ["image/x-portable-pixmap"],
            "width": np.array([8], dtype=np.int32),
            "height": np.array([12], dtype=np.int32),
        }
    )
    out = decode_resize_featurize(rd.from_pandas(df), out_w=4, out_h=4, fake=False).to_pandas()
    feats = np.asarray(out["features"].iloc[0])
    np.testing.assert_allclose(feats, [10.0, 200.0, 30.0, 0.0, 0.0, 0.0])


def test_decode_image_fake_contract_holds_for_magic_prefixed_text():
    """Review regression: fake mode must return stub pixels for ANY
    payload, including text that happens to start with b'BM' or b'P6'."""
    from hgcn_name_disambiguation_ray.stages.multimodal import DecodeImage

    d = DecodeImage(fake=True)
    for payload in (b"BMW is a car maker, not a bitmap", b"P6ristine prose"):
        img = d._decode(payload, 5, 4)
        assert img.shape == (4, 5, 3)


def test_decode_ppm_trailing_newline_and_whitespace_raster():
    """Review regression: the raster is located by header parse, so a
    trailing newline must not shift pixels and an all-whitespace raster
    (solid gray 32) must decode."""
    from hgcn_name_disambiguation_ray.stages.multimodal import decode_ppm, synth_ppm

    img = _gradient(5, 7)
    np.testing.assert_array_equal(decode_ppm(synth_ppm(img) + b"\n"), img)
    gray = np.full((3, 4, 3), 32, dtype=np.uint8)  # raster bytes = spaces
    np.testing.assert_array_equal(decode_ppm(synth_ppm(gray)), gray)


@pytest.mark.usefixtures("ray_session")
def test_decode_image_skip_drops_corrupt_rows():
    import ray.data as rd

    from hgcn_name_disambiguation_ray.stages.multimodal import (
        DecodeImage,
        synth_ppm,
    )

    img = _gradient(4, 4)
    df = pd.DataFrame(
        {
            "item_id": ["good", "truncated"],
            "payload": [synth_ppm(img), synth_ppm(img)[:-20]],
            "mime": ["image/x-portable-pixmap"] * 2,
            "width": np.array([4, 4], dtype=np.int32),
            "height": np.array([4, 4], dtype=np.int32),
        }
    )
    out = (
        rd.from_pandas(df)
        .map_batches(
            DecodeImage, fn_constructor_args=(False, 3, "skip"),
            batch_format="pyarrow", concurrency=1,
        )
        .to_pandas()
    )
    assert out["item_id"].tolist() == ["good"]
