"""Baseline JPEG codec (functions/jpeg.py): round trips, decoder paths,
error handling, and DecodeImage dispatch."""

import numpy as np
import pytest

from hgcn_name_disambiguation_ray.functions.jpeg import decode_jpeg, synth_jpeg


def _gradient(h: int, w: int) -> np.ndarray:
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack(
        [(xx * 3) % 256, (yy * 5) % 256, ((xx + yy) * 2) % 256], axis=-1
    ).astype(np.uint8)


def test_constant_color_roundtrip_exact():
    img = np.full((16, 24, 3), 130, dtype=np.uint8)
    out = decode_jpeg(synth_jpeg(img, quality=95))
    assert out.shape == img.shape
    assert np.abs(out.astype(int) - img.astype(int)).max() == 0


def test_gradient_roundtrip_close_444():
    img = _gradient(33, 41)
    out = decode_jpeg(synth_jpeg(img, quality=95))
    d = np.abs(out.astype(int) - img.astype(int))
    assert out.shape == img.shape
    assert d.max() <= 8 and d.mean() <= 2.0


def test_gradient_roundtrip_close_420():
    img = _gradient(33, 41)
    out = decode_jpeg(synth_jpeg(img, quality=95, subsample=True))
    d = np.abs(out.astype(int) - img.astype(int))
    # chroma is box-averaged 2x2 then replicated back: looser bound
    assert out.shape == img.shape
    assert d.max() <= 24 and d.mean() <= 5.0


def test_grayscale_component_expands_to_rgb():
    img = _gradient(20, 18)
    out = decode_jpeg(synth_jpeg(img, quality=95, gray=True))
    assert out.shape == img.shape
    assert (out[..., 0] == out[..., 1]).all() and (out[..., 1] == out[..., 2]).all()
    luma = 0.299 * img[..., 0] + 0.587 * img[..., 1] + 0.114 * img[..., 2]
    assert np.abs(out[..., 0].astype(float) - luma).max() <= 6


def test_restart_intervals_decode_identically():
    img = _gradient(33, 41)
    plain = decode_jpeg(synth_jpeg(img, quality=92))
    for ri in (1, 2, 5):
        payload = synth_jpeg(img, quality=92, restart_interval=ri)
        assert b"\xff\xdd" in payload  # DRI marker present
        assert (decode_jpeg(payload) == plain).all()


def test_restart_with_subsampling():
    img = _gradient(40, 40)
    plain = decode_jpeg(synth_jpeg(img, quality=90, subsample=True))
    rst = decode_jpeg(synth_jpeg(img, quality=90, subsample=True, restart_interval=1))
    assert (rst == plain).all()


def test_non_multiple_of_mcu_dims_crop_back():
    for h, w in [(1, 1), (7, 9), (8, 8), (17, 16), (15, 31)]:
        img = np.stack(
            [(np.arange(h * w) % 256).reshape(h, w).astype(np.uint8)] * 3, axis=-1
        )
        for sub in (False, True):
            out = decode_jpeg(synth_jpeg(img, quality=95, subsample=sub))
            assert out.shape == (h, w, 3)


def test_deterministic_encode_and_decode():
    img = _gradient(24, 24)
    p1, p2 = synth_jpeg(img), synth_jpeg(img)
    assert p1 == p2
    assert (decode_jpeg(p1) == decode_jpeg(p2)).all()


def test_quality_monotonicity():
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, size=(32, 32, 3), dtype=np.uint8).astype(np.uint8)
    errs = []
    for q in (30, 60, 95):
        out = decode_jpeg(synth_jpeg(img, quality=q))
        errs.append(np.abs(out.astype(int) - img.astype(int)).mean())
    assert errs[0] >= errs[1] >= errs[2]


def test_corrupt_payloads_raise_valueerror():
    img = _gradient(16, 16)
    good = synth_jpeg(img, quality=90)
    bad_cases = [
        b"",
        b"\x89PNG not a jpeg",
        b"\xff\xd8\xff\xe0junk",
        good[: len(good) // 2],  # truncated mid-scan
        good[:2] + b"\xff\xc2" + good[4:],  # progressive SOF marker
    ]
    for bad in bad_cases:
        with pytest.raises(ValueError):
            decode_jpeg(bad)


def test_corrupt_entropy_stream_raises():
    img = _gradient(16, 16)
    good = bytearray(synth_jpeg(img, quality=90))
    # stomp the middle of the entropy data with an invalid-prefix pattern;
    # either a bad Huffman code or a run past block end must surface as
    # ValueError, never silence or an index crash
    sos = bytes(good).find(b"\xff\xda")
    start = sos + 14
    good[start : start + 8] = b"\xaa" * 8
    with pytest.raises(ValueError):
        decode_jpeg(bytes(good))


def test_decode_image_stage_dispatches_jpeg():
    from hgcn_name_disambiguation_ray.stages.multimodal import DecodeImage

    img = _gradient(12, 14)
    payload = synth_jpeg(img, quality=95)
    out = DecodeImage(fake=False)._decode(payload, 14, 12)
    assert out.shape == (12, 14, 3)
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 8


def test_malformed_headers_raise_valueerror_not_struct_error():
    # short SOF body: passes the segment-length check but the fixed-size
    # header unpack would raise struct.error without the laundering wrapper
    with pytest.raises(ValueError):
        decode_jpeg(b"\xff\xd8\xff\xc0\x00\x05abc")
    # SOS declaring more scan components than the body carries (IndexError
    # without the wrapper)
    with pytest.raises(ValueError):
        decode_jpeg(b"\xff\xd8\xff\xda\x00\x04\x04\x01")
    # truncated right after a fill byte
    with pytest.raises(ValueError):
        decode_jpeg(b"\xff\xd8\xff\xff")


def test_fill_bytes_before_markers_decode():
    # T.81 B.1.1.2: any number of 0xFF fill bytes may precede a marker
    img = _gradient(16, 16)
    good = synth_jpeg(img, quality=90)
    # insert a fill byte before the first DQT marker
    dqt = good.find(b"\xff\xdb")
    padded = good[:dqt] + b"\xff" + good[dqt:]
    assert np.array_equal(decode_jpeg(padded), decode_jpeg(good))


def test_gray_and_color_paths_round_identically():
    # a grayscale JPEG and a gray RGB JPEG of the same image must agree on
    # the luma rounding (the gray path used to truncate where color rounds)
    rng = np.random.default_rng(7)
    luma = rng.integers(0, 256, size=(16, 16), dtype=np.uint8)
    rgb = np.repeat(luma[..., None], 3, axis=2)
    gray_payload = synth_jpeg(rgb, quality=95, gray=True)
    color_payload = synth_jpeg(rgb, quality=95, gray=False)  # 4:4:4
    # identical luma plane + identical luma quant table -> identical Y
    # coefficients; the color file's chroma is constant 128 (DCT all-zero,
    # decodes back to exactly 128.0), so its RGB equals round(Y). The gray
    # path must round the same way, not truncate.
    g = decode_jpeg(gray_payload)
    c = decode_jpeg(color_payload)
    assert np.array_equal(g, c)


# --------------------------------------------------------------------------
# Progressive (SOF2): multi-scan spectral selection + successive approximation
# --------------------------------------------------------------------------


def test_progressive_matches_baseline_byte_exact():
    """After all scans of the IJG script, the accumulated coefficients
    equal the sequential encoding exactly, so progressive decode must be
    byte-identical to baseline decode of the same pixels — across
    sampling modes, gray, restart intervals and qualities."""
    rng = np.random.default_rng(0)
    img = _gradient(40, 56)
    img[..., 2] = rng.integers(0, 256, img.shape[:2], dtype=np.uint8)
    for kw in (
        {},
        {"subsample": True},
        {"gray": True},
        {"restart_interval": 3},
        {"quality": 50},
        {"subsample": True, "restart_interval": 2, "quality": 70},
    ):
        base = decode_jpeg(synth_jpeg(img, **kw))
        prog = decode_jpeg(synth_jpeg(img, progressive=True, **kw))
        assert np.array_equal(base, prog), kw


def test_progressive_noise_and_odd_sizes():
    """Noise stresses EOB runs + refinement correction bits; odd sizes
    stress the non-interleaved component block geometry (luma block grid
    narrower than the padded MCU grid when subsampled)."""
    rng = np.random.default_rng(7)
    for shape in ((1, 1), (7, 5), (17, 23), (33, 31)):
        img = rng.integers(0, 256, (*shape, 3), dtype=np.uint8)
        for kw in ({}, {"subsample": True}):
            base = decode_jpeg(synth_jpeg(img, **kw))
            prog = decode_jpeg(synth_jpeg(img, progressive=True, **kw))
            assert np.array_equal(base, prog), (shape, kw)


def test_progressive_long_eob_runs():
    """A flat image makes every AC band all-zero: the encoder accumulates
    maximal EOBn runs, the decoder must count them down exactly."""
    img = np.full((80, 96, 3), 77, dtype=np.uint8)
    assert np.array_equal(
        decode_jpeg(synth_jpeg(img)),
        decode_jpeg(synth_jpeg(img, progressive=True)),
    )


def test_progressive_sof2_marker_present():
    img = _gradient(16, 16)
    payload = synth_jpeg(img, progressive=True)
    assert b"\xff\xc2" in payload and b"\xff\xc0" not in payload
    # multiple SOS markers (one per scan of the script)
    assert payload.count(b"\xff\xda") >= 4


def test_progressive_truncation_and_corruption_raise_valueerror():
    rng = np.random.default_rng(3)
    payload = synth_jpeg(
        rng.integers(0, 256, (32, 32, 3), dtype=np.uint8), progressive=True
    )
    for cut in (len(payload) // 4, len(payload) // 2, 3 * len(payload) // 4):
        with pytest.raises(ValueError):
            decode_jpeg(payload[:cut])
    for i in (30, 100, 200):
        mut = bytearray(payload)
        mut[i] ^= 0xFF
        try:
            decode_jpeg(bytes(mut))
        except ValueError:
            pass  # either a clean decode of a still-valid file or ValueError


def test_dequant_uses_zigzag_permuted_table():
    """Regression: the decoder must permute the natural-order quant table
    into zigzag order before dequantizing the zigzag-ordered coefficient
    grid. A high-frequency image exposes the mismatch (error explodes on
    the old path); q=95 keeps the true JPEG loss small."""
    x = np.indices((64, 64)).sum(axis=0)
    img = ((np.sin(x * 1.3) * 80 + 128).clip(0, 255)).astype(np.uint8)
    img = np.repeat(img[..., None], 3, axis=2)
    out = decode_jpeg(synth_jpeg(img, quality=95))
    d = np.abs(out.astype(int) - img.astype(int))
    assert d.max() <= 10 and d.mean() <= 2.0


def test_decode_image_dispatches_progressive(ray_session):
    """DecodeImage must decode a progressive payload for REAL (fake=False)."""
    import pyarrow as pa

    from hgcn_name_disambiguation_ray.stages.multimodal import DecodeImage

    img = _gradient(20, 24)
    payload = synth_jpeg(img, progressive=True, quality=95)
    t = pa.table(
        {
            "item_id": pa.array(["p1"]),
            "payload": pa.array([payload], type=pa.binary()),
            "mime": pa.array(["image/jpeg"]),
            "width": pa.array([24], type=pa.int32()),
            "height": pa.array([20], type=pa.int32()),
        }
    )
    out = DecodeImage(fake=False)(t)
    assert out.num_rows == 1
    assert out["width"][0].as_py() == 24 and out["height"][0].as_py() == 20
