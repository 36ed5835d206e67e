"""ISO BMFF demux/mux round-trips + real MJPEG frame sampling.

Reproduces the reference's video-column surface with a real container
parse (the reference ships no video code; see SURVEY.md multimodal
notes) — these tests pin that the demuxed sample table is byte-exact
against the muxer's layout and that SampleFrames' real path decodes the
same pixels as a direct JPEG decode of the muxed frame bytes.
"""

import numpy as np
import pyarrow as pa
import pytest

from hgcn_name_disambiguation_ray.functions.jpeg import decode_jpeg, synth_jpeg
from hgcn_name_disambiguation_ray.functions.mp4 import (
    demux_mp4,
    is_mp4,
    mp4_sample_bytes,
    synth_mp4,
)


def _frames(n: int, w: int = 24, h: int = 16) -> list[bytes]:
    out = []
    for i in range(n):
        y, x = np.mgrid[0:h, 0:w]
        img = np.stack(
            [(x * 5 + i * 17) % 256, (y * 9 + i * 3) % 256, (x + y + i * 29) % 256],
            axis=-1,
        ).astype(np.uint8)
        out.append(synth_jpeg(img, quality=92, subsample=False))
    return out


def test_demux_round_trip_single_chunk():
    frames = _frames(6)
    payload = synth_mp4(frames, width=24, height=16, fps=10, timescale=1000)
    assert is_mp4(payload)
    track = demux_mp4(payload)
    assert track["codec"] == "jpeg"
    assert (track["width"], track["height"]) == (24, 16)
    assert track["timescale"] == 1000
    assert track["duration"] == 600
    assert track["sizes"].tolist() == [len(f) for f in frames]
    # stts arithmetic: frame i at i * (timescale // fps) ticks
    assert track["ts"].tolist() == [i * 100 for i in range(6)]
    for i, f in enumerate(frames):
        assert mp4_sample_bytes(payload, track, i) == f


@pytest.mark.parametrize("fpc", [1, 2, 4])
def test_demux_multi_chunk_offsets(fpc):
    """stsc x stco join: frames spread over several chunks, including a
    short tail chunk, must resolve to the same bytes."""
    frames = _frames(7)
    payload = synth_mp4(frames, width=24, height=16, frames_per_chunk=fpc)
    track = demux_mp4(payload)
    assert len(track["offsets"]) == 7
    for i, f in enumerate(frames):
        assert mp4_sample_bytes(payload, track, i) == f


def test_demux_rejects_garbage():
    with pytest.raises(ValueError):
        demux_mp4(b"\x00" * 64)
    # ftyp magic but no moov
    with pytest.raises(ValueError):
        demux_mp4(b"\x00\x00\x00\x10ftypisom\x00\x00\x02\x00" + b"\x00" * 32)


def test_sample_frames_real_mjpeg(ray_session):
    import ray.data as rd

    from hgcn_name_disambiguation_ray.stages.multimodal import sample_frames

    frames = _frames(8)
    payload = synth_mp4(frames, width=24, height=16, fps=4, timescale=1000)
    ds = rd.from_arrow(
        pa.table(
            {
                "item_id": ["vid-0"],
                "payload": pa.array([payload], type=pa.binary()),
                "mime": ["video/mp4"],
                "duration_ms": pa.array([2000], type=pa.int32()),
                "width": pa.array([24], type=pa.int32()),
                "height": pa.array([16], type=pa.int32()),
            }
        )
    )
    out = sample_frames(ds, n_frames=4, fake=False).to_pandas().sort_values("frame_idx")
    assert len(out) == 4
    # evenly spaced sample indices over 8 samples: 1, 3, 5, 7
    expect_idx = [(8 * (2 * j + 1)) // 8 for j in range(4)]
    assert out["ts_ms"].tolist() == [i * 250 for i in expect_idx]
    assert out["width"].tolist() == [24] * 4 and out["height"].tolist() == [16] * 4
    for row, i in zip(out.itertuples(), expect_idx):
        direct = decode_jpeg(frames[i]).reshape(-1)
        assert np.array_equal(np.asarray(row.pixels, dtype=np.uint8), direct)


def test_sample_frames_non_mjpeg_codec_raises(ray_session):
    from hgcn_name_disambiguation_ray.stages.multimodal import SampleFrames

    payload = synth_mp4(_frames(2), width=24, height=16, codec=b"avc1")
    t = pa.table(
        {
            "item_id": ["v"],
            "payload": pa.array([payload], type=pa.binary()),
            "mime": ["video/mp4"],
            "duration_ms": pa.array([200], type=pa.int32()),
            "width": pa.array([24], type=pa.int32()),
            "height": pa.array([16], type=pa.int32()),
        }
    )
    with pytest.raises(NotImplementedError):
        SampleFrames(n_frames=2, fake=False)(t)
    # fake mode falls back to the deterministic stub for the same payload
    out = SampleFrames(n_frames=2, fake=True)(t)
    assert out.num_rows == 2
    assert out["width"].to_pylist() == [24, 24]


def _vid_table(payload: bytes) -> pa.Table:
    return pa.table(
        {
            "item_id": ["v"],
            "payload": pa.array([payload], type=pa.binary()),
            "mime": ["video/mp4"],
            "duration_ms": pa.array([200], type=pa.int32()),
            "width": pa.array([24], type=pa.int32()),
            "height": pa.array([16], type=pa.int32()),
        }
    )


def test_sample_frames_corrupt_mjpeg_frames_respect_fake_contract(ray_session):
    """A structurally valid MJPEG container whose frame BYTES are damaged:
    fake=True must fall through to the stub (never raise), fake=False must
    raise ValueError (so on_error=\"skip\" catches it), never struct.error."""
    from hgcn_name_disambiguation_ray.stages.multimodal import SampleFrames

    frames = _frames(2)
    payload = bytearray(synth_mp4(frames, width=24, height=16))
    # flip the first frame's SOF0 marker to SOF2 (progressive) inside the
    # mdat: the container stays structurally valid, the frame decode is a
    # guaranteed ValueError("unsupported JPEG (progressive)")
    f0 = bytes(payload).find(frames[0])
    sof = bytes(payload).find(b"\xff\xc0", f0, f0 + len(frames[0]))
    assert sof != -1
    payload[sof + 1] = 0xC2
    t = _vid_table(bytes(payload))
    out = SampleFrames(n_frames=2, fake=True)(t)  # stub, no raise
    assert out.num_rows == 2
    with pytest.raises(ValueError):
        SampleFrames(n_frames=2, fake=False)(t)


def test_sample_frames_short_stsd_respects_fake_contract(ray_session):
    """A payload with the ftyp magic but a truncated moov (struct.error
    territory in the demuxer) must stub under fake=True and raise
    ValueError under fake=False."""
    from hgcn_name_disambiguation_ray.stages.multimodal import SampleFrames

    good = synth_mp4(_frames(2), width=24, height=16)
    trunc = good[: len(good) - 40]  # cut into the sample tables
    t = _vid_table(trunc)
    out = SampleFrames(n_frames=2, fake=True)(t)
    assert out.num_rows == 2
    with pytest.raises((ValueError, NotImplementedError)):
        SampleFrames(n_frames=2, fake=False)(t)


def test_synth_mp4_rejects_zero_sample_delta():
    with pytest.raises(ValueError):
        synth_mp4(_frames(1), width=24, height=16, fps=30, timescale=10)


def test_synth_mp4_clamps_overwide_chunk_claim():
    # frames_per_chunk > n_frames must not write an stsc entry claiming
    # more samples than exist: a strict demuxer computes offsets past mdat
    payload = synth_mp4(_frames(3), width=24, height=16, frames_per_chunk=5)
    track = demux_mp4(payload)
    assert len(track["sizes"]) == 3
    # sum of per-chunk sample claims reconstructed by the demuxer == n
    frames = _frames(3)
    for i in range(3):
        assert mp4_sample_bytes(payload, track, i) == frames[i]


def test_sample_frames_progressive_mjpeg(ray_session):
    """MJPEG-in-MP4 whose frames are PROGRESSIVE JPEGs: the demux path
    must decode them identically to a baseline-frame container (the
    codec handles SOF2 for real now — no more guaranteed-raise)."""
    from hgcn_name_disambiguation_ray.stages.multimodal import SampleFrames

    def img(i, w=24, h=16):
        y, x = np.mgrid[0:h, 0:w]
        return np.stack(
            [(x * 5 + i * 17) % 256, (y * 9 + i * 3) % 256, (x + y + i * 29) % 256],
            axis=-1,
        ).astype(np.uint8)

    base = synth_mp4([synth_jpeg(img(i), quality=92) for i in range(4)],
                     width=24, height=16)
    prog = synth_mp4(
        [synth_jpeg(img(i), quality=92, progressive=True) for i in range(4)],
        width=24, height=16,
    )
    out_b = SampleFrames(n_frames=2, fake=False)(_vid_table(base))
    out_p = SampleFrames(n_frames=2, fake=False)(_vid_table(prog))
    assert out_p.num_rows == out_b.num_rows == 2
    for r in range(2):
        pb = np.asarray(out_b["pixels"][r].as_py(), dtype=np.uint8)
        pp = np.asarray(out_p["pixels"][r].as_py(), dtype=np.uint8)
        assert np.array_equal(pb, pp)  # progressive == baseline, byte-exact
