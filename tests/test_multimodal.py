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
