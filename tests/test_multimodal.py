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
