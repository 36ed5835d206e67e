"""Multimodal columns: binary payloads + typed metadata, actor-pool stages.

Images / audio / video are opaque `binary` columns with sidecar metadata
(mime, width/height or duration). The Ray-side plumbing — schemas, small
batch sizes for wide rows, actor-pool stage shape, output layout — is
real and tested; the codec calls themselves are STUBBED (this container
ships no image/audio libraries): `DecodeImage` raises NotImplementedError
unless `fake=True`, in which case a clearly-marked deterministic fake
derives pseudo pixels from the payload hash so downstream stages
(resize / feature-extract / frame-sample) can be exercised end-to-end.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from ray.data import Dataset

from hgcn_name_disambiguation_ray.functions.hashing import stable_hash64

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
        ids = t["item_id"].to_pylist()
        payloads = t["payload"].to_pylist()
        ws = t["width"].to_pylist()
        hs = t["height"].to_pylist()
        pixels = []
        for p, w, h in zip(payloads, ws, hs):
            pixels.append(self._decode(p or b"", int(w), int(h)).reshape(-1))
        return pa.table(
            {
                "item_id": pa.array(ids, type=pa.string()),
                "width": t["width"],
                "height": t["height"],
                "pixels": pa.array([px.tolist() for px in pixels], type=pa.list_(pa.uint8())),
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
        ids = t["item_id"].to_pylist()
        ws = t["width"].to_pylist()
        hs = t["height"].to_pylist()
        pixels = t["pixels"].to_pylist()
        out = []
        for px, w, h in zip(pixels, ws, hs):
            img = np.asarray(px, dtype=np.uint8).reshape(int(h), int(w), self.channels)
            yi = (np.arange(self.out_h) * h // self.out_h).astype(np.int64)
            xi = (np.arange(self.out_w) * w // self.out_w).astype(np.int64)
            out.append(img[yi][:, xi].reshape(-1).tolist())
        return pa.table(
            {
                "item_id": pa.array(ids, type=pa.string()),
                "width": pa.array([self.out_w] * len(ids), type=pa.int32()),
                "height": pa.array([self.out_h] * len(ids), type=pa.int32()),
                "pixels": pa.array(out, type=pa.list_(pa.uint8())),
            }
        )


class ImageFeatures:
    """Mean/std per channel — a stand-in feature extractor (real numpy)."""

    def __init__(self, channels: int = 3):
        self.channels = channels

    def __call__(self, t: pa.Table) -> pa.Table:
        ids = t["item_id"].to_pylist()
        feats = []
        for px in t["pixels"].to_pylist():
            a = np.asarray(px, dtype=np.float64).reshape(-1, self.channels)
            feats.append(np.concatenate([a.mean(0), a.std(0)]).tolist())
        return pa.table(
            {
                "item_id": pa.array(ids, type=pa.string()),
                "features": pa.array(feats, type=pa.list_(pa.float64())),
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
