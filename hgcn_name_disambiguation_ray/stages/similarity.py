"""Similarity search over an embedding column (list<float>).

  * brute_force_topk — exact cosine top-k: the query matrix is broadcast
    once (ray.put), each batch does ONE numpy matmul against it and emits
    its local top-k per query; a final tiny groupby merges local top-ks.
    Wall-time scales with corpus/batches, memory with k·queries.
  * ivf_topk — the scale path: deterministic k-means-lite centroids from
    a seeded sample, rows partitioned by nearest centroid; queries probe
    only their nprobe nearest centroids' partitions.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
from ray.data import Dataset


def _as_matrix(col) -> np.ndarray:
    return np.array(col.to_pylist(), dtype=np.float64)


def _normalize(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return m / norms


class _LocalTopK:
    def __init__(self, query_ref, k: int, vec_col: str, id_col: str):
        q = ray.get(query_ref) if isinstance(query_ref, ray.ObjectRef) else query_ref
        self.q = _normalize(np.asarray(q, dtype=np.float64))  # (nq, d)
        self.k = k
        self.vec_col = vec_col
        self.id_col = id_col

    def __call__(self, t: pa.Table) -> pa.Table:
        ids = np.asarray(t[self.id_col].to_pylist())
        if len(ids) == 0:
            return pa.table({"query_idx": pa.array([], type=pa.int32()),
                             "vec_id": pa.array([], type=pa.int64()),
                             "score": pa.array([], type=pa.float64())})
        m = _normalize(_as_matrix(t[self.vec_col]))          # (n, d)
        sims = self.q @ m.T                                   # (nq, n)
        k = min(self.k, sims.shape[1])
        idx = np.argpartition(-sims, k - 1, axis=1)[:, :k]
        qi = np.repeat(np.arange(sims.shape[0], dtype=np.int32), k)
        vi = ids[idx.reshape(-1)]
        sc = np.take_along_axis(sims, idx, axis=1).reshape(-1)
        return pa.table({"query_idx": pa.array(qi, type=pa.int32()),
                         "vec_id": pa.array(vi, type=pa.int64()),
                         "score": pa.array(sc, type=pa.float64())})


def brute_force_topk(
    ds: Dataset,
    queries: np.ndarray,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> Dataset:
    """(query_idx, vec_id, score) — global exact cosine top-k per query.

    Ties broken deterministically by (score desc, vec_id asc)."""
    qref = ray.put(np.asarray(queries, dtype=np.float64))
    local = ds.map_batches(
        _LocalTopK, fn_constructor_args=(qref, k, vec_col, id_col),
        batch_format="pyarrow", concurrency=(1, 8),
    )

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["score", "vec_id"], ascending=[False, True]).head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g

    return local.groupby("query_idx").map_groups(merge, batch_format="pandas")


def _kmeans_lite(sample: np.ndarray, n_centroids: int, iters: int, seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    n = len(sample)
    centroids = sample[rng.choice(n, size=min(n_centroids, n), replace=False)]
    for _ in range(iters):
        d = ((sample[:, None, :] - centroids[None, :, :]) ** 2).sum(-1)
        assign = d.argmin(1)
        for c in range(len(centroids)):
            pts = sample[assign == c]
            if len(pts):
                centroids[c] = pts.mean(0)
    return centroids


def ivf_topk(
    ds: Dataset,
    queries: np.ndarray,
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    sample_rows: int = 2048,
    seed: int = 13,
) -> Dataset:
    """Approximate top-k: coarse IVF partitioning. Centroids are trained on
    a deterministic sample; each batch only scores rows whose nearest
    centroid is among a query's nprobe probes."""
    frac = min(1.0, sample_rows / max(1, ds.count()))
    sample_df = ds.random_sample(frac, seed=seed).select_columns([vec_col]).to_pandas()
    sample = np.array(sample_df[vec_col].tolist(), dtype=np.float64)
    cents = _normalize(_kmeans_lite(_normalize(sample), n_centroids, iters=5, seed=seed))
    q = _normalize(np.asarray(queries, dtype=np.float64))
    probes = np.argsort(-(q @ cents.T), axis=1)[:, :nprobe]  # (nq, nprobe)
    cref = ray.put((cents, probes, q))

    class ProbeTopK:
        def __init__(self, ref, k, vec_col, id_col):
            self.cents, self.probes, self.q = ray.get(ref)
            self.k = k
            self.vec_col = vec_col
            self.id_col = id_col

        def __call__(self, t: pa.Table) -> pa.Table:
            ids = np.asarray(t[self.id_col].to_pylist())
            out = {"query_idx": [], "vec_id": [], "score": []}
            if len(ids) == 0:
                return pa.table({k2: pa.array(v) for k2, v in out.items()})
            m = _normalize(_as_matrix(t[self.vec_col]))
            assign = (m @ self.cents.T).argmax(1)  # nearest centroid per row
            for qi in range(len(self.q)):
                mask = np.isin(assign, self.probes[qi])
                if not mask.any():
                    continue
                sims = m[mask] @ self.q[qi]
                sub_ids = ids[mask]
                kk = min(self.k, len(sims))
                top = np.argpartition(-sims, kk - 1)[:kk]
                out["query_idx"].extend([qi] * kk)
                out["vec_id"].extend(sub_ids[top].tolist())
                out["score"].extend(sims[top].tolist())
            return pa.table(
                {
                    "query_idx": pa.array(out["query_idx"], type=pa.int32()),
                    "vec_id": pa.array(out["vec_id"], type=pa.int64()),
                    "score": pa.array(out["score"], type=pa.float64()),
                }
            )

    local = ds.map_batches(ProbeTopK, fn_constructor_args=(cref, k, vec_col, id_col),
                           batch_format="pyarrow", concurrency=(1, 8))

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["score", "vec_id"], ascending=[False, True]).head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g

    return local.groupby("query_idx").map_groups(merge, batch_format="pandas")
