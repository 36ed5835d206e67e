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
    """list<float> column -> (n, d) float64 matrix, decoded zero-copy from
    the Arrow offsets/values buffers (r2 finding #9: `to_pylist` built n·d
    Python floats per batch). Falls back to to_pylist only for ragged or
    exotic layouts."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    if n == 0:
        return np.zeros((0, 0), dtype=np.float64)
    try:
        if pa.types.is_fixed_size_list(col.type):
            d = col.type.list_size
            vals = col.values.to_numpy(zero_copy_only=False)
            start = col.offset * d
            return np.asarray(vals[start : start + n * d], dtype=np.float64).reshape(n, d)
        if pa.types.is_list(col.type) or pa.types.is_large_list(col.type):
            offsets = col.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
            lens = np.diff(offsets)
            if len(lens) and (lens == lens[0]).all() and lens[0] > 0:
                d = int(lens[0])
                vals = col.values.to_numpy(zero_copy_only=False)
                return np.asarray(
                    vals[offsets[0] : offsets[0] + n * d], dtype=np.float64
                ).reshape(n, d)
    except (pa.ArrowInvalid, ValueError):
        pass
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
        idc = t[self.id_col]
        if isinstance(idc, pa.ChunkedArray):
            idc = idc.combine_chunks()
        # buffer decode, not to_pylist: no per-value Python on the hot path
        ids = idc.to_numpy(zero_copy_only=False)
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


class IvfIndex:
    """Disk-partitioned IVF index: build once, query many times, and a
    probe only READS its nprobe partitions (parquet directories keyed by
    nearest centroid) — scanned rows scale with nprobe/n_centroids, not
    corpus size. The build is one assignment pass + one partitioned
    write; at cluster scale the partition directories live in shared
    object storage and queries are pure pruned reads."""

    def __init__(self, index_dir: str, centroids: np.ndarray,
                 vec_col: str = "embedding", id_col: str = "vec_id"):
        self.index_dir = index_dir
        self.centroids = centroids  # L2-normalized (n_centroids, d)
        self.vec_col = vec_col
        self.id_col = id_col

    # -- build ------------------------------------------------------------
    @classmethod
    def build(
        cls,
        ds: Dataset,
        index_dir: str,
        n_centroids: int = 16,
        vec_col: str = "embedding",
        id_col: str = "vec_id",
        sample_rows: int = 2048,
        seed: int = 13,
        iters: int = 5,
    ) -> "IvfIndex":
        import os

        # DETERMINISTIC sample: Dataset.random_sample is row-order- and
        # partitioning-dependent (the repo's own sampling module rejects
        # it for exactly that reason), which would give different
        # centroids — hence different IVF results — per cluster size.
        # Knuth-hash thresholding is a pure function of the id.
        from hgcn_name_disambiguation_ray.stages.sampling import split_hash

        frac = min(1.0, sample_rows / max(1, ds.count()))
        thresh = np.uint64(int(frac * (1 << 32)))

        def keep(t: pa.Table) -> pa.Table:
            from hgcn_name_disambiguation_ray.stages.sampling import _ids64

            with np.errstate(over="ignore"):
                m = split_hash(_ids64(t, id_col) + np.int64(seed)) < thresh
            return t.filter(pa.array(m))

        sample_df = (
            ds.map_batches(keep, batch_format="pyarrow")
            .select_columns([vec_col]).to_pandas()
        )
        sample = np.array(sample_df[vec_col].tolist(), dtype=np.float64)
        cents = _normalize(_kmeans_lite(_normalize(sample), n_centroids, iters=iters, seed=seed))
        cref = ray.put(cents)

        class Assign:
            def __init__(self, ref, vec_col):
                self.cents = ray.get(ref)
                self.vec_col = vec_col

            def __call__(self, t: pa.Table) -> pa.Table:
                if t.num_rows == 0:
                    return t.append_column("centroid", pa.array([], type=pa.int32()))
                m = _normalize(_as_matrix(t[self.vec_col]))
                assign = (m @ self.cents.T).argmax(1).astype(np.int32)
                return t.append_column("centroid", pa.array(assign))

        # build into a temp dir and rename into place: a crashed or
        # concurrent duplicate build can never leave stale partition rows
        # beside new ones (duplicated query results / inflated scanned_rows)
        import shutil

        tmp_dir = index_dir.rstrip("/") + f".tmp-{os.getpid()}"
        if os.path.exists(tmp_dir):
            shutil.rmtree(tmp_dir)
        os.makedirs(tmp_dir)
        ds.map_batches(Assign, fn_constructor_args=(cref, vec_col),
                       batch_format="pyarrow", concurrency=(1, 8)).write_parquet(
            tmp_dir, partition_cols=["centroid"]
        )
        np.save(os.path.join(tmp_dir, "_centroids.npy"), cents)
        if os.path.exists(index_dir):
            shutil.rmtree(index_dir)
        os.rename(tmp_dir, index_dir)
        return cls(index_dir, cents, vec_col, id_col)

    @classmethod
    def load(cls, index_dir: str, vec_col: str = "embedding", id_col: str = "vec_id") -> "IvfIndex":
        import os

        cents = np.load(os.path.join(index_dir, "_centroids.npy"))
        return cls(index_dir, cents, vec_col, id_col)

    # -- query ------------------------------------------------------------
    def probed_partitions(self, queries: np.ndarray, nprobe: int) -> dict[int, np.ndarray]:
        """{centroid id: array of query indices probing it}."""
        q = _normalize(np.asarray(queries, dtype=np.float64))
        probes = np.argsort(-(q @ self.centroids.T), axis=1)[:, :nprobe]
        out: dict[int, list[int]] = {}
        for qi in range(len(q)):
            for c in probes[qi]:
                out.setdefault(int(c), []).append(qi)
        return {c: np.asarray(v, dtype=np.int64) for c, v in out.items()}

    def scanned_rows(self, queries: np.ndarray, nprobe: int) -> tuple[int, int]:
        """(rows a query pass reads, total indexed rows) — from parquet
        metadata only; the bench evidence that probes prune I/O."""
        import pyarrow.dataset as pads

        per_part = self.probed_partitions(queries, nprobe)
        scanned = total = 0
        for c in range(len(self.centroids)):
            path = f"{self.index_dir}/centroid={c}"
            try:
                n = sum(
                    frag.metadata.num_rows if frag.metadata else frag.count_rows()
                    for frag in pads.dataset(path).get_fragments()
                )
            except FileNotFoundError:
                n = 0
            total += n
            if c in per_part:
                scanned += n
        return scanned, total

    def query(self, queries: np.ndarray, k: int = 10, nprobe: int = 4) -> Dataset:
        """(query_idx, vec_id, score, rank) over probed partitions only."""
        import os

        import ray.data as rd

        q = _normalize(np.asarray(queries, dtype=np.float64))
        per_part = self.probed_partitions(queries, nprobe)
        vec_col, id_col = self.vec_col, self.id_col

        def make_scorer(qsub: np.ndarray, qidx: np.ndarray):
            # qsub is the (small) slice of the query matrix probing this
            # partition — shipped once in the task closure, no actor pool
            # (one min-1-actor pool per partition would deadlock small CPU
            # budgets); the per-batch work is one matmul + local top-k
            def score(t: pa.Table) -> pa.Table:
                idc = t[id_col]
                if isinstance(idc, pa.ChunkedArray):
                    idc = idc.combine_chunks()
                ids = idc.to_numpy(zero_copy_only=False)
                if len(ids) == 0:
                    return pa.table({"query_idx": pa.array([], type=pa.int32()),
                                     "vec_id": pa.array([], type=pa.int64()),
                                     "score": pa.array([], type=pa.float64())})
                m = _normalize(_as_matrix(t[vec_col]))
                sims = qsub @ m.T
                kk = min(k, sims.shape[1])
                idx = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]
                qi = np.repeat(qidx.astype(np.int32), kk)
                vi = ids[idx.reshape(-1)]
                sc = np.take_along_axis(sims, idx, axis=1).reshape(-1)
                return pa.table({"query_idx": pa.array(qi, type=pa.int32()),
                                 "vec_id": pa.array(vi, type=pa.int64()),
                                 "score": pa.array(sc, type=pa.float64())})

            return score

        parts = []
        for c, qidx in sorted(per_part.items()):
            path = f"{self.index_dir}/centroid={c}"
            if not os.path.isdir(path):
                continue  # centroid attracted no rows
            part = rd.read_parquet(path, columns=[id_col, vec_col]).map_batches(
                make_scorer(q[qidx], qidx), batch_format="pyarrow"
            )
            parts.append(part)
        if not parts:
            return rd.from_arrow(
                pa.table({"query_idx": pa.array([], type=pa.int32()),
                          "vec_id": pa.array([], type=pa.int64()),
                          "score": pa.array([], type=pa.float64()),
                          "rank": pa.array([], type=pa.int64())})
            )
        local = parts[0]
        for p in parts[1:]:
            local = local.union(p)

        def merge(g: pd.DataFrame) -> pd.DataFrame:
            g = g.sort_values(["score", "vec_id"], ascending=[False, True]).head(k)
            g = g.reset_index(drop=True)
            g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
            return g

        return local.groupby("query_idx").map_groups(merge, batch_format="pandas")


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
    index_dir: str | None = None,
) -> Dataset:
    """Approximate top-k via a disk-partitioned IVF index (build + query).
    Pass `index_dir` to keep the index for further queries; the default
    builds under /tmp keyed by a deterministic name."""
    if index_dir is None:
        import tempfile

        index_dir = tempfile.mkdtemp(prefix="ivf_index_")
    idx = IvfIndex.build(
        ds, index_dir, n_centroids=n_centroids, vec_col=vec_col, id_col=id_col,
        sample_rows=sample_rows, seed=seed,
    )
    return idx.query(queries, k=k, nprobe=nprobe)


# --------------------------------------------------------------------------
# distributed k-means (Lloyd) over an embedding column
# --------------------------------------------------------------------------

def _kmeans_seed_centroids(
    ds: Dataset, k: int, vec_col: str, id_col: str
) -> np.ndarray:
    """Deterministic, partitioning-independent init: the k rows with the
    smallest Knuth hash of their id (ties by id). Each batch emits only
    its local k smallest, so the driver sees <= k * n_blocks tiny rows."""
    from hgcn_name_disambiguation_ray.stages.sampling import split_hash

    def local(t: pa.Table) -> pa.Table:
        ids = np.asarray(t[id_col].to_pandas(), dtype=np.int64)
        if len(ids) == 0:
            return pa.table({"h": pa.array([], type=pa.int64()),
                             "id": pa.array([], type=pa.int64()),
                             "v": pa.array([], type=pa.list_(pa.float64()))})
        h = split_hash(ids).astype(np.int64)
        order = np.lexsort((ids, h))[:k]
        m = _as_matrix(t[vec_col])[order]
        return pa.table({"h": pa.array(h[order]), "id": pa.array(ids[order]),
                         "v": pa.array(list(m), type=pa.list_(pa.float64()))})

    rows = ds.map_batches(local, batch_format="pyarrow").take_all()
    rows.sort(key=lambda r: (r["h"], r["id"]))
    return np.array([np.asarray(r["v"], dtype=np.float64) for r in rows[:k]])


def kmeans_fit(
    ds: Dataset,
    k: int,
    iters: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> np.ndarray:
    """Distributed Lloyd's algorithm: centroids (small state) broadcast
    via ray.put each iteration; every batch emits k partial rows
    (cluster, count, vector sum), the driver reduces k * n_blocks tiny
    rows and updates. The dataset itself never leaves the object store —
    the driver's working set is O(k * d * n_blocks) per iteration
    regardless of corpus size. Empty clusters keep their old centroid.

    Determinism: init is a pure function of the ids, distances are exact
    float64, so the fitted centroids match a single-process Lloyd run to
    summation-order rounding (tested bit-close + assignment-identical
    across different partitionings)."""
    # pin the input once: an iterative algorithm would otherwise re-run
    # the whole upstream lineage (parquet scan + transforms) every
    # iteration; the object store spills under pressure, so this is safe
    # at scale and strictly cheaper than iters x full re-reads
    ds = ds.materialize()
    C = _kmeans_seed_centroids(ds, k, vec_col, id_col)
    if len(C) < k:
        return C

    for _ in range(iters):
        ref = ray.put(C)

        def partial(t: pa.Table) -> pa.Table:
            Cb = ray.get(ref)
            X = _as_matrix(t[vec_col])
            if X.shape[0] == 0:
                return pa.table({"c": pa.array([], type=pa.int64()),
                                 "n": pa.array([], type=pa.int64()),
                                 "s": pa.array([], type=pa.list_(pa.float64()))})
            a = np.argmin(
                -2.0 * (X @ Cb.T) + (Cb * Cb).sum(axis=1)[None, :], axis=1
            )
            counts = np.bincount(a, minlength=len(Cb))
            sums = np.zeros_like(Cb)
            np.add.at(sums, a, X)
            used = counts > 0
            return pa.table(
                {
                    "c": pa.array(np.flatnonzero(used).astype(np.int64)),
                    "n": pa.array(counts[used].astype(np.int64)),
                    "s": pa.array(list(sums[used]), type=pa.list_(pa.float64())),
                }
            )

        rows = ds.map_batches(partial, batch_format="pyarrow").take_all()
        counts = np.zeros(k, dtype=np.int64)
        sums = np.zeros_like(C)
        # reduce in a deterministic order — (cluster, count, sum bytes) is a
        # pure function of the partial VALUES, so float64 summation order
        # (and thus the fitted centroids) cannot vary with block arrival
        # order even when two blocks tie on (cluster, count)
        def _key(r):
            return (r["c"], r["n"], np.asarray(r["s"], dtype=np.float64).tobytes())

        for r in sorted(rows, key=_key):
            counts[r["c"]] += r["n"]
            sums[r["c"]] += np.asarray(r["s"], dtype=np.float64)
        nz = counts > 0
        C = C.copy()
        C[nz] = sums[nz] / counts[nz, None]
    return C


def kmeans_assign(
    ds: Dataset,
    centroids: np.ndarray,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> Dataset:
    """(id, cluster): nearest-centroid assignment, one matmul per batch
    against the broadcast centroid matrix."""
    ref = ray.put(np.asarray(centroids, dtype=np.float64))

    class Assign:
        def __init__(self):
            self.C = ray.get(ref)
            self.bias = (self.C * self.C).sum(axis=1)[None, :]

        def __call__(self, t: pa.Table) -> pa.Table:
            X = _as_matrix(t[vec_col])
            if X.shape[0] == 0:
                # keep the caller's id type (a hardcoded int64 here would
                # give empty blocks a different schema than full ones)
                return pa.table({id_col: t[id_col],
                                 "cluster": pa.array([], type=pa.int64())})
            a = np.argmin(-2.0 * (X @ self.C.T) + self.bias, axis=1)
            return pa.table({id_col: t[id_col], "cluster": pa.array(a.astype(np.int64))})

    return ds.map_batches(Assign, batch_format="pyarrow", concurrency=(1, 8))
