"""Deterministic dataset splitting / sampling (training-data prep).

Both operators key on a Knuth multiplicative hash of the integer id —
NOT Python's hash() (process-dependent) and NOT `Dataset.random_sample`
(row-order-dependent): the assignment is a pure function of the id, so
it is identical on every run, every cluster size, and every engine (the
hash is plain modular arithmetic, replicable in SQL for the oracle and
in any downstream system that must agree on the split).

  * hash_split          — append 'train'/'test' split column (pct-based)
  * deterministic_sample— keep a stable frac of rows by hash threshold
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from ray.data import Dataset

_KNUTH = np.uint64(2654435761)
_MOD32 = np.uint64(1 << 32)


def _ids64(t: pa.Table, col: str) -> np.ndarray:
    """Non-null int64 ids decoded straight off the Arrow buffers.

    A to_pandas round-trip would silently degrade a null-containing
    batch to float64 — nulls become INT64_MIN and ids above 2^53 round —
    so the 'assignment is a pure function of the id' contract demands an
    exact decode and a LOUD failure on null ids (a data bug, not a row
    to guess about)."""
    arr = t[col]
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if arr.null_count:
        raise ValueError(f"{col} contains nulls; ids must be non-null")
    return arr.to_numpy(zero_copy_only=False).astype(np.int64, copy=False)


def split_hash(ids: np.ndarray, seed: int = 0) -> np.ndarray:
    """((id + seed) * 2654435761) mod 2^32 — SQL: plain BIGINT arithmetic.

    NOTE: the LOW bits are unmixed (the Knuth multiplier is 1 mod 16, so
    h %% 16 == (id+seed) %% 16 exactly) — never reduce this hash with a
    small modulus; use `hash_bucket` (high-bit scaling) instead."""
    with np.errstate(over="ignore"):
        return ((ids.astype(np.uint64) + np.uint64(seed)) * _KNUTH) % _MOD32


def hash_bucket(ids: np.ndarray, n: int, seed: int = 0) -> np.ndarray:
    """Bucket in [0, n) from the WELL-MIXED high bits: (h * n) >> 32.
    A plain h %% n inherits id structure (ids that are multiples of 16
    collapse buckets); the scaled form is still one line of SQL:
    (((id * 2654435761) %% 4294967296) * n) // 4294967296."""
    return ((split_hash(ids, seed) * np.uint64(n)) >> np.uint64(32)).astype(np.int64)


def hash_split(
    ds: Dataset, id_col: str = "doc_id", train_pct: int = 90, seed: int = 0
) -> Dataset:
    """Append a 'split' column: 'train' when hash(id) %% 100 < train_pct."""

    def body(t: pa.Table) -> pa.Table:
        b = hash_bucket(_ids64(t, id_col), 100, seed)
        split = np.where(b < train_pct, "train", "test")
        return t.append_column("split", pa.array(split, type=pa.string()))

    return ds.map_batches(body, batch_format="pyarrow")


def deterministic_sample(
    ds: Dataset, frac: float, id_col: str = "doc_id", seed: int = 0
) -> Dataset:
    """Keep rows whose hash bucket falls under frac — the same rows on
    every execution (content-stable, unlike Dataset.random_sample)."""
    thresh = np.uint64(int(frac * (1 << 32)))

    def body(t: pa.Table) -> pa.Table:
        keep = split_hash(_ids64(t, id_col), seed) < thresh
        return t.filter(pa.array(keep))

    return ds.map_batches(body, batch_format="pyarrow")


def stratified_sample(
    ds: Dataset,
    group_col: str,
    n_per_group: int,
    id_col: str = "doc_id",
    seed: int = 0,
) -> Dataset:
    """Deterministic n-per-group sample (corpus mixing / per-language or
    per-source caps): within each group, keep the n rows ranked first by
    (Knuth hash of id DESC, id ASC) — a pure function of the row, so the
    sample is identical at every cluster size and replicable in SQL.

    Scale shape: rides `group_topk`'s hash-bucketed shuffle (groups
    co-locate by key hash, head(n) vectorized per bucket) — never a
    global sort or a per-group Ray dispatch."""
    from hgcn_name_disambiguation_ray.stages.groupagg import group_topk

    def add_hash(t: pa.Table) -> pa.Table:
        h = split_hash(_ids64(t, id_col), seed).astype(np.int64)  # < 2^32: int64-safe
        return t.append_column("__h", pa.array(h, type=pa.int64()))

    out = group_topk(
        ds.map_batches(add_hash, batch_format="pyarrow"),
        keys=[group_col], sort_col="__h", k=n_per_group, tie_cols=[id_col],
    )
    return out.drop_columns(["__h"])
