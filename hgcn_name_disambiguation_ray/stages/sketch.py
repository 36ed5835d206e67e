"""Sketch aggregates: sublinear-state statistics for web-scale corpora.

HyperLogLog distinct counting (Flajolet et al. 2007): each batch folds
its values into m = 2^p one-byte registers; register merge is an
elementwise MAX — commutative and idempotent, so the result is exactly
partitioning- and order-invariant (the property a 256-node shuffle-free
aggregate needs). The driver reduces one m-byte row per block: the
whole corpus collapses to kilobytes of state in a single streaming pass,
where exact distinct counting needs a full shuffle of every distinct
value (`vocabulary`). Standard relative error ≈ 1.04/sqrt(m)
(~1.6% at p=12).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
from ray.data import Dataset

from hgcn_name_disambiguation_ray.functions.hashing import _splitmix64, hash_string_array


def _nlz64(x: np.ndarray) -> np.ndarray:
    """Vectorized count-leading-zeros for uint64 (6-step binary search)."""
    x = x.copy()
    n = np.zeros(x.shape, dtype=np.int64)
    zero = x == 0
    with np.errstate(over="ignore"):
        for s in (32, 16, 8, 4, 2, 1):
            m = x < (np.uint64(1) << np.uint64(64 - s))
            n += np.where(m, s, 0)
            x = np.where(m, x << np.uint64(s), x)
    n[zero] = 64
    return n


def _registers_from_hashes(h: np.ndarray, p: int) -> np.ndarray:
    """uint64 hashes -> m=2^p uint8 HLL registers (max rank per bucket)."""
    m = 1 << p
    reg = np.zeros(m, dtype=np.uint8)
    if len(h) == 0:
        return reg
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    with np.errstate(over="ignore"):
        w = h << np.uint64(p)
    rank = np.minimum(_nlz64(w) + 1, 64 - p + 1).astype(np.uint8)
    np.maximum.at(reg, idx, rank)
    return reg


def _estimate(reg: np.ndarray) -> float:
    """The standard HLL estimator with the small-range (linear counting)
    correction; the 64-bit-hash large-range correction is unnecessary."""
    m = len(reg)
    alpha = 0.7213 / (1.0 + 1.079 / m)
    e = alpha * m * m / np.sum(np.exp2(-reg.astype(np.float64)))
    if e <= 2.5 * m:
        v = int(np.sum(reg == 0))
        if v > 0:
            return m * np.log(m / v)
    return float(e)


def _reduce_registers(ds_regs: Dataset, p: int) -> np.ndarray:
    """Merge per-block register rows (elementwise max). The driver sees
    one m-byte row per block — bounded state, never corpus data."""
    m = 1 << p
    reg = np.zeros(m, dtype=np.uint8)
    for row in ds_regs.take_all():
        reg = np.maximum(reg, np.asarray(row["reg"], dtype=np.uint8))
    return reg


def approx_distinct(ds: Dataset, col: str, p: int = 12) -> int:
    """Approximate distinct count of a string or integer column."""

    def per_batch(t: pa.Table) -> pa.Table:
        h, valid = _hash_column(t, col)
        # nulls don't count (SQL COUNT(DISTINCT col) ignores them)
        return pa.table({"reg": pa.array([_registers_from_hashes(h[valid], p)])})

    return int(round(_estimate(_reduce_registers(
        ds.map_batches(per_batch, batch_format="pyarrow"), p
    ))))


def approx_distinct_tokens(ds: Dataset, text_col: str = "text", p: int = 12) -> int:
    """Approximate distinct lowercased-whitespace-token count — the
    one-pass, shuffle-free stand-in for `vocabulary`'s exact distinct."""
    from hgcn_name_disambiguation_ray.functions.text import split_ws_hashed

    def per_batch(t: pa.Table) -> pa.Table:
        h, _ = split_ws_hashed(t[text_col], lower=True)
        return pa.table({"reg": pa.array([_registers_from_hashes(h, p)])})

    return int(round(_estimate(_reduce_registers(
        ds.map_batches(per_batch, batch_format="pyarrow"), p
    ))))


# --------------------------------------------------------------------------
# Bloom filter: incremental dedup against a prior corpus snapshot
# --------------------------------------------------------------------------

def _bloom_positions(h: np.ndarray, m_bits: int, k: int) -> np.ndarray:
    """k derived bit positions per hash (double hashing: h1 + i*h2 —
    Kirsch & Mitzenmacher 2006), shape (len(h), k)."""
    h1 = h % np.uint64(m_bits)
    h2 = (_splitmix64(h) % np.uint64(m_bits - 1)) + np.uint64(1)
    i = np.arange(k, dtype=np.uint64)
    return ((h1[:, None] + i[None, :] * h2[:, None]) % np.uint64(m_bits)).astype(np.int64)


def _hash_column(t: pa.Table, col: str) -> tuple[np.ndarray, np.ndarray]:
    """(uint64 hashes, valid mask). Integer decode goes straight through
    Arrow buffers — a to_pandas round-trip would degrade a null-containing
    batch to float64, making a value's hash depend on its batchmates'
    nulls (values above 2^53 round), which would let a genuinely-seen key
    slip past the Bloom filter as a FALSE NEGATIVE. Null keys are marked
    invalid: SQL equality semantics say NULL matches nothing, so callers
    must treat them as never-seen / not-distinct-countable."""
    import pyarrow.compute as pc

    c = t[col]
    arr = c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c
    valid = (
        pc.is_valid(arr).to_numpy(zero_copy_only=False)
        if arr.null_count
        else np.ones(len(arr), dtype=bool)
    )
    if pa.types.is_string(arr.type) or pa.types.is_large_string(arr.type):
        return hash_string_array(arr), valid
    ints = pc.fill_null(arr.cast(pa.int64()), 0).to_numpy(zero_copy_only=False)
    return _splitmix64(ints.astype(np.uint64, copy=False)), valid


def bloom_build(ds: Dataset, col: str, m_bits: int = 1 << 20, k: int = 7) -> np.ndarray:
    """Fold a column into a Bloom bit array (packed uint8, m_bits/8
    bytes). Merge across blocks is bitwise OR — commutative/idempotent
    like the HLL register max, so the build is partitioning-invariant
    and shuffle-free; the driver reduces one m/8-byte row per block.
    Size m_bits ≈ 10 bits/element for ~0.8% false positives at k=7."""

    def per_batch(t: pa.Table) -> pa.Table:
        bits = np.zeros(m_bits // 8, dtype=np.uint8)
        h, valid = _hash_column(t, col)
        h = h[valid]  # null keys are not members (SQL: NULL = x is never true)
        if len(h):
            pos = _bloom_positions(h, m_bits, k).reshape(-1)
            np.bitwise_or.at(bits, pos >> 3, np.uint8(1) << (pos & 7).astype(np.uint8))
        return pa.table({"bits": pa.array([bits])})

    out = np.zeros(m_bits // 8, dtype=np.uint8)
    for row in ds.map_batches(per_batch, batch_format="pyarrow").take_all():
        out |= np.asarray(row["bits"], dtype=np.uint8)
    return out


def bloom_filter_seen(
    ds: Dataset, bloom_bits: np.ndarray, col: str, k: int = 7
) -> Dataset:
    """Drop rows whose `col` is (probably) in the snapshot the Bloom
    bits were built from — the incremental-crawl dedup fast path. NO
    false negatives (every genuinely-seen value drops); false positives
    drop ~m/n/k-bound extra rows, acceptable where a re-crawled page
    costs more than a rare lost one. For exactness, follow with the
    distributed semi-join (`exact_dedup_corpus` pattern) on survivors.

    The bit array is broadcast ONCE via ray.put and resolved per actor."""
    m_bits = len(bloom_bits) * 8
    ref = ray.put(np.asarray(bloom_bits, dtype=np.uint8))

    class Filter:
        def __init__(self):
            self.bits = ray.get(ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            h, valid = _hash_column(t, col)
            if len(h) == 0:
                return t
            pos = _bloom_positions(h, m_bits, k)
            hit = (self.bits[pos >> 3] & (np.uint8(1) << (pos & 7).astype(np.uint8))) != 0
            seen = hit.all(axis=1) & valid  # null keys are never 'seen'
            return t.filter(pa.array(~seen))

    return ds.map_batches(Filter, batch_format="pyarrow", concurrency=(1, 8))


def incremental_dedup(
    new_ds: Dataset,
    snapshot_ds: Dataset,
    col: str,
    m_bits: int = 1 << 20,
    k: int = 7,
) -> Dataset:
    """EXACT incremental dedup of a new crawl against a prior snapshot,
    with the Bloom filter as the volume killer: rows the filter calls
    definitely-new (no false negatives ⇒ provably not in the snapshot)
    bypass the join entirely; only the maybe-seen subset — true re-crawls
    plus the ~1% false positives — goes through the distributed anti-join
    that resurrects the false positives. The join therefore moves
    O(overlap) rows instead of O(corpus), and the result equals the plain
    anti-join bit for bit (SQL-oracle-checked).

    The flag stage is recomputed by each branch on purpose: re-hashing a
    batch is far cheaper than materializing the whole new corpus."""
    from hgcn_name_disambiguation_ray.stages.groupagg import hash_join

    bloom_ref = ray.put(bloom_build(snapshot_ds, col, m_bits, k))
    cols = new_ds.columns()

    def split(keep_hits: bool):
        class Split:
            def __init__(self):
                self.bits = ray.get(bloom_ref)

            def __call__(self, t: pa.Table) -> pa.Table:
                h, valid = _hash_column(t, col)
                if len(h) == 0:
                    return t
                pos = _bloom_positions(h, m_bits, k)
                hit = (
                    (self.bits[pos >> 3] & (np.uint8(1) << (pos & 7).astype(np.uint8))) != 0
                ).all(axis=1) & valid  # null keys route to definitely-new
                return t.filter(pa.array(hit if keep_hits else ~hit))

        return Split

    definitely_new = new_ds.map_batches(
        split(False), batch_format="pyarrow", concurrency=(1, 8)
    )
    maybe_seen = new_ds.map_batches(
        split(True), batch_format="pyarrow", concurrency=(1, 8)
    )
    snap_keys = snapshot_ds.select_columns([col])
    resurrected = hash_join(maybe_seen, snap_keys, on=[col], how="anti")
    return definitely_new.select_columns(cols).union(
        resurrected.select_columns(cols)
    )
