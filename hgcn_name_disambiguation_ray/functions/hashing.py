"""Stable hashing, MinHash, and SimHash primitives.

All hashes are process-independent (no reliance on PYTHONHASHSEED):
the base 64-bit token hash is blake2b, memoised per distinct token, and
the k permutations are universal hashes ((a*x + b) mod p) applied
vectorized in numpy over uint64 — so signatures computed in different
Ray workers / cluster sizes are identical, which the deterministic-output
and two-parallelism-level tests rely on.
"""

from __future__ import annotations

from functools import lru_cache
from hashlib import blake2b

import numpy as np

_MERSENNE_P = np.uint64((1 << 61) - 1)


@lru_cache(maxsize=1 << 20)
def stable_hash64(token: str) -> int:
    """Stable 64-bit hash of a string (blake2b-8)."""
    return int.from_bytes(blake2b(token.encode("utf-8"), digest_size=8).digest(), "big")


def stable_hash64_array(tokens: np.ndarray) -> np.ndarray:
    """Vectorized-ish stable hash: hash each distinct token once."""
    if len(tokens) == 0:
        return np.zeros(0, dtype=np.uint64)
    uniq, inverse = np.unique(tokens.astype(str), return_inverse=True)
    h = np.array([stable_hash64(t) for t in uniq], dtype=np.uint64)
    return h[inverse]


def perm_params(num_perms: int, seed: int) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic (a, b) parameter vectors for universal hashing."""
    rng = np.random.default_rng(seed)
    a = rng.integers(1, int(_MERSENNE_P), size=num_perms, dtype=np.uint64)
    b = rng.integers(0, int(_MERSENNE_P), size=num_perms, dtype=np.uint64)
    return a, b


def minhash_signature(
    token_hashes: np.ndarray, a: np.ndarray, b: np.ndarray
) -> np.ndarray:
    """MinHash signature (len(a),) uint64 for one document's token-hash set.

    Empty documents get an all-max signature (never collides).
    """
    if len(token_hashes) == 0:
        return np.full(len(a), np.iinfo(np.uint64).max, dtype=np.uint64)
    x = token_hashes[:, None]  # (n, 1)
    with np.errstate(over="ignore"):
        hv = (x * a[None, :] + b[None, :]) % _MERSENNE_P
    return hv.min(axis=0)


def minhash_signatures_flat(
    flat_hashes: np.ndarray, offsets: np.ndarray, a: np.ndarray, b: np.ndarray
) -> np.ndarray:
    """MinHash signatures for many documents given flattened token hashes.

    `flat_hashes` is the concatenation of all docs' token hashes,
    `offsets` (n_docs+1) the list boundaries. Returns (n_docs, k) uint64.
    One pass: permute all hashes at once, then segmented-min via
    np.minimum.reduceat (guarding empty segments).
    """
    n_docs = len(offsets) - 1
    k = len(a)
    out = np.full((n_docs, k), np.iinfo(np.uint64).max, dtype=np.uint64)
    if len(flat_hashes) == 0:
        return out
    with np.errstate(over="ignore"):
        hv = (flat_hashes[:, None] * a[None, :] + b[None, :]) % _MERSENNE_P  # (N, k)
    nonempty = offsets[:-1] < offsets[1:]
    ne_starts = offsets[:-1][nonempty]
    # consecutive nonempty starts are exactly each other's end offsets
    # (empty segments contribute no values), so reduceat segments are correct
    out[nonempty] = np.minimum.reduceat(hv, ne_starts, axis=0)
    return out


def band_keys(signatures: np.ndarray, bands: int) -> np.ndarray:
    """Collapse (n, k) signatures into (n, bands) uint64 band-bucket keys."""
    n, k = signatures.shape
    r = k // bands
    sig = signatures[:, : bands * r].reshape(n, bands, r)
    # mix rows of each band into one 64-bit key (splitmix-style)
    key = np.zeros((n, bands), dtype=np.uint64)
    with np.errstate(over="ignore"):
        for i in range(r):
            key ^= sig[:, :, i] + np.uint64(0x9E3779B97F4A7C15) + (key << np.uint64(6)) + (key >> np.uint64(2))
    return key


def simhash(token_hashes: np.ndarray, weights: np.ndarray | None = None) -> int:
    """64-bit SimHash of a token-hash multiset."""
    if len(token_hashes) == 0:
        return 0
    bits = ((token_hashes[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(np.int64)
    contrib = bits * 2 - 1
    if weights is not None:
        contrib = contrib * weights[:, None]
    v = contrib.sum(axis=0)
    out = np.uint64(0)
    with np.errstate(over="ignore"):
        for i in range(64):
            if v[i] > 0:
                out |= np.uint64(1) << np.uint64(i)
    return int(out)


def simhash_flat(flat_hashes: np.ndarray, offsets: np.ndarray) -> np.ndarray:
    """64-bit SimHash per document over flattened token-hash multisets.

    `flat_hashes` concatenates every doc's token hashes (duplicates kept —
    SimHash is multiset-weighted), `offsets` (n_docs+1) the boundaries.
    Segmented, fully vectorized equivalent of calling `simhash` per doc;
    empty docs fingerprint to 0.
    """
    n_docs = len(offsets) - 1
    out = np.zeros(n_docs, dtype=np.uint64)
    if len(flat_hashes) == 0 or n_docs == 0:
        return out
    shifts = np.arange(64, dtype=np.uint64)[None, :]
    bits = ((flat_hashes[:, None] >> shifts) & np.uint64(1)).astype(np.int64)
    contrib = bits * 2 - 1                      # (N, 64) in {-1, +1}
    nonempty = offsets[:-1] < offsets[1:]
    # consecutive nonempty starts are each other's end offsets (empty
    # segments contribute no rows), so reduceat segments are exact
    sums = np.add.reduceat(contrib, offsets[:-1][nonempty], axis=0)
    fp_bits = (sums > 0).astype(np.uint64)
    with np.errstate(over="ignore"):
        vals = np.bitwise_or.reduce(fp_bits << shifts, axis=1)
    out[nonempty] = vals
    return out


def hamming_distance64(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Vectorized Hamming distance between uint64 arrays."""
    z = np.bitwise_xor(x, y)
    cnt = np.zeros(z.shape, dtype=np.int64)
    for _ in range(64):
        cnt += (z & np.uint64(1)).astype(np.int64)
        z = z >> np.uint64(1)
    return cnt
