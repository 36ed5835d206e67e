"""MinHash / SimHash / stable-hash properties."""

import numpy as np

from hgcn_name_disambiguation_ray.functions.hashing import (
    band_keys,
    hamming_distance64,
    minhash_signature,
    minhash_signatures_flat,
    perm_params,
    simhash,
    stable_hash64,
    stable_hash64_array,
)


def test_stable_hash_is_stable():
    assert stable_hash64("hello") == stable_hash64("hello")
    assert stable_hash64("hello") != stable_hash64("hellp")
    arr = stable_hash64_array(np.array(["a", "b", "a"], dtype=object))
    assert arr[0] == arr[2] != arr[1]


def test_minhash_estimates_jaccard():
    rng = np.random.default_rng(0)
    a, b = perm_params(256, seed=7)
    s1 = {f"tok{i}" for i in range(100)}
    s2 = {f"tok{i}" for i in range(50, 150)}  # true J = 50/150 = 1/3
    h1 = stable_hash64_array(np.array(sorted(s1), dtype=object))
    h2 = stable_hash64_array(np.array(sorted(s2), dtype=object))
    sig1 = minhash_signature(h1, a, b)
    sig2 = minhash_signature(h2, a, b)
    est = (sig1 == sig2).mean()
    assert abs(est - 1 / 3) < 0.08


def test_flat_signatures_match_per_doc_and_handle_empties():
    a, b = perm_params(64, seed=3)
    docs = [["x", "y", "z"], [], ["y", "z", "w"], []]
    flat = np.array([t for d in docs for t in d], dtype=object)
    offsets = np.cumsum([0] + [len(d) for d in docs])
    fh = stable_hash64_array(flat)
    sigs = minhash_signatures_flat(fh, offsets, a, b)
    for i, d in enumerate(docs):
        h = stable_hash64_array(np.array(d, dtype=object)) if d else np.zeros(0, np.uint64)
        expected = minhash_signature(h, a, b)
        assert (sigs[i] == expected).all(), i


def test_band_keys_deterministic_and_identical_for_identical_docs():
    a, b = perm_params(64, seed=3)
    h = stable_hash64_array(np.array(["p", "q", "r"], dtype=object))
    sig = minhash_signature(h, a, b)
    k1 = band_keys(np.stack([sig, sig]), bands=16)
    assert (k1[0] == k1[1]).all()


def test_vectorized_hash_matches_scalar_reference():
    from hgcn_name_disambiguation_ray.functions.hashing import hash_string_array, poly_hash64
    import pyarrow as pa

    toks = ["", "a", "ab", "hello", "hellp", "ünïcode✓", "x" * 500, "a\x00b", "\x00"]
    arr_np = np.array(toks, dtype=object)
    vec = stable_hash64_array(arr_np)
    ref = np.array([poly_hash64(t) for t in toks], dtype=np.uint64)
    assert (vec == ref).all()
    # Arrow-native entry point, both offset widths, sliced arrays, nulls
    for typ in (pa.string(), pa.large_string()):
        arr = pa.array(toks, type=typ)
        assert (hash_string_array(arr) == ref).all()
        assert (hash_string_array(arr.slice(2, 5)) == ref[2:7]).all()
    withnull = pa.array(["a", None, "b"], type=pa.string())
    got = hash_string_array(withnull)
    assert got[1] == poly_hash64("")


def test_vectorized_hash_distribution():
    # low bits must be usable as bucket keys
    big = np.array([f"t{i}" for i in range(200_000)], dtype=object)
    h = stable_hash64_array(big)
    assert len(np.unique(h)) == len(big)  # no collisions on 200k distinct
    counts = np.bincount((h % 64).astype(int), minlength=64)
    assert counts.min() > 0.8 * len(big) / 64 and counts.max() < 1.2 * len(big) / 64


def test_hashed_split_matches_flat_split():
    import pyarrow as pa

    from hgcn_name_disambiguation_ray.functions.text import split_ws_flat, split_ws_hashed

    col = pa.array(["Hello  World", "", None, "  a b  ", "one", "\t x \n y "])
    flat, offs = split_ws_flat(col, lower=True)
    h2, offs2 = split_ws_hashed(col, lower=True)
    assert (offs == offs2).all()
    assert (stable_hash64_array(flat) == h2).all()


def test_content_hash128_identity_and_width():
    from hgcn_name_disambiguation_ray.functions.hashing import content_hash128

    hi, lo = content_hash128(np.array(["abc", "abd", "abc", ""], dtype=object))
    assert hi[0] == hi[2] and lo[0] == lo[2]
    assert (hi[0], lo[0]) != (hi[1], lo[1])
    assert hi.dtype == np.uint64 and lo.dtype == np.uint64


def test_simhash_similar_docs_close():
    base = [f"w{i}" for i in range(64)]
    d1 = stable_hash64_array(np.array(base, dtype=object))
    d2 = stable_hash64_array(np.array(base[:60] + ["x1", "x2", "x3", "x4"], dtype=object))
    d3 = stable_hash64_array(np.array([f"z{i}" for i in range(64)], dtype=object))
    h1, h2, h3 = simhash(d1), simhash(d2), simhash(d3)
    near = hamming_distance64(np.array([h1], dtype=np.uint64), np.array([h2], dtype=np.uint64))[0]
    far = hamming_distance64(np.array([h1], dtype=np.uint64), np.array([h3], dtype=np.uint64))[0]
    assert near < far
    assert simhash(np.zeros(0, dtype=np.uint64)) == 0
