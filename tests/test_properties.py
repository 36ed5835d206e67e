"""Property-based checks (hypothesis) for the core vectorized kernels.

These pin the exact-semantics contracts the oracle comparisons rely on:
str.split() parity of the Arrow splitter, pandas parity of the bucketed
groupby, and the packing invariant — over generated inputs, not just the
hand-written cases.
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
from hypothesis import given, settings, strategies as st

text_st = st.text(
    alphabet=st.sampled_from(list("ab 1.\t\né")), max_size=40
)


@settings(max_examples=60, deadline=None)
@given(st.lists(text_st, max_size=12))
def test_split_ws_flat_matches_str_split(texts):
    from hgcn_name_disambiguation_ray.functions.text import split_ws_flat

    flat, offsets = split_ws_flat(pa.array(texts, type=pa.string()))
    got = [list(flat[offsets[i]:offsets[i + 1]]) for i in range(len(texts))]
    want = [t.split() for t in texts]
    assert got == want


@settings(max_examples=60, deadline=None)
@given(st.lists(text_st, max_size=12))
def test_split_ws_flat_lower_matches_python(texts):
    from hgcn_name_disambiguation_ray.functions.text import split_ws_flat

    flat, offsets = split_ws_flat(pa.array(texts, type=pa.string()), lower=True)
    got = [list(flat[offsets[i]:offsets[i + 1]]) for i in range(len(texts))]
    want = [t.lower().split() for t in texts]
    assert got == want


@settings(max_examples=25, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 20), st.sampled_from(["x", "y", "z"]), st.integers(0, 9)),
        min_size=1, max_size=200,
    ),
    st.integers(1, 17),
)
def test_bucketed_count_property(ray_session, rows, n_buckets):
    import ray.data as rd

    from hgcn_name_disambiguation_ray.stages.groupagg import bucketed_count

    df = pd.DataFrame(rows, columns=["a", "b", "v"])
    got = (
        bucketed_count(rd.from_pandas(df), ["a", "b"], out_col="n", n_buckets=n_buckets)
        .to_pandas().sort_values(["a", "b"]).reset_index(drop=True)
    )
    want = (
        df.groupby(["a", "b"], as_index=False).size().rename(columns={"size": "n"})
        .sort_values(["a", "b"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got.astype({"n": np.int64}), want.astype({"n": np.int64}))


@settings(max_examples=25, deadline=None)
@given(
    st.lists(st.integers(0, 400), min_size=1, max_size=60, unique=True),
    st.integers(1, 50),
)
def test_pack_sequences_budget_invariant(ray_session, ids, budget):
    import ray.data as rd

    from hgcn_name_disambiguation_ray.pipelines.textprep import pack_sequences

    rng = np.random.default_rng(0)
    df = pd.DataFrame({"doc_id": ids, "n": rng.integers(1, 80, len(ids))})
    out = pack_sequences(rd.from_pandas(df), token_col="n", budget=budget,
                         n_buckets=3).to_pandas()
    assert len(out) == len(df)
    m = out.merge(df, on="doc_id")
    for (_, _), g in m.groupby(["bucket", "seq_idx"]):
        assert g["n"].sum() <= budget or len(g) == 1


@settings(max_examples=40, deadline=None)
@given(
    st.lists(
        st.lists(st.integers(0, 1 << 63), max_size=12), min_size=1, max_size=8
    )
)
def test_minhash_flat_matches_per_doc(doc_hashes):
    """The segmented minhash kernel must equal the per-doc scalar one,
    including empty docs interleaved between nonempty ones."""
    from hgcn_name_disambiguation_ray.functions.hashing import (
        minhash_signature,
        minhash_signatures_flat,
        perm_params,
    )

    a, b = perm_params(16, 3)
    flat = np.concatenate([np.asarray(d, dtype=np.uint64) for d in doc_hashes]) \
        if any(doc_hashes) else np.zeros(0, np.uint64)
    offsets = np.zeros(len(doc_hashes) + 1, dtype=np.int64)
    np.cumsum([len(d) for d in doc_hashes], out=offsets[1:])
    got = minhash_signatures_flat(flat, offsets, a, b)
    for i, d in enumerate(doc_hashes):
        want = minhash_signature(np.asarray(d, dtype=np.uint64), a, b)
        assert (got[i] == want).all(), i


@settings(max_examples=40, deadline=None)
@given(
    st.lists(
        st.lists(st.integers(0, 1 << 63), max_size=10), min_size=1, max_size=6
    )
)
def test_simhash_flat_matches_per_doc(doc_hashes):
    from hgcn_name_disambiguation_ray.functions.hashing import simhash, simhash_flat

    flat = np.concatenate([np.asarray(d, dtype=np.uint64) for d in doc_hashes]) \
        if any(doc_hashes) else np.zeros(0, np.uint64)
    offsets = np.zeros(len(doc_hashes) + 1, dtype=np.int64)
    np.cumsum([len(d) for d in doc_hashes], out=offsets[1:])
    got = simhash_flat(flat, offsets)
    for i, d in enumerate(doc_hashes):
        assert int(got[i]) == simhash(np.asarray(d, dtype=np.uint64)), i


@settings(max_examples=40, deadline=None)
@given(st.lists(st.lists(st.text(alphabet="abc", min_size=1, max_size=3), max_size=8),
                min_size=1, max_size=6),
       st.integers(1, 4))
def test_shingle_hashes_match_scalar_reference(docs, n):
    """Vectorized shingle mix-chain == a direct per-doc reimplementation
    (full windows for len>=n, one whole-doc shingle for 0<len<n)."""
    from hgcn_name_disambiguation_ray.functions.hashing import stable_hash64
    from hgcn_name_disambiguation_ray.stages.dedup import (
        _MIX, _SHINGLE_SEED, _shingle_hashes_flat,
    )

    th_per_doc = [np.array([stable_hash64(t) for t in d], dtype=np.uint64) for d in docs]
    flat = np.concatenate(th_per_doc) if any(len(d) for d in docs) else np.zeros(0, np.uint64)
    offsets = np.zeros(len(docs) + 1, dtype=np.int64)
    np.cumsum([len(d) for d in docs], out=offsets[1:])
    got_vals, got_off = _shingle_hashes_flat(flat, offsets, n)

    def mix(h_seq):
        h = np.uint64(_SHINGLE_SEED)
        with np.errstate(over="ignore"):
            for x in h_seq:
                h = (h * _MIX) ^ np.uint64(x)
        return h

    for i, th in enumerate(th_per_doc):
        want = []
        if len(th) >= n:
            want = [mix(th[j:j + n]) for j in range(len(th) - n + 1)]
        elif len(th):
            want = [mix(th)]
        assert list(got_vals[got_off[i]:got_off[i + 1]]) == want, i


# -- GIF LZW: encode/decode are exact inverses over generated rasters --------


@settings(max_examples=40, deadline=None)
@given(
    st.integers(min_value=2, max_value=8),
    st.lists(st.integers(min_value=0, max_value=255), min_size=1, max_size=600),
)
def test_gif_lzw_roundtrip(min_code_size, vals):
    from hgcn_name_disambiguation_ray.functions.gif import _lzw_decode, _lzw_encode

    idx = (np.asarray(vals, dtype=np.int64) % (1 << min_code_size)).astype(np.uint8)
    data = _lzw_encode(min_code_size, idx)
    out = _lzw_decode(min_code_size, data, len(idx))
    assert np.array_equal(out, idx)


@settings(max_examples=20, deadline=None)
@given(
    st.integers(min_value=1, max_value=3),
    st.integers(min_value=1, max_value=20),
    st.integers(min_value=1, max_value=20),
    st.integers(min_value=2, max_value=16),
    st.randoms(use_true_random=False),
)
def test_gif_full_roundtrip_lossless(n, h, w, n_colors, rnd):
    """synth_gif -> decode_gif is the identity for any palette-bounded
    animation (GIF is lossless)."""
    from hgcn_name_disambiguation_ray.functions.gif import decode_gif, synth_gif

    rng = np.random.default_rng(rnd.randrange(1 << 30))
    palette = rng.integers(0, 256, (n_colors, 3), dtype=np.uint8)
    frames = palette[rng.integers(0, n_colors, (n, h, w))]
    out = decode_gif(synth_gif(frames))
    assert np.array_equal(out["frames"], frames)


# -- progressive JPEG: always byte-identical to baseline ---------------------


@settings(max_examples=15, deadline=None)
@given(
    st.integers(min_value=1, max_value=40),
    st.integers(min_value=1, max_value=40),
    st.booleans(),
    st.integers(min_value=30, max_value=95),
    st.randoms(use_true_random=False),
)
def test_progressive_jpeg_equals_baseline(h, w, subsample, quality, rnd):
    from hgcn_name_disambiguation_ray.functions.jpeg import decode_jpeg, synth_jpeg

    rng = np.random.default_rng(rnd.randrange(1 << 30))
    img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    base = decode_jpeg(synth_jpeg(img, quality=quality, subsample=subsample))
    prog = decode_jpeg(
        synth_jpeg(img, quality=quality, subsample=subsample, progressive=True)
    )
    assert np.array_equal(base, prog)


# -- KLL: estimates always within the k=256 error bound ----------------------


@settings(max_examples=15, deadline=None)
@given(
    st.integers(min_value=500, max_value=20_000),
    st.integers(min_value=1, max_value=16),
    st.randoms(use_true_random=False),
)
def test_kll_error_bound_generated(n, n_parts, rnd):
    from hgcn_name_disambiguation_ray.stages.sketch import KLLSketch

    rng = np.random.default_rng(rnd.randrange(1 << 30))
    x = rng.lognormal(0.0, 1.0, n)
    merged = KLLSketch(256)
    for part in np.array_split(x, n_parts):
        sk = KLLSketch(256)
        sk.add(part)
        merged.merge(sk)
    qs = np.array([0.1, 0.5, 0.9])
    est = merged.quantiles(qs)
    xs = np.sort(x)
    rank = np.searchsorted(xs, est, side="right") / n
    assert np.all(np.abs(rank - qs) < 0.02)
    assert merged.n == n


# -- WARC: writer/parser are exact inverses over generated records -----------


@settings(max_examples=25, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.text(alphabet=st.characters(min_codepoint=33, max_codepoint=126), min_size=1, max_size=30),
            st.binary(max_size=200),
            st.booleans(),
        ),
        min_size=1,
        max_size=8,
    ),
    st.booleans(),
)
def test_warc_roundtrip_generated(recs, gz):
    from hgcn_name_disambiguation_ray.sources.warc import (
        parse_warc,
        strip_http_headers,
        synth_warc,
    )

    records = [
        {
            "url": f"https://t.test/{u}",
            "date": "2020-09-13T12:26:40Z",
            "payload": p,
            "type": "response" if resp else "conversion",
        }
        for u, p, resp in recs
    ]
    parsed = parse_warc(synth_warc(records, gzip_per_record=gz))
    assert parsed[0]["headers"]["warc-type"] == "warcinfo"
    assert len(parsed) == len(records) + 1
    for rec, got in zip(records, parsed[1:]):
        body = got["payload"]
        if rec["type"] == "response":
            body = strip_http_headers(body)
        assert body == rec["payload"]
        assert got["headers"]["warc-target-uri"] == rec["url"]
