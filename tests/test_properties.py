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
