"""HyperLogLog: accuracy bounds, merge invariance, kernel properties."""

import numpy as np
import pandas as pd
import pytest

from hgcn_name_disambiguation_ray.stages.sketch import (
    _estimate,
    _nlz64,
    _registers_from_hashes,
)


def test_nlz64_matches_python_bit_length():
    rng = np.random.default_rng(3)
    vals = np.concatenate(
        [
            np.array([0, 1, 2, 3, 2**63, 2**64 - 1], dtype=np.uint64),
            rng.integers(0, 2**64, size=500, dtype=np.uint64),
        ]
    )
    got = _nlz64(vals)
    exp = np.array([64 - int(v).bit_length() for v in vals])
    np.testing.assert_array_equal(got, exp)


def test_registers_merge_is_order_and_split_invariant():
    rng = np.random.default_rng(9)
    h = rng.integers(0, 2**64, size=20000, dtype=np.uint64)
    whole = _registers_from_hashes(h, 12)
    parts = np.maximum.reduce(
        [_registers_from_hashes(c, 12) for c in np.array_split(rng.permutation(h), 7)]
    )
    np.testing.assert_array_equal(whole, parts)


@pytest.mark.parametrize("n", [50, 5000, 200_000])
def test_estimate_within_error_bound(n):
    # distinct hashes = splitmix of distinct ints (uniform 64-bit)
    from hgcn_name_disambiguation_ray.functions.hashing import _splitmix64

    h = _splitmix64(np.arange(n, dtype=np.uint64))
    est = _estimate(_registers_from_hashes(h, 12))
    # 3 sigma of the 1.04/sqrt(m) standard error, plus slack for small n
    assert abs(est - n) / n < 0.05


@pytest.mark.usefixtures("ray_session")
def test_approx_distinct_dataset_and_duplicates_ignored():
    import ray.data as rd

    from hgcn_name_disambiguation_ray.stages.sketch import approx_distinct

    rng = np.random.default_rng(1)
    vals = rng.integers(0, 30_000, size=120_000)  # heavy duplication
    exact = len(np.unique(vals))
    df = pd.DataFrame({"v": vals})
    for parts in (2, 16):
        est = approx_distinct(rd.from_pandas(df).repartition(parts), "v")
        assert abs(est - exact) / exact < 0.05


@pytest.mark.usefixtures("ray_session")
def test_approx_distinct_tokens_vs_exact_vocabulary():
    import ray.data as rd

    from hgcn_name_disambiguation_ray.pipelines.textprep import vocabulary
    from hgcn_name_disambiguation_ray.stages.sketch import approx_distinct_tokens

    ds = rd.read_parquet(
        "/root/testdata/sf0.01/documents.parquet", columns=["doc_id", "text"]
    )
    exact = vocabulary(ds).count()
    est = approx_distinct_tokens(ds)
    # tiny vocabulary -> linear-counting regime, essentially exact
    assert abs(est - exact) <= max(1, 0.03 * exact)
