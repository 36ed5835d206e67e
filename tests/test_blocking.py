"""Blocking stats: hot-key filtering must happen inside the Dataset."""

import pandas as pd
import pytest


@pytest.mark.usefixtures("ray_session")
def test_block_counts_min_count_returns_only_hot_keys():
    import ray.data as rd

    from hgcn_name_disambiguation_ray.stages.blocking import block_counts, make_salt_map

    rows = (
        [{"block_key": "hot name", "mention_id": f"h{i}"} for i in range(50)]
        + [{"block_key": f"cold {i}", "mention_id": f"c{i}"} for i in range(200)]
    )
    ds = rd.from_pandas(pd.DataFrame(rows))

    # at web scale the distinct-key set is unbounded: with min_count the
    # driver-side frame must hold ONLY the hot keys, not every key
    hot = block_counts(ds, min_count=10)
    assert hot["block_key"].tolist() == ["hot name"]
    assert hot["n"].tolist() == [50]

    salt_map = make_salt_map(hot, 10)
    assert salt_map == {"hot name": 5}

    # unfiltered path still returns everything (used by tests/diagnostics)
    full = block_counts(ds)
    assert len(full) == 201
