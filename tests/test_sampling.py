"""Deterministic split / sample / per-group top-k operators."""

import numpy as np
import pandas as pd
import pytest


@pytest.mark.usefixtures("ray_session")
def test_hash_split_deterministic_and_proportional():
    import ray.data as rd

    from hgcn_name_disambiguation_ray.stages.sampling import hash_split

    df = pd.DataFrame({"doc_id": np.arange(5000, dtype=np.int64)})
    a = hash_split(rd.from_pandas(df), train_pct=90).to_pandas().sort_values("doc_id")
    b = hash_split(rd.from_pandas(df.sample(frac=1.0, random_state=1)), train_pct=90).to_pandas().sort_values("doc_id")
    # pure function of the id: row order must not matter
    assert a["split"].tolist() == b["split"].tolist()
    frac = (a["split"] == "train").mean()
    assert 0.87 <= frac <= 0.93  # ~90% within hash noise


@pytest.mark.usefixtures("ray_session")
def test_deterministic_sample_stable_rows():
    import ray.data as rd

    from hgcn_name_disambiguation_ray.stages.sampling import deterministic_sample

    df = pd.DataFrame({"doc_id": np.arange(4000, dtype=np.int64)})
    s1 = set(deterministic_sample(rd.from_pandas(df), 0.25).to_pandas()["doc_id"])
    s2 = set(deterministic_sample(rd.from_pandas(df), 0.25).to_pandas()["doc_id"])
    assert s1 == s2
    assert 0.22 <= len(s1) / 4000 <= 0.28
    # larger frac strictly contains smaller (threshold monotonicity)
    s3 = set(deterministic_sample(rd.from_pandas(df), 0.5).to_pandas()["doc_id"])
    assert s1 <= s3


@pytest.mark.usefixtures("ray_session")
def test_group_topk_matches_pandas():
    import ray.data as rd

    from hgcn_name_disambiguation_ray.stages.groupagg import group_topk

    rng = np.random.default_rng(2)
    df = pd.DataFrame(
        {
            "g": rng.integers(0, 40, 2000),
            "id": np.arange(2000, dtype=np.int64),
            "v": rng.integers(0, 50, 2000),  # many ties
        }
    )
    got = (
        group_topk(rd.from_pandas(df), ["g"], "v", 3, tie_cols=["id"])
        .to_pandas().sort_values(["g", "v", "id"], ascending=[True, False, True])
        .reset_index(drop=True)
    )
    want = (
        df.sort_values(["v", "id"], ascending=[False, True], kind="stable")
        .groupby("g", sort=False).head(3)
        .sort_values(["g", "v", "id"], ascending=[True, False, True])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got[["g", "id", "v"]], want[["g", "id", "v"]])


@pytest.mark.usefixtures("ray_session")
def test_stratified_sample_per_group_cap_and_determinism():
    import ray.data as rd

    from hgcn_name_disambiguation_ray.stages.sampling import (
        split_hash,
        stratified_sample,
    )

    rng = np.random.default_rng(7)
    df = pd.DataFrame(
        {
            "doc_id": np.arange(3000, dtype=np.int64),
            "lang": rng.choice(["en", "de", "fr"], size=3000),
        }
    )
    out = stratified_sample(rd.from_pandas(df), "lang", 10).to_pandas()
    assert out.groupby("lang").size().eq(10).all()
    assert "__h" not in out.columns
    # matches the explicit pandas rank by (knuth hash desc, id asc)
    df2 = df.assign(h=split_hash(df["doc_id"].to_numpy()).astype(np.int64))
    exp = (
        df2.sort_values(["h", "doc_id"], ascending=[False, True], kind="stable")
        .groupby("lang")
        .head(10)
    )
    assert set(map(tuple, out[["lang", "doc_id"]].itertuples(index=False))) == set(
        map(tuple, exp[["lang", "doc_id"]].itertuples(index=False))
    )
    # row-order independence
    out2 = stratified_sample(
        rd.from_pandas(df.sample(frac=1.0, random_state=3)), "lang", 10
    ).to_pandas()
    assert set(out2["doc_id"]) == set(out["doc_id"])


@pytest.mark.usefixtures("ray_session")
def test_stratified_sample_keeps_null_group():
    """Review regression: a NULL group key is a real stratum (SQL
    PARTITION BY keeps it); pandas groupby must not silently drop it."""
    import ray.data as rd

    from hgcn_name_disambiguation_ray.stages.sampling import stratified_sample

    df = pd.DataFrame(
        {
            "doc_id": np.arange(40, dtype=np.int64),
            "lang": ["en"] * 20 + [None] * 20,
        }
    )
    out = stratified_sample(rd.from_pandas(df), "lang", 5).to_pandas()
    assert (out["lang"] == "en").sum() == 5
    assert out["lang"].isna().sum() == 5
