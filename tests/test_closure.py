"""Transitive closure: distributed star-contraction vs naive union-find."""

import numpy as np
import pandas as pd
import pytest


def _naive_components(edges: list[tuple[str, str]]) -> dict[str, str]:
    parent: dict[str, str] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edges:
        ru, rv = find(u), find(v)
        if ru != rv:
            if rv < ru:
                ru, rv = rv, ru
            parent[rv] = ru
    return {x: find(x) for x in parent}


def _random_edges(seed: int, n_nodes: int = 40, n_edges: int = 50):
    rng = np.random.default_rng(seed)
    return [
        (f"n{rng.integers(0, n_nodes):03d}", f"n{rng.integers(0, n_nodes):03d}")
        for _ in range(n_edges)
    ]


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("seed", [1, 2])
def test_local_path_matches_naive(seed):
    import ray.data as rd

    from hgcn_name_disambiguation_ray.stages.closure import connected_components

    edges = [(u, v) for u, v in _random_edges(seed) if u != v]
    ds = rd.from_pandas(pd.DataFrame(edges, columns=["u", "v"]))
    got = {
        r["mention_id"]: r["component"]
        for r in connected_components(ds).to_pandas().to_dict("records")
    }
    want = _naive_components(edges)
    # same partition: identical component sets (roots are min ids in both)
    assert got == want


@pytest.mark.usefixtures("ray_session")
def test_distributed_path_matches_naive(monkeypatch):
    import ray.data as rd

    from hgcn_name_disambiguation_ray.stages import closure

    monkeypatch.setattr(closure, "LOCAL_CLOSURE_MAX_EDGES", 0)  # force star-contraction
    edges = [(u, v) for u, v in _random_edges(3, n_nodes=25, n_edges=30) if u != v]
    ds = rd.from_pandas(pd.DataFrame(edges, columns=["u", "v"]))
    got_df = closure.connected_components(ds).to_pandas()
    got = {r["mention_id"]: r["component"] for r in got_df.to_dict("records")}
    want = _naive_components(edges)
    # every edge endpoint is assigned, and partitions agree
    assert set(got) == set(want)
    assert all(got[k] == want[k] for k in want)


@pytest.mark.usefixtures("ray_session")
def test_self_loop_only_nodes_agree_between_paths():
    """Review regression: a node whose only edge is a self-loop must
    appear (as its own component) on BOTH the driver union-find path and
    the distributed star-contraction path."""
    import ray.data as rd

    edges = pd.DataFrame(
        {"u": ["a", "b", "c"], "v": ["a", "c", "b"]}  # a self-loops; b-c real
    )
    from hgcn_name_disambiguation_ray.stages.closure import connected_components

    for force in (False, True):
        out = (
            connected_components(rd.from_pandas(edges), force_distributed=force)
            .to_pandas()
            .sort_values("mention_id")
            .reset_index(drop=True)
        )
        assert out["mention_id"].tolist() == ["a", "b", "c"]
        assert out["component"].tolist() == ["a", "b", "b"]
