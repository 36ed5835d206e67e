"""Integer PageRank (stages/graphrank.py): reference equality on a hand
graph, partitioning invariance (the determinism claim), and edge cases."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from hgcn_name_disambiguation_ray.stages.graphrank import UNIT, pagerank


def _reference(edges: list[tuple[int, int]], iters: int, damping_milli: int = 850):
    """Plain-Python transcription of the documented recurrence."""
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    outdeg = {}
    for u, _ in edges:
        outdeg[u] = outdeg.get(u, 0) + 1
    rank = {n: UNIT for n in nodes}
    base = (1000 - damping_milli) * UNIT // 1000
    for _ in range(iters):
        s = {n: 0 for n in nodes}
        for u, v in edges:
            s[v] += rank[u] // outdeg[u]
        rank = {n: base + damping_milli * s[n] // 1000 for n in nodes}
    return rank


def _run(edges, iters=5, n_parts=1):
    ds = rd.from_pandas(pd.DataFrame(edges, columns=["src", "dst"]))
    if n_parts > 1:
        ds = ds.repartition(n_parts)
    out = pagerank(ds, iters=iters).to_pandas().sort_values("node")
    return dict(zip(out["node"], out["rank"]))


def test_matches_python_reference(ray_session):
    edges = [(1, 2), (2, 1), (2, 3), (3, 1), (4, 1), (1, 4), (5, 2), (2, 5)]
    got = _run(edges, iters=5)
    want = _reference(edges, iters=5)
    assert got == want
    # a well-linked hub outranks a leaf
    assert got[1] > got[3]


def test_partitioning_invariance_bit_exact(ray_session):
    """Integer sums are associative: the rank vector must be IDENTICAL
    (not just close) under different partitionings — the property that
    makes the SQL oracle hash-exact."""
    rng = np.random.default_rng(4)
    edges = [(int(a), int(b)) for a, b in rng.integers(0, 60, (500, 2)) if a != b]
    base = _run(edges, iters=4, n_parts=1)
    for parts in (3, 8):
        assert _run(edges, iters=4, n_parts=parts) == base


def test_no_in_edge_node_holds_base(ray_session):
    # 7 -> 8 only: node 7 has no in-edges, so after any iteration it
    # holds exactly the base mass
    got = _run([(7, 8)], iters=3)
    assert got[7] == (1000 - 850) * UNIT // 1000


def test_zero_iters_is_uniform_and_bad_damping_raises(ray_session):
    got = _run([(1, 2), (2, 1)], iters=0)
    assert got == {1: UNIT, 2: UNIT}
    with pytest.raises(ValueError):
        pagerank(rd.from_pandas(pd.DataFrame({"src": [1], "dst": [2]})),
                 damping_milli=2000)
