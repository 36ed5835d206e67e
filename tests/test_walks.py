"""Alias sampling / BFS distances / metapath walk determinism."""

import numpy as np

from hgcn_name_disambiguation_ray.config import LinkageConfig
from hgcn_name_disambiguation_ray.state.walks import (
    AliasTable,
    bfs_hop_distances,
    metapath_walks,
)


def test_alias_table_matches_distribution():
    rng = np.random.default_rng(0)
    w = np.array([1.0, 2.0, 7.0])
    idx = np.array([10, 20, 30])
    t = AliasTable(w, idx)
    draws = t.draw_many(rng, 20000)
    frac = [(draws == v).mean() for v in idx]
    np.testing.assert_allclose(frac, w / w.sum(), atol=0.02)


def test_bfs_hop_distances_path_graph():
    n = 5
    adj = np.zeros((n, n))
    for i in range(n - 1):
        adj[i, i + 1] = adj[i + 1, i] = 1.0
    d = bfs_hop_distances(adj)
    assert d[0, 4] == 4
    assert d[0, 0] == 0
    adj2 = np.zeros((3, 3))  # disconnected
    assert np.isinf(bfs_hop_distances(adj2)[0, 1])


def _toy_layers():
    n = 6
    wa = np.zeros((n, n))
    wt = np.zeros((n, n))
    wv = np.zeros((n, n))
    for i, j in [(0, 1), (1, 2), (3, 4)]:
        wa[i, j] = wa[j, i] = 1.0
    for i, j in [(0, 2), (3, 5)]:
        wt[i, j] = wt[j, i] = 2.0
    for i, j in [(4, 5), (0, 1)]:
        wv[i, j] = wv[j, i] = 1.0
    return [wa, wt, wv, wa + wt + wv]


def test_walks_deterministic_given_seed():
    cfg = LinkageConfig()
    layers = _toy_layers()
    a = metapath_walks(layers, cfg, np.random.default_rng(99))
    b = metapath_walks(layers, cfg, np.random.default_rng(99))
    c = metapath_walks(layers, cfg, np.random.default_rng(100))
    for x, y in zip(a, b):
        assert (x == y).all()
    assert any(len(x) != len(y) or (x != y).any() for x, y in zip(a, c))


def test_walk_labels_and_indices_valid():
    cfg = LinkageConfig()
    layers = _toy_layers()
    u_i, u_j, lab = metapath_walks(layers, cfg, np.random.default_rng(5))
    n = layers[0].shape[0]
    assert len(u_i) == len(u_j) == len(lab) > 0
    assert set(np.unique(lab)) <= {-1.0, 1.0}
    assert u_i.min() >= 0 and u_i.max() < n
    assert u_j.min() >= 0 and u_j.max() < n
    # positives must be edges of SOME metapath layer or 2-hop pairs; at
    # minimum every positive endpoint pair is connected in the combined graph
    d = bfs_hop_distances(layers[-1])
    pos = lab == 1.0
    assert np.isfinite(d[u_i[pos], u_j[pos]]).all()
