"""HAC / modularity / components unit tests (state/hac.py)."""

import numpy as np

from hgcn_name_disambiguation_ray.state.hac import (
    average_linkage_merges,
    connected_components_dense,
    ghac_cluster,
    labels_at_k,
    weighted_modularity,
)


def test_connected_components_dense():
    adj = np.zeros((5, 5))
    adj[0, 1] = adj[1, 0] = 1
    adj[2, 3] = adj[3, 2] = 1
    labels = connected_components_dense(adj)
    assert labels[0] == labels[1]
    assert labels[2] == labels[3]
    assert len({labels[0], labels[2], labels[4]}) == 3


def test_average_linkage_two_obvious_clusters():
    # points on a line: {0,1} close, {2,3} close, groups far apart
    pos = np.array([0.0, 1.0, 10.0, 11.0])
    D = np.abs(pos[:, None] - pos[None, :])
    merges = average_linkage_merges(D)
    labels = labels_at_k(4, merges, 2)
    assert labels[0] == labels[1]
    assert labels[2] == labels[3]
    assert labels[0] != labels[2]


def test_labels_at_k_extremes():
    D = np.random.default_rng(0).random((6, 6))
    D = (D + D.T) / 2
    merges = average_linkage_merges(D)
    assert len(np.unique(labels_at_k(6, merges, 6))) == 6
    assert len(np.unique(labels_at_k(6, merges, 1))) == 1


def test_modularity_prefers_true_partition():
    # two dense communities connected by one edge
    adj = np.zeros((6, 6))
    for grp in ([0, 1, 2], [3, 4, 5]):
        for i in grp:
            for j in grp:
                if i != j:
                    adj[i, j] = 1
    adj[2, 3] = adj[3, 2] = 1
    good = np.array([0, 0, 0, 1, 1, 1])
    bad = np.array([0, 1, 0, 1, 0, 1])
    assert weighted_modularity(adj, good) > weighted_modularity(adj, bad)


def test_ghac_auto_k_recovers_communities():
    rng = np.random.default_rng(1)
    # embeddings: two tight groups with positive dot within, negative across;
    # combined graph carries the community structure (as the real pipeline's
    # co-occurrence union does), with one spurious cross edge
    e1 = rng.normal(1.0, 0.05, (5, 8))
    e2 = -rng.normal(1.0, 0.05, (5, 8))
    embed = np.vstack([e1, e2])
    combined = np.zeros((10, 10))
    for grp in (range(5), range(5, 10)):
        for i in grp:
            for j in grp:
                if i != j:
                    combined[i, j] = 1.0
    combined[4, 5] = combined[5, 4] = 1.0
    labels = ghac_cluster(embed, combined, n_clusters=-1)
    assert len(np.unique(labels[:5])) == 1
    assert len(np.unique(labels[5:])) == 1
    assert labels[0] != labels[9]


def test_ghac_fixed_k():
    rng = np.random.default_rng(2)
    embed = rng.normal(0, 1, (7, 4))
    combined = np.ones((7, 7)) - np.eye(7)
    labels = ghac_cluster(embed, combined, n_clusters=3)
    assert len(np.unique(labels)) == 3


def test_ghac_degenerate_sizes():
    assert ghac_cluster(np.zeros((0, 4)), np.zeros((0, 0))).tolist() == []
    assert ghac_cluster(np.ones((1, 4)), np.zeros((1, 1))).tolist() == [0]


def test_openalex_auto_k_degenerate_blocks():
    """The OpenAlex-variant guards (reference :618-683): single pub ->
    one cluster; no edges -> k = max(2, min(n_author_ids, 10)); normal
    graph -> exactly the thresholded component count (the reference's
    ascending one-iteration loop)."""
    import numpy as np

    from hgcn_name_disambiguation_ray.state.hac import ghac_auto_k_openalex

    # single publication
    e1 = np.ones((1, 4))
    assert ghac_auto_k_openalex(e1, np.zeros((1, 1)), n_author_ids=3).tolist() == [0]

    # no edges at all (all-isolated block): the reference's fallbacks are
    # dead code (start_k = max(2, components) = n), so the result is ALL
    # SINGLETONS — never an arbitrary merge into min(ids, 10) clusters
    rng = np.random.default_rng(0)
    e = rng.normal(size=(6, 4))
    labels = ghac_auto_k_openalex(e, np.zeros((6, 6)), n_author_ids=3)
    assert len(set(labels.tolist())) == 6
    labels = ghac_auto_k_openalex(e, np.zeros((6, 6)), n_author_ids=1)
    assert len(set(labels.tolist())) == 6

    # a 2-component graph with strong within-component similarity: k equals
    # the thresholded component count (>= 2), never fewer
    emb = np.zeros((4, 4))
    emb[0] = emb[1] = [3, 0, 0, 0]
    emb[2] = emb[3] = [0, 3, 0, 0]
    comb = np.zeros((4, 4))
    comb[0, 1] = comb[1, 0] = comb[2, 3] = comb[3, 2] = 1.0
    labels = ghac_auto_k_openalex(emb, comb, n_author_ids=2)
    assert labels[0] == labels[1] and labels[2] == labels[3]
    assert labels[0] != labels[2]


def test_ghac_components_mode():
    """n_clusters=0: clustering = connected components of the (masked)
    similarity graph — the measured best global selector on real data."""
    import numpy as np

    from hgcn_name_disambiguation_ray.state.hac import ghac_cluster

    emb = np.eye(4) * 3
    comb = np.zeros((4, 4))
    comb[0, 1] = comb[1, 0] = comb[2, 3] = comb[3, 2] = 1.0
    labels = ghac_cluster(emb, comb, n_clusters=0)
    assert labels[0] == labels[1] and labels[2] == labels[3]
    assert labels[0] != labels[2]
