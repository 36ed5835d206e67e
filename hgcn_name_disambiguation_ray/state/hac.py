"""Graph-constrained average-linkage HAC with modularity auto-k (numpy).

Reimplements GHAC (SURVEY.md C5/C6; reference `name_disambiguation.py:61-108`
and the inlined auto-k variant `:577-687`) without sklearn / scipy /
python-louvain:

  * pairwise similarity σ(⟨h_i, h_j⟩) only where the combined block graph
    has an edge, 0 elsewhere; distance = -similarity;
  * average linkage on the precomputed distance matrix (Lance-Williams
    update), merge order = min distance with deterministic (i, j) tie-break;
  * auto-k: count connected components of the similarity graph (k_max)
    and of the graph thresholded at similarity > 0.9 (k_min from the
    reference's edge pre-clustering, `:86`), then pick the k in
    [k_max … k_min] maximising weighted Newman modularity of the
    partition over the combined graph (the OpenAlex-variant semantics,
    `:596-661`).
"""

from __future__ import annotations

import numpy as np


def sigmoid_similarity_matrix(embed: np.ndarray, combined: np.ndarray) -> np.ndarray:
    """σ(H Hᵀ) masked to the combined graph's edges, 0 diagonal."""
    dots = embed @ embed.T
    sim = 1.0 / (1.0 + np.exp(-np.clip(dots, -35.0, 35.0)))
    mask = combined > 0
    np.fill_diagonal(mask, False)
    return np.where(mask, sim, 0.0)


def connected_components_dense(adj: np.ndarray) -> np.ndarray:
    """Component labels via union-find over nonzero entries (replaces scipy)."""
    n = adj.shape[0]
    parent = np.arange(n)

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    ii, jj = np.nonzero(adj)
    for a, b in zip(ii, jj):
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    roots = np.array([find(i) for i in range(n)])
    _, labels = np.unique(roots, return_inverse=True)
    return labels


def average_linkage_merges(distance: np.ndarray) -> list[tuple[int, int]]:
    """Full merge sequence of average-linkage HAC on a precomputed
    distance matrix. Returns (n-1) merges as (cluster_a, cluster_b) over
    an index space where cluster ids are original points; after a merge
    the smaller index survives. Deterministic tie-break by (i, j)."""
    n = distance.shape[0]
    D = distance.astype(np.float64).copy()
    np.fill_diagonal(D, np.inf)
    active = np.ones(n, dtype=bool)
    size = np.ones(n, dtype=np.int64)
    merges: list[tuple[int, int]] = []
    for _ in range(n - 1):
        sub = np.where(active)[0]
        block = D[np.ix_(sub, sub)]
        flat = np.argmin(block)
        a_, b_ = divmod(int(flat), len(sub))
        i, j = int(sub[min(a_, b_)]), int(sub[max(a_, b_)])
        merges.append((i, j))
        # Lance-Williams average update into i
        ni, nj = size[i], size[j]
        newd = (ni * D[i] + nj * D[j]) / (ni + nj)
        D[i] = newd
        D[:, i] = newd
        D[i, i] = np.inf
        D[j] = np.inf
        D[:, j] = np.inf
        size[i] = ni + nj
        active[j] = False
    return merges


def labels_at_k(n: int, merges: list[tuple[int, int]], k: int) -> np.ndarray:
    """Cluster labels after applying the first n-k merges."""
    parent = np.arange(n)

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for i, j in merges[: max(0, n - k)]:
        parent[find(j)] = find(i)
    roots = np.array([find(i) for i in range(n)])
    _, labels = np.unique(roots, return_inverse=True)
    return labels


def weighted_modularity(adj: np.ndarray, labels: np.ndarray) -> float:
    """Newman weighted modularity Q of a partition (python-louvain's
    `community.modularity` semantics for undirected weighted graphs)."""
    m2 = adj.sum()  # = 2m for symmetric adj
    if m2 <= 0:
        return 0.0
    deg = adj.sum(axis=1)
    q = 0.0
    for c in np.unique(labels):
        idx = labels == c
        q += adj[np.ix_(idx, idx)].sum() / m2 - (deg[idx].sum() / m2) ** 2
    return float(q)


def ghac_cluster(
    embed: np.ndarray,
    combined: np.ndarray,
    n_clusters: int = -1,
    threshold: float = 0.9,
) -> np.ndarray:
    """GHAC: fixed-k when n_clusters > 0, else modularity-searched auto-k."""
    n = embed.shape[0]
    if n == 0:
        return np.zeros(0, dtype=np.int64)
    if n == 1:
        return np.zeros(1, dtype=np.int64)
    sim = sigmoid_similarity_matrix(embed, combined)
    distance = -sim
    merges = average_linkage_merges(distance)
    if n_clusters > 0:
        return labels_at_k(n, merges, min(n_clusters, n))

    # GHAC search range (reference :83-101): from the component count of the
    # thresholded graph (k_hi, edge pre-clustering) DOWN to the component
    # count of the full similarity graph (k_lo); ties prefer smaller k
    # (the reference's `mod >= best_m` keeps the latest = smallest k).
    k_lo = len(np.unique(connected_components_dense(sim)))
    thr = np.where(sim > threshold, sim, 0.0)
    k_hi = len(np.unique(connected_components_dense(thr)))
    k_lo = max(1, min(k_lo, n))
    k_hi = max(k_lo, min(k_hi, n))
    best_q = -np.inf
    best_labels = None
    for k in range(k_hi, k_lo - 1, -1):
        labels = labels_at_k(n, merges, k)
        q = weighted_modularity(combined, labels)
        if q >= best_q:
            best_q = q
            best_labels = labels
    if best_labels is None:
        best_labels = labels_at_k(n, merges, min(2, n))
    return best_labels
