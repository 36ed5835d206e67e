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


def sigmoid_similarity_matrix(
    embed: np.ndarray, combined: np.ndarray | None = None
) -> np.ndarray:
    """σ(H Hᵀ), 0 diagonal. With `combined` given, masked to the combined
    graph's edges (the fork's graph-constrained GHAC); with None, ALL
    pairs are scored (the original HGCN semantics — the committed cluster
    artifacts merge across graph components, which only the unmasked
    similarity can produce)."""
    dots = embed @ embed.T
    sim = 1.0 / (1.0 + np.exp(-np.clip(dots, -35.0, 35.0)))
    if combined is None:
        np.fill_diagonal(sim, 0.0)
        return sim
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


def average_linkage_merges_with_dist(
    distance: np.ndarray,
) -> tuple[list[tuple[int, int]], np.ndarray]:
    """Full merge sequence of average-linkage HAC on a precomputed
    distance matrix, plus the merge distance of each step (monotone
    non-decreasing for average linkage). Returns ((n-1) merges as
    (cluster_a, cluster_b) over an index space where cluster ids are
    original points; after a merge the smaller index survives), with
    deterministic tie-break by (i, j)."""
    n = distance.shape[0]
    D = distance.astype(np.float64).copy()
    np.fill_diagonal(D, np.inf)
    size = np.ones(n, dtype=np.int64)
    merges: list[tuple[int, int]] = []
    mdist = np.empty(max(0, n - 1), dtype=np.float64)
    for t in range(n - 1):
        # argmin over the inf-masked FULL matrix: inactive rows/cols and
        # the diagonal are inf, and active indices are scanned in the same
        # row-major order a sorted-submatrix copy would use, so the picked
        # pair (and every tie-break) is identical — without the O(m^2)
        # submatrix copy per step (O(n^3) copied bytes per block before)
        flat = int(np.argmin(D))
        a_, b_ = divmod(flat, n)
        i, j = min(a_, b_), max(a_, b_)
        merges.append((i, j))
        mdist[t] = D[i, j]
        # Lance-Williams average update into i
        ni, nj = size[i], size[j]
        newd = (ni * D[i] + nj * D[j]) / (ni + nj)
        D[i] = newd
        D[:, i] = newd
        D[i, i] = np.inf
        D[j] = np.inf
        D[:, j] = np.inf
        size[i] = ni + nj
    return merges, mdist


def average_linkage_merges(distance: np.ndarray) -> list[tuple[int, int]]:
    """Merge sequence only (see `average_linkage_merges_with_dist`)."""
    return average_linkage_merges_with_dist(distance)[0]


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


def modularity_along_merges(adj: np.ndarray, merges: list[tuple[int, int]]) -> np.ndarray:
    """Newman weighted modularity of the partition at EVERY k in one
    incremental replay of the merge sequence: O(n^2) total instead of
    O(n^2) per evaluated k. Returns qs where qs[k] = Q of the partition
    with k clusters (k = n .. 1); qs[0] unused."""
    n = adj.shape[0]
    qs = np.zeros(n + 1, dtype=np.float64)
    m2 = adj.sum()
    if m2 <= 0 or n == 0:
        return qs
    deg = adj.sum(axis=1).astype(np.float64)
    W = adj.astype(np.float64).copy()      # cluster-cross weights
    np.fill_diagonal(W, 0.0)
    S = np.diag(adj).astype(np.float64)    # within-cluster weight (double-counted)
    q = float((S / m2 - (deg / m2) ** 2).sum())
    qs[n] = q
    for t, (i, j) in enumerate(merges):
        cross = W[i, j]
        q -= S[i] / m2 - (deg[i] / m2) ** 2
        q -= S[j] / m2 - (deg[j] / m2) ** 2
        S[i] = S[i] + S[j] + 2.0 * cross
        deg[i] += deg[j]
        q += S[i] / m2 - (deg[i] / m2) ** 2
        W[i] += W[j]
        W[:, i] += W[:, j]
        W[i, i] = 0.0
        W[j, :] = 0.0
        W[:, j] = 0.0
        S[j] = 0.0
        deg[j] = 0.0
        qs[n - 1 - t] = q
    return qs


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


def ghac_auto_k_openalex(
    embed: np.ndarray,
    combined: np.ndarray,
    n_author_ids: int,
    threshold: float = 0.9,
) -> np.ndarray:
    """The OpenAlex-variant auto-k (reference `name_disambiguation.py:
    596-683`), guards and all:

      * start_k = max(2, components(σ>threshold)), end_k = max(start_k,
        components(σ)). Thresholding only ever INCREASES the component
        count, so components(σ>threshold) >= components(σ), hence
        end_k == start_k always and the reference's ascending
        `range(start_k, end_k+1)` evaluates exactly ONE k — mirrored
        as-is (a documented reference behaviour, not re-designed).
      * the reference's own fallbacks (`:622-628` end_k<=1 and `:666-683`
        best_k==-1) are DEAD CODE there — start_k = max(2, ...) makes
        end_k >= 2 always, and the loop's else-branch assigns best_k on
        the first k even with a zero-edge modularity graph — so a block
        whose similarity graph has NO edges yields start_k =
        components(σ>t) = n, i.e. ALL SINGLETONS. Mirrored exactly: no
        live fallback here either (an earlier version merged zero-edge
        blocks into max(2, min(n_author_ids, 10)) arbitrary clusters,
        which the reference never does).
    """
    n = embed.shape[0]
    if n == 0:
        return np.zeros(0, dtype=np.int64)
    if n == 1:
        return np.zeros(1, dtype=np.int64)
    sim = sigmoid_similarity_matrix(embed, combined)
    merges = average_linkage_merges(-sim)
    # n_components1 >= n_components (thresholding adds components), so the
    # reference's range(start_k, end_k+1) always degenerates to [start_k];
    # a zero-edge graph gives n_components1 = n -> singletons
    n_components1 = len(np.unique(connected_components_dense(np.where(sim > threshold, sim, 0.0))))
    start_k = max(2, n_components1)
    return labels_at_k(n, merges, min(start_k, n))


def ghac_hybrid(
    embed: np.ndarray,
    combined: np.ndarray,
    title_vecs: np.ndarray,
    hop2: np.ndarray,
    shift: float = 2.0,
    hop2_beta: float = 0.5,
    tau_rule: tuple[float, float, float, float, float] = (0.9, 0.45, 1.2, 0.35, 0.75),
) -> np.ndarray:
    """Artifact-regime GHAC: hybrid similarity + adaptive dendrogram cut.

    The reference's COMMITTED cluster artifacts (macro pairwise F1 0.892,
    `experimental-results/*_output.txt`) come from the ORIGINAL unmasked-
    similarity HGCN regime powered by an external word2vec model missing
    from its repo — they merge across graph components, which the current
    graph-masked code (`name_disambiguation.py:61-108`, our
    `ghac_cluster`) cannot do. This is the engine's re-creation of that
    regime with in-engine-trained corpus vectors (state/wordvec.py),
    tuned on the corpus with held-out validation (BASELINE.md):

      * within graph edges: sim = shift + σ(⟨h_i, h_j⟩) — graph-connected
        pairs always merge before any cross-component pair (shift > 1
        dominates every cross similarity);
      * across components:  sim = cos(title_i, title_j) + hop2_beta ·
        1[2-hop coauthor link], where title vectors are idf-weighted
        means of L2-normalized corpus word vectors
        (HashEmbedder.weighted_features) and hop2 marks pairs whose
        extended coauthor sets intersect (stages/coent.py);
      * average linkage on distance = -sim; the monotone merge-distance
        sequence is cut at the first merge weaker than an adaptive
        threshold τ = clip(a − b·edge_density − c·mean_cross_sim, lo, hi)
        (tau_rule = (a, b, c, lo, hi)): dense blocks (one prolific
        person) and high ambient cross similarity (promiscuous titles)
        both lower the bar for stopping early.
    """
    n = embed.shape[0]
    if n <= 1:
        return np.zeros(n, dtype=np.int64)
    masked = sigmoid_similarity_matrix(embed, combined)
    edge = combined > 0
    np.fill_diagonal(edge, False)

    nrm = np.linalg.norm(title_vecs, axis=1, keepdims=True)
    nrm[nrm == 0] = 1.0
    tv = title_vecs / nrm
    cos = tv @ tv.T
    np.fill_diagonal(cos, 0.0)

    cross = cos + hop2_beta * (hop2 > 0)
    sim = np.where(edge, shift + masked, cross)
    merges, mdist = average_linkage_merges_with_dist(-sim)

    iu, iv = np.triu_indices(n, k=1)
    noedge = ~edge[iu, iv]
    dens = float(edge.sum()) / max(1, n * (n - 1))
    mean_cross = float(cross[iu, iv][noedge].mean()) if noedge.any() else 0.0
    a, b, c, lo, hi = tau_rule
    tau = float(np.clip(a - b * dens - c * mean_cross, lo, hi))
    # mdist is monotone non-decreasing: apply every merge at sim >= tau
    stop = int(np.searchsorted(mdist > -tau, True))
    return labels_at_k(n, merges, max(1, n - stop))


def ghac_cluster(
    embed: np.ndarray,
    combined: np.ndarray,
    n_clusters: int = -1,
    threshold: float = 0.9,
    modularity_on: str = "sim",
    auto_k_floor: str = "components",
    sim_mask: str = "graph",
) -> np.ndarray:
    """GHAC: fixed-k when n_clusters > 0, else modularity-searched auto-k.

    `modularity_on` selects which graph scores a candidate partition:
    "sim" = the σ-similarity-weighted graph — the reference's STANDARD
    (Arnetminer) mode, which builds Gr from the similarity matrix before
    thresholding (`name_disambiguation.py:84-98`); "combined" = the raw
    combined adjacency — the OpenAlex-variant semantics (`:649`)."""
    n = embed.shape[0]
    if n == 0:
        return np.zeros(0, dtype=np.int64)
    if n == 1:
        return np.zeros(1, dtype=np.int64)
    sim = sigmoid_similarity_matrix(embed, combined if sim_mask == "graph" else None)
    if n_clusters == 0:
        # "components" mode: skip the modularity search, cluster = connected
        # components of the similarity graph. Measured on the Arnetminer
        # corpus this beats the modularity pick (macro F1 0.669 vs 0.614,
        # masked-semantics oracle-best-k ceiling 0.83) — offered as an
        # engine knob, NOT the reference-faithful default.
        return connected_components_dense(sim)
    distance = -sim
    merges = average_linkage_merges(distance)
    if n_clusters > 0:
        return labels_at_k(n, merges, min(n_clusters, n))

    # GHAC search range (reference :83-101): from the component count of the
    # thresholded graph (k_hi, edge pre-clustering) DOWN to k_lo; ties
    # prefer smaller k (the reference's `mod >= best_m` keeps the latest =
    # smallest k). auto_k_floor="components" bounds k_lo at the similarity
    # graph's component count (the fork's current code); "one" lets HAC
    # keep merging disconnected components at distance 0 — the behaviour
    # the reference's committed cluster artifacts exhibit (e.g. `Robert
    # Schreiber_output.txt`: 7 clusters over an 11-component graph).
    if auto_k_floor == "components":
        k_lo = len(np.unique(connected_components_dense(sim)))
    else:
        k_lo = 1
    thr = np.where(sim > threshold, sim, 0.0)
    k_hi = len(np.unique(connected_components_dense(thr)))
    k_lo = max(1, min(k_lo, n))
    k_hi = max(k_lo, min(k_hi, n))
    mod_graph = sim if modularity_on == "sim" else combined
    # one incremental replay scores every k; scan descending with >= so the
    # smallest maximal k wins, matching the reference's loop direction
    qs = modularity_along_merges(mod_graph, merges)
    best_q = -np.inf
    best_k = min(2, n)
    for k in range(k_hi, k_lo - 1, -1):
        if qs[k] >= best_q:
            best_q = qs[k]
            best_k = k
    return labels_at_k(n, merges, best_k)
