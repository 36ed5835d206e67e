"""Seeded metapath random walks with alias sampling (per-block, in-actor).

Reimplements the reference walk semantics (SURVEY.md O1/O2; reference
`name_disambiguation.py:29-58` alias method, `:439-532`/`:1035-1127`
walks) on numpy adjacency matrices with an explicit
`np.random.Generator`, making every walk a pure function of the block
seed — the reference draws from the unseeded global `np.random` (§2.10
nondeterminism, intentionally not replicated).

Semantics preserved:
  * per-layer neighbor samplers ∝ edge weight;
  * negative samplers over the *combined* graph with hop-distance
    weights (unreachable -> 6, self -> 0, distance <= 1 -> 0);
  * numwalks=4 walks per node, walk j entering the metapath
    [coauthor, cotitle, coauthor, covenue] at offset j;
  * each step: one positive (start, neighbor), `negative_num` negatives,
    a 2-hop lookahead positive in the next metapath layer with its own
    negatives, then advance; dead-end layers emit negatives only.
"""

from __future__ import annotations

import numpy as np

from hgcn_name_disambiguation_ray.config import LinkageConfig


class AliasTable:
    """Walker's alias method: O(n) build, O(1) draws. Public algorithm."""

    __slots__ = ("idx", "prob", "alias")

    def __init__(self, weights: np.ndarray, idx: np.ndarray):
        p = weights / weights.sum()
        n = len(p)
        self.idx = idx
        scaled = p * n
        self.prob = np.ones(n)
        self.alias = np.arange(n)
        small = [i for i in range(n) if scaled[i] < 1.0]
        large = [i for i in range(n) if scaled[i] >= 1.0]
        scaled = scaled.copy()
        while small and large:
            s, l = small.pop(), large.pop()
            self.prob[s] = scaled[s]
            self.alias[s] = l
            scaled[l] = scaled[l] - (1.0 - scaled[s])
            (small if scaled[l] < 1.0 else large).append(l)

    def draw(self, rng: np.random.Generator) -> int:
        n = len(self.prob)
        i = int(rng.integers(0, n))
        return int(self.idx[i]) if rng.random() < self.prob[i] else int(self.idx[self.alias[i]])

    def draw_pooled(self, pool: "UniformPool") -> int:
        u1, u2 = pool.next2()
        i = int(u1 * len(self.prob))
        return int(self.idx[i]) if u2 < self.prob[i] else int(self.idx[self.alias[i]])

    def draw_many(self, rng: np.random.Generator, k: int) -> np.ndarray:
        n = len(self.prob)
        i = rng.integers(0, n, size=k)
        take_alias = rng.random(k) >= self.prob[i]
        j = np.where(take_alias, self.alias[i], i)
        return self.idx[j]


class UniformPool:
    """Bulk-drawn uniforms consumed two at a time: one vectorized
    generator call per ~chunk instead of two Python-level RNG calls per
    alias draw (the walk loop makes tens of thousands of draws)."""

    __slots__ = ("rng", "buf", "pos", "chunk")

    def __init__(self, rng: np.random.Generator, chunk: int = 65536):
        self.rng = rng
        self.chunk = chunk
        self.buf = rng.random(chunk)
        self.pos = 0

    def next2(self) -> tuple[float, float]:
        if self.pos + 2 > len(self.buf):
            self.buf = self.rng.random(self.chunk)
            self.pos = 0
        u1 = self.buf[self.pos]
        u2 = self.buf[self.pos + 1]
        self.pos += 2
        return u1, u2


def bfs_hop_distances(adj: np.ndarray) -> np.ndarray:
    """All-pairs hop distance over the unweighted version of `adj`.

    Returns float matrix with np.inf for unreachable pairs. Uses
    repeated boolean frontier expansion (vectorized, O(diameter) matmuls).
    """
    n = adj.shape[0]
    reach = adj > 0
    dist = np.full((n, n), np.inf)
    np.fill_diagonal(dist, 0.0)
    cur = reach.copy()
    d = 1
    while d <= n:
        newly = cur & np.isinf(dist)
        if not newly.any():
            break
        dist[newly] = d
        cur = cur @ reach  # boolean matmul: next frontier superset
        d += 1
    return dist


def build_samplers(
    layers: list[np.ndarray],
    used_layers: set[int] | None = None,
) -> tuple[list[list[AliasTable | None]], list[AliasTable | None]]:
    """Neighbor samplers per (layer, node) and negative samplers over the
    last (combined) layer's hop-distance distribution. `used_layers`
    restricts neighbor-table construction to the layers the metapath
    actually indexes — the combined layer (the densest) only feeds the
    negative samplers, so building its per-node tables is pure waste in
    the hot per-block path. Construction consumes no RNG, so skipping
    unused layers changes no outputs."""
    neighbor: list[list[AliasTable | None]] = []
    for li, adj in enumerate(layers):
        if used_layers is not None and li not in used_layers:
            neighbor.append([])
            continue
        per_node: list[AliasTable | None] = []
        for i in range(adj.shape[0]):
            w = adj[i]
            nz = np.nonzero(w)[0]
            per_node.append(AliasTable(w[nz], nz) if len(nz) else None)
        neighbor.append(per_node)

    combined = layers[-1]
    dist = bfs_hop_distances(combined)
    n = combined.shape[0]
    negative: list[AliasTable | None] = []
    for i in range(n):
        d = dist[i].copy()
        d[np.isinf(d)] = 6.0       # unreachable -> 6 (reference :1049)
        d[i] = 0.0                  # self -> 0
        d[d <= 1.0] = 0.0           # direct neighbors -> 0
        nz = np.nonzero(d)[0]
        negative.append(AliasTable(d[nz], nz) if len(nz) else None)
    return neighbor, negative


def metapath_walks(
    layers: list[np.ndarray], cfg: LinkageConfig, rng: np.random.Generator
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Generate (u_i, u_j, label±1) training triples for one block."""
    metapath = cfg.metapath
    neighbor, negative = build_samplers(layers, used_layers=set(metapath))
    n = layers[-1].shape[0]
    pool = UniformPool(rng)
    u_i: list[int] = []
    u_j: list[int] = []
    lab: list[int] = []
    # negative draws never influence the walk path, so they are only
    # COUNTED here and drawn in one draw_many per node afterwards; the
    # final seeded permutation re-mixes positives and negatives so
    # minibatches stay balanced (divergence from the reference's
    # interleaved order is covered by the F1>=0.99 conformance bar)
    neg_requests = np.zeros(n, dtype=np.int64)

    def negs(node: int) -> None:
        if negative[node] is not None:
            neg_requests[node] += 1

    for node_index in range(n):
        for j in range(cfg.num_walks):
            node_start = node_index
            g_index = j % len(metapath)
            gi = metapath[g_index]
            for _ in range(cfg.walk_length):
                sampler = neighbor[gi][node_start]
                if sampler is not None:
                    node_p = sampler.draw_pooled(pool)
                    u_i.append(node_start)
                    u_j.append(node_p)
                    lab.append(1)
                    negs(node_start)
                    g_index = (g_index + 1) % len(metapath)
                    gi = metapath[g_index]
                    sampler2 = neighbor[gi][node_p]
                    if sampler2 is not None:
                        node_p1 = sampler2.draw_pooled(pool)
                        u_i.append(node_start)
                        u_j.append(node_p1)
                        lab.append(1)
                        negs(node_start)
                    node_start = node_p
                else:
                    negs(node_start)
                    g_index = (g_index + 1) % len(metapath)
                    gi = metapath[g_index]
    neg_i: list[np.ndarray] = []
    neg_j: list[np.ndarray] = []
    for node in range(n):
        r = int(neg_requests[node])
        if r:
            k = r * cfg.negative_num
            neg_i.append(np.full(k, node, dtype=np.int64))
            neg_j.append(negative[node].draw_many(rng, k).astype(np.int64))
    ui = np.concatenate([np.asarray(u_i, dtype=np.int64)] + neg_i) if neg_i else np.asarray(u_i, dtype=np.int64)
    uj = np.concatenate([np.asarray(u_j, dtype=np.int64)] + neg_j) if neg_j else np.asarray(u_j, dtype=np.int64)
    ll = np.concatenate(
        [np.ones(len(u_i)), -np.ones(len(ui) - len(u_i))]
    )
    perm = rng.permutation(len(ui))
    return ui[perm], uj[perm], ll[perm]
