"""Distributed transitive closure (union-find as dataflow).

Connected components over an edge Dataset via alternating large-star /
small-star contraction (Kiveris et al., "Connected Components in
MapReduce and Beyond", SoCC 2014 — a public algorithm): each round is
two groupby shuffles over the (small) edge set, converging in
O(log^2 n) rounds; no driver-side union-find, so the closure scales with
the cluster, replacing the reference's in-memory scipy
`connected_components` (`name_disambiguation.py:83-87,604-605`) across
block boundaries (SURVEY.md A9).

Node ids are strings (mention ids) or integers (doc ids); the component
id is the smallest member (lexicographic for strings), which makes
output deterministic.

All star-contraction rounds are Arrow-native (pyarrow group_by /
hash-join / compute kernels) — no pandas conversion on the all-to-all
hot path. The gated small-graph path is a vectorized numpy min-label
propagation, not a per-edge Python loop.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset


def _distinct_uv(t: pa.Table) -> pa.Table:
    """Arrow-native per-partition DISTINCT (u, v)."""
    return t.group_by(["u", "v"]).aggregate([])


def _large_star(edges: Dataset, n_buckets: int = 64) -> Dataset:
    """For each node u: m = min(N(u) ∪ {u}); emit (v, m) for v in N(u), v > u.

    Node groups are high-cardinality, so the per-node contraction runs
    through the bucketed pattern — Arrow kernels per bucket, never a Ray
    dispatch per node."""
    from hgcn_name_disambiguation_ray.stages.groupagg import bucketed_group_apply

    def sym(t: pa.Table) -> pa.Table:
        # zero-copy symmetrization: chunked concat, no buffer rewrite
        return pa.table(
            {
                "a": pa.chunked_array([t["u"].combine_chunks(), t["v"].combine_chunks()]),
                "b": pa.chunked_array([t["v"].combine_chunks(), t["u"].combine_chunks()]),
            }
        )

    def contract(t: pa.Table) -> pa.Table:
        g = t.group_by("a").aggregate([("b", "min")])
        j = t.join(g, keys="a")
        m = pc.min_element_wise(j["b_min"], j["a"])
        keep = pc.greater(j["b"], j["a"])
        out = pa.table({"u": j["b"], "v": m}).filter(keep)
        return _distinct_uv(out)

    symmetric = edges.map_batches(sym, batch_format="pyarrow")
    return bucketed_group_apply(
        symmetric, ["a"], contract, n_buckets=n_buckets, batch_format="pyarrow"
    )


def _small_star(edges: Dataset, n_buckets: int = 64) -> Dataset:
    """Orient edges to (max, min); per node u: m = min(N(u) ∪ {u});
    emit (v, m) for v in N(u) ∪ {u}, v != m. Arrow kernels per bucket."""
    from hgcn_name_disambiguation_ray.stages.groupagg import bucketed_group_apply

    def orient(t: pa.Table) -> pa.Table:
        hi = pc.max_element_wise(t["u"], t["v"])
        lo = pc.min_element_wise(t["u"], t["v"])
        out = pa.table({"a": hi, "b": lo})
        return out.filter(pc.not_equal(hi, lo))

    def contract(t: pa.Table) -> pa.Table:
        # all b < a after orientation, so min(N(a) ∪ {a}) = min(b) per a
        g = t.group_by("a").aggregate([("b", "min")])
        j = t.join(g, keys="a")
        nbr = pa.table({"u": j["b"], "v": j["b_min"]})
        self_rows = pa.table({"u": g["a"], "v": g["b_min"]})
        out = pa.concat_tables([nbr, self_rows])
        return _distinct_uv(out.filter(pc.not_equal(out["u"], out["v"])))

    oriented = edges.map_batches(orient, batch_format="pyarrow")
    return bucketed_group_apply(
        oriented, ["a"], contract, n_buckets=n_buckets, batch_format="pyarrow"
    )


def _hash_col64(col: pa.Array | pa.ChunkedArray) -> np.ndarray:
    """uint64 hash per value of a string or integer edge-endpoint column."""
    from hgcn_name_disambiguation_ray.functions.hashing import (
        _splitmix64,
        hash_string_array,
    )

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if pa.types.is_string(col.type) or pa.types.is_large_string(col.type):
        return hash_string_array(col)
    return _splitmix64(col.to_numpy(zero_copy_only=False).astype(np.int64).view(np.uint64))


def _checksum(edges: Dataset) -> tuple[int, int]:
    """(row_count, order-insensitive content hash) for convergence tests.

    Arrow/numpy end to end — hashes the two endpoint columns straight
    from the Arrow buffers (no pandas conversion per round on the
    star-contraction loop). Rows combine asymmetrically (u then v), rows
    and partitions combine by XOR, so the signature is independent of row
    order and partitioning within one driver run."""

    def h(t: pa.Table) -> pa.Table:
        from hgcn_name_disambiguation_ray.functions.hashing import _splitmix64

        if t.num_rows == 0:
            return pa.table({"h": pa.array([0], pa.uint64()), "n": pa.array([0], pa.int64())})
        row = _splitmix64(_hash_col64(t["u"]) * np.uint64(0x100000001B3) ^ _hash_col64(t["v"]))
        return pa.table(
            {
                "h": pa.array([int(np.bitwise_xor.reduce(row))], pa.uint64()),
                "n": pa.array([t.num_rows], pa.int64()),
            }
        )

    parts = edges.map_batches(h, batch_format="pyarrow").to_pandas()
    if len(parts) == 0:
        return (0, 0)
    return (
        int(parts["n"].sum()),
        int(np.bitwise_xor.reduce(parts["h"].to_numpy(dtype=np.uint64))),
    )


def _min_label_components(e_u: np.ndarray, e_v: np.ndarray, n: int) -> np.ndarray:
    """Vectorized min-label propagation with pointer jumping + edge
    contraction over integer node codes (Shiloach-Vishkin-style hook and
    compress): labels start as own code; every pass hooks each edge's
    endpoints to the min incident label, fully path-compresses
    (l = l[l] to fixpoint), then rewrites the edges to their current
    labels and drops intra-component edges — so the edge set shrinks
    geometrically and the loop ends when no cross-label edge remains.
    Labels are monotone non-increasing and bounded below by the component
    min, so the fixpoint IS the per-component min code. O(log n) passes,
    each a few numpy kernels over the (shrinking) edge arrays; no
    per-edge Python loop."""
    labels = np.arange(n, dtype=np.int64)
    e_u = np.ascontiguousarray(e_u, dtype=np.int64)
    e_v = np.ascontiguousarray(e_v, dtype=np.int64)
    while len(e_u):
        nxt = labels.copy()
        np.minimum.at(nxt, e_u, labels[e_v])
        np.minimum.at(nxt, e_v, labels[e_u])
        while True:
            jumped = nxt[nxt]
            if np.array_equal(jumped, nxt):
                break
            nxt = jumped
        labels = nxt
        e_u = labels[e_u]
        e_v = labels[e_v]
        keep = e_u != e_v
        e_u, e_v = e_u[keep], e_v[keep]
    return labels


def _factorize_sorted(chunks: list[pa.Array]) -> tuple[pa.Array, np.ndarray]:
    """(sorted unique ids, int64 codes in id order) for the concatenated
    chunks. Arrow dictionary-encode (hash, no sort) + a sort of only the
    UNIQUE dictionary — ~5x faster than np.unique on object strings,
    which sorts the full concatenated array under Python comparisons."""
    all_arr = pa.chunked_array(chunks).combine_chunks()
    enc = pc.dictionary_encode(all_arr)
    dic = enc.dictionary
    idx = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    order = pc.sort_indices(dic).to_numpy(zero_copy_only=False).astype(np.int64)
    rank = np.empty(len(dic), dtype=np.int64)
    rank[order] = np.arange(len(dic), dtype=np.int64)
    return dic.take(pa.array(order)), rank[idx]


def _local_components(edges: Dataset) -> Dataset:
    """Driver-side components for provably small edge sets (gated by
    LOCAL_CLOSURE_MAX_EDGES): stream the batches in as Arrow, factorize
    node ids to integer codes once, then run the vectorized min-label
    propagation — no per-edge Python loop anywhere."""
    import ray.data as rd

    us: list[pa.Array] = []
    vs: list[pa.Array] = []
    n_edges = 0
    for batch in edges.iter_batches(batch_size=1 << 20, batch_format="pyarrow"):
        if batch.num_rows:
            for col, acc in ((batch["u"], us), (batch["v"], vs)):
                acc.append(
                    col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
                )
            n_edges += batch.num_rows
    if not n_edges:
        return rd.from_pandas(
            pd.DataFrame(
                {"mention_id": pd.Series(dtype=object), "component": pd.Series(dtype=object)}
            )
        )
    # sorted uniques => code order == id order, so the min CODE per
    # component is the min ID (lexicographic for strings)
    nodes, codes = _factorize_sorted(us + vs)
    labels = _min_label_components(codes[:n_edges], codes[n_edges:], len(nodes))
    return rd.from_arrow(
        pa.table({"mention_id": nodes, "component": nodes.take(pa.array(labels))})
    )


# below this many edges the all-to-all star-contraction rounds cost more
# than streaming the edge list through one driver-side pass
LOCAL_CLOSURE_MAX_EDGES = 2_000_000


def connected_components(
    edges: Dataset, max_rounds: int = 30, force_distributed: bool = False
) -> Dataset:
    """edges(u, v) -> Dataset(mention_id, component) for every node that
    appears in an edge. Isolated nodes don't appear (callers union them).

    Small edge sets (post-blocking candidate edges are usually tiny
    relative to the input) take the driver min-label path; large ones
    run the distributed star-contraction. `force_distributed` runs the
    star-contraction regardless of size (tests / conformance)."""
    edges = edges.materialize()
    if not force_distributed and edges.count() <= LOCAL_CLOSURE_MAX_EDGES:
        return _local_components(edges)
    cur = edges
    prev_sig: tuple[int, int] | None = None
    # every bucket costs a fixed shuffle/dispatch overhead per round; size
    # the bucket count to the edge volume (~100k edges per bucket) so toy
    # graphs do not pay 64 buckets x 2 stars x rounds of pure overhead
    n_buckets = int(max(8, min(256, edges.count() // 100_000 + 8)))
    converged = False
    for _ in range(max_rounds):
        # pin each round: without this the lazy lineage grows round over
        # round and every checksum re-executes the whole history
        cur = _small_star(_large_star(cur, n_buckets), n_buckets).map_batches(
            _distinct_uv, batch_format="pyarrow"
        ).materialize()
        sig = _checksum(cur)
        if sig == prev_sig:
            converged = True
            break
        prev_sig = sig
    if not converged:
        # an unconverged edge set is NOT a (node -> root) mapping:
        # finalizing it would silently split true components. Fail loudly
        # — star-contraction converges in O(log^2 n) rounds, so hitting
        # this means max_rounds is undersized for the graph, not a bug.
        raise RuntimeError(
            f"connected_components did not converge in {max_rounds} rounds; "
            "raise max_rounds"
        )

    def finalize(t: pa.Table) -> pa.Table:
        out = pa.table({"mention_id": t["u"], "component": t["v"]})
        roots = pc.unique(t["v"].combine_chunks())
        return pa.concat_tables(
            [out, pa.table({"mention_id": roots, "component": roots})]
        )

    def self_nodes(t: pa.Table) -> pa.Table:
        # a node whose only edges are self-loops never survives the star
        # rounds (both stars drop u == v), but it DOES 'appear in an edge'
        # — emit (x, x); the final per-node min merges it away whenever
        # the node also reached a real root
        x = pc.unique(t.filter(pc.equal(t["u"], t["v"]))["u"].combine_chunks())
        return pa.table({"mention_id": x, "component": x})

    mapped = cur.map_batches(finalize, batch_format="pyarrow").union(
        edges.map_batches(self_nodes, batch_format="pyarrow")
    )
    # a root may appear in several batches; dedup to the min component per
    # node. mention_id is the highest-cardinality key in the pipeline, so
    # this runs through the bucketed pattern (Arrow kernels per bucket),
    # never a Ray dispatch per node.
    from hgcn_name_disambiguation_ray.stages.groupagg import bucketed_group_apply

    def min_component(t: pa.Table) -> pa.Table:
        g = t.group_by("mention_id").aggregate([("component", "min")])
        # rename by name (pyarrow aggregate column order is version-dependent)
        ren = {"component_min": "component"}
        return g.rename_columns([ren.get(c, c) for c in g.column_names])

    return bucketed_group_apply(
        mapped, ["mention_id"], min_component, batch_format="pyarrow"
    )
