"""Distributed transitive closure (union-find as dataflow).

Connected components over an edge Dataset via alternating large-star /
small-star contraction (Kiveris et al., "Connected Components in
MapReduce and Beyond", SoCC 2014 — a public algorithm): each round is
two groupby shuffles over the (small) edge set, converging in
O(log^2 n) rounds; no driver-side union-find, so the closure scales with
the cluster, replacing the reference's in-memory scipy
`connected_components` (`name_disambiguation.py:83-87,604-605`) across
block boundaries (SURVEY.md A9).

Node ids are strings (mention ids); the component id is the
lexicographically smallest member, which makes output deterministic.
"""

from __future__ import annotations

import pandas as pd
from ray.data import Dataset


def _large_star(edges: Dataset, n_buckets: int = 64) -> Dataset:
    """For each node u: m = min(N(u) ∪ {u}); emit (v, m) for v in N(u), v > u.

    Node groups are high-cardinality, so the per-node contraction runs
    through the bucketed pattern — vectorized pandas per partition, never
    a Ray dispatch per node."""
    from hgcn_name_disambiguation_ray.stages.groupagg import bucketed_group_apply

    def sym(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"a": pd.concat([df["u"], df["v"]]), "b": pd.concat([df["v"], df["u"]])}
        )

    def contract(df: pd.DataFrame) -> pd.DataFrame:
        m = df.groupby("a")["b"].transform("min")
        m = m.where(m < df["a"], df["a"])
        keep = df["b"] > df["a"]
        return pd.DataFrame({"u": df.loc[keep, "b"], "v": m[keep]}).drop_duplicates()

    symmetric = edges.map_batches(sym, batch_format="pandas")
    return bucketed_group_apply(symmetric, ["a"], contract, n_buckets=n_buckets)


def _small_star(edges: Dataset, n_buckets: int = 64) -> Dataset:
    """Orient edges to (max, min); per node u: m = min(N(u) ∪ {u});
    emit (v, m) for v in N(u) ∪ {u}, v != m. Vectorized per bucket."""
    from hgcn_name_disambiguation_ray.stages.groupagg import bucketed_group_apply

    def orient(df: pd.DataFrame) -> pd.DataFrame:
        hi = df[["u", "v"]].max(axis=1)
        lo = df[["u", "v"]].min(axis=1)
        keep = hi != lo
        return pd.DataFrame({"a": hi[keep], "b": lo[keep]})

    def contract(df: pd.DataFrame) -> pd.DataFrame:
        m = df.groupby("a")["b"].transform("min")  # min neighbor; all b < a here
        nbr = pd.DataFrame({"u": df["b"], "v": m})
        self_rows = pd.DataFrame({"u": df["a"], "v": m}).drop_duplicates("u")
        out = pd.concat([nbr, self_rows], ignore_index=True)
        return out[out["u"] != out["v"]].drop_duplicates()

    oriented = edges.map_batches(orient, batch_format="pandas")
    return bucketed_group_apply(oriented, ["a"], contract, n_buckets=n_buckets)


def _checksum(edges: Dataset) -> tuple[int, int]:
    """(row_count, order-insensitive content hash) for convergence tests."""

    def h(df: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        if len(df) == 0:
            return pd.DataFrame({"h": [0], "n": [0]})
        # convergence compares signatures ACROSS ROUNDS of one driver run,
        # so the (vectorized C) pandas row hash is sufficient — no need for
        # the cross-process blake hash here
        vals = pd.util.hash_pandas_object(df[["u", "v"]], index=False).to_numpy(np.uint64)
        return pd.DataFrame({"h": [int(np.bitwise_xor.reduce(vals))], "n": [len(df)]})

    parts = edges.map_batches(h, batch_format="pandas").to_pandas()
    import numpy as np

    if len(parts) == 0:
        return (0, 0)
    return (
        int(parts["n"].sum()),
        int(np.bitwise_xor.reduce(parts["h"].to_numpy(dtype=np.uint64))),
    )


def _local_components(edges: Dataset) -> Dataset:
    """Driver-side union-find for provably small edge sets (streamed in
    batches, never a single to_pandas of a big set)."""
    import ray.data as rd

    parent: dict[str, str] = {}

    def find(x: str) -> str:
        root = x
        while parent.setdefault(root, root) != root:
            root = parent[root]
        while parent[x] != root:
            parent[x], x = root, parent[x]
        return root

    for batch in edges.iter_batches(batch_size=65536, batch_format="pandas"):
        for u, v in zip(batch["u"], batch["v"]):
            ru, rv = find(u), find(v)
            if ru != rv:
                if rv < ru:
                    ru, rv = rv, ru
                parent[rv] = ru
    rows = {"mention_id": list(parent), "component": [find(x) for x in parent]}
    return rd.from_pandas(pd.DataFrame(rows)) if parent else rd.from_pandas(
        pd.DataFrame({"mention_id": pd.Series(dtype=object), "component": pd.Series(dtype=object)})
    )


# below this many edges the all-to-all star-contraction rounds cost more
# than streaming the edge list through one driver-side union-find
LOCAL_CLOSURE_MAX_EDGES = 2_000_000


def connected_components(
    edges: Dataset, max_rounds: int = 30, force_distributed: bool = False
) -> Dataset:
    """edges(u, v) -> Dataset(mention_id, component) for every node that
    appears in an edge. Isolated nodes don't appear (callers union them).

    Small edge sets (post-blocking candidate edges are usually tiny
    relative to the input) take the driver union-find path; large ones
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
            lambda df: df.drop_duplicates(), batch_format="pandas"
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

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({"mention_id": df["u"], "component": df["v"]})
        roots = pd.DataFrame({"mention_id": df["v"].unique()})
        roots["component"] = roots["mention_id"]
        return pd.concat([out, roots], ignore_index=True)

    def self_nodes(df: pd.DataFrame) -> pd.DataFrame:
        # a node whose only edges are self-loops never survives the star
        # rounds (both stars drop u == v), but it DOES 'appear in an edge'
        # — emit (x, x); the final per-node min merges it away whenever
        # the node also reached a real root
        x = df.loc[df["u"] == df["v"], "u"].unique()
        return pd.DataFrame({"mention_id": x, "component": x})

    mapped = cur.map_batches(finalize, batch_format="pandas").union(
        edges.map_batches(self_nodes, batch_format="pandas")
    )
    # a root may appear in several batches; dedup to the min component per
    # node. mention_id is the highest-cardinality key in the pipeline, so
    # this runs through the bucketed pattern (vectorized pandas per bucket),
    # never a Ray dispatch per node.
    from hgcn_name_disambiguation_ray.stages.groupagg import bucketed_group_apply

    return bucketed_group_apply(
        mapped,
        ["mention_id"],
        lambda df: df.groupby("mention_id", as_index=False, sort=False)["component"].min(),
    )
