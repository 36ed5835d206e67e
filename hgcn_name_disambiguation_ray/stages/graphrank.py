"""Distributed PageRank in exact integer arithmetic.

Link-graph ranking is a core web-corpus curation signal (host/page
authority feeds crawl prioritization and quality filtering). This
implements the power iteration Ray-Data-first: the edge set never
leaves the cluster, each iteration is one broadcast-or-bucketed join
(rank table is O(nodes) — `auto_join` size-probes it) plus one bucketed
per-destination sum, and the rank state itself is a Dataset.

All arithmetic is INTEGER micro-units (rank starts at 1e6 per node;
per-edge contribution = rank // out_degree; next rank =
(1000-d_milli)*unit//1000 + d_milli*S//1000). Integer sums are
associative — the result is bit-identical under any partitioning or
execution order, unlike float PageRank where distributed addition order
changes low bits. That determinism is what lets the `pagerank` query
carry a full value-hash SQL oracle (the same recurrence unrolled as
chained CTEs with DuckDB's `//`).

Variant note: dangling-node mass is NOT redistributed (the common
simplified formulation); nodes with no in-edges hold the base rank.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset

from hgcn_name_disambiguation_ray.stages.groupagg import (
    auto_join,
    bucketed_count,
    bucketed_sum,
)

UNIT = 1_000_000


def pagerank(
    edges: Dataset,
    iters: int = 5,
    damping_milli: int = 850,
    src_col: str = "src",
    dst_col: str = "dst",
    n_buckets: int = 32,
) -> Dataset:
    """edges: directed (src, dst) int64 pairs -> (node, rank) with rank
    in integer micro-units after `iters` power iterations.

    Per iteration: contribution(u) = rank(u) // outdeg(u) computed on
    the O(nodes) rank table, attached to edges by a size-probed join,
    summed per destination with a bucketed exact sum, then
    rank'(v) = base + damping * S(v) // 1000 via a left join back onto
    the node table (missing S -> 0, so in-edge-less nodes keep base)."""
    if not 0 <= damping_milli <= 1000:
        raise ValueError("damping_milli must be in [0, 1000]")
    base = (1000 - damping_milli) * UNIT // 1000

    def std(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "src": pc.cast(t[src_col], pa.int64()),
                "dst": pc.cast(t[dst_col], pa.int64()),
            }
        )

    edges = edges.map_batches(std, batch_format="pyarrow").materialize()

    outdeg = bucketed_count(edges, ["src"], out_col="outdeg", n_buckets=n_buckets)

    def halves(t: pa.Table) -> pa.Table:
        return pa.table({"node": pa.concat_arrays(
            [t["src"].combine_chunks(), t["dst"].combine_chunks()]
        )})

    nodes = bucketed_count(
        edges.map_batches(halves, batch_format="pyarrow"), ["node"],
        out_col="_c", n_buckets=n_buckets,
    ).select_columns(["node"]).materialize()

    def init_rank(t: pa.Table) -> pa.Table:
        import numpy as np

        return pa.table(
            {"node": t["node"],
             "rank": pa.array(np.full(t.num_rows, UNIT, dtype=np.int64))}
        )

    ranks = nodes.map_batches(init_rank, batch_format="pyarrow")

    # outdeg keyed as 'node' for the rank join
    od = outdeg.map_batches(
        lambda t: pa.table({"node": t["src"], "outdeg": t["outdeg"]}),
        batch_format="pyarrow",
    ).materialize()

    for _ in range(iters):
        # contribution per source node (integer floor division — Arrow
        # divide on int64 truncates, == floor for the nonnegative ranks)
        contrib = auto_join(ranks, od, on=["node"], how="inner").map_batches(
            lambda t: pa.table(
                {
                    "src": t["node"],
                    "contrib": pc.divide(t["rank"], t["outdeg"]),
                }
            ),
            batch_format="pyarrow",
        )
        shipped = auto_join(edges, contrib, on=["src"], how="inner")

        def partial(t: pa.Table) -> pa.Table:
            # per-batch partial sum BEFORE the shuffle: the exchange then
            # moves O(nodes x blocks) rows, not O(edges) — integer sums
            # stay exact under any combine order
            g = pa.table({"dst": t["dst"], "s": t["contrib"]}).group_by(
                "dst"
            ).aggregate([("s", "sum")])
            ren = {"s_sum": "s"}
            return g.rename_columns([ren.get(c, c) for c in g.column_names])

        sums = bucketed_sum(
            shipped.map_batches(partial, batch_format="pyarrow"),
            ["dst"], ["s"], n_buckets=n_buckets,
        ).map_batches(
            lambda t: pa.table({"node": t["dst"], "s": t["s"]}),
            batch_format="pyarrow",
        )
        joined = auto_join(nodes, sums, on=["node"], how="left")

        def step(t: pa.Table) -> pa.Table:
            # Arrow end to end: a pandas fillna tail would pass nullable
            # sums through float64 on the hash-join path and round values
            # above 2^53 — coalesce keeps the recurrence exact in int64
            s = pc.coalesce(pc.cast(t["s"], pa.int64()), pa.scalar(0, pa.int64()))
            rank = pc.add(
                pa.scalar(base, pa.int64()),
                pc.divide(
                    pc.multiply(pa.scalar(damping_milli, pa.int64()), s),
                    pa.scalar(1000, pa.int64()),
                ),
            )
            return pa.table({"node": t["node"], "rank": rank})

        ranks = joined.map_batches(step, batch_format="pyarrow").materialize()

    return ranks
