"""Blocking: candidate-block keys, hot-key salting, cross-salt merge keys.

Replaces the reference's implicit "one XML file per name" blocking
(SURVEY.md §1 `blocks`) with explicit, skew-aware dataflow:

  1. `add_block_keys` — stateless map_batches appending the normalized
     entity-name key (M1 semantics, `openAlex_to_HGCN.py:46-91`).
  2. `block_counts` — pre-aggregated (per-batch partial count -> tiny
     groupby-sum) frequency stats; the ONLY full pass before the shuffle,
     over a single projected column.
  3. `make_salt_map` / `AssignSalt` — hot keys (count > salt_cap) are
     split into ceil(count/salt_cap) salts by stable mention-id hash;
     the salt map is broadcast once via `ray.put`, read per actor, never
     re-shipped per batch. Analogue of the reference's max_works=100 cap
     (`openAlex_to_HGCN.py:453`).
  4. `hot_cluster_roots` — for salted blocks only, local clusters carry
     merge signals: their coentities (the reference's co-author edge
     signal, Ga) and MinHash/LSH bands over their stemmed-token union
     (the scale generalization of the ∩>=2-stemmed-token rule,
     `:420-424`). Clusters of the same hot key sharing >= 2 distinct
     signals across salts merge transitively (per-key union-find over
     cluster REPRESENTATIVES, one shuffle). Partitioning assumption
     documented here: two sub-blocks of the same hot key are the same
     entity iff they share a coentity or an LSH band.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from ray.data import Dataset
from ray.data.aggregate import Sum

from hgcn_name_disambiguation_ray.config import LinkageConfig
from hgcn_name_disambiguation_ray.functions.hashing import (
    band_keys,
    minhash_signatures_flat,
    perm_params,
    stable_hash64_array,
)
from hgcn_name_disambiguation_ray.functions.text import normalized_name_key


def add_block_keys(ds: Dataset) -> Dataset:
    def _add(batch: pa.Table) -> pa.Table:
        return batch.append_column("block_key", normalized_name_key(batch["name"]))

    return ds.map_batches(_add, batch_format="pyarrow")


def block_counts(ds: Dataset, min_count: int | None = None) -> pd.DataFrame:
    """Per-key mention counts via partial aggregation (no row shuffle).

    With `min_count`, only keys with n > min_count reach the driver. At
    web scale the DISTINCT key set is itself huge (hundreds of millions of
    entity names), so salt-map construction must pass min_count=salt_cap:
    the driver then sees only the (few) hot keys, not every key."""

    def partial(batch: pa.Table) -> pa.Table:
        counts = batch.group_by("block_key").aggregate([("block_key", "count")])
        return counts.rename_columns(["block_key", "n"])

    partials = ds.select_columns(["block_key"]).map_batches(partial, batch_format="pyarrow")
    out = partials.groupby("block_key").aggregate(Sum("n", alias_name="n"))
    if min_count is not None:
        import pyarrow.compute as pc

        out = out.map_batches(
            lambda t: t.filter(pc.greater(t["n"], min_count)), batch_format="pyarrow"
        )
    return out.to_pandas()


def make_salt_map(counts: pd.DataFrame, salt_cap: int) -> dict[str, int]:
    """{block_key: n_salts} for keys that exceed the per-block cap."""
    if counts.empty or "n" not in counts.columns:
        return {}
    hot = counts[counts["n"] > salt_cap]
    return {
        str(k): int(np.ceil(n / salt_cap))
        for k, n in zip(hot["block_key"], hot["n"])
    }


class AssignSalt:
    """Actor-pool stage: salt = stable_hash(mention_id) % n_salts(key).

    The salt map is fetched from the object store once per actor
    (broadcast join pattern) — not shipped with every batch.
    """

    def __init__(self, salt_map_ref: "ray.ObjectRef | dict"):
        self.salt_map = (
            ray.get(salt_map_ref) if isinstance(salt_map_ref, ray.ObjectRef) else salt_map_ref
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        keys = np.asarray(batch["block_key"].to_pandas(), dtype=object)
        n_salts = np.array([self.salt_map.get(k, 1) for k in keys], dtype=np.uint64)
        mids = np.asarray(batch["mention_id"].to_pandas(), dtype=object)
        h = stable_hash64_array(mids)
        salt = (h % n_salts).astype(np.int32)
        return batch.append_column("salt", pa.array(salt, type=pa.int32()))


def hot_cluster_roots(
    hot_clusters: Dataset, cfg: LinkageConfig, min_signals: int = 2
) -> Dataset:
    """(cluster_id, root) canonical map for hot-key sub-block clusters.

    Semantics: two local clusters of the same hot key merge iff they share
    >= `min_signals` distinct merge signals — a coentity (the co-author
    edge signal, Ga) or a MinHash/LSH band over the cluster's stemmed-token
    union (the ∩>=2-token signal, Gt, at scale) — across DIFFERENT salts;
    the root is the transitive component's smallest cluster id. A single
    coincidentally shared signal is not enough, protecting precision under
    closure. Merges never cross block keys, so the whole computation is
    ONE groupby(block_key) with vectorized + local union-find inside the
    group: cluster REPRESENTATIVES only (one row per local cluster, near-
    deduped per batch before the shuffle), never the member rows.
    """
    a, b = perm_params(cfg.minhash_perms, cfg.seed)
    n_bands = cfg.lsh_bands

    def shrink(t: pa.Table) -> pa.Table:
        df = t.select(
            ["block_key", "salt", "cluster_id", "cluster_coentities", "cluster_tokens"]
        ).to_pandas()
        return pa.Table.from_pandas(
            df.drop_duplicates("cluster_id"), preserve_index=False
        )

    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {"cluster_id": pd.Series(dtype=object), "root": pd.Series(dtype=object)}
        )
        reps = g.drop_duplicates("cluster_id")
        if reps["salt"].nunique() <= 1 or len(reps) <= 1:
            return empty
        cids = reps["cluster_id"].tolist()
        salts = reps["salt"].tolist()
        coents = reps["cluster_coentities"].tolist()
        toks = reps["cluster_tokens"].tolist()
        # signal -> list of (cluster index); coentity signals + LSH bands
        flat: list[str] = []
        offsets = [0]
        for t in toks:
            flat.extend(t if t is not None else [])
            offsets.append(len(flat))
        th = stable_hash64_array(np.asarray(flat, dtype=object)) if flat else np.zeros(0, np.uint64)
        sigs = minhash_signatures_flat(th, np.asarray(offsets), a, b)
        bands = band_keys(sigs, n_bands)
        signal_members: dict[str, list[int]] = {}
        for i in range(len(cids)):
            for e in coents[i] if coents[i] is not None else []:
                signal_members.setdefault(f"a:{e}", []).append(i)
            if toks[i] is not None and len(toks[i]):
                for bidx in range(n_bands):
                    signal_members.setdefault(f"t:{bidx}:{bands[i, bidx]:016x}", []).append(i)
        pair_signals: dict[tuple[int, int], int] = {}
        for members in signal_members.values():
            if len(members) < 2:
                continue
            if len({salts[i] for i in members}) <= 1:
                continue  # signal collides within one salt only: no merge info
            for x in range(len(members)):
                for y in range(x + 1, len(members)):
                    p = (members[x], members[y]) if members[x] < members[y] else (members[y], members[x])
                    pair_signals[p] = pair_signals.get(p, 0) + 1
        parent = list(range(len(cids)))

        def find(x: int) -> int:
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for (u, v), cnt in pair_signals.items():
            if cnt >= min_signals:
                ru, rv = find(u), find(v)
                if ru != rv:
                    parent[max(ru, rv)] = min(ru, rv)
        comp: dict[int, list[int]] = {}
        for i in range(len(cids)):
            comp.setdefault(find(i), []).append(i)
        out_c, out_r = [], []
        for members in comp.values():
            if len(members) < 2:
                continue
            root = min(cids[i] for i in members)
            for i in members:
                if cids[i] != root:
                    out_c.append(cids[i])
                    out_r.append(root)
        if not out_c:
            return empty
        return pd.DataFrame({"cluster_id": out_c, "root": out_r})

    reps = hot_clusters.map_batches(shrink, batch_format="pyarrow")
    return reps.groupby("block_key").map_groups(per_key, batch_format="pandas")
