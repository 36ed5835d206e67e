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
  4. `cross_salt_merge_edges` — for salted blocks only, mentions emit
     merge keys: one per coentity (the reference's co-author edge signal,
     Ga) and one per MinHash/LSH band over tokens_stemmed (the scale
     generalization of the ∩>=2-stemmed-token rule, `:420-424`).
     Groups spanning >1 salt contribute star edges (min mention id as
     hub), which the transitive-closure stage merges. Partitioning
     assumption documented here: two sub-blocks of the same hot key are
     the same entity iff they share a coentity or an LSH band.
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


def block_counts(ds: Dataset) -> pd.DataFrame:
    """Per-key mention counts via partial aggregation (no row shuffle)."""

    def partial(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        counts = batch.group_by("block_key").aggregate([("block_key", "count")])
        return counts.rename_columns(["block_key", "n"])

    partials = ds.select_columns(["block_key"]).map_batches(partial, batch_format="pyarrow")
    out = partials.groupby("block_key").aggregate(Sum("n", alias_name="n"))
    return out.to_pandas()  # one row per distinct key: small by construction


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


class ClusterMergeKeys:
    """Emit (block_key, merge_key, salt, cluster_id) rows for hot-block
    local-cluster representatives: one key per distinct cluster coentity
    (the co-author signal, Ga) and one per MinHash/LSH band over the
    cluster's stemmed-token union (the ∩>=2-token signal, Gt, at scale)."""

    def __init__(self, cfg: LinkageConfig):
        self.cfg = cfg
        self.a, self.b = perm_params(cfg.minhash_perms, cfg.seed)

    def __call__(self, batch: pa.Table) -> pa.Table:
        bkeys = batch["block_key"].to_pylist()
        salts = batch["salt"].to_pylist()
        cids = batch["cluster_id"].to_pylist()
        coents = batch["cluster_coentities"].to_pylist()
        toks = batch["cluster_tokens"].to_pylist()
        out_key: list[str] = []
        out_mkey: list[str] = []
        out_salt: list[int] = []
        out_cid: list[str] = []
        flat: list[str] = []
        offsets = [0]
        for t in toks:
            flat.extend(t or [])
            offsets.append(len(flat))
        th = stable_hash64_array(np.asarray(flat, dtype=object)) if flat else np.zeros(0, np.uint64)
        sigs = minhash_signatures_flat(th, np.asarray(offsets), self.a, self.b)
        bands = band_keys(sigs, self.cfg.lsh_bands)
        for i, cid in enumerate(cids):
            for e in coents[i] or []:
                out_key.append(bkeys[i])
                out_mkey.append(f"a:{e}")
                out_salt.append(salts[i])
                out_cid.append(cid)
            if toks[i]:
                for bidx in range(self.cfg.lsh_bands):
                    out_key.append(bkeys[i])
                    out_mkey.append(f"t:{bidx}:{bands[i, bidx]:016x}")
                    out_salt.append(salts[i])
                    out_cid.append(cid)
        return pa.table(
            {
                "block_key": pa.array(out_key, type=pa.string()),
                "merge_key": pa.array(out_mkey, type=pa.string()),
                "salt": pa.array(out_salt, type=pa.int32()),
                "cluster_id": pa.array(out_cid, type=pa.string()),
            }
        )


def cross_salt_merge_edges(
    hot_clusters: Dataset, cfg: LinkageConfig, min_signals: int = 2
) -> Dataset:
    """Edges (u, v) between LOCAL CLUSTER ids of the same hot key.

    Two sub-block clusters merge iff they share >= `min_signals` distinct
    merge keys (coentities and/or LSH bands) — a single shared key (e.g.
    one coincidentally shared collaborator name) is not enough, which
    protects precision under transitive closure. Input: the scorer's
    per-mention rows for hot blocks (cluster signature columns carried on
    each row); reduced to one representative row per cluster first.
    """
    reps = hot_clusters.groupby("cluster_id").map_groups(
        lambda g: g.slice(0, 1), batch_format="pyarrow"  # arrow: list columns
    )
    keyed = reps.map_batches(
        ClusterMergeKeys, fn_constructor_args=(cfg,), batch_format="pyarrow",
        concurrency=(1, 4),
    )

    def pairs(group: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "block_key": pd.Series(dtype=object),
                "u": pd.Series(dtype=object),
                "v": pd.Series(dtype=object),
            }
        )
        if group["salt"].nunique() <= 1:
            return empty
        cids = sorted(group["cluster_id"].unique())
        if len(cids) <= 1:
            return empty
        uu, vv = [], []
        for i in range(len(cids)):
            for j in range(i + 1, len(cids)):
                uu.append(cids[i])
                vv.append(cids[j])
        return pd.DataFrame(
            {"block_key": [group["block_key"].iloc[0]] * len(uu), "u": uu, "v": vv}
        )

    cand = keyed.groupby(["block_key", "merge_key"]).map_groups(pairs, batch_format="pandas")
    # count distinct shared signals per cluster pair
    return cand.groupby(["block_key", "u", "v"]).map_groups(
        lambda g: g.head(1) if len(g) >= min_signals else g.head(0),
        batch_format="pandas",
    )
