"""Extended-coentity derivation for the artifact-regime GHAC (dataflow).

The reference's committed cluster artifacts merge mentions across graph
components; part of that signal is transitive collaboration — two
publications whose author sets don't intersect but whose authors have
collaborated elsewhere in the corpus. This stage materializes that
signal as a per-mention `coentities_ext` column: the mention's coentity
set unioned with every coentity's corpus-wide collaborators (2-hop
neighborhood), used by `ghac_hybrid` (state/hac.py) as the hop2 bonus.

All-dataflow, no driver materialization of the entity graph:

  1. explode mentions to distinct (mention_id, coentity) rows
     (vectorized from the Arrow list buffers);
  2. per-mention clique -> directed (x, y) collaborator pairs,
     pre-deduped per batch, then globally distinct + degree-capped in a
     bucketed groupby on x (names with more collaborators than
     `coent_degree_cap` are hubs — no discriminative signal, dropped,
     mirroring the experiment that fitted the regime);
  3. 2-hop rows: distributed hash join of the exploded mentions with
     the collaborator pairs on the shared entity (string columns only —
     Ray's hash join rejects list-typed payloads);
  4. attach: mentions and 2-hop rows are unioned under one schema and
     co-located by a bucketed groupby on mention_id (the sort shuffle
     carries list columns fine, unlike the join operator); inside each
     bucket the ext set = sorted distinct(coentities ∪ 2-hop), capped at
     `coent_ext_max`.

Every shuffle is bucketed/pre-deduped, nothing returns to the driver.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
from ray.data import Dataset

from hgcn_name_disambiguation_ray.config import LinkageConfig
from hgcn_name_disambiguation_ray.stages.groupagg import bucketed_group_apply


def _explode_coents(t: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    """(mention_id, coentity) flat arrays, distinct within each mention."""
    import pyarrow.compute as pc

    col = t["coentities"]
    lens = np.asarray(pc.fill_null(pc.list_value_length(col), 0).to_pandas(), dtype=np.int64)
    flat = np.asarray(pc.list_flatten(col).to_pandas(), dtype=object)
    mids = np.repeat(np.asarray(t["mention_id"].to_pandas(), dtype=object), lens)
    if len(flat) == 0:
        return mids, flat
    df = pd.DataFrame({"m": mids, "e": flat}).drop_duplicates()
    return df["m"].to_numpy(dtype=object), df["e"].to_numpy(dtype=object)


def exploded_mention_entities(mentions: Dataset) -> Dataset:
    """mentions -> rows (mention_id, entity), distinct per mention."""

    def ex(t: pa.Table) -> pa.Table:
        m, e = _explode_coents(t)
        return pa.table({"mention_id": pa.array(m, type=pa.string()),
                         "entity": pa.array(e, type=pa.string())})

    return mentions.map_batches(ex, batch_format="pyarrow")


def collaborator_pairs(mentions: Dataset, degree_cap: int, n_buckets: int = 32) -> Dataset:
    """Globally-distinct directed collaborator pairs (x, y), with hub
    names (degree > degree_cap) dropped entirely."""

    def pairs(t: pa.Table) -> pa.Table:
        m, e = _explode_coents(t)
        empty = pa.table({"x": pa.array([], type=pa.string()),
                          "y": pa.array([], type=pa.string())})
        if len(e) == 0:
            return empty
        df = pd.DataFrame({"m": m, "e": e})
        # vectorized per-mention clique: self-merge on mention id
        p = df.merge(df, on="m")
        p = p[p["e_x"] != p["e_y"]][["e_x", "e_y"]].drop_duplicates()
        if p.empty:
            return empty
        return pa.table({"x": pa.array(p["e_x"].to_numpy(dtype=object), type=pa.string()),
                         "y": pa.array(p["e_y"].to_numpy(dtype=object), type=pa.string())})

    raw = mentions.map_batches(pairs, batch_format="pyarrow")

    def cap(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop_duplicates()
        deg = df.groupby("x")["y"].transform("size")
        return df[deg <= degree_cap]

    # bucket on x: all collaborators of one name co-locate, so the global
    # distinct + degree cap are exact
    return bucketed_group_apply(raw, ["x"], cap, n_buckets=n_buckets)


def extend_coentities(
    mentions: Dataset, cfg: LinkageConfig | None = None, n_buckets: int = 32
) -> Dataset:
    """mentions -> mentions + `coentities_ext` (list<string>) column."""
    from hgcn_name_disambiguation_ray.stages.groupagg import _bucket_of, hash_join

    cfg = cfg or LinkageConfig()
    exploded = exploded_mention_entities(mentions)
    nbrs = collaborator_pairs(mentions, cfg.coent_degree_cap, n_buckets=n_buckets)
    hop = hash_join(
        exploded.map_batches(lambda t: t.rename_columns(["mention_id", "x"]),
                             batch_format="pyarrow"),
        nbrs, on=["x"],
    ).select_columns(["mention_id", "y"])

    schema = mentions.schema()  # ray.data Schema: parallel .names/.types
    if schema is None:
        # empty input has no schema to thread through the union/merge;
        # the scorer treats a missing coentities_ext column as "no 2-hop
        # signal", so passing the (empty) mentions through is exact
        return mentions
    names = list(schema.names)
    types = dict(zip(schema.names, schema.types))
    out_names = names + ["coentities_ext"]
    ext_t = pa.list_(pa.string())

    def pad_mentions(t: pa.Table) -> pa.Table:
        t = t.select(names)
        arrs = [t[n] for n in names]
        arrs.append(pa.nulls(t.num_rows, type=ext_t))
        arrs.append(pa.array([0] * t.num_rows, type=pa.int8()))
        return pa.table(dict(zip(out_names + ["__side"], arrs)))

    def pad_hop(t: pa.Table) -> pa.Table:
        n = t.num_rows
        cols = {}
        for nm in names:
            if nm == "mention_id":
                cols[nm] = t["mention_id"]
            else:
                cols[nm] = pa.nulls(n, type=types[nm])
        # each 2-hop entity rides as a single-element ext list; the bucket
        # merge unions them per mention
        cols["coentities_ext"] = pa.array(
            [[v] for v in t["y"].to_pylist()], type=ext_t
        )
        cols["__side"] = pa.array([1] * n, type=pa.int8())
        return pa.table(cols)

    unioned = mentions.map_batches(pad_mentions, batch_format="pyarrow").union(
        hop.map_batches(pad_hop, batch_format="pyarrow")
    )

    ext_max = cfg.coent_ext_max

    def merge_bucket(g: pd.DataFrame) -> pa.Table:
        ours = g[g["__side"] == 0]
        hops = g[g["__side"] == 1]
        by_m: dict[str, set] = {}
        for mid, lst in zip(hops["mention_id"], hops["coentities_ext"]):
            by_m.setdefault(mid, set()).update(lst)
        ext_col = []
        for mid, ce in zip(ours["mention_id"], ours["coentities"]):
            s = set(ce) if isinstance(ce, (list, tuple, np.ndarray)) else set()
            s |= by_m.get(mid, set())
            ext_col.append(sorted(s)[:ext_max])
        # build the output table explicitly against the input schema:
        # pandas cells holding numpy object arrays (the list-column
        # roundtrip) trip Ray's tensor-extension inference when a batch's
        # rows share one shape, so never hand list columns back as pandas
        cols = {}
        for nm in names:
            vals = ours[nm].tolist()
            if pa.types.is_list(types[nm]) or pa.types.is_large_list(types[nm]):
                vals = [None if v is None else list(v) for v in vals]
            cols[nm] = pa.array(vals, type=types[nm])
        cols["coentities_ext"] = pa.array(ext_col, type=ext_t)
        return pa.table(cols)

    def add_bucket(t: pa.Table) -> pa.Table:
        b = _bucket_of(t.select(["mention_id"]).to_pandas(), ["mention_id"], n_buckets)
        return t.append_column("__bucket", pa.array(b, type=pa.int32()))

    def per_bucket(g: pd.DataFrame) -> pa.Table:
        return merge_bucket(g.drop(columns="__bucket"))

    return unioned.map_batches(add_bucket, batch_format="pyarrow").groupby(
        "__bucket"
    ).map_groups(per_bucket, batch_format="pandas")
