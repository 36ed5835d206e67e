"""Deduplication operators over a document Dataset.

Exact and near-duplicate detection are first-class operators of the
engine (the 100 TB training-data-pipeline companion to the linkage
core; the reference's only dedup is the by-id `unique_works` dict,
`openAlex_to_HGCN.py:233-241`, SURVEY.md D1):

  * exact_dedup      — content hash -> hash-partitioned keep-min-id
  * minhash_lsh_dedup— word-shingle MinHash -> banded LSH buckets ->
                       candidate pairs -> signature-estimated Jaccard
                       verify -> transitive closure -> canonical ids
  * ngram_jaccard_dedup — same candidate generation, EXACT n-gram
                       Jaccard verify (token sets shipped only for
                       candidates)
  * simhash_dedup    — 64-bit SimHash, banded into 4x16-bit tables,
                       Hamming-distance verify, closure

All signatures are computed vectorized per batch (flat token arrays +
segmented numpy minima); every stage is a map_batches/groupby composition
— no driver-side loops over rows. Canonical id = min doc id of the
duplicate component (deterministic).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset

from hgcn_name_disambiguation_ray.functions.hashing import (
    band_keys,
    hamming_distance64,
    minhash_signatures_flat,
    perm_params,
    simhash,
    stable_hash64,
    stable_hash64_array,
)
from hgcn_name_disambiguation_ray.stages.closure import connected_components
from hgcn_name_disambiguation_ray.stages.groupagg import bucketed_group_apply


def exact_dedup(ds: Dataset, text_col: str = "text", id_col: str = "doc_id") -> Dataset:
    """One row per distinct text: (keep_id = min id, n_copies).

    Content hashes are high-cardinality (~one group per distinct doc),
    so the merge runs through the bucketed-groupby pattern — vectorized
    pandas aggregation per bucket, never a Ray dispatch per group."""

    def hash_batch(t: pa.Table) -> pa.Table:
        texts = np.asarray(t[text_col].to_pandas(), dtype=object)
        h = stable_hash64_array(texts)
        return pa.table({id_col: t[id_col], "content_hash": pa.array(h, type=pa.uint64())})

    def partial(t: pa.Table) -> pa.Table:
        # per-batch combine: (hash, min_id, count) — shrinks the shuffle
        g = t.group_by("content_hash").aggregate([(id_col, "min"), (id_col, "count")])
        return g.rename_columns(["content_hash", "keep_id", "n_copies"])

    hashed = ds.map_batches(hash_batch, batch_format="pyarrow")
    partials = hashed.map_batches(partial, batch_format="pyarrow")

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("content_hash", as_index=False, sort=False).agg(
            keep_id=("keep_id", "min"), n_copies=("n_copies", "sum")
        )

    merged = bucketed_group_apply(partials, ["content_hash"], merge, n_buckets=64)
    return merged.select_columns(["keep_id", "n_copies"])


def _shingles(tokens: list[str], n: int) -> list[str]:
    if len(tokens) < n:
        return [" ".join(tokens)] if tokens else []
    return [" ".join(tokens[i : i + n]) for i in range(len(tokens) - n + 1)]


class _SignatureStage:
    """Per-batch MinHash signatures over word shingles of `text_col`."""

    def __init__(self, text_col: str, id_col: str, num_perms: int, bands: int,
                 shingle_n: int, seed: int):
        self.text_col = text_col
        self.id_col = id_col
        self.bands = bands
        self.shingle_n = shingle_n
        self.a, self.b = perm_params(num_perms, seed)

    def signatures(self, t: pa.Table) -> tuple[list, np.ndarray]:
        texts = pc.utf8_lower(t[self.text_col])
        split = pc.split_pattern_regex(texts.combine_chunks() if isinstance(texts, pa.ChunkedArray) else texts, r"\s+")
        toks = split.to_pylist()
        flat: list[str] = []
        offsets = [0]
        for tk in toks:
            flat.extend(_shingles([x for x in (tk or []) if x], self.shingle_n))
            offsets.append(len(flat))
        th = stable_hash64_array(np.asarray(flat, dtype=object)) if flat else np.zeros(0, np.uint64)
        sigs = minhash_signatures_flat(th, np.asarray(offsets), self.a, self.b)
        return t[self.id_col].to_pylist(), sigs

    def __call__(self, t: pa.Table) -> pa.Table:
        """One row per doc: (doc_id, signature list<uint64>)."""
        ids, sigs = self.signatures(t)
        return pa.table(
            {
                "doc_id": pa.array(ids),
                "signature": pa.array([s.tolist() for s in sigs], type=pa.list_(pa.uint64())),
            }
        )


def _explode_bands(n_bands: int):
    """(doc_id, signature) -> (doc_id, band, bucket) band rows."""

    def body(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        sigs = np.asarray(t["signature"].to_pylist(), dtype=np.uint64)
        if len(ids) == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], type=t["doc_id"].type),
                    "band": pa.array([], type=pa.int32()),
                    "bucket": pa.array([], type=pa.uint64()),
                }
            )
        bands = band_keys(sigs, n_bands)
        return pa.table(
            {
                "doc_id": pa.array(np.repeat(np.asarray(ids), n_bands)),
                "band": pa.array(np.tile(np.arange(n_bands, dtype=np.int32), len(ids))),
                "bucket": pa.array(bands.reshape(-1), type=pa.uint64()),
            }
        )

    return body


def _pairs_in_bucket_groups(df: pd.DataFrame, max_bucket: int) -> pd.DataFrame:
    """Vectorized pair expansion for one bucket partition: pandas groupby
    over (band, bucket) locally, numpy triangle per multi-member group.
    Singleton buckets (the vast majority) are dropped in one mask."""
    df = df.drop_duplicates(["band", "bucket", "doc_id"])
    # keep only (band,bucket) groups with >= 2 members
    dup = df.duplicated(["band", "bucket"], keep=False)
    df = df[dup]
    if df.empty:
        return pd.DataFrame({"u": pd.Series(dtype=np.int64), "v": pd.Series(dtype=np.int64)})
    out_u, out_v = [], []
    for (_, _), g in df.groupby(["band", "bucket"], sort=False):
        ids = np.sort(g["doc_id"].to_numpy())
        if len(ids) > max_bucket:
            # star against min id bounds cost; closure still merges the set
            out_u.append(np.repeat(ids[0], len(ids) - 1))
            out_v.append(ids[1:])
        else:
            iu, iv = np.triu_indices(len(ids), k=1)
            out_u.append(ids[iu])
            out_v.append(ids[iv])
    return pd.DataFrame({"u": np.concatenate(out_u), "v": np.concatenate(out_v)})


def _candidate_pairs(band_rows: Dataset, max_bucket: int = 200) -> Dataset:
    """(band, bucket) collision groups -> candidate pairs (u, v), u < v.

    Bucket ids are high-cardinality (~#docs x bands groups), so grouping
    runs through the bucketed pattern: shuffle by hash(band,bucket) %
    n_buckets, expand pairs vectorized inside each partition. Distinct
    pairs only (dedup across bands happens in the verify stage)."""
    return bucketed_group_apply(
        band_rows,
        ["band", "bucket"],
        lambda df: _pairs_in_bucket_groups(df, max_bucket).drop_duplicates(["u", "v"]),
        n_buckets=64,
    )


def minhash_lsh_dedup(
    ds: Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.8,
    num_perms: int = 128,
    bands: int = 32,
    shingle_n: int = 3,
    seed: int = 7,
) -> Dataset:
    """Near-dup groups: (doc_id, canonical_id). Jaccard estimated from
    MinHash signatures (fraction of equal components) >= threshold."""
    sig_stage = _SignatureStage(text_col, id_col, num_perms, bands, shingle_n, seed)
    sigs_ds = ds.map_batches(sig_stage, batch_format="pyarrow").materialize()
    band_rows = sigs_ds.map_batches(_explode_bands(bands), batch_format="pyarrow")
    cand = _candidate_pairs(band_rows).materialize()

    # verify against a broadcast signature lookup restricted to CANDIDATE
    # VERTICES (the LSH-collision set — small relative to the corpus; at
    # larger candidate volumes this becomes a bucketed hash join instead).
    import ray

    cand_pdf = cand.to_pandas()
    vertex_ids = set(cand_pdf["u"]).union(cand_pdf["v"])

    def keep_vertices(t: pa.Table) -> pa.Table:
        return t.filter(pa.array([d in vertex_ids for d in t["doc_id"].to_pylist()]))

    sig_df = sigs_ds.map_batches(keep_vertices, batch_format="pyarrow").to_pandas()
    sig_map = {
        d: np.asarray(s, dtype=np.uint64)
        for d, s in zip(sig_df["doc_id"], sig_df["signature"])
    }
    sig_ref = ray.put(sig_map)

    class Verify:
        def __init__(self, ref, thr):
            self.sig = ray.get(ref)
            self.thr = thr

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            if df.empty:
                return pd.DataFrame({"u": pd.Series(dtype=object), "v": pd.Series(dtype=object)})
            keep_u, keep_v = [], []
            for u, v in zip(df["u"], df["v"]):
                su, sv = self.sig.get(u), self.sig.get(v)
                if su is not None and sv is not None and (su == sv).mean() >= self.thr:
                    keep_u.append(u)
                    keep_v.append(v)
            return pd.DataFrame({"u": keep_u, "v": keep_v})

    verified = cand.map_batches(Verify, fn_constructor_args=(sig_ref, threshold),
                                batch_format="pandas", concurrency=(1, 4))
    comps = connected_components(verified)

    def rename(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"doc_id": df["mention_id"], "canonical_id": df["component"]})

    return comps.map_batches(rename, batch_format="pandas")


def ngram_jaccard_dedup(
    ds: Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.8,
    shingle_n: int = 3,
    seed: int = 7,
) -> Dataset:
    """Like minhash_lsh_dedup but with EXACT n-gram Jaccard verification:
    candidate pairs from LSH, token shingle sets shipped only for the
    (small) candidate vertex set."""
    sig_stage = _SignatureStage(text_col, id_col, 128, 32, shingle_n, seed)
    sigs_ds = ds.map_batches(sig_stage, batch_format="pyarrow")
    band_rows = sigs_ds.map_batches(_explode_bands(32), batch_format="pyarrow")
    cand = _candidate_pairs(band_rows).materialize()

    import ray

    # shingle sets for candidate vertices only
    cand_df = cand.to_pandas()
    vertex_ids = set(cand_df["u"]).union(cand_df["v"])

    def shingle_sets(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_pylist()
        texts = t[text_col].to_pylist()
        out_id, out_sh = [], []
        for i, txt in zip(ids, texts):
            if i in vertex_ids:
                toks = [x for x in (txt or "").lower().split() if x]
                out_id.append(i)
                out_sh.append(sorted(set(_shingles(toks, shingle_n))))
        return pa.table({"doc_id": pa.array(out_id), "shingles": pa.array(out_sh, type=pa.list_(pa.string()))})

    sets_df = ds.map_batches(shingle_sets, batch_format="pyarrow").to_pandas()
    smap = {r["doc_id"]: set(r["shingles"]) for _, r in sets_df.iterrows()}
    sref = ray.put(smap)

    class VerifyExact:
        def __init__(self, ref, thr):
            self.sets = ray.get(ref)
            self.thr = thr

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            keep_u, keep_v = [], []
            for u, v in zip(df["u"], df["v"]):
                su, sv = self.sets.get(u), self.sets.get(v)
                if not su or not sv:
                    continue
                inter = len(su & sv)
                union = len(su | sv)
                if union and inter / union >= self.thr:
                    keep_u.append(u)
                    keep_v.append(v)
            return pd.DataFrame({"u": keep_u, "v": keep_v})

    verified = cand.map_batches(VerifyExact, fn_constructor_args=(sref, threshold),
                                batch_format="pandas", concurrency=(1, 4))
    comps = connected_components(verified)
    return comps.map_batches(
        lambda df: pd.DataFrame({"doc_id": df["mention_id"], "canonical_id": df["component"]}),
        batch_format="pandas",
    )


def simhash_dedup(
    ds: Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
) -> Dataset:
    """SimHash near-dup: 64-bit fingerprints, 4x16-bit band tables (any
    pair within Hamming distance <= 3 collides in at least one band),
    Hamming verify, closure -> (doc_id, canonical_id, fingerprint)."""

    def fingerprints(t: pa.Table) -> pa.Table:
        texts = t[text_col].to_pylist()
        ids = t[id_col].to_pylist()
        fps = np.zeros(len(ids), dtype=np.uint64)
        for i, txt in enumerate(texts):
            toks = [x for x in (txt or "").lower().split() if x]
            th = stable_hash64_array(np.asarray(toks, dtype=object)) if toks else np.zeros(0, np.uint64)
            fps[i] = simhash(th)
        return pa.table(
            {
                "doc_id": pa.array(ids),
                "fingerprint": pa.array(fps, type=pa.uint64()),
            }
        )

    def explode(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        fps = np.asarray(t["fingerprint"].to_pylist(), dtype=np.uint64)
        out_ids, out_band, out_key = [], [], []
        for bi in range(4):
            shift = np.uint64(16 * bi)
            keys = (fps >> shift) & np.uint64(0xFFFF)
            out_ids.extend(ids)
            out_band.extend([bi] * len(ids))
            out_key.extend(keys.tolist())
        return pa.table(
            {
                "doc_id": pa.array(out_ids),
                "band": pa.array(out_band, type=pa.int32()),
                "bucket": pa.array(out_key, type=pa.uint64()),
            }
        )

    fp_ds = ds.map_batches(fingerprints, batch_format="pyarrow").materialize()
    band_rows = fp_ds.map_batches(explode, batch_format="pyarrow")
    cand = _candidate_pairs(band_rows)

    import ray

    fp_df = fp_ds.to_pandas()
    fmap = dict(zip(fp_df["doc_id"], fp_df["fingerprint"].astype(np.uint64)))
    fref = ray.put(fmap)

    class VerifyHamming:
        def __init__(self, ref, maxd):
            self.fp = ray.get(ref)
            self.maxd = maxd

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            if df.empty:
                return pd.DataFrame({"u": pd.Series(dtype=object), "v": pd.Series(dtype=object)})
            fu = np.array([self.fp[u] for u in df["u"]], dtype=np.uint64)
            fv = np.array([self.fp[v] for v in df["v"]], dtype=np.uint64)
            keep = hamming_distance64(fu, fv) <= self.maxd
            return pd.DataFrame({"u": df["u"].to_numpy()[keep], "v": df["v"].to_numpy()[keep]})

    verified = cand.map_batches(VerifyHamming, fn_constructor_args=(fref, max_hamming),
                                batch_format="pandas", concurrency=(1, 4))
    comps = connected_components(verified)
    return comps.map_batches(
        lambda df: pd.DataFrame({"doc_id": df["mention_id"], "canonical_id": df["component"]}),
        batch_format="pandas",
    )


def embedding_cosine_dedup(
    ds: Dataset,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.95,
    n_planes: int = 16,
    seed: int = 11,
) -> Dataset:
    """Near-dup by embedding cosine: random-hyperplane LSH buckets ->
    candidate pairs -> exact cosine verify -> closure."""

    def buckets(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_pylist()
        vecs = np.array(t[vec_col].to_pylist(), dtype=np.float64)
        if len(vecs) == 0:
            return pa.table({"doc_id": pa.array([], type=t[id_col].type),
                             "band": pa.array([], type=pa.int32()),
                             "bucket": pa.array([], type=pa.uint64())})
        rng = np.random.default_rng(seed)
        planes = rng.normal(size=(vecs.shape[1], n_planes))
        bits = (vecs @ planes) > 0  # (n, planes)
        # two 8-plane bands: near-identical vectors collide in at least one
        half = n_planes // 2
        k1 = np.packbits(bits[:, :half], axis=1, bitorder="little")[:, 0].astype(np.uint64)
        k2 = np.packbits(bits[:, half:], axis=1, bitorder="little")[:, 0].astype(np.uint64)
        return pa.table(
            {
                "doc_id": pa.array(ids + ids),
                "band": pa.array([0] * len(ids) + [1] * len(ids), type=pa.int32()),
                "bucket": pa.array(np.concatenate([k1, k2]), type=pa.uint64()),
            }
        )

    band_rows = ds.map_batches(buckets, batch_format="pyarrow").materialize()
    cand = _candidate_pairs(band_rows, max_bucket=500)

    import ray

    vec_df = ds.select_columns([id_col, vec_col]).to_pandas()
    vmap = {r[id_col]: np.asarray(r[vec_col], dtype=np.float64) for _, r in vec_df.iterrows()}
    vref = ray.put(vmap)

    class VerifyCosine:
        def __init__(self, ref, thr):
            self.vecs = ray.get(ref)
            self.thr = thr

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            keep_u, keep_v = [], []
            for u, v in zip(df["u"], df["v"]):
                a, b = self.vecs.get(u), self.vecs.get(v)
                if a is None or b is None:
                    continue
                denom = np.linalg.norm(a) * np.linalg.norm(b)
                if denom > 0 and float(a @ b / denom) >= self.thr:
                    keep_u.append(u)
                    keep_v.append(v)
            return pd.DataFrame({"u": keep_u, "v": keep_v})

    verified = cand.map_batches(VerifyCosine, fn_constructor_args=(vref, threshold),
                                batch_format="pandas", concurrency=(1, 4))
    comps = connected_components(verified)
    return comps.map_batches(
        lambda df: pd.DataFrame({"doc_id": df["mention_id"], "canonical_id": df["component"]}),
        batch_format="pandas",
    )
