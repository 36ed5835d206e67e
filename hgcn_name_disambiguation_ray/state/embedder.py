"""Deterministic token embedder (the word2vec stand-in, ST1 in SURVEY.md).

The reference loads a pre-trained 100-d word2vec model
(`name_disambiguation.py:766-768`) that is missing from its repo; its
fallback for out-of-vocabulary titles is a zeros vector in standard mode
(`:1150`). With no network and no gensim here, the engine's "model" is a
deterministic hash-seeded random projection: each token maps to a fixed
100-d vector derived from its blake2b hash, so identical tokens embed
identically on every worker of every cluster size. Node features are the
mean over a mention's *raw* tokens (reference `p_to`, `:1136-1159`),
zeros when empty.

This object is the per-actor state of the vectorizer stage: constructed
once in an actor's ``__init__``, reused across batches, with an LRU-ish
dict cache over distinct tokens.
"""

from __future__ import annotations

import numpy as np

from hgcn_name_disambiguation_ray.functions.hashing import stable_hash64


def _parse_word2vec_lines(f) -> tuple[dict[str, np.ndarray], int]:
    vocab: dict[str, np.ndarray] = {}
    header = f.readline().split()
    dim = int(header[1])
    for line in f:
        parts = line.rstrip("\n").split(" ")
        if len(parts) != dim + 1:
            continue  # malformed row: skip, don't fail the actor
        vocab[parts[0]] = np.asarray(parts[1:], dtype=np.float64)
    return vocab, dim


def load_word2vec_text(path: str) -> tuple[dict[str, np.ndarray], int]:
    """Load the public word2vec TEXT format: header line "n dim", then one
    "token v1 .. vdim" line per word. Returns ({token: vector}, dim)."""
    with open(path, encoding="utf-8") as f:
        return _parse_word2vec_lines(f)


def _parse_idf(text: str) -> dict[str, float]:
    idf: dict[str, float] = {}
    for line in text.splitlines():
        parts = line.rsplit(" ", 1)
        if len(parts) == 2:
            try:
                idf[parts[0]] = float(parts[1])
            except ValueError:
                continue  # malformed sidecar row: skip, don't kill the actor
    return idf


class HashEmbedder:
    """Pluggable token embedder (ST1): pass `model_path` (word2vec text
    format) to load a real model ONCE per actor — in-vocab tokens use the
    model, out-of-vocab tokens fall back to zeros exactly like the
    reference's standard mode (`name_disambiguation.py:1150`). Without a
    model the deterministic hash projection is used for every token."""

    def __init__(self, dim: int = 100, seed: int = 0, cache_max: int = 1 << 20,
                 model_path: str | None = None,
                 model_blob: "tuple[bytes, bytes | None] | None" = None):
        import os

        self.dim = dim
        self.seed = seed
        self._cache: dict[str, np.ndarray] = {}
        self._cache_max = cache_max
        self._model: dict[str, np.ndarray] | None = None
        self._idf: dict[str, float] = {}
        if model_blob is not None:
            # model shipped as bytes through the Ray object store — an
            # actor on another NODE has no access to the driver's local
            # filesystem, so a path alone cannot work multi-node
            import io

            w2v_bytes, idf_bytes = model_blob
            self._model, self.dim = _parse_word2vec_lines(
                io.StringIO(w2v_bytes.decode("utf-8"))
            )
            if idf_bytes is not None:
                self._idf = _parse_idf(idf_bytes.decode("utf-8"))
        elif model_path is not None:
            self._model, model_dim = load_word2vec_text(model_path)
            self.dim = model_dim
            # idf sidecar written by state/wordvec.py train_word_vectors
            idf_path = model_path + ".idf"
            if os.path.exists(idf_path):
                with open(idf_path, encoding="utf-8") as f:
                    self._idf = _parse_idf(f.read())

    def token_vector(self, token: str) -> np.ndarray:
        if self._model is not None:
            v = self._model.get(token)
            return v if v is not None else np.zeros(self.dim)
        v = self._cache.get(token)
        if v is None:
            rng = np.random.default_rng(stable_hash64(token) ^ self.seed)
            v = rng.uniform(-1.0, 1.0, self.dim)
            if len(self._cache) < self._cache_max:
                self._cache[token] = v
        return v

    def mean_vector(self, tokens: list[str]) -> np.ndarray:
        """Mean token vector; zeros fallback for empty token lists
        (the deterministic variant of the reference's fallback, M7)."""
        if len(tokens) == 0:
            return np.zeros(self.dim)
        return np.mean([self.token_vector(t) for t in tokens], axis=0)

    def features(self, token_lists: list[list[str]]) -> np.ndarray:
        return np.stack([self.mean_vector(t) for t in token_lists]) if token_lists else np.zeros((0, self.dim))

    def invocab_features(self, token_lists: list[list[str]]) -> np.ndarray:
        """Mean over IN-VOCAB token vectors only (OOV tokens skipped
        rather than diluting the mean with zeros); zeros when no token is
        in vocabulary. The encoder-feature variant of the artifact-regime
        GHAC. Without a model this equals `features`."""
        if self._model is None:
            return self.features(token_lists)
        out = np.zeros((len(token_lists), self.dim))
        for i, toks in enumerate(token_lists):
            vs = [self._model[t] for t in toks if t in self._model]
            if vs:
                out[i] = np.mean(vs, axis=0)
        return out

    def weighted_features(
        self,
        token_lists: list[list[str]],
        extra_lists: list[list[str]] | None = None,
        extra_w: float = 0.0,
    ) -> np.ndarray:
        """Idf-weighted mean of L2-NORMALIZED in-vocab token vectors —
        the cross-component title representation of the artifact-regime
        GHAC (downweights promiscuous words, equalizes token norms).
        Tokens without a model vector are skipped; all-OOV rows are
        zeros. Falls back to `features` when no idf sidecar is loaded.

        `extra_lists` (e.g. venue tokens) mix in per row with their idf
        scaled by `extra_w` — the `cross_title_host_w` knob."""
        if not self._idf or self._model is None:
            return self.features(token_lists)
        out = np.zeros((len(token_lists), self.dim))
        for i, toks in enumerate(token_lists):
            acc = np.zeros(self.dim)
            wsum = 0.0
            weighted = [(toks, 1.0)]
            if extra_lists is not None and extra_w > 0.0:
                weighted.append((extra_lists[i], extra_w))
            for tok_group, mult in weighted:
                for t in tok_group:
                    v = self._model.get(t)
                    if v is None:
                        continue
                    nv = np.linalg.norm(v)
                    if nv <= 0:
                        continue
                    w = self._idf.get(t, 1.0) * mult
                    acc += (v / nv) * w
                    wsum += w
            if wsum > 0:
                out[i] = acc / wsum
        return out
