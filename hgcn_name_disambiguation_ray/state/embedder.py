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


class HashEmbedder:
    def __init__(self, dim: int = 100, seed: int = 0, cache_max: int = 1 << 20):
        self.dim = dim
        self.seed = seed
        self._cache: dict[str, np.ndarray] = {}
        self._cache_max = cache_max

    def token_vector(self, token: str) -> np.ndarray:
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
        if not tokens:
            return np.zeros(self.dim)
        return np.mean([self.token_vector(t) for t in tokens], axis=0)

    def features(self, token_lists: list[list[str]]) -> np.ndarray:
        return np.stack([self.mean_vector(t) for t in token_lists]) if token_lists else np.zeros((0, self.dim))
