"""Text-analysis operators over a documents Dataset (training-data prep).

Each is a stateless or actor-pool `map_batches` stage over Arrow batches:

  * token_count     — whitespace tokens + the engine's len>1 token rule
                      + a BPE-ish subword regex count
  * quality_score   — length / punctuation / digit / stopword ratios and
                      mean word length, composed into one [0,1] score
  * language_id     — character n-gram + stopword heuristic over built-in
                      profiles (en/de/fr/es + zh by script); no models
  * fingerprint     — winnowing rolling-hash document fingerprint
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset

from hgcn_name_disambiguation_ray.functions.hashing import stable_hash64_array

# BPE-ish subword splitter: letter runs, digit runs, single punctuation
_BPE_RE = re.compile(r"[A-Za-z]+|\d+|[^\sA-Za-z\d]")

_STOPWORDS = {
    "en": {"the", "and", "of", "to", "in", "is", "that", "for", "with", "on"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "mit", "ein", "zu", "von"},
    "fr": {"le", "la", "les", "et", "est", "pas", "pour", "dans", "que", "une"},
    "es": {"el", "la", "los", "y", "es", "no", "con", "para", "que", "una"},
}


def token_count(ds: Dataset, text_col: str = "text", id_col: str = "doc_id") -> Dataset:
    """(id, n_ws_tokens, n_tokens, n_subwords): whitespace count, the
    engine's len>1 token count, and BPE-ish subword count."""

    def body(t: pa.Table) -> pa.Table:
        texts = t[text_col].to_pylist()
        n_ws = np.zeros(len(texts), dtype=np.int64)
        n_tok = np.zeros(len(texts), dtype=np.int64)
        n_sub = np.zeros(len(texts), dtype=np.int64)
        for i, txt in enumerate(texts):
            parts = (txt or "").split()
            n_ws[i] = len(parts)
            n_tok[i] = sum(1 for p in parts if len(p) > 1)
            n_sub[i] = len(_BPE_RE.findall(txt or ""))
        return pa.table(
            {
                id_col: t[id_col],
                "n_ws_tokens": pa.array(n_ws),
                "n_tokens": pa.array(n_tok),
                "n_subwords": pa.array(n_sub),
            }
        )

    return ds.map_batches(body, batch_format="pyarrow")


def quality_score(ds: Dataset, text_col: str = "text", id_col: str = "doc_id") -> Dataset:
    """(id, n_chars2, n_words, mean_word_len, punct_ratio, digit_ratio,
    stop_ratio, quality) — all ratios in [0,1], quality a simple composite."""

    def body(t: pa.Table) -> pa.Table:
        texts = t[text_col].to_pylist()
        n = len(texts)
        out = {
            "n_chars2": np.zeros(n, np.int64),
            "n_words": np.zeros(n, np.int64),
            "mean_word_len": np.zeros(n, np.float64),
            "punct_ratio": np.zeros(n, np.float64),
            "digit_ratio": np.zeros(n, np.float64),
            "stop_ratio": np.zeros(n, np.float64),
            "quality": np.zeros(n, np.float64),
        }
        stops = _STOPWORDS["en"]
        for i, txt in enumerate(texts):
            s = txt or ""
            words = s.split()
            n_chars = len(s)
            out["n_chars2"][i] = n_chars
            out["n_words"][i] = len(words)
            out["mean_word_len"][i] = (sum(map(len, words)) / len(words)) if words else 0.0
            if n_chars:
                out["punct_ratio"][i] = sum(not c.isalnum() and not c.isspace() for c in s) / n_chars
                out["digit_ratio"][i] = sum(c.isdigit() for c in s) / n_chars
            if words:
                out["stop_ratio"][i] = sum(w.lower() in stops for w in words) / len(words)
            length_ok = 1.0 if 20 <= len(words) <= 10000 else 0.3
            wl = out["mean_word_len"][i]
            wordlen_ok = 1.0 if 3.0 <= wl <= 12.0 else 0.3
            out["quality"][i] = (
                0.4 * length_ok
                + 0.3 * wordlen_ok
                + 0.2 * (1.0 - min(1.0, out["punct_ratio"][i] * 4))
                + 0.1 * (1.0 - min(1.0, out["digit_ratio"][i] * 4))
            )
        cols = {id_col: t[id_col]}
        cols.update({k2: pa.array(v) for k2, v in out.items()})
        return pa.table(cols)

    return ds.map_batches(body, batch_format="pyarrow")


class LanguageId:
    """Actor-pool language-ID stage: profiles compiled once per actor."""

    def __init__(self, text_col: str = "text", id_col: str = "doc_id"):
        self.text_col = text_col
        self.id_col = id_col
        self.stops = {lang: ws for lang, ws in _STOPWORDS.items()}
        self.cjk = re.compile(r"[一-鿿]")

    def __call__(self, t: pa.Table) -> pa.Table:
        texts = t[self.text_col].to_pylist()
        preds = []
        for txt in texts:
            s = (txt or "").lower()
            if self.cjk.search(s):
                preds.append("zh")
                continue
            words = set(s.split())
            scores = {lang: len(words & sw) for lang, sw in self.stops.items()}
            best = max(sorted(scores), key=lambda k2: scores[k2])
            preds.append(best if scores[best] > 0 else "unknown")
        return pa.table({self.id_col: t[self.id_col], "pred_lang": pa.array(preds, type=pa.string())})


def language_id(ds: Dataset, text_col: str = "text", id_col: str = "doc_id") -> Dataset:
    return ds.map_batches(
        LanguageId, fn_constructor_args=(text_col, id_col),
        batch_format="pyarrow", concurrency=(1, 4),
    )


def fingerprint(
    ds: Dataset, text_col: str = "text", id_col: str = "doc_id",
    window: int = 8,
) -> Dataset:
    """Winnowing fingerprint: token rolling hashes, min per sliding window,
    XOR-folded to one stable uint64 per document."""

    def body(t: pa.Table) -> pa.Table:
        texts = t[text_col].to_pylist()
        fps = np.zeros(len(texts), dtype=np.uint64)
        for i, txt in enumerate(texts):
            toks = (txt or "").lower().split()
            if not toks:
                continue
            h = stable_hash64_array(np.asarray(toks, dtype=object))
            if len(h) <= window:
                sel = np.array([h.min()], dtype=np.uint64)
            else:
                view = np.lib.stride_tricks.sliding_window_view(h, window)
                sel = view.min(axis=1)
            fp = np.uint64(0)
            with np.errstate(over="ignore"):
                for v in np.unique(sel):
                    fp ^= v * np.uint64(0x9E3779B97F4A7C15)
            fps[i] = fp
        return pa.table({id_col: t[id_col], "fingerprint": pa.array(fps, type=pa.uint64())})

    return ds.map_batches(body, batch_format="pyarrow")
