"""Vectorized text normalization / tokenization.

Semantics mirror the reference title normalizer (M2/M3 in SURVEY.md §2.2;
reference `name_disambiguation.py:271,352-364,771-773`):

  1. replace every run of punctuation ``!"#$%&'()*+,-./:;<=>?@[\\]^_`{|}~``
     plus U+2014 (em dash) and U+FF5E (fullwidth tilde) with a single space;
  2. replace tabs with spaces;
  3. lowercase;
  4. split on single spaces (empty fields dropped by the length filter);
  5. keep tokens with len > 1  -> ``tokens``   (reference ``p_to``);
  6. Porter-stem; drop stems in the 16-word stemmed stoplist
     -> ``tokens_stemmed``                      (reference ``p_t``).

The hot path is Arrow-native: the regex/lower/split run as pyarrow.compute
kernels over whole columns; the per-token length/stem/stoplist filters run
over the *flattened* values array with numpy + a memoised stemmer, then the
list structure is rebuilt from offsets. No per-row Python loop.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from hgcn_name_disambiguation_ray.config import STOPWORDS_RAW
from hgcn_name_disambiguation_ray.functions.stemmer import stem

# exact char class of the reference normalizer (codepoints verified against
# name_disambiguation.py:271): ASCII punctuation + em dash + fullwidth tilde
PUNCT_PATTERN = r"[!\"#$%&'()*+,\-./:;<=>?@\[\\\]^_`{|}~—～]+"

STOPWORDS_STEMMED = frozenset(stem(w) for w in STOPWORDS_RAW)


def normalize_strings(col: pa.Array | pa.ChunkedArray) -> pa.Array | pa.ChunkedArray:
    """Steps 1-3: punctuation->space, tab->space, lowercase. Vectorized."""
    out = pc.replace_substring_regex(col, pattern=PUNCT_PATTERN, replacement=" ")
    out = pc.replace_substring(out, pattern="\t", replacement=" ")
    return pc.utf8_lower(out)


def _rebuild_list(flat: np.ndarray, keep: np.ndarray, offsets: np.ndarray) -> pa.ListArray:
    """Filter flattened list values by `keep` and rebuild a ListArray."""
    cum = np.zeros(len(flat) + 1, dtype=np.int64)
    np.cumsum(keep, out=cum[1:])
    new_offsets = cum[offsets]  # kept-count prefix sums at each list boundary
    values = pa.array(flat[keep], type=pa.string())
    return pa.ListArray.from_arrays(pa.array(new_offsets, type=pa.int64()), values)


def tokenize_column(col: pa.Array | pa.ChunkedArray) -> tuple[pa.ListArray, pa.ListArray]:
    """Return (tokens, tokens_stemmed) list<string> arrays for a text column."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    norm = normalize_strings(col)
    if isinstance(norm, pa.ChunkedArray):
        norm = norm.combine_chunks()
    norm = norm.fill_null("")
    split = pc.split_pattern(norm, pattern=" ")
    if isinstance(split, pa.ChunkedArray):
        split = split.combine_chunks()
    offsets = split.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    flat = np.asarray(split.values.to_pandas(), dtype=object)

    # len > 1 filter (drops the empty strings produced by split on runs too)
    lens = np.frompyfunc(len, 1, 1)(flat).astype(np.int64) if len(flat) else np.zeros(0, dtype=np.int64)
    keep_raw = lens > 1
    tokens = _rebuild_list(flat, keep_raw, offsets)

    # stem distinct surviving tokens once, then apply stoplist
    kept = flat[keep_raw]
    if len(kept):
        uniq, inverse = np.unique(kept.astype(str), return_inverse=True)
        stemmed_uniq = np.array([stem(t) for t in uniq], dtype=object)
        stop_uniq = np.array([s in STOPWORDS_STEMMED for s in stemmed_uniq], dtype=bool)
        stemmed_kept = stemmed_uniq[inverse]
        keep_stem_within = ~stop_uniq[inverse]
    else:
        stemmed_kept = kept
        keep_stem_within = np.zeros(0, dtype=bool)

    # build stemmed lists: start from the raw-kept structure
    raw_offsets = tokens.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    tokens_stemmed = _rebuild_list(stemmed_kept, keep_stem_within, raw_offsets)
    return tokens, tokens_stemmed


def tokenize_batch(batch: pa.Table, text_col: str = "title") -> pa.Table:
    """map_batches body: append `tokens` and `tokens_stemmed` columns."""
    tokens, tokens_stemmed = tokenize_column(batch[text_col])
    batch = batch.append_column("tokens", tokens)
    return batch.append_column("tokens_stemmed", tokens_stemmed)


def split_ws_flat(
    col: pa.Array | pa.ChunkedArray, lower: bool = False
) -> tuple[np.ndarray, np.ndarray]:
    """Whitespace-run split with empties dropped — Python str.split()
    semantics over a whole column: returns (flat object array of tokens,
    row offsets of len n_rows+1). Nulls split to zero tokens. The split
    runs as an Arrow kernel; the empty-drop is one numpy mask."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    col = pc.fill_null(col, "")
    if lower:
        col = pc.utf8_lower(col)
    parts = pc.split_pattern_regex(col, pattern=r"\s+")
    if isinstance(parts, pa.ChunkedArray):
        parts = parts.combine_chunks()
    offsets = parts.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    flat = np.asarray(parts.values.to_pandas(), dtype=object)
    lens = np.frompyfunc(len, 1, 1)(flat).astype(np.int64) if len(flat) else np.zeros(0, np.int64)
    keep = lens > 0
    cum = np.zeros(len(flat) + 1, dtype=np.int64)
    np.cumsum(keep, out=cum[1:])
    return flat[keep], cum[offsets]


def split_ws_hashed(
    col: pa.Array | pa.ChunkedArray, lower: bool = False
) -> tuple[np.ndarray, np.ndarray]:
    """Like `split_ws_flat` but returns (uint64 token hashes, offsets)
    without ever materializing tokens as Python objects: the split stays
    an Arrow kernel, the hash reads the values buffers directly, and the
    empty-token drop is a byte-length mask from the Arrow offsets."""
    from hgcn_name_disambiguation_ray.functions.hashing import hash_string_array

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    col = pc.fill_null(col, "")
    if lower:
        col = pc.utf8_lower(col)
    parts = pc.split_pattern_regex(col, pattern=r"\s+")
    if isinstance(parts, pa.ChunkedArray):
        parts = parts.combine_chunks()
    offsets = parts.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    values = parts.values
    if len(values) == 0:
        return np.zeros(0, np.uint64), offsets - offsets[0]
    voff_dtype = np.int64 if pa.types.is_large_string(values.type) else np.int32
    voff = np.frombuffer(values.buffers()[1], dtype=voff_dtype)[
        values.offset : values.offset + len(values) + 1
    ].astype(np.int64)
    keep = np.diff(voff) > 0  # empty byte-length == empty token (UTF-8)
    h_all = hash_string_array(values)
    cum = np.zeros(len(values) + 1, dtype=np.int64)
    np.cumsum(keep, out=cum[1:])
    return h_all[keep], cum[offsets]


def normalized_name_key(col: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Blocking key from an entity surface name (M1 semantics,
    reference `openAlex_to_HGCN.py:46-91`): lowercase, split on whitespace
    (empty parts from leading/trailing/repeated whitespace dropped),
    key = "first last" (single-token names key on that token alone)."""
    kept, offsets = split_ws_flat(col, lower=True)
    starts, ends = offsets[:-1], offsets[1:]
    n_rows = len(starts)
    first = np.empty(n_rows, dtype=object)
    last = np.empty(n_rows, dtype=object)
    first[:] = ""
    last[:] = ""
    nz = ends > starts
    first[nz] = kept[starts[nz]]
    last[nz] = kept[ends[nz] - 1]
    # branch on token COUNT: a reduplicated two-token name ("Wei Wei")
    # must key to "wei wei", not collapse into the single-token "wei"
    # block (value equality would merge it with every lone "Wei")
    single = (ends - starts) <= 1
    out = np.where(single, first, np.char.add(np.char.add(first.astype(str), " "), last.astype(str)))
    return pa.array(out.astype(object), type=pa.string())


def explode_list(col: pa.Array | pa.ChunkedArray) -> tuple[np.ndarray, np.ndarray]:
    """list<string> column -> (flat object ndarray of values, per-row
    lengths int64). Null lists count as empty. The shared buffer-decode
    for every stage that explodes a list column to numpy (coentities,
    token lists, word-vector training); stages that stay Arrow-native for
    hashing (blocking.rep_signals) decode their own buffers instead."""
    lens = np.asarray(
        pc.fill_null(pc.list_value_length(col), 0).to_pandas(), dtype=np.int64
    )
    flat = np.asarray(pc.list_flatten(col).to_pandas(), dtype=object)
    return flat, lens


def host_tokens(host: str | None) -> list[str]:
    """Venue/host string -> lowercase alnum tokens (len > 1). Used both
    when venue tokens join the word-vector TRAINING corpus
    (state/wordvec.py) and when they mix into the cross-component title
    vector (`LinkageConfig.cross_title_host_w`) — one tokenizer, so
    train/serve vocab agree."""
    import re

    return [w for w in re.split(r"[^a-z0-9]+", (host or "").lower()) if len(w) > 1]
