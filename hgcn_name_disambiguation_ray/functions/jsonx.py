"""Vectorized JSON scalar extraction over string columns.

Web pipelines carry semi-structured sidecars (crawl metadata, page
properties, API payloads) as JSON strings; pulling one scalar field out
of every row is the hot-path operation. Two paths with one contract
test pinning their parity:

  - `json_extract_int64(arr, key)`: Arrow-native fast path — a single
    `pyarrow.compute.extract_regex` call over the column (RE2, zero
    Python per row), then an int64 cast. CONTRACT: the column holds
    FLAT JSON objects (no nested object sharing the key, no string
    value embedding the quoted key); the first occurrence of
    `"key": <int>` wins. Rows that don't match yield null.
  - `json_extract_scalar(arr, key)`: generic stdlib `json.loads` path
    (nested-safe, any scalar type). Per-row Python — the safe fallback
    for payloads outside the fast contract, and the cross-check the
    fast path is tested against.

The reference engine has no JSON surface; this is an engine addition
for the training-data suite (the `events.props` column carries JSON).
"""

from __future__ import annotations

import json
import re

import pyarrow as pa
import pyarrow.compute as pc


def json_extract_int64(arr: pa.Array | pa.ChunkedArray, key: str) -> pa.Array:
    """Extract an integer field from flat JSON objects, vectorized.

    One RE2 pass over the column; null where the field is absent or
    non-integer. See the module docstring for the flat-object contract.
    """
    # The trailing \s*[,}] pins the value's JSON terminator so a float or
    # exponent value ({"k": 12.5}, {"k": 1e5}) yields null instead of its
    # integer prefix (RE2 has no lookahead; in a flat object an integer
    # value is always followed by optional whitespace then ',' or '}').
    pattern = '"' + re.escape(key) + '"\\s*:\\s*(?P<v>-?\\d+)\\s*[,}]'
    hit = pc.extract_regex(arr, pattern)
    v = pc.struct_field(hit, "v")
    # Null out values that don't fit int64 BEFORE the cast (pc.cast raises
    # on overflow and one oversized row would abort the whole pipeline).
    # For equal-length digit strings lexicographic order == numeric order,
    # so an exact vectorized bound check is: magnitude shorter than 19
    # digits always fits; exactly 19 digits fits iff <= the type's max
    # magnitude (sign-dependent); 20+ digits never fits.
    neg = pc.starts_with(v, "-")
    mag = pc.if_else(neg, pc.utf8_slice_codeunits(v, 1), v)
    ln = pc.utf8_length(mag)
    fits = pc.or_(
        pc.less(ln, 19),
        pc.and_(
            pc.equal(ln, 19),
            pc.if_else(
                neg,
                pc.less_equal(mag, "9223372036854775808"),
                pc.less_equal(mag, "9223372036854775807"),
            ),
        ),
    )
    out = pc.cast(pc.if_else(fits, v, None), pa.int64())
    if isinstance(out, pa.ChunkedArray):
        out = out.combine_chunks()
    return out


def json_extract_scalar(arr: pa.Array | pa.ChunkedArray, key: str) -> pa.Array:
    """Generic (nested-safe) JSON field extraction via stdlib json.

    Returns a string array with JSON-text semantics (matching duckdb's
    `json_extract_string`): strings unquoted, numbers/bools as their JSON
    rendering ("12.5", "true"), JSON null / absent field / non-scalar /
    unparsable row all -> null. Per-row Python — use only off the hot
    path or to validate the fast path.
    """
    vals = []
    for s in arr.to_pylist():
        v = None
        if s is not None:
            try:
                obj = json.loads(s)
                if isinstance(obj, dict) and key in obj:
                    val = obj[key]
                    if val is None or isinstance(val, (dict, list)):
                        v = None
                    elif isinstance(val, str):
                        v = val
                    else:
                        # bools/numbers: JSON rendering, not Python repr
                        # (True -> "true", 12.5 -> "12.5")
                        v = json.dumps(val)
            except (ValueError, RecursionError):
                v = None
        vals.append(v)
    return pa.array(vals, type=pa.string())
