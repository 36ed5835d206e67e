"""JSON scalar extraction: fast-path/generic parity, contract edges, and
the json_props_stats query vs a duckdb oracle at sf0.001."""

import duckdb
import pandas as pd
import pyarrow as pa
import pytest

from hgcn_name_disambiguation_ray.functions.jsonx import (
    json_extract_int64,
    json_extract_scalar,
)

SF = "/root/testdata/sf0.001"


def test_fast_path_matches_generic_on_flat_objects():
    rows = [
        '{"k": 69}',
        '{"k": 0}',
        '{"k": -3, "other": "x"}',
        '{"a": 1, "k": 42}',
        '{"k":7}',
        '{ "k" : 12 }',
        '{"other": 1}',       # absent -> null
        "not json at all",    # unparsable -> null on both paths
        None,                 # null in -> null out
        '{"k": "text"}',      # non-integer -> null on the fast path
        '{"k": 12.5}',        # float -> null, NOT the integer prefix 12
        '{"k": 1e5}',         # exponent -> null, NOT 1
        '{"k": 69 }',         # whitespace before the terminator still matches
    ]
    arr = pa.array(rows, type=pa.string())
    fast = json_extract_int64(arr, "k").to_pylist()
    slow = json_extract_scalar(arr, "k").to_pylist()
    assert fast == [69, 0, -3, 42, 7, 12, None, None, None, None, None, None, 69]
    # generic path agrees wherever the fast contract holds (integer fields)
    for f, s in zip(fast[:7], slow[:7]):
        assert (f is None and s is None) or str(f) == s
    # generic path additionally surfaces the non-integer scalars
    assert slow[9] == "text"
    assert slow[10] == "12.5"


def test_fast_path_contract_divergence_is_the_documented_one():
    # Outside the flat-object contract (nested object shares the key) the
    # regex takes the FIRST occurrence while the generic path is top-level.
    arr = pa.array(['{"a": {"k": 5}, "k": 6}'])
    assert json_extract_int64(arr, "k").to_pylist() == [5]
    assert json_extract_scalar(arr, "k").to_pylist() == ["6"]


def test_int64_bounds_null_instead_of_crash():
    # One oversized row must yield null, not abort the pipeline with an
    # ArrowInvalid cast error; the exact int64 bounds still fit.
    rows = [
        '{"k": 9223372036854775807}',   # int64 max -> fits
        '{"k": -9223372036854775808}',  # int64 min -> fits
        '{"k": 9223372036854775808}',   # max+1 -> null
        '{"k": -9223372036854775809}',  # min-1 -> null
        '{"k": 99999999999999999999}',  # 20 digits -> null
        '{"k": 69}',
    ]
    got = json_extract_int64(pa.array(rows), "k").to_pylist()
    assert got == [9223372036854775807, -9223372036854775808, None, None, None, 69]


def test_scalar_path_uses_json_rendering_not_python_repr():
    # JSON null -> null (not "None"); bools -> "true"/"false" (not
    # "True"/"False"); string values pass through unquoted — matching
    # duckdb json_extract_string semantics.
    rows = ['{"k": null}', '{"k": true}', '{"k": false}', '{"k": 12.5}', '{"k": "None"}']
    got = json_extract_scalar(pa.array(rows), "k").to_pylist()
    assert got == [None, "true", "false", "12.5", "None"]


def test_key_is_regex_escaped():
    arr = pa.array(['{"a.b": 9, "axb": 1}'])
    assert json_extract_int64(arr, "a.b").to_pylist() == [9]


def test_chunked_input_combines():
    ca = pa.chunked_array([pa.array(['{"k": 1}']), pa.array(['{"k": 2}'])])
    assert json_extract_int64(ca, "k").to_pylist() == [1, 2]


@pytest.mark.usefixtures("ray_session")
def test_json_props_stats_matches_duckdb_oracle():
    import __ray_entry__ as entry

    got = (
        entry.queries()["json_props_stats"](SF)
        .to_pandas()
        .sort_values("event_type")
        .reset_index(drop=True)
    )
    want = (
        duckdb.sql(
            entry.oracle_sql()["json_props_stats"].replace(
                "FROM events", f"FROM '{SF}/events.parquet'"
            )
        )
        .df()
        .sort_values("event_type")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], want[sorted(want.columns)], check_dtype=True
    )
