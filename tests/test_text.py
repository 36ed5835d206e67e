"""Normalizer/tokenizer semantics vs the reference contract (M2/M3)."""

import pyarrow as pa

from hgcn_name_disambiguation_ray.functions.text import (
    normalize_strings,
    normalized_name_key,
    tokenize_column,
)


def test_punctuation_class_and_lowercase():
    col = pa.array(["A,B.C—D～E_F!G", "Tab\there"])
    out = normalize_strings(col).to_pylist()
    assert out[0] == "a b c d e f g"
    assert out[1] == "tab here"


def test_token_length_filter_and_stemming():
    # reference: split on single space, keep len>1 raw, stem + stoplist for p_t
    col = pa.array(["A Fast Method for Graphs using the model", ""])
    tokens, stemmed = tokenize_column(col)
    assert tokens.to_pylist()[0] == ["fast", "method", "for", "graphs", "using", "the", "model"]
    # 'method'/'model' are stoplisted stems; for/using/the stoplisted; graphs->graph
    assert stemmed.to_pylist()[0] == ["fast", "graph"]
    assert tokens.to_pylist()[1] == []
    assert stemmed.to_pylist()[1] == []


def test_multi_space_runs_produce_no_tokens():
    col = pa.array(["a  b   cc", "x--y"])
    tokens, _ = tokenize_column(col)
    assert tokens.to_pylist() == [["cc"], []]


def test_nulls_tokenize_empty():
    col = pa.array([None, "real title here"], type=pa.string())
    tokens, stemmed = tokenize_column(col)
    assert tokens.to_pylist()[0] == []
    assert stemmed.to_pylist()[0] == []


def test_golden_reference_style_title():
    # mirrors the reference normalizer on a punctuation-heavy title
    col = pa.array(["Name-Disambiguation: via Graphs, Walks & Embeddings (v2)!"])
    tokens, stemmed = tokenize_column(col)
    assert tokens.to_pylist()[0] == [
        "name", "disambiguation", "via", "graphs", "walks", "embeddings", "v2",
    ]
    assert stemmed.to_pylist()[0] == [
        "name", "disambigu", "via", "graph", "walk", "embed", "v2",
    ]


def test_normalized_name_key():
    names = pa.array(["Terry Fry", "TERRY FRY", "Terry J. Fry", "Fry", "  "])
    keys = normalized_name_key(names).to_pylist()
    assert keys[0] == keys[1] == keys[2] == "terry fry"
    assert keys[3] == "fry"


def test_normalized_name_key_edge_whitespace():
    # leading/trailing/repeated whitespace must not produce empty parts
    # (the M1 semantics and the blocking_keys oracle filter length>0 parts)
    names = pa.array([" smith", "john ", "  anna   maria  lee ", "\tbob\tray\t", None])
    keys = normalized_name_key(names).to_pylist()
    assert keys == ["smith", "john", "anna lee", "bob ray", ""]
