"""Porter stemmer vs published algorithm examples (Porter 1980)."""

from hgcn_name_disambiguation_ray.functions.stemmer import stem, stem_array

import numpy as np

KNOWN = {
    "caresses": "caress", "ponies": "poni", "ties": "ti", "caress": "caress",
    "cats": "cat", "feed": "feed", "agreed": "agre", "plastered": "plaster",
    "motoring": "motor", "sing": "sing", "conflated": "conflat", "sized": "size",
    "hopping": "hop", "tanned": "tan", "falling": "fall", "hissing": "hiss",
    "failing": "fail", "filing": "file", "happy": "happi", "sky": "sky",
    "relational": "relat", "conditional": "condit", "rational": "ration",
    "digitizer": "digit", "conformabli": "conform", "radicalli": "radic",
    "differentli": "differ", "vileli": "vile", "analogousli": "analog",
    "vietnamization": "vietnam", "predication": "predic", "operator": "oper",
    "feudalism": "feudal", "decisiveness": "decis", "hopefulness": "hope",
    "callousness": "callous", "formaliti": "formal", "sensitiviti": "sensit",
    "sensibiliti": "sensibl", "triplicate": "triplic", "formative": "form",
    "formalize": "formal", "electriciti": "electr", "electrical": "electr",
    "hopeful": "hope", "goodness": "good", "revival": "reviv",
    "allowance": "allow", "inference": "infer", "airliner": "airlin",
    "gyroscopic": "gyroscop", "adjustable": "adjust", "defensible": "defens",
    "irritant": "irrit", "replacement": "replac", "adjustment": "adjust",
    "dependent": "depend", "adoption": "adopt", "communism": "commun",
    "activate": "activ", "angulariti": "angular", "homologous": "homolog",
    "effective": "effect", "bowdlerize": "bowdler", "probate": "probat",
    "rate": "rate", "cease": "ceas", "controll": "control", "roll": "roll",
}


def test_known_pairs():
    for w, expected in KNOWN.items():
        assert stem(w) == expected, w


def test_short_words_unchanged():
    for w in ("a", "ab", "of", "in"):
        assert stem(w) == w


def test_stoplist_self_consistency():
    # the reference stems its stoplist with the same stemmer it applies to
    # tokens (name_disambiguation.py:275) — consistency is the contract
    from hgcn_name_disambiguation_ray.config import STOPWORDS_RAW
    from hgcn_name_disambiguation_ray.functions.text import STOPWORDS_STEMMED

    assert {stem(w) for w in STOPWORDS_RAW} == set(STOPWORDS_STEMMED)


def test_stem_array_matches_scalar():
    toks = np.array(["running", "runs", "runner", "running"], dtype=object)
    out = stem_array(toks)
    assert list(out) == [stem(t) for t in toks]
