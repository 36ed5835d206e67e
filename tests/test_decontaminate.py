"""Benchmark decontamination: n-gram overlap vs a broadcast eval set."""

import numpy as np
import pandas as pd
import pytest


@pytest.mark.usefixtures("ray_session")
def test_decontaminate_flags_planted_overlap():
    import ray.data as rd

    from hgcn_name_disambiguation_ray.stages.decontam import decontaminate

    bench = pd.DataFrame(
        {"doc_id": [0], "text": ["the secret eval answer is forty two exactly"]}
    )
    corpus = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "text": [
                # contains the benchmark 3-gram "secret eval answer"
                "my doc leaks the secret eval answer somewhere inside",
                # shares words but never 3 consecutive benchmark tokens
                "answer secret eval scrambled words two forty",
                "completely unrelated text about ray data pipelines",
                "",  # empty doc: zero shingles, never contaminated
            ],
        }
    )
    out = (
        decontaminate(rd.from_pandas(corpus), rd.from_pandas(bench), n=3)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert out["contaminated"].tolist() == [1, 0, 0, 0]
    assert out["overlap_ngrams"].dtype == np.int64
    # doc 1 overlaps on "the secret eval", "secret eval answer"
    assert out.loc[0, "overlap_ngrams"] == 2


@pytest.mark.usefixtures("ray_session")
def test_decontaminate_short_doc_whole_shingle_and_case():
    import ray.data as rd

    from hgcn_name_disambiguation_ray.stages.decontam import decontaminate

    # benchmark doc shorter than n -> one whole-doc shingle; matching is
    # case-insensitive (tokenizer lowers)
    bench = pd.DataFrame({"doc_id": [0], "text": ["Tiny Doc"]})
    corpus = pd.DataFrame(
        {"doc_id": [1, 2], "text": ["tiny doc", "tiny doc padded longer here"]}
    )
    out = (
        decontaminate(rd.from_pandas(corpus), rd.from_pandas(bench), n=3)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    # doc 1 IS the whole-doc shingle; doc 2's 3-gram "tiny doc padded"
    # is a different shingle than the benchmark's 2-token whole doc
    assert out["contaminated"].tolist() == [1, 0]
