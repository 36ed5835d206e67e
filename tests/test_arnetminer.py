"""Real-data conformance: the reference's 110 labeled Arnetminer names.

The reference repo ships its evaluation corpus (`/root/reference/raw-data/
*.xml`, ~9k labeled publications) and committed cluster artifacts
(`experimental-results/*_output.txt` + `*_ans.txt`, which score macro
pairwise F1 = 0.892 against the XML labels). The engine ingests the SAME
corpus through the XML->pages shim and the untouched production pipeline;
this test pins the measured quality floor so regressions in blocking /
graph construction / GHAC are caught on real data, not just fixtures.
"""

import os

import pytest

RAW = "/root/reference/raw-data"


@pytest.mark.skipif(not os.path.isdir(RAW), reason="reference corpus not present")
def test_arnetminer_macro_f1_floor(ray_session):
    import ray.data as rd

    from hgcn_name_disambiguation_ray.config import LinkageConfig
    from hgcn_name_disambiguation_ray.pipelines.linkage import (
        clusters_with_truth,
        run_linkage,
    )
    from hgcn_name_disambiguation_ray.sources.arnetminer import arnetminer_tables
    from hgcn_name_disambiguation_ray.stages.evaluate import pairwise_scores

    pages, truth = arnetminer_tables(RAW)
    assert pages.num_rows > 8000  # 110 names, ~9k labeled publications
    clusters = run_linkage(rd.from_arrow(pages), LinkageConfig())
    scores = pairwise_scores(clusters_with_truth(clusters, truth))
    macro = scores[scores["block_key"] == "__macro__"].iloc[0]
    # measured 2026-08: P 0.818 / R 0.585 / F1 0.609 with the faithful
    # current-reference-code GHAC semantics (graph-masked similarity,
    # component-bounded auto-k, sim-graph modularity). The committed
    # reference artifacts (different GHAC regime + external word2vec
    # model, missing from the reference repo) score 0.892 — documented in
    # BASELINE.md. Floors sit under the measured values to catch real
    # regressions without pinning noise.
    assert macro["precision"] >= 0.75, macro
    assert macro["recall"] >= 0.50, macro
    assert macro["f1"] >= 0.55, macro
    # per-name coverage: every one of the 110 names must be scored
    assert len(scores) == 111  # 110 names + __macro__


@pytest.mark.skipif(not os.path.isdir(RAW), reason="reference corpus not present")
def test_arnetminer_artifact_regime_floor(ray_session, tmp_path):
    """The artifact regime (run_linkage_artifact: in-engine PPMI-SVD word
    vectors + unmasked cross-component ghac_hybrid) must beat the
    faithful default by a wide margin — it re-creates the regime behind
    the reference's committed artifacts (0.892 with an external model the
    reference repo doesn't ship). Measured 2026-08 round 4: macro F1
    0.7833 (venue tokens in the training corpus + title vector, refit
    adaptive cut); the floor sits just under it to catch regressions,
    far above the faithful path's 0.609. The pipeline is fully seeded, so
    the margin only needs to absorb environment drift, not randomness."""
    import ray.data as rd

    from hgcn_name_disambiguation_ray.pipelines.linkage import (
        clusters_with_truth,
        run_linkage_artifact,
    )
    from hgcn_name_disambiguation_ray.sources.arnetminer import arnetminer_tables
    from hgcn_name_disambiguation_ray.stages.evaluate import pairwise_scores

    pages, truth = arnetminer_tables(RAW)
    clusters = run_linkage_artifact(
        rd.from_arrow(pages), model_path=str(tmp_path / "w2v.txt")
    )
    scores = pairwise_scores(clusters_with_truth(clusters, truth))
    macro = scores[scores["block_key"] == "__macro__"].iloc[0]
    assert macro["f1"] >= 0.78, macro
    assert len(scores) == 111
