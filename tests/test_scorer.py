"""BlockScorer conformance + determinism on fixture blocks (no Ray needed)."""

import numpy as np
import pandas as pd
import pyarrow as pa

from hgcn_name_disambiguation_ray.config import LinkageConfig
from hgcn_name_disambiguation_ray.fixtures import FixtureSpec, generate_fixture
from hgcn_name_disambiguation_ray.functions.text import normalized_name_key, tokenize_batch
from hgcn_name_disambiguation_ray.stages.extract import extract_batch
from hgcn_name_disambiguation_ray.stages.scorer import BlockScorer, build_block_graphs


def _mentions_df(spec: FixtureSpec) -> pd.DataFrame:
    tabs = generate_fixture(spec)
    ext = tokenize_batch(extract_batch(tabs["pages"]), text_col="title")
    ext = ext.append_column("block_key", normalized_name_key(ext["name"]))
    df = ext.to_pandas()
    truth = tabs["truth"].to_pandas()[["mention_id", "person_id"]]
    return df.merge(truth, on="mention_id")


def _pairwise_f1(true_l, pred_l):
    TP = PP = AP = 0
    n = len(true_l)
    for i in range(n):
        for j in range(i + 1, n):
            st = true_l[i] == true_l[j]
            sp = pred_l[i] == pred_l[j]
            TP += st and sp
            PP += sp
            AP += st
    if TP == 0:
        return 0.0
    p, r = TP / PP, TP / AP
    return 2 * p * r / (p + r)


def _score(df: pd.DataFrame, scorer: BlockScorer) -> pd.DataFrame:
    tbl = pa.Table.from_pandas(
        df[["block_key", "mention_id", "coentities", "tokens", "tokens_stemmed", "host"]],
        preserve_index=False,
    )
    return scorer(tbl).to_pandas()


def test_build_block_graphs_semantics():
    layers = build_block_graphs(
        coentities=[["a", "b"], ["b", "c"], ["x"]],
        tokens_stemmed=[["t1", "t2", "t3"], ["t2", "t3"], ["t3"]],
        hosts=["v1", "v1", "v2"],
    )
    wa, wt, wv, comb = layers
    assert wa[0, 1] == 1.0 and wa[0, 2] == 0.0       # shared 'b'
    assert wt[0, 1] == 2.0 and wt[0, 2] == 0.0       # ∩>=2 rule drops 1-token overlap
    assert wv[0, 1] == 1.0 and wv[1, 2] == 0.0
    assert comb[0, 1] == 4.0
    assert (np.diag(comb) == 0).all()


def test_scorer_perfect_on_separable_fixture():
    df = _mentions_df(FixtureSpec(n_names=2, persons_per_name=3, docs_per_person=10))
    scorer = BlockScorer(LinkageConfig())
    f1s = []
    for _, g in df.groupby("block_key"):
        g = g.reset_index(drop=True)
        out = _score(g, scorer).merge(g[["mention_id", "person_id"]], on="mention_id")
        f1s.append(_pairwise_f1(out["person_id"].tolist(), out["cluster_id"].tolist()))
    assert np.mean(f1s) >= 0.99, f1s


def test_scorer_deterministic():
    df = _mentions_df(FixtureSpec(n_names=1, persons_per_name=3, docs_per_person=6))
    g = df.reset_index(drop=True)
    out1 = _score(g, BlockScorer(LinkageConfig()))
    out2 = _score(g.sample(frac=1.0, random_state=1), BlockScorer(LinkageConfig()))
    m1 = out1.sort_values("mention_id").reset_index(drop=True)
    m2 = out2.sort_values("mention_id").reset_index(drop=True)
    # identical clustering regardless of input row order
    assert (m1["cluster_id"] == m2["cluster_id"]).all()


def test_scorer_singleton_and_empty():
    scorer = BlockScorer(LinkageConfig())
    labels = scorer.score_block("k", 0, ["m1"], [[]], [[]], [[]], ["h"])
    assert labels.tolist() == [0]
    tbl = pa.table(
        {
            "block_key": pa.array([], type=pa.string()),
            "mention_id": pa.array([], type=pa.string()),
            "coentities": pa.array([], type=pa.list_(pa.string())),
            "tokens": pa.array([], type=pa.list_(pa.string())),
            "tokens_stemmed": pa.array([], type=pa.list_(pa.string())),
            "host": pa.array([], type=pa.string()),
        }
    )
    assert scorer(tbl).num_rows == 0


def test_scorer_isolated_mentions_get_own_clusters():
    # mentions with no shared signal at all -> no edges -> each its own cluster
    scorer = BlockScorer(LinkageConfig())
    labels = scorer.score_block(
        "k", 0,
        ["m1", "m2", "m3"],
        [["a1"], ["b1"], ["c1"]],
        [["t1", "t2"], ["u1", "u2"], ["v1", "v2"]],
        [["t1"], ["u1"], ["v1"]],
        ["h1", "h2", "h3"],
    )
    assert len(set(labels.tolist())) == 3


def test_embedder_word2vec_pluggable(tmp_path):
    """ST1 extension surface: a word2vec text-format model file loads once
    per embedder; in-vocab tokens use it, OOV falls back to zeros (the
    reference's standard-mode fallback, name_disambiguation.py:1150)."""
    import numpy as np

    from hgcn_name_disambiguation_ray.state.embedder import HashEmbedder

    p = tmp_path / "w2v.txt"
    p.write_text("2 3\ngraph 1.0 2.0 3.0\nmodel 0.5 0.5 0.5\n")
    emb = HashEmbedder(model_path=str(p))
    assert emb.dim == 3
    np.testing.assert_allclose(emb.token_vector("graph"), [1.0, 2.0, 3.0])
    np.testing.assert_allclose(emb.token_vector("unseen"), [0.0, 0.0, 0.0])
    np.testing.assert_allclose(emb.mean_vector(["graph", "model"]), [0.75, 1.25, 1.75])
    # default path unchanged: deterministic hash projection
    d = HashEmbedder(dim=4, seed=1)
    np.testing.assert_allclose(d.token_vector("x"), d.token_vector("x"))
    assert d.token_vector("x").shape == (4,)
