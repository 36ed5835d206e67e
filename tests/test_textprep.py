"""Text-analysis operators: counts, quality, language ID, fingerprints."""

import numpy as np
import pandas as pd
import pytest


@pytest.fixture(scope="module")
def docs_ds(ray_session):
    import ray.data as rd

    rows = [
        {"doc_id": 0, "text": "the quick brown fox jumps over the lazy dog " * 4},
        {"doc_id": 1, "text": "der hund und die katze sind nicht mit dem vogel zu hause"},
        {"doc_id": 2, "text": "le chat est dans la maison et il ne dort pas pour une fois"},
        {"doc_id": 3, "text": "el perro y el gato no son los mismos animales para una casa"},
        {"doc_id": 4, "text": "数据 处理 引擎 正在 运行"},
        {"doc_id": 5, "text": ""},
        {"doc_id": 6, "text": "a b c 1 2 3 !!! ??? ..."},
    ]
    return rd.from_pandas(pd.DataFrame(rows))


def test_token_count(docs_ds):
    from hgcn_name_disambiguation_ray.pipelines.textprep import token_count

    out = token_count(docs_ds).to_pandas().set_index("doc_id")
    assert out.loc[0, "n_ws_tokens"] == 36
    assert out.loc[5, "n_ws_tokens"] == 0
    assert out.loc[6, "n_tokens"] == 3  # only the !!!/???/... runs have len>1
    assert out.loc[6, "n_subwords"] == 15  # 3 letters + 3 digits + 9 punct marks


def test_quality_score(docs_ds):
    from hgcn_name_disambiguation_ray.pipelines.textprep import quality_score

    out = quality_score(docs_ds).to_pandas().set_index("doc_id")
    assert out.loc[5, "quality"] < out.loc[0, "quality"]
    assert out.loc[6, "punct_ratio"] > out.loc[0, "punct_ratio"]
    assert 0.0 <= out["quality"].min() and out["quality"].max() <= 1.0
    assert out.loc[0, "stop_ratio"] > 0.2  # 'the'/'over' hits


def test_language_id(docs_ds):
    from hgcn_name_disambiguation_ray.pipelines.textprep import language_id

    out = language_id(docs_ds).to_pandas().set_index("doc_id")
    assert out.loc[0, "pred_lang"] == "en"
    assert out.loc[1, "pred_lang"] == "de"
    assert out.loc[2, "pred_lang"] == "fr"
    assert out.loc[3, "pred_lang"] == "es"
    assert out.loc[4, "pred_lang"] == "zh"
    assert out.loc[5, "pred_lang"] == "unknown"


def test_fingerprint_stability_and_sensitivity(docs_ds, ray_session):
    import ray.data as rd

    from hgcn_name_disambiguation_ray.pipelines.textprep import fingerprint

    out1 = fingerprint(docs_ds).to_pandas().set_index("doc_id")["fingerprint"]
    out2 = fingerprint(docs_ds).to_pandas().set_index("doc_id")["fingerprint"]
    assert (out1 == out2).all()  # deterministic
    assert out1.loc[5] == 0  # empty doc
    # different docs -> different fingerprints (w.h.p.)
    assert out1.loc[0] != out1.loc[1] != out1.loc[2]
    # a small edit far from winnowing minima usually keeps SOME windows;
    # at minimum the fingerprint is sensitive to a full-text change
    other = rd.from_pandas(pd.DataFrame([{"doc_id": 0, "text": "completely different words entirely"}]))
    alt = fingerprint(other).to_pandas()["fingerprint"].iloc[0]
    assert alt != out1.loc[0]


def test_vocabulary_counts(ray_session):
    import ray.data as rd

    from hgcn_name_disambiguation_ray.pipelines.textprep import vocabulary

    rows = [
        {"doc_id": 0, "text": "alpha beta alpha"},
        {"doc_id": 1, "text": "beta  GAMMA"},
        {"doc_id": 2, "text": ""},
    ]
    out = vocabulary(rd.from_pandas(pd.DataFrame(rows)), min_count=1).to_pandas()
    got = out.set_index("token")[["n_docs", "n_occurrences"]].to_dict("index")
    assert got == {
        "alpha": {"n_docs": 1, "n_occurrences": 2},
        "beta": {"n_docs": 2, "n_occurrences": 2},
        "gamma": {"n_docs": 1, "n_occurrences": 1},
    }
    out2 = vocabulary(rd.from_pandas(pd.DataFrame(rows)), min_count=2).to_pandas()
    assert set(out2["token"]) == {"alpha", "beta"}


def test_pii_scrub(ray_session):
    import ray.data as rd

    from hgcn_name_disambiguation_ray.pipelines.textprep import pii_scrub

    rows = [
        {"doc_id": 0, "text": "mail me at jane.doe+x@corp.example.com now"},
        {"doc_id": 1, "text": "see https://example.com/a?b=1 and http://x.io"},
        {"doc_id": 2, "text": "call +1 555 123 4567 today"},
        {"doc_id": 3, "text": "clean text with no identifiers"},
    ]
    out = pii_scrub(rd.from_pandas(pd.DataFrame(rows))).to_pandas().set_index("doc_id")
    assert "<EMAIL>" in out.loc[0, "text_scrubbed"] and "@" not in out.loc[0, "text_scrubbed"]
    assert out.loc[0, "n_email"] == 1
    assert out.loc[1, "n_url"] == 2 and "https://" not in out.loc[1, "text_scrubbed"]
    assert out.loc[2, "n_phone"] == 1 and "<PHONE>" in out.loc[2, "text_scrubbed"]
    assert out.loc[3, "text_scrubbed"] == rows[3]["text"]
    assert (out.loc[3, ["n_email", "n_url", "n_phone"]] == 0).all()


def test_pack_sequences_greedy_budget(ray_session):
    import ray.data as rd

    from hgcn_name_disambiguation_ray.pipelines.textprep import pack_sequences

    rows = [{"doc_id": i, "n": n} for i, n in enumerate([100, 100, 150, 600, 50, 50])]
    out = pack_sequences(
        rd.from_pandas(pd.DataFrame(rows)), token_col="n", id_col="doc_id",
        budget=250, n_buckets=1,
    ).to_pandas().sort_values("doc_id")
    # greedy by id within the single bucket:
    # [100,100]=200 | [150]=150 (next would be 750) | [600] alone | [50,50]
    seq = out.set_index("doc_id")["seq_idx"]
    assert seq[0] == seq[1]
    assert seq[2] != seq[1]
    assert seq[3] not in (seq[2], seq[4])
    assert seq[4] == seq[5]
    # per-sequence totals never exceed budget unless a single doc does
    m = out.merge(pd.DataFrame(rows), on="doc_id")
    for _, g in m.groupby("seq_idx"):
        assert g["n"].sum() <= 250 or len(g) == 1


def test_compression_ratio_orders_repetitive_below_random(ray_session):
    import ray.data as rd

    from hgcn_name_disambiguation_ray.pipelines.textprep import compression_ratio

    rng = np.random.default_rng(0)
    rows = [
        {"doc_id": 0, "text": "spam " * 200},
        {"doc_id": 1, "text": " ".join(rng.choice([f"w{i}" for i in range(5000)], 200))},
        {"doc_id": 2, "text": ""},
    ]
    out = compression_ratio(rd.from_pandas(pd.DataFrame(rows))).to_pandas().set_index("doc_id")
    assert out.loc[0, "compression_ratio"] < out.loc[1, "compression_ratio"]
    assert out.loc[2, "compression_ratio"] == 1.0
    assert (out["compression_ratio"] > 0).all()


def test_tfidf_top_terms(ray_session):
    import ray.data as rd

    from hgcn_name_disambiguation_ray.pipelines.textprep import tfidf_top_terms

    rows = [
        {"doc_id": 0, "text": "apple apple apple banana common"},
        {"doc_id": 1, "text": "banana banana cherry common"},
        {"doc_id": 2, "text": "common cherry"},
    ]
    out = tfidf_top_terms(rd.from_pandas(pd.DataFrame(rows)), k=2).to_pandas()
    top0 = out[out["doc_id"] == 0].sort_values(["tf", "df", "token"],
                                               ascending=[False, True, True])
    # doc 0: apple tf=3 (rarest), then banana/common tf=1 -> banana (df 2) wins
    assert top0["token"].tolist() == ["apple", "banana"]
    # 'common' is in every doc: idf ln(3/3)=0 -> micro score 0
    assert (out.loc[out["token"] == "common", "tfidf_micro"] == 0).all()
    apple = out[(out["doc_id"] == 0) & (out["token"] == "apple")].iloc[0]
    assert apple["tfidf_micro"] == round(3 * np.log(3 / 1) * 1e6)


def test_repetition_stats(ray_session):
    import ray.data as rd
    from hgcn_name_disambiguation_ray.pipelines.textprep import repetition_stats

    rows = [
        {"doc_id": 0, "text": "spam spam spam spam"},          # 1 distinct / 4
        {"doc_id": 1, "text": "all words here are distinct"},  # 5 / 5
        {"doc_id": 2, "text": ""},                             # empty -> zeros
        {"doc_id": 3, "text": "a a b"},                        # 2 / 3, top 2/3
    ]
    out = repetition_stats(rd.from_pandas(pd.DataFrame(rows))).to_pandas().set_index("doc_id")
    assert out.loc[0, "dup_word_frac_r"] == 0.75 and out.loc[0, "flagged"] == 1
    assert out.loc[0, "top_word_frac_r"] == 1.0
    assert out.loc[1, "dup_word_frac_r"] == 0.0 and out.loc[1, "flagged"] == 0
    assert out.loc[2, "n_words2"] == 0 and out.loc[2, "dup_word_frac_r"] == 0.0
    assert out.loc[3, "dup_word_frac_r"] == round(1 - 2 / 3, 6)
    assert out.loc[3, "top_word_frac_r"] == round(2 / 3, 6)


def test_source_stats_blocklist(ray_session):
    import ray.data as rd
    from hgcn_name_disambiguation_ray.pipelines.textprep import source_stats

    rows = [
        {"doc_id": i, "source": f"src{i % 3}", "n_chars": 10 * (i + 1)}
        for i in range(9)
    ]
    out = source_stats(
        rd.from_pandas(pd.DataFrame(rows)), blocklist={"src1"}
    ).to_pandas().set_index("source")
    assert "src1" not in out.index
    assert out.loc["src0", "n_docs"] == 3
    assert out.loc["src0", "sum_chars"] == 10 * (1 + 4 + 7)
    assert out["n_docs"].dtype == np.int64


def test_length_histogram_buckets(ray_session):
    import ray.data as rd
    from hgcn_name_disambiguation_ray.pipelines.textprep import length_histogram

    rows = [{"doc_id": i, "n_chars": c} for i, c in enumerate([10, 49, 50, 120, 2000])]
    out = length_histogram(rd.from_pandas(pd.DataFrame(rows))).to_pandas()
    got = dict(zip(out["bucket"], out["n_docs"]))
    assert got == {0: 2, 1: 1, 2: 1, 7: 1}  # zero buckets dropped


def test_bigram_counts_boundaries_and_ties(ray_session):
    import ray.data as rd
    from hgcn_name_disambiguation_ray.pipelines.textprep import bigram_counts

    rows = [
        {"doc_id": 0, "text": "x y x y"},   # 'x y' x2, 'y x' x1
        {"doc_id": 1, "text": "Y"},          # no bigram; also must not pair
        {"doc_id": 2, "text": "z x"},        # with doc 0's trailing token
    ]
    out = bigram_counts(rd.from_pandas(pd.DataFrame(rows)), k=2).to_pandas()
    assert list(out.columns) == ["bigram", "n"]
    assert out.iloc[0].tolist() == ["x y", 2]
    # tie between 'y x' and 'z x' at n=1 breaks by text ascending
    assert out.iloc[1].tolist() == ["y x", 1]


def test_char_quantiles_exact_ranks(ray_session):
    import ray.data as rd
    from hgcn_name_disambiguation_ray.pipelines.textprep import char_quantiles

    # n=10, values 1..10: q-quantile = value at rank ceil(q*10)
    rows = [{"doc_id": i, "n_chars": i + 1} for i in range(10)]
    out = char_quantiles(
        rd.from_pandas(pd.DataFrame(rows)), qs=(0.1, 0.25, 0.5, 0.9, 1.0)
    ).to_pandas()
    got = dict(zip(out["q_milli"], out["value"]))
    assert got == {100: 1, 250: 3, 500: 5, 900: 9, 1000: 10}


@pytest.mark.usefixtures("ray_session")
def test_doc_chunks_windows_and_remainder():
    import ray.data as rd

    from hgcn_name_disambiguation_ray.pipelines.textprep import doc_chunks

    words = [f"w{i}" for i in range(57)]
    df = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": [" ".join(words), "short doc", "  "],
        }
    )
    out = (
        doc_chunks(rd.from_pandas(df), chunk_tokens=32, overlap=8)
        .to_pandas()
        .sort_values(["doc_id", "chunk_id"])
        .reset_index(drop=True)
    )
    # 57 tokens, stride 24 -> chunks at 0, 24, 48 (remainder 9)
    d1 = out[out.doc_id == 1]
    assert d1["chunk_id"].tolist() == [0, 1, 2]
    assert d1["n_tokens"].tolist() == [32, 32, 9]
    assert d1.iloc[0]["chunk_text"] == " ".join(words[0:32])
    assert d1.iloc[1]["chunk_text"] == " ".join(words[24:56])
    assert d1.iloc[2]["chunk_text"] == " ".join(words[48:57])
    # short doc -> one whole chunk; whitespace-only doc -> no chunks
    d2 = out[out.doc_id == 2]
    assert d2["chunk_text"].tolist() == ["short doc"]
    assert (out.doc_id == 3).sum() == 0


@pytest.mark.usefixtures("ray_session")
def test_doc_chunks_overlap_reconstruction():
    import ray.data as rd

    from hgcn_name_disambiguation_ray.pipelines.textprep import doc_chunks

    words = [f"t{i}" for i in range(100)]
    df = pd.DataFrame({"doc_id": [7], "text": [" ".join(words)]})
    out = (
        doc_chunks(rd.from_pandas(df), chunk_tokens=16, overlap=4)
        .to_pandas()
        .sort_values("chunk_id")
    )
    # dropping each chunk's first `overlap` tokens (except chunk 0)
    # reconstructs the document exactly
    rebuilt: list[str] = []
    for _, r in out.iterrows():
        toks = r["chunk_text"].split(" ")
        rebuilt.extend(toks if r["chunk_id"] == 0 else toks[4:])
    assert rebuilt == words


@pytest.mark.usefixtures("ray_session")
def test_token_freq_score_ranks_common_above_rare():
    import ray.data as rd

    from hgcn_name_disambiguation_ray.pipelines.textprep import token_freq_score

    df = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "text": [
                "the the the the",          # all common
                "the qzx the qzx",          # half rare
                "qzx wvu qzx wvu",          # all rare
                "   ",                      # no tokens -> dropped
            ],
        }
    )
    out = (
        token_freq_score(rd.from_pandas(df))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert out["doc_id"].tolist() == [1, 2, 3]
    # corpus counts: the=6, qzx=4, wvu=2
    assert out["freq_score_milli"].tolist() == [6000, 5000, 3000]
    assert out["n_tokens"].tolist() == [4, 4, 4]
    assert (
        out.loc[0, "freq_score_milli"]
        > out.loc[1, "freq_score_milli"]
        > out.loc[2, "freq_score_milli"]
    )


def test_gopher_quality_flags(ray_session):
    import ray.data as rd

    from hgcn_name_disambiguation_ray.pipelines.textprep import gopher_quality

    long_good = " ".join(["the", "and"] + ["word"] * 60)       # all flags pass
    short = "the and word"                                      # word count fails
    no_stops = " ".join(["word"] * 60)                          # stop flag fails
    longwords = " ".join(["the", "and"] + ["x" * 20] * 60)      # word len fails
    numeric = " ".join(["the", "and"] + ["12345"] * 60)         # alpha fails
    rows = [
        {"doc_id": 0, "text": long_good},
        {"doc_id": 1, "text": short},
        {"doc_id": 2, "text": no_stops},
        {"doc_id": 3, "text": longwords},
        {"doc_id": 4, "text": numeric},
        {"doc_id": 5, "text": ""},
    ]
    out = (
        gopher_quality(rd.from_pandas(pd.DataFrame(rows)))
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert out.loc[0, "gopher_pass"] == 1
    assert (
        out.loc[0, ["flag_word_count", "flag_word_len", "flag_alpha", "flag_stop"]]
        == 1
    ).all()
    assert out.loc[1, "flag_word_count"] == 0 and out.loc[1, "gopher_pass"] == 0
    assert out.loc[2, "flag_stop"] == 0 and out.loc[2, "flag_word_count"] == 1
    assert out.loc[3, "flag_word_len"] == 0
    assert out.loc[4, "flag_alpha"] == 0  # digit words: mean len 5 still passes word_len
    # empty doc: every flag 0, still emits a row
    assert (out.loc[5] == 0).all()
    assert set(out.dtypes.astype(str)) == {"int64"}
