"""Byte-identical text extraction contract (BASELINE.json input_hint)."""

import pytest

from hgcn_name_disambiguation_ray.fixtures import FixtureSpec, generate_fixture
from hgcn_name_disambiguation_ray.stages.extract import extract_batch, extract_text_bytes


def test_golden_bytes():
    # golden anchors: the contract may not drift even if the fixture
    # generator and extractor are changed together
    html = (
        b'<html><head><meta name="mention-id" content="W1"/>'
        b"<title>Graph &amp; Walks</title></head><body>"
        b"<h1>Graph &amp; Walks</h1>"
        b'<div class="authors"><span class="author">Ada One</span>'
        b'<span class="author">Bob Two</span></div>'
        b'<p class="venue"><span class="venue">journal of x</span>'
        b' <span class="year">2019</span></p>'
        b'<div class="content">body   text\x07here</div></body></html>'
    )
    assert extract_text_bytes(html) == (
        "Graph & Walks\nGraph & Walks\nAda OneBob Two\njournal of x 2019\nbody texthere"
    )


def test_entities_and_controls():
    assert extract_text_bytes(b"<p>&lt;tag&gt; &quot;q&quot; &apos;a&apos; &amp;amp;</p>") == (
        "<tag> \"q\" 'a' &amp;"
    )
    assert extract_text_bytes(b"<p>a\x00b\x1fc</p>") == "abc"
    assert extract_text_bytes(b"<script>var x=1;</script><p>kept</p>") == "kept"


def test_fixture_pages_satisfy_invariant():
    tabs = generate_fixture(FixtureSpec(n_names=2, persons_per_name=2, docs_per_person=5))
    pages = tabs["pages"]
    for row in pages.to_pylist():
        assert extract_text_bytes(row["html"]) == row["text"], row["url"]


def test_extract_batch_fields():
    tabs = generate_fixture(FixtureSpec(n_names=2, persons_per_name=2, docs_per_person=5))
    out = extract_batch(tabs["pages"])
    rows = out.to_pylist()
    assert out.num_rows == tabs["pages"].num_rows
    assert "html" not in out.column_names  # heavy column dropped at extract
    for r in rows:
        assert r["mention_id"].startswith("W")
        assert r["name"]
        assert isinstance(r["coentities"], list)
        assert r["year"] >= 2000
    # one planted empty-title and one planted no-coentity row exist
    assert any(r["title"] == "" for r in rows)
    assert any(r["coentities"] == [] for r in rows)


@pytest.mark.usefixtures("ray_session")
def test_null_and_empty_fields_dont_crash():
    """Nulls in every nullable pages column flow through extract ->
    tokenize -> linkage without raising; rows with no usable mention are
    dropped, valid rows survive."""
    import pyarrow as pa
    import ray.data as rd

    from hgcn_name_disambiguation_ray.config import LinkageConfig
    from hgcn_name_disambiguation_ray.pipelines.linkage import run_linkage

    good_html = (
        b"<html><head><title>entity page</title></head><body>"
        b"<h1>Veva Sega</h1><p class='title'>deep learning of tokens</p>"
        b"<p class='coauthors'>Alice One; Bob Two</p></body></html>"
    )
    pages = pa.table(
        {
            "url": ["https://a.example/1", "https://b.example/2", "https://c.example/3"],
            "warc_ts": pa.array([None, None, None], type=pa.timestamp("us")),
            "html": pa.array([good_html, None, b""], type=pa.binary()),
            "text": pa.array([None, None, None], type=pa.string()),
            "lang": pa.array(["en", None, "en"], type=pa.string()),
        }
    )
    out = run_linkage(rd.from_arrow(pages), LinkageConfig()).to_pandas()
    assert len(out) <= 1  # null/empty html rows dropped, no crash
