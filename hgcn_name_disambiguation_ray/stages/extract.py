"""Stateless extract stage: html (binary) -> text (string) + mention fields.

The text contract is the per-row invariant from BASELINE.json's
`input_hint`: **byte-identical extracted text per url**. The rules are a
deterministic composition of the reference's text hygiene:

  * entity unescape is the exact inverse of the reference XML writer's
    escape (`openAlex_to_HGCN.py:205-218`);
  * control characters < 0x20 are dropped except ``\\t \\n \\r`` (same
    rule as the reference writer);
  * block-level tag boundaries become newlines, all other tags vanish,
    whitespace runs collapse, lines are stripped, empty lines dropped.

Everything is computed with regexes compiled once per worker process;
the stage is a plain function (stateless Ray tasks), zero-copy Arrow in.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

_SCRIPT_RE = re.compile(rb"(?is)<(script|style)\b.*?</\1>")
_BLOCK_TAG_RE = re.compile(
    rb"(?i)</?(?:p|div|h[1-6]|title|li|ul|ol|tr|table|br|head|body|html|section|article)\b[^>]*>"
)
_ANY_TAG_RE = re.compile(rb"<[^>]*>")
_WS_RUN_RE = re.compile(rb"[ \t]+")
_CTRL_RE = re.compile(rb"[\x00-\x08\x0b\x0c\x0e-\x1f]")

_ENTITIES = (
    (b"&lt;", b"<"),
    (b"&gt;", b">"),
    (b"&quot;", b'"'),
    (b"&apos;", b"'"),
    (b"&amp;", b"&"),  # last, so &amp;lt; round-trips as the writer produced it
)


def extract_text_bytes(html: bytes) -> str:
    """The byte-identical text contract. Pure function of the html bytes."""
    s = _SCRIPT_RE.sub(b"", html)
    s = _BLOCK_TAG_RE.sub(b"\n", s)
    s = _ANY_TAG_RE.sub(b"", s)
    for ent, ch in _ENTITIES:
        s = s.replace(ent, ch)
    s = _CTRL_RE.sub(b"", s)
    s = _WS_RUN_RE.sub(b" ", s)
    lines = [ln.strip() for ln in s.split(b"\n")]
    return b"\n".join(ln for ln in lines if ln).decode("utf-8", errors="replace")


# mention-field extraction (the structured analogue of the reference's
# XML <publication> parse, `name_disambiguation.py:818-848`)
_MID_RE = re.compile(r'<meta name="mention-id" content="([^"]*)"')
_TITLE_RE = re.compile(r"(?s)<h1>(.*?)</h1>")
_AUTHOR_RE = re.compile(r'<span class="author">(.*?)</span>')
_VENUE_RE = re.compile(r'<span class="venue">(.*?)</span>')
_YEAR_RE = re.compile(r'<span class="year">(\d+)</span>')


def _unescape(s: str) -> str:
    for ent, ch in _ENTITIES:
        s = s.replace(ent.decode(), ch.decode())
    return s


def extract_batch(batch: pa.Table) -> pa.Table:
    """map_batches body: pages(url, warc_ts, html, lang) -> extracted rows.

    Emits url, text, mention_id, name (first author = the page's subject
    entity), coentities (remaining authors), host (venue), year, title.
    The html column is dropped immediately so downstream shuffles never
    move the heavy binary payload (SURVEY.md §7 "wide rows").
    """
    htmls = batch["html"].to_pylist()
    urls = batch["url"]
    n = len(htmls)
    texts: list[str] = [""] * n
    mids: list[str] = [""] * n
    names: list[str] = [""] * n
    titles: list[str] = [""] * n
    hosts: list[str] = [""] * n
    years = np.zeros(n, dtype=np.int32)
    coents: list[list[str]] = [[] for _ in range(n)]
    for i, hb in enumerate(htmls):
        # null html (fetch failures are routine at crawl scale) -> no text
        if hb is None:
            hb = b""
        texts[i] = extract_text_bytes(hb)
        h = hb.decode("utf-8", errors="replace")
        m = _MID_RE.search(h)
        mids[i] = m.group(1) if m else ""
        t = _TITLE_RE.search(h)
        titles[i] = _unescape(t.group(1)) if t else ""
        authors = [_unescape(a) for a in _AUTHOR_RE.findall(h)]
        names[i] = authors[0] if authors else ""
        coents[i] = authors[1:]
        v = _VENUE_RE.search(h)
        hosts[i] = _unescape(v.group(1)) if v else ""
        y = _YEAR_RE.search(h)
        # bound before the int32 store: an absurd "year" on a malformed
        # page must clamp to the 0 sentinel, not wrap (numpy 1.x) or
        # raise OverflowError (numpy 2.x)
        yv = int(y.group(1)) if y else 0
        years[i] = yv if 0 <= yv <= 9999 else 0
    return pa.table(
        {
            "url": urls,
            "text": pa.array(texts, type=pa.string()),
            "mention_id": pa.array(mids, type=pa.string()),
            "name": pa.array(names, type=pa.string()),
            "title": pa.array(titles, type=pa.string()),
            "coentities": pa.array(coents, type=pa.list_(pa.string())),
            "host": pa.array(hosts, type=pa.string()),
            "year": pa.array(years, type=pa.int32()),
        }
    )
