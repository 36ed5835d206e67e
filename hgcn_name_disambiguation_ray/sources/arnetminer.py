"""Arnetminer person-XML -> pages shim (real-data conformance source).

The reference ships 110 labeled person files (`/root/reference/raw-data/
*.xml`, 7,529 publications; format parsed at
`name_disambiguation.py:818-848`: one <person> with FullName and repeated
<publication> carrying title/year/authors/jconf/id/label). This shim
renders each publication as a synthetic web page in the engine's pages
schema (url, warc_ts, html, text, lang) using the SAME html layout the
fixture generator emits, so `extract_batch` round-trips the mention
fields and the whole real corpus flows through the untouched production
pipeline. Ground truth (label per publication) lands in a truth table
(mention_id, person_id, full_name) for pairwise scoring
(full_name is the raw surface name, NOT the normalized block key —
join on mention_id).

The XML content is data, never code: parsed with ElementTree, text
fields escaped before templating.
"""

from __future__ import annotations

import os
import xml.etree.ElementTree as ET

import pyarrow as pa

from hgcn_name_disambiguation_ray.stages.extract import extract_text_bytes

_BASE_TS = 1_704_067_200_000_000  # 2024-01-01 in us


def _escape(s: str) -> str:
    return (
        s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
        .replace('"', "&quot;").replace("'", "&apos;")
    )


def _page_html(mid: str, title: str, authors: list[str], venue: str, year: int) -> bytes:
    authors_html = "".join(f'<span class="author">{_escape(a)}</span>' for a in authors)
    return (
        f'<html><head><meta name="mention-id" content="{mid}"/>'
        f"<title>{_escape(title)}</title></head><body>"
        f"<h1>{_escape(title)}</h1>"
        f'<div class="authors">{authors_html}</div>'
        f'<p class="venue"><span class="venue">{_escape(venue)}</span>'
        f' <span class="year">{year}</span></p>'
        f"</body></html>"
    ).encode("utf-8")


def arnetminer_tables(xml_dir: str) -> tuple[pa.Table, pa.Table]:
    """Parse every person XML under `xml_dir` -> (pages, truth) tables."""
    urls, tss, htmls, texts, langs = [], [], [], [], []
    t_mid, t_person, t_name = [], [], []
    row = 0
    for fname in sorted(os.listdir(xml_dir)):
        if not fname.endswith(".xml"):
            continue
        with open(os.path.join(xml_dir, fname), encoding="utf-8") as f:
            content = f.read()
        # the reference strips every '&' to a space before parsing
        # (undefined HTML entities in the corpus; name_disambiguation.py:802)
        try:
            root = ET.fromstring(content.replace("&", " "))
        except ET.ParseError:
            continue  # mirror the reference's skip-on-parse-error
        full_name = (root.findtext("FullName") or "").strip()
        person_id = (root.findtext("personID") or full_name).strip()
        if not full_name:
            continue
        slug = full_name.lower().replace(" ", "-")
        seen_pids: set[str] = set()
        for pub in root.iter("publication"):
            title = (pub.findtext("title") or "").strip()
            year_s = (pub.findtext("year") or "").strip()
            year = int(year_s) if year_s.isdigit() else 0
            venue = (pub.findtext("jconf") or "").strip()
            pid = (pub.findtext("id") or "").strip()
            label = (pub.findtext("label") or "").strip()
            if not pid or not label or not title:
                # reference parity: name_disambiguation.py skips a
                # publication whose title element is missing/empty, and
                # unlabeled/malformed ones carry no signal
                continue
            try:
                int(label)
            except ValueError:
                continue  # reference skips non-integer labels
            while pid in seen_pids:  # reference's duplicate-pid rule (:831)
                pid = pid + "1"
            seen_pids.add(pid)
            authors_raw = [a.strip() for a in (pub.findtext("authors") or "").split(",")]
            authors = [a for a in authors_raw if a]
            # the page's subject entity is the file's FullName; coentities
            # are the remaining authors (dedup the subject occurrence)
            rest = [a for a in authors if a.lower() != full_name.lower()]
            mid = f"am{person_id}x{pid}"
            html = _page_html(mid, title, [full_name] + rest, venue, year)
            url = f"https://arnetminer.test/{slug}/{mid}"
            urls.append(url)
            tss.append(_BASE_TS + row * 60_000_000)
            htmls.append(html)
            texts.append(extract_text_bytes(html))
            langs.append("en")
            t_mid.append(mid)
            t_person.append(f"{full_name}#{label}")
            t_name.append(full_name)
            row += 1
    pages = pa.table(
        {
            "url": pa.array(urls, type=pa.string()),
            "warc_ts": pa.array(tss, type=pa.timestamp("us")),
            "html": pa.array(htmls, type=pa.binary()),
            "text": pa.array(texts, type=pa.string()),
            "lang": pa.array(langs, type=pa.string()),
        }
    )
    truth = pa.table(
        {
            "mention_id": pa.array(t_mid, type=pa.string()),
            "person_id": pa.array(t_person, type=pa.string()),
            "full_name": pa.array(t_name, type=pa.string()),
        }
    )
    return pages, truth
