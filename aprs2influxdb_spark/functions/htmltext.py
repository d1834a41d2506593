"""HTML → text extraction, pure stdlib — the step every crawl
pipeline runs between WARC ingest and text curation (round 7; the
production tools are trafilatura/readability, whose dependency
stacks this container lacks — this is the honest stdlib extractor
with the SAME Spark-side shape: Arrow-batched ``mapInPandas``,
per-record dead-letter).

Extraction contract (what the oracle leans on):

- ``<script>``/``<style>`` subtrees contribute NO text;
- ``<title>`` is captured separately, not part of the body;
- body text = every other text node, ``str.strip()``-ed, empties
  dropped, joined by single spaces (whitespace normalization);
- ``n_links`` counts ``<a>`` start tags;
- character references decode (``&amp;`` → ``&``), so escaping at
  synthesis time roundtrips to identity.

Reference parity note: the reference (aprs2influxdb) has no text
path; this serves SURVEY's LLM-pipeline north star.
"""

from __future__ import annotations

from html.parser import HTMLParser


class _Extractor(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.chunks: list[str] = []
        self.title_parts: list[str] = []
        self.n_links = 0
        self._skip_depth = 0
        self._in_title = False

    def handle_starttag(self, tag: str, attrs) -> None:
        if tag in ("script", "style"):
            self._skip_depth += 1
        elif tag == "title":
            self._in_title = True
        elif tag == "a":
            self.n_links += 1

    def handle_endtag(self, tag: str) -> None:
        if tag in ("script", "style") and self._skip_depth:
            self._skip_depth -= 1
        elif tag == "title":
            self._in_title = False

    def handle_data(self, data: str) -> None:
        if self._skip_depth:
            return
        t = data.strip()
        if not t:
            return
        if self._in_title:
            self.title_parts.append(t)
        else:
            self.chunks.append(t)


def extract_html(payload: str) -> dict:
    """Extract (title, body text, link count) from an HTML string.
    stdlib HTMLParser is forgiving by design (real crawled HTML is
    broken); the dead-letter case is the non-string input, which the
    callers' schema already excludes."""
    p = _Extractor()
    p.feed(payload)
    p.close()
    return {
        "title": " ".join(p.title_parts),
        "text": " ".join(p.chunks),
        "n_links": p.n_links,
    }
