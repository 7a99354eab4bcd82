"""HTML main-content extraction: DOM tokenize → block scoring → kept blocks.

Readability/Boilerpipe-style boilerplate stripping mandated by the north
rule (BASELINE.json ``north_star``): a DOM tokenizer feeding text-density +
link-density block classification.  Built on the stdlib ``html.parser``
(no lxml/selectolax in this environment); the tokenizer is a single pass,
batch-friendly, and fully deterministic.

Classification rules (pinned — the oracle contract):

* blocks under ``nav/header/footer/aside`` ancestors are boilerplate;
* ``script/style/noscript/template/svg/head`` subtrees are invisible;
* link_density = link_chars / chars; a block with link_density > 1/3 is
  boilerplate (link-farm / menu);
* a block with fewer than 5 words that contains at least one link is
  boilerplate (breadcrumbs, "read more" stubs);
* headings (h1-h6) are kept unless link-dominated (link_density ≥ 2/3);
* ``<img>`` produces a figure block (text = alt, ref = src) unless inside
  boilerplate — the span-bookkeeping analog of the reference's image
  annotations (reference info_extraction/to_markdown.py:5-11);
* ``<table>`` rows are flattened to ``cell | cell`` lines, one table block.
"""

from __future__ import annotations

import re
from html.parser import HTMLParser

from mistral_ocr_pipeline_spark.extractors.blocks import (
    FIGURE,
    HEADING,
    PARAGRAPH,
    TABLE,
    Block,
)
from mistral_ocr_pipeline_spark.extractors.textnorm import collapse_ws, nfc

_BLOCK_TAGS = {
    "p", "div", "section", "article", "main", "li", "ul", "ol",
    "blockquote", "pre", "figcaption", "dt", "dd",
    "h1", "h2", "h3", "h4", "h5", "h6",
}
_HEADING_TAGS = {"h1", "h2", "h3", "h4", "h5", "h6"}
_BOILER_TAGS = {"nav", "header", "footer", "aside"}
_SKIP_TAGS = {"script", "style", "noscript", "template", "svg", "head"}
_VOID_BREAKERS = {"br", "hr"}

MAX_LINK_DENSITY = 1.0 / 3.0
MIN_WORDS_WITH_LINK = 5
HEADING_MAX_LINK_DENSITY = 2.0 / 3.0

_HTML_SNIFF_RE = re.compile(
    r"(?is)<\s*(!doctype|html|head|body|div|p|nav|article|section|h[1-6]|ul|table)\b"
)


def looks_like_html(text: str) -> bool:
    """Payload-family sniff (analog of the reference's PDF-vs-image dispatch,
    reference info_extraction/get_annotations.py:189-220)."""
    return bool(_HTML_SNIFF_RE.search(text))


class _Candidate:
    __slots__ = ("tag", "chunks", "link_chars", "boiler")

    def __init__(self, tag: str, boiler: bool) -> None:
        self.tag = tag
        self.chunks: list[str] = []
        self.link_chars = 0
        self.boiler = boiler


class _BlockParser(HTMLParser):
    """Single-pass DOM tokenizer emitting candidate blocks in document order."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.out: list[tuple[str, _Candidate | Block]] = []
        self._cur: _Candidate | None = None
        self._skip = 0
        self._boiler = 0
        self._anchor = 0
        self._table = 0
        self._rows: list[list[str]] = []
        self._cell: list[str] | None = None
        self._table_chars = 0
        self._table_link_chars = 0

    # -- block lifecycle -------------------------------------------------
    def _flush(self) -> None:
        if self._cur is not None:
            self.out.append(("cand", self._cur))
            self._cur = None

    def _open(self, tag: str) -> None:
        self._flush()
        self._cur = _Candidate(tag, self._boiler > 0)

    # -- parser callbacks ------------------------------------------------
    def handle_starttag(self, tag: str, attrs) -> None:
        if tag in _SKIP_TAGS:
            self._skip += 1
            return
        if self._skip:
            return
        if tag in _BOILER_TAGS:
            self._flush()
            self._boiler += 1
            return
        if tag == "a":
            self._anchor += 1
            return
        if tag == "img":
            alt = src = ""
            for k, v in attrs:
                if k == "alt":
                    alt = v or ""
                elif k == "src":
                    src = v or ""
            if self._boiler == 0 and self._skip == 0:
                self._flush()
                self.out.append(
                    ("block", Block(FIGURE, collapse_ws(nfc(alt)), ref=src))
                )
            return
        if tag == "table":
            self._flush()
            self._table += 1
            if self._table == 1:
                self._rows, self._cell = [], None
                self._table_chars = self._table_link_chars = 0
            return
        if self._table:
            if tag == "tr":
                self._rows.append([])
            elif tag in ("td", "th"):
                self._cell = []
            return
        if tag in _VOID_BREAKERS:
            if self._cur is not None:
                self._cur.chunks.append(" ")
            return
        if tag in _BLOCK_TAGS:
            self._open(tag)

    def handle_endtag(self, tag: str) -> None:
        if tag in _SKIP_TAGS:
            self._skip = max(0, self._skip - 1)
            return
        if self._skip:
            return
        if tag in _BOILER_TAGS:
            self._boiler = max(0, self._boiler - 1)
            return
        if tag == "a":
            self._anchor = max(0, self._anchor - 1)
            return
        if tag == "table":
            self._table = max(0, self._table - 1)
            if self._table == 0:
                rows = [" | ".join(r) for r in self._rows if r]
                text = "\n".join(rows)
                if text and not (self._boiler > 0):
                    density = (
                        self._table_link_chars / self._table_chars
                        if self._table_chars
                        else 0.0
                    )
                    if density <= MAX_LINK_DENSITY:
                        self.out.append(("block", Block(TABLE, text)))
                self._rows, self._cell = [], None
            return
        if self._table:
            if tag in ("td", "th") and self._cell is not None:
                cell = collapse_ws(nfc("".join(self._cell)))
                if self._rows:
                    self._rows[-1].append(cell)
                self._cell = None
            return
        if tag in _BLOCK_TAGS:
            self._flush()

    def handle_data(self, data: str) -> None:
        if self._skip or not data:
            return
        if self._table:
            if self._cell is not None:
                self._cell.append(data)
                n = len(collapse_ws(data))
                self._table_chars += n
                if self._anchor:
                    self._table_link_chars += n
            return
        if self._boiler:
            return
        if self._cur is None:
            if not data.strip():
                return
            self._open("p")  # bare text outside any block tag
        self._cur.chunks.append(data)
        if self._anchor:
            self._cur.link_chars += len(collapse_ws(data))

    def close(self) -> None:  # flush trailing block
        super().close()
        self._flush()


def _classify(c: _Candidate) -> Block | None:
    text = collapse_ws(nfc("".join(c.chunks)))
    if not text or c.boiler:
        return None
    chars = len(text)
    density = min(1.0, c.link_chars / chars) if chars else 0.0
    if c.tag in _HEADING_TAGS:
        if density >= HEADING_MAX_LINK_DENSITY:
            return None
        return Block(HEADING, text, ref=c.tag, level=int(c.tag[1]))
    words = len(text.split(" "))
    if density > MAX_LINK_DENSITY:
        return None
    if words < MIN_WORDS_WITH_LINK and c.link_chars > 0:
        return None
    return Block(PARAGRAPH, text)


def extract_html_blocks(html_text: str) -> list[Block]:
    """Tokenize + classify; returns kept blocks in document order.

    Tolerant of truncated/malformed markup — the stdlib parser recovers;
    a hard parser failure propagates to the dispatcher's error channel
    (analog of the reference's per-document failure capture, main.py:304-311).
    """
    p = _BlockParser()
    p.feed(html_text)
    p.close()
    blocks: list[Block] = []
    for kind, item in p.out:
        if kind == "block":
            b = item
            if b.kind == FIGURE and not b.text and not b.ref:
                continue
            blocks.append(b)
        else:
            b = _classify(item)
            if b is not None:
                blocks.append(b)
    return blocks
