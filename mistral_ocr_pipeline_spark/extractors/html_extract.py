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


# ---------------------------------------------------------------------------
# Fast tokenizer: one regex scan driving the SAME handler methods
# ---------------------------------------------------------------------------
# The stdlib html.parser spends most of its time in per-tag Python
# bookkeeping (goahead/parse_starttag/updatepos — 65% of the whole
# extraction kernel under cProfile).  This scanner produces the identical
# event stream for the HTML this extractor understands — tag names
# lowercased, charrefs decoded in data AND attribute values, script/style
# treated as raw text (the stdlib's CDATA_CONTENT_ELEMENTS), self-closing
# tags emitting start+end — and feeds the same _BlockParser callbacks, so
# block semantics cannot drift between the two paths.  Parity is pinned by
# a hypothesis property test (test_property_extractors.py) and the golden
# suite; `tokenizer="stdlib"` keeps the reference path selectable.

_TOKEN_RE = re.compile(
    r"""
      <!--.*?(?:-->|$)                          # comment (possibly unclosed)
    | <!\[CDATA\[.*?(?:\]\]>|$)                 # CDATA
    | <![^>]*>?                                 # doctype / bogus declaration
    | <\?[^>]*>?                                # processing instruction
    | </\s*([a-zA-Z][^\t\n\r\f\x20/>\x00]*)[^>]*>  # end tag   -> group 1
                                                #   (name charset matches
                                                #   html.parser's tolerant
                                                #   tagfind: '</p">' ends p")
    | </[^>]*(?:>|$)                            # bogus end tag (</ + non-letter):
                                                #   html.parser consumes it as a
                                                #   bogus comment through the '>'
    | <([a-zA-Z][-a-zA-Z0-9_:.]*)               # STRICT start tag -> group 2
        ((?:\s+[a-zA-Z_:][-a-zA-Z0-9_:.]*       #   attr name
            (?:=(?:"[^"<>]*"                    #   ="..." value
                |'[^'<>]*'                      #   ='...' value
                |[-a-zA-Z0-9_./:;,+#%?&~]*      #   =bare value (no quotes)
            ))?
         )*\s*/?)>                              #   attr blob  -> group 3
    | (<)(?=[a-zA-Z])                           # tolerant start-tag opener
                                                #   -> group 4: slow path
    | ([^<]+)                                   # text         -> group 5
    | <                                         # stray '<' as text
    """,
    re.DOTALL | re.VERBOSE,
)
# The STRICT start-tag alternative is (a) linear-time — every branch of the
# attr loop is first-char-disjoint (the r01 blob pattern
# ``(?:"[^"]*"|'[^']*'|[^>])*`` let a quote match two branches, giving
# exponential backtracking on an unclosed quoted tag: time doubled per
# added quote) — and (b) provably equivalent to html.parser on the inputs
# it accepts: every char class is a subset of the stdlib tolerant charsets
# (tagfind_tolerant / attrfind_tolerant), each attr is space-preceded (so
# the stdlib lookbehind ``(?<=['"\s/])`` holds) and single-'=' (so
# ``=+`` consumes identically), so locatestarttagend_tolerant consumes
# exactly the same span and ends on the same '>'.  Anything else —
# unclosed quotes, '>' inside quoted values, '='-less junk, bogus
# constructs — falls through to the tolerant opener, handled by
# ``_parse_starttag_tolerant`` which mirrors html.parser's
# parse_starttag/check_for_whole_start_tag byte for byte.

_ATTR_RE = re.compile(
    r"""([a-zA-Z][a-zA-Z0-9:._-]*)\s*(?:=\s*("([^"]*)"|'([^']*)'|[^\s>]*))?""",
    re.VERBOSE,
)

# stdlib tolerant start-tag machinery, reused directly so the slow path is
# the same regex the ``tokenizer="stdlib"`` parity reference runs (these
# module globals are stable across CPython 3.9–3.13)
from html.parser import (  # noqa: E402
    attrfind_tolerant as _attrfind,
    locatestarttagend_tolerant as _locatestarttagend,
    tagfind_tolerant as _tagfind,
)

_RAWTEXT_END = {
    "script": re.compile(r"(?is)</script(?:\s[^>]*)?>"),
    "style": re.compile(r"(?is)</style(?:\s[^>]*)?>"),
}

def _unescape(s: str) -> str:
    if "&" in s:  # plain `in` beats a regex probe on the no-charref fast path
        from html import unescape

        return unescape(s)
    return s


def _parse_attrs(blob: str) -> list[tuple[str, str | None]]:
    attrs = []
    for m in _ATTR_RE.finditer(blob):
        name = m.group(1).lower()
        if m.group(2) is None:
            attrs.append((name, None))
        elif m.group(3) is not None:
            attrs.append((name, _unescape(m.group(3))))
        elif m.group(4) is not None:
            attrs.append((name, _unescape(m.group(4))))
        else:
            attrs.append((name, _unescape(m.group(2))))
    return attrs


def _is_terminated(g: str) -> bool:
    """Whether a <!…> / <?…> construct matched by _TOKEN_RE actually closed
    (the terminator must not overlap the opener, mirroring html.parser's
    find-from-offset behavior for '<!-->' and friends)."""
    if g.startswith("<!--"):
        return g.endswith("-->") and len(g) >= 7
    if g.startswith("<![CDATA["):
        return g.endswith("]]>") and len(g) >= 12
    return g.endswith(">")


def _drive_fast(p: _BlockParser, html_text: str) -> None:
    # branch dispatch on m.lastindex (highest group that matched) instead of
    # extracting all five groups per token: the alternation's matched branch
    # is known from one int — 5=text, 3=strict start tag (group 3 always
    # participates, even empty), 1=end tag, 4=tolerant opener, None=
    # comment/doctype/PI/CDATA/bogus-end/stray '<'.  Ordered by frequency;
    # measured ~15% off the whole tokenize loop on fixture docs.
    pos, n = 0, len(html_text)
    while pos < n:
        m = _TOKEN_RE.match(html_text, pos)
        if m is None:  # cannot happen (last alternations are catch-alls)
            break
        start, pos = pos, m.end()  # match is anchored: m.start() == pos
        li = m.lastindex
        if li == 5:  # text
            p.handle_data(_unescape(m.group(5)))
            continue
        if li == 3:  # strict start tag
            start_tag, attr_blob = m.group(2, 3)
            tag = start_tag.lower()
            # html.parser subtlety: a trailing '/' right after an UNQUOTED
            # attribute value is part of the value (<img alt=plain/> gives
            # alt='plain/', not a self-closing tag); '/' only self-closes
            # when preceded by whitespace, a quote, or the tag name itself
            selfclosing = attr_blob.endswith("/") and (
                len(attr_blob) == 1 or attr_blob[-2] in " \t\n\r\f\"'"
            )
            # img is the only tag whose attributes the consumer reads
            blob = attr_blob[:-1] if selfclosing else attr_blob
            attrs = _parse_attrs(blob) if tag == "img" else []
            p.handle_starttag(tag, attrs)
            if selfclosing:
                p.handle_endtag(tag)
            elif tag in _RAWTEXT_END:
                pos = _rawtext_skip(p, html_text, pos, tag)
            continue
        if li == 1:  # end tag
            p.handle_endtag(m.group(1).lower())
            continue
        if li == 4:
            # start tag the STRICT alternative rejected: mirror html.parser's
            # parse_starttag exactly (tolerant regexes + junk/EOF recovery)
            pos = _parse_starttag_tolerant(p, html_text, start)
            continue
        # li is None: comment / doctype / PI / CDATA / bogus end tag / '<'
        g0 = m.group(0)
        if g0 == "<":
            p.handle_data("<")
        elif g0.startswith("</") and not g0.endswith(">"):
            # unterminated bogus end tag at EOF: same recovery as below but
            # html.parser scans for the next '<' only
            k = html_text.find("<", start + 1)
            k = k if k >= 0 else start + 1
            p.handle_data(_unescape(html_text[start:k]))
            pos = k
        elif g0.startswith(("<!", "<?")) and not _is_terminated(g0):
            # unterminated comment/CDATA/declaration/PI: html.parser's
            # bogus-construct recovery emits raw data up to and including
            # the FIRST '>' (else up to the next '<', else one char), then
            # resumes tokenizing there — replicate exactly
            k = html_text.find(">", start + 1)
            if k < 0:
                k = html_text.find("<", start + 1)
                k = k if k >= 0 else start + 1
            else:
                k += 1
            p.handle_data(_unescape(html_text[start:k]))
            pos = k
        # else: closed comment / doctype / PI / CDATA / closed bogus end
        # tag — no consumer, dropped


def _rawtext_skip(p: _BlockParser, html_text: str, pos: int, tag: str) -> int:
    """Skip a raw-text element (script/style) to its end tag without
    tokenizing; returns the resume position."""
    end = _RAWTEXT_END[tag].search(html_text, pos)
    if end is None:
        p.handle_data(html_text[pos:])
        return len(html_text)
    p.handle_data(html_text[pos : end.start()])
    p.handle_endtag(tag)
    return end.end()


_ASCII_LETTERS_EQ_SLASH = frozenset(
    "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ=/"
)


def _parse_starttag_tolerant(p: _BlockParser, html_text: str, i: int) -> int:
    """Byte-faithful mirror of html.parser's parse_starttag +
    check_for_whole_start_tag + goahead's incomplete-tag recovery (CPython
    Lib/html/parser.py), driven against the same stdlib tolerant regexes so
    the fast tokenizer cannot drift from the ``tokenizer="stdlib"`` parity
    reference on malformed start tags.  Returns the resume position."""
    m = _locatestarttagend.match(html_text, i)
    j = m.end()
    nxt = html_text[j : j + 1]
    if nxt == ">":
        endpos = j + 1
    elif nxt == "/" and html_text.startswith("/>", j):
        endpos = j + 2
    elif nxt == "" or nxt == "/" or nxt in _ASCII_LETTERS_EQ_SLASH:
        # end of input inside the tag (html.parser would wait for more
        # data; at close() its goahead(end=1) recovery emits raw data up
        # to and including the first '>', else to the next '<', else one
        # char — identical to the bogus-declaration recovery)
        k = html_text.find(">", i + 1)
        if k < 0:
            k = html_text.find("<", i + 1)
            k = k if k >= 0 else i + 1
        else:
            k += 1
        p.handle_data(_unescape(html_text[i:k]))
        return k
    else:
        endpos = j if j > i else i + 1
    # parse_starttag proper: tag name, then the attr loop
    mt = _tagfind.match(html_text, i + 1)
    k = mt.end()
    tag = mt.group(1).lower()
    attrs: list[tuple[str, str | None]] = []
    want_attrs = tag == "img"  # only consumer that reads attributes
    while k < endpos:
        ma = _attrfind.match(html_text, k)
        if not ma:
            break
        if want_attrs:
            attrname, rest, attrvalue = ma.group(1, 2, 3)
            if not rest:
                attrvalue = None
            elif (
                attrvalue[:1] == "'" == attrvalue[-1:]
                or attrvalue[:1] == '"' == attrvalue[-1:]
            ):
                attrvalue = attrvalue[1:-1]
            if attrvalue:
                attrvalue = _unescape(attrvalue)
            attrs.append((attrname.lower(), attrvalue))
        k = ma.end()
    end = html_text[k:endpos].strip()
    if end not in (">", "/>"):
        # junk between the last attr and the '>': html.parser emits the
        # whole tag text as data, WITHOUT charref conversion
        p.handle_data(html_text[i:endpos])
        return endpos
    p.handle_starttag(tag, attrs)
    if end == "/>":
        p.handle_endtag(tag)
    elif tag in _RAWTEXT_END:
        return _rawtext_skip(p, html_text, endpos, tag)
    return endpos


def extract_html_blocks(html_text: str, tokenizer: str = "fast") -> list[Block]:
    """Tokenize + classify; returns kept blocks in document order.

    ``tokenizer="fast"`` (default) scans with one compiled regex driving
    the same handler callbacks; ``"stdlib"`` keeps the html.parser path
    (the parity reference).  Tolerant of truncated/malformed markup; a
    hard parser failure propagates to the dispatcher's error channel
    (analog of the reference's per-document failure capture, main.py:304-311).
    """
    p = _BlockParser()
    if tokenizer == "fast":
        _drive_fast(p, html_text)
        p._flush()
    else:
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
