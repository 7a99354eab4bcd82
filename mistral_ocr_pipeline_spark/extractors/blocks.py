"""Block model + deterministic text/markdown assembly with span bookkeeping.

A ``Block`` is the unit every extractor emits (heading / paragraph /
figure / table / redacted).  ``assemble`` turns an ordered block list into
``(extracted_text, spans, md)`` where ``spans`` are character offsets into
``extracted_text`` — the engine's generalization of the reference's
markdown assembly + image-annotation bookkeeping
(reference info_extraction/to_markdown.py:5-36, main.py:98-109).
"""

from __future__ import annotations

from dataclasses import dataclass, field

# span kinds (FIXTURES.md §2)
HEADING = "heading"
PARAGRAPH = "paragraph"
FIGURE = "figure"
TABLE = "table"
REDACTED = "redacted"

_BLOCK_SEP = "\n\n"


@dataclass
class Block:
    kind: str  # heading | paragraph | figure | table | redacted
    text: str  # normalized text content ("" for pure redaction markers)
    ref: str = ""  # heading: "h1".."h6"; figure: src/ref id; redacted: section kind
    level: int = 0  # heading level (1-6), 0 otherwise
    meta: dict = field(default_factory=dict)


def assemble(blocks: list[Block]) -> tuple[str, list[tuple[int, int, str, str]], str]:
    """Join blocks with a blank line; record (start, end, kind, ref) offsets.

    Redaction markers are zero-length spans anchored at the current text
    position (the content itself is gone — the span records *where* the cut
    happened and *why*, mirroring the reference's mid-page redaction rects,
    reference pre_processing/pdf_section_stripper/planner.py:70-87).

    The markdown rendering is deterministic: headings → ``#``*level,
    figures → ``![text](ref)``, tables pass through their pipe-joined rows,
    paragraphs verbatim; blocks joined by one blank line (the reference's
    page-join contract, to_markdown.py:14-28).
    """
    text_parts: list[str] = []
    md_parts: list[str] = []
    spans: list[tuple[int, int, str, str]] = []
    pos = 0
    for b in blocks:
        if b.kind == REDACTED:
            spans.append((pos, pos, REDACTED, b.ref))
            continue
        if not b.text and b.kind != FIGURE:
            continue
        if text_parts:
            pos += len(_BLOCK_SEP)
        start = pos
        text_parts.append(b.text)
        pos += len(b.text)
        spans.append((start, pos, b.kind, b.ref))
        if b.kind == HEADING:
            lvl = b.level if 1 <= b.level <= 6 else 2
            md_parts.append("#" * lvl + " " + b.text)
        elif b.kind == FIGURE:
            md_parts.append(f"![{b.text}]({b.ref})")
        else:
            md_parts.append(b.text)
    return _BLOCK_SEP.join(text_parts), spans, _BLOCK_SEP.join(md_parts)
