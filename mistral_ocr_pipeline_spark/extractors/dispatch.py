"""Per-turn payload routing + error capture — the engine's core contract.

One turn in, one extraction record out.  Mirrors the reference's dispatch
(PDF vs page-image fallback, get_annotations.py:189-220) and failure
capture (failed docs recorded, never crash the run, main.py:304-311).

Routing:
* ``tool`` holds a JSON payload with ``kind == "pdf_layout"`` → PDF path
  (tool wins over text, FIXTURES.md §1 edge cases);
* ``tool`` present but unparseable → ``error`` record;
* empty/whitespace ``text`` → ``empty`` record;
* HTML sniff on ``text`` → HTML boilerplate-strip path;
* otherwise → plain normalization.

The output record is the golden contract (FIXTURES.md §2):
``(payload_kind, extracted_text, spans, md, error)`` with spans =
``[(start, end, kind, ref)]`` offsets into ``extracted_text``.
"""

from __future__ import annotations

import json
from typing import Any

from mistral_ocr_pipeline_spark.extractors.blocks import assemble
from mistral_ocr_pipeline_spark.extractors.html_extract import (
    extract_html_blocks,
    looks_like_html,
)
from mistral_ocr_pipeline_spark.extractors.pdf_layout import (
    extract_pdf_layout_blocks,
)
from mistral_ocr_pipeline_spark.extractors.textnorm import normalize_plain

Span = tuple[int, int, str, str]

KIND_PLAIN = "plain"
KIND_HTML = "html"
KIND_PDF = "pdf_layout"
KIND_EMPTY = "empty"
KIND_ERROR = "error"


def _record(
    kind: str,
    text: str | None,
    spans: list[Span],
    md: str | None,
    error: str | None = None,
) -> dict[str, Any]:
    return {
        "payload_kind": kind,
        "extracted_text": text,
        "spans": spans,
        "md": md,
        "error": error,
    }


def extract_turn(text: str | None, tool: str | None) -> dict[str, Any]:
    """Extract one turn's payload; never raises (errors become rows)."""
    if tool is not None and tool.strip():
        try:
            payload = json.loads(tool)
        except (json.JSONDecodeError, ValueError) as e:
            return _record(
                KIND_ERROR, None, [], None,
                f"invalid tool payload: {type(e).__name__}: {e}",
            )
        if isinstance(payload, dict) and payload.get("kind") == "pdf_layout":
            try:
                blocks = extract_pdf_layout_blocks(payload)
                out_text, spans, md = assemble(blocks)
                return _record(KIND_PDF, out_text, spans, md)
            except Exception as e:  # malformed-but-parseable payload
                return _record(
                    KIND_ERROR, None, [], None,
                    f"pdf_layout extraction failed: {type(e).__name__}: {e}",
                )
        # valid JSON but not a layout payload → fall through to text

    if text is None or not text.strip(" \t\n\r\f\v"):  # ASCII ws: SQL-oracle aligned
        return _record(KIND_EMPTY, "", [], "")

    if looks_like_html(text):
        try:
            blocks = extract_html_blocks(text)
            out_text, spans, md = assemble(blocks)
            return _record(KIND_HTML, out_text, spans, md)
        except Exception as e:
            return _record(
                KIND_ERROR, None, [], None,
                f"html extraction failed: {type(e).__name__}: {e}",
            )

    out_text = normalize_plain(text)
    spans: list[Span] = [(0, len(out_text), "paragraph", "")] if out_text else []
    return _record(KIND_PLAIN, out_text, spans, out_text)


def extract_turn_golden(text: str | None, tool: str | None) -> dict[str, Any]:
    """Golden-oracle alias: identical code path, named for the test suite."""
    return extract_turn(text, tool)
