"""Property-based invariants of the extraction contract (pure Python, no
Spark): on ANY input, the dispatcher never raises, spans index correctly
into extracted_text, normalization is idempotent, and extraction is
deterministic."""

import json
import string

from hypothesis import given, settings, strategies as st

from mistral_ocr_pipeline_spark.extractors.blocks import REDACTED
from mistral_ocr_pipeline_spark.extractors.dispatch import extract_turn
from mistral_ocr_pipeline_spark.extractors.textnorm import (
    collapse_ws,
    normalize_plain,
)

text_strategy = st.one_of(
    st.none(),
    st.text(max_size=400),
    st.text(
        alphabet=string.ascii_letters + string.digits + " <>/=\"'&;#\n\t-.",
        max_size=600,
    ),
)
tool_strategy = st.one_of(
    st.none(),
    st.text(max_size=120),
    st.builds(
        lambda pages: json.dumps({"kind": "pdf_layout", "pages": pages}),
        st.lists(
            st.fixed_dictionaries(
                {
                    "width": st.just(612.0),
                    "height": st.just(792.0),
                    "blocks": st.lists(
                        st.fixed_dictionaries(
                            {
                                "type": st.sampled_from([0, 1]),
                                "bbox": st.just([50.0, 50.0, 300.0, 300.0]),
                                "lines": st.lists(
                                    st.fixed_dictionaries(
                                        {
                                            "bbox": st.just([50.0, 60.0, 300.0, 72.0]),
                                            "spans": st.lists(
                                                st.fixed_dictionaries(
                                                    {
                                                        "text": st.text(max_size=60),
                                                        "size": st.floats(
                                                            1.0, 30.0,
                                                            allow_nan=False,
                                                        ),
                                                        "bbox": st.just(
                                                            [50.0, 60.0, 300.0, 72.0]
                                                        ),
                                                    }
                                                ),
                                                max_size=3,
                                            ),
                                        }
                                    ),
                                    max_size=4,
                                ),
                            }
                        ),
                        max_size=3,
                    ),
                }
            ),
            max_size=3,
        ),
    ),
)


@settings(max_examples=300, deadline=None)
@given(text=text_strategy, tool=tool_strategy)
def test_extract_turn_total_and_consistent(text, tool):
    rec = extract_turn(text, tool)  # must never raise
    assert rec["payload_kind"] in {"plain", "html", "pdf_layout", "empty", "error"}
    if rec["payload_kind"] == "error":
        assert rec["error"]
        assert rec["extracted_text"] is None
    else:
        assert rec["error"] is None
        t = rec["extracted_text"]
        assert t is not None
        # spans index into extracted_text, non-overlapping ascending starts
        prev_end = -1
        for (s, e, kind, ref) in rec["spans"]:
            assert 0 <= s <= e <= len(t), (s, e, len(t))
            assert kind in {"heading", "paragraph", "figure", "table", "redacted"}
            if kind != REDACTED:
                assert s >= prev_end - 0  # blocks emitted in order
                prev_end = e
    # determinism
    assert extract_turn(text, tool) == rec


@settings(max_examples=300, deadline=None)
@given(s=st.text(max_size=300))
def test_normalize_plain_idempotent(s):
    once = normalize_plain(s)
    assert normalize_plain(once) == once
    assert collapse_ws(collapse_ws(s)) == collapse_ws(s)
    # collapsed output has no ASCII-whitespace runs and no edge spaces
    assert "  " not in once and "\t" not in once and "\n" not in once
    assert once == once.strip(" ")


_TAGS = ["p", "div", "a", "b", "img", "nav", "table", "tr", "td", "script",
         "style", "h2", "ul", "li", "br", "svg", "template"]
#   Quote characters ARE in the free-text alphabet: unbalanced quotes inside
#   a tag (e.g. '<b x="a>') take html.parser down its junk-characters /
#   incomplete-start-tag recovery, which the fast scanner mirrors via
#   _parse_starttag_tolerant (round 2 — previously excluded).
_FRAGMENTS = st.one_of(
    st.text(alphabet="ab<>&; #x/!=.-\n\t\"'", max_size=14),
    st.sampled_from(
        ["&amp;", "&lt;", "&#65;", "&nbsp;", "&bogus;", "<!-- c -->", "<!--",
         "<!DOCTYPE html>", "<![CDATA[x]]>", "<?pi?>",
         '<img src="i.png" alt="a&amp;b">', "<img src=bare alt=plain/>"]
    ),
    st.sampled_from(_TAGS).map(lambda t: f"<{t}>"),
    st.sampled_from(_TAGS).map(lambda t: f"</{t}>"),
    st.sampled_from(_TAGS).map(lambda t: f"<{t.upper()} class='x'>"),
)


@settings(max_examples=400, deadline=None)
@given(parts=st.lists(_FRAGMENTS, max_size=24))
def test_fast_tokenizer_matches_stdlib(parts):
    """The regex scanner and html.parser must produce identical block
    lists on arbitrary well- and mal-formed markup."""
    from mistral_ocr_pipeline_spark.extractors.html_extract import (
        extract_html_blocks,
    )

    doc = "".join(parts)
    assert extract_html_blocks(doc, tokenizer="fast") == extract_html_blocks(
        doc, tokenizer="stdlib"
    )
