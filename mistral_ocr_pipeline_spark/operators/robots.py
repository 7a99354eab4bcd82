"""Robots-directive compliance gating — the crawl-etiquette scan every
responsible web corpus runs before training on a page.

Two page-level signals, both scan-level CASE/regexp expressions (zero
shuffle, zero UDF):

* ``<meta name="robots" content="...">`` — ``noindex`` means the
  publisher asked not to be indexed (a training corpus honoring
  opt-outs drops the page); ``nofollow`` means its links must not feed
  the link graph / frontier (gate the `htmllinks` extraction on it).
* ``X-Robots-Tag``-style directives are headers, not markup — out of
  scope for a payload scan; the fixture documents the boundary.

Grammar: the fixed-attribute-order form the fixture/payload emitters
produce (like `htmllinks.ANCHOR_PATTERN`); name matching is
case-insensitive via lower() (the practical variance — 'ROBOTS',
'NoIndex' — is case, not attribute order).  Directives are matched as
comma-separated tokens, not substrings, so a hypothetical
'nofollowup' custom token cannot false-positive 'nofollow'.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# content of the robots meta tag, '' when absent
ROBOTS_PATTERN = r'<meta name="robots" content="([^"]*)"'


def robots_directives(
    df: DataFrame, id_col: str = "doc_id", html_col: str = "html"
) -> DataFrame:
    """(id, robots_content, noindex, nofollow, indexable) per page.

    ``indexable`` is the corpus keep gate: no noindex directive (pages
    without a robots meta are indexable by default — the web's opt-out
    model).  ``nofollow`` gates link extraction.  Directive matching is
    token-exact over the lower-cased, space-stripped comma list."""
    raw = F.regexp_extract(
        F.coalesce(F.col(html_col), F.lit("")), ROBOTS_PATTERN, 1
    )
    toks = F.transform(
        F.split(F.lower(raw), ","), lambda t: F.trim(t)
    )
    noindex = F.array_contains(toks, "noindex") | F.array_contains(
        toks, "none"
    )
    nofollow = F.array_contains(toks, "nofollow") | F.array_contains(
        toks, "none"
    )
    return df.select(
        F.col(id_col).alias("id"),
        raw.alias("robots_content"),
        noindex.alias("noindex"),
        nofollow.alias("nofollow"),
        (~noindex).alias("indexable"),
    )
