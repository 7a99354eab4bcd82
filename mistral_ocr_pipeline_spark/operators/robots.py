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

from pyspark.sql import DataFrame, Window, functions as F

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


def robots_txt_rules(
    df: DataFrame, host_col: str = "host", robots_col: str = "robots_txt"
) -> DataFrame:
    """Parse per-host robots.txt payloads into the agent-'*' rule table —
    the FETCH-side half of robots compliance (the meta-tag gate above is
    the payload side): a crawler must consult these path rules before
    requesting a URL at all, and a responsible corpus replays them over
    its frontier.

    Grammar (RFC 9309 subset, literal path prefixes): records are
    ``key: value`` lines, ``#`` starts a comment, CONSECUTIVE
    ``User-agent`` lines name one group, and a ``User-agent`` line after
    rule lines starts a NEW group (the standard group semantics).  Only
    groups naming agent ``*`` are kept.  An empty ``Disallow:`` value
    means allow-everything and emits no rule.  ``*``/``$`` wildcards
    inside paths are out of scope (documented simplification — the
    overwhelming majority of real rules are literal prefixes).

    Implementation is pure Catalyst: line posexplode, scan-level
    key/value split, then the group machine as WINDOWS over (host, line)
    — ``new_group = is_ua AND NOT lag(is_ua)``, group id = running sum,
    group-wide star flag = max over the group partition.  Per-host
    windows are bounded by robots.txt size (KBs), never by corpus size.

    Output: (host, path, allow, rule_len) — one row per star-group rule.
    """
    grouped = _star_grouped(df, host_col, robots_col)
    return grouped.filter(
        F.col("key").isin("allow", "disallow")
        & F.col("star")
        & (F.col("val") != "")
    ).select(
        "host",
        F.col("val").alias("path"),
        (F.col("key") == "allow").alias("allow"),
        F.length("val").cast("long").alias("rule_len"),
    )


def _star_grouped(
    df: DataFrame, host_col: str, robots_col: str
) -> DataFrame:
    """Shared robots.txt group machine: one row per relevant line
    (user-agent / allow / disallow / crawl-delay — RULE-type lines all
    terminate a user-agent run, so crawl-delay must ride the grouping
    even though it emits no path rule) with its host, key, value, group
    id, and the group-wide agent-'*' flag."""
    lines = df.select(
        F.col(host_col).alias("host"),
        F.posexplode(
            F.split(F.coalesce(F.col(robots_col), F.lit("")), "\n")
        ).alias("idx", "line"),
    )
    clean = F.trim(F.regexp_replace(F.col("line"), "#.*$", ""))
    key = F.lower(F.trim(F.substring_index(clean, ":", 1)))
    val = F.trim(F.regexp_replace(clean, "^[^:]*:", ""))
    parsed = lines.select(
        "host",
        "idx",
        key.alias("key"),
        (key == "user-agent").alias("is_ua"),
        val.alias("val"),
    ).filter(
        F.col("is_ua")
        | F.col("key").isin("allow", "disallow", "crawl-delay")
    )
    w = Window.partitionBy("host").orderBy("idx")
    grouped = parsed.select(
        "host",
        "idx",
        "key",
        "is_ua",
        "val",
        F.sum(
            (
                F.col("is_ua")
                & ~F.coalesce(F.lag("is_ua").over(w), F.lit(False))
            ).cast("int")
        )
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .alias("group_id"),
    )
    star = F.max(
        (F.col("is_ua") & (F.col("val") == "*")).cast("int")
    ).over(Window.partitionBy("host", "group_id"))
    return grouped.withColumn("star", star == 1)


def robots_crawl_delays(
    df: DataFrame, host_col: str = "host", robots_col: str = "robots_txt"
) -> DataFrame:
    """Per-host ``Crawl-delay`` from the agent-'*' groups — the
    politeness-rate directive (non-standard but honored by most large
    crawlers): seconds a fetcher must wait between requests to the host.
    Multiple star groups take the MOST CONSERVATIVE (maximum) delay;
    non-numeric values are dropped (cast-to-NULL), hosts without the
    directive are absent (callers supply their default rate).

    One map-side-combinable max per host.  Output: (host, crawl_delay).
    """
    grouped = _star_grouped(df, host_col, robots_col)
    return (
        grouped.filter((F.col("key") == "crawl-delay") & F.col("star"))
        # try_cast: ANSI mode would THROW on a junk value like
        # 'Crawl-delay: fast'; malformed directives must drop, not crash
        .select("host", F.col("val").try_cast("long").alias("crawl_delay"))
        .filter(F.col("crawl_delay").isNotNull())
        .groupBy("host")
        .agg(F.max("crawl_delay").alias("crawl_delay"))
    )


def robots_txt_gate(
    urls: DataFrame,
    rules: DataFrame,
    id_col: str,
    url_col: str,
) -> DataFrame:
    """Apply a parsed robots.txt rule table (`robots_txt_rules`) to a URL
    relation under the RFC 9309 precedence: among rules whose path is a
    literal prefix of the URL's canonical path, the LONGEST match wins
    and an allow/disallow tie at equal length resolves to ALLOW; a URL
    with no matching rule (or no robots.txt at all) is fetchable.

    One broadcast-friendly equi-join on host (rule tables are tiny — a
    few rows per host), prefix filter, then ONE map-side-combinable
    max(struct(rule_len, allow, path)) per URL — total order, so the
    matched-rule attribution is deterministic even between same-length
    same-verdict rules.  No windows, no collects.

    Output: (id, canon_url, host, matched_rule, rule_allow, fetch_allowed).
    """
    from mistral_ocr_pipeline_spark.operators.urls import (
        _URL_RE,
        canonicalize_url,
    )

    canon = canonicalize_url(F.col(url_col))
    keyed = urls.select(
        F.col(id_col).alias("id"),
        canon.alias("canon_url"),
        F.regexp_extract(canon, _URL_RE, 2).alias("host"),
        F.regexp_extract(canon, _URL_RE, 3).alias("_path"),
    )
    hits = (
        keyed.join(F.broadcast(rules), "host")
        .filter(F.col("_path").startswith(F.col("path")))
        .groupBy("id")
        .agg(
            F.max(
                F.struct(
                    F.col("rule_len").alias("l"),
                    F.col("allow").alias("a"),
                    F.col("path").alias("p"),
                )
            ).alias("b")
        )
        .select(
            "id",
            F.col("b.p").alias("matched_rule"),
            F.col("b.a").alias("rule_allow"),
        )
    )
    return keyed.join(hits, "id", "left").select(
        "id",
        "canon_url",
        "host",
        "matched_rule",
        "rule_allow",
        F.coalesce(F.col("rule_allow"), F.lit(True)).alias("fetch_allowed"),
    )


def robots_sitemap_directives(
    df: DataFrame, host_col: str = "host", robots_col: str = "robots_txt"
) -> DataFrame:
    """``Sitemap:`` directives from per-host robots.txt payloads — the
    DISCOVERY half the sitemap pipeline needs before `urls.sitemap_entries`
    can parse anything: per sitemaps.org/RFC 9309, Sitemap lines are
    host-GLOBAL (they live outside user-agent groups and bind regardless
    of agent), the key is case-insensitive, and a file may list several.
    Comments strip first; the value keeps its original case (URLs are
    case-sensitive past the authority).

    Output: (host, line_idx, sitemap_url) in file order — feed the URLs
    to the fetcher, the fetched XML to `sitemap_entries`, and the
    entries to `sitemap_recrawl_queue`; line_idx keeps re-fetch plans
    deterministic.  Map-only line explode, no grouping at all."""
    lines = df.select(
        F.col(host_col).alias("host"),
        F.posexplode(F.split(F.col(robots_col), "\n")).alias("i", "line"),
    ).select(
        "host",
        (F.col("i") + 1).cast("int").alias("line_idx"),
        F.trim(F.regexp_replace("line", "#.*$", "")).alias("ln"),
    )
    key = F.lower(F.trim(F.expr("split_part(ln, ':', 1)")))
    val = F.trim(F.expr("regexp_replace(ln, '^[^:]*:', '')"))
    return lines.filter(key == "sitemap").select(
        "host", "line_idx", val.alias("sitemap_url")
    )
