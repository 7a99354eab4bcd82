"""URL-level curation operators — canonicalization, crawl dedup, domain
health filtering.

Web-scale corpora (RefinedWeb §3.1, Dolma's URL dedup, C4's host rules)
dedup by *canonical URL* before any content pass: the same page is crawled
many times behind tracking params, fragments, default ports, www aliases,
and trailing slashes, and URL dedup removes those recrawls for the cost of
a string groupBy — no shingles, no signatures.  The reference pipeline has
no web layer (it keys on file paths, main.py:61-78); these operators are
the corpus-curation generalization of its resume-key identity.

Everything here is pure Catalyst expression work (regexp + array ops from
the Java∩RE2-identical subset, same discipline as `text_analysis.pii_scrub`)
so the exact semantics replay in the DuckDB oracles:

* ``canonicalize_url``    — scheme/host lowercase, www + default-port strip,
                            tracking-param removal, stable query-param sort,
                            fragment drop, trailing-slash strip.
* ``url_host``            — registrable host for domain-level rollups.
* ``url_dedup``           — keep the LATEST crawl per canonical URL (ties →
                            lowest id) via one map-side-combinable
                            max(struct) — never a row_number window, so a
                            million-recrawl hot URL costs one struct per
                            partition.
* ``domain_stats``        — per-host corpus health (doc count, recrawl
                            ratio, mean length) in one shuffle.

100 TB shape: URL canonicalization is map-only; dedup is ONE shuffle on
the canonical-URL hash; domain stats is ONE map-side-combined groupBy on
host.  Nothing collects, nothing windows over unbounded groups.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# Query-string parameters that never change page identity (analytics /
# click-attribution noise).  Name-prefix match for the utm_ family, exact
# name match for the rest.  Kept to [a-z_] so the predicate is byte-identical
# in Spark and DuckDB.
TRACKING_EXACT = ("fbclid", "gclid", "msclkid", "mc_eid", "igshid", "ref")
TRACKING_PREFIX = "utm_"

# One structural regex, groups: 1=scheme 2=host[:port] 3=path 4=query.
# Non-capturing groups + character classes only — identical in Java and RE2.
_URL_RE = r"^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)([^?#]*)(?:\?([^#]*))?(?:#.*)?$"


def _clean_query(q: Column) -> Column:
    """Tracking params out, survivors sorted for a stable key.

    split('') yields [''] — the p != '' filter also absorbs that, plus
    empty segments from '&&' / trailing '&'.
    """
    parts = F.split(q, "&")
    kept = F.filter(
        parts,
        lambda p: (p != F.lit(""))
        & ~p.startswith(TRACKING_PREFIX)
        & ~F.substring_index(p, "=", 1).isin(*TRACKING_EXACT),
    )
    return F.array_join(F.array_sort(kept), "&")


def canonicalize_url(url: Column) -> Column:
    """Canonical form of ``url``; NULL/non-URL strings canonicalize to ''
    (one explicit junk group) rather than NULL so downstream groupBys and
    join-backs never drop rows on a NULL key (the `exact_dedup` NULL-text
    rule).

    DuckDB twin: the `_URL_ORACLE` template in plans/entry_queries.py —
    same regex, same CASE logic, list_filter/list_sort/array_to_string.
    """
    u = F.trim(F.coalesce(url, F.lit("")))
    scheme = F.lower(F.regexp_extract(u, _URL_RE, 1))
    rawhost = F.lower(F.regexp_extract(u, _URL_RE, 2))
    host = F.regexp_replace(
        F.when(scheme == "http", F.regexp_replace(rawhost, ":80$", ""))
        .when(scheme == "https", F.regexp_replace(rawhost, ":443$", ""))
        .otherwise(rawhost),
        r"^www\.",
        "",
    )
    path = F.regexp_replace(F.regexp_extract(u, _URL_RE, 3), "/+$", "")
    query = _clean_query(F.regexp_extract(u, _URL_RE, 4))
    rebuilt = F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(query != "", F.concat(F.lit("?"), query)).otherwise(F.lit("")),
    )
    return F.when(scheme == "", F.lit("")).otherwise(rebuilt)


def url_host(url: Column) -> Column:
    """Host of the *canonical* URL ('' for junk) — the domain-rollup key."""
    canon = canonicalize_url(url)
    return F.regexp_extract(canon, _URL_RE, 2)


def url_dedup(
    df: DataFrame, id_col: str, url_col: str, ts_col: str
) -> DataFrame:
    """One row per input id: its canonical URL, recrawl count, and whether
    it is the kept copy.  Keep rule = LATEST ``ts_col`` (freshest crawl),
    ties to the lowest id — the standard recrawl policy (newest snapshot
    supersedes), mirroring `dedup.exact_dedup_keep_best`'s fold shape.

    Output: (id, canon_url, crawl_count, is_canonical, canonical_id).
    """
    keyed = df.select(
        F.col(id_col).alias("id"),
        F.col(ts_col).alias("_ts"),
        canonicalize_url(F.col(url_col)).alias("canon_url"),
    )
    groups = (
        keyed.groupBy("canon_url")
        .agg(
            F.count(F.lit(1)).alias("crawl_count"),
            F.max(
                F.struct(F.col("_ts").alias("t"), (-F.col("id")).alias("ni"))
            ).alias("b"),
        )
        .select(
            "canon_url",
            "crawl_count",
            (-F.col("b.ni")).cast("long").alias("canonical_id"),
        )
    )
    return keyed.join(groups, "canon_url").select(
        "id",
        "canon_url",
        "crawl_count",
        (F.col("id") == F.col("canonical_id")).alias("is_canonical"),
        "canonical_id",
    )


def domain_stats(
    df: DataFrame, id_col: str, url_col: str, text_col: str
) -> DataFrame:
    """Per-host corpus health in ONE map-side-combined shuffle:
    (host, n_docs, n_pages, recrawl_ratio_micro, mean_len_micro).

    * ``n_docs``   — crawled copies landing on the host.
    * ``n_pages``  — distinct canonical URLs (what survives `url_dedup`).
    * ``recrawl_ratio_micro`` — (n_docs - n_pages) * 1e6 / n_docs, BIGINT
      micro-units (integer division — exact, order-independent).
    * ``mean_len_micro``      — avg text length in micro-units, same rule.

    The blocklist/threshold filter composes on top as a broadcast join or
    scan predicate (see the `domain_quality_filter` query).
    """
    keyed = df.select(
        F.col(id_col).alias("id"),
        F.length(F.coalesce(F.col(text_col), F.lit(""))).alias("_len"),
        canonicalize_url(F.col(url_col)).alias("canon_url"),
    ).withColumn("host", F.regexp_extract("canon_url", _URL_RE, 2))
    return (
        keyed.groupBy("host")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("canon_url").alias("n_pages"),
            F.sum("_len").alias("_len_sum"),
        )
        .select(
            "host",
            "n_docs",
            "n_pages",
            # true integer division (div, not /-then-cast): exact at any
            # magnitude, no double rounding at 100 TB sums
            F.expr(
                "(n_docs - n_pages) * 1000000L div n_docs"
            ).alias("recrawl_ratio_micro"),
            F.expr("_len_sum * 1000000L div n_docs").alias("mean_len_micro"),
        )
    )
