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


def url_trap_flags(
    df: DataFrame,
    id_col: str,
    url_col: str,
    max_depth: int = 8,
    max_seg_repeat: int = 2,
    max_path_len: int = 200,
    max_params: int = 6,
) -> DataFrame:
    """Spider-trap / crawler-pathology detection per URL — the frontier
    gate every production crawler runs before enqueueing a discovered link
    (Heritrix's pathological-path rules, Nutch's regex-urlfilter defaults).
    Traps are URL-shape pathologies: infinitely deep calendars, session ids
    minted per request, path-segment loops ('/a/b/a/b/a/b/…'), and
    query-param explosions — each yields unbounded distinct URLs for finite
    content, so they must be cut at the URL level, before any fetch.

    Signals (computed on the CANONICAL url, so tracking params never count):

    * ``depth``        — non-empty path segments; > ``max_depth`` → 'deep_path'.
    * ``max_repeat``   — highest multiplicity of any one segment;
                         > ``max_seg_repeat`` → 'repeat_segments' (loop traps).
    * ``path_len``     — characters in the path; > ``max_path_len`` → 'long_path'.
    * ``n_params``     — surviving query params; > ``max_params`` → 'query_explosion'.
    * ``session_flag`` — any segment that is ≥16 hex chars or ≥10 digits
                         (minted session/state tokens) → 'session_id'.

    ``verdict`` is FIRST-FAIL in the order above ('ok' if clean), the same
    auditable attribution contract as `text_analysis.quality_funnel`.

    100 TB shape: map-only, zero shuffle, zero UDF.  The multiplicity scan
    is O(distinct·total) per URL inside one row — bounded by path length,
    never by corpus size.  Junk/NULL URLs canonicalize to '' (depth 0,
    verdict 'ok') and survive.

    Output: (id, canon_url, depth, max_repeat, path_len, n_params,
    session_flag, verdict).
    """
    canon = canonicalize_url(F.col(url_col))
    path = F.regexp_extract(canon, _URL_RE, 3)
    segs = F.filter(F.split(path, "/"), lambda s: s != F.lit(""))
    # highest multiplicity of any one segment: count each distinct segment's
    # occurrences, take the max; [] -> 0 via the outer coalesce
    max_repeat = F.coalesce(
        F.array_max(
            F.transform(
                F.array_distinct(segs),
                lambda d: F.size(F.filter(segs, lambda s: s == d)),
            )
        ),
        F.lit(0),
    )
    n_params = F.size(
        F.filter(
            F.split(F.regexp_extract(canon, _URL_RE, 4), "&"),
            lambda p: p != F.lit(""),
        )
    )
    session_flag = F.exists(
        segs, lambda s: s.rlike("^[0-9a-fA-F]{16,}$|^[0-9]{10,}$")
    )
    out = df.select(
        F.col(id_col).alias("id"),
        canon.alias("canon_url"),
        F.size(segs).cast("long").alias("depth"),
        max_repeat.cast("long").alias("max_repeat"),
        F.length(path).cast("long").alias("path_len"),
        n_params.cast("long").alias("n_params"),
        session_flag.alias("session_flag"),
    )
    return out.withColumn(
        "verdict",
        F.when(F.col("depth") > max_depth, "deep_path")
        .when(F.col("max_repeat") > max_seg_repeat, "repeat_segments")
        .when(F.col("path_len") > max_path_len, "long_path")
        .when(F.col("n_params") > max_params, "query_explosion")
        .when(F.col("session_flag"), "session_id")
        .otherwise("ok"),
    )


def url_template(url: Column) -> Column:
    """URL template key: canonical host+path with hex runs (≥8 chars) →
    '{h}' then digit runs → '{n}'.  '/item/8f14e45fceea167a' and
    '/item/45c48cce2e2d7fbd' collapse to one template — the
    sitemap-structure / trap-cluster key (hex FIRST, or its digit
    substrings would be rewritten out from under it).  Map-only."""
    canon = canonicalize_url(url)
    hostpath = F.concat(
        F.regexp_extract(canon, _URL_RE, 2), F.regexp_extract(canon, _URL_RE, 3)
    )
    return F.regexp_replace(
        F.regexp_replace(hostpath, "[0-9a-fA-F]{8,}", "{h}"), "[0-9]+", "{n}"
    )


def url_template_stats(
    df: DataFrame, id_col: str, url_col: str
) -> DataFrame:
    """Per URL-template fan-out stats — the template-level trap detector
    (one '/cal/{n}/{n}' template backing 50k distinct URLs is a calendar
    trap even though every individual URL passes `url_trap_flags`) and the
    site-structure inventory crawl planners prioritize from.

    ONE map-side-combined groupBy on the template key:
    (template, n_docs, n_pages = distinct canonical URLs).  Fan-out
    thresholding composes as a scan predicate on the result.
    """
    keyed = df.select(
        url_template(F.col(url_col)).alias("template"),
        canonicalize_url(F.col(url_col)).alias("canon_url"),
    )
    return keyed.groupBy("template").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("canon_url").alias("n_pages"),
    )


def crawl_politeness_waves(
    df: DataFrame, url_col: str, priority_col: str, per_wave: int = 2
) -> DataFrame:
    """Politeness-scheduled fetch waves: every frontier URL gets a wave
    number such that no host appears more than ``per_wave`` times per wave
    — the per-host rate cap every polite crawler enforces (robots
    crawl-delay semantics), turned into a deterministic batch schedule.

    Rank within host = row_number ordered by (priority DESC, canon_url ASC
    — a TOTAL order, so the schedule is rerun/partition invariant);
    wave = (rank-1) div per_wave.  High-priority pages on a crowded host
    wait their turn; singleton hosts all land in wave 0.

    Scale note: the window partitions by HOST, which is exactly the
    cardinality politeness is ABOUT — a host's fetch order is inherently
    sequential, so the per-host window is the semantics, not an accident.
    A pathological mega-host bounds one task at that host's frontier size;
    cap the frontier per host upstream (`url_trap_flags` +
    `url_template_stats` fan-out cuts) before scheduling.

    Output: (canon_url, host, priority, host_rank, wave).
    """
    from pyspark.sql import Window

    keyed = df.select(
        canonicalize_url(F.col(url_col)).alias("canon_url"),
        F.col(priority_col).alias("priority"),
    ).withColumn("host", F.regexp_extract("canon_url", _URL_RE, 2))
    w = Window.partitionBy("host").orderBy(
        F.col("priority").desc(), F.col("canon_url")
    )
    return keyed.select(
        "canon_url",
        "host",
        "priority",
        F.row_number().over(w).cast("long").alias("host_rank"),
    ).withColumn(
        # true integer division (div): exact at any rank, no float rounding
        "wave",
        F.expr(f"(host_rank - 1) div {int(per_wave)}").cast("long"),
    )


def host_blocklist_gate(
    df: DataFrame, id_col: str, url_col: str, blocklist: list[str]
) -> DataFrame:
    """Domain-blocklist gate with PARENT-DOMAIN suffix matching — the
    UT1/shallalist gating step of CCNet/RefinedWeb-style curation: listing
    'example.com' must block 'a.cdn.example.com' too, while
    'notexample.com' stays (label-boundary, NOT substring, matching).

    Each host expands to its dot-suffix chain ('a.b.com' → ['a.b.com',
    'b.com', 'com']) inside one row; blocked = overlap with the broadcast
    literal blocklist.  Map-only, zero shuffle, zero UDF; the blocklist is
    a scan-level array literal (same shape as the decontam bloom words —
    KBs per executor; a multi-million-entry UT1 list would swap to a
    broadcast join on the same suffix explode).

    Output: (id, canon_url, host, blocked_by, kept).  ``blocked_by`` is
    the lexicographically-first matching blocklist entry (auditable
    attribution), NULL when kept.
    """
    canon = canonicalize_url(F.col(url_col))
    host = F.regexp_extract(canon, _URL_RE, 2)
    segs = F.split(host, r"\.")
    suffixes = F.transform(
        F.sequence(F.lit(1), F.size(segs)),
        lambda i: F.array_join(F.slice(segs, i, F.size(segs)), "."),
    )
    bl = F.array(*[F.lit(b) for b in sorted(blocklist)])
    hits = F.array_sort(
        F.filter(bl, lambda b: F.array_contains(suffixes, b))
    )
    blocked_by = F.when(F.size(hits) > 0, F.element_at(hits, 1))
    return df.select(
        F.col(id_col).alias("id"),
        canon.alias("canon_url"),
        host.alias("host"),
        blocked_by.alias("blocked_by"),
        blocked_by.isNull().alias("kept"),
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


def recrawl_change_stats(
    df: DataFrame, id_col: str, url_col: str, ts_col: str, text_col: str
) -> DataFrame:
    """Per-host content-change telemetry across recrawls — the freshness
    signal an adaptive recrawl scheduler allocates budget by (Cho &
    Garcia-Molina 2000's synchronization policy): hosts whose pages
    change between consecutive fetches earn frequent revisits, static
    hosts are demoted, and the crawl spends its politeness-limited
    request budget where content actually moves.

    Per canonical URL, fetches order by (ts, id) — a TOTAL order, so the
    consecutive-pair comparison is rerun/partition invariant — and each
    fetch after the first compares its content fingerprint (md5 of the
    text; NULL → '') against the previous fetch.  Host rollup:

    * ``n_fetches`` / ``n_pages``   — crawl volume vs distinct pages.
    * ``n_recrawls`` / ``n_changed`` — consecutive-pair comparisons and
      how many showed new content.
    * ``change_rate_micro``         — n_changed/n_recrawls in BIGINT
      micro-units (0 when a host was never recrawled).
    * ``bucket``                    — 'hot' (>50%), 'warm' (>10%),
      'cold' (recrawled, ≤10%), 'static' (never recrawled) — the
      scheduler's revisit tier.

    Scale: the lag window partitions by canonical URL (bounded by the
    per-page recrawl count; cap pathological mega-recrawl URLs upstream
    with `url_trap_flags`), then ONE map-side-combined groupBy on host.
    """
    keyed = df.select(
        F.col(id_col).alias("id"),
        F.col(ts_col).alias("_ts"),
        canonicalize_url(F.col(url_col)).alias("canon_url"),
        F.md5(F.coalesce(F.col(text_col), F.lit(""))).alias("_fp"),
    ).withColumn("host", F.regexp_extract("canon_url", _URL_RE, 2))
    from pyspark.sql import Window

    w = Window.partitionBy("canon_url").orderBy("_ts", "id")
    prev = F.lag("_fp").over(w)
    flagged = keyed.select(
        "host",
        "canon_url",
        prev.isNotNull().alias("_is_recrawl"),
        (prev.isNotNull() & (F.col("_fp") != prev)).alias("_changed"),
    )
    rolled = flagged.groupBy("host").agg(
        F.count(F.lit(1)).alias("n_fetches"),
        F.countDistinct("canon_url").alias("n_pages"),
        F.sum(F.col("_is_recrawl").cast("long")).alias("n_recrawls"),
        F.sum(F.col("_changed").cast("long")).alias("n_changed"),
    )
    rate = F.when(
        F.col("n_recrawls") > 0,
        F.expr("n_changed * 1000000L div n_recrawls"),
    ).otherwise(F.lit(0).cast("long"))
    return rolled.select(
        "host",
        "n_fetches",
        "n_pages",
        "n_recrawls",
        "n_changed",
        rate.alias("change_rate_micro"),
    ).withColumn(
        "bucket",
        F.when(F.col("n_recrawls") == 0, "static")
        .when(F.col("change_rate_micro") > 500000, "hot")
        .when(F.col("change_rate_micro") > 100000, "warm")
        .otherwise("cold"),
    )


def sitemap_entries(
    df: DataFrame, host_col: str = "host", xml_col: str = "sitemap_xml"
) -> DataFrame:
    """Parse sitemap.xml payloads into frontier entries — the publisher's
    OWN inventory of pages worth crawling (the sitemaps.org protocol),
    the third discovery channel next to link extraction (`htmllinks`)
    and recrawl telemetry (`recrawl_change_stats`).

    Scan-level parse (zero UDF): ``<url>…</url>`` blocks via non-greedy
    `regexp_extract_all` (the `htmllinks.ANCHOR_PATTERN` discipline —
    Java and RE2 agree on lazy quantifiers and on '.' not crossing
    newlines), then per-block ``<loc>`` / optional ``<lastmod>``
    extraction; locs normalize through the shared URL canonicalizer so
    sitemap entries meet crawl-state keys.  ``lastmod`` stays an ISO-8601
    STRING ('' when the publisher omitted it) — ISO dates compare
    correctly as strings, engine-exactly.

    Output: (host, loc, canon_url, lastmod) — one row per sitemap entry.
    """
    blocks = F.regexp_extract_all(
        F.coalesce(F.col(xml_col), F.lit("")),
        F.lit("<url>(.*?)</url>"),
        F.lit(1),
    )
    exploded = df.select(
        F.col(host_col).alias("host"), F.explode(blocks).alias("block")
    )
    loc = F.regexp_extract(F.col("block"), "<loc>([^<]*)</loc>", 1)
    lastmod = F.regexp_extract(F.col("block"), "<lastmod>([^<]*)</lastmod>", 1)
    return exploded.select(
        "host",
        loc.alias("loc"),
        canonicalize_url(loc).alias("canon_url"),
        lastmod.alias("lastmod"),
    )


def sitemap_recrawl_queue(
    entries: DataFrame, crawl_state: DataFrame
) -> DataFrame:
    """Lastmod-driven recrawl queueing: join sitemap entries
    (`sitemap_entries`) against the crawl state (canon_url, last_crawl —
    the ISO date of the last successful fetch, e.g. derived from
    `url_dedup`'s kept copy) and decide, per page:

    * ``new``     — never crawled → queue.
    * ``changed`` — publisher says it changed after our last fetch
                    (lastmod > last_crawl, ISO string compare) → queue.
    * ``fresh``   — lastmod ≤ last_crawl → skip.
    * ``unknown`` — crawled before but no lastmod signal → skip here;
                    `recrawl_change_stats`' change-rate tiers own that
                    policy (sitemap silence is not evidence of change).

    ONE equi-join on canon_url (crawl state is the big side at 100 TB —
    the join shuffles on the same canonical-URL hash `url_dedup` already
    keys by, so co-partitioning/bucketing carries over), zero windows.

    Output: (canon_url, host, lastmod, last_crawl, reason, queue).
    """
    st = crawl_state.select(
        F.col("canon_url"), F.col("last_crawl").alias("last_crawl")
    )
    j = entries.join(st, "canon_url", "left")
    reason = (
        F.when(F.col("last_crawl").isNull(), "new")
        .when(F.col("lastmod") == "", "unknown")
        .when(F.col("lastmod") > F.col("last_crawl"), "changed")
        .otherwise("fresh")
    )
    return j.select(
        "canon_url",
        "host",
        "lastmod",
        "last_crawl",
        reason.alias("reason"),
        reason.isin("new", "changed").alias("queue"),
    )


def frontier_facts(df: DataFrame, url_col: str) -> DataFrame:
    """Per-canonical-URL frontier facts from one batch of discovered
    links: (canon_url, host, n_mentions).  ``n_mentions`` is the OPIC-ish
    priority mass (how often the crawl has seen this URL referenced) and
    an ADDITIVE lattice fact, so per-batch facts merge by summation
    (`frontier_append`) without ever re-scanning history batches — the
    maintained-index discipline of `link_graph_append` /
    `profile_shards`.  Junk/NULL URLs ('' canonical) are dropped here:
    the frontier is by definition fetchable addresses.

    ONE map-side-combined groupBy on the canonical-URL key.
    """
    keyed = df.select(
        canonicalize_url(F.col(url_col)).alias("canon_url")
    ).filter(F.col("canon_url") != "")
    return (
        keyed.groupBy("canon_url")
        .agg(F.count(F.lit(1)).alias("n_mentions"))
        .select(
            "canon_url",
            F.regexp_extract("canon_url", _URL_RE, 2).alias("host"),
            "n_mentions",
        )
    )


def frontier_append(existing: DataFrame, batch_facts: DataFrame) -> DataFrame:
    """Merge one batch's `frontier_facts` into the persisted frontier.
    Every column is a lattice fact (host is a pure function of the key,
    n_mentions additive), so append ≡ one-shot rebuild over
    history ∪ batch — the law the frontier_job test pins.  One
    map-side-combined groupBy on canon_url."""
    return (
        existing.unionByName(batch_facts)
        .groupBy("canon_url", "host")
        .agg(F.sum("n_mentions").alias("n_mentions"))
    )


def crawl_politeness_waves_rated(
    df: DataFrame,
    url_col: str,
    priority_col: str,
    rates: DataFrame,
    default_per_wave: int = 2,
) -> DataFrame:
    """`crawl_politeness_waves` with a PER-HOST rate table — the
    Crawl-delay-aware schedule: ``rates`` is (host, per_wave) (e.g.
    derived from `robots.robots_crawl_delays`; slower hosts get smaller
    per-wave budgets), hosts absent from the table use
    ``default_per_wave``.  Same TOTAL (priority DESC, canon_url) order
    within host; wave = (rank-1) div per_wave with true integer
    division.  The rate table is host-cardinality — a broadcast join.

    Output: (canon_url, host, priority, host_rank, per_wave, wave).
    """
    from pyspark.sql import Window

    keyed = (
        df.select(
            canonicalize_url(F.col(url_col)).alias("canon_url"),
            F.col(priority_col).alias("priority"),
        )
        .withColumn("host", F.regexp_extract("canon_url", _URL_RE, 2))
        .join(F.broadcast(rates.select("host", "per_wave")), "host", "left")
        .withColumn(
            "per_wave",
            F.coalesce(
                F.col("per_wave"), F.lit(int(default_per_wave))
            ).cast("long"),
        )
    )
    w = Window.partitionBy("host").orderBy(
        F.col("priority").desc(), F.col("canon_url")
    )
    return keyed.select(
        "canon_url",
        "host",
        "priority",
        F.row_number().over(w).cast("long").alias("host_rank"),
        "per_wave",
    ).withColumn(
        "wave", F.expr("(host_rank - 1) div per_wave").cast("long")
    )


def host_mirror_pairs(
    df: DataFrame,
    host_col: str,
    text_col: str,
    max_hosts_per_fp: int = 8,
) -> DataFrame:
    """Mirror-host detection (Bharat & Broder 1999's mirror problem):
    hosts serving near-identical CONTENT SETS are one logical site behind
    several names — crawling both wastes budget and double-counts every
    page, and URL-level dedup cannot see it (different hosts → different
    canonical URLs).  Content-set overlap catches it.

    Per host, the distinct set of content fingerprints (md5 of text;
    recrawls collapse first, so a page crawled twice is one vote); host
    pairs sharing a fingerprint accumulate shared counts and score
    set-Jaccard in BIGINT micro-units.

    Skew bound: a fingerprint present on more than ``max_hosts_per_fp``
    hosts is excluded from PAIRING (kept in host sizes) — template
    boilerplate served by thousands of unrelated hosts is not mirror
    evidence, and unbounded it would fan out H² pairs per digest (the
    bounded-bucket rule every dedup candidate generator here follows).
    Every shuffle moves 8-byte digests, never text.

    Output: (host_a, host_b, shared, n_a, n_b, jaccard_micro) for host
    pairs sharing ≥1 pairable fingerprint, host_a < host_b.
    """
    fps = df.select(
        F.col(host_col).alias("host"),
        F.md5(F.coalesce(F.col(text_col), F.lit(""))).alias("fp"),
    ).distinct()
    sizes = fps.groupBy("host").agg(F.count(F.lit(1)).alias("n_fp"))
    spread = fps.groupBy("fp").agg(F.count(F.lit(1)).alias("n_hosts"))
    pairable = fps.join(
        spread.filter(
            (F.col("n_hosts") >= 2)
            & (F.col("n_hosts") <= max_hosts_per_fp)
        ).select("fp"),
        "fp",
    )
    a = pairable.select(F.col("host").alias("host_a"), "fp")
    b = pairable.select(F.col("host").alias("host_b"), "fp")
    shared = (
        a.join(b, "fp")
        .filter(F.col("host_a") < F.col("host_b"))
        .groupBy("host_a", "host_b")
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    return (
        shared.join(
            sizes.select(
                F.col("host").alias("host_a"), F.col("n_fp").alias("n_a")
            ),
            "host_a",
        )
        .join(
            sizes.select(
                F.col("host").alias("host_b"), F.col("n_fp").alias("n_b")
            ),
            "host_b",
        )
        .select(
            "host_a",
            "host_b",
            "shared",
            "n_a",
            "n_b",
            F.expr(
                "shared * 1000000L div (n_a + n_b - shared)"
            ).alias("jaccard_micro"),
        )
    )


def crawl_community_waves(
    df: DataFrame,
    url_col: str,
    priority_col: str,
    communities: DataFrame,
    per_wave: int = 4,
) -> DataFrame:
    """Politeness waves budgeted per link-graph COMMUNITY instead of per
    host — the mirror-cluster rate cap: sister hosts that LPA (or
    `host_mirror_pairs`) groups together usually share infrastructure,
    so a per-host budget multiplied across 40 mirrors still hammers one
    origin.  ``communities`` is (host, community) — e.g.
    `htmllinks.label_propagation` over the host graph; hosts the graph
    has never seen fall back to their own singleton community, which
    degrades exactly to per-host politeness.

    Same deterministic schedule contract as `crawl_politeness_waves`:
    TOTAL (priority DESC, canon_url) order within community, wave =
    (rank−1) div per_wave.  The communities relation is host-cardinality
    (broadcast); the per-community window is the semantics — a shared
    origin's fetch order is inherently sequential.  Compose with the
    per-host form by scheduling against whichever is the binding
    constraint for the fleet; the two waves are separate facts, not a
    max (a max() merge can stack two same-host URLs into one wave and
    silently break the host cap).

    Output: (canon_url, host, community, priority, community_rank,
    wave)."""
    from pyspark.sql import Window

    keyed = (
        df.select(
            canonicalize_url(F.col(url_col)).alias("canon_url"),
            F.col(priority_col).alias("priority"),
        )
        .withColumn("host", F.regexp_extract("canon_url", _URL_RE, 2))
        .join(
            F.broadcast(
                communities.select(
                    F.col("host").alias("_ch"), F.col("community").alias("_cc")
                )
            ),
            F.col("host") == F.col("_ch"),
            "left",
        )
        .withColumn("community", F.coalesce(F.col("_cc"), F.col("host")))
        .drop("_ch", "_cc")
    )
    w = Window.partitionBy("community").orderBy(
        F.col("priority").desc(), F.col("canon_url")
    )
    return keyed.select(
        "canon_url",
        "host",
        "community",
        "priority",
        F.row_number().over(w).cast("long").alias("community_rank"),
    ).withColumn(
        # true integer division (div): exact at any rank, no float rounding
        "wave",
        F.expr(f"(community_rank - 1) div {int(per_wave)}").cast("long"),
    )
