"""HTML hyperlink extraction + the domain link graph.

Boilerplate stripping (``extractors/html_extract.py``) deliberately
DISCARDS link-dominated blocks; this module extracts what those blocks
contain — the ``<a href>`` edges — because at web scale the link graph
is itself a curation input: domain-level PageRank-ish authority,
internal/external link ratios, anchor-text quality (Common Crawl's
host-level web graph is exactly this relation).

Extraction is pure expression work: ``regexp_extract_all`` pulls hrefs
and anchor texts in one scan (two capture groups read with two passes
over the same compiled pattern, zipped positionally), then the existing
URL canonicalizer (`urls.canonicalize_url` / `urls.url_host`) normalizes
targets so the graph keys on real hosts — map-only until the graph
rollup's own groupBy, zero UDF.  Relative hrefs (no scheme) canonicalize
to the explicit '' junk group (the `exact_dedup` NULL-key rule: rows
never vanish on a NULL key); the graph keeps them under dst_host ''
so internal-link mass is still measured.

Anchor grammar: the practical ``<a href="...">text</a>`` form the HTML
fixture/payload emitters produce — no attribute reordering, no nested
tags inside the anchor (those anchors belong to the boilerplate
stripper's DOM walk, not this scan-level pass).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F

from mistral_ocr_pipeline_spark.operators.urls import (
    canonicalize_url,
    url_host,
)

# One pattern, two groups: 1 = href, 2 = anchor text.  Character-class
# only (no backtracking ambiguity) — Java regex and RE2 agree.
ANCHOR_PATTERN = r'<a href="([^"]*)">([^<]*)</a>'


def _anchor_pairs(html_col: str):
    """``array<struct<href,anchor>>`` of the anchors in the column."""
    pat = F.lit(ANCHOR_PATTERN)
    body = F.coalesce(F.col(html_col), F.lit(""))
    return F.zip_with(
        F.regexp_extract_all(body, pat, 1),
        F.regexp_extract_all(body, pat, 2),
        lambda h, a: F.struct(h.alias("href"), a.alias("anchor")),
    )


def html_links(
    df: DataFrame, id_col: str = "doc_id", html_col: str = "html"
) -> DataFrame:
    """One row per anchor: (id, link_idx, href, canon_url, dst_host,
    anchor, anchor_chars) in document order.  link_idx is 1-based;
    canon_url/dst_host are '' for junk and relative hrefs."""
    z = F.col("z")
    href = z.getField("href")
    anchor = z.getField("anchor")
    return df.select(
        F.col(id_col).alias("id"),
        F.posexplode(_anchor_pairs(html_col)).alias("p", "z"),
    ).select(
        "id",
        (F.col("p") + 1).cast("int").alias("link_idx"),
        href.alias("href"),
        canonicalize_url(href).alias("canon_url"),
        url_host(href).alias("dst_host"),
        anchor.alias("anchor"),
        F.length(anchor).cast("long").alias("anchor_chars"),
    )


def link_graph(
    df: DataFrame,
    id_col: str = "doc_id",
    html_col: str = "html",
    src_host_col: str = "src_host",
) -> DataFrame:
    """Domain-level link graph: (src_host, dst_host, n_links, n_docs,
    total_anchor_chars, internal) — one edge per ordered host pair.
    ``internal`` marks same-host edges (site navigation) so authority
    rollups can drop them the way host-graph PageRank does.  The source
    host rides THROUGH the explode (no join back to the page table), so
    the whole job is scan → Generate → ONE map-side-combinable groupBy
    on the (small) host-pair domain."""
    z = F.col("z")
    anchor = z.getField("anchor")
    links = df.select(
        F.col(id_col).alias("id"),
        F.col(src_host_col).alias("src_host"),
        F.explode(_anchor_pairs(html_col)).alias("z"),
    ).select(
        "id",
        "src_host",
        url_host(z.getField("href")).alias("dst_host"),
        F.length(anchor).cast("long").alias("anchor_chars"),
    )
    return links.groupBy("src_host", "dst_host").agg(
        F.count(F.lit(1)).alias("n_links"),
        F.countDistinct("id").alias("n_docs"),
        F.sum("anchor_chars").alias("total_anchor_chars"),
        F.max(F.col("src_host") == F.col("dst_host")).alias("internal"),
    )


def host_pagerank(
    edges: DataFrame,
    src_col: str = "src_host",
    dst_col: str = "dst_host",
    n_iter: int = 5,
    d: float = 0.85,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """DIRECTED PageRank with dangling-mass redistribution over the
    host graph — the web-graph authority score (Page et al. 1999;
    Common Crawl publishes exactly this over its host graph):

        pr'(v) = (1−d)/N + d·( Σ_{(u,v)∈E} pr(u)/outdeg(u) + m/N )

    where m is the total rank sitting on DANGLING hosts (no out-links —
    the link-graph fixture's '' junk sink is one).  This differs from
    `dedup.pagerank_canonical`, which symmetrizes edges for undirected
    dedup-cluster canonicality; authority needs direction kept.

    Scale shape mirrors `pagerank_canonical`: static 1/outdeg edge
    weights computed once; per round ONE shuffle on dst (the
    contribution groupBy) plus a 1-row dangling-mass broadcast, with
    lineage truncated per round (localCheckpoint, or a reliable
    ``checkpoint_dir`` on real clusters — pr is referenced TWICE per
    round, so an uncheckpointed plan doubles each iteration).  The
    host-pair relation is orders of magnitude smaller than the page
    corpus; the pages are never re-read.  Returns (host, pagerank)
    rounded to 9 dp — the pinned convention that keeps the whole
    recurrence SQL-unrollable."""
    spark = edges.sparkSession
    if checkpoint_dir is not None:
        spark.sparkContext.setCheckpointDir(checkpoint_dir)

    def _ckpt(df: DataFrame) -> DataFrame:
        return (
            df.checkpoint(eager=True)
            if checkpoint_dir is not None
            else df.localCheckpoint(eager=True)
        )

    e = (
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .distinct()
    )
    nodes = _ckpt(
        e.select(F.col("src").alias("host"))
        .union(e.select(F.col("dst").alias("host")))
        .distinct()
    )
    n_total = nodes.count()
    if n_total == 0:
        return nodes.select("host", F.lit(0.0).alias("pagerank"))
    deg = e.groupBy("src").agg(F.count(F.lit(1)).cast("double").alias("deg"))
    # static per-edge weight 1/outdeg(src), computed once, reused per round
    ed = _ckpt(
        e.join(deg, "src").select(
            "src", "dst", (F.lit(1.0) / F.col("deg")).alias("w")
        )
    )
    linked = ed.select("src").distinct()
    base = (1.0 - d) / n_total
    pr = _ckpt(nodes.select("host", F.lit(1.0 / n_total).alias("pr")))
    for _ in range(n_iter):
        dang = pr.join(linked, pr["host"] == linked["src"], "left_anti").agg(
            F.coalesce(F.sum("pr"), F.lit(0.0)).alias("m")
        )
        contrib = (
            ed.join(pr, ed["src"] == pr["host"])
            .groupBy("dst")
            .agg(F.sum(F.col("pr") * F.col("w")).alias("s"))
        )
        pr = _ckpt(
            nodes.join(contrib, nodes["host"] == contrib["dst"], "left")
            .crossJoin(F.broadcast(dang))
            .select(
                "host",
                (
                    F.lit(base)
                    + F.lit(d)
                    * (
                        F.coalesce(F.col("s"), F.lit(0.0))
                        + F.col("m") / F.lit(float(n_total))
                    )
                ).alias("pr"),
            )
        )
    return pr.select("host", F.round("pr", 9).alias("pagerank"))


def link_graph_append(
    stats: DataFrame,
    batch_df: DataFrame,
    id_col: str = "doc_id",
    html_col: str = "html",
    src_host_col: str = "src_host",
) -> DataFrame:
    """Incremental link-graph maintenance: merge a new page batch into
    the persisted host-graph fact table WITHOUT re-scanning history
    pages.  Every stored column is a lattice fact — n_links /
    total_anchor_chars additive sums, n_docs additive under the ingest
    contract that each page arrives in exactly one batch, internal a
    bool_or — so append ≡ one-shot rebuild by the same merge law the
    BM25/profile/pathology fact tables use (the `link_graph_append`
    oracle hash-proves it against a full-corpus rebuild).  Cost: the
    BATCH scan plus one groupBy on the (small) host-pair relation."""
    b = link_graph(batch_df, id_col, html_col, src_host_col)
    return (
        stats.unionByName(b)
        .groupBy("src_host", "dst_host")
        .agg(
            F.sum("n_links").alias("n_links"),
            F.sum("n_docs").alias("n_docs"),
            F.sum("total_anchor_chars").alias("total_anchor_chars"),
            F.max("internal").alias("internal"),
        )
    )


def hits_scores(
    edges: DataFrame,
    src_col: str = "src_host",
    dst_col: str = "dst_host",
    n_iter: int = 5,
) -> DataFrame:
    """HITS hubs & authorities (Kleinberg 1999) over the directed host
    graph — the complement to `host_pagerank`: authority(v) = Σ hub(u)
    over in-links, hub(u) = Σ authority(v) over out-links, each vector
    L1-normalized after its update (sum-normalization keeps the whole
    recurrence division-only and SQL-replayable; the classic L2 variant
    only changes the norm, not the ranking).  Good hubs in a curation
    context are directory/navigation hosts; good authorities are the
    content hosts worth crawling deeper.

    Same scale shape as `host_pagerank`: per iteration TWO shuffles on
    the host-pair relation (one per direction) + two 1-row broadcast
    sums, lineage truncated per round via localCheckpoint.  Returns
    (host, authority, hub) rounded to 9 dp."""

    def _ckpt(df: DataFrame) -> DataFrame:
        return df.localCheckpoint(eager=True)

    e = (
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .distinct()
    )
    nodes = _ckpt(
        e.select(F.col("src").alias("host"))
        .union(e.select(F.col("dst").alias("host")))
        .distinct()
    )
    n_total = nodes.count()
    if n_total == 0:
        return nodes.select(
            "host", F.lit(0.0).alias("authority"), F.lit(0.0).alias("hub")
        )
    e = _ckpt(e)
    a = _ckpt(nodes.select("host", F.lit(1.0 / n_total).alias("v")))
    h = _ckpt(nodes.select("host", F.lit(1.0 / n_total).alias("v")))
    for _ in range(n_iter):
        raw_a = (
            nodes.join(e, nodes["host"] == e["dst"], "left")
            .join(h.withColumnRenamed("host", "_hh"), e["src"] == F.col("_hh"), "left")
            .groupBy(nodes["host"])
            .agg(F.coalesce(F.sum("v"), F.lit(0.0)).alias("raw"))
        )
        tot_a = raw_a.agg(F.sum("raw").alias("t"))
        a = _ckpt(
            raw_a.crossJoin(F.broadcast(tot_a)).select(
                "host", (F.col("raw") / F.col("t")).alias("v")
            )
        )
        raw_h = (
            nodes.join(e, nodes["host"] == e["src"], "left")
            .join(a.withColumnRenamed("host", "_ah"), e["dst"] == F.col("_ah"), "left")
            .groupBy(nodes["host"])
            .agg(F.coalesce(F.sum("v"), F.lit(0.0)).alias("raw"))
        )
        tot_h = raw_h.agg(F.sum("raw").alias("t"))
        h = _ckpt(
            raw_h.crossJoin(F.broadcast(tot_h)).select(
                "host", (F.col("raw") / F.col("t")).alias("v")
            )
        )
    return (
        a.withColumnRenamed("v", "authority")
        .join(h.withColumnRenamed("v", "hub"), "host")
        .select(
            "host",
            F.round("authority", 9).alias("authority"),
            F.round("hub", 9).alias("hub"),
        )
    )


# <link rel="canonical" href="..."> — the page's own declared canonical
# URL.  Fixed attribute order like the anchor grammar; character-class
# only, first match wins (a page declares at most one; extra
# declarations are ignored the way browsers ignore them).
CANONICAL_PATTERN = r'<link rel="canonical" href="([^"]*)"'


def canonical_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    html_col: str = "html",
    url_col: str = "url",
) -> DataFrame:
    """rel=canonical-aware crawl dedup: pages DECLARING a canonical URL
    group under it (print views, session-id variants, AMP pages all
    point at one canonical), pages declaring none group under their own
    fetch URL — both normalized through `urls.canonicalize_url` so the
    declared form and the crawled form of the same page meet.  A junk
    declaration ('' after canonicalization: relative href, garbage)
    falls back to the page's own URL rather than lumping every broken
    page into one group.

    Per group the kept copy is the SELF-CANONICAL page when one exists
    (the canonical target itself — crawlers prefer it over any
    variant), else the lowest id; one map-side-combinable max(struct),
    no window.  Returns (id, url, canon_key, is_canonical, canonical_id,
    group_size)."""
    page_url = canonicalize_url(F.col(url_col))
    decl_raw = F.regexp_extract(
        F.coalesce(F.col(html_col), F.lit("")), CANONICAL_PATTERN, 1
    )
    decl = canonicalize_url(decl_raw)
    canon_key = F.when(decl != "", decl).otherwise(page_url)
    keyed = df.select(
        F.col(id_col).alias("id"),
        F.col(url_col).alias("url"),
        canon_key.alias("canon_key"),
        (canon_key == page_url).alias("self_canon"),
    )
    best = keyed.groupBy("canon_key").agg(
        F.count(F.lit(1)).alias("group_size"),
        F.max(
            F.struct(
                F.col("self_canon").alias("sc"),
                (-F.col("id")).alias("ni"),
            )
        ).alias("b"),
    )
    return keyed.join(best, "canon_key").select(
        "id",
        "url",
        "canon_key",
        (F.col("id") == -F.col("b").getField("ni")).alias("is_canonical"),
        (-F.col("b").getField("ni")).alias("canonical_id"),
        "group_size",
    )


def label_propagation(
    edges: DataFrame,
    src_col: str = "src_host",
    dst_col: str = "dst_host",
    n_iter: int = 4,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Community detection by synchronous label propagation (Raghavan,
    Albert & Kumara 2007) over the UNDIRECTED host graph — the cheap
    community pass that complements the family's PageRank (authority),
    HITS (hubs), and connected components (reachability): LPA splits a
    connected web neighbourhood into its densely-linked cores, which is
    what per-community crawl budgeting, mirror-cluster triage, and
    domain-mix audits actually want (components are far too coarse —
    the web is one giant component).

    Deterministic variant: edges are symmetrized, de-duplicated, and
    self-loop-stripped; every node starts labeled with its own id; each
    round every node adopts the PLURALITY label of its neighbours, ties
    broken to the SMALLEST label string (the published random tie-break
    would destroy replayability) — and runs a FIXED ``n_iter`` rounds,
    not to convergence (synchronous LPA can 2-cycle on bipartite
    structure; fixed rounds keep the recurrence SQL-unrollable, the
    unrolled-Lloyd convention).  Known consequence of determinism: when
    a round's vote TIES (e.g. two 3-cliques across a bridge), the
    min-label wins and can leak across the cut — communities are crisp
    where plurality actually decides (dense cores vs bridges), which is
    the web-host regime; tie-dominated toy graphs degrade toward
    connected components (pinned in tests).

    Scale shape mirrors `host_pagerank`: the host-pair relation is
    orders of magnitude smaller than the page corpus; each round is ONE
    join of the label table to the symmetric edge list, one map-side-
    combinable (node, label) count, and a per-node argmax window;
    lineage is truncated per round (labels are referenced once per
    round but the plan would still double).  Returns (host, community)
    — community ids are the winning member host, so they are stable,
    human-readable keys."""
    spark = edges.sparkSession
    if checkpoint_dir is not None:
        spark.sparkContext.setCheckpointDir(checkpoint_dir)

    def _ckpt(df: DataFrame) -> DataFrame:
        return (
            df.checkpoint(eager=True)
            if checkpoint_dir is not None
            else df.localCheckpoint(eager=True)
        )

    e = edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
    und = _ckpt(
        e.unionByName(
            e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    lab = _ckpt(
        und.select(F.col("src").alias("host"))
        .distinct()
        .select("host", F.col("host").alias("lab"))
    )
    for _ in range(n_iter):
        nbr = und.join(
            lab.select(F.col("host").alias("dst"), "lab"), "dst"
        ).select(F.col("src").alias("host"), "lab")
        cnt = nbr.groupBy("host", "lab").agg(F.count(F.lit(1)).alias("n"))
        w = W.partitionBy("host").orderBy(F.col("n").desc(), F.col("lab").asc())
        lab = _ckpt(
            cnt.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("host", "lab")
        )
    return lab.select("host", F.col("lab").alias("community"))
