"""Pins for markdown-structure extraction (operators/mdstruct.py) and
HTML link extraction (operators/htmllinks.py): grammar edge branches,
NULL survival, and the zero-shuffle plan contracts."""

from pyspark.sql import functions as F


def _cells(spark, text):
    from mistral_ocr_pipeline_spark.operators.mdstruct import (
        pipe_table_cells,
    )

    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    return pipe_table_cells(df).orderBy(
        "table_idx", "row_idx", "col_idx"
    ).collect()


class TestPipeTables:
    def test_basic_table_header_and_rows(self, spark):
        md = (
            "intro\n| a | b |\n|---|---|\n| 1 | 2 |\n| 3 | 4 |\ntail"
        )
        out = _cells(spark, md)
        assert [(r.row_idx, r.col_idx, r.cell) for r in out] == [
            (0, 1, "a"), (0, 2, "b"),
            (1, 1, "1"), (1, 2, "2"),
            (2, 1, "3"), (2, 2, "4"),
        ]
        assert all(r.table_idx == 1 for r in out)

    def test_run_without_separator_is_not_a_table(self, spark):
        assert _cells(spark, "| a | b |\n| c | d |\nprose") == []

    def test_separator_needs_a_dash(self, spark):
        # '|  :  |' matches the char class but has no dash → invalid
        assert _cells(spark, "| a |\n| : |\n| v |") == []

    def test_unterminated_table_at_eof_flushes(self, spark):
        out = _cells(spark, "pre\n| h |\n| - |\n| v |")
        assert [(r.row_idx, r.cell) for r in out] == [(0, "h"), (1, "v")]

    def test_indented_pipe_line_joins_run(self, spark):
        out = _cells(spark, "| a |\n|-|\n  | b |")
        assert [(r.row_idx, r.cell) for r in out] == [(0, "a"), (1, "b")]

    def test_missing_trailing_pipe_and_ragged(self, spark):
        from mistral_ocr_pipeline_spark.operators.mdstruct import (
            pipe_table_stats,
        )

        md = "| a | b |\n|--|--|\n| 1 | 2\n| 3 | 4 | 5 |"
        out = _cells(spark, md)
        assert [(r.row_idx, r.col_idx, r.cell) for r in out if r.row_idx == 1] == [
            (1, 1, "1"), (1, 2, "2")
        ]
        df = spark.createDataFrame([(1, md)], "doc_id long, text string")
        st = pipe_table_stats(df).collect()[0]
        assert (st.n_rows, st.n_cols, st.ragged) == (2, 2, True)

    def test_two_tables_index_in_doc_order(self, spark):
        md = "| a |\n|-|\nmid\n| b |\n|-|\n| x |"
        out = _cells(spark, md)
        assert sorted({r.table_idx for r in out}) == [1, 2]

    def test_null_and_pipe_free_docs_emit_nothing(self, spark):
        from mistral_ocr_pipeline_spark.operators.mdstruct import (
            pipe_table_cells,
        )

        df = spark.createDataFrame(
            [(1, None), (2, "plain prose")], "doc_id long, text string"
        )
        assert pipe_table_cells(df).count() == 0

    def test_stats_not_ragged_and_zero_data_rows(self, spark):
        from mistral_ocr_pipeline_spark.operators.mdstruct import (
            pipe_table_stats,
        )

        df = spark.createDataFrame(
            [(1, "| a | b |\n|--|--|")], "doc_id long, text string"
        )
        st = pipe_table_stats(df).collect()[0]
        assert (st.n_rows, st.n_cols, st.ragged) == (0, 2, False)

    def test_zero_shuffle_plan(self, spark):
        from mistral_ocr_pipeline_spark.operators.mdstruct import (
            pipe_table_cells,
            pipe_table_stats,
        )

        df = spark.createDataFrame(
            [(1, "| a |\n|-|\n| b |")], "doc_id long, text string"
        )
        for op in (pipe_table_cells, pipe_table_stats):
            plan = (
                op(df)._jdf.queryExecution().executedPlan().toString()
            )
            assert "Exchange" not in plan


class TestMdSections:
    def _secs(self, spark, text):
        from mistral_ocr_pipeline_spark.operators.mdstruct import md_sections

        df = spark.createDataFrame([(1, text)], "doc_id long, text string")
        return md_sections(df).orderBy("section_idx").collect()

    def test_preamble_and_levels_and_offsets(self, spark):
        md = "pre line\n# Title\nbody a\nbody b\n## Sub\n\n### x\ntail"
        out = self._secs(spark, md)
        assert [
            (r.section_idx, r.level, r.heading, r.start_line, r.n_lines)
            for r in out
        ] == [
            (1, 0, "", 0, 1),
            (2, 1, "Title", 1, 2),
            (3, 2, "Sub", 4, 1),
            (4, 3, "x", 6, 1),
        ]
        assert out[1].n_chars == len("body a\nbody b")
        # the blank line under '## Sub' is one content line of 0 chars
        assert out[2].n_chars == 0

    def test_doc_opening_with_heading_has_no_preamble(self, spark):
        out = self._secs(spark, "# Only")
        assert [(r.section_idx, r.level, r.heading, r.n_lines) for r in out] == [
            (1, 1, "Only", 0)
        ]

    def test_seven_hashes_is_not_a_heading(self, spark):
        out = self._secs(spark, "####### nope\n# real")
        assert [(r.level, r.heading) for r in out] == [(0, ""), (1, "real")]

    def test_hash_without_space_is_content(self, spark):
        out = self._secs(spark, "#nope")
        assert [(r.level, r.heading, r.n_lines) for r in out] == [(0, "", 1)]

    def test_null_doc_survives_as_empty_preamble(self, spark):
        out = self._secs(spark, None)
        assert [(r.level, r.n_lines, r.n_chars) for r in out] == [(0, 1, 0)]

    def test_zero_shuffle_plan(self, spark):
        from mistral_ocr_pipeline_spark.operators.mdstruct import md_sections

        df = spark.createDataFrame([(1, "# a\nb")], "doc_id long, text string")
        plan = md_sections(df)._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan


class TestHtmlLinks:
    def _links(self, spark, html):
        from mistral_ocr_pipeline_spark.operators.htmllinks import html_links

        df = spark.createDataFrame([(1, html)], "doc_id long, html string")
        return html_links(df).orderBy("link_idx").collect()

    def test_extract_canonicalize_and_junk_groups(self, spark):
        html = (
            '<a href="https://WWW.Site1.Example.com:443/p/3?utm_source=z&x=1">'
            "read more</a>"
            '<a href="/rel/9">rel</a>'
            '<a href="mailto:x@y">mail</a>'
        )
        out = self._links(spark, html)
        assert [(r.link_idx, r.canon_url, r.dst_host, r.anchor) for r in out] == [
            (1, "https://site1.example.com/p/3?x=1", "site1.example.com",
             "read more"),
            (2, "", "", "rel"),
            (3, "", "", "mail"),
        ]
        assert out[0].anchor_chars == 9

    def test_null_and_anchor_free_pages_emit_nothing(self, spark):
        from mistral_ocr_pipeline_spark.operators.htmllinks import html_links

        df = spark.createDataFrame(
            [(1, None), (2, "<p>no anchors</p>")], "doc_id long, html string"
        )
        assert html_links(df).count() == 0

    def test_link_graph_internal_flag_and_rollup(self, spark):
        from mistral_ocr_pipeline_spark.operators.htmllinks import link_graph

        rows = [
            (1, '<a href="https://a.com/x">one</a>'
                '<a href="http://WWW.A.com:80/y">two</a>', "a.com"),
            (2, '<a href="https://a.com/z">three</a>', "b.com"),
        ]
        df = spark.createDataFrame(rows, "doc_id long, html string, src string")
        out = {
            (r.src_host, r.dst_host): r
            for r in link_graph(df, "doc_id", "html", "src").collect()
        }
        e1 = out[("a.com", "a.com")]
        assert (e1.n_links, e1.n_docs, bool(e1.internal)) == (2, 1, True)
        e2 = out[("b.com", "a.com")]
        assert (e2.n_links, e2.n_docs, bool(e2.internal)) == (1, 1, False)
        assert e2.total_anchor_chars == len("three")

    def test_link_graph_single_exchange_plan(self, spark):
        from mistral_ocr_pipeline_spark.operators.htmllinks import link_graph

        df = spark.createDataFrame(
            [(1, '<a href="https://a.com/x">one</a>', "a.com")],
            "doc_id long, html string, src string",
        )
        plan = (
            link_graph(df, "doc_id", "html", "src")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        # one aggregation exchange (the groupBy's own), nothing else
        assert plan.count("Exchange") <= 2  # partial agg + distinct-doc agg
        assert "SortMergeJoin" not in plan and "BroadcastHashJoin" not in plan


class TestHostPagerank:
    def _edges(self, spark, rows):
        return spark.createDataFrame(rows, "src_host string, dst_host string")

    def test_one_iteration_hand_computed_with_dangling(self, spark):
        from mistral_ocr_pipeline_spark.operators.htmllinks import (
            host_pagerank,
        )

        # A->B, B->A, A->C; C dangles.  pr0 = 1/3 each, m = 1/3:
        # pr1(A) = .05 + .85*(1/3 + 1/9), pr1(B) = pr1(C)
        #        = .05 + .85*(1/6 + 1/9)
        e = self._edges(spark, [("A", "B"), ("B", "A"), ("A", "C")])
        got = {
            r.host: round(r.pagerank, 6)
            for r in host_pagerank(e, n_iter=1).collect()
        }
        assert got == {
            "A": round(0.05 + 0.85 * (1 / 3 + 1 / 9), 6),
            "B": round(0.05 + 0.85 * (1 / 6 + 1 / 9), 6),
            "C": round(0.05 + 0.85 * (1 / 6 + 1 / 9), 6),
        }

    def test_rank_mass_conserved_and_sink_beats_sources(self, spark):
        from mistral_ocr_pipeline_spark.operators.htmllinks import (
            host_pagerank,
        )

        # 3-cycle where every node also links the sink: sink collects
        # double in-mass and must outrank the cycle nodes.
        e = self._edges(
            spark,
            [("a", "b"), ("b", "c"), ("c", "a"),
             ("a", "s"), ("b", "s"), ("c", "s")],
        )
        out = {r.host: r.pagerank for r in host_pagerank(e, n_iter=5).collect()}
        assert abs(sum(out.values()) - 1.0) < 1e-6
        assert out["s"] > out["a"] == out["b"] == out["c"]

    def test_duplicate_edges_collapse(self, spark):
        from mistral_ocr_pipeline_spark.operators.htmllinks import (
            host_pagerank,
        )

        once = host_pagerank(
            self._edges(spark, [("A", "B")]), n_iter=3
        ).collect()
        twice = host_pagerank(
            self._edges(spark, [("A", "B"), ("A", "B")]), n_iter=3
        ).collect()
        assert sorted(map(tuple, once)) == sorted(map(tuple, twice))


class TestLabelPropagation:
    def _edges(self, spark, pairs):
        from pyspark.sql import functions as F  # noqa: F401

        return spark.createDataFrame(pairs, "src_host string, dst_host string")

    def test_two_cliques_one_bridge_split(self, spark):
        """Two 4-cliques joined by a single bridge edge resolve to two
        communities with member-host ids.  4-cliques, not 3: in a
        3-clique + bridge every round's vote TIES and the deterministic
        min-label tie-break floods the smaller label across the bridge
        (exactly why published LPA randomizes ties); with 4-cliques the
        within-clique plurality strictly outvotes the bridge, which is
        the regime the operator documents."""
        import itertools

        from mistral_ocr_pipeline_spark.operators.htmllinks import (
            label_propagation,
        )

        a = ["a1", "a2", "a3", "a4"]
        b = ["b1", "b2", "b3", "b4"]
        pairs = (
            list(itertools.combinations(a, 2))
            + list(itertools.combinations(b, 2))
            + [("a1", "b1")]
        )
        out = {
            r.host: r.community
            for r in label_propagation(
                self._edges(spark, pairs), n_iter=4
            ).collect()
        }
        assert len(out) == 8
        assert {out[h] for h in a} == {"a1"}
        assert {out[h] for h in b} == {"b1"}

    def test_deterministic_under_repartition_and_direction(self, spark):
        """Symmetrization makes edge direction irrelevant; labels are
        partition-invariant (smallest-label tie-break, no randomness)."""
        from mistral_ocr_pipeline_spark.operators.htmllinks import (
            label_propagation,
        )

        pairs = [("x", "y"), ("y", "z"), ("z", "x"), ("z", "w")]
        fwd = self._edges(spark, pairs)
        rev = self._edges(spark, [(b, a) for a, b in pairs]).repartition(5)
        a = sorted(map(tuple, label_propagation(fwd, n_iter=3).collect()))
        b = sorted(map(tuple, label_propagation(rev, n_iter=3).collect()))
        assert a == b and len(a) == 4

    def test_labels_are_always_member_hosts(self, spark):
        """Invariant: every community id is the id of some node in the
        graph (labels only ever copy existing node ids), and every node
        gets exactly one label."""
        from mistral_ocr_pipeline_spark.operators.htmllinks import (
            label_propagation,
        )

        import random

        rng = random.Random(9)
        hosts = [f"h{i}" for i in range(30)]
        pairs = [
            (rng.choice(hosts), rng.choice(hosts)) for _ in range(80)
        ]
        out = label_propagation(
            self._edges(spark, pairs), n_iter=4
        ).collect()
        nodes = {h for p in pairs for h in p if p[0] != p[1]}
        seen = [r.host for r in out]
        assert sorted(seen) == sorted(set(seen))  # one row per node
        assert {r.community for r in out} <= nodes

    def test_self_loops_and_duplicate_edges_ignored(self, spark):
        """Self-loops are stripped and duplicate edges carry no extra
        plurality weight (the edge set is DISTINCT)."""
        from mistral_ocr_pipeline_spark.operators.htmllinks import (
            label_propagation,
        )

        # p-q duplicated 3x must not outvote the q-r side of the triangle
        pairs = [("p", "p"), ("p", "q"), ("p", "q"), ("p", "q"), ("q", "r")]
        out = {
            r.host: r.community
            for r in label_propagation(
                self._edges(spark, pairs), n_iter=2
            ).collect()
        }
        assert set(out) == {"p", "q", "r"}
        base = {
            r.host: r.community
            for r in label_propagation(
                self._edges(spark, [("p", "q"), ("q", "r")]), n_iter=2
            ).collect()
        }
        assert out == base


class TestMdSectionText:
    def test_sec_text_slices_back_to_source(self, spark):
        from mistral_ocr_pipeline_spark.operators.mdstruct import (
            md_section_text,
        )

        md = "pre\n# A\nx y\nz\n## B\nw"
        df = spark.createDataFrame([(1, md)], "doc_id long, text string")
        out = md_section_text(df).orderBy("section_idx").collect()
        assert [(r.section_idx, r.heading, r.sec_text) for r in out] == [
            (1, "", "pre"),
            (2, "A", "x y\nz"),
            (3, "B", "w"),
        ]
        # content lines re-join to the source minus heading lines
        lines = md.split("\n")
        joined = [r.sec_text for r in out]
        assert "\n".join(joined).split("\n") == [
            ln for ln in lines if not ln.startswith("#")
        ]


class TestTableLinearize:
    def test_pairs_and_ragged_truncation(self, spark):
        from mistral_ocr_pipeline_spark.operators.mdstruct import (
            pipe_table_linearize,
        )

        md = "| a | b |\n|--|--|\n| 1 | 2 |\n| 3 |\n| 4 | 5 | 6 |"
        df = spark.createDataFrame([(1, md)], "doc_id long, text string")
        out = pipe_table_linearize(df).orderBy("row_idx").collect()
        assert [(r.row_idx, r.row_text) for r in out] == [
            (1, "a: 1 | b: 2"),
            (2, "a: 3"),          # short row: pairs stop at the row
            (3, "a: 4 | b: 5"),   # long row: extras carry no header
        ]

    def test_zero_shuffle_plan(self, spark):
        from mistral_ocr_pipeline_spark.operators.mdstruct import (
            pipe_table_linearize,
        )

        df = spark.createDataFrame(
            [(1, "| a |\n|-|\n| b |")], "doc_id long, text string"
        )
        plan = (
            pipe_table_linearize(df)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Exchange" not in plan


class TestMdImages:
    def test_matches_and_non_matches(self, spark):
        from mistral_ocr_pipeline_spark.operators.mdstruct import md_images

        md = "x ![Fig 1](a.png) y ![](b.jpg) z ![unclosed](open"
        df = spark.createDataFrame(
            [
                (1, md),
                (2, "plain [link](not-img.html)"),  # no '!' — not an image
                (3, None),
            ],
            "doc_id long, text string",
        )
        out = md_images(df).orderBy("id", "img_idx").collect()
        assert [(r.id, r.img_idx, r.alt, r.src) for r in out] == [
            (1, 1, "Fig 1", "a.png"),
            (1, 2, "", "b.jpg"),
        ]
        assert out[0].alt_chars == 5


class TestLinkGraphAppend:
    def test_append_equals_rebuild(self, spark):
        from mistral_ocr_pipeline_spark.operators.htmllinks import (
            link_graph,
            link_graph_append,
        )

        rows = [
            (1, '<a href="https://a.com/x">one</a>', "b.com"),
            (2, '<a href="https://a.com/y">two</a>'
                '<a href="https://c.com/z">three</a>', "b.com"),
            (3, '<a href="https://a.com/x">four</a>', "a.com"),
        ]
        df = spark.createDataFrame(rows, "doc_id long, html string, src string")
        hist = df.filter(F.col("doc_id") <= 2)
        batch = df.filter(F.col("doc_id") == 3)
        merged = link_graph_append(
            link_graph(hist, "doc_id", "html", "src"),
            batch, "doc_id", "html", "src",
        )
        rebuilt = link_graph(df, "doc_id", "html", "src")
        key = lambda r: (r.src_host, r.dst_host)
        assert sorted(map(tuple, merged.collect()), key=lambda t: t[:2]) == \
               sorted(map(tuple, rebuilt.collect()), key=lambda t: t[:2])


class TestHits:
    def test_bipartite_hand_structure(self, spark):
        from mistral_ocr_pipeline_spark.operators.htmllinks import hits_scores

        # h1 links both authorities, h2/h3 one each; a1 has 3 in-links.
        e = spark.createDataFrame(
            [("h1", "a1"), ("h1", "a2"), ("h2", "a1"), ("h3", "a1")],
            "src_host string, dst_host string",
        )
        out = {r.host: r for r in hits_scores(e, n_iter=3).collect()}
        assert out["a1"].authority > out["a2"].authority > 0
        assert out["h1"].hub > out["h2"].hub == out["h3"].hub > 0
        # pure hubs have no authority, pure authorities no hub score
        assert out["h1"].authority == 0.0 and out["a1"].hub == 0.0
        # L1 normalization: each vector sums to 1
        assert abs(sum(r.authority for r in out.values()) - 1.0) < 1e-6
        assert abs(sum(r.hub for r in out.values()) - 1.0) < 1e-6


class TestCanonicalDedup:
    def _run(self, spark, rows):
        from mistral_ocr_pipeline_spark.operators.htmllinks import (
            canonical_dedup,
        )

        df = spark.createDataFrame(
            rows, "doc_id long, html string, url string"
        )
        return {r.id: r for r in canonical_dedup(df).collect()}

    def test_variants_group_under_declaration_and_self_canon_wins(self, spark):
        decl = '<link rel="canonical" href="https://a.com/p">'
        out = self._run(
            spark,
            [
                # the canonical target itself, crawled late (high id)
                (9, decl, "https://a.com/p"),
                # variants declaring the same canonical
                (1, decl, "https://a.com/p?utm_source=x"),
                (2, decl, "HTTP://WWW.A.com:80/p"),
            ],
        )
        assert {r.canon_key for r in out.values()} == {"https://a.com/p"}
        # the utm variant canonicalizes to the key itself, so ids 1 and
        # 9 are BOTH self-canonical forms; the tie-break keeps lowest id
        assert out[1].is_canonical and out[1].group_size == 3
        # http-scheme variant is NOT self-canonical despite same path
        assert not out[2].is_canonical and not out[9].is_canonical
        assert out[9].canonical_id == 1

    def test_junk_declaration_falls_back_to_own_url(self, spark):
        out = self._run(
            spark,
            [
                (1, '<link rel="canonical" href="/print">', "https://a.com/x"),
                (2, None, "https://b.com/y"),
            ],
        )
        assert out[1].canon_key == "https://a.com/x" and out[1].is_canonical
        assert out[2].canon_key == "https://b.com/y" and out[2].is_canonical

    def test_no_self_canonical_keeps_lowest_id(self, spark):
        decl = '<link rel="canonical" href="https://a.com/gone">'
        out = self._run(
            spark,
            [
                (5, decl, "https://a.com/v1"),
                (3, decl, "https://a.com/v2"),
            ],
        )
        assert out[3].is_canonical and not out[5].is_canonical
        assert out[5].canonical_id == 3


class TestRobotsGate:
    def test_directive_branches(self, spark):
        from mistral_ocr_pipeline_spark.operators.robots import (
            robots_directives,
        )

        rows = [
            (1, '<meta name="robots" content="noindex, follow">'),
            (2, '<meta name="robots" content="INDEX, NoFollow">'),
            (3, '<meta name="robots" content="none">'),
            (4, '<meta name="robots" content="nofollowup,indexed">'),
            (5, "<body>no meta</body>"),
            (6, None),
        ]
        df = spark.createDataFrame(rows, "doc_id long, html string")
        out = {r.id: r for r in robots_directives(df).collect()}
        assert (out[1].noindex, out[1].nofollow, out[1].indexable) == (
            True, False, False)
        assert (out[2].noindex, out[2].nofollow) == (False, True)
        assert (out[3].noindex, out[3].nofollow) == (True, True)
        # token-exact: 'nofollowup' must not match 'nofollow'
        assert (out[4].noindex, out[4].nofollow, out[4].indexable) == (
            False, False, True)
        assert out[5].indexable and out[6].indexable

    def test_zero_shuffle_plan(self, spark):
        from mistral_ocr_pipeline_spark.operators.robots import (
            robots_directives,
        )

        df = spark.createDataFrame([(1, "x")], "doc_id long, html string")
        plan = (
            robots_directives(df)._jdf.queryExecution().executedPlan()
            .toString()
        )
        assert "Exchange" not in plan
