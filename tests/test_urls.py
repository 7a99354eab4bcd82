"""URL curation operators: canonicalization edge cases, recrawl dedup
keep-latest rule, domain health stats."""

from pyspark.sql import functions as F


def _canon(spark, urls):
    from mistral_ocr_pipeline_spark.operators.urls import canonicalize_url

    df = spark.createDataFrame(
        [(i, u) for i, u in enumerate(urls)], "id long, url string"
    )
    rows = df.select("id", canonicalize_url(F.col("url")).alias("c")).collect()
    return [r.c for r in sorted(rows, key=lambda r: r.id)]


class TestCanonicalize:
    def test_case_port_www_slash_fragment(self, spark):
        out = _canon(
            spark,
            [
                "HTTP://WWW.Example.COM:80/a/b/#frag",
                "https://example.com:443/a/b",
                "http://example.com:8080/a/b",  # non-default port kept
                "https://example.com/",  # root slash stripped
            ],
        )
        assert out[0] == "http://example.com/a/b"
        assert out[1] == "https://example.com/a/b"
        assert out[2] == "http://example.com:8080/a/b"
        assert out[3] == "https://example.com"

    def test_port_strip_is_scheme_aware(self, spark):
        # :443 on http is NOT the default port — must survive
        out = _canon(spark, ["http://ex.com:443/x", "https://ex.com:80/x"])
        assert out == ["http://ex.com:443/x", "https://ex.com:80/x"]

    def test_query_params(self, spark):
        out = _canon(
            spark,
            [
                "https://ex.com/p?utm_source=a&b=2&a=1&fbclid=z",
                "https://ex.com/p?a=1&b=2",
                "https://ex.com/p?ref=home",  # all tracking -> no query
                "https://ex.com/p?b=2&&a=1&",  # empty segments absorbed
            ],
        )
        assert out[0] == "https://ex.com/p?a=1&b=2"
        assert out[1] == "https://ex.com/p?a=1&b=2"
        assert out[2] == "https://ex.com/p"
        assert out[3] == "https://ex.com/p?a=1&b=2"

    def test_junk_and_null_become_empty(self, spark):
        out = _canon(spark, ["not a url", None, "   ", "ftp://Host.COM/X"])
        # junk/NULL -> '' (rows must survive downstream equi-joins);
        # non-http schemes still canonicalize (path case preserved)
        assert out[:3] == ["", "", ""]
        assert out[3] == "ftp://host.com/X"


class TestUrlDedup:
    def test_keep_latest_tie_lowest_id(self, spark):
        from mistral_ocr_pipeline_spark.operators.urls import url_dedup

        df = spark.createDataFrame(
            [
                (1, "https://ex.com/a?utm_x=1", 5),
                (2, "HTTPS://ex.com/a/", 9),  # latest crawl wins
                (3, "https://www.ex.com/a", 9),  # ts tie -> id 2 (lower) wins
                (4, "https://ex.com/b", 1),  # singleton
                (5, None, 3),  # NULL -> '' group, survives
                (6, "junk", 4),  # junk -> '' group too
            ],
            "id long, url string, ts long",
        )
        out = {r.id: r for r in url_dedup(df, "id", "url", "ts").collect()}
        assert set(out) == {1, 2, 3, 4, 5, 6}
        assert out[1].crawl_count == 3 and out[1].canonical_id == 2
        assert out[2].is_canonical and not out[3].is_canonical
        assert out[4].is_canonical and out[4].crawl_count == 1
        assert out[5].canon_url == "" and out[5].canonical_id == 6
        assert out[6].is_canonical  # ts 4 > ts 3

    def test_domain_stats(self, spark):
        from mistral_ocr_pipeline_spark.operators.urls import domain_stats

        df = spark.createDataFrame(
            [
                (1, "https://ex.com/a", "xxxx"),  # 4 chars
                (2, "https://ex.com/a/", "xx"),  # recrawl of page a
                (3, "https://ex.com/b", None),  # NULL text -> len 0
                (4, "https://other.com/z", "xxxxxx"),
            ],
            "id long, url string, text string",
        )
        out = {r.host: r for r in domain_stats(df, "id", "url", "text").collect()}
        ex = out["ex.com"]
        assert ex.n_docs == 3 and ex.n_pages == 2
        assert ex.recrawl_ratio_micro == 1000000 // 3
        assert ex.mean_len_micro == 6 * 1000000 // 3
        assert out["other.com"].recrawl_ratio_micro == 0


class TestTrapFlags:
    def _run(self, spark, rows):
        from mistral_ocr_pipeline_spark.operators.urls import url_trap_flags

        df = spark.createDataFrame(rows, "id long, url string")
        return {r.id: r for r in url_trap_flags(df, "id", "url").collect()}

    def test_verdict_branches(self, spark):
        out = self._run(
            spark,
            [
                (1, "https://ex.com/a/b/c"),  # ok
                (2, "https://ex.com/1/2/3/4/5/6/7/8/9"),  # deep_path (9 > 8)
                (3, "https://ex.com/x/y/x/y/x"),  # repeat_segments (x ×3)
                (4, "https://ex.com/long/" + "ab" * 120),  # long_path
                (5, "https://ex.com/q?" + "&".join(f"p{i}=1" for i in range(7))),
                (6, "https://ex.com/s/0123456789ab0123456789ab"),  # hex token
                (7, "https://ex.com/s/0000000123456789"),  # digit token
                (8, None),  # NULL survives as '' / ok
                (9, "not a url"),
            ],
        )
        assert out[1].verdict == "ok" and out[1].depth == 3
        assert out[2].verdict == "deep_path"
        assert out[3].verdict == "repeat_segments" and out[3].max_repeat == 3
        assert out[4].verdict == "long_path" and out[4].path_len == 246
        assert out[5].verdict == "query_explosion" and out[5].n_params == 7
        assert out[6].verdict == "session_id" and out[6].session_flag
        assert out[7].verdict == "session_id"
        assert out[8].verdict == "ok" and out[8].depth == 0
        assert out[9].verdict == "ok" and out[9].canon_url == ""

    def test_first_fail_order(self, spark):
        # deep AND repeating AND long: deep_path wins (first in the cascade)
        url = "https://ex.com/" + "/".join(["seg"] * 12)
        out = self._run(spark, [(1, url)])
        assert out[1].verdict == "deep_path" and out[1].max_repeat == 12

    def test_tracking_params_never_count(self, spark):
        # 7 raw params but 4 survive canonicalization -> not an explosion
        url = "https://ex.com/q?a=1&b=2&c=3&d=4&utm_a=x&utm_b=y&fbclid=z"
        out = self._run(spark, [(1, url)])
        assert out[1].n_params == 4 and out[1].verdict == "ok"

    def test_zero_shuffle_plan(self, spark):
        from mistral_ocr_pipeline_spark.operators.urls import url_trap_flags

        df = spark.range(10).select(
            F.col("id"), F.concat(F.lit("https://ex.com/p/"), F.col("id")).alias("url")
        )
        plan = url_trap_flags(df, "id", "url")._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan


class TestTemplateStats:
    def test_hex_before_digits_and_fanout(self, spark):
        from mistral_ocr_pipeline_spark.operators.urls import url_template_stats

        df = spark.createDataFrame(
            [
                (1, "https://ex.com/item/8f14e45fceea167a"),
                (2, "https://ex.com/item/45c48cce2e2d7fbd"),  # same template
                (3, "https://ex.com/item/45c48cce2e2d7fbd"),  # recrawl
                (4, "https://ex.com/cal/2024/01/05"),
                (5, "https://ex.com/cal/2023/12/31"),
                (6, "https://other.com/cal/2024/01/05"),  # host-scoped
            ],
            "id long, url string",
        )
        out = {
            r.template: r
            for r in url_template_stats(df, "id", "url").collect()
        }
        item = out["ex.com/item/{h}"]  # hex run -> {h}, not {n}
        assert item.n_docs == 3 and item.n_pages == 2
        cal = out["ex.com/cal/{n}/{n}/{n}"]
        assert cal.n_docs == 2 and cal.n_pages == 2
        assert out["other.com/cal/{n}/{n}/{n}"].n_docs == 1


class TestPoliteness:
    def test_waves_and_total_order(self, spark):
        from mistral_ocr_pipeline_spark.operators.urls import (
            crawl_politeness_waves,
        )

        df = spark.createDataFrame(
            [
                ("https://ex.com/a", 9),
                ("https://ex.com/b", 9),  # priority tie -> url order: a, b
                ("https://ex.com/c", 5),
                ("https://solo.org/x", 1),
            ],
            "url string, pr long",
        )
        out = {
            r.canon_url: r
            for r in crawl_politeness_waves(df, "url", "pr", per_wave=2).collect()
        }
        assert out["https://ex.com/a"].host_rank == 1
        assert out["https://ex.com/b"].host_rank == 2
        assert out["https://ex.com/a"].wave == 0 and out["https://ex.com/b"].wave == 0
        assert out["https://ex.com/c"].wave == 1  # third fetch waits
        assert out["https://solo.org/x"].wave == 0  # singleton host never waits


class TestBlocklistGate:
    def test_label_boundary_suffix_matching(self, spark):
        from mistral_ocr_pipeline_spark.operators.urls import (
            host_blocklist_gate,
        )

        df = spark.createDataFrame(
            [
                (1, "https://a.cdn.example.com/x"),  # parent-domain block
                (2, "https://example.com/x"),  # exact block
                (3, "https://notexample.com/x"),  # substring must NOT match
                (4, "https://sample.org/x"),  # kept
                (5, None),  # '' host kept
            ],
            "id long, url string",
        )
        out = {
            r.id: r
            for r in host_blocklist_gate(
                df, "id", "url", ["example.com"]
            ).collect()
        }
        assert out[1].blocked_by == "example.com" and not out[1].kept
        assert out[2].blocked_by == "example.com"
        assert out[3].kept and out[3].blocked_by is None
        assert out[4].kept and out[5].kept

    def test_zero_shuffle_plan(self, spark):
        from mistral_ocr_pipeline_spark.operators.urls import (
            host_blocklist_gate,
        )

        df = spark.range(10).select(
            F.col("id"),
            F.concat(F.lit("https://ex.com/p/"), F.col("id")).alias("url"),
        )
        plan = (
            host_blocklist_gate(df, "id", "url", ["bad.com"])
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Exchange" not in plan


class TestRobotsTxt:
    def _rules(self, spark, txt):
        from mistral_ocr_pipeline_spark.operators.robots import robots_txt_rules

        rb = spark.createDataFrame([("h", txt)], "host string, robots_txt string")
        return sorted(
            (r.path, r.allow) for r in robots_txt_rules(rb).collect()
        )

    def test_group_state_machine(self, spark):
        # UA after rules starts a NEW group; consecutive UA lines are ONE group
        txt = (
            "User-agent: *\nDisallow: /a\n"
            "User-agent: badbot\nDisallow: /b\n"  # non-star group dropped
            "User-agent: badbot\nUser-agent: *\nDisallow: /c"  # star via 2nd UA
        )
        assert self._rules(spark, txt) == [("/a", False), ("/c", False)]

    def test_empty_disallow_comments_case(self, spark):
        txt = "# hi\nUSER-AGENT: *  # inline\nDisallow:\nAllow: /ok"
        assert self._rules(spark, txt) == [("/ok", True)]

    def test_no_star_group(self, spark):
        assert self._rules(spark, "User-agent: googlebot\nDisallow: /") == []

    def test_gate_precedence(self, spark):
        from mistral_ocr_pipeline_spark.operators.robots import (
            robots_txt_gate,
            robots_txt_rules,
        )

        rb = spark.createDataFrame(
            [
                (
                    "ex.com",
                    "User-agent: *\nDisallow: /cal/\nAllow: /cal/2024/\n"
                    "Allow: /tie\nDisallow: /tie",
                )
            ],
            "host string, robots_txt string",
        )
        urls = spark.createDataFrame(
            [
                (1, "https://ex.com/cal/2023/x"),  # blocked by /cal/
                (2, "https://ex.com/cal/2024/x"),  # longest match -> allow
                (3, "https://ex.com/tie"),  # equal length -> allow wins
                (4, "https://ex.com/other"),  # no rule -> fetchable
                (5, "https://unknown.org/x"),  # no robots -> fetchable
                (6, None),  # '' host survives, fetchable
            ],
            "id long, url string",
        )
        out = {
            r.id: r
            for r in robots_txt_gate(
                urls, robots_txt_rules(rb), "id", "url"
            ).collect()
        }
        assert not out[1].fetch_allowed and out[1].matched_rule == "/cal/"
        assert out[2].fetch_allowed and out[2].matched_rule == "/cal/2024/"
        assert out[3].fetch_allowed and out[3].matched_rule == "/tie"
        assert out[4].fetch_allowed and out[4].matched_rule is None
        assert out[5].fetch_allowed and out[6].fetch_allowed


class TestRecrawlChangeStats:
    def test_change_detection_and_buckets(self, spark):
        from mistral_ocr_pipeline_spark.operators.urls import (
            recrawl_change_stats,
        )

        df = spark.createDataFrame(
            [
                # hot.com/a: 3 fetches, both recrawls changed
                (1, "https://hot.com/a", 1, "v1"),
                (2, "https://hot.com/a", 2, "v2"),
                (3, "https://hot.com/a", 3, "v3"),
                # cold.com/a: recrawl identical; /b singleton
                (4, "https://cold.com/a", 1, "same"),
                (5, "https://cold.com/a/", 2, "same"),  # canonical collapse
                (6, "https://cold.com/b", 1, "x"),
                # static.org: never recrawled
                (7, "https://static.org/p", 1, None),  # NULL text -> '' fp
            ],
            "id long, url string, ts long, text string",
        )
        out = {
            r.host: r
            for r in recrawl_change_stats(
                df, "id", "url", "ts", "text"
            ).collect()
        }
        hot = out["hot.com"]
        assert (hot.n_recrawls, hot.n_changed, hot.bucket) == (2, 2, "hot")
        assert hot.change_rate_micro == 1000000
        cold = out["cold.com"]
        assert (cold.n_fetches, cold.n_pages) == (3, 2)
        assert (cold.n_recrawls, cold.n_changed, cold.bucket) == (1, 0, "cold")
        st = out["static.org"]
        assert (st.n_recrawls, st.change_rate_micro, st.bucket) == (0, 0, "static")

    def test_ts_tie_broken_by_id(self, spark):
        from mistral_ocr_pipeline_spark.operators.urls import (
            recrawl_change_stats,
        )

        # same ts: order is (ts, id) -> 1 then 2 -> one recrawl, changed
        df = spark.createDataFrame(
            [(1, "https://t.com/x", 5, "a"), (2, "https://t.com/x", 5, "b")],
            "id long, url string, ts long, text string",
        )
        r = recrawl_change_stats(df, "id", "url", "ts", "text").collect()[0]
        assert r.n_recrawls == 1 and r.n_changed == 1


class TestSitemap:
    def test_parse_and_queue_policy(self, spark):
        from mistral_ocr_pipeline_spark.operators.urls import (
            sitemap_entries,
            sitemap_recrawl_queue,
        )

        sm = spark.createDataFrame(
            [
                (
                    "ex.com",
                    "<url><loc>https://Ex.com/a</loc>"
                    "<lastmod>2024-02-01</lastmod></url>"
                    "<url><loc>https://ex.com/b</loc>"
                    "<lastmod>2024-01-01</lastmod></url>"
                    "<url><loc>https://ex.com/c</loc></url>"  # no lastmod
                    "<url><loc>https://ex.com/d</loc>"
                    "<lastmod>2024-03-01</lastmod></url>",
                ),
                ("empty.org", None),  # NULL xml -> no entries, no crash
            ],
            "host string, sitemap_xml string",
        )
        cs = spark.createDataFrame(
            [
                ("https://ex.com/a", "2024-01-15"),  # lastmod newer -> changed
                ("https://ex.com/b", "2024-01-15"),  # lastmod older -> fresh
                ("https://ex.com/c", "2024-01-15"),  # no lastmod -> unknown
                # /d absent -> new
            ],
            "canon_url string, last_crawl string",
        )
        out = {
            r.canon_url: r
            for r in sitemap_recrawl_queue(sitemap_entries(sm), cs).collect()
        }
        assert len(out) == 4  # mixed-case loc canonicalized onto state key
        assert out["https://ex.com/a"].reason == "changed" and out[
            "https://ex.com/a"
        ].queue
        assert out["https://ex.com/b"].reason == "fresh"
        assert not out["https://ex.com/b"].queue
        assert out["https://ex.com/c"].reason == "unknown"
        assert out["https://ex.com/d"].reason == "new" and out[
            "https://ex.com/d"
        ].queue and out["https://ex.com/d"].last_crawl is None


class TestCrawlDelay:
    def _delays(self, spark, txt):
        from mistral_ocr_pipeline_spark.operators.robots import (
            robots_crawl_delays,
        )

        rb = spark.createDataFrame([("h", txt)], "host string, robots_txt string")
        return {r.host: r.crawl_delay for r in robots_crawl_delays(rb).collect()}

    def test_star_only_junk_dropped_max_wins(self, spark):
        # non-star group delay ignored; junk value dropped; two star
        # groups -> conservative max
        txt = (
            "User-agent: googlebot\nCrawl-delay: 99\n"
            "User-agent: *\nDisallow: /a\nCrawl-delay: 3\n"
            "User-agent: *\nCrawl-delay: 5\n"
        )
        assert self._delays(spark, txt) == {"h": 5}
        assert self._delays(spark, "User-agent: *\nCrawl-delay: fast") == {}
        assert self._delays(spark, "User-agent: bot\nCrawl-delay: 9") == {}

    def test_delay_line_terminates_ua_run(self, spark):
        from mistral_ocr_pipeline_spark.operators.robots import (
            robots_txt_rules,
        )

        # UA after a crawl-delay line starts a NEW group: the second
        # group is star, the first is not -> only /b survives
        rb = spark.createDataFrame(
            [
                (
                    "h",
                    "User-agent: bot\nCrawl-delay: 1\n"
                    "User-agent: *\nDisallow: /b",
                )
            ],
            "host string, robots_txt string",
        )
        out = [(r.path, r.allow) for r in robots_txt_rules(rb).collect()]
        assert out == [("/b", False)]

    def test_rated_waves(self, spark):
        from mistral_ocr_pipeline_spark.operators.urls import (
            crawl_politeness_waves_rated,
        )

        frontier = spark.createDataFrame(
            [
                ("https://slow.com/a", 9),
                ("https://slow.com/b", 8),
                ("https://fast.com/a", 9),
                ("https://fast.com/b", 8),
                ("https://fast.com/c", 7),
                ("https://default.org/x", 5),
            ],
            "url string, pr long",
        )
        rates = spark.createDataFrame(
            [("slow.com", 1), ("fast.com", 3)], "host string, per_wave long"
        )
        out = {
            r.canon_url: r
            for r in crawl_politeness_waves_rated(
                frontier, "url", "pr", rates, default_per_wave=2
            ).collect()
        }
        assert out["https://slow.com/a"].wave == 0
        assert out["https://slow.com/b"].wave == 1  # 1/wave on the slow host
        assert all(
            out[f"https://fast.com/{p}"].wave == 0 for p in "abc"
        )  # 3/wave
        assert out["https://default.org/x"].per_wave == 2  # default applied


class TestHostMirrors:
    def test_mirror_scores_cap_and_distinct(self, spark):
        from mistral_ocr_pipeline_spark.operators.urls import (
            host_mirror_pairs,
        )

        rows = (
            [("m1.com", f"d{k}") for k in range(4)]
            + [("m2.com", f"d{k}") for k in range(4)]  # full mirror
            + [("m2.com", "d0")]  # recrawl dup collapses
            + [("u.org", f"u{k}") for k in range(3)]
            + [(h, "boiler") for h in ("m1.com", "m2.com", "u.org")]
            + [("m1.com", None)]  # NULL text -> '' fp, never crashes
        )
        out = {
            (r.host_a, r.host_b): r
            for r in host_mirror_pairs(
                spark.createDataFrame(rows, "host string, text string"),
                "host",
                "text",
                max_hosts_per_fp=2,
            ).collect()
        }
        # boiler is on 3 hosts > cap 2 -> u.org pairs with nobody
        assert set(out) == {("m1.com", "m2.com")}
        m = out[("m1.com", "m2.com")]
        # sizes count boiler and the NULL page; shared counts only d0..d3
        assert (m.shared, m.n_a, m.n_b) == (4, 6, 5)
        assert m.jaccard_micro == 4 * 1000000 // 7


class TestCommunityWaves:
    def test_mirror_hosts_share_one_budget(self, spark):
        """Two mirror hosts in one community: their URLs interleave into
        a SHARED wave budget (≤ per_wave per community per wave), while
        a graph-unseen host falls back to its own singleton community."""
        from mistral_ocr_pipeline_spark.operators.urls import (
            crawl_community_waves,
        )

        comm = spark.createDataFrame(
            [("a.com", "c1"), ("b.com", "c1")], "host string, community string"
        )
        rows = [
            (f"https://a.com/p/{i}", 10 - i) for i in range(3)
        ] + [
            (f"https://b.com/p/{i}", 20 - i) for i in range(3)
        ] + [
            (f"https://lone.org/q/{i}", i) for i in range(3)
        ]
        df = spark.createDataFrame(rows, "url string, pr long")
        out = crawl_community_waves(df, "url", "pr", comm, per_wave=2).collect()
        by_comm = {}
        for r in out:
            by_comm.setdefault((r.community, r.wave), []).append(r)
        # c1 holds all 6 mirror URLs -> 3 waves of exactly 2
        c1_waves = {w: len(v) for (c, w), v in by_comm.items() if c == "c1"}
        assert c1_waves == {0: 2, 1: 2, 2: 2}
        # highest-priority URLs (b.com, pr 20,19) fetch first
        wave0 = sorted(r.canon_url for r in by_comm[("c1", 0)])
        assert all("b.com" in u for u in wave0)
        # unseen host: singleton community named after itself
        lone = [r for r in out if r.host == "lone.org"]
        assert {r.community for r in lone} == {"lone.org"}
        assert {r.wave for r in lone} == {0, 1}
