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
