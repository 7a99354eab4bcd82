"""Robust ingestion (sources/ingest.py): corrupt lines quarantine instead
of crashing, schema drift degrades to nulls, gzip reads transparently."""

import gzip

from pyspark.sql import functions as F

from mistral_ocr_pipeline_spark.sources.ingest import (
    read_csv_documents,
    read_jsonl,
    split_corrupt,
)


def test_jsonl_corrupt_quarantine_and_drift(spark, tmp_path):
    p = tmp_path / "drop.jsonl"
    p.write_text(
        "\n".join(
            [
                '{"doc_id": 1, "text": "clean row", "lang": "en", "source": "a"}',
                '{"doc_id": 2, "text": "missing fields ok"}',      # drift: nulls
                '{"doc_id": 3, "text": "extra ignored", "lang": "de", '
                '"source": "b", "unexpected": [1, 2]}',
                '{"doc_id": 4, "text": "truncated...',             # corrupt
                "not json at all",                                 # corrupt
                '{"doc_id": "not-a-long", "text": "type clash"}',  # corrupt
            ]
        )
    )
    clean, quarantine = split_corrupt(read_jsonl(spark, str(p)))
    rows = {r.doc_id: (r.text, r.lang, r.source) for r in clean.collect()}
    assert rows[1] == ("clean row", "en", "a")
    assert rows[2] == ("missing fields ok", None, None)   # drift → nulls
    assert rows[3] == ("extra ignored", "de", "b")        # extras dropped
    assert set(rows) == {1, 2, 3}
    bad = [r.raw_line for r in quarantine.collect()]
    assert len(bad) == 3 and "not json at all" in bad


def test_jsonl_gzip_transparent(spark, tmp_path):
    p = tmp_path / "drop.jsonl.gz"
    with gzip.open(p, "wt") as f:
        f.write('{"doc_id": 7, "text": "zipped", "lang": "en", "source": "z"}\n')
    clean, quarantine = split_corrupt(read_jsonl(spark, str(p)))
    assert [r.doc_id for r in clean.collect()] == [7]
    assert quarantine.count() == 0


def test_csv_multiline_quotes_and_corrupt(spark, tmp_path):
    p = tmp_path / "drop.csv"
    p.write_text(
        "doc_id,text,lang,source\n"
        '1,"two\nlines inside quotes",en,a\n'
        "2,plain,de,b\n"
        "oops,not-a-long-id,xx,c\n"
    )
    clean, quarantine = split_corrupt(read_csv_documents(spark, str(p)))
    rows = {r.doc_id: r.text for r in clean.collect()}
    assert rows[1] == "two\nlines inside quotes"
    assert rows[2] == "plain"
    assert quarantine.count() == 1


def test_clean_feed_flows_into_operators(spark, tmp_path):
    """The ingest contract composes: a cleaned JSONL drop feeds the dedup
    battery directly (no intermediate hop)."""
    from mistral_ocr_pipeline_spark.operators.dedup import exact_dedup

    p = tmp_path / "feed.jsonl"
    p.write_text(
        "\n".join(
            [
                '{"doc_id": 1, "text": "Same Thing"}',
                '{"doc_id": 2, "text": "same   thing"}',
                '{"doc_id": 3, "text": "different"}',
                "garbage line",
            ]
        )
    )
    clean, _ = split_corrupt(read_jsonl(spark, str(p)))
    out = {r.id: r.is_canonical for r in exact_dedup(clean, "doc_id", "text").collect()}
    assert out == {1: True, 2: False, 3: True}
