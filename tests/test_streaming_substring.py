"""Streaming exact-substring ingest (streaming/substring.py): each
micro-batch's duplicated spans are cut against itself and ALL history
via the persisted digest index; the maintained index stays
hash-identical to a raw rebuild; per-batch outputs equal the one-shot
dedup over the raw prefix; replays are no-ops."""

import pandas as pd
import pytest

from mistral_ocr_pipeline_spark.sources.catalog import TableCatalog
from mistral_ocr_pipeline_spark.streaming.substring import (
    commit_substring_batch,
    run_substring_ingest,
)

SPAN = "alpha beta gamma delta epsilon zeta"  # 6 words, k=5 covers it


def _write(rows, path):
    pd.DataFrame(rows, columns=["doc_id", "text"]).to_parquet(path, index=False)


@pytest.mark.filterwarnings("ignore")
def test_two_batch_drain_prefix_equivalence_and_index_parity(spark, tmp_path):
    from pyspark.sql import functions as F

    from mistral_ocr_pipeline_spark.operators.dedup import (
        build_substring_index,
        substring_dedup,
    )

    input_dir = tmp_path / "in"
    input_dir.mkdir()
    catalog = TableCatalog(spark, str(tmp_path / "wh"))
    ckpt = str(tmp_path / "ckpt")

    # batch 1: doc 11 repeats doc 10's span; doc 12 is clean
    b1 = [
        (10, f"one two three {SPAN} tail words"),
        (11, f"other intro {SPAN} closing bit"),
        (12, "entirely fresh prose with unique words only"),
    ]
    _write(b1, input_dir / "b1.parquet")
    run_substring_ingest(
        spark, str(input_dir), catalog, ckpt, span_words=5
    )
    got1 = {
        r.doc_id: r.text_clean for r in catalog.read("corpus_clean").collect()
    }
    assert got1[10] == f"one two three {SPAN} tail words"  # canonical keeps
    assert got1[11] == "other intro closing bit"           # span cut
    assert got1[12].startswith("entirely fresh")

    # batch 2: doc 20 repeats the HISTORICAL span; doc 21 clean
    b2 = [
        (20, f"late arrival {SPAN} more text"),
        (21, "novel content nothing shared here"),
    ]
    _write(b2, input_dir / "b2.parquet")
    run_substring_ingest(
        spark, str(input_dir), catalog, ckpt, span_words=5
    )
    got = {
        r.doc_id: r.text_clean for r in catalog.read("corpus_clean").collect()
    }
    assert got[20] == "late arrival more text"  # cut against history only
    assert got[21] == "novel content nothing shared here"
    assert got[10] == got1[10] and got[11] == got1[11]  # history untouched

    # per-batch prefix equivalence: batch 2's rows == one-shot dedup over
    # (raw b1 ∪ raw b2) restricted to batch-2 ids
    raw = spark.createDataFrame(b1 + b2, "doc_id long, text string")
    oneshot = {
        r.doc_id: r.text_clean
        for r in substring_dedup(raw, "doc_id", "text", span_words=5).collect()
        if r.doc_id >= 20
    }
    assert {k: got[k] for k in (20, 21)} == oneshot

    # maintained index ≡ rebuild over ALL RAW batches (lattice merge)
    def rows(df):
        return sorted(map(tuple, df.select(
            "g", "canon_id", "canon_pos", "cnt").collect()))

    assert rows(catalog.read("substring_index")) == rows(
        build_substring_index(raw, "doc_id", "text", span_words=5)
    )

    lin = {
        r.batch_id: (r.rows_in, r.words_removed)
        for r in catalog.read("substring_batches").collect()
    }
    assert lin[0] == (3, 6) and lin[1] == (2, 6)


@pytest.mark.filterwarnings("ignore")
def test_replay_is_noop_and_atomic_tables(spark, tmp_path):
    catalog = TableCatalog(spark, str(tmp_path / "wh"))
    batch = spark.createDataFrame(
        [(1, f"a b {SPAN} c"), (2, f"x y {SPAN} z")], "doc_id long, text string"
    )
    assert commit_substring_batch(catalog, batch, 0, stream_id="s", span_words=5)
    before = sorted(
        (r.doc_id, r.text_clean) for r in catalog.read("corpus_clean").collect()
    )
    # at-least-once replay of the same (stream_id, batch_id) is a no-op
    assert not commit_substring_batch(
        catalog, batch, 0, stream_id="s", span_words=5
    )
    after = sorted(
        (r.doc_id, r.text_clean) for r in catalog.read("corpus_clean").collect()
    )
    assert before == after
    # a DIFFERENT stream lifecycle gets its own idempotence namespace
    assert commit_substring_batch(
        catalog, batch, 0, stream_id="s2", span_words=5
    )
    # all three tables were published together
    assert catalog.exists("substring_index")
    assert catalog.read("substring_batches").count() == 2
