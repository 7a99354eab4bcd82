"""Structured-Streaming incremental extraction: AvailableNow drain, resume
from checkpoint without re-reading drained files, per-batch lineage."""

import pandas as pd
import pytest

from mistral_ocr_pipeline_spark.fixtures.gen import gen_transcripts
from mistral_ocr_pipeline_spark.sources.catalog import TableCatalog
from mistral_ocr_pipeline_spark.streaming.incremental import (
    run_incremental_extraction,
)


def _write_parquet(rows, path):
    pdf = pd.DataFrame(
        rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    )
    pdf["turn_idx"] = pdf["turn_idx"].astype("int32")
    pdf["ts"] = (
        pd.to_datetime(pdf["ts"], utc=True).dt.tz_localize(None).astype("datetime64[us]")
    )
    pdf.to_parquet(path, index=False)


@pytest.mark.filterwarnings("ignore")
def test_incremental_drain_and_resume(spark, tmp_path):
    input_dir = tmp_path / "stream_in"
    input_dir.mkdir()
    rows = gen_transcripts(10, 6, seed=21, profile="tiny")
    _write_parquet(rows[:30], input_dir / "part1.parquet")
    _write_parquet(rows[30:], input_dir / "part2.parquet")

    cat = TableCatalog(spark, str(tmp_path / "wh"))
    ckpt = str(tmp_path / "ckpt")

    # first drain: both files
    run_incremental_extraction(spark, str(input_dir), cat, ckpt, run_id="s1")
    n1 = cat.read("extracted_stream").count()
    assert n1 == len(rows)

    # second run with NO new files: checkpoint prevents re-processing
    run_incremental_extraction(spark, str(input_dir), cat, ckpt, run_id="s2")
    assert cat.read("extracted_stream").count() == n1

    # drop a new file: only the delta is processed
    more = gen_transcripts(3, 4, seed=99, profile="tiny")
    more = [(f"late-{c}", t, r, x, tl, ts) for (c, t, r, x, tl, ts) in more]
    _write_parquet(more, input_dir / "part3.parquet")
    run_incremental_extraction(spark, str(input_dir), cat, ckpt, run_id="s3")
    assert cat.read("extracted_stream").count() == n1 + len(more)

    lineage = cat.read("stream_batches").collect()
    assert sum(r.rows for r in lineage) == n1 + len(more)
    runs = {r.run_id for r in lineage}
    assert "s1" in runs and "s3" in runs and "s2" not in runs  # s2 was a no-op


def test_batch_replay_is_idempotent(spark, tmp_path):
    """foreachBatch is at-least-once: a kill between the catalog commit
    and the streaming offset commit replays the micro-batch.  Replaying
    the same batch_id must be a no-op (exactly-once observable effect)."""
    from pyspark.sql import functions as F

    from mistral_ocr_pipeline_spark.fixtures.gen import (
        gen_transcripts,
        transcripts_schema,
    )
    from mistral_ocr_pipeline_spark.plans.extract_pipeline import (
        extract_transcripts,
    )
    from mistral_ocr_pipeline_spark.sources.catalog import TableCatalog
    from mistral_ocr_pipeline_spark.streaming.incremental import (
        commit_extracted_batch,
    )

    cat = TableCatalog(spark, str(tmp_path / "wh_idem"))
    df = spark.createDataFrame(
        gen_transcripts(6, (2, 4), seed=9, profile="unit"),
        schema=transcripts_schema(),
    )
    extracted = extract_transcripts(df, repartition=False)
    assert commit_extracted_batch(cat, extracted, "r", 0, "out", "lin") is True
    n1 = cat.read("out").count()
    # replay of batch 0: skipped, nothing appended
    assert commit_extracted_batch(cat, extracted, "r", 0, "out", "lin") is False
    assert cat.read("out").count() == n1
    assert cat.read("lin").count() == 1
    # a NEW batch id still commits
    assert commit_extracted_batch(cat, extracted, "r", 1, "out", "lin") is True
    assert cat.read("out").count() == 2 * n1
    # batch_id 0 from a DIFFERENT stream (fresh checkpoint → batch ids
    # restart at 0) is NOT a replay — keyed on (stream_id, batch_id), it
    # must commit instead of being silently dropped
    assert (
        commit_extracted_batch(
            cat, extracted, "r", 0, "out", "lin", stream_id="ckpt-B"
        )
        is True
    )
    assert cat.read("out").count() == 3 * n1
    # and a replay WITHIN that stream is still skipped
    assert (
        commit_extracted_batch(
            cat, extracted, "r", 0, "out", "lin", stream_id="ckpt-B"
        )
        is False
    )


def test_fresh_checkpoint_same_warehouse_not_skipped(spark, tmp_path):
    """End-to-end version of the stream-identity fix: drain a directory
    with checkpoint A, then drain NEW data with a fresh checkpoint B into
    the SAME warehouse — batch ids restart at 0, and the new batches must
    still land (previously they were skipped as replays)."""
    input_a = tmp_path / "in_a"
    input_a.mkdir()
    rows = gen_transcripts(6, 4, seed=31, profile="tiny")
    _write_parquet(rows, input_a / "a.parquet")
    cat = TableCatalog(spark, str(tmp_path / "wh2"))
    run_incremental_extraction(
        spark, str(input_a), cat, str(tmp_path / "ckpt_a"), run_id="a"
    )
    n1 = cat.read("extracted_stream").count()
    assert n1 == len(rows)

    input_b = tmp_path / "in_b"
    input_b.mkdir()
    more = gen_transcripts(4, 3, seed=77, profile="tiny")
    more = [(f"b-{c}", t, r, x, tl, ts) for (c, t, r, x, tl, ts) in more]
    _write_parquet(more, input_b / "b.parquet")
    run_incremental_extraction(
        spark, str(input_b), cat, str(tmp_path / "ckpt_b"), run_id="b"
    )
    assert cat.read("extracted_stream").count() == n1 + len(more)
    assert {r.run_id for r in cat.read("stream_batches").collect()} == {"a", "b"}
