"""Streaming near-dup ingest (streaming/neardup.py): micro-batches dedup
within themselves and against all history via the persisted MinHash
posting-list index; the maintained index stays hash-identical to a batch
rebuild over the kept corpus; replays are no-ops."""

import pandas as pd
import pytest

from mistral_ocr_pipeline_spark.sources.catalog import TableCatalog
from mistral_ocr_pipeline_spark.streaming.neardup import (
    commit_neardup_batch,
    run_neardup_ingest,
)

BASE = (
    "the quick brown fox jumps over the lazy dog and keeps running "
    "through the green field towards the old farm house every day"
)


def _near(edit: str) -> str:
    # one word swapped — high-Jaccard near-dup of BASE
    return BASE.replace("green", edit)


def _write(rows, path):
    pd.DataFrame(rows, columns=["doc_id", "text"]).to_parquet(path, index=False)


@pytest.mark.filterwarnings("ignore")
def test_two_batch_drain_and_index_parity(spark, tmp_path):
    from pyspark.sql import functions as F

    from mistral_ocr_pipeline_spark.operators.dedup import build_minhash_index

    input_dir = tmp_path / "in"
    input_dir.mkdir()
    catalog = TableCatalog(spark, str(tmp_path / "wh"))
    ckpt = str(tmp_path / "ckpt")

    # batch 1: 10 and 11 are near-dups of each other; 12 is distinct
    _write(
        [(10, BASE), (11, _near("greeen")), (12, "a completely different tale "
                                                 "about ships and storms at sea")],
        input_dir / "b1.parquet",
    )
    run_neardup_ingest(spark, str(input_dir), catalog, ckpt)
    kept1 = {r.doc_id for r in catalog.read("corpus").collect()}
    assert kept1 == {10, 12}  # 11 dropped within-batch (min-canonical)

    # batch 2: 20 near-dups HISTORY (doc 10), 21 is new
    _write(
        [(20, _near("grren")), (21, "fresh unrelated prose about compilers "
                                    "and the gardens of type theory")],
        input_dir / "b2.parquet",
    )
    run_neardup_ingest(spark, str(input_dir), catalog, ckpt)
    kept = {r.doc_id for r in catalog.read("corpus").collect()}
    assert kept == {10, 12, 21}  # 20 dropped against history

    # the maintained index must be hash-identical to a one-shot rebuild
    # over the kept corpus (the minhash_index_append equivalence, now
    # proven through the streaming path)
    def rows(df):
        return {
            (r.band_idx, r.band_hash, tuple(r.ids), r.bucket_truncated)
            for r in df.collect()
        }

    assert rows(catalog.read("minhash_index")) == rows(
        build_minhash_index(catalog.read("corpus"), "doc_id", "text")
    )

    # lineage carries the funnel numbers
    lin = {
        r.batch_id: (r.rows_in, r.rows_kept)
        for r in catalog.read("neardup_batches").collect()
    }
    assert lin[0] == (3, 2) and lin[1] == (2, 1)


@pytest.mark.filterwarnings("ignore")
def test_replay_is_noop(spark, tmp_path):
    catalog = TableCatalog(spark, str(tmp_path / "wh"))
    batch = spark.createDataFrame([(1, BASE), (2, "other words entirely")],
                                  "doc_id long, text string")
    assert commit_neardup_batch(catalog, batch, 0, stream_id="s")
    before = {r.doc_id for r in catalog.read("corpus").collect()}
    # at-least-once foreachBatch replays the same (stream_id, batch_id)
    assert not commit_neardup_batch(catalog, batch, 0, stream_id="s")
    assert {r.doc_id for r in catalog.read("corpus").collect()} == before
    # a DIFFERENT stream identity is not a replay
    assert commit_neardup_batch(
        catalog,
        spark.createDataFrame([(3, "yet another tale")], "doc_id long, text string"),
        0,
        stream_id="s2",
    )
    assert {r.doc_id for r in catalog.read("corpus").collect()} == before | {3}


@pytest.mark.filterwarnings("ignore")
def test_wiped_checkpoint_is_new_stream_not_replay(spark, tmp_path):
    """Batch ids restart at 0 when a checkpoint is wiped and recreated at
    the SAME path; the inode-carrying stream_id must give the new
    lifecycle a fresh idempotence namespace so its first batches are not
    skipped as replays of the old run's batch 0 (silent data loss)."""
    import shutil

    input_dir = tmp_path / "in"
    input_dir.mkdir()
    catalog = TableCatalog(spark, str(tmp_path / "wh"))
    ckpt = str(tmp_path / "ckpt")

    _write([(1, BASE)], input_dir / "b1.parquet")
    run_neardup_ingest(spark, str(input_dir), catalog, ckpt)
    assert {r.doc_id for r in catalog.read("corpus").collect()} == {1}

    # wipe + recreate the checkpoint: the next drain re-reads b1 AND the
    # new file, as batch 0 of a NEW stream lifecycle
    shutil.rmtree(ckpt)
    _write([(2, "a wholly different document about rivers")],
           input_dir / "b2.parquet")
    run_neardup_ingest(spark, str(input_dir), catalog, ckpt)
    kept = {r.doc_id for r in catalog.read("corpus").collect()}
    assert 2 in kept  # the new doc landed — not skipped as a replay
