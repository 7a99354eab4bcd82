"""Streaming edit-distance ingest (streaming/editdist.py): micro-batches
drop within-k-edit docs against themselves and all history via the
persisted PassJoin chunk index; the maintained index stays hash-identical
to a rebuild over the kept corpus; replays are no-ops."""

import pandas as pd
import pytest

from mistral_ocr_pipeline_spark.sources.catalog import TableCatalog
from mistral_ocr_pipeline_spark.streaming.editdist import (
    commit_editdist_batch,
    run_editdist_ingest,
)

BASE = (
    "the quick brown fox jumps over the lazy dog and keeps running "
    "through the green field towards the old farm house every day"
)


def _write(rows, path):
    pd.DataFrame(rows, columns=["doc_id", "text"]).to_parquet(path, index=False)


@pytest.mark.filterwarnings("ignore")
def test_two_batch_drain_and_index_parity(spark, tmp_path):
    from mistral_ocr_pipeline_spark.operators.dedup import build_edit_index

    input_dir = tmp_path / "in"
    input_dir.mkdir()
    catalog = TableCatalog(spark, str(tmp_path / "wh"))
    ckpt = str(tmp_path / "ckpt")

    # batch 1: 11 is BASE with one char substituted (ed=1 -> drops
    # against 10); 12 is far away
    _write(
        [
            (10, BASE),
            (11, BASE[:10] + "x" + BASE[11:]),
            (12, "a completely different tale about ships and storms"),
        ],
        input_dir / "b1.parquet",
    )
    run_editdist_ingest(spark, str(input_dir), catalog, ckpt)
    assert {r.doc_id for r in catalog.read("corpus").collect()} == {10, 12}

    # batch 2: 20 deletes one char of BASE (ed=1 vs HISTORY doc 10 —
    # the chunk-shifting case); 21 is new
    _write(
        [
            (20, BASE[:10] + BASE[11:]),
            (21, "fresh unrelated prose about compilers and gardens"),
        ],
        input_dir / "b2.parquet",
    )
    run_editdist_ingest(spark, str(input_dir), catalog, ckpt)
    kept = {r.doc_id for r in catalog.read("corpus").collect()}
    assert kept == {10, 12, 21}  # 20 dropped against history

    # maintained index == one-shot rebuild over the kept corpus
    def rows(df):
        return {
            (r.ci, r.ell, r.sub, tuple(r.ids), r.bucket_truncated)
            for r in df.collect()
        }

    assert rows(catalog.read("edit_index")) == rows(
        build_edit_index(catalog.read("corpus"), "doc_id", "text")
    )
    lin = {
        r.batch_id: (r.rows_in, r.rows_kept)
        for r in catalog.read("editdist_batches").collect()
    }
    assert lin[0] == (3, 2) and lin[1] == (2, 1)


@pytest.mark.filterwarnings("ignore")
def test_replay_noop_and_fresh_lifecycle(spark, tmp_path):
    catalog = TableCatalog(spark, str(tmp_path / "wh"))
    batch = spark.createDataFrame(
        [(1, BASE), (2, "other words entirely here")],
        "doc_id long, text string",
    )
    assert commit_editdist_batch(catalog, batch, 0, stream_id="s")
    before = {r.doc_id for r in catalog.read("corpus").collect()}
    assert not commit_editdist_batch(catalog, batch, 0, stream_id="s")
    assert {r.doc_id for r in catalog.read("corpus").collect()} == before
    # a different stream identity (recreated checkpoint) is NOT a replay
    assert commit_editdist_batch(
        catalog,
        spark.createDataFrame(
            [(3, "yet another short tale")], "doc_id long, text string"
        ),
        0,
        stream_id="s2",
    )
    assert {r.doc_id for r in catalog.read("corpus").collect()} == before | {3}
