"""Streaming frontier ingest: maintained facts ≡ one-shot batch twin,
replay no-op, fresh-lifecycle namespace isolation."""

import pandas as pd
import pytest

from mistral_ocr_pipeline_spark.operators.urls import frontier_facts
from mistral_ocr_pipeline_spark.sources.catalog import TableCatalog
from mistral_ocr_pipeline_spark.streaming.frontier import (
    run_incremental_frontier,
)

SCHEMA = "url string"


def _links(lo, hi):
    rows = []
    for i in range(lo, hi):
        # tracking-param and www variants collapse onto one canonical key
        rows.append(f"https://site{i % 3}.example.com/p/{i % 5}?utm_s=x")
        if i % 4 == 0:
            rows.append(f"HTTPS://WWW.site{i % 3}.Example.com/p/{i % 5}/")
        if i % 13 == 0:
            rows.append(None)  # junk drops from the frontier, never crashes
    return [(u,) for u in rows]


def _write(rows, path):
    pd.DataFrame(rows, columns=["url"]).to_parquet(path, index=False)


def _rows(catalog):
    return sorted(map(tuple, catalog.read("frontier").collect()))


@pytest.mark.filterwarnings("ignore")
def test_maintained_frontier_equals_oneshot_and_replay_noop(spark, tmp_path):
    input_dir = tmp_path / "in"
    input_dir.mkdir()
    ckpt = str(tmp_path / "ckpt")
    catalog = TableCatalog(spark, str(tmp_path / "wh"))

    all_rows = []
    for b, (lo, hi) in enumerate([(0, 25), (25, 60), (60, 80)]):
        rows = _links(lo, hi)
        all_rows += rows
        _write(rows, input_dir / f"b{b}.parquet")
        run_incremental_frontier(spark, str(input_dir), SCHEMA, catalog, ckpt)
        oneshot = frontier_facts(
            spark.createDataFrame(all_rows, SCHEMA), "url"
        )
        assert _rows(catalog) == sorted(map(tuple, oneshot.collect()))

    # replay no-op: draining with nothing new leaves the frontier unchanged
    before = _rows(catalog)
    n_lineage = catalog.read("frontier_lineage").count()
    run_incremental_frontier(spark, str(input_dir), SCHEMA, catalog, ckpt)
    assert _rows(catalog) == before
    assert catalog.read("frontier_lineage").count() == n_lineage


@pytest.mark.filterwarnings("ignore")
def test_fresh_lifecycle_is_not_mistaken_for_replay(spark, tmp_path):
    # wipe + recreate the checkpoint: batch ids restart at 0; the UUID
    # lifecycle identity must let the new lifecycle's batches through
    import shutil

    input_dir = tmp_path / "in"
    input_dir.mkdir()
    ckpt = str(tmp_path / "ckpt")
    catalog = TableCatalog(spark, str(tmp_path / "wh"))

    _write(_links(0, 20), input_dir / "b0.parquet")
    run_incremental_frontier(spark, str(input_dir), SCHEMA, catalog, ckpt)
    first = _rows(catalog)

    shutil.rmtree(ckpt)
    input2 = tmp_path / "in2"
    input2.mkdir()
    _write(_links(20, 40), input2 / "b0.parquet")  # batch_id 0 AGAIN
    run_incremental_frontier(spark, str(input2), SCHEMA, catalog, ckpt)

    oneshot = frontier_facts(
        spark.createDataFrame(_links(0, 40), SCHEMA), "url"
    )
    assert _rows(catalog) == sorted(map(tuple, oneshot.collect()))
    assert _rows(catalog) != first  # the new lifecycle's batch landed
