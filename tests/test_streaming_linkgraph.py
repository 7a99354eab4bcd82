"""Streaming link-graph ingest: maintained graph ≡ one-shot batch twin,
replay no-op, fresh-lifecycle namespace isolation."""

import pandas as pd
import pytest

from mistral_ocr_pipeline_spark.operators.htmllinks import link_graph
from mistral_ocr_pipeline_spark.sources.catalog import TableCatalog
from mistral_ocr_pipeline_spark.streaming.linkgraph import (
    run_incremental_link_graph,
)

SCHEMA = "doc_id long, html string, src_host string"


def _pages(lo, hi):
    rows = []
    for i in range(lo, hi):
        html = (
            f'<p>x</p><a href="https://site{(i + 1) % 3}.example.com/p/{i % 7}">'
            f"read {i % 5}</a>"
        )
        if i % 3 == 0:
            html += f'<a href="http://WWW.Site{i % 3}.Example.com:80/nav/">home</a>'
        if i % 4 == 0:
            html += f'<a href="/rel/{i % 9}">more</a>'
        rows.append((i, html if i % 13 else None, f"site{i % 3}.example.com"))
    return rows


def _write(rows, path):
    pd.DataFrame(rows, columns=["doc_id", "html", "src_host"]).to_parquet(
        path, index=False
    )


def _graph_rows(catalog):
    return sorted(map(tuple, catalog.read("link_graph").collect()))


@pytest.mark.filterwarnings("ignore")
def test_maintained_graph_equals_oneshot_and_replay_noop(spark, tmp_path):
    input_dir = tmp_path / "in"
    input_dir.mkdir()
    ckpt = str(tmp_path / "ckpt")
    catalog = TableCatalog(spark, str(tmp_path / "wh"))

    all_rows = []
    for b, (lo, hi) in enumerate([(0, 30), (30, 75), (75, 100)]):
        rows = _pages(lo, hi)
        all_rows += rows
        _write(rows, input_dir / f"b{b}.parquet")
        run_incremental_link_graph(
            spark, str(input_dir), SCHEMA, catalog, ckpt
        )
        oneshot = link_graph(
            spark.createDataFrame(all_rows, SCHEMA), "doc_id", "html",
            "src_host",
        )
        assert _graph_rows(catalog) == sorted(map(tuple, oneshot.collect()))

    # replay no-op: draining with nothing new leaves the graph unchanged
    before = _graph_rows(catalog)
    head_before = catalog.read("link_graph_lineage").count()
    run_incremental_link_graph(spark, str(input_dir), SCHEMA, catalog, ckpt)
    assert _graph_rows(catalog) == before
    assert catalog.read("link_graph_lineage").count() == head_before


@pytest.mark.filterwarnings("ignore")
def test_fresh_lifecycle_is_not_mistaken_for_replay(spark, tmp_path):
    # wipe + recreate the checkpoint: batch ids restart at 0; the UUID
    # lifecycle identity must let the new lifecycle's batches through
    import shutil

    input_dir = tmp_path / "in"
    input_dir.mkdir()
    ckpt = str(tmp_path / "ckpt")
    catalog = TableCatalog(spark, str(tmp_path / "wh"))

    rows1 = _pages(0, 20)
    _write(rows1, input_dir / "b0.parquet")
    run_incremental_link_graph(spark, str(input_dir), SCHEMA, catalog, ckpt)

    shutil.rmtree(ckpt)
    rows2 = _pages(20, 40)
    _write(rows2, input_dir / "b1.parquet")
    run_incremental_link_graph(spark, str(input_dir), SCHEMA, catalog, ckpt)

    # the fresh lifecycle re-delivers EVERYTHING (new checkpoint), but
    # lineage keyed on (stream_id, batch_id) must not have dropped its
    # batches — every page lands exactly once per lifecycle delivery
    lineage = catalog.read("link_graph_lineage").collect()
    assert len({r.stream_id for r in lineage}) == 2
