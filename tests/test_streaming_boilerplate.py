"""Streaming host-boilerplate ingest: maintained fact pair ≡ one-shot
rebuild, replay no-op, online-strip convergence, batch-twin equality."""

import pandas as pd
import pytest

from mistral_ocr_pipeline_spark.operators.dedup import (
    host_boilerplate_facts,
    host_boilerplate_strip,
    host_boilerplate_strip_with_facts,
)
from mistral_ocr_pipeline_spark.sources.catalog import TableCatalog
from mistral_ocr_pipeline_spark.streaming.boilerplate import (
    run_incremental_boilerplate,
)

SCHEMA = "doc_id long, text string, host string"
KW = dict(min_docs=4, df_num=3, df_den=10, min_line_chars=8)


def _pages(lo, hi):
    """Host h0 pages carry a footer on every even doc; h1 pages a
    different footer on every doc ≡ 0 mod 3; unique prose otherwise."""
    rows = []
    for i in range(lo, hi):
        host = f"h{i % 2}"
        t = f"unique prose line {i}"
        if host == "h0" and i % 4 == 0:
            t += "\nfooter template zero"
        if host == "h1" and i % 3 == 0:
            t += "\nfooter template one!"
        if i % 17 == 0:
            t = None
        rows.append((i, t, host))
    return rows


def _write(rows, path):
    pd.DataFrame(rows, columns=["doc_id", "text", "host"]).to_parquet(
        path, index=False
    )


def _facts_rows(catalog):
    return (
        sorted(map(tuple, catalog.read("bp_line_facts").collect())),
        sorted(map(tuple, catalog.read("bp_host_totals").collect())),
    )


@pytest.mark.filterwarnings("ignore")
def test_maintained_facts_equal_oneshot_and_replay_noop(spark, tmp_path):
    input_dir = tmp_path / "in"
    input_dir.mkdir()
    ckpt = str(tmp_path / "ckpt")
    catalog = TableCatalog(spark, str(tmp_path / "wh"))

    all_rows = []
    for b, (lo, hi) in enumerate([(0, 24), (24, 60), (60, 80)]):
        rows = _pages(lo, hi)
        all_rows += rows
        _write(rows, input_dir / f"b{b}.parquet")
        run_incremental_boilerplate(
            spark, str(input_dir), SCHEMA, catalog, ckpt, **KW
        )
        f1, t1 = host_boilerplate_facts(
            spark.createDataFrame(all_rows, SCHEMA), "doc_id", "text", "host"
        )
        got_f, got_t = _facts_rows(catalog)
        assert got_f == sorted(map(tuple, f1.collect()))
        assert got_t == sorted(map(tuple, t1.collect()))

    before = _facts_rows(catalog)
    n_stripped = catalog.read("bp_stripped").count()
    run_incremental_boilerplate(
        spark, str(input_dir), SCHEMA, catalog, ckpt, **KW
    )
    assert _facts_rows(catalog) == before
    assert catalog.read("bp_stripped").count() == n_stripped
    assert n_stripped == len(all_rows)


@pytest.mark.filterwarnings("ignore")
def test_online_strip_converges_to_batch_twin(spark, tmp_path):
    """Later batches arrive already stripped (the merged facts include
    the batch itself); a re-strip of everything against the FINAL facts
    equals the one-shot batch operator exactly."""
    input_dir = tmp_path / "in"
    input_dir.mkdir()
    ckpt = str(tmp_path / "ckpt")
    catalog = TableCatalog(spark, str(tmp_path / "wh"))

    rows_a = _pages(0, 40)
    rows_b = _pages(40, 80)
    _write(rows_a, input_dir / "b0.parquet")
    run_incremental_boilerplate(
        spark, str(input_dir), SCHEMA, catalog, ckpt, **KW
    )
    _write(rows_b, input_dir / "b1.parquet")
    run_incremental_boilerplate(
        spark, str(input_dir), SCHEMA, catalog, ckpt, **KW
    )

    stripped = {r.id: r for r in catalog.read("bp_stripped").collect()}
    # batch 1 arrivals: h0's footer is corpus-hot by then (and batch 0
    # already crossed the gate on its own 40 pages), so footer rows are
    # clean on arrival
    assert stripped[44].n_removed == 1  # doc 44: h0, footer
    assert "footer template zero" not in stripped[44].text_clean
    # NULL-text docs survive as one empty line
    assert stripped[68].n_kept == 1 and stripped[68].text_clean == ""

    # convergence: re-strip ALL pages with the final maintained facts ==
    # one-shot batch operator over the full corpus
    everything = spark.createDataFrame(rows_a + rows_b, SCHEMA)
    refreshed = host_boilerplate_strip_with_facts(
        everything,
        catalog.read("bp_line_facts"),
        catalog.read("bp_host_totals"),
        "doc_id",
        "text",
        "host",
        **KW,
    )
    oneshot = host_boilerplate_strip(everything, "doc_id", "text", "host", **KW)
    assert sorted(map(tuple, refreshed.collect())) == sorted(
        map(tuple, oneshot.collect())
    )
