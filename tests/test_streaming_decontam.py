"""Streaming decontamination gate: frozen eval-gram audit per micro-batch,
clean/quarantine routing, overlap counts preserved, replay no-op, fresh
checkpoint = new lifecycle — all under the single-atomic-commit protocol."""

import pandas as pd
import pytest

from mistral_ocr_pipeline_spark.sources.catalog import TableCatalog
from mistral_ocr_pipeline_spark.streaming.decontam import run_decontam_gate

SCHEMA = "doc_id long, text string, source string"

BENCH = "the quick brown fox jumps over the lazy dog tonight"


def _write(rows, path):
    pd.DataFrame(rows, columns=["doc_id", "text", "source"]).to_parquet(
        path, index=False
    )


@pytest.mark.filterwarnings("ignore")
def test_gate_routes_and_replays(spark, tmp_path):
    ev = spark.createDataFrame([(100, BENCH, "eval")], SCHEMA)
    input_dir = tmp_path / "in"
    input_dir.mkdir()
    ckpt = str(tmp_path / "ckpt")
    catalog = TableCatalog(spark, str(tmp_path / "wh"))

    _write(
        [
            (1, f"intro text then {BENCH} and a conclusion paragraph", "web"),
            (2, "completely unrelated content about spark partitioning", "web"),
            (3, "short", "web"),  # too short for any 5-gram -> clean
        ],
        input_dir / "b0.parquet",
    )
    run_decontam_gate(
        spark, str(input_dir), SCHEMA, ev, catalog, ckpt, n=5
    )
    clean = {r.doc_id for r in catalog.read("clean_docs").collect()}
    quar = {
        r.doc_id: r.n_contaminated_grams
        for r in catalog.read("contaminated_docs").collect()
    }
    assert clean == {2, 3}
    assert set(quar) == {1} and quar[1] >= 1  # overlap counts preserved
    # extra columns ride through both routes
    assert set(catalog.read("clean_docs").columns) == {
        "doc_id", "text", "source"
    }
    assert set(catalog.read("contaminated_docs").columns) == {
        "doc_id", "text", "source", "n_contaminated_grams"
    }
    lin = catalog.read("decontam_lineage").collect()
    assert [(r.n_clean, r.n_quarantined) for r in lin] == [(2, 1)]

    # batch 2: another leaked doc + a clean one
    _write(
        [(4, f"prefix {BENCH}", "forum"), (5, "benign filler words", "forum")],
        input_dir / "b1.parquet",
    )
    run_decontam_gate(
        spark, str(input_dir), SCHEMA, ev, catalog, ckpt, n=5
    )
    assert {r.doc_id for r in catalog.read("clean_docs").collect()} == {2, 3, 5}
    assert {
        r.doc_id for r in catalog.read("contaminated_docs").collect()
    } == {1, 4}

    # replay with the SAME checkpoint: drained stream -> rows unchanged
    run_decontam_gate(
        spark, str(input_dir), SCHEMA, ev, catalog, ckpt, n=5
    )
    assert catalog.read("clean_docs").count() == 3
    assert catalog.read("contaminated_docs").count() == 2
    n_lineage = catalog.read("decontam_lineage").count()

    # fresh checkpoint over the same files: batch ids restart at 0 but the
    # lifecycle-scoped stream id treats them as NEW batches - rows append
    import shutil

    shutil.rmtree(ckpt)
    run_decontam_gate(
        spark, str(input_dir), SCHEMA, ev, catalog, ckpt, n=5
    )
    assert catalog.read("clean_docs").count() == 6
    assert catalog.read("decontam_lineage").count() > n_lineage


@pytest.mark.filterwarnings("ignore")
def test_gate_agrees_with_batch_audit(spark, tmp_path):
    """Stream routing == one-shot contamination_flags over the union of
    all batches (the gate adds routing + idempotence, not new semantics)."""
    from pyspark.sql import functions as F

    from mistral_ocr_pipeline_spark.operators.dedup import contamination_flags

    ev = spark.createDataFrame([(100, BENCH, "eval")], SCHEMA)
    rows = [
        (i, f"doc {i} padding {BENCH if i % 3 == 0 else 'no leak here at all'}",
         "s")
        for i in range(12)
    ]
    input_dir = tmp_path / "in"
    input_dir.mkdir()
    _write(rows[:6], input_dir / "b0.parquet")
    _write(rows[6:], input_dir / "b1.parquet")
    catalog = TableCatalog(spark, str(tmp_path / "wh"))
    run_decontam_gate(
        spark, str(input_dir), SCHEMA, ev, catalog,
        str(tmp_path / "ckpt"), n=5,
    )

    batch = contamination_flags(
        spark.createDataFrame(rows, SCHEMA), ev, "doc_id", "text", n=5
    )
    want_clean = {r.id for r in batch.filter(~F.col("contaminated")).collect()}
    want_quar = {r.id for r in batch.filter(F.col("contaminated")).collect()}
    assert {
        r.doc_id for r in catalog.read("clean_docs").collect()
    } == want_clean
    assert {
        r.doc_id for r in catalog.read("contaminated_docs").collect()
    } == want_quar
