"""Streaming quality routing: frozen-threshold bucketing per micro-batch,
bucket-partitioned append, unseen-language surfacing, replay no-op —
all under the single-atomic-commit protocol."""

import pandas as pd
import pytest

from pyspark.sql import functions as F

from mistral_ocr_pipeline_spark.operators.text_analysis import (
    perplexity_thresholds,
)
from mistral_ocr_pipeline_spark.sources.catalog import TableCatalog
from mistral_ocr_pipeline_spark.streaming.quality_route import run_quality_route

SCHEMA = "doc_id long, lang string, surprisal double"


def _write(rows, path):
    pd.DataFrame(rows, columns=["doc_id", "lang", "surprisal"]).to_parquet(
        path, index=False
    )


@pytest.mark.filterwarnings("ignore")
def test_route_buckets_and_replay(spark, tmp_path):
    # thresholds frozen from a build corpus: lang 'a' terciles at ~3/6
    build = spark.createDataFrame(
        [(i, "a", float(i)) for i in range(9)], SCHEMA
    )
    th = perplexity_thresholds(build)

    input_dir = tmp_path / "in"
    input_dir.mkdir()
    ckpt = str(tmp_path / "ckpt")
    catalog = TableCatalog(spark, str(tmp_path / "wh"))

    _write([(1, "a", 0.5), (2, "a", 4.5), (3, "a", 99.0)], input_dir / "b0.parquet")
    run_quality_route(spark, str(input_dir), SCHEMA, th, catalog, ckpt)
    got = {r.doc_id: r.bucket for r in catalog.read("routed_docs").collect()}
    assert got == {1: "head", 2: "middle", 3: "tail"}
    # bucket-partitioned layout (hive dirs) for partition-pruned reads
    assert catalog._current_partition_cols("routed_docs") == ["bucket"]

    # batch 2: one more doc + an UNSEEN language — surfaced, not dropped
    _write([(4, "a", 1.0), (5, "zz", 1.0)], input_dir / "b1.parquet")
    run_quality_route(spark, str(input_dir), SCHEMA, th, catalog, ckpt)
    got = {r.doc_id: r.bucket for r in catalog.read("routed_docs").collect()}
    assert got[4] == "head" and got[5] == "unseen"
    assert len(got) == 5

    # replay with the SAME checkpoint: drained stream → no new batches,
    # rows unchanged (idempotence)
    run_quality_route(spark, str(input_dir), SCHEMA, th, catalog, ckpt)
    assert catalog.read("routed_docs").count() == 5
    n_lineage = catalog.read("route_lineage").count()

    # fresh checkpoint over the same files: batch ids restart at 0 but
    # the inode-scoped stream id treats them as NEW batches (the
    # checkpoint-lifecycle contract) — rows append again
    import shutil

    shutil.rmtree(ckpt)
    run_quality_route(spark, str(input_dir), SCHEMA, th, catalog, ckpt)
    assert catalog.read("routed_docs").count() == 10
    assert catalog.read("route_lineage").count() > n_lineage


def test_stream_identity_lifecycle_semantics(tmp_path):
    """Same checkpoint → same id across calls; wiped-and-IMMEDIATELY-
    recreated checkpoint → different id (the case a bare inode fails:
    ext4 reuses the just-freed inode when nothing allocates in between)."""
    import shutil

    from mistral_ocr_pipeline_spark.streaming.identity import stream_identity

    ckpt = str(tmp_path / "ck")
    a = stream_identity(ckpt)
    assert stream_identity(ckpt) == a  # stable within a lifecycle
    shutil.rmtree(ckpt)
    b = stream_identity(ckpt)  # recreated immediately — no allocations
    assert b != a
